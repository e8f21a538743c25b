"""Compression-ratio text quality signal: DEFLATE size / raw size.

A low ratio means the text is repetitive/templated (boilerplate, SEO
spam, generated filler) — the compressibility filter from the Gopher /
MassiveText cleaning stack (Rae et al. 2021 §A.1.1 use exactly this
signal family).  Spark has no native deflate expression, so this is a
legitimate Arrow-batched Pandas UDF stage (vectorized batch transfer,
never row-at-a-time Python) — the same justification as the multimodal
codec family, and zlib is stdlib so the worker needs nothing installed.

Determinism: ``zlib.compress(data, 6)`` is a pure function of the bytes
for a fixed zlib build — the container pins one; the oracle recomputes
the same sizes over the same parquet through an independent sequential
path (DuckDB read -> local zlib) and embeds them as VALUES.
"""

from __future__ import annotations

import zlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFLATE_LEVEL = 6


def deflate_ratio(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_raw, n_deflate, ratio) — one Arrow-batched pass."""
    import pandas as pd  # noqa: F401 — worker-side
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("int")
    def _dlen(s):
        return s.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), DEFLATE_LEVEL))
        ).astype("int32")

    out = df.select(
        id_col,
        F.octet_length(text_col).alias("n_raw"),
        _dlen(F.col(text_col)).alias("n_deflate"),
    )
    return out.select(
        id_col,
        "n_raw",
        "n_deflate",
        (F.col("n_deflate").cast("double") / F.col("n_raw").cast("double")).alias(
            "ratio"
        ),
    )
