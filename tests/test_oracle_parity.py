"""Oracle-differential tests — the in-repo replica of the driver's
correctness gate (__spark_entry__.py): run every catalog query in Spark
AND its DuckDB oracle at sf0.01, then compare row count, column names,
and the order-insensitive multiset of values EXACTLY (no tolerance —
the engine's determinism rules must make values bit-identical).

The comparison additionally replays the DRIVER's canonicalization on
both result frames — a pandas ``sort_values`` over every column
(reconstructed from the driver's r10 failure traceback) — so any output
the driver's canon cannot sort or hash (list-typed cells, int128
columns) fails HERE first.  Round 10's replica was MORE permissive than
the driver (it sorted by ``repr``, which happily handles lists), which
is exactly the wrong direction for a pre-flight check (VERDICT r10 #4).
"""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_ORACLE


def _normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def _driver_canon(rows, cols, name, side):
    """Replay the driver's canonicalization — pandas sort_values over
    ALL columns — on the ALREADY-FETCHED rows (one engine execution per
    side, not two).  None is mapped to NaN first, matching what the
    driver's toPandas/df() conversion does for nullable columns.
    Raises (→ test failure) on any cell type pandas cannot factorize —
    the exact failure mode that killed text_inverted_index in
    CORRECTNESS_r10."""
    import numpy as np
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=cols, dtype=object)
    if len(pdf):
        # None -> NaN via where(): value-identical to the old fillna()
        # spelling but exempt from pandas' fillna-downcasting
        # FutureWarning (fillna on object frames is slated to change
        # behavior; where() is not).
        pdf = pdf.where(pdf.notna(), np.nan).infer_objects(copy=False)
    try:
        return pdf.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    except TypeError as ex:  # unhashable cell (list/dict/ndarray)
        raise AssertionError(
            f"{name}: {side} result is not driver-canon-safe "
            f"(pandas sort_values failed: {ex}) — emit scalar columns only"
        ) from None


def _spark_rows(df, name):
    cols = sorted(df.columns)
    raw = df.collect()
    _driver_canon([[row[c] for c in cols] for row in raw], cols, name, "spark")
    return [tuple(_normalize(row[c]) for c in cols) for row in raw], cols


def _duck_rows(con, sql, name):
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    raw = res.fetchall()
    scols = sorted(cols)
    _driver_canon([[r[i] for i in order] for r in raw], scols, name, "oracle")
    rows = [tuple(_normalize(r[i]) for i in order) for r in raw]
    return rows, scols


def _query_names():
    from fotmobdatapipeline_spark.plans.catalog import QUERIES, _load_all

    _load_all()
    return sorted(QUERIES)


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, duck, name):
    from fotmobdatapipeline_spark.plans.catalog import QUERIES

    from pyspark.sql import types as T

    spec = QUERIES[name]
    df = spec.builder(spark, SF_ORACLE)
    complex_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not complex_cols, (
        f"{name}: top-level complex-typed output columns {complex_cols} — "
        "the driver canon cannot hash them; emit scalars "
        "(array_join / explode) instead"
    )
    s_rows, s_cols = _spark_rows(df, name)
    if spec.oracle is None:
        assert len(s_rows) >= 0  # rows-only check, mirrors the driver
        return
    d_rows, d_cols = _duck_rows(duck, spec.oracle_text(), name)
    assert s_cols == d_cols, f"{name}: column names differ: {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs oracle {len(d_rows)}"
    )
    assert sorted(s_rows, key=repr) == sorted(d_rows, key=repr), (
        f"{name}: value multiset differs"
    )
