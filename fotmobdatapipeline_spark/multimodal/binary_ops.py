"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with Arrow-batched feature extraction via ``mapInPandas``.

Design: media (image/audio/video) travels as a ``binary`` column next to
a metadata struct — Spark never interprets the bytes; decode happens
only inside vectorized Pandas UDF stages at the edge of the plan.  At
100 TB the payload column dominates I/O, so:
* feature extraction reads ONLY (id, payload) — column pruning keeps
  metadata-only queries off the heavy bytes;
* ``mapInPandas`` streams Arrow record batches (bounded memory per
  task), never materializing a partition of blobs at once;
* partitioning stays whatever the upstream table had — no shuffle is
  introduced by a per-row decode.

The actual image/audio decoders are NOT available in this environment,
so ``extract_features`` takes a ``decoder`` callable; the default raises
NotImplementedError (clearly-marked stub), and ``fake_decoder`` is a
deterministic stand-in that exercises the full Spark-side plumbing
(schema, batching, UDF signature) in tests.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("n_bytes", IntegerType()),
                    StructField("source", StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("header_hex", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def attach_binary_payload(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id", mime: str = "text/plain"
) -> DataFrame:
    """Turn a content column into the canonical (id, payload, meta)
    multimodal layout.  In production the payload comes from
    ``spark.read.format("binaryFile")`` or an object-store manifest —
    same downstream shape."""
    payload = F.encode(F.col(content_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(payload).alias("n_bytes"),
            F.lit("inline").alias("source"),
        ).alias("meta"),
    )


def stub_decoder(payload: bytes) -> list[float]:
    """Placeholder for a real media decoder (PIL/librosa/ffmpeg), which
    are not installed in this environment."""
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "container; pass decoder=fake_decoder (tests) or a real decoder"
    )


def fake_decoder(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in 'feature extractor': a byte-histogram-ish
    projection.  Exercises the exact plumbing a real decoder would."""
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] = (acc[i % dim] + b) % 997
    return [float(v) for v in acc]


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], list[float]] = stub_decoder,
    batch_hint: int | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas`` yields one output row per input row; only
    (doc_id, payload) are read (column pruning drops meta)."""
    import pandas as pd

    # The decoder and this closure cross into Python workers; serialize
    # their defining modules by value so workers need no import path to
    # this package (belt: ship_package adds the zip as suspenders).
    try:
        import sys

        from pyspark import cloudpickle

        from fotmobdatapipeline_spark.session import ship_package

        ship_package(media.sparkSession)
        for mod_name in {__name__, decoder.__module__}:
            if mod_name in sys.modules and not mod_name.startswith("pyspark"):
                cloudpickle.register_pickle_by_value(sys.modules[mod_name])
    except Exception:
        pass  # best effort; workers may already have the package

    pruned = media.select("doc_id", "payload")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "header_hex": payloads.map(lambda b: bytes(b[:4]).hex().upper()),
                    "feature": payloads.map(lambda b: decoder(bytes(b))),
                }
            )

    return pruned.mapInPandas(run, schema=FEATURE_SCHEMA)
