"""Python DataSource API (Spark 4): batch JSONL source round-trip and
the deterministic streaming feed (sources/python_datasource.py)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def jsonl_dir(spark, tmp_path_factory):
    from fotmobdatapipeline_spark.sources.registry import read_table

    out = str(tmp_path_factory.mktemp("docs_jsonl"))
    docs = read_table(spark, SF_SMALL, "documents").select(
        "doc_id", "source", "lang", "text"
    )
    docs.repartition(4).write.mode("overwrite").json(out)
    return out


def test_jsonl_batch_roundtrip(spark, jsonl_dir):
    from fotmobdatapipeline_spark.sources.python_datasource import (
        register_python_sources,
    )
    from fotmobdatapipeline_spark.sources.registry import read_table

    register_python_sources(spark)
    got = spark.read.format("jsonl_docs").load(jsonl_dir)
    want = read_table(spark, SF_SMALL, "documents").select(
        "doc_id", "source", "lang", "text"
    )
    assert got.schema == want.schema
    assert sorted(got.collect()) == sorted(want.collect())


def test_jsonl_partition_per_shard(spark, jsonl_dir):
    import glob
    import os

    from fotmobdatapipeline_spark.sources.python_datasource import (
        register_python_sources,
    )

    register_python_sources(spark)
    got = spark.read.format("jsonl_docs").load(jsonl_dir)
    n_files = len(
        [f for f in glob.glob(os.path.join(jsonl_dir, "*.json")) if os.path.getsize(f)]
    )
    assert n_files >= 2  # repartition(4) above makes this a real check
    assert got.rdd.getNumPartitions() == n_files


def test_jsonl_custom_schema_projection(spark, jsonl_dir):
    from fotmobdatapipeline_spark.sources.python_datasource import (
        register_python_sources,
    )

    register_python_sources(spark)
    got = (
        spark.read.format("jsonl_docs")
        .schema("doc_id bigint, lang string")
        .load(jsonl_dir)
    )
    assert got.columns == ["doc_id", "lang"]
    assert got.filter(got.doc_id.isNull()).count() == 0


def test_docs_feed_stream_availablenow(spark, jsonl_dir, tmp_path):
    from fotmobdatapipeline_spark.sources.python_datasource import (
        register_python_sources,
    )
    from fotmobdatapipeline_spark.sources.registry import read_table

    register_python_sources(spark)
    want = read_table(spark, SF_SMALL, "documents").select(
        "doc_id", "source", "lang", "text"
    )
    expected = sorted(want.collect())

    # AvailableNow falls back to one batch for Python simple stream
    # readers, so drive real micro-batches (40 rows each) and poll — this
    # exercises offset progression across many read() calls.
    stream = (
        spark.readStream.format("jsonl_docs")
        .option("maxrowsperbatch", "40")
        .load(jsonl_dir)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("docs_feed_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        import time

        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql("SELECT * FROM docs_feed_test").count() >= len(expected):
                break
            time.sleep(1)
        got = sorted(spark.sql("SELECT * FROM docs_feed_test").collect())
    finally:
        q.stop()
    assert got == expected
