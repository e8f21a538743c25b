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


def test_jsonl_writer_batch_roundtrip(spark, tmp_path):
    """df.write.format('jsonl_docs') publishes manifest-committed
    shards readable back through the same source, value-identical; a
    second overwrite write replaces cleanly; no staging leftovers."""
    import json as _json
    import os as _os

    from fotmobdatapipeline_spark.sources.python_datasource import (
        register_python_sources,
    )

    register_python_sources(spark)
    out = str(tmp_path / "sink")
    df = spark.range(0, 100).selectExpr(
        "id AS doc_id", "concat('s', id % 3) AS source",
        "'en' AS lang", "concat('text ', id) AS text",
    )
    df.repartition(4).write.format("jsonl_docs").option("path", out).mode(
        "append"
    ).save()

    manifest = _json.load(open(f"{out}/_MANIFEST.json"))
    assert manifest["rows"] == 100 and len(manifest["files"]) == 4
    back = spark.read.format("jsonl_docs").load(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    assert _os.listdir(f"{out}/_staging") == []  # all shards published

    # overwrite replaces contents
    df2 = df.filter("doc_id < 10")
    df2.coalesce(1).write.format("jsonl_docs").option("path", out).mode(
        "overwrite"
    ).save()
    back2 = spark.read.format("jsonl_docs").load(out)
    assert back2.count() == 10


def test_jsonl_stream_writer_exactly_once(spark, tmp_path):
    """The streaming JSONL sink publishes per-batch shards through the
    manifest; draining a 3-file feed lands every row exactly once, and
    a manual replay of an already-committed batch id is a no-op (the
    manifest replay guard)."""
    import json as _json

    from fotmobdatapipeline_spark.sources.python_datasource import (
        JsonlDocsStreamWriter,
        _read_manifest,
        register_python_sources,
    )

    register_python_sources(spark)
    src = tmp_path / "src"
    src.mkdir()
    df = spark.range(0, 90).selectExpr(
        "id AS doc_id", "'s' AS source", "'en' AS lang",
        "concat('t', id) AS text",
    )
    df.coalesce(3).write.parquet(str(src / "files"))

    out = str(tmp_path / "jsonl_out")
    stream = (
        spark.readStream.schema("doc_id long, source string, lang string, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "files"))
    )
    q = (
        stream.writeStream.format("jsonl_docs")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    back = spark.read.format("jsonl_docs").load(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    manifest = _read_manifest(out)
    committed = {int(b) for b in manifest["batches"]}
    assert committed  # at least one batch landed
    total = sum(b["rows"] for b in manifest["batches"].values())
    assert total == 90

    # replaying a committed batch id must not double-publish
    w = JsonlDocsStreamWriter({"path": out}, overwrite=False)
    replay_id = min(committed)
    w.commit([], replay_id)  # same id, no shards — must be a no-op
    assert _read_manifest(out)["batches"] == manifest["batches"]
    assert spark.read.format("jsonl_docs").load(out).count() == 90
