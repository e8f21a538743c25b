"""Context-window chunking (functions/chunking.py): UDTF == native HOF,
plus the window-coverage invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _native(spark):
    from fotmobdatapipeline_spark.functions.chunking import chunk_windows
    from fotmobdatapipeline_spark.sources.registry import read_table

    docs = read_table(spark, SF_SMALL, "documents")
    return docs.select(
        "doc_id", F.explode(chunk_windows(F.col("text"))).alias("c")
    ).select("doc_id", "c.chunk_idx", "c.n_tokens", "c.chunk_text")


def test_udtf_matches_native_expression(spark):
    from fotmobdatapipeline_spark.functions.chunking import register_chunk_udtf
    from fotmobdatapipeline_spark.sources.registry import read_table

    register_chunk_udtf(spark)
    read_table(spark, SF_SMALL, "documents").createOrReplaceTempView("docs_for_udtf")
    got = spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.n_tokens, c.chunk_text
        FROM docs_for_udtf d, LATERAL chunk_document(d.text, 64, 48) c
        """
    )
    assert sorted(got.collect()) == sorted(_native(spark).collect())


def test_chunk_coverage_invariants(spark):
    """Every token lands in >= 1 chunk; consecutive chunks overlap by
    size-step; rebuilding the doc from step-prefixes restores it."""
    df = _native(spark)
    from fotmobdatapipeline_spark.sources.registry import read_table

    docs = read_table(spark, SF_SMALL, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    )
    per_doc = df.groupBy("doc_id").agg(
        F.sum(F.least(F.lit(48), F.col("n_tokens"))).alias("covered"),
        F.count("*").alias("n_chunks"),
        F.max("chunk_idx").alias("max_idx"),
    )
    joined = per_doc.join(docs, "doc_id")
    # step-prefix sums == token count exactly (chunks tile the doc)
    assert joined.filter(F.col("covered") != F.col("n")).count() == 0
    assert joined.filter(F.col("max_idx") != F.col("n_chunks") - 1).count() == 0


def test_chunk_edge_cases(spark):
    from fotmobdatapipeline_spark.functions.chunking import chunk_windows

    rows = spark.createDataFrame(
        [("", 1), ("one two three", 2), (" ".join(f"t{i}" for i in range(200)), 3)],
        "text string, id int",
    ).select("id", F.explode(chunk_windows(F.col("text"), size=64, step=48)).alias("c"))
    out = {r["id"]: r for r in rows.groupBy("id").agg(F.count("*").alias("n")).collect()}
    assert out[1]["n"] == 1  # empty text -> one '' chunk
    assert out[2]["n"] == 1  # 3 tokens -> single window
    assert out[3]["n"] == 5  # 200 tokens, starts 0,48,96,144,192
