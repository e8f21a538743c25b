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


def test_block_spans_exact_blocks(spark):
    """Concat-and-chunk invariants: every block except the last is
    exactly full, per-doc span tokens sum to the doc's length, spans of
    one doc are contiguous in global offsets, carried_in marks exactly
    the docs that started in an earlier block, and zero-token rows
    vanish."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.prefix import block_spans

    rows = [(1, 3), (2, 10), (3, 0), (4, 8), (5, 2), (6, 13), (7, 1)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    out = block_spans(df, ["doc_id"], "n", block_size=8).collect()
    total = sum(n for _, n in rows)
    n_blocks = -(-total // 8)
    # doc -> exclusive global start offset, from the plain Python cumsum
    starts, acc = {}, 0
    for d, n in rows:
        starts[d] = acc
        acc += n
    by_block: dict[int, int] = {}
    by_doc: dict[int, int] = {}
    for r in out:
        assert r["span_end"] - r["span_start"] == r["span_tokens"] > 0
        by_block[r["block_id"]] = by_block.get(r["block_id"], 0) + r["span_tokens"]
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0) + r["span_tokens"]
        assert r["carried_in"] == (starts[r["doc_id"]] < r["block_id"] * 8), r
    assert by_doc == {d: n for d, n in rows if n > 0}
    assert set(by_block) == set(range(n_blocks))
    for b in range(n_blocks - 1):
        assert by_block[b] == 8, (b, by_block)
    assert by_block[n_blocks - 1] == total - 8 * (n_blocks - 1)
    # spans of one doc are contiguous and ordered by block
    spans = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["block_id"])):
        spans.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))
    for d, ss in spans.items():
        for (s1, e1), (s2, e2) in zip(ss, ss[1:]):
            assert e1 == s2, (d, ss)


def test_block_spans_partition_invariant(spark):
    """The prefix-sum backbone must give identical spans at any
    parallelism (the running_sum partition-invariance contract carried
    through the explode)."""
    from fotmobdatapipeline_spark.operators.prefix import block_spans

    rows = [(i, (i * 7) % 11 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    ref = None
    for parts in (1, 5, 32):
        got = sorted(
            (r["doc_id"], r["block_id"], r["span_start"], r["span_end"])
            for r in block_spans(
                df.repartition(parts), ["doc_id"], "n", 64
            ).collect()
        )
        if ref is None:
            ref = got
        assert got == ref, parts


def test_block_spans_rejects_output_name_collisions(spark):
    """Input columns named like the outputs would be silently clobbered;
    the operator must fail loud instead."""
    import pytest

    from fotmobdatapipeline_spark.operators.prefix import block_spans

    df = spark.createDataFrame([(1, 2, 3)], "doc_id long, n long, span_start long")
    with pytest.raises(ValueError, match="collide"):
        block_spans(df, ["doc_id"], "n", 8)
