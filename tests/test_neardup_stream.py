"""Streaming near-duplicate suppression (streaming/documents.py):
stream == batch, duplicates injected across micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _feed_with_dups(spark, out_dir: str):
    """documents + a re-ingested copy (new doc_ids, same text) — the
    crawler-re-crawl scenario; written as JSONL shards for the feed."""
    from fotmobdatapipeline_spark.sources.registry import read_table

    docs = read_table(spark, SF_SMALL, "documents").select(
        "doc_id", "source", "lang", "text"
    )
    recrawl = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    docs.unionByName(recrawl).repartition(6).write.mode("overwrite").json(out_dir)


def test_neardup_stream_equals_batch(spark, tmp_path):
    from fotmobdatapipeline_spark.sources.python_datasource import (
        register_python_sources,
    )
    from fotmobdatapipeline_spark.streaming.documents import neardup_stream

    feed = str(tmp_path / "feed")
    _feed_with_dups(spark, feed)
    register_python_sources(spark)

    batch = neardup_stream(spark.read.format("jsonl_docs").load(feed))
    stream = neardup_stream(
        spark.readStream.format("jsonl_docs")
        .option("maxrowsperbatch", "300")
        .load(feed)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("neardup_out")
        .outputMode("append")
        .start()
    )
    try:
        import time

        want_n = batch.count()
        # processAllAvailable blocks until every staged input file has
        # been through a micro-batch — no 1s poll quantization; the
        # bounded poll below only covers the (rare) case of a source
        # that reports availability lazily.
        q.processAllAvailable()
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql("SELECT * FROM neardup_out").count() >= want_n:
                break
            time.sleep(1)
        got = spark.sql("SELECT * FROM neardup_out")
        # Which representative survives is arrival-order/partition
        # dependent; the SIGNATURE multiset is the contract.
        got_sigs = sorted(r["minhash_sig"] for r in got.collect())
        want_sigs = sorted(r["minhash_sig"] for r in batch.collect())
        assert got_sigs == want_sigs
    finally:
        q.stop()


def test_neardup_suppresses_recrawl_and_keeps_short_docs(spark, tmp_path):
    from fotmobdatapipeline_spark.streaming.documents import neardup_stream

    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),  # near-dup of 1
        (3, "totally different content words here"),
        (4, "hi"),  # sub-shingle: unsignable, must pass through
        (5, "hi"),  # also passes through (no false collapse)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = neardup_stream(df)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert len(ids) == 4  # one of {1,2} suppressed
    assert 3 in ids and 4 in ids and 5 in ids
    # Single-branch form (unique id available): identical contract —
    # same suppression, shorts still pass — via ONE dedup subtree.
    out_keyed = neardup_stream(df, id_col="doc_id")
    ids_keyed = sorted(r["doc_id"] for r in out_keyed.collect())
    assert len(ids_keyed) == 4
    assert 3 in ids_keyed and 4 in ids_keyed and 5 in ids_keyed
    assert set(out_keyed.columns) == set(out.columns)


def test_sentence_dedup_stream_equals_batch_set(spark, tmp_path):
    """Streaming sentence dedup == batch on the distinct-sentence SET
    (which doc owns a surviving sentence is arrival-dependent), with
    duplicates split across micro-batches so state actually carries."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.sources.registry import read_table
    from fotmobdatapipeline_spark.streaming.documents import sentence_dedup_stream
    from tests.conftest import SF_SMALL

    feed_dir = str(tmp_path / "feed")
    docs = read_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    recrawl = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    feed = docs.unionByName(recrawl).withColumn(
        "ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id") % 600)
    )
    feed.repartition(6).write.mode("overwrite").parquet(feed_dir)

    schema = spark.read.parquet(feed_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(feed_dir)
    )
    q = (
        sentence_dedup_stream(stream, ts_col="ts", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("sent_dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r["sentence"]
        for r in spark.sql("SELECT sentence FROM sent_dedup_out").collect()
    }
    want = {
        r["sentence"]
        for r in sentence_dedup_stream(
            spark.read.parquet(feed_dir)
        ).collect()
    }
    assert got == want and len(want) > 0


def test_perrow_signature_matches_batch_minhash(spark):
    """The stateless per-row signature must equal the shuffle-based
    batch signature column-for-column (same hash family)."""
    from fotmobdatapipeline_spark.operators.dedup import (
        minhash_signature_cols,
        minhash_signatures,
    )
    from fotmobdatapipeline_spark.sources.registry import read_table

    docs = read_table(spark, SF_SMALL, "documents").limit(200)
    per_row = docs.select("doc_id", *minhash_signature_cols(F.col("text"))).filter(
        F.col("sig_0").isNotNull()
    )
    batch = minhash_signatures(docs)
    assert sorted(per_row.collect()) == sorted(batch.collect())


def test_sentence_neardup_stream_equals_batch_set(spark, tmp_path):
    """Streaming FUZZY sentence dedup == batch-mode on the distinct
    surviving-SIGNATURE set (which occurrence survives is arrival-
    dependent), with the re-crawl split across micro-batches so state
    carries; unsignable (sub-shingle) sentences all pass through."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.dedup import minhash_signature_cols
    from fotmobdatapipeline_spark.sources.registry import read_table
    from fotmobdatapipeline_spark.streaming.documents import sentence_neardup_stream
    from tests.conftest import SF_SMALL

    feed_dir = str(tmp_path / "feed")
    docs = read_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    recrawl = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    feed = docs.unionByName(recrawl).withColumn(
        "ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id") % 600)
    )
    feed.repartition(6).write.mode("overwrite").parquet(feed_dir)

    schema = spark.read.parquet(feed_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(feed_dir)
    )
    q = (
        sentence_neardup_stream(stream, ts_col="ts", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("sent_neardup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    def sig_multiset(df):
        sig = F.concat_ws("", *minhash_signature_cols(F.col("sentence"), 4, 2))
        return sorted(r["s"] for r in df.select(sig.alias("s")).collect())

    got = spark.sql("SELECT sentence FROM sent_neardup_out")
    want = sentence_neardup_stream(spark.read.parquet(feed_dir))
    # Signable: same SET of surviving signatures, exactly once each.
    # Unsignable (''): every occurrence passes through in both modes.
    assert sig_multiset(got) == sig_multiset(want)
    n_signable = sum(1 for s in sig_multiset(got) if s != "")
    assert n_signable > 0


def test_gopher_rules_stream_equals_batch(spark, tmp_path):
    """The Gopher rule filter is stateless per-row HOF work, so it must
    be applicable unchanged to a readStream frame and produce the exact
    batch verdicts — the filter a streaming ingest pipeline applies
    before any stateful dedup tier."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.functions.text import gopher_rules
    from fotmobdatapipeline_spark.sources.python_datasource import (
        register_python_sources,
    )

    feed = str(tmp_path / "gfeed")
    _feed_with_dups(spark, feed)
    register_python_sources(spark)

    def apply_rules(df):
        rules = gopher_rules(F.col("text"))
        keep = None
        for n in rules:
            keep = rules[n] if keep is None else (keep & rules[n])
        return df.select("doc_id", *[c.alias(n) for n, c in rules.items()],
                         keep.alias("keep"))

    batch = apply_rules(spark.read.format("jsonl_docs").load(feed))
    stream = apply_rules(
        spark.readStream.format("jsonl_docs")
        .option("maxrowsperbatch", "400")
        .load(feed)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("gopher_out")
        .outputMode("append")
        .start()
    )
    try:
        import time

        want = sorted(map(str, batch.collect()))
        # processAllAvailable blocks until every staged input file has
        # been through a micro-batch — no 1s poll quantization; the
        # bounded poll below only covers the (rare) case of a source
        # that reports availability lazily.
        q.processAllAvailable()
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql("SELECT * FROM gopher_out").count() >= len(want):
                break
            time.sleep(1)
        got = sorted(
            map(str, spark.sql(f"SELECT {', '.join(batch.columns)} FROM gopher_out").collect())
        )
        assert got == want
    finally:
        q.stop()


def test_prep_stream_equals_batch_composition(spark, tmp_path):
    """The composed ingest pipeline (Gopher filter -> near-dup stream)
    must produce the batch composition's signature multiset — filter
    first, so rule-failing docs never reach (or pollute) dedup state."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.functions.text import gopher_rules
    from fotmobdatapipeline_spark.sources.python_datasource import (
        register_python_sources,
    )
    from fotmobdatapipeline_spark.streaming.documents import (
        neardup_stream,
        prep_stream,
    )

    feed = str(tmp_path / "pfeed")
    _feed_with_dups(spark, feed)
    register_python_sources(spark)

    rules = gopher_rules(F.col("text"))
    keep = None
    for n in rules:
        keep = rules[n] if keep is None else (keep & rules[n])
    batch = neardup_stream(
        spark.read.format("jsonl_docs").load(feed).filter(keep)
    )
    stream = prep_stream(
        spark.readStream.format("jsonl_docs")
        .option("maxrowsperbatch", "300")
        .load(feed)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("prep_out")
        .outputMode("append")
        .start()
    )
    try:
        import time

        want_n = batch.count()
        # processAllAvailable blocks until every staged input file has
        # been through a micro-batch — no 1s poll quantization; the
        # bounded poll below only covers the (rare) case of a source
        # that reports availability lazily.
        q.processAllAvailable()
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql("SELECT * FROM prep_out").count() >= want_n:
                break
            time.sleep(1)
        got_sigs = sorted(
            r["minhash_sig"] for r in spark.sql("SELECT * FROM prep_out").collect()
        )
        want_sigs = sorted(r["minhash_sig"] for r in batch.collect())
        assert got_sigs == want_sigs
    finally:
        q.stop()


def test_semantic_dedup_stream_equals_batch(spark, tmp_path):
    """Streaming SEMANTIC dedup (streaming/similarity.py): the stream
    scored against a batch-trained index must equal (a) the batch twin
    through the same code path AND (b) an independent recomputation via
    the batch operators (ivf_assign + cell join + max-cosine rule) —
    and both verdicts must occur on the feed, or the test proves
    nothing."""
    import time

    from fotmobdatapipeline_spark.operators.similarity import (
        dot,
        ivf_assign,
        kmeans_lloyd,
        l2_norm,
    )
    from fotmobdatapipeline_spark.sources.registry import read_table
    from fotmobdatapipeline_spark.streaming.similarity import (
        semantic_dedup_stream,
        semantic_index,
    )

    emb = read_table(spark, SF_SMALL, "embeddings").select("vec_id", "embedding")
    corpus = emb.filter(F.col("vec_id") < 250)
    feed_df = emb.filter(F.col("vec_id") >= 250)
    feed_dir = str(tmp_path / "emb_feed")
    feed_df.repartition(5).write.mode("overwrite").parquet(feed_dir)

    cents = kmeans_lloyd(corpus, k=4, iterations=2)
    index = semantic_index(corpus, cents).localCheckpoint(eager=False)
    tau = 0.2

    batch = semantic_dedup_stream(
        spark.read.parquet(feed_dir), cents, index, tau=tau
    )
    batch_ids = sorted(r["vec_id"] for r in batch.collect())

    # Independent recomputation with the batch operators.
    assigned = ivf_assign(feed_df, cents)
    dup_ids = {
        r["vid"]
        for r in assigned.join(index, "cell")
        .filter(
            dot(F.col("vec"), F.col("p_vec")) / (F.col("nrm") * F.col("p_nrm"))
            >= tau
        )
        .select("vid")
        .distinct()
        .collect()
    }
    all_ids = {r["vec_id"] for r in feed_df.collect()}
    want_ids = sorted(all_ids - dup_ids)
    assert batch_ids == want_ids
    assert 0 < len(batch_ids) < len(all_ids)  # both verdicts occur

    stream = semantic_dedup_stream(
        spark.readStream.schema(feed_df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed_dir),
        cents,
        index,
        tau=tau,
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("semantic_out")
        .outputMode("append")
        .start()
    )
    try:
        # processAllAvailable blocks until every staged input file has
        # been through a micro-batch — no 1s poll quantization; the
        # bounded poll below only covers the (rare) case of a source
        # that reports availability lazily.
        q.processAllAvailable()
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql("SELECT * FROM semantic_out").count() >= len(batch_ids):
                break
            time.sleep(1)
        got_ids = sorted(
            r["vec_id"] for r in spark.sql("SELECT * FROM semantic_out").collect()
        )
        assert got_ids == batch_ids
    finally:
        q.stop()


def test_semantic_ingest_sink_self_maintains_index(spark, tmp_path):
    """The self-maintaining ingest sink: survivors join the index, so a
    copy arriving in a LATER micro-batch is suppressed by the first
    copy's admission — and exact copies of seed-corpus vectors never
    enter at all.  Copies are staged in separate files with one file
    per trigger, so every duplicate relation spans batches and the
    admitted set (and count) is exactly determined."""
    import time

    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.similarity import kmeans_lloyd
    from fotmobdatapipeline_spark.sources.registry import read_table
    from fotmobdatapipeline_spark.streaming.similarity import (
        read_semantic_index,
        semantic_index,
        semantic_ingest_sink,
    )

    emb = read_table(spark, SF_SMALL, "embeddings").select("vec_id", "embedding")
    seed = emb.filter(F.col("vec_id") < 100)
    fresh = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 150))
    cents = kmeans_lloyd(seed, k=4, iterations=2)
    seed_idx = semantic_index(seed, cents).localCheckpoint(eager=True)

    feed_dir = str(tmp_path / "ingest_feed")
    # file 1: 50 fresh vectors; file 2: copies of 10 of them under new
    # ids + copies of 5 SEED vectors under new ids.
    fresh.coalesce(1).write.mode("append").parquet(feed_dir)
    copies = (
        emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 110))
        .select((F.col("vec_id") + 10_000).alias("vec_id"), "embedding")
        .unionByName(
            emb.filter(F.col("vec_id") < 5).select(
                (F.col("vec_id") + 20_000).alias("vec_id"), "embedding"
            )
        )
    )
    copies.coalesce(1).write.mode("append").parquet(feed_dir)

    q = semantic_ingest_sink(
        spark.readStream.schema(fresh.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed_dir),
        cents,
        str(tmp_path / "sem_index"),
        str(tmp_path / "sem_ckpt"),
        tau=0.9,  # only exact copies exceed it on this corpus
        seed_index=seed_idx,
    )
    q.processAllAvailable()
    q.stop()

    idx = read_semantic_index(spark, str(tmp_path / "sem_index"))
    assert idx is not None
    got_keys = {tuple(r["p_vec"]) for r in idx.collect()}
    n_index = idx.count()

    seed_keys = {tuple(r["embedding"]) for r in seed.collect()}
    fresh_keys = {tuple(r["embedding"]) for r in fresh.collect()}
    # Admitted = distinct fresh keys not already in the seed corpus;
    # copies (same key, later batch) and seed copies never enter.
    assert got_keys == seed_keys | (fresh_keys - seed_keys)
    assert n_index == seed.count() + len(fresh_keys - seed_keys)

    # Replay idempotence end-to-end: a FRESH checkpoint re-delivers the
    # whole feed under the same batch ids; the manifest's applied set
    # must skip every one — index byte-identical, no double admission.
    q2 = semantic_ingest_sink(
        spark.readStream.schema(fresh.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed_dir),
        cents,
        str(tmp_path / "sem_index"),
        str(tmp_path / "sem_ckpt_replay"),
        tau=0.9,
        seed_index=seed_idx,
    )
    q2.processAllAvailable()
    q2.stop()
    idx2 = read_semantic_index(spark, str(tmp_path / "sem_index"))
    assert idx2.count() == n_index
    assert {tuple(r["p_vec"]) for r in idx2.collect()} == got_keys


def test_semantic_index_compaction_preserves_index_and_replay_guard(spark, tmp_path):
    """compact_semantic_index folds the delta dirs into one
    cell-partitioned dir: the index key set must be unchanged, a
    single-cell probe of the compacted layout must partition-prune, and
    a full-feed replay after compaction must still be skipped (the
    applied-id annotations survive the fold)."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.similarity import kmeans_lloyd
    from fotmobdatapipeline_spark.sources.registry import read_table
    from fotmobdatapipeline_spark.streaming.similarity import (
        compact_semantic_index,
        read_semantic_index,
        semantic_index,
        semantic_ingest_sink,
    )

    emb = read_table(spark, SF_SMALL, "embeddings").select("vec_id", "embedding")
    seed = emb.filter(F.col("vec_id") < 100)
    fresh = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 150))
    cents = kmeans_lloyd(seed, k=4, iterations=2)
    seed_idx = semantic_index(seed, cents).localCheckpoint(eager=True)

    feed_dir = str(tmp_path / "cfeed")
    fresh.coalesce(1).write.mode("append").parquet(feed_dir)
    state = str(tmp_path / "cidx")

    q = semantic_ingest_sink(
        spark.readStream.schema(fresh.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed_dir),
        cents, state, str(tmp_path / "cck"), tau=0.9, seed_index=seed_idx,
    )
    q.processAllAvailable(); q.stop()

    before = {tuple(r["p_vec"]) for r in read_semantic_index(spark, state).collect()}
    folded = compact_semantic_index(spark, state)
    assert folded >= 2  # dseed + at least one batch delta
    after_df = read_semantic_index(spark, state)
    assert {tuple(r["p_vec"]) for r in after_df.collect()} == before

    # Compacted layout prunes: single-cell probe carries PartitionFilters.
    plan = after_df.filter(F.col("cell") == 1)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan, plan

    # Replay after compaction: fresh checkpoint re-delivers batch 0;
    # the annotation-preserved applied set must skip it.
    q2 = semantic_ingest_sink(
        spark.readStream.schema(fresh.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed_dir),
        cents, state, str(tmp_path / "cck2"), tau=0.9, seed_index=seed_idx,
    )
    q2.processAllAvailable(); q2.stop()
    assert {tuple(r["p_vec"]) for r in read_semantic_index(spark, state).collect()} == before


def test_semantic_ingest_fresh_batch_after_compaction(spark, tmp_path):
    """A NEW micro-batch committed AFTER compact_semantic_index must
    (a) not crash the sink's manifest GC on the m{N}c manifest name,
    and (b) carry the compaction's #applied annotations forward into
    the rewritten manifest, so a later full-feed replay still skips
    every pre-compaction batch (ADVICE r6 high + medium)."""
    import os

    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.similarity import kmeans_lloyd
    from fotmobdatapipeline_spark.sources.registry import read_table
    from fotmobdatapipeline_spark.streaming.similarity import (
        compact_semantic_index,
        read_semantic_index,
        semantic_index,
        semantic_ingest_sink,
    )

    emb = read_table(spark, SF_SMALL, "embeddings").select("vec_id", "embedding")
    seed = emb.filter(F.col("vec_id") < 100)
    first = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 130))
    second = emb.filter((F.col("vec_id") >= 130) & (F.col("vec_id") < 160))
    cents = kmeans_lloyd(seed, k=4, iterations=2)
    seed_idx = semantic_index(seed, cents).localCheckpoint(eager=True)

    feed_dir = str(tmp_path / "pfeed")
    state = str(tmp_path / "pidx")
    first.coalesce(1).write.mode("append").parquet(feed_dir)

    def run(ckpt: str) -> None:
        q = semantic_ingest_sink(
            spark.readStream.schema(first.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(feed_dir),
            cents, state, str(tmp_path / ckpt), tau=0.9, seed_index=seed_idx,
        )
        q.processAllAvailable()
        q.stop()

    run("pck")  # batch 0 admitted
    assert compact_semantic_index(spark, state) >= 2  # dseed + d0 folded

    # Fresh data arrives post-compaction: the SAME checkpoint delivers
    # it as batch 1; apply_batch must GC past the m{N}c manifest and
    # rewrite the manifest without losing batch 0's applied annotation.
    second.coalesce(1).write.mode("append").parquet(feed_dir)
    run("pck")

    idx = read_semantic_index(spark, state)
    expect = {tuple(r["embedding"]) for r in seed.collect()}
    expect |= {tuple(r["embedding"]) for r in first.collect()}
    expect |= {tuple(r["embedding"]) for r in second.collect()}
    got = {tuple(r["p_vec"]) for r in idx.collect()}
    assert got == expect
    n = idx.count()

    # The rewritten manifest still guards batch 0: a fresh-checkpoint
    # replay of the whole feed (batches 0 and 1) admits nothing new.
    run("pck_replay")
    idx2 = read_semantic_index(spark, state)
    assert idx2.count() == n
    assert {tuple(r["p_vec"]) for r in idx2.collect()} == got

    cur = open(os.path.join(state, "CURRENT")).read().strip()
    manifest = open(os.path.join(state, cur)).read()
    assert "#applied d0" in manifest, manifest


def test_blocklist_stream_equals_batch(spark, tmp_path):
    """The stateless per-row blocklist expression must equal the batch
    broadcast-join operator exactly (integer counts), through a real
    file stream in both modes."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.dedup import blocklist_hits
    from fotmobdatapipeline_spark.streaming.documents import blocklist_stream

    phrases = ["bad bad", "bad word", "three word phrase"]
    docs = spark.createDataFrame(
        [
            (1, "bad bad bad word here"),
            (2, "totally clean text"),
            (3, "a three word phrase and a three word phrase again"),
            (4, "bad"),
        ],
        "doc_id long, text string",
    )
    pdf = spark.createDataFrame([(p,) for p in phrases], "phrase string")
    want = {
        r["doc_id"]: (r["n_hits"], r["n_phrases"])
        for r in blocklist_hits(docs, pdf).collect()
    }
    src = str(tmp_path / "src")
    docs.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        blocklist_stream(stream, phrases)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "sink"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    landed = spark.read.parquet(str(tmp_path / "sink"))
    got = {
        r["doc_id"]: (r["n_hits"], r["n_phrases"])
        for r in landed.filter(F.col("n_hits") > 0).collect()
    }
    assert got == want
    clean = {r["doc_id"] for r in landed.filter(F.col("n_hits") == 0).collect()}
    assert clean == {2, 4}

    # drop mode keeps exactly the clean docs
    q2 = (
        blocklist_stream(stream, phrases, mode="drop")
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "sink2"))
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    kept = spark.read.parquet(str(tmp_path / "sink2"))
    assert {r["doc_id"] for r in kept.collect()} == {2, 4}
    assert set(kept.columns) == {"doc_id", "text"}


def test_blocklist_stream_rejects_unknown_mode(spark):
    """A misspelled mode must raise, not silently annotate (the drop
    policy would quietly not apply)."""
    import pytest

    from fotmobdatapipeline_spark.streaming.documents import blocklist_stream

    df = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    with pytest.raises(ValueError, match="annotate|drop"):
        blocklist_stream(df, ["x y"], mode="Drop")


def test_semantic_dedup_local_bit_equals_jvm(spark, tmp_path):
    """The numpy local-probe form (VERDICT r12 #6's throughput fix) must
    produce EXACTLY the JVM anti-join's survivor set AND cell
    assignments: its reductions are vectorized across rows/pairs but
    sequential across dimensions, so every scalar accumulator evolves
    through the identical IEEE-754 operation sequence as dot()'s fold.
    tau is set strictly INSIDE the observed cosine range so the feed
    carries both verdicts, and the comparison includes (vec_id, cell)
    pairs — a tie-break divergence in the cell argmax would fail even
    where the survivor verdict agrees."""
    from fotmobdatapipeline_spark.operators.similarity import kmeans_lloyd
    from fotmobdatapipeline_spark.sources.registry import read_table
    from fotmobdatapipeline_spark.streaming.similarity import (
        semantic_dedup_local,
        semantic_dedup_stream,
        semantic_index,
    )

    emb = read_table(spark, SF_SMALL, "embeddings").select("vec_id", "embedding")
    corpus = emb.filter(F.col("vec_id") < 250)
    feed_df = emb.filter(F.col("vec_id") >= 250)
    cents = kmeans_lloyd(corpus, k=4, iterations=2)
    index = semantic_index(corpus, cents).localCheckpoint(eager=False)

    n_feed = feed_df.count()
    survivor_counts = {}
    for tau in (0.15, 0.2, 0.25):
        jvm = {
            (r["vec_id"], r["cell"])
            for r in semantic_dedup_stream(feed_df, cents, index, tau=tau)
            .select("vec_id", "cell")
            .collect()
        }
        local = {
            (r["vec_id"], r["cell"])
            for r in semantic_dedup_local(feed_df, cents, index, tau=tau)
            .select("vec_id", "cell")
            .collect()
        }
        assert local == jvm, f"tau={tau}: local-probe diverged from JVM join"
        survivor_counts[tau] = len(jvm)
    # Both verdicts occur at tau=0.2 (the existing stream==batch test's
    # calibrated threshold), so the equality above is non-vacuous.
    assert 0 < survivor_counts[0.2] < n_feed, "only one verdict occurred"


def test_semantic_dedup_local_streams(spark, tmp_path):
    """semantic_dedup_local is a stateless Arrow map, so it must run
    unchanged on a streaming frame and emit the batch-identical rows."""
    from fotmobdatapipeline_spark.operators.similarity import kmeans_lloyd
    from fotmobdatapipeline_spark.sources.registry import read_table
    from fotmobdatapipeline_spark.streaming.similarity import (
        semantic_dedup_local,
        semantic_index,
    )

    emb = read_table(spark, SF_SMALL, "embeddings").select("vec_id", "embedding")
    corpus = emb.filter(F.col("vec_id") < 250)
    feed_df = emb.filter(F.col("vec_id") >= 250)
    feed_dir = str(tmp_path / "emb_feed_local")
    feed_df.repartition(4).write.mode("overwrite").parquet(feed_dir)
    cents = kmeans_lloyd(corpus, k=4, iterations=2)
    index = semantic_index(corpus, cents).localCheckpoint(eager=False)
    tau = 0.2

    batch_rows = {
        (r["vec_id"], r["cell"])
        for r in semantic_dedup_local(feed_df, cents, index, tau=tau)
        .select("vec_id", "cell")
        .collect()
    }
    stream = semantic_dedup_local(
        spark.readStream.schema(feed_df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed_dir),
        cents,
        index,
        tau=tau,
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("semantic_local_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    stream_rows = {
        (r["vec_id"], r["cell"])
        for r in spark.sql(
            "SELECT vec_id, cell FROM semantic_local_out"
        ).collect()
    }
    assert stream_rows == batch_rows
    assert 0 < len(batch_rows) < feed_df.count()
