"""Structured Streaming over the documents corpus: online near-duplicate
suppression for an ingest feed.

Batch dedup (operators/dedup.py) assumes the corpus is at rest; a
training-data INGEST pipeline sees documents arrive continuously and
must drop near-duplicates online, with bounded state.  This module keys
streaming dedup on the per-row minhash signature
(operators/dedup.py::minhash_signature_cols): documents whose k minhash
chunks all match are near-duplicates (signature equality is the
rows_per_band=k LSH band — high precision, catches exact and
near-exact duplicates); state holds one signature per horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fotmobdatapipeline_spark.operators.dedup import (
    minhash_sig_expr,
    sentence_segments,
)


def with_minhash_sig(
    docs: DataFrame,
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Append a single `minhash_sig` string column (concatenated chunks;
    empty string for sub-shingle docs — NOT a valid dedup key)."""
    return docs.withColumn(
        "minhash_sig", minhash_sig_expr(F.col(text_col), num_hashes, shingle_n)
    )


def sentence_dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str | None = None,
    watermark: str = "2 hours",
    words_per_sentence: int = 8,
) -> DataFrame:
    """Streaming twin of the C4-style sentence dedup's FILTER stage
    (operators/dedup.py::sentence_dedup): explode each arriving document
    into sentences and emit only the first-SEEN occurrence of each —
    dedup state keyed on the sentence, watermark-expired when ``ts_col``
    is given.  Which document owns the surviving occurrence is
    arrival-order dependent (batch uses the (doc, position) total order
    instead); the distinct-sentence SET is the contract the test pins.
    Per-doc reconstruction is a downstream batch concern — a stream
    can't wait to learn which of a doc's sentences survive.

    Output: (doc_id, seg_idx, sentence[, ts]) rows that survived.
    """
    cols = [F.col(id_col)] + ([F.col(ts_col)] if ts_col else [])
    exploded = docs.select(
        *cols,
        F.posexplode(sentence_segments(text_col, words_per_sentence)).alias(
            "seg_idx", "sentence"
        ),
    )
    if docs.isStreaming and ts_col is not None:
        return exploded.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["sentence"]
        )
    return exploded.dropDuplicates(["sentence"])


def sentence_neardup_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str | None = None,
    watermark: str = "2 hours",
    words_per_sentence: int = 8,
    num_hashes: int = 4,
    shingle_n: int = 2,
) -> DataFrame:
    """Streaming twin of the FUZZY sentence dedup's filter stage
    (operators/dedup.py::sentence_neardup): explode each arriving doc
    into sentences, key dedup state on the per-sentence MinHash
    signature (same hash family/params as the batch op), emit only the
    first-SEEN occurrence per signature.  Sub-shingle sentences are
    unsignable and pass through on a per-(doc, position) key — same
    single-subtree pattern as ``neardup_stream(id_col=...)``.  Which
    occurrence survives is arrival-order dependent (batch uses the
    (doc, position) total order); the distinct-SIGNATURE set is the
    contract the test pins.

    Output: (doc_id, seg_idx, sentence[, ts]) rows that survived.
    """
    cols = [F.col(id_col)] + ([F.col(ts_col)] if ts_col else [])
    exploded = docs.select(
        *cols,
        F.posexplode(sentence_segments(text_col, words_per_sentence)).alias(
            "seg_idx", "sentence"
        ),
    )
    sig = minhash_sig_expr(F.col("sentence"), num_hashes, shingle_n)
    # 's:'/'m:' namespaces as in neardup_stream: a signature can never
    # collide with a pass-through key.  (doc, seg_idx) is per-row unique
    # by construction, so unsignable sentences always pass through.
    key = F.when(
        sig == "",
        F.concat_ws(":", F.lit("s"), F.col(id_col).cast("string"), F.col("seg_idx")),
    ).otherwise(F.concat(F.lit("m:"), sig))
    keyed = exploded.withColumn("__dedup_key", key)
    if docs.isStreaming and ts_col is not None:
        deduped = keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["__dedup_key"]
        )
    else:
        deduped = keyed.dropDuplicates(["__dedup_key"])
    return deduped.drop("__dedup_key")


def neardup_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "2 hours",
    num_hashes: int = 8,
    shingle_n: int = 3,
    id_col: str | None = None,
) -> DataFrame:
    """Keep the first-seen document per minhash signature; pass
    sub-shingle (unsignable) documents through untouched.

    With ``ts_col``, state is expired by the watermark
    (``dropDuplicatesWithinWatermark``) — bounded memory, at the cost of
    re-admitting a duplicate that re-appears after the horizon; without
    it, state is exact and unbounded (fine for bounded replays/backfills,
    not for a forever-stream).  A batch frame degrades to plain
    ``dropDuplicates`` on the signature — the batch twin the tests pin
    against.

    Pass ``id_col`` whenever the feed has a unique document id (real
    ingests do): unsignable docs then get a per-doc pass-through key and
    ONE dedup subtree serves every row — the signature pipeline runs
    once per row.  Without an id the pass-through needs a separate
    branch, and the streaming self-union scans the source and computes
    the signatures TWICE per micro-batch (measured 2x wall on the
    100k-row bench feed) — correctness-identical, cost-worse; only for
    feeds with no usable id.

    Keyed-mode pass-through contract: "untouched" holds per DISTINCT
    pass-through key, which is (id, ts) when ``ts_col`` is given and the
    bare id otherwise — an unsignable row whose key repeats (the same id
    re-ingested at the same timestamp, or without ``ts_col`` the same id
    twice) is suppressed as a replay, where the two-branch form would
    emit every copy.  The modes are row-identical exactly when the
    pass-through key is per-row unique.
    """
    signed = with_minhash_sig(docs, text_col, num_hashes, shingle_n)
    if id_col is not None:
        # 's:'/'m:' prefixes keep pass-through keys and signature keys in
        # disjoint namespaces, so a signature can never collide with an id.
        pass_key = [F.lit("s:"), F.col(id_col).cast("string")]
        if ts_col is not None:
            # Fold the arrival timestamp in so re-ingests of the same id
            # at different times pass through (matching the two-branch
            # form on any feed with unique (id, ts) rows).
            pass_key += [F.lit(":"), F.col(ts_col).cast("string")]
        key = F.when(
            F.col("minhash_sig") == "", F.concat(*pass_key)
        ).otherwise(F.concat(F.lit("m:"), F.col("minhash_sig")))
        keyed = signed.withColumn("__dedup_key", key)
        if docs.isStreaming and ts_col is not None:
            deduped = keyed.withWatermark(
                ts_col, watermark
            ).dropDuplicatesWithinWatermark(["__dedup_key"])
        else:
            deduped = keyed.dropDuplicates(["__dedup_key"])
        return deduped.drop("__dedup_key")
    short = signed.filter(F.col("minhash_sig") == "")
    dedupable = signed.filter(F.col("minhash_sig") != "")
    if docs.isStreaming and ts_col is not None:
        deduped = dedupable.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["minhash_sig"]
        )
    else:
        deduped = dedupable.dropDuplicates(["minhash_sig"])
    return deduped.unionByName(short)


def prep_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "2 hours",
    num_hashes: int = 8,
    shingle_n: int = 3,
    id_col: str | None = None,
) -> DataFrame:
    """The streaming INGEST form of the curation pipeline: Gopher rule
    filter (stateless, scan-speed — cuts state pressure before any
    keyed stage) -> online near-duplicate suppression keyed on the
    minhash signature.  Composes two proven pieces; the filter runs
    first for the same reason the batch v2 pipeline orders it first —
    everything downstream, including the dedup STATE, shrinks.
    """
    from fotmobdatapipeline_spark.functions.text import gopher_rules

    rules = gopher_rules(F.col(text_col))
    keep = None
    for name in rules:
        keep = rules[name] if keep is None else (keep & rules[name])
    return neardup_stream(
        docs.filter(keep),
        text_col=text_col,
        ts_col=ts_col,
        watermark=watermark,
        num_hashes=num_hashes,
        shingle_n=shingle_n,
        id_col=id_col,
    )


def url_dedup_stream(
    docs: DataFrame,
    url_col: str = "url",
    ts_col: str | None = None,
    watermark: str = "24 hours",
) -> DataFrame:
    """Online URL-level dedup for a crawl feed: key each arriving page
    by its CANONICAL URL (functions/urls.py — case/port/fragment/
    tracker/param-order invariant) and keep the first copy per horizon
    via ``dropDuplicatesWithinWatermark``.  The canonical form catches
    re-crawls whose raw URLs differ only in decoration — the dominant
    crawl-duplicate class — before any content hashing spends compute.
    Pages that don't parse as absolute URLs pass through unconditionally
    (each gets a never-matching surrogate key — content-level dedup
    downstream owns them; in a stream they cost one state entry each
    until the watermark expires it).  A streaming frame REQUIRES
    ``ts_col``: without a watermark the dedup state would grow with
    every distinct URL forever, so that case raises instead of silently
    degrading.  Batch frames keep the deterministic first copy —
    earliest ``ts_col`` (total-ordered by the remaining columns), so a
    backfill over the same data always keeps the same rows.  ONE scan
    either way: the canonical key is computed once per row."""
    from pyspark.sql import Window

    from fotmobdatapipeline_spark.functions.urls import canonicalize_url

    if docs.isStreaming and ts_col is None:
        raise ValueError(
            "streaming url_dedup_stream needs ts_col: watermark-less "
            "streaming dedup state grows unboundedly"
        )
    canon = canonicalize_url(F.col(url_col))
    keyed = docs.withColumn("canonical_url", canon).withColumn(
        "__k",
        F.coalesce(
            F.col("canonical_url"),
            F.concat(F.lit("__unparsed__:"), F.expr("uuid()")),
        ),
    )
    if docs.isStreaming:
        kept = keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["__k"]
        )
    else:
        order = ([F.col(ts_col)] if ts_col is not None else []) + [
            F.col(c) for c in docs.columns
        ]
        w = Window.partitionBy("__k").orderBy(*order)
        kept = keyed.withColumn("__rn", F.row_number().over(w)).filter(
            F.col("__rn") == 1
        ).drop("__rn")
    return kept.drop("__k")


def blocklist_flags_expr(text, phrase_list: list[str]):
    """struct(n_hits, n_phrases) for one document against an embedded
    banned-phrase list — the per-ROW form of
    operators/dedup.py::blocklist_hits: same gram lengths (exactly those
    present in the list), same occurrence counting (overlaps included),
    so a stream scored row-by-row equals the batch groupBy on the same
    rows.

    The list is embedded as an array LITERAL (the dsir_score_expr
    pattern): blocklists are model-sized reference data, and a per-row
    expression needs no join at all — strictly better for a stream than
    a stream-static join (no shuffle, no per-batch re-plan concern).
    Cost is O(grams × |list|) per row via array_contains; for
    six-figure phrase lists use the batch operator's broadcast join in
    a foreachBatch body instead (batch plans get AQE)."""
    from fotmobdatapipeline_spark.functions.hof import bind_once
    from fotmobdatapipeline_spark.operators.dedup import _word_grams_occurrences

    if not phrase_list:
        # F.lit([]) is ARRAY<VOID>; an empty list means zero hits, not
        # an analysis crash (matches blocklist_hits' empty-table path).
        return F.struct(
            F.lit(0).alias("n_hits"), F.lit(0).alias("n_phrases")
        )
    lengths = sorted({len(p.split(" ")) for p in phrase_list})
    parr = F.lit(sorted(set(phrase_list)))

    def body(grams):
        hit = F.filter(grams, lambda g: F.array_contains(parr, g))
        return F.struct(
            F.size(hit).alias("n_hits"),
            F.size(F.array_distinct(hit)).alias("n_phrases"),
        )

    return bind_once(_word_grams_occurrences(text, lengths), body)


def blocklist_stream(
    stream: DataFrame,
    phrase_list: list[str],
    text_col: str = "text",
    mode: str = "annotate",
) -> DataFrame:
    """Banned-phrase filtering on an INGEST stream — the online half of
    the C4 badwords step.  Stateless per-row expression (append mode, no
    watermark, no state, no join): ``mode='annotate'`` adds
    (n_hits, n_phrases) to every document; ``mode='drop'`` keeps only
    clean documents (the C4 policy).  Counts are integers, so
    stream == batch is exact equality, pinned in tests."""
    if mode not in ("annotate", "drop"):
        # A misspelled mode must not silently fall through to annotate —
        # the drop policy would quietly not apply and banned docs would
        # land in the corpus.
        raise ValueError(f"blocklist_stream mode must be annotate|drop, got {mode!r}")
    s = blocklist_flags_expr(F.col(text_col), phrase_list)
    staged = stream.withColumn("_bl", s)
    out = staged.select(
        "*",
        F.col("_bl")["n_hits"].alias("n_hits"),
        F.col("_bl")["n_phrases"].alias("n_phrases"),
    ).drop("_bl")
    if mode == "drop":
        return out.filter(F.col("n_hits") == 0).drop("n_hits", "n_phrases")
    return out
