"""Deterministic sampling operators.

``df.sample()`` is seed-stable only for a fixed partitioning — a re-run
with different file splits samples a different row set, which poisons
oracle checks and makes 100 TB pipeline stages non-reproducible.  These
operators sample on a *content hash* of a key column instead: the same
row is in or out of the sample regardless of partitioning, cluster size,
file layout, or engine — the property an incremental training-data
pipeline needs (a document keeps its sample fate across re-crawls).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Two-hex-digit md5 prefixes are uniform over 256 values; keeping
# prefixes < this bound samples bound/256 of the keyspace.
_HEX2 = 256


def bounded_topk_per_group(
    df: DataFrame,
    group_cols: list[str] | tuple[str, ...],
    order_cols: list[Column],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Exact top-k rows per group WITHOUT ever sorting a whole group in
    one task — the scale-safe replacement for
    ``row_number().over(Window.partitionBy(group).orderBy(...)) <= k``
    when groups are few and data-scale (the agg_winsorized class: a
    handful of categorical keys means a handful of single-task sorts).

    Two phases, both bounded: (1) prune within each INPUT partition — a
    window over (spark_partition_id, group) sorts at most one task's
    rows and keeps its local top-k, leaving ≤ k·n_parts survivors per
    group; (2) rank ONLY the survivors per group (window input bounded
    by construction).  Lossless for any partition assignment: every
    global top-k row is in its own partition's local top-k, and its
    global rank is decided by rows above it, all of which also survive
    — so ``rank_col`` (if requested) is the exact global rank.

    ``order_cols`` are Column expressions (use ``F.desc(...)`` for
    descending) and must be deterministic — they are evaluated in both
    phases.  The total order they induce must be unique per group for a
    deterministic row set (same contract as the window it replaces).

    Raises on input columns that collide with the three internal helper
    columns (same contract as ``block_spans``): a caller frame already
    carrying one of these names would otherwise be silently overwritten
    and dropped, corrupting output."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    clash = {"__tk_pid", "__tk_lrk", "__tk_rk"} & set(df.columns)
    if clash:
        raise ValueError(
            f"bounded_topk_per_group helper columns collide with input: "
            f"{sorted(clash)}"
        )
    gcols = list(group_cols)
    w_local = Window.partitionBy("__tk_pid", *gcols).orderBy(*order_cols)
    survivors = (
        df.withColumn("__tk_pid", F.spark_partition_id())
        .withColumn("__tk_lrk", F.row_number().over(w_local))
        .filter(F.col("__tk_lrk") <= k)
    )
    w_global = Window.partitionBy(*gcols).orderBy(*order_cols)
    ranked = (
        survivors.withColumn("__tk_rk", F.row_number().over(w_global))
        .filter(F.col("__tk_rk") <= k)
        .drop("__tk_pid", "__tk_lrk")
    )
    if rank_col is None:
        return ranked.drop("__tk_rk")
    return ranked.withColumnRenamed("__tk_rk", rank_col)


def hash_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Keep rows whose md5(key) falls in the first ``fraction`` of the
    hash space (granularity 1/256).  Map-side only — no shuffle, no RNG,
    no seed; portable across engines (md5 of the decimal string form).
    """
    bound = max(1, round(fraction * _HEX2))
    return df.filter(hash_bucket_256(F.col(key)) < bound)


def hash_bucket_256(key: Column) -> Column:
    """Uniform bucket in [0, 256) from the md5 of the key's string form."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 2), 16, 10).cast("int")


def stratified_sample(
    df: DataFrame, stratum: str, key: str, rates: dict[str, float]
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its
    ``hash_bucket_256(key)`` falls under the stratum's own bound
    (``round(rate * 256)``).  The dataset-mixture primitive — e.g. keep
    100% of rare 'error' events but 5% of 'view' events — with the same
    partitioning-independence as :func:`hash_sample`: map-side only, no
    shuffle, no RNG, and a row's fate never changes across re-runs or
    engines.  Strata absent from ``rates`` are dropped (rate 0).

    The rate table is a literal CASE chain, not a join: strata counts are
    human-scale (event types, languages, sources), so the lookup stays in
    whole-stage codegen rather than costing a broadcast.
    """
    bound = F.lit(0)
    for s, rate in sorted(rates.items()):
        bound = F.when(F.col(stratum) == s, F.lit(round(rate * _HEX2))).otherwise(bound)
    return df.filter(hash_bucket_256(F.col(key)) < bound)


def reservoir_per_group(
    df: DataFrame,
    group_cols: list[str] | tuple[str, ...],
    key: str,
    k: int,
    salt: str = "0",
) -> DataFrame:
    """Deterministic per-group reservoir sample: exactly ``min(k,
    |group|)`` rows per group, chosen as the k smallest salted content
    hashes (bottom-k priority sampling).  Statistically identical to a
    uniform k-reservoir per group — each row's priority ``md5(salt:key)``
    is an iid uniform draw, and keeping the k smallest priorities is the
    distributed form of reservoir sampling — but with zero RNG state: the
    same rows are chosen on any partitioning, cluster size, or engine,
    and a new ``salt`` is a fresh independent redraw (epoch resample).

    Plan (two-phase distributed bottom-k, round 12 — the single
    per-group window this replaces concentrated each stratum in one
    task, the agg_winsorized class): phase 1 prunes WITHIN each input
    partition — a window over (spark_partition_id, group) keeps each
    partition's local bottom-k, never sorting more than one task's rows
    — leaving ≤ k·n_parts survivors per group; phase 2 ranks only those
    survivors per group (bounded by construction, so its window input
    is k·n_parts rows per group, not the corpus).  Lossless for ANY
    partition assignment: every global bottom-k row is in its own
    partition's local bottom-k.
    """
    pr = shuffle_key(F.col(key), salt)
    return bounded_topk_per_group(df, group_cols, [pr, F.col(key)], k)


def shuffle_key(key: Column, salt: str = "0") -> Column:
    """Deterministic pseudo-random total order for training-data
    shuffling: md5 of the salted key string.  A different salt is a
    fresh, reproducible epoch-level reshuffle — no RNG state, identical
    across engines, partitionings, and re-runs."""
    return F.md5(F.concat(F.lit(f"{salt}:"), key.cast("string")))


def shuffle_shard(key: Column, n_shards: int, salt: str = "0") -> Column:
    """Shard in [0, n_shards) from the first 32 bits (8 hex chars) of the
    shuffle key.  Rows land in a shard uniformly and independently of
    their natural order — the global-shuffle property training reads need
    (any prefix of shards is an unbiased subsample).  Deriving from 32
    bits instead of one byte keeps the modulo bias below n_shards/2^32
    (< 2e-5 relative at the 65536 cap), so 'uniform' holds for any
    n_shards, not just divisors of 256."""
    if not 1 <= n_shards <= 65536:
        raise ValueError("n_shards must be in [1, 65536]")
    b = F.conv(F.substring(shuffle_key(key, salt), 1, 8), 16, 10).cast("bigint")
    return (b % n_shards).cast("int")


def temperature_mixture_weights(
    df: DataFrame, group_col: str, budget: int, temperature: float = 2.0
) -> DataFrame:
    """Temperature-scaled multinomial mixture weights (the multilingual-
    corpus sampling rule of mBERT/XLM-R/mT5): a group's sampling share
    is n_g^(1/T) / sum_h n_h^(1/T) — T=1 is proportional, T->inf is
    uniform; fractional powers up-weight small groups so low-resource
    slices are not drowned.

    Only ``temperature=2`` is supported: n^(1/2) = sqrt(n), and sqrt is
    IEEE correctly-rounded in every engine while pow(x, 1/T) is a libm
    call that differs in the last ulp — the module's ln-free doctrine.
    The denominator is a sequential fold over the GROUP-SORTED weight
    list (a plain SUM over doubles would be partition-order-dependent).

    Scale shape: one map-side-combinable count per group, then a
    single #groups-row aggregate broadcast back — the corpus is scanned
    once; everything downstream is arithmetic on a tiny frame.

    Output: (group, n_docs, weight, share, expected_docs) where
    expected_docs = share * budget.
    """
    if temperature != 2.0:
        raise ValueError("only temperature=2 (sqrt) is bit-portable")
    counts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").alias("n_docs")
    )
    total = counts.agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("grp", "n_docs"))),
                lambda s: F.sqrt(s["n_docs"].cast("double")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("denom")
    )
    w = F.sqrt(F.col("n_docs").cast("double"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            w.alias("weight"),
            (w / F.col("denom")).alias("share"),
            (w / F.col("denom") * F.lit(float(budget))).alias("expected_docs"),
        )
    )
