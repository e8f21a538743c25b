"""Join strategies beyond plain equi-joins: range-band joins, skew-salted
joins, and time-interval joins — each written as the shape that survives a
100 TB / 1000-executor scale-up.

The reference only ever does broadcast-sized inner equi-joins
(fotmob-dag.py:144-148, sql/create_looker_data_table.sql:21-25); these
operators are the engine's extensions for the cases Spark meets at scale:

* **Range joins** (value BETWEEN lo AND hi): a naive inequality join is a
  BroadcastNestedLoopJoin — O(|fact| x |bands|) comparisons.  When bands
  are uniform-width, ``range_band_join`` computes the band id
  arithmetically and joins on it — a plain (broadcast) hash equi-join,
  O(|fact|).  This is the standard rewrite Databricks' range-join
  optimization performs; we do it at the API level.
* **Skewed keys**: one hot key makes one shuffle partition take the whole
  stage's wall time.  ``salted_join`` splinters every build-side row into
  ``n_salts`` copies keyed by (key, salt) and assigns each probe-side row
  a deterministic salt, so a hot key spreads over ``n_salts`` reducers.
  AQE's skew-join split handles moderate skew automatically; explicit
  salting is the heavy-artillery version that also works mid-aggregation.
* **Interval self-joins** (b.ts in [a.ts - w, a.ts]): the naive form is a
  cartesian-per-user nested loop.  ``interval_bucket_join`` buckets
  timestamps to width-``w`` bins and equi-joins on (user, bin) with the
  probe side expanded to {bin-1, bin}; the exact range predicate then
  filters the 2x-bounded candidate set.  Shuffle is linear in events, and
  each candidate pair is produced exactly once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def uniform_band_id(value: Column, width: float, n_bands: int) -> Column:
    """Band index for uniform-width bands [i*width, (i+1)*width), clamped
    to [0, n_bands-1] so out-of-range values land in the edge bands."""
    raw = F.floor(value / F.lit(width))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n_bands - 1)).cast("int")


def range_band_join(
    fact: DataFrame,
    value_col: str,
    width: float,
    n_bands: int,
    band_col: str = "band_id",
) -> DataFrame:
    """Attach a uniform band id + bounds to every fact row via arithmetic
    (no join at all — the degenerate-but-optimal plan for uniform bands).

    Equivalent to ``fact JOIN bands ON value >= lo AND value < hi`` but
    O(1) per row with zero shuffle; at 100 TB the inequality join would be
    a nested-loop disaster.  Non-uniform bands: bucket by a sorted-bounds
    lookup (broadcast ``F.width_bucket``-style) — same idea, still no
    nested loop.
    """
    band = uniform_band_id(F.col(value_col), width, n_bands)
    return fact.withColumn(band_col, band).withColumn(
        "band_lo", (F.col(band_col) * F.lit(width)).cast("double")
    ).withColumn("band_hi", ((F.col(band_col) + 1) * F.lit(width)).cast("double"))


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_salt: Column,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: replicate ``build`` ``n_salts`` times with
    a salt column, give each ``probe`` row a deterministic salt in
    [0, n_salts), and join on (key, salt).

    Result is row-identical to ``probe.join(build, key, how)`` for
    ``inner`` / ``left`` / ``left_semi`` / ``left_anti`` joins; the salt
    only changes the *physical* distribution, splitting any hot key's rows
    across ``n_salts`` shuffle partitions.  Right/full-outer ``how`` is
    rejected: ``build`` is replicated before the join, so each unmatched
    build row would be emitted ``n_salts`` times.  ``probe_salt`` must be
    deterministic (e.g. ``pmod(hash(other_col), n_salts)``) so re-runs and
    retried tasks produce identical placement.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports how in {sorted(allowed)}; got {how!r} — "
            "build-side replication would duplicate unmatched build rows "
            "in right/full outer joins"
        )
    salted_build = build.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    salted_probe = probe.withColumn("__salt", probe_salt.cast("int") % n_salts)
    return salted_probe.join(salted_build, [key, "__salt"], how).drop("__salt")


def interval_bucket_join(
    events: DataFrame,
    left_filter: Column,
    right_filter: Column,
    window_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Time-bounded self-join: pair every left event ``a`` with right
    events ``b`` of the same user with ``b.ts`` in ``(a.ts - w, a.ts]``,
    excluding the same instant pairing with itself is allowed (a != b
    guaranteed only when filters are disjoint).

    Scale path: bucket epoch seconds to width-``w`` bins; a qualifying
    ``b`` is always in a's bin or the previous one, so the left side is
    expanded to 2 bucket keys and joined hash-style on (user, bucket) —
    no per-user nested loop, shuffle linear in events, AQE handles
    residual per-user skew.

    Output columns: user, a_id, a_ts, b_id, b_ts (one row per qualifying
    pair).  All time math is integer microseconds (``unix_micros``) —
    epoch *seconds* as DOUBLE cannot represent µs exactly, and a
    boundary-equal pair must not flip in/out between engines or runs.
    """
    w_us = F.lit(window_seconds * 1_000_000)
    epoch = lambda c: F.unix_micros(F.col(c))  # noqa: E731

    a = events.filter(left_filter).select(
        F.col(user_col).alias("user"),
        F.col("event_id").alias("a_id"),
        F.col(ts_col).alias("a_ts"),
        F.floor(epoch(ts_col) / w_us).alias("__bin"),
    )
    # Each left row probes its own bin and the previous one.
    a2 = a.withColumn(
        "__bucket", F.explode(F.array(F.col("__bin") - 1, F.col("__bin")))
    ).drop("__bin")

    b = events.filter(right_filter).select(
        F.col(user_col).alias("user"),
        F.col("event_id").alias("b_id"),
        F.col(ts_col).alias("b_ts"),
        F.floor(epoch(ts_col) / w_us).alias("__bucket"),
    )

    pairs = a2.join(b, ["user", "__bucket"])
    in_window = (epoch("b_ts") > epoch("a_ts") - w_us) & (
        epoch("b_ts") <= epoch("a_ts")
    )
    return pairs.filter(in_window).select("user", "a_id", "a_ts", "b_id", "b_ts")
