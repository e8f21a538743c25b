"""Exact distributed quantiles.

``approx_percentile`` (KLL/GK sketches) is the right default at 100 TB,
but data-quality gates and oracle checks need *exact*, reproducible
quantiles.  ``exact_group_quantiles`` computes linear-interpolated
percentiles (the PERCENTILE_CONT definition) with NO per-group sort:

* rows collapse to one row per distinct (group, value) with counts —
  a map-side-combinable hash aggregate, never a data-scale window;
* the distinct-value table gets exact global ranks per group from the
  two-phase distributed prefix sum (operators/prefix.py — range
  shuffle + broadcast offsets; no group ever sorts inside ONE
  partition, which is what killed the old Window.partitionBy(group)
  .orderBy(v) row_number at data-scale groups like the 2-arm A/B
  split: half the corpus per window task);
* each percentile is picked out by rank arithmetic over the distinct
  rows — at most two distinct values contribute, so the float SUM is
  order-insensitive and the interpolation formula stays mirrored
  verbatim in the DuckDB oracle: results are bit-identical.

Works for BOTH regimes: categorical group keys with data-scale groups
(the prefix scan distributes each group across partitions) and
high-cardinality group keys (each group spans few partitions; offsets
stay <= n_parts + n_groups - 1 rows by range contiguity).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fotmobdatapipeline_spark.operators.prefix import grouped_running_sum


def exact_group_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    ps: Sequence[float] = (0.5, 0.9),
    names: Sequence[str] | None = None,
) -> DataFrame:
    """PERCENTILE_CONT per group via distinct-value rank arithmetic:
    each requested p contributes v[floor(pos)]*(1-frac) +
    v[floor(pos)+1]*frac where pos = (n-1)*p and v[r] is the r-th
    0-based order statistic — located by [below, below+cnt) rank-range
    containment on the distinct-value counts table instead of a
    row_number over raw rows (same values, distributed ranking)."""
    names = names or [f"p{int(p * 100)}" for p in ps]
    gcols = list(group_cols)
    g = (
        df.select(*gcols, F.col(value_col).alias("v"))
        .groupBy(*gcols, "v")
        .agg(F.count("*").alias("_cnt"))
    )
    r = grouped_running_sum(g, gcols, ["v"], "_cnt", out_col="_upto")
    # _below = exclusive rank offset: this distinct value covers 0-based
    # ranks [_below, _upto).  n = group row count — a combinable
    # aggregate joined back on the group key (AQE broadcasts the tiny
    # per-group side), never a window: no ordered or partition-less
    # window exists anywhere in this plan.
    n_per_group = r.groupBy(*gcols).agg(F.sum("_cnt").alias("n"))
    r = r.withColumn("_below", F.col("_upto") - F.col("_cnt"))
    # Both consumers read grouped_running_sum's internal checkpoint, so
    # the raw input is scanned exactly once.
    r = r.join(n_per_group, gcols) if gcols else r.crossJoin(n_per_group)
    aggs = []
    for p, name in zip(ps, names):
        pos = (F.col("n") - 1) * F.lit(p)
        flo = F.floor(pos)
        frac = pos - flo
        hit_lo = (F.col("_below") <= flo) & (flo < F.col("_upto"))
        hit_hi = (
            (frac > 0)
            & (F.col("_below") <= flo + 1)
            & (flo + 1 < F.col("_upto"))
        )
        # When both order statistics fall inside one tie run the two
        # terms add on the same row — IEEE addition is commutative, so
        # the value matches the per-row oracle sum bit for bit.
        contrib = (
            F.when(hit_lo & hit_hi, F.col("v") * (1 - frac) + F.col("v") * frac)
            .when(hit_lo, F.col("v") * (1 - frac))
            .when(hit_hi, F.col("v") * frac)
            .otherwise(F.lit(0.0))
        )
        aggs.append(F.sum(contrib).alias(name))
    return r.groupBy(*gcols).agg(*aggs)
