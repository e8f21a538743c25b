"""Exact distributed quantiles.

``approx_percentile`` (KLL/GK sketches) is the right default at 100 TB,
but data-quality gates and oracle checks need *exact*, reproducible
quantiles.  ``exact_group_quantiles`` computes linear-interpolated
percentiles (the PERCENTILE_CONT definition) from one per-group sort:

* one shuffle (partition by group), one in-partition sort;
* each percentile is picked out by rank arithmetic — no second pass,
  no collect, no per-group memory beyond the window sort itself;
* the interpolation formula is written once and mirrored verbatim in
  the DuckDB oracle, so results are bit-identical.

Groups must individually fit a partition's sort (true for categorical
group keys; for a global quantile over 100 TB rows use the sketch or a
two-pass range-partitioned selection instead).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_group_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    ps: Sequence[float] = (0.5, 0.9),
    names: Sequence[str] | None = None,
) -> DataFrame:
    """PERCENTILE_CONT per group: rank the values once, then each
    requested p contributes v[floor(pos)]*(1-frac) + v[floor(pos)+1]*frac
    where pos = (n-1)*p."""
    names = names or [f"p{int(p * 100)}" for p in ps]
    gcols = list(group_cols)
    w = Window.partitionBy(*gcols).orderBy("v")
    ranked = df.select(*gcols, F.col(value_col).alias("v")).select(
        "*",
        (F.row_number().over(w) - 1).alias("rn"),
        F.count("*").over(Window.partitionBy(*gcols)).alias("n"),
    )
    aggs = []
    for p, name in zip(ps, names):
        pos = (F.col("n") - 1) * F.lit(p)
        flo = F.floor(pos)
        frac = pos - flo
        contrib = (
            F.when(F.col("rn") == flo, F.col("v") * (1 - frac))
            .when((frac > 0) & (F.col("rn") == flo + 1), F.col("v") * frac)
            .otherwise(F.lit(0.0))
        )
        aggs.append(F.sum(contrib).alias(name))
    return ranked.groupBy(*gcols).agg(*aggs)
