"""Exact weighted 2-D dominance counting — the distributed kernel of
Kendall's tau (concordant-pair counting).

Problem: given cells (x_rank, y, w) — w points collapsed onto each
distinct (x, y) — count SUM(w_a * w_b) over cell pairs with
x_rank_a < x_rank_b AND y_a < y_b.  A naive pair join is O(cells^2);
the classic sequential answer is merge-sort / BIT counting at
O(n log n).  This operator is the distributed form of the merge step:

Every pair (a, b) with rank_a < rank_b diverges at exactly one bit of
the zero-based rank — the highest bit where the two ranks differ.  At
that bit's level l (block = rank >> l), a falls in the LEFT half of the
block and b in the RIGHT half.  So the total dominated weight is a sum
over levels l = 1..ceil(log2 R) of independent per-(level, block)
1-D problems: for each right-half cell b, the left-half weight with
y < y_b — an inclusive prefix sum in (y, side) order where right-half
rows sort BEFORE left-half rows at equal y (strict inequality for
free, and the prefix value at a right row is invariant to tie order
because every right row carries zero weight).

Scale shape (the reason this is not one grouped scan): block
cardinality halves per level, so the regimes at the two ends are
opposites —

* low levels: many tiny blocks -> a plain ``Window.partitionBy(level,
  block)`` is correct and fully parallel (no global collapse: the
  window key is data-scale);
* high levels: few data-scale blocks -> ``Window.partitionBy`` would
  collapse each block onto one task (the top level is ONE block holding
  every cell — the exact single-partition scale-killer this repo's
  prefix machinery exists to avoid), so those levels ride
  :func:`~fotmobdatapipeline_spark.operators.prefix.grouped_running_sum`
  (range-contiguous groups, broadcastable offsets).

The split point is driver-side arithmetic from R (#distinct x) alone:
levels with ``ceil(R / 2^l) > 4 * shuffle_partitions`` blocks take the
window path, the rest the grouped scan.  Total work is
O(cells * log R) rows through hash/range shuffles — the merge-sort
bound, fully distributed at any cell cardinality.

Used by plans/events.py::events_kendall_tau (exact tau-b).  The DuckDB
oracle does NOT replay this algorithm: concordant/discordant counts are
algorithm-independent integers, so the oracle pair-joins the (tiny at
oracle scale) per-user table directly.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fotmobdatapipeline_spark.operators.prefix import grouped_running_sum


def dominated_pair_weight(
    cells: DataFrame,
    rank0_col: str,
    y_col: str,
    w_col: str,
    n_ranks: int,
    out_col: str = "w_dom",
) -> DataFrame:
    """1-row DataFrame: ``out_col`` = SUM(w_a * w_b) over cell pairs with
    ``rank0_a < rank0_b`` and ``y_a < y_b``.

    ``rank0_col`` must be a DENSE zero-based rank of the x values
    (0..n_ranks-1, equal x -> equal rank); ``n_ranks`` is its
    cardinality, known to the caller (one scalar count — model-sized).
    Cells must be unique per (rank0, y); weights are positive BIGINTs.
    The result is exact as long as the true pair total fits int64
    (n <= ~4.3e9 points — documented at the call sites).
    """
    if n_ranks < 2:
        # 0 or 1 distinct x value: no strictly-ordered x pairs exist.
        return cells.sparkSession.range(1).select(
            F.lit(0).cast("bigint").alias(out_col)
        )
    spark = cells.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # == ceil(log2(n_ranks)) for every n_ranks >= 1, in pure integer
    # arithmetic — the exactness claim has no float-rounding caveat
    levels = max(1, (int(n_ranks) - 1).bit_length())
    # A level is "wide" (many small blocks -> plain window) while its
    # block count exceeds 4x the shuffle parallelism; beyond that the
    # per-block row counts are data-scale and the grouped two-phase
    # prefix scan takes over (its offsets side stays broadcast-tiny
    # exactly because those levels have few blocks).
    wide = [
        lv
        for lv in range(1, levels + 1)
        if math.ceil(n_ranks / (1 << lv)) > 4 * n_parts
    ]
    deep = [lv for lv in range(1, levels + 1) if lv not in set(wide)]

    def expand(lvs: list[int]) -> DataFrame:
        lf = spark.createDataFrame([(lv,) for lv in lvs], "lvl int")
        ex = cells.crossJoin(F.broadcast(lf))
        # pyspark's F.shiftright requires a LITERAL shift amount; the SQL
        # expression form accepts a column, which the per-level fan-out
        # needs (one shift per exploded level row).
        half = F.expr(f"shiftright({rank0_col}, lvl - 1)").bitwiseAND(F.lit(1))
        return ex.select(
            "lvl",
            F.expr(f"shiftright({rank0_col}, lvl)").alias("blk"),
            F.col(y_col).alias("_y"),
            # right rows sort before left rows at equal y -> inclusive
            # prefix at a right row sums exactly the left weight with
            # strictly smaller y.
            (1 - half).alias("_sid"),
            F.col(rank0_col).alias("_rk"),
            F.when(half == 0, F.col(w_col)).otherwise(F.lit(0)).alias("_wl"),
            F.when(half == 1, F.col(w_col)).otherwise(F.lit(0)).alias("_wr"),
        )

    parts = []
    if wide:
        exw = expand(wide)
        w_run = (
            Window.partitionBy("lvl", "blk")
            .orderBy("_y", "_sid", "_rk")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        parts.append(exw.withColumn("_pre", F.sum("_wl").over(w_run)))
    if deep:
        parts.append(
            grouped_running_sum(
                expand(deep),
                ["lvl", "blk"],
                ["_y", "_sid", "_rk"],
                "_wl",
                out_col="_pre",
            )
        )
    scanned = parts[0]
    for p in parts[1:]:
        scanned = scanned.unionByName(p)
    return scanned.agg(
        F.coalesce(
            F.sum(F.col("_wr") * F.col("_pre")), F.lit(0)
        ).cast("bigint").alias(out_col)
    )
