"""Pairwise-preference aggregation: win rates and Bradley-Terry ratings
over "arena battle" logs (model A vs model B, judged winner).

Preference pairs are the raw material of RLHF / DPO data curation; the
two operators here are the curation-side aggregates over them:

* ``win_rates`` — per-model battle/win counts and Laplace-smoothed win
  rate.  One explode + one hash aggregate; map-side combinable.
* ``btl_ratings`` — Bradley-Terry strength parameters via Hunter's MM
  algorithm (D.R. Hunter, "MM algorithms for generalized Bradley-Terry
  models", Annals of Statistics 2004), the standard model behind arena
  leaderboards.  Fixed-round iteration over the *aggregated* pairwise
  win matrix — data-scale battles are collapsed to one row per directed
  (model, opponent) pair first, so the iteration cost is bounded by the
  number of distinct matchups, not the number of battles.

Determinism: all MM arithmetic is exact-integer micro-units (ratings
are integer multiples of 1/UNIT), every division the exact decimal
floor-division from operators/exactmath.py (truncating; identical to
DuckDB's ``//`` on HUGEINT — verified by the value-exact oracle for
``pref_btl_ratings``, and safe at any intermediate magnitude up to
1e38, unlike Spark's LONG-wrapping ``div``).  No float enters until the
final display-only rating = micro / UNIT division (one IEEE op,
bit-portable).

Scale notes:
* The battles -> win-matrix collapse is the only data-scale shuffle
  (one hash aggregate on the unordered pair key, map-side combinable).
* Each MM round is two hash joins (matrix x ratings on both endpoints),
  one aggregate, and a 1-row normalization scalar joined back — the
  same bounded shuffle pair every round (operators/graph.py::pagerank
  shape).  ``localCheckpoint`` truncates lineage per round.
* Laplace smoothing (+1 virtual win each way per observed matchup)
  keeps every model's win total positive, so no denominator in the MM
  update can be zero and ratings stay strictly positive — the standard
  regularization, and the reason the fixed-round iteration is total.

Nothing like this exists in the reference (its only rollups are sums
over match facts, fotmob-dag.py:151-176); this is north-star LLM-data
surface: preference-data curation for the RLHF stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fotmobdatapipeline_spark.operators.exactmath import floor_div as _floor_div

UNIT = 10**12
_U2 = UNIT * UNIT


def side_win_counts(
    battles: DataFrame,
    model_a: str = "model_a",
    model_b: str = "model_b",
    winner: str = "winner",
) -> DataFrame:
    """Per-model exact (model, n_battles, n_wins): one explode (each
    battle contributes one row per side) and one map-side-combinable
    hash aggregate.  Shared by the batch win_rates and the streaming
    leaderboard sink's per-batch increments — ONE definition of what a
    win is.  A battle whose winner matches neither side (tie) counts
    as a battle with no win for both."""
    sides = battles.select(
        F.explode(
            F.array(
                F.struct(
                    F.col(model_a).alias("model"),
                    (F.col(winner) == F.col(model_a)).cast("long").alias("win"),
                ),
                F.struct(
                    F.col(model_b).alias("model"),
                    (F.col(winner) == F.col(model_b)).cast("long").alias("win"),
                ),
            )
        ).alias("s")
    ).select("s.*")
    return sides.groupBy("model").agg(
        F.count("*").alias("n_battles"), F.sum("win").alias("n_wins")
    )


def with_rates(counts: DataFrame, smooth: int = 1) -> DataFrame:
    """Attach win_rate and the add-``smooth`` smoothed rate to a
    (model, n_battles, n_wins) counts table — single IEEE divisions of
    exact integers, shared by batch and the leaderboard reader."""
    return counts.select(
        "*",
        (F.col("n_wins").cast("double") / F.col("n_battles").cast("double")).alias(
            "win_rate"
        ),
        (
            (F.col("n_wins") + F.lit(smooth)).cast("double")
            / (F.col("n_battles") + F.lit(2 * smooth)).cast("double")
        ).alias("smoothed_rate"),
    )


def win_rates(
    battles: DataFrame,
    model_a: str = "model_a",
    model_b: str = "model_b",
    winner: str = "winner",
    smooth: int = 1,
) -> DataFrame:
    """Per-model (model, n_battles, n_wins, win_rate, smoothed_rate)."""
    counts = side_win_counts(battles, model_a, model_b, winner)
    return with_rates(counts, smooth).select(
        "model", "n_battles", "n_wins", "win_rate", "smoothed_rate"
    )


def pairwise_win_matrix(
    battles: DataFrame,
    model_a: str = "model_a",
    model_b: str = "model_b",
    winner: str = "winner",
    smooth: int = 1,
) -> DataFrame:
    """Directed smoothed win matrix: (model, opponent, n_pair, wins).

    Battles collapse to one row per unordered matchup (the only
    data-scale aggregate), then expand to the two directed rows the MM
    update consumes.  Non-decisive battles — winner matching NEITHER
    side ('tie', 'bothbad', malformed) — are excluded from the matrix
    (the standard BTL treatment; counting them for either side would
    bias ratings toward an arbitrary tiebreak).  ``smooth`` virtual
    wins are added in each direction (n_pair = w1 + w2 + 2*smooth), so
    wins >= 1 for every model.
    """
    return smoothed_matrix_from_pairs(
        raw_pair_counts(battles, model_a, model_b, winner), smooth
    )


def raw_pair_counts(
    battles: DataFrame,
    model_a: str = "model_a",
    model_b: str = "model_b",
    winner: str = "winner",
) -> DataFrame:
    """Unsmoothed per-matchup counts (m1, m2, w1, w2), m1 < m2 — plain
    mergeable sums, so the streaming matrix sink can fold per-batch
    outputs by (m1, m2)-wise SUM and stay cell-identical to a batch
    build (the same mergeability argument as side_win_counts)."""
    lo = F.least(F.col(model_a), F.col(model_b))
    hi = F.greatest(F.col(model_a), F.col(model_b))
    return (
        battles.select(
            lo.alias("m1"),
            hi.alias("m2"),
            (F.col(winner) == lo).cast("long").alias("w1"),
            (F.col(winner) == hi).cast("long").alias("w2"),
        )
        .groupBy("m1", "m2")
        .agg(F.sum("w1").alias("w1"), F.sum("w2").alias("w2"))
    )


def smoothed_matrix_from_pairs(pair: DataFrame, smooth: int = 1) -> DataFrame:
    """(model, opponent, n_pair, wins) directed smoothed matrix from
    the raw pair counts — the exact form btl_ratings consumes."""
    s = F.lit(smooth)
    n_sm = (F.col("w1") + F.col("w2") + 2 * s).alias("n_pair")
    fwd = pair.select(
        F.col("m1").alias("model"),
        F.col("m2").alias("opponent"),
        n_sm,
        (F.col("w1") + s).alias("wins"),
    )
    rev = pair.select(
        F.col("m2").alias("model"),
        F.col("m1").alias("opponent"),
        n_sm,
        (F.col("w2") + s).alias("wins"),
    )
    return fwd.unionByName(rev)


def btl_ratings(matrix: DataFrame, iters: int = 6) -> DataFrame:
    """(model, n_wins, rating_micro, rating) after ``iters`` MM rounds.

    MM update (Hunter 2004):  p_i' = W_i / sum_j n_ij / (p_i + p_j),
    then normalize so ratings sum to n_models * UNIT (keeps the integer
    scale stable across rounds).  In micro-units, every division the
    exact decimal floor-division above (truncating; identical to
    DuckDB's HUGEINT ``//`` on non-negative values):

        t_ij = (n_ij * UNIT^2) fdiv (p_i + p_j)      -- all DECIMAL(38,0)
        p_i' = (W_i  * UNIT^2) fdiv sum_j t_ij
        p_i  = (p_i' * n_models * UNIT) fdiv sum p'  -- normalize

    Intermediates stay DECIMAL(38,0) end-to-end (bounds: n_ij * 1e24
    needs n_ij < 1e14; t sums likewise), so no LONG wrap at any
    realistic matchup count.  The output rating_micro IS cast to LONG —
    ratings are normalized to sum n_models * UNIT, so that cast is safe
    while n_models < 9.2e6.

    ``matrix`` must be smoothed (wins >= 1 for every model; see
    pairwise_win_matrix) so sum_j t_ij and sum p' are never zero.
    """
    m = matrix.localCheckpoint(eager=True)
    totals = m.groupBy("model").agg(F.sum("wins").alias("w_tot"))
    n_models = totals.count()  # driver scalar: one int, by construction
    models = totals.localCheckpoint(eager=True)

    dec = "decimal(38,0)"
    ratings = models.select("model", F.lit(UNIT).cast(dec).alias("p"))
    for _ in range(iters):
        pi = ratings.select(F.col("model"), F.col("p").alias("p_i"))
        pj = ratings.select(
            F.col("model").alias("opponent"), F.col("p").alias("p_j")
        )
        den = (
            m.join(pi, "model")
            .join(pj, "opponent")
            .select(
                "model",
                _floor_div(
                    f"CAST(n_pair AS {dec}) * CAST({_U2} AS {dec})",
                    f"CAST(p_i + p_j AS {dec})",
                ).alias("t"),
            )
            .groupBy("model")
            .agg(F.sum(F.col("t")).alias("den"))
        )
        unnorm = models.join(den, "model").select(
            "model",
            _floor_div(
                f"CAST(w_tot AS {dec}) * CAST({_U2} AS {dec})",
                f"CAST(den AS {dec})",
            ).alias("pn"),
        )
        # Normalization scalar as a global window SUM over ``unnorm`` —
        # one row per MODEL, bounded by construction (the matchup
        # collapse above is the only data-scale stage), so the single-
        # partition window is the documented model-sized-frame pattern.
        # vs the previous agg + crossJoin(broadcast): ``unnorm`` (and its
        # den join) is evaluated ONCE instead of twice per round and the
        # per-round broadcast-exchange job disappears (r14 optimization;
        # decimal window SUM == decimal agg SUM bit-for-bit).  The
        # per-round checkpoint stays but is LAZY: the logical plan is
        # truncated immediately (no per-iteration plan growth), while
        # materialization rides the next consumer's job instead of a
        # dedicated per-round job (measured -26% on the full entry).
        ratings = (
            unnorm.withColumn("s", F.sum("pn").over(Window.partitionBy()))
            .select(
                "model",
                _floor_div(
                    f"CAST(pn AS {dec}) * CAST({n_models * UNIT} AS {dec})",
                    f"CAST(s AS {dec})",
                ).alias("p"),
            )
            .localCheckpoint(eager=False)
        )

    return totals.join(ratings, "model").select(
        "model",
        F.col("w_tot").alias("n_wins"),
        F.col("p").cast("bigint").alias("rating_micro"),
        (F.col("p").cast("double") / F.lit(float(UNIT))).alias("rating"),
    )
