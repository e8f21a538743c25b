"""Calendar-bounded time-series folds shared by the batch entries and
their streaming maintenance twins.

``cusum_hourly_report`` consumes an already-aggregated hourly table
(event_type, ho, cents) — ONE combinable aggregate away from raw
events in batch, or the maintained state table of the streaming sink
(streaming/events.py::hourly_cents_maintenance_sink), which is
cell-identical by mergeability.  Sharing the fold is what makes the
stream == batch claim a code-level identity instead of a convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cusum_hourly_report(hourly: DataFrame) -> DataFrame:
    """Page's one-sided CUSUM per event type over the hourly series:
    target k = integer-div mean hourly cents, recursion
    S_t = max(0, S_{t-1} + x_t - k) as an exact BIGINT array fold
    (alarm threshold 2k).  The fold runs over ~hours-of-history
    elements per type, never events."""
    arr = F.array_sort(F.collect_list(F.struct("ho", "cents")))
    g = hourly.groupBy("event_type").agg(
        F.transform(arr, lambda s: s["cents"]).alias("xs")
    )
    k = g.select(
        "event_type",
        "xs",
        F.size("xs").cast("bigint").alias("n_hours"),
        F.expr(
            "aggregate(xs, CAST(0 AS BIGINT), (a, v) -> a + v) div size(xs)"
        ).alias("k_cents"),
    )
    zero = F.lit(0).cast("bigint")
    init = F.struct(zero.alias("s"), zero.alias("mx"), zero.alias("al"))

    def step(a, v):
        s_new = F.greatest(zero, a["s"] + v - F.col("k_cents"))
        return F.struct(
            s_new.alias("s"),
            F.greatest(a["mx"], s_new).alias("mx"),
            (a["al"] + (s_new > 2 * F.col("k_cents")).cast("bigint")).alias("al"),
        )

    st = F.aggregate(F.col("xs"), init, step)
    return k.select(
        "event_type",
        "n_hours",
        "k_cents",
        st["mx"].alias("max_cusum_cents"),
        st["al"].alias("n_alarm_hours"),
    )


def hourly_cents(events: DataFrame) -> DataFrame:
    """(event_type, ho, cents): the combinable hourly collapse —
    exact integer cents (values are 2-dp), epoch-hour integer key.
    Mergeable: summing per-batch outputs by (event_type, ho) equals
    the table over the concatenated input."""
    return events.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").alias("ho"),
    ).agg(
        F.sum(F.col("value").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("cents")
    )


HW_PERIOD = 24


def holt_winters_hourly_report(hourly: DataFrame, period: int = HW_PERIOD) -> DataFrame:
    """Holt-Winters additive seasonal state from the (event_type, ho,
    cents) hourly table — the SAME table :func:`hourly_cents` builds in
    batch and ``streaming/events.hourly_cents_maintenance_sink``
    maintains online, so the streaming readout is a code-level identity
    with the batch entry (the cusum_hourly_report doctrine).

    Triple exponential smoothing with dyadic alpha=beta=gamma=0.5 over
    the total-cents series: per-type cells collapse to one value per
    hour, missing hours gap-fill to 0 (the rotated seasonal ring
    requires a dense series), then one sequential fold over the
    model-sized (hours-of-history) array.  Dyadic constants make every
    step adds + exponent shifts in fixed order — bit-identical in any
    engine; the oracle replays the fold with list_reduce.

    Accumulator layout: [level, trend, s_1..s_period], ring rotated so
    the CURRENT hour's seasonal is always slot 3 (1-indexed) — each
    step is a concat, never a per-slot update."""
    hh = hourly.groupBy("ho").agg(F.sum("cents").cast("bigint").alias("x"))
    bounds = hh.agg(F.min("ho").alias("lo"), F.max("ho").alias("hi"))
    dense = bounds.select(F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("ho"))
    filled = dense.join(hh, "ho", "left").select(
        "ho", F.coalesce(F.col("x"), F.lit(0)).cast("double").alias("x")
    )
    g = filled.agg(
        F.count("*").cast("bigint").alias("n_hours"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("ho", "x"))), lambda s: s["x"]
        ).alias("xs"),
    )
    init = F.array(*[F.lit(0.0)] * (period + 2))

    def step(a, x):
        half = F.lit(0.5)
        lp = half * (x - F.element_at(a, 3)) + half * (
            F.element_at(a, 1) + F.element_at(a, 2)
        )
        bp = half * (lp - F.element_at(a, 1)) + half * F.element_at(a, 2)
        sn = half * (x - lp) + half * F.element_at(a, 3)
        return F.concat(F.array(lp, bp), F.slice(a, 4, period - 1), F.array(sn))

    st = F.aggregate(F.col("xs"), init, step)
    # Empty feed: emit ZERO rows (the oracle filters n_hours > 0 the
    # same way) — an all-zeros forecast row for no data would read as a
    # real forecast (r11 review).
    f = g.select("n_hours", st.alias("st")).filter(F.col("n_hours") > 0)
    return f.select(
        "n_hours",
        F.element_at("st", 1).alias("hw_level"),
        F.element_at("st", 2).alias("hw_trend"),
        F.element_at("st", 3).alias("s_next"),
        (
            F.element_at("st", 1) + F.element_at("st", 2) + F.element_at("st", 3)
        ).alias("forecast_next_hour"),
    )
