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
