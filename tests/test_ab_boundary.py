"""Regression fixture for the CUPED/DiD pre/post boundary (ADVICE r9).

Both entries define the boundary as the integer-µs midpoint of the FULL
event span; the sf0.01 fixture masked a purchase-only-span bug because
no purchase fell between the two candidate midpoints.  This fixture
forces purchases INTO that gap, so Spark and the DuckDB oracle diverge
unless both derive the boundary from unfiltered events.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

BASE = 1_700_000_000_000_000  # µs epoch anchor


@pytest.fixture(scope="module")
def boundary_dir(spark, tmp_path_factory):
    """Events where the purchase-only midpoint and the all-events
    midpoint differ, with purchases strictly between the two."""
    rows = []
    eid = 0

    def add(user, tus, etype, value):
        nonlocal eid
        eid += 1
        rows.append((eid, tus, user, etype, float(value), "{}"))

    # Non-purchase events stretch the full span: [0s, 1000s].
    for u in range(1, 21):
        add(u, BASE + 0, "view", 1.0)
        add(u, BASE + 1_000_000_000, "view", 1.0)
    # Purchases span [101s, 799s] -> purchase-only mid = 450s;
    # all-events mid = 500s.
    for u in range(1, 21):
        add(u, BASE + 100_000_000 + u * 1_000_000, "purchase", 10.0 + u)
        add(u, BASE + 800_000_000 - u * 1_000_000, "purchase", 40.0 + u)
    # The trap: purchases strictly BETWEEN the two candidate midpoints
    # (450s, 500s) — post under the purchase-only boundary, pre under
    # the all-events boundary.
    for u in range(1, 21):
        add(u, BASE + 460_000_000 + u * 1_500_000, "purchase", 30.0 + u)

    df = spark.createDataFrame(
        rows, "event_id long, tus long, user_id long, event_type string, value double, props string"
    ).select(
        "event_id",
        F.timestamp_micros("tus").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    out = tmp_path_factory.mktemp("boundary")
    df.coalesce(1).write.mode("overwrite").parquet(str(out / "events.parquet"))
    return str(out)


def _oracle_rows(boundary_dir, sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{boundary_dir}/events.parquet/*.parquet')"
    )
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(r[i] for i in order) for r in res.fetchall()]
    con.close()
    return rows, sorted(cols)


def test_fixture_has_purchase_between_candidate_midpoints(spark, boundary_dir):
    """The property that makes this fixture a real trap: at least one
    purchase lies strictly between the purchase-only midpoint and the
    all-events midpoint."""
    ev = spark.read.parquet(f"{boundary_dir}/events.parquet").withColumn(
        "tus", F.unix_micros("ts")
    )
    mid_all = ev.agg(F.expr("(MIN(tus)+MAX(tus)) div 2")).collect()[0][0]
    p = ev.filter(F.col("event_type") == "purchase")
    mid_p = p.agg(F.expr("(MIN(tus)+MAX(tus)) div 2")).collect()[0][0]
    assert mid_p != mid_all
    lo, hi = min(mid_p, mid_all), max(mid_p, mid_all)
    trapped = p.filter((F.col("tus") > lo) & (F.col("tus") < hi)).count()
    assert trapped > 0


@pytest.mark.parametrize("name", ["events_cuped_adjusted", "events_did_estimate"])
def test_boundary_entries_match_oracle_on_trap_fixture(spark, boundary_dir, name):
    from fotmobdatapipeline_spark.plans.catalog import QUERIES, _load_all

    _load_all()
    spec = QUERIES[name]
    df = spec.builder(spark, boundary_dir)
    s_cols = sorted(df.columns)
    s_rows = [tuple(row[c] for c in s_cols) for row in df.collect()]
    d_rows, d_cols = _oracle_rows(boundary_dir, spec.oracle_text())
    assert s_cols == d_cols
    assert sorted(s_rows, key=repr) == sorted(d_rows, key=repr)
