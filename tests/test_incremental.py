"""Incremental foreachBatch loading: stream → date-partitioned parquet,
idempotent under replay."""

from __future__ import annotations

import os
import shutil

from tests.conftest import SF_SMALL


def test_incremental_sink_lands_all_events_partitioned(spark, tmp_path):
    from fotmobdatapipeline_spark.sources.registry import read_table
    from fotmobdatapipeline_spark.streaming.events import read_events_stream
    from fotmobdatapipeline_spark.streaming.incremental import (
        incremental_partitioned_sink,
    )

    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{SF_SMALL}/events.parquet", src / "part-0.parquet")
    out = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    stream = read_events_stream(spark, str(src))
    q = incremental_partitioned_sink(stream, out, ckpt)
    q.processAllAvailable()
    q.stop()

    batch = read_table(spark, SF_SMALL, "events")
    landed = spark.read.parquet(out)
    assert landed.count() == batch.count()
    parts = [d for d in os.listdir(out) if d.startswith("event_date=")]
    assert len(parts) > 5  # hive-partitioned by day

    # Replay: restart from the same checkpoint → no duplicate rows
    # (no new input; partitions would be overwritten, not appended).
    q2 = incremental_partitioned_sink(read_events_stream(spark, str(src)), out, ckpt)
    q2.processAllAvailable()
    q2.stop()
    assert spark.read.parquet(out).count() == batch.count()


def test_upsert_partitioned_merge(spark, tmp_path):
    """MERGE semantics on plain parquet: matched keys replaced, new keys
    appended, untouched partitions byte-identical (never rewritten)."""
    import os

    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.merge import upsert_partitioned
    from fotmobdatapipeline_spark.sources.registry import read_table
    from tests.conftest import SF_SMALL

    path = str(tmp_path / "orders_merge")
    orders = read_table(spark, SF_SMALL, "orders").withColumn(
        "order_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    orders.write.partitionBy("order_month").parquet(path)
    by_month = {
        r["order_month"]: r["count"]
        for r in orders.groupBy("order_month").count().collect()
    }
    touched_month = max(by_month, key=lambda m: (by_month[m], m))
    untouched_month = min(m for m in by_month if m != touched_month)
    mtimes_before = {
        f: os.path.getmtime(os.path.join(path, f"order_month={untouched_month}", f))
        for f in os.listdir(os.path.join(path, f"order_month={untouched_month}"))
        if f.endswith(".parquet")
    }

    victims = (
        orders.filter(F.col("order_month") == touched_month)
        .orderBy("o_orderkey")
        .limit(5)
        .withColumn("o_orderstatus", F.lit("X"))
    )
    new_keys = victims.select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
        "o_orderpriority", "order_month",
    )
    batch = victims.unionByName(new_keys)
    upsert_partitioned(spark, batch, path, keys=["o_orderkey"], partition_col="order_month")

    merged = spark.read.parquet(path)
    assert merged.count() == orders.count() + 5
    assert merged.filter(F.col("o_orderstatus") == "X").count() == 10
    # replaced keys exist exactly once
    dupes = merged.groupBy("o_orderkey").count().filter(F.col("count") > 1).count()
    assert dupes == 0
    mtimes_after = {
        f: os.path.getmtime(os.path.join(path, f"order_month={untouched_month}", f))
        for f in os.listdir(os.path.join(path, f"order_month={untouched_month}"))
        if f.endswith(".parquet")
    }
    assert mtimes_after == mtimes_before, "untouched partition must not be rewritten"


def test_upsert_aborts_on_unreadable_target(spark, tmp_path):
    """A target that EXISTS but cannot be read (corrupt footer, perms,
    transient FS error) must abort the MERGE — falling through to
    insert-only mode would overwrite the touched partitions with
    source-only rows, silently dropping every pre-existing row."""
    import pytest
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.merge import upsert_partitioned
    from fotmobdatapipeline_spark.sources.registry import read_table
    from tests.conftest import SF_SMALL

    path = str(tmp_path / "corrupt_target")
    import os

    os.makedirs(path)
    with open(os.path.join(path, "part-00000.parquet"), "wb") as fh:
        fh.write(b"not a parquet file")

    batch = (
        read_table(spark, SF_SMALL, "orders")
        .limit(3)
        .withColumn("order_month", F.date_format("o_orderdate", "yyyy-MM"))
    )
    with pytest.raises(Exception):
        upsert_partitioned(spark, batch, path, keys=["o_orderkey"], partition_col="order_month")
    # must NOT be swallowed into insert-only mode
    assert os.path.getsize(os.path.join(path, "part-00000.parquet")) == 18

    # a genuinely-absent path still works as plain insert
    fresh = str(tmp_path / "fresh_target")
    upsert_partitioned(spark, batch, fresh, keys=["o_orderkey"], partition_col="order_month")
    assert spark.read.parquet(fresh).count() == 3
