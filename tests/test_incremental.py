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
