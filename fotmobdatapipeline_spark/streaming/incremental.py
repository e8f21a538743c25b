"""Incremental batch loading — the reference's own stated evolution
("scheduled batches rather than all at once … remote storage rather
than XCom", README.md:158-160) done Spark-natively.

``foreachBatch`` bridges a stream to arbitrary batch sinks: each
micro-batch is appended into a date-partitioned parquet table with
dynamic partition overwrite, so replaying a batch (after failure/retry,
the reference's retries=5 concern) rewrites exactly the partitions it
touches — idempotent without Delta.

At 100 TB: partition by event date (bounded partition count), dynamic
overwrite keeps reruns cheap; exactly-once comes from the streaming
checkpoint + partition-overwrite idempotence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def incremental_partitioned_sink(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    partition_col: str = "event_date",
):
    """Start a stream that lands micro-batches into a date-partitioned
    parquet table idempotently (dynamic partition overwrite per batch)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                batch_df.withColumn(partition_col, F.to_date("ts"))
                .write.mode("overwrite")
                .partitionBy(partition_col)
                .parquet(path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )
