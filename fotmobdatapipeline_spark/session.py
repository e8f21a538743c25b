"""SparkSession factory.

The reference executes eagerly in single-threaded pandas with no tuning
surface (fotmob-dag.py:95-165).  Here every session is configured for a
multi-executor deployment even when running local[*]:

* AQE on — runtime shuffle-partition coalescing + skew-join splitting, so
  plans written at sf0.01 survive a 100x scale-up without re-tuning.
* Explicit shuffle partition count (overridable) — sized for the local
  test harness; a real cluster deployment would set this (or rely on AQE
  initialNum) to ~2-3x total cores.
* UTC session timezone — deterministic timestamp semantics vs the oracle.
* Arrow enabled — vectorized pandas interchange for the Pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "fotmobdatapipeline-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply engine settings to an externally-created session (the driver
    hands us one in ``entry(spark)``); only runtime-settable confs."""
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf locked by the driver — keep going
    return spark
