"""Observation-based data-quality metrics: the counts must ride the
action that already runs (no second scan) and match exact recomputation,
on both batch writes and streaming micro-batches."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from fotmobdatapipeline_spark.operators.observe import (
    observe_rules,
    streaming_observed,
    violations,
)


def _rules():
    return {
        "null_value": F.col("v").isNull(),
        "negative_qty": F.col("qty") < 0,
        "bad_day": ~F.col("day").isin("0", "1", "2"),
    }


def test_observe_rules_batch_write(spark, tmp_path):
    df = spark.range(0, 1000).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("v"),
        (F.col("id") % 7 - 3).alias("qty"),  # negative for id%7 in {0,1,2}
        (F.col("id") % 3).cast("string").alias("day"),
    )
    rules = _rules()
    observed, obs = observe_rules(df, rules)
    observed.write.parquet(str(tmp_path / "out"))  # the ONE action

    m = obs.get
    assert m["rows"] == 1000
    got = violations(m, rules)
    assert got == {
        "null_value": 100,
        "negative_qty": df.filter("qty < 0").count(),
        "bad_day": 0,
    }
    # and the write itself landed every row
    assert spark.read.parquet(str(tmp_path / "out")).count() == 1000


def test_observe_rules_null_predicate_counts_as_not_violated(spark, tmp_path):
    # comparison against NULL yields NULL, which must count as 0, not
    # poison the sum
    df = spark.range(0, 10).select(
        F.when(F.col("id") % 2 == 0, None).otherwise(F.col("id")).alias("v"),
        F.lit(1).alias("qty"),
        F.lit("0").alias("day"),
    )
    rules = {"v_over_5": F.col("v") > 5}
    observed, obs = observe_rules(df, rules)
    observed.write.parquet(str(tmp_path / "o2"))
    assert violations(obs.get, rules) == {"v_over_5": 2}  # 7, 9


def test_observe_rules_reserved_name(spark):
    with pytest.raises(ValueError, match="reserved"):
        observe_rules(spark.range(1), {"rows": F.lit(True)})


def test_observe_rules_streaming(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    spark.range(0, 50).select(
        F.col("id"),
        F.when(F.col("id") % 5 == 0, None).otherwise(F.col("id")).alias("v"),
        F.lit(1).alias("qty"),
        (F.col("id") % 3).cast("string").alias("day"),
    ).coalesce(1).write.parquet(str(src / "b0"))

    stream = (
        spark.readStream.schema("id bigint, v bigint, qty int, day string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*")
    )
    rules = _rules()
    observed, obs = observe_rules(stream, rules)
    assert obs is None  # streaming: metrics come from progress events

    q = (
        observed.writeStream.format("parquet")
        .option("path", str(tmp_path / "sink"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    for _ in range(50):  # progress events can lag termination briefly
        got = streaming_observed(q, "dq")
        if got:
            break
        time.sleep(0.2)
    assert got, "no observed metrics in progress history"
    total = {k: sum(int(m[k]) for m in got) for k in ("rows", "null_value")}
    assert total["rows"] == 50
    assert total["null_value"] == 10
    assert all(int(m["bad_day"]) == 0 for m in got)
