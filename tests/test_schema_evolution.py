"""Schema-drift-tolerant reads: added columns, widened physical types,
and the refusal to guess on cross-kind conflicts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fotmobdatapipeline_spark.sources.evolution import (
    _widen_schemas,
    conform_schema,
    read_evolved,
)


def _write(df, path, day):
    df.coalesce(1).write.mode("append").parquet(f"{path}/day={day}")


def test_added_column_fast_path(spark, tmp_path):
    """New column in a newer partition only → mergeSchema fast path,
    nulls backfilled in the old partition."""
    path = str(tmp_path / "t")
    v1 = spark.range(5).select(F.col("id"), F.lit(1).cast("long").alias("a"))
    v2 = spark.range(5, 10).select(
        F.col("id"), F.lit(2).cast("long").alias("a"), F.lit("x").alias("c")
    )
    _write(v1, path, "2023")
    _write(v2, path, "2024")
    df = read_evolved(spark, path)
    assert set(df.columns) == {"id", "a", "c", "day"}
    assert df.count() == 10
    assert df.filter("day = '2023' AND c IS NULL").count() == 5


def test_widened_int_falls_back_and_unions(spark, tmp_path):
    """int32 → int64 drift breaks mergeSchema; the per-partition
    fallback widens to long and loses no rows or values."""
    path = str(tmp_path / "t")
    old = spark.range(4).select(
        F.col("id"), F.col("id").cast("int").alias("v"), F.lit(0.5).cast("float").alias("f")
    )
    new = spark.range(4, 8).select(
        F.col("id"), (F.col("id") * 10).cast("long").alias("v"),
        F.lit(1.5).cast("double").alias("f"), F.lit("new").alias("extra")
    )
    _write(old, path, "2023")
    _write(new, path, "2024")

    # plain mergeSchema read is genuinely broken for this table
    with pytest.raises(Exception, match="[Mm]erge"):
        spark.read.option("mergeSchema", "true").parquet(path).collect()

    df = read_evolved(spark, path, partition_col="day")
    sch = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert sch["v"] == "bigint" and sch["f"] == "double"
    rows = {r.id: (r.v, r.f, r.extra, r.day) for r in df.collect()}
    assert len(rows) == 8
    assert rows[2] == (2, 0.5, None, "2023")
    assert rows[6] == (60, 1.5, "new", "2024")


def test_fallback_decodes_escaped_partition_values(spark, tmp_path):
    """The per-partition fallback emits the DECODED partition value —
    a day=10%3A30 directory yields '10:30' like Spark's own discovery
    would, not the raw dir-name form."""
    import os

    path = str(tmp_path / "t")
    # partitionBy so the dirs are genuinely Hive-escaped on disk
    spark.range(3).select(
        F.col("id"), F.col("id").cast("int").alias("v"), F.lit("10:30").alias("day")
    ).write.partitionBy("day").parquet(path)
    spark.range(3, 6).select(
        F.col("id"), F.col("id").cast("long").alias("v"), F.lit("11:30").alias("day")
    ).write.mode("append").partitionBy("day").parquet(path)
    assert sorted(d for d in os.listdir(path) if d.startswith("day=")) == [
        "day=10%3A30",
        "day=11%3A30",
    ]

    df = read_evolved(spark, path, partition_col="day")
    assert sorted({r.day for r in df.collect()}) == ["10:30", "11:30"]
    assert df.count() == 6


def test_cross_kind_conflict_raises(spark, tmp_path):
    """string vs int cannot be widened — must raise, never stringify."""
    path = str(tmp_path / "t")
    _write(spark.range(2).select(F.col("id"), F.lit(1).alias("v")), path, "a")
    _write(spark.range(2).select(F.col("id"), F.lit("s").alias("v")), path, "b")
    with pytest.raises(ValueError, match="column 'v'"):
        read_evolved(spark, path, partition_col="day")


def test_widen_lattice_and_conform():
    s1 = T.StructType([T.StructField("a", T.IntegerType())])
    s2 = T.StructType(
        [T.StructField("a", T.FloatType()), T.StructField("b", T.ShortType())]
    )
    out = _widen_schemas([s1, s2])
    assert [f.dataType.simpleString() for f in out.fields] == ["double", "smallint"]
    assert all(f.nullable for f in out.fields)


def test_conform_schema_pushdown_survives(spark, tmp_path):
    """The fallback union's per-partition scans still prune columns."""
    path = str(tmp_path / "t")
    _write(
        spark.range(100).select(F.col("id"), F.col("id").cast("int").alias("v")),
        path, "a",
    )
    _write(
        spark.range(100).select(F.col("id"), F.col("id").cast("long").alias("v")),
        path, "b",
    )
    df = read_evolved(spark, path, partition_col="day").select("id").filter("id < 5")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<id:bigint>" in plan  # v pruned at the scan
    assert df.count() == 10


# -- property: widening is an order-insensitive least upper bound ---------
try:
    from hypothesis import given, strategies as st

    _LEAVES = [
        T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType(),
        T.FloatType(), T.DoubleType(),
    ]

    @given(st.lists(st.sampled_from(_LEAVES), min_size=1, max_size=6))
    def test_widen_is_order_insensitive_upper_bound(types):
        import itertools

        from fotmobdatapipeline_spark.sources.evolution import _widen

        import functools as ft
        results = {
            repr(ft.reduce(_widen, perm))
            for perm in itertools.permutations(types)
        } if len(types) <= 4 else {repr(ft.reduce(_widen, types))}
        assert len(results) == 1  # order never changes the outcome
        lub = ft.reduce(_widen, types)
        for t in types:
            assert _widen(t, lub) == lub  # true upper bound
        assert _widen(lub, lub) == lub  # idempotent
except ImportError:  # pragma: no cover
    pass


def test_merge_error_detection_is_class_based():
    """Only Spark's schema-merge ERROR CLASSES trigger the fallback —
    a path or message merely containing the word 'merge' must not."""
    from fotmobdatapipeline_spark.sources.evolution import _is_schema_merge_error

    assert _is_schema_merge_error(
        Exception("[CANNOT_MERGE_SCHEMAS] Failed merging schemas")
    )
    assert _is_schema_merge_error(
        Exception("[CANNOT_MERGE_INCOMPATIBLE_DATA_TYPE] int vs string")
    )
    assert not _is_schema_merge_error(
        Exception("Permission denied: /data/merged/events")
    )
    assert not _is_schema_merge_error(
        Exception("Failed to merge fields")  # prose without a class token
    )
