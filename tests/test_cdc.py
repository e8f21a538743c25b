"""Operator-level contracts for snapshot_diff (operators/cdc.py),
stratified_sample (operators/sampling.py), and null_profile
(operators/profiling.py) — edge cases the catalog queries don't reach:
null compare values, all-null rows, unchanged retention, dropped strata.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fotmobdatapipeline_spark.operators.cdc import snapshot_diff
from fotmobdatapipeline_spark.operators.profiling import null_profile
from fotmobdatapipeline_spark.operators.sampling import (
    hash_bucket_256,
    stratified_sample,
)


def _diff_map(rows):
    return {r["k"]: r["change_type"] for r in rows}


def test_snapshot_diff_classifies_all_change_types(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)], "k int, v string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C"), (4, None), (5, "e")], "k int, v string"
    )
    out = snapshot_diff(old, new, keys=["k"], compare_cols=["v"]).collect()
    assert _diff_map(out) == {1: "delete", 3: "update", 5: "insert"}
    # null -> null is unchanged (null-safe equality), so k=4 is absent
    by_k = {r["k"]: r for r in out}
    assert by_k[3]["old_v"] == "c" and by_k[3]["new_v"] == "C"
    assert by_k[1]["new_v"] is None and by_k[5]["old_v"] is None


def test_snapshot_diff_null_to_value_is_update(spark):
    old = spark.createDataFrame([(1, None)], "k int, v string")
    new = spark.createDataFrame([(1, "x")], "k int, v string")
    out = snapshot_diff(old, new, keys=["k"], compare_cols=["v"]).collect()
    assert _diff_map(out) == {1: "update"}


def test_snapshot_diff_include_unchanged(spark):
    old = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    new = spark.createDataFrame([(1, "a"), (2, "B")], "k int, v string")
    out = snapshot_diff(
        old, new, keys=["k"], compare_cols=["v"], include_unchanged=True
    ).collect()
    assert _diff_map(out) == {1: "unchanged", 2: "update"}


def test_snapshot_diff_multi_column_key(spark):
    old = spark.createDataFrame([(1, "x", 10), (1, "y", 20)], "a int, b string, v int")
    new = spark.createDataFrame([(1, "x", 11), (1, "y", 20)], "a int, b string, v int")
    out = snapshot_diff(old, new, keys=["a", "b"], compare_cols=["v"]).collect()
    assert len(out) == 1
    assert (out[0]["a"], out[0]["b"], out[0]["change_type"]) == (1, "x", "update")


def test_stratified_sample_matches_per_stratum_hash_filter(spark):
    df = spark.range(2000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, "even").otherwise("odd").alias("s"),
    )
    rates = {"even": 0.25, "odd": 1.0}
    got = stratified_sample(df, "s", "k", rates)
    # per-stratum reference: the plain hash_sample bound applied per slice
    bucket = hash_bucket_256(F.col("k"))
    want_even = df.filter((F.col("s") == "even") & (bucket < 64)).count()
    want_odd = df.filter(F.col("s") == "odd").count()
    counts = {r["s"]: r["n"] for r in got.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert counts == {"even": want_even, "odd": want_odd}


def test_stratified_sample_drops_unlisted_strata(spark):
    df = spark.range(100).select(
        F.col("id").alias("k"), F.lit("unlisted").alias("s")
    )
    assert stratified_sample(df, "s", "k", {"other": 1.0}).count() == 0


def test_null_profile_counts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, None)], "x int, y string"
    )
    rows = {r["column_name"]: r for r in null_profile(df, ["x", "y"]).collect()}
    assert rows["x"]["n_null"] == 1 and rows["x"]["n_distinct"] == 3
    assert rows["y"]["n_null"] == 2 and rows["y"]["n_distinct"] == 1
    assert all(r["n_rows"] == 4 for r in rows.values())


def test_incremental_group_sums_matches_direct_agg(spark):
    """Group birth, group death, and a group-CHANGING update must all
    land exactly where a direct aggregate of the new snapshot would."""
    from fotmobdatapipeline_spark.operators.cdc import incremental_group_sums

    old = spark.createDataFrame(
        [(1, "g1", "10.00"), (2, "g1", "20.00"), (3, "g2", "5.00")],
        "k int, g string, v string",
    ).select("k", "g", F.col("v").cast("decimal(12,2)").alias("v"))
    # k=2 moves g1 -> g3 (birth) with a new value; k=3 deleted (g2 dies);
    # k=4 inserted into g1
    new = spark.createDataFrame(
        [(1, "g1", "10.00"), (2, "g3", "21.00"), (4, "g1", "7.00")],
        "k int, g string, v string",
    ).select("k", "g", F.col("v").cast("decimal(12,2)").alias("v"))

    base = old.groupBy("g").agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    diff = snapshot_diff(old, new, keys=["k"], compare_cols=["v", "g"])
    got = {
        r["g"]: (r["n"], str(r["s"]))
        for r in incremental_group_sums(base, diff, "g", "v").collect()
    }
    want = {
        r["g"]: (r["n"], str(r["s"]))
        for r in new.groupBy("g")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert got == want
    assert "g2" not in got  # dead group dropped, not emitted with n=0


def test_table_checksum_detects_single_row_change(spark):
    """Permuting rows/partitions must not move the checksum; changing one
    value in one row must."""
    from fotmobdatapipeline_spark.operators.profiling import table_checksum

    base = spark.createDataFrame(
        [(1, "a", "10.00"), (2, "b", "20.00"), (3, "a", "30.00")],
        "k int, g string, v string",
    )
    ck = lambda df: {  # noqa: E731
        r["g"]: (r["n_rows"], r["checksum"])
        for r in table_checksum(df, ["k", "v"], group_by=["g"]).collect()
    }
    assert ck(base) == ck(base.repartition(5).sortWithinPartitions("v"))
    mutated = spark.createDataFrame(
        [(1, "a", "10.00"), (2, "b", "20.00"), (3, "a", "30.01")],
        "k int, g string, v string",
    )
    assert ck(base)["b"] == ck(mutated)["b"]
    assert ck(base)["a"] != ck(mutated)["a"]


def test_table_checksum_null_position_matters(spark):
    """(NULL, 'x') and ('x', NULL) must produce different row digests —
    the null marker keeps column positions unambiguous."""
    from fotmobdatapipeline_spark.operators.profiling import table_checksum

    d1 = spark.createDataFrame([(None, "x")], "a string, b string")
    d2 = spark.createDataFrame([("x", None)], "a string, b string")
    c1 = table_checksum(d1, ["a", "b"]).collect()[0]["checksum"]
    c2 = table_checksum(d2, ["a", "b"]).collect()[0]["checksum"]
    assert c1 != c2


def test_bounded_topk_helper_column_collision_raises(spark):
    """ADVICE r12: bounded_topk_per_group must refuse input frames that
    already carry one of its internal helper names — silently
    overwriting and dropping a caller's column corrupts output (same
    contract as block_spans in operators/prefix.py)."""
    import pytest
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.sampling import (
        bounded_topk_per_group,
    )

    clean = spark.range(10).select(
        (F.col("id") % 2).alias("g"), F.col("id").alias("v")
    )
    assert bounded_topk_per_group(clean, ["g"], [F.desc("v")], k=2).count() == 4

    for bad in ("__tk_pid", "__tk_lrk", "__tk_rk"):
        poisoned = clean.withColumn(bad, F.lit(1))
        with pytest.raises(ValueError, match="collide"):
            bounded_topk_per_group(poisoned, ["g"], [F.desc("v")], k=2)
