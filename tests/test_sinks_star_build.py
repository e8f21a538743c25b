"""Sink layer + end-to-end star build/load: write, partition, bucket,
read-back integrity."""

from __future__ import annotations

import os

from tests.conftest import SF_SMALL


def test_star_build_writes_and_reads_back(spark, tmp_path):
    from fotmobdatapipeline_spark.plans.star_build import run_star_build
    from fotmobdatapipeline_spark.sources.registry import read_table

    out = str(tmp_path / "star")
    paths = run_star_build(spark, SF_SMALL, out)
    assert set(paths) == {
        "customer_dim",
        "part_dim",
        "supplier_dim",
        "status_dim",
        "sales_fact",
        "sales_reporting",
    }
    n_lineitem = read_table(spark, SF_SMALL, "lineitem").count()
    fact = spark.read.parquet(paths["sales_fact"])
    reporting = spark.read.parquet(paths["sales_reporting"])
    assert fact.count() == n_lineitem  # key swap loses no rows
    assert reporting.count() == n_lineitem
    # reporting is hive-partitioned by month → partition pruning works
    months = [d for d in os.listdir(paths["sales_reporting"]) if d.startswith("order_month=")]
    assert len(months) > 10
    one_month = months[0].split("=")[1]
    pruned = reporting.filter(reporting.order_month == one_month)
    assert 0 < pruned.count() < n_lineitem


def test_overwrite_is_idempotent(spark, tmp_path):
    from fotmobdatapipeline_spark.sources.registry import read_table
    from fotmobdatapipeline_spark.sources.sinks import write_parquet

    nation = read_table(spark, SF_SMALL, "nation")
    path = str(tmp_path / "nation")
    write_parquet(nation, path)
    write_parquet(nation, path)  # rerun converges, no errorifexists
    assert spark.read.parquet(path).count() == nation.count()


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.sources.registry import read_table
    from fotmobdatapipeline_spark.sources.sinks import write_bucketed

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = read_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
        orders = read_table(spark, SF_SMALL, "orders").select("o_orderkey", "o_totalprice")
        write_bucketed(li, "li_b", ["l_orderkey"], num_buckets=4, sort_cols=["l_orderkey"])
        write_bucketed(orders, "ord_b", ["o_orderkey"], num_buckets=4, sort_cols=["o_orderkey"])
        joined = spark.table("li_b").join(
            spark.table("ord_b"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join should not shuffle"
        assert joined.count() == read_table(spark, SF_SMALL, "lineitem").count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


def test_file_source_sink_roundtrip_formats(spark, tmp_path):
    """nation survives a write→read round trip in every interchange
    format, with explicit schemas on the text formats (no inference)."""
    from fotmobdatapipeline_spark.sources.registry import (
        read_file_source,
        read_table,
        write_file_sink,
    )
    from tests.conftest import SF_SMALL

    nation = read_table(spark, SF_SMALL, "nation")
    want = sorted(map(tuple, nation.collect()))
    for fmt in ("parquet", "json", "csv"):
        path = str(tmp_path / fmt)
        write_file_sink(nation, path, fmt=fmt)
        back = read_file_source(spark, path, fmt=fmt, schema=nation.schema)
        assert sorted(map(tuple, back.collect())) == want, fmt
        assert back.schema == nation.schema, fmt


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    """Compaction must rewrite a fragmented dataset into the computed
    file count without losing or duplicating rows."""
    import glob

    from fotmobdatapipeline_spark.sources.registry import read_table
    from fotmobdatapipeline_spark.sources.sinks import compact_parquet
    from tests.conftest import SF_SMALL

    path = str(tmp_path / "frag")
    orders = read_table(spark, SF_SMALL, "orders")
    orders.repartition(40).write.parquet(path)  # fragment: 40 small files
    before = len(glob.glob(f"{path}/*.parquet"))
    assert before >= 30
    want = sorted(map(tuple, orders.collect()))

    n_files = compact_parquet(spark, path, target_rows_per_file=1_000)
    after = len(glob.glob(f"{path}/*.parquet"))
    assert after == n_files < before
    got = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert got == want


def test_schema_evolution_merge_read(spark, tmp_path):
    """Landing zones evolve: later shards carry new columns.  A
    mergeSchema read unifies the footers — old rows surface NULL for the
    new column, and no rewrite of historical files is needed."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "evolving")
    v1 = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), F.lit("v1").alias("source")
    )
    v1.write.mode("overwrite").parquet(out)
    v2 = spark.range(100, 150).select(
        F.col("id").alias("doc_id"),
        F.lit("v2").alias("source"),
        F.lit("en").alias("lang"),
    )
    v2.write.mode("append").parquet(out)

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {"doc_id", "source", "lang"}
    assert merged.count() == 150
    assert merged.filter(F.col("lang").isNull()).count() == 100
    assert merged.filter((F.col("source") == "v2") & (F.col("lang") == "en")).count() == 50


def test_write_shuffled_shards_is_a_reproducible_permutation(spark, tmp_path):
    """Shard files hold a deterministic pseudo-random permutation: rows
    sorted by the salted md5 key inside each shard, union lossless,
    shard assignment reproducible from the key alone."""
    import glob
    import hashlib

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.sources.registry import read_table
    from fotmobdatapipeline_spark.sources.sinks import write_shuffled_shards
    from tests.conftest import SF_SMALL

    docs = read_table(spark, SF_SMALL, "documents").select("doc_id", "source")
    out = str(tmp_path / "shuffled")
    n_shards, salt = 16, "3"
    write_shuffled_shards(docs, out, "doc_id", n_shards=n_shards, salt=salt)

    def py_key(doc_id: int) -> str:
        return hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()

    shard_dirs = sorted(glob.glob(f"{out}/_shard=*"))
    assert len(shard_dirs) == n_shards
    seen = []
    for d in shard_dirs:
        shard = int(d.rsplit("=", 1)[1])
        for f in sorted(glob.glob(f"{d}/*.parquet")):
            ids = pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()
            keys = [py_key(i) for i in ids]
            assert keys == sorted(keys), f"unsorted shard file {f}"
            for i in ids:
                assert int(py_key(i)[:8], 16) % n_shards == shard
            seen.extend(ids)
    want = [r["doc_id"] for r in docs.collect()]
    assert sorted(seen) == sorted(want)

    # Balance: no shard is pathologically hot (uniform hash property).
    back = spark.read.parquet(out)
    sizes = [r["n"] for r in back.groupBy("_shard").agg(F.count("*").alias("n")).collect()]
    assert max(sizes) <= 4 * max(1, min(sizes))


def test_layout_audit_drives_compaction(spark, tmp_path):
    """The audit flags a fragmented dataset; after compact_parquet the
    same audit shows the consolidated layout and no flag — and no rows
    were lost in between."""
    from fotmobdatapipeline_spark.sources.registry import read_table
    from fotmobdatapipeline_spark.sources.sinks import (
        compact_parquet,
        describe_parquet_layout,
    )

    out = str(tmp_path / "fragmented")
    docs = read_table(spark, SF_SMALL, "documents")
    docs.repartition(40).write.mode("overwrite").parquet(out)

    before = describe_parquet_layout(spark, out).first()
    assert before["n_files"] == 40
    assert before["needs_compaction"]

    n_after = compact_parquet(spark, out, target_rows_per_file=10_000_000)
    after = describe_parquet_layout(spark, out).first()
    assert after["n_files"] == n_after < 40
    assert after["n_rows"] == before["n_rows"]
    assert not after["needs_compaction"]


def test_hash_key_collision_guard_fires(spark, monkeypatch):
    """VERDICT r9 #6: a silent xxhash64 collision would corrupt every FK
    join downstream, so build_dim's hash path must fail LOUD.  Force the
    collision by stubbing the hash to a constant and assert the guard
    raises before any frame is returned."""
    import pytest
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators import star

    monkeypatch.setattr(star.F, "xxhash64", lambda *cols: F.lit(42))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, name string")
    with pytest.raises(ValueError):
        star.build_dim(df, ["k", "name"], "sk", hash_key=True)
    # verify=False opts out (caller batches its own guard): no raise.
    out = star.build_dim(df, ["k", "name"], "sk", hash_key=True, verify=False)
    assert out.count() == 2


def test_star_build_hash_big_dims_matches_dense(spark, tmp_path):
    """The 100 TB dim-key path (collision-guarded xxhash64) must produce
    the same fact/reporting row counts and join integrity as the dense
    row_number path — only the key VALUES differ."""
    from fotmobdatapipeline_spark.plans.star_build import run_star_build

    p_dense = run_star_build(spark, SF_SMALL, str(tmp_path / "dense"))
    p_hash = run_star_build(
        spark, SF_SMALL, str(tmp_path / "hash"), hash_big_dims=True
    )
    for t in ("customer_dim", "part_dim", "supplier_dim", "sales_fact", "sales_reporting"):
        nd = spark.read.parquet(p_dense[t]).count()
        nh = spark.read.parquet(p_hash[t]).count()
        assert nd == nh, (t, nd, nh)
    # FK integrity: every fact surrogate key resolves in its dim.
    fact = spark.read.parquet(p_hash["sales_fact"])
    cust = spark.read.parquet(p_hash["customer_dim"])
    assert fact.join(cust, "customer_sk", "left_anti").count() == 0
