"""End-to-end star-schema build over the TPC-H-ish testdata — the
engine's equivalent of the reference's full pipeline (extract →
transform → star → looker_data → load), used by bench.py to measure the
BASELINE.md target #5 (full build + all writes at sf0.1).

Shape mirrors fotmob.py exactly, at testdata scale:
  dims       <- build_dim distinct projections + deterministic keys
  fact       <- lineitem natural keys swapped for surrogate keys via
                broadcast joins (never shuffles the fact)
  reporting  <- denormalizing join back to attributes (Q1 / looker_data)
  load       <- parquet writes per table, orderdate-month partitioning
                on the reporting table for downstream pruning
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from fotmobdatapipeline_spark.operators.star import build_dim, build_fact, denormalize
from fotmobdatapipeline_spark.sources.registry import read_table
from fotmobdatapipeline_spark.sources.sinks import write_parquet, write_star


def build_star_tables(spark: SparkSession, sf_dir: str) -> dict:
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    part = read_table(spark, sf_dir, "part")
    supplier = read_table(spark, sf_dir, "supplier")

    cust_dim = build_dim(customer, ["c_custkey", "c_name", "c_mktsegment"], "customer_sk")
    part_dim = build_dim(part, ["p_partkey", "p_name", "p_brand", "p_type"], "part_sk")
    supp_dim = build_dim(supplier, ["s_suppkey", "s_name"], "supplier_sk")
    status_dim = build_dim(li, ["l_returnflag", "l_linestatus"], "status_sk")

    enriched = li.join(
        F.broadcast(orders.select("o_orderkey", "o_custkey", "o_orderdate")),
        li.l_orderkey == F.col("o_orderkey"),
    )
    fact = build_fact(
        enriched.withColumnsRenamed(
            {"o_custkey": "c_custkey", "l_partkey": "p_partkey", "l_suppkey": "s_suppkey"}
        ),
        dims=[
            (cust_dim.select("c_custkey", "customer_sk").distinct(), ["c_custkey"], "customer_sk"),
            (part_dim.select("p_partkey", "part_sk"), ["p_partkey"], "part_sk"),
            (supp_dim.select("s_suppkey", "supplier_sk"), ["s_suppkey"], "supplier_sk"),
            (status_dim, ["l_returnflag", "l_linestatus"], "status_sk"),
        ],
        measures=["l_quantity", "l_extendedprice", "l_discount", "o_orderdate"],
        extra_keys=["l_orderkey", "l_linenumber"],
    )
    reporting = denormalize(
        fact,
        dims=[
            (cust_dim, "customer_sk", ["c_name", "c_mktsegment"]),
            (part_dim, "part_sk", ["p_name", "p_brand"]),
            (supp_dim, "supplier_sk", ["s_name"]),
            (status_dim, "status_sk", ["l_returnflag", "l_linestatus"]),
        ],
        measures=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "o_orderdate"],
    ).withColumn("order_month", F.date_format("o_orderdate", "yyyy-MM"))
    return {
        "customer_dim": cust_dim,
        "part_dim": part_dim,
        "supplier_dim": supp_dim,
        "status_dim": status_dim,
        "sales_fact": fact,
        "sales_reporting": reporting,
    }


def run_star_build(spark: SparkSession, sf_dir: str, out_dir: str) -> dict[str, str]:
    """Build + load everything; returns written paths.  One Spark job
    per table write, reporting table partitioned by month."""
    tables = build_star_tables(spark, sf_dir)
    reporting = tables.pop("sales_reporting")
    paths = write_star(tables, out_dir)
    write_parquet(
        reporting, f"{out_dir}/sales_reporting", partition_by=["order_month"]
    )
    paths["sales_reporting"] = f"{out_dir}/sales_reporting"
    return paths
