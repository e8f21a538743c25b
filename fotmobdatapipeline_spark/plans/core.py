"""Reference-surface queries (SURVEY.md §2) expressed over the driver's
TPC-H-ish testdata, each with its DuckDB oracle.

Operator coverage map (reference operator → query name):
  P1 rename/projection        → star_denorm_wide (aliased wide projection)
  P2 conditional update       → conditional_update
  D1 distinct dim             → dim_distinct
  D2 surrogate keys           → dim_surrogate_keys (engine build_dim)
  D3 union + distinct         → dim_union_distinct
  D6 compound dim             → dim_compound
  J1 fact key-swap joins      → fact_key_swap (engine build_fact)
  Q1 denormalizing join       → star_denorm_wide
  M1 aggregate metrics        → flagship_revenue_topk, agg_pricing_summary
  filter/predicate            → filter_pushdown_scan
  outer/semi/anti joins       → join_outer_agg, join_semi, join_anti
  set ops                     → setop_except
  rollup/cube                 → rollup_sales, cube_sales
  window functions            → topk_per_group, window_running
  string functions            → string_functions
  date/time functions         → datetime_agg
  math/case functions         → math_case_functions
  multi-way join aggregates   → shipping_priority (TPC-H Q3 shape),
                                nation_revenue (TPC-H Q5 shape)

Determinism: see plans/catalog.py module docstring.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession, Window
from pyspark.sql import functions as F

from fotmobdatapipeline_spark.functions.cleaning import canonicalize_values
from fotmobdatapipeline_spark.operators.star import build_dim, build_fact
from fotmobdatapipeline_spark.plans.catalog import register
from fotmobdatapipeline_spark.sources.registry import read_table


def _dec(col: str, prec: int = 12, scale: int = 2) -> Column:
    """Exact decimal view of a 2-dp money/rate column (determinism rule)."""
    return F.col(col).cast(f"decimal({prec},{scale})")


def _dsum(expr: Column) -> Column:
    return F.sum(expr).cast("double")


# --------------------------------------------------------------------------
# Flagship: revenue per customer, top 10 (J1 + M1 + top-k).
# Scale shape: lineitem⋈orders is the one real shuffle (both large, keyed
# on orderkey); customer is broadcast so the agg side never reshuffles.
# --------------------------------------------------------------------------
@register(
    "flagship_revenue_topk",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           COUNT(DISTINCT l.l_orderkey) AS n_orders
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk", "flagship"),
)
def flagship_revenue_topk(spark: SparkSession, sf_dir: str):
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", 4, 2))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            _dsum(revenue).alias("revenue"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q1/P1/P3: the denormalizing reporting join — looker_data's shape on
# TPC-H: fact ⋈ 4 dims, renamed wide projection (sql:1-26).
# --------------------------------------------------------------------------
@register(
    "star_denorm_wide",
    oracle="""
    SELECT l.l_orderkey AS order_key, l.l_linenumber AS line_number,
           c.c_custkey AS customer_key, c.c_name AS customer_name,
           n.n_name AS nation_name, r.r_name AS region_name,
           o.o_orderstatus AS order_status,
           l.l_quantity AS quantity, l.l_extendedprice AS extended_price,
           l.l_returnflag AS return_flag
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    tags=("join", "projection", "rename"),
)
def star_denorm_wide(spark: SparkSession, sf_dir: str):
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            F.col("l_orderkey").alias("order_key"),
            F.col("l_linenumber").alias("line_number"),
            F.col("c_custkey").alias("customer_key"),
            F.col("c_name").alias("customer_name"),
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
            F.col("o_orderstatus").alias("order_status"),
            F.col("l_quantity").alias("quantity"),
            F.col("l_extendedprice").alias("extended_price"),
            F.col("l_returnflag").alias("return_flag"),
        )
    )


# --------------------------------------------------------------------------
# P2: conditional value canonicalization (fotmob-dag.py:121) via the
# engine's canonicalize_values.
# --------------------------------------------------------------------------
@register(
    "conditional_update",
    oracle="""
    SELECT c.c_custkey,
           CASE WHEN n.n_name = 'FRANCE' THEN 'FRENCH REPUBLIC'
                WHEN n.n_name = 'GERMANY' THEN 'FEDERAL REPUBLIC OF GERMANY'
                ELSE n.n_name END AS nation_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
    tags=("projection", "case"),
)
def conditional_update(spark: SparkSession, sf_dir: str):
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).select(
        "c_custkey", F.col("n_name").alias("nation_name")
    )
    canon = canonicalize_values(
        joined,
        ["nation_name"],
        {"FRANCE": "FRENCH REPUBLIC", "GERMANY": "FEDERAL REPUBLIC OF GERMANY"},
    )
    return canon.select("c_custkey", "nation_name")


# --------------------------------------------------------------------------
# D1: distinct projection dim (fotmob-dag.py:124).
# --------------------------------------------------------------------------
@register(
    "dim_distinct",
    oracle="SELECT DISTINCT o_orderpriority FROM orders",
    tags=("distinct",),
)
def dim_distinct(spark: SparkSession, sf_dir: str):
    return read_table(spark, sf_dir, "orders").select("o_orderpriority").distinct()


# --------------------------------------------------------------------------
# D2: deterministic surrogate keys via the engine's build_dim
# (fotmob-dag.py:125; SURVEY.md §4.3-1).
# --------------------------------------------------------------------------
@register(
    "dim_surrogate_keys",
    oracle="""
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY o_orderpriority ASC NULLS FIRST) - 1 AS BIGINT)
             AS priority_id,
           o_orderpriority
    FROM (SELECT DISTINCT o_orderpriority FROM orders)
    """,
    tags=("distinct", "window", "surrogate-key"),
)
def dim_surrogate_keys(spark: SparkSession, sf_dir: str):
    return build_dim(read_table(spark, sf_dir, "orders"), ["o_orderpriority"], "priority_id")


# --------------------------------------------------------------------------
# D3: vertical union + distinct (fotmob-dag.py:128).
# --------------------------------------------------------------------------
@register(
    "dim_union_distinct",
    oracle="""
    SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
    UNION
    SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
    """,
    tags=("union", "distinct"),
)
def dim_union_distinct(spark: SparkSession, sf_dir: str):
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    return (
        cust.select(F.col("c_nationkey").cast("long").alias("nationkey"))
        .unionByName(supp.select(F.col("s_nationkey").cast("long").alias("nationkey")))
        .distinct()
    )


# --------------------------------------------------------------------------
# D6: compound (2-column) dim (fotmob-dag.py:140).
# --------------------------------------------------------------------------
@register(
    "dim_compound",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    tags=("distinct",),
)
def dim_compound(spark: SparkSession, sf_dir: str):
    return read_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# --------------------------------------------------------------------------
# J1: natural-key → surrogate-key swap via engine build_dim + build_fact
# (fotmob-dag.py:144-153).  Dim is broadcast; the fact never shuffles.
# --------------------------------------------------------------------------
@register(
    "fact_key_swap",
    oracle="""
    WITH dim AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY l_returnflag ASC NULLS FIRST,
                                              l_linestatus ASC NULLS FIRST) - 1 AS BIGINT)
               AS rf_ls_id,
             l_returnflag, l_linestatus
      FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem)
    )
    SELECT l.l_orderkey, l.l_linenumber, d.rf_ls_id, l.l_quantity, l.l_extendedprice
    FROM lineitem l
    JOIN dim d ON l.l_returnflag = d.l_returnflag AND l.l_linestatus = d.l_linestatus
    """,
    tags=("join", "surrogate-key", "star"),
)
def fact_key_swap(spark: SparkSession, sf_dir: str):
    li = read_table(spark, sf_dir, "lineitem")
    dim = build_dim(li, ["l_returnflag", "l_linestatus"], "rf_ls_id")
    return build_fact(
        li,
        dims=[(dim, ["l_returnflag", "l_linestatus"], "rf_ls_id")],
        measures=["l_quantity", "l_extendedprice"],
        extra_keys=["l_orderkey", "l_linenumber"],
    )


# --------------------------------------------------------------------------
# TPC-H Q1 shape: big scan + partial/final agg; the canonical pricing
# summary.  All money math in exact decimals.
# --------------------------------------------------------------------------
@register(
    "agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))
                    * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
           SUM(l_quantity) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "filter", "flagship"),
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str):
    li = read_table(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", 4, 2))
    charge = disc_price * (F.lit(1) + _dec("l_tax", 4, 2))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            _dsum(_dec("l_extendedprice")).alias("sum_base_price"),
            _dsum(disc_price).alias("sum_disc_price"),
            _dsum(charge).alias("sum_charge"),
            (F.sum("l_quantity") / F.count("*")).alias("avg_qty"),
            (_dsum(_dec("l_extendedprice")) / F.count("*")).alias("avg_price"),
            (_dsum(_dec("l_discount", 4, 2)) / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Filter + narrow projection — the plan must show PushedFilters and a
# 3-column ReadSchema at the parquet scan.
# --------------------------------------------------------------------------
@register(
    "filter_pushdown_scan",
    oracle="""
    SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-03-01 00:00:00'
      AND l_quantity <= 5
    """,
    tags=("filter", "pushdown"),
)
def filter_pushdown_scan(spark: SparkSession, sf_dir: str):
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-03-01 00:00:00").cast("timestamp"))
            & (F.col("l_quantity") <= 5)
        )
        .select("l_orderkey", "l_linenumber", F.col("l_shipdate").cast("date").alias("ship_date"))
    )


# --------------------------------------------------------------------------
# Top-k per group via ranked window (SURVEY §2 "sort/limit/top-k").
# --------------------------------------------------------------------------
@register(
    "topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_name, p_retailprice, rk
    FROM (
      SELECT p_brand, p_partkey, p_name, p_retailprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
                                     ORDER BY p_retailprice DESC, p_partkey ASC) AS INT) AS rk
      FROM part
    )
    WHERE rk <= 3
    """,
    tags=("window", "topk"),
)
def topk_per_group(spark: SparkSession, sf_dir: str):
    part = read_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        part.select(
            "p_brand",
            "p_partkey",
            "p_name",
            "p_retailprice",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


# --------------------------------------------------------------------------
# Grouping sets: ROLLUP and CUBE (SURVEY §2 "grouping sets").
# --------------------------------------------------------------------------
@register(
    "rollup_sales",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty, COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg", "rollup"),
)
def rollup_sales(spark: SparkSession, sf_dir: str):
    li = read_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"), F.count("*").alias("n")
    )


@register(
    "cube_sales",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty, COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "cube"),
)
def cube_sales(spark: SparkSession, sf_dir: str):
    li = read_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"), F.count("*").alias("n")
    )


# --------------------------------------------------------------------------
# Set operation: EXCEPT (distinct) — customers who never ordered.
# --------------------------------------------------------------------------
@register(
    "setop_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
    tags=("setop",),
)
def setop_except(spark: SparkSession, sf_dir: str):
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return cust.select("c_custkey").exceptAll(orders.select("o_custkey")).distinct()


# --------------------------------------------------------------------------
# Full outer join: customer x supplier account balances per nation.
# --------------------------------------------------------------------------
@register(
    "join_full_outer",
    oracle="""
    WITH c AS (
      SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS cust_bal
      FROM customer GROUP BY 1
    ), s AS (
      SELECT CAST(s_nationkey AS BIGINT) AS nationkey,
             CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS supp_bal
      FROM supplier GROUP BY 1
    )
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey, c.cust_bal, s.supp_bal
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    """,
    tags=("join", "outer"),
)
def join_full_outer(spark: SparkSession, sf_dir: str):
    cust = (
        read_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").cast("long").alias("nationkey"))
        .agg(_dsum(_dec("c_acctbal")).alias("cust_bal"))
    )
    supp = (
        read_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").cast("long").alias("nationkey"))
        .agg(_dsum(_dec("s_acctbal")).alias("supp_bal"))
    )
    c, s = cust.alias("c"), supp.alias("s")
    return c.join(s, F.col("c.nationkey") == F.col("s.nationkey"), "full_outer").select(
        F.coalesce(F.col("c.nationkey"), F.col("s.nationkey")).alias("nationkey"),
        "cust_bal",
        "supp_bal",
    )


# --------------------------------------------------------------------------
# Set operation: INTERSECT — nations present among both customers and
# suppliers.
# --------------------------------------------------------------------------
@register(
    "setop_intersect",
    oracle="""
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
    INTERSECT
    SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def setop_intersect(spark: SparkSession, sf_dir: str):
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    return cust.select(F.col("c_nationkey").cast("long").alias("nationkey")).intersect(
        supp.select(F.col("s_nationkey").cast("long").alias("nationkey"))
    )


# --------------------------------------------------------------------------
# Anti / semi joins (engine-exposed for dedup & data-quality checks).
# --------------------------------------------------------------------------
@register(
    "join_anti",
    oracle="""
    SELECT c.c_custkey, c.c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join", "anti"),
)
def join_anti(spark: SparkSession, sf_dir: str):
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "join_semi",
    oracle="""
    SELECT c.c_custkey, c.c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join", "semi"),
)
def join_semi(spark: SparkSession, sf_dir: str):
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


# --------------------------------------------------------------------------
# Left-outer join + aggregate with zero-fill.
# --------------------------------------------------------------------------
@register(
    "join_outer_agg",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey) AS n_orders,
           COALESCE(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 0.0)
             AS total_spent
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    tags=("join", "outer", "agg"),
)
def join_outer_agg(spark: SparkSession, sf_dir: str):
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(_dsum(_dec("o_totalprice")), F.lit(0.0)).alias("total_spent"),
        )
    )


# --------------------------------------------------------------------------
# String function battery (SURVEY §2 "string functions").
# --------------------------------------------------------------------------
@register(
    "string_functions",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           CAST(LENGTH(p_name) AS INT) AS name_len,
           REGEXP_EXTRACT(p_name, '^(\\w+)', 1) AS first_word,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           REPLACE(p_type, 'ECONOMY', 'ECO') AS type_short,
           SUBSTR(p_name, 1, 3) AS name_prefix
    FROM part
    """,
    tags=("string",),
)
def string_functions(spark: SparkSession, sf_dir: str):
    part = read_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_type"), F.lit("ECONOMY"), F.lit("ECO")).alias("type_short"),
        F.substring("p_name", 1, 3).alias("name_prefix"),
    )


# --------------------------------------------------------------------------
# Date/time battery + monthly aggregate (SURVEY §2 "date/time").
# --------------------------------------------------------------------------
@register(
    "datetime_agg",
    oracle="""
    SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS order_year,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS order_month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY 1, 2, 3
    """,
    tags=("datetime", "agg"),
)
def datetime_agg(spark: SparkSession, sf_dir: str):
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            _dsum(_dec("o_totalprice")).alias("total"),
        )
    )


# --------------------------------------------------------------------------
# Math + CASE battery.  Only IEEE-deterministic functions (sqrt is
# correctly rounded; floor/ceil/abs/mod exact).
# --------------------------------------------------------------------------
@register(
    "math_case_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity < 10 THEN 'low'
                WHEN l_quantity < 30 THEN 'mid'
                ELSE 'high' END AS qty_bucket,
           SQRT(l_quantity) AS sqrt_qty,
           ABS(l_extendedprice - 1000.0) AS abs_dev,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
           l_orderkey % 7 AS key_mod
    FROM lineitem
    """,
    tags=("math", "case"),
)
def math_case_functions(spark: SparkSession, sf_dir: str):
    li = read_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity") < 30, "mid")
        .otherwise("high")
        .alias("qty_bucket"),
        F.sqrt("l_quantity").alias("sqrt_qty"),
        F.abs(F.col("l_extendedprice") - F.lit(1000.0)).alias("abs_dev"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


# --------------------------------------------------------------------------
# Window battery: row_number, running decimal sum, lag.
# --------------------------------------------------------------------------
@register(
    "window_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ROW_NUMBER() OVER w AS INT) AS seq,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) AS cum_spend,
           LAG(o_totalprice) OVER w AS prev_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("window",),
)
def window_running(spark: SparkSession, sf_dir: str):
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("seq"),
        F.sum(_dec("o_totalprice")).over(w_run).cast("double").alias("cum_spend"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
    )


# --------------------------------------------------------------------------
# TPC-H Q3 shape: selective filters on two tables + join + grouped
# revenue + top-k.
# --------------------------------------------------------------------------
@register(
    "shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           CAST(o.o_orderdate AS DATE) AS order_date
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk", "filter"),
)
def shipping_priority(spark: SparkSession, sf_dir: str):
    cust = read_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01 00:00:00").cast("timestamp")
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01 00:00:00").cast("timestamp")
    )
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", 4, 2))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_dsum(revenue).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("order_date"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# TPC-H Q5 shape: 6-way join with a co-location condition, grouped
# revenue per nation.
# --------------------------------------------------------------------------
@register(
    "nation_revenue",
    oracle="""
    SELECT n.n_name AS nation_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name
    """,
    tags=("join", "agg", "flagship"),
)
def nation_revenue(spark: SparkSession, sf_dir: str):
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", 4, 2))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(_dsum(revenue).alias("revenue"))
    )


_GROUPING_SETS_SQL = """
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus),
                            (o_orderpriority, o_orderstatus), ())
"""


# --------------------------------------------------------------------------
# SQL surface (EP3): the same string runs through Spark SQL's parser and
# the oracle — GROUPING SETS beyond rollup/cube.
# --------------------------------------------------------------------------
@register(
    "sql_grouping_sets",
    oracle=_GROUPING_SETS_SQL,
    tags=("sql", "grouping-sets"),
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str):
    from fotmobdatapipeline_spark.sources.registry import read_table as _rt

    _rt(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_GROUPING_SETS_SQL)


_CORRELATED_SQL = """
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice > (
      SELECT 1.5 * (CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                    / COUNT(*))
      FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
"""


# --------------------------------------------------------------------------
# Correlated scalar subquery (orders 1.5x above their customer's mean) —
# Catalyst decorrelates this into an aggregate + join.
# --------------------------------------------------------------------------
@register(
    "correlated_subquery",
    oracle=_CORRELATED_SQL,
    tags=("sql", "subquery"),
)
def correlated_subquery(spark: SparkSession, sf_dir: str):
    from fotmobdatapipeline_spark.sources.registry import read_table as _rt

    _rt(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_CORRELATED_SQL)


# --------------------------------------------------------------------------
# Conditional aggregates (FILTER / count_if / bool_or).
# --------------------------------------------------------------------------
@register(
    "agg_conditional",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
           SUM(l_quantity) FILTER (WHERE l_quantity > 25) AS big_qty,
           BOOL_OR(l_quantity >= 50) AS has_max_qty,
           CAST(COUNT(*) FILTER (WHERE l_quantity > 25) AS DOUBLE)
             / COUNT(*) AS frac_big
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "conditional"),
)
def agg_conditional(spark: SparkSession, sf_dir: str):
    li = read_table(spark, sf_dir, "lineitem")
    big = F.col("l_quantity") > 25
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.count_if(big).alias("n_big"),
        F.sum(F.when(big, F.col("l_quantity"))).alias("big_qty"),
        F.bool_or(F.col("l_quantity") >= 50).alias("has_max_qty"),
        (F.count_if(big).cast("double") / F.count("*")).alias("frac_big"),
    )


# --------------------------------------------------------------------------
# Window frames: moving average (explicit ROWS frame), first/last value,
# ntile quartiles.
# --------------------------------------------------------------------------
@register(
    "window_frames",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w3 AS DOUBLE)
             / COUNT(*) OVER w3 AS moving_avg_3,
           FIRST_VALUE(o_orderkey) OVER wfull AS first_key,
           LAST_VALUE(o_orderkey) OVER wcur AS last_key_so_far,
           CAST(NTILE(4) OVER wo AS INT) AS quartile
    FROM orders
    WINDOW
      wo AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
      w3 AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
      wcur AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      wfull AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window", "frames"),
)
def window_frames(spark: SparkSession, sf_dir: str):
    orders = read_table(spark, sf_dir, "orders")
    wo = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    w3 = wo.rowsBetween(-2, Window.currentRow)
    wcur = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wfull = wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(_dec("o_totalprice")).over(w3).cast("double") / F.count("*").over(w3)
        ).alias("moving_avg_3"),
        F.first("o_orderkey").over(wfull).alias("first_key"),
        F.last("o_orderkey").over(wcur).alias("last_key_so_far"),
        F.ntile(4).over(wo).alias("quartile"),
    )


# --------------------------------------------------------------------------
# Date/time arithmetic battery.
# --------------------------------------------------------------------------
@register(
    "datetime_arithmetic",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber,
           CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS INT) AS ship_delay_days,
           CAST(o.o_orderdate AS DATE) + 30 AS due_date,
           last_day(o.o_orderdate) AS month_end,
           CAST(EXTRACT(QUARTER FROM o.o_orderdate) AS INT) AS order_quarter,
           CAST(EXTRACT(DOY FROM l.l_shipdate) AS INT) AS ship_doy
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
    tags=("datetime",),
)
def datetime_arithmetic(spark: SparkSession, sf_dir: str):
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    return li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        F.datediff("l_shipdate", "o_orderdate").alias("ship_delay_days"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.last_day("o_orderdate").alias("month_end"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.dayofyear("l_shipdate").alias("ship_doy"),
    )


# --------------------------------------------------------------------------
# Unpivot / melt (SURVEY §2 set ops & reshaping).
# --------------------------------------------------------------------------
@register(
    "part_unpivot",
    oracle="""
    SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val FROM part
    """,
    tags=("unpivot",),
)
def part_unpivot(spark: SparkSession, sf_dir: str):
    part = read_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    ).unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="attr",
        valueColumnName="val",
    )


# --------------------------------------------------------------------------
# Approximate aggregates (HLL++ sketch).  The sketch estimate itself is
# engine-specific, so the query checks the HLL error contract in-plan
# (|approx - exact| within 3x the requested rsd, +10 absolute slack for
# tiny groups where linear counting takes over) and emits the exact
# count plus the deterministic verdict — oracle-comparable while still
# exercising the sketch.
# --------------------------------------------------------------------------
_HLL_RSD = 0.05


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS exact_customers,
           TRUE AS hll_within_rsd
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg", "approx"),
    doc="HLL++ distinct count, error contract checked in-plan.",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str):
    orders = read_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", _HLL_RSD).alias("approx_customers"),
        F.countDistinct("o_custkey").alias("exact_customers"),
    )
    bound = 3 * _HLL_RSD * F.col("exact_customers") + 10
    return agg.select(
        "o_orderpriority",
        "exact_customers",
        (F.abs(F.col("approx_customers") - F.col("exact_customers")) <= bound)
        .alias("hll_within_rsd"),
    )



# --------------------------------------------------------------------------
# S2 + S4-S7 on real files: deterministic fotmob-shaped JSONL landing
# zone generated at query time, read with the explicit MATCH_SCHEMA,
# nested structs navigated + shots array exploded + renamed/
# canonicalized (fotmob.read_matches/flatten_shots/clean_shots,
# dag:39-121).  The oracle re-parses the SAME files with DuckDB
# read_json under an equally explicit schema, so the gate proves the
# whole ingestion path — JSON parsing, struct navigation, explode,
# rename, value canon — value-exact across engines.
# --------------------------------------------------------------------------
_FOTMOB_SHOT_COLS = (
    "STRUCT(id BIGINT, eventType VARCHAR, teamId BIGINT, playerName VARCHAR, "
    "situation VARCHAR, shotType VARCHAR, x DOUBLE, y DOUBLE, "
    "isBlocked BOOLEAN, blockedX DOUBLE, blockedY DOUBLE, "
    "goalCrossedY DOUBLE, goalCrossedZ DOUBLE, "
    "expectedGoals DOUBLE, expectedGoalsOnTarget DOUBLE)"
)


def _fotmob_ingest_oracle() -> str:
    from fotmobdatapipeline_spark.fotmob import LANDING_ZONE_DIR, ensure_landing_zone

    # Passed as a CALLABLE to @register, so this body runs at
    # oracle_sql() assembly time, not at module import — importing
    # plans/core.py must not touch the filesystem.  A harness may still
    # run the oracle SQL before the Spark plan function, so the zone is
    # ensured here (memoized, per-shard atomic write-then-rename) before
    # the glob below is handed to DuckDB.
    ensure_landing_zone()
    canon = "CASE WHEN {c} = 'Tottenham' THEN 'Tottenham Hotspur' ELSE {c} END"
    return f"""
    WITH m AS (
      SELECT matchId,
             general.homeTeam.name AS raw_home,
             general.homeTeam.id AS home_team_id,
             general.awayTeam.name AS raw_away,
             general.awayTeam.id AS away_team_id,
             UNNEST(content.shotmap.shots) AS shot
      FROM read_json('{LANDING_ZONE_DIR}/*.jsonl', columns = {{
        'matchId': 'VARCHAR',
        'general': 'STRUCT(homeTeam STRUCT(name VARCHAR, id BIGINT),
                           awayTeam STRUCT(name VARCHAR, id BIGINT))',
        'content': 'STRUCT(shotmap STRUCT(shots {_FOTMOB_SHOT_COLS}[]))'
      }})
    )
    SELECT matchId AS "matchId",
           {canon.format(c="raw_home")} AS home_team_name,
           home_team_id,
           {canon.format(c="raw_away")} AS away_team_name,
           away_team_id,
           shot.id AS shot_id,
           shot.eventType AS event_type,
           shot.teamId AS "teamId",
           shot.playerName AS player_name,
           shot.situation AS situation,
           shot.shotType AS shot_type,
           shot.x AS shot_from_x,
           shot.y AS shot_from_y,
           shot.isBlocked AS is_blocked,
           shot.blockedX AS blocked_x,
           shot.blockedY AS blocked_y,
           shot.goalCrossedY AS goal_crossed_y,
           shot.goalCrossedZ AS goal_crossed_z,
           shot.expectedGoals AS "xG",
           shot.expectedGoalsOnTarget AS "xGOT"
    FROM m
    """


@register(
    "fotmob_json_ingest",
    oracle=_fotmob_ingest_oracle,
    tags=("source", "json", "nested", "reference-surface"),
    doc="Nested-JSON ingestion: landing zone -> flat clean shots.",
)
def fotmob_json_ingest(spark: SparkSession, sf_dir: str):
    from fotmobdatapipeline_spark import fotmob

    path = fotmob.ensure_landing_zone()
    return fotmob.clean_shots(fotmob.flatten_shots(fotmob.read_matches(spark, path)))


# --------------------------------------------------------------------------
# Shot-map grid: the reference dashboard's signature visual (readme:5 —
# xG shot maps) as an engine aggregate.  Pitch coordinates binned to a
# fixed grid, per-team shot/goal counts and exact-decimal xG mass per
# cell — one map + one combinable aggregate over the ingested shots;
# the heatmap any BI tool renders directly.  Grid edges are literals
# (the pitch doesn't grow with data), so per-match/per-day cell tables
# merge by cell-sum like every other fixed-geometry sketch here.
# --------------------------------------------------------------------------
def _fotmob_shot_grid_oracle() -> str:
    return f"""
    WITH ingest AS ({_fotmob_ingest_oracle()})
    SELECT "teamId",
           CAST(FLOOR(shot_from_x) AS INT) AS gx,
           CAST(FLOOR(shot_from_y / 5.0) AS INT) AS gy,
           CAST(COUNT(*) AS BIGINT) AS n_shots,
           CAST(COUNT(*) FILTER (WHERE event_type = 'Goal') AS BIGINT) AS n_goals,
           CAST(SUM(CAST(ROUND("xG", 6) AS DECIMAL(18,6))) AS DOUBLE) AS xg_sum
    FROM ingest
    GROUP BY 1, 2, 3
    """


@register(
    "fotmob_shot_grid",
    oracle=_fotmob_shot_grid_oracle,
    tags=("analytics", "reference-surface", "grid"),
    doc="Per-team pitch-grid shot heatmap: counts, goals, exact-decimal xG mass.",
)
def fotmob_shot_grid(spark: SparkSession, sf_dir: str):
    from fotmobdatapipeline_spark import fotmob

    path = fotmob.ensure_landing_zone()
    shots = fotmob.clean_shots(
        fotmob.flatten_shots(fotmob.read_matches(spark, path))
    )
    return shots.groupBy(
        "teamId",
        F.floor(F.col("shot_from_x")).cast("int").alias("gx"),
        F.floor(F.col("shot_from_y") / F.lit(5.0)).cast("int").alias("gy"),
    ).agg(
        F.count("*").alias("n_shots"),
        F.count_if(F.col("event_type") == "Goal").alias("n_goals"),
        F.sum(F.round(F.col("xG"), 6).cast("decimal(18,6)"))
        .cast("double")
        .alias("xg_sum"),
    )


# --------------------------------------------------------------------------
# Declarative expectations report (the dbt-test / Great-Expectations
# runner shape): a constraint list evaluated as ONE aggregate pass per
# table — every predicate is a count_if in the same scan, so adding an
# expectation costs a column, not a pass — plus referential checks as
# anti-join counts.  Output one row per expectation with its violation
# count; the report any warehouse gates deploys on.
# --------------------------------------------------------------------------
@register(
    "dq_expectations_report",
    oracle="""
    SELECT 'lineitem' AS table_name, 'quantity_in_1_50' AS expectation,
           CAST(COUNT(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50)
                AS BIGINT) AS n_violations
    FROM lineitem
    UNION ALL
    SELECT 'lineitem', 'discount_in_0_0p1',
           CAST(COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1)
                AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem', 'extendedprice_positive',
           CAST(COUNT(*) FILTER (WHERE l_extendedprice <= 0 OR l_extendedprice IS NULL)
                AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'orders', 'status_enum',
           CAST(COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
                AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders', 'totalprice_positive',
           CAST(COUNT(*) FILTER (WHERE o_totalprice <= 0 OR o_totalprice IS NULL)
                AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'documents', 'n_chars_matches_text',
           CAST(COUNT(*) FILTER (WHERE n_chars != length(text)) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'events', 'value_positive',
           CAST(COUNT(*) FILTER (WHERE value <= 0 OR value IS NULL) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'lineitem->orders', 'fk_orderkey',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
    """,
    tags=("dq", "audit"),
    doc="Declarative expectations: one count_if pass per table + FK anti-join counts.",
)
def dq_expectations_report(spark: SparkSession, sf_dir: str):
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    docs = read_table(spark, sf_dir, "documents")
    ev = read_table(spark, sf_dir, "events")

    def report(df, table, checks):
        # One aggregate scan per table: every expectation a count_if in
        # the SAME agg, melted to rows with stack() — a union of
        # per-check selects would re-execute the full-table aggregate
        # once per branch (the repeated-subtree trap).
        agg = df.agg(
            *[F.count_if(bad).cast("bigint").alias(name) for name, bad in checks]
        )
        stack_args = ", ".join(f"'{name}', {name}" for name, _ in checks)
        return agg.select(
            F.lit(table).alias("table_name"),
            F.expr(
                f"stack({len(checks)}, {stack_args})"
                " AS (expectation, n_violations)"
            ),
        )

    li_checks = [
        ("quantity_in_1_50", (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)),
        ("discount_in_0_0p1", (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)),
        (
            "extendedprice_positive",
            (F.col("l_extendedprice") <= 0) | F.col("l_extendedprice").isNull(),
        ),
    ]
    ord_checks = [
        ("status_enum", ~F.col("o_orderstatus").isin("O", "F", "P")),
        (
            "totalprice_positive",
            (F.col("o_totalprice") <= 0) | F.col("o_totalprice").isNull(),
        ),
    ]
    doc_checks = [
        ("n_chars_matches_text", F.col("n_chars") != F.length("text")),
    ]
    ev_checks = [
        ("value_positive", (F.col("value") <= 0) | F.col("value").isNull()),
    ]
    fk = (
        li.select("l_orderkey")
        .join(orders.select("o_orderkey"), li["l_orderkey"] == orders["o_orderkey"], "left_anti")
        .agg(F.count("*").cast("bigint").alias("n_violations"))
        .select(
            F.lit("lineitem->orders").alias("table_name"),
            F.lit("fk_orderkey").alias("expectation"),
            "n_violations",
        )
    )
    return (
        report(li, "lineitem", li_checks)
        .unionByName(report(orders, "orders", ord_checks))
        .unionByName(report(docs, "documents", doc_checks))
        .unionByName(report(ev, "events", ev_checks))
        .unionByName(fk)
    )


# --------------------------------------------------------------------------
# k-anonymity audit over quasi-identifiers: group sizes for the
# (lang, source) QI tuple with the re-identification flag (size < k) —
# the governance gate run before releasing/joining a dataset keyed on
# demographic-ish columns.  One combinable aggregate; at 100 TB the QI
# cardinality (not the row count) bounds the output.
# --------------------------------------------------------------------------
_K_ANON = 5


@register(
    "dq_k_anonymity",
    oracle=f"""
    SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS group_size,
           (COUNT(*) < {_K_ANON}) AS at_risk
    FROM documents GROUP BY lang, source
    """,
    tags=("dq", "privacy", "audit"),
    doc=f"k-anonymity (k={_K_ANON}) group sizes over the (lang, source) quasi-identifiers.",
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str):
    docs = read_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count("*").alias("group_size"),
        (F.count("*") < _K_ANON).alias("at_risk"),
    )
