"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``fotmobdatapipeline_spark/plans/`` — one entry per
operator from SURVEY.md §2 plus the LLM-data-pipeline operators.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from fotmobdatapipeline_spark.plans.catalog import query_map
    from fotmobdatapipeline_spark.session import tune_session

    tune_session(spark)
    return query_map()["flagship_revenue_topk"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    """
    from fotmobdatapipeline_spark.plans.catalog import query_map

    return query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each key in ``queries()``."""
    from fotmobdatapipeline_spark.plans.catalog import oracle_map

    return oracle_map()
