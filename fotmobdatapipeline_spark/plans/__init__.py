from fotmobdatapipeline_spark.plans.catalog import QUERIES, QuerySpec, oracle_map, query_map

__all__ = ["QUERIES", "QuerySpec", "oracle_map", "query_map"]
