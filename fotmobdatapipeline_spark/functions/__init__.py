from fotmobdatapipeline_spark.functions.cleaning import canonicalize_values, rename_columns
from fotmobdatapipeline_spark.functions.metrics import sga

__all__ = ["canonicalize_values", "rename_columns", "sga"]
