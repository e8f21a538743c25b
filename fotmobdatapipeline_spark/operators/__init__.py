from fotmobdatapipeline_spark.operators.star import (
    build_dim,
    build_fact,
    denormalize,
)

__all__ = ["build_dim", "build_fact", "denormalize"]
