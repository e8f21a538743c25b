"""Round-13 scaled-k SemDeDup demonstration (sf10 audit follow-up).

The catalog entry ``dedup_semantic_clusters`` pins k=8 because its
value-exact oracle is an UNROLLED k-means CTE chain — correct at suite
scale, but at sf10 (200k vectors) 8 cells of 25k mean 2.5B in-cell
cosines and the JVM interpreted-fold form times out (the audit's one
TIMEOUT).  The operator contract has always said k must grow with the
corpus (similarity.py::semantic_dedup docstring; SemDeDup/LAION used
50k clusters).  This script MEASURES that doctrine at sf10:

  * trains k=400 centroids on a 1/16 deterministic hash sample
    (kmeans_lloyd train_sample_mod — assignment cost is rows*k*dim per
    iteration, and centroid quality needs a sample, not the corpus);
  * runs semantic_dedup_cells (the numpy scale path, bit-identical to
    the JVM join — test_semantic_dedup_cells_bit_equals_jvm) over the
    full 200k vectors;
  * reports wall for train / dedup, and the verdict split.

Usage: python tools/r13_semdedup_scale.py [--k 400] [--sample-mod 16]
Requires /tmp/spark_graft_synth_sf10 (built by tools/sf10_sweep.py).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
SF10_DIR = "/tmp/spark_graft_synth_sf10"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=400)
    ap.add_argument("--iterations", type=int, default=3)
    ap.add_argument("--sample-mod", type=int, default=16)
    ap.add_argument("--tau", type=float, default=0.3)
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.similarity import (
        kmeans_lloyd,
        semantic_dedup_cells,
    )
    from fotmobdatapipeline_spark.session import tune_session

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    tune_session(spark)
    emb = spark.read.parquet(os.path.join(SF10_DIR, "embeddings.parquet"))
    n = emb.count()
    print(f"vectors: {n}", flush=True)

    t0 = time.perf_counter()
    cents = kmeans_lloyd(
        emb, k=args.k, iterations=args.iterations,
        train_sample_mod=args.sample_mod,
    )
    cents = cents.localCheckpoint()  # training done; freeze for timing split
    t_train = time.perf_counter() - t0
    print(f"train k={args.k} iters={args.iterations} "
          f"sample_mod={args.sample_mod}: {t_train:.1f}s", flush=True)

    for run in range(2):
        t0 = time.perf_counter()
        out = semantic_dedup_cells(emb, cents, tau=args.tau)
        out.write.format("noop").mode("overwrite").save()
        print(f"dedup run {run}: {time.perf_counter() - t0:.1f}s", flush=True)

    verdict = (
        semantic_dedup_cells(emb, cents, tau=args.tau)
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("kept").cast("int")).alias("kept"),
        )
        .first()
    )
    print(f"verdict: {verdict['kept']}/{verdict['n']} kept", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
