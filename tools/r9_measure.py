"""Round-9 measurements (VERDICT r8 #6 and #8), run SOLO on a quiet box.

#8: star_build_write and sim_rp_bucket_join re-measured solo at sf0.1 to
    adjudicate the r7->r8 in-suite regressions (+38% / +39%) between
    ambient load and a real plan change.
#6: semantic-stream trigger-size curve — rows/s and per-batch latency at
    maxFilesPerTrigger in {2, 8, 32, 64} over the same 50k-row feed, to
    size the production trigger (the per-micro-batch fixed cost was the
    r8 gap between semantic 3.4k rows/s and the text tiers' 8.6k).

Usage: python tools/r9_measure.py [star|trigger|all]
Prints one JSON line per measurement; paste results into SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _spin() -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(5_000_000):
        x += i * i
    assert x
    return round(time.perf_counter() - t0, 3)


def _session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("r9-measure")
        .getOrCreate()
    )


def measure_star(spark) -> dict:
    from fotmobdatapipeline_spark.plans.catalog import query_map
    from fotmobdatapipeline_spark.plans.star_build import run_star_build

    qmap = query_map()
    out: dict = {"calib_spin_sec": _spin(), "loadavg_1m": round(os.getloadavg()[0], 2)}
    runs = []
    for _ in range(3):
        with tempfile.TemporaryDirectory(prefix="r9_star_") as d:
            t0 = time.perf_counter()
            run_star_build(spark, SF_DIR, d)
            runs.append(round(time.perf_counter() - t0, 3))
    out["star_build_write_runs"] = runs
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        qmap["sim_rp_bucket_join"](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        runs.append(round(time.perf_counter() - t0, 3))
    out["sim_rp_bucket_join_runs"] = runs
    out["calib_spin_sec_after"] = _spin()
    return out


def measure_trigger_curve(spark, target_rows: int = 50_000) -> dict:
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.similarity import kmeans_lloyd
    from fotmobdatapipeline_spark.sources.registry import read_table
    from fotmobdatapipeline_spark.streaming.similarity import (
        semantic_dedup_stream,
        semantic_index,
    )

    emb = read_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    n_emb = emb.count()
    reps = max(1, -(-target_rows // n_emb))
    feed = emb.crossJoin(spark.range(reps).withColumnRenamed("id", "rep")).select(
        (F.col("vec_id") + F.col("rep") * n_emb).alias("vec_id"), "embedding"
    )
    staged = tempfile.mkdtemp(prefix="r9_semantic_")
    feed.repartition(64).write.mode("overwrite").parquet(f"{staged}/files")
    n_rows = n_emb * reps
    schema = spark.read.parquet(f"{staged}/files").schema
    cents = kmeans_lloyd(emb, k=8, iterations=2)
    index = semantic_index(emb, cents).localCheckpoint(eager=True)

    out: dict = {
        "rows": n_rows,
        "calib_spin_sec": _spin(),
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "curve": {},
    }
    for mfpt in (2, 8, 32, 64):
        walls = []
        for _ in range(2):
            ckpt = tempfile.mkdtemp(prefix="r9_sem_ckpt_")
            t0 = time.perf_counter()
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", mfpt)
                .parquet(f"{staged}/files")
            )
            q = (
                semantic_dedup_stream(stream, cents, F.broadcast(index), tau=0.3)
                .writeStream.format("noop")
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .start()
            )
            q.processAllAvailable()
            q.stop()
            walls.append(round(time.perf_counter() - t0, 3))
            shutil.rmtree(ckpt, ignore_errors=True)
        wall = min(walls)
        n_batches = -(-64 // mfpt)
        out["curve"][str(mfpt)] = {
            "n_batches": n_batches,
            "wall_sec": wall,
            "rows_per_sec": round(n_rows / wall),
            "batch_latency_sec": round(wall / n_batches, 3),
            "runs": walls,
        }
    shutil.rmtree(staged, ignore_errors=True)
    out["calib_spin_sec_after"] = _spin()
    return out


def main() -> int:
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = _session()
    if what in ("star", "all"):
        print(json.dumps({"star": measure_star(spark)}), flush=True)
    if what in ("trigger", "all"):
        print(json.dumps({"trigger": measure_trigger_curve(spark)}), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
