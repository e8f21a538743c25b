"""Round-14 semantic-stream trigger-amortization measurement
(VERDICT r13 #8).

SCALE.md r13 attributes the semantic tier's remaining gap to
per-micro-batch fixed cost (query-plan setup, Arrow batch framing,
offset-log commits) that "production amortizes with bigger triggers".
This script closes the claim with a number: the identical 50k-row feed
drained at the bench's trigger (maxFilesPerTrigger=8 -> 8 batches) and
at 4x the trigger (32 -> 2 batches), same session, back to back, twice
each (report best — the bench's min-of-n doctrine).

Usage: python tools/r14_semantic_trigger.py
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def main() -> int:
    sys.path.insert(0, REPO)
    os.environ.setdefault("SPARK_GRAFT_BENCH_INNER", "1")
    from pyspark.sql import SparkSession

    import bench
    from fotmobdatapipeline_spark.session import tune_session

    print("loadavg", os.getloadavg(), flush=True)
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    tune_session(spark)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    results: dict = {}
    for trigger in (8, 32):
        runs = [
            bench._semantic_stream_bench(
                spark, sf_dir, max_files_per_trigger=trigger
            )
            for _ in range(2)
        ]
        best = max(runs, key=lambda r: r["rows_per_sec"])
        results[f"trigger_{trigger}"] = {**best, "all_rps": [
            r["rows_per_sec"] for r in runs
        ]}
        print(f"maxFilesPerTrigger={trigger}: {best['rows_per_sec']} rows/s "
              f"({best['n_batches']} batches, {best['wall_sec']}s)", flush=True)

    r8 = results["trigger_8"]["rows_per_sec"]
    r32 = results["trigger_32"]["rows_per_sec"]
    results["amortization_speedup_4x_trigger"] = round(r32 / r8, 2)
    print(f"4x trigger speedup: {results['amortization_speedup_4x_trigger']}x",
          flush=True)
    out = os.path.join(HERE, "r14_semantic_trigger.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(f"wrote {out}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
