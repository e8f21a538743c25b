"""Benchmark harness: run the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Each query is forced end-to-end with the noop sink (full computation,
no driver-side collect, no disk write) — the number is engine time, not
transfer time.  Cold session, one warm-up of the parquet footer reads.
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "flagship_revenue_topk",
    "agg_pricing_summary",
    "star_denorm_wide",
    "nation_revenue",
    "shipping_priority",
    "window_running",
    "topk_per_group",
    "events_tumbling_hour",
    "events_sessionize",
    "dedup_minhash_signatures",
    "dedup_ngram_jaccard",
    "dedup_lsh_candidates",
    "sim_bruteforce_topk",
    "sim_ivf_topk",
    "text_quality",
    "join_range_banded",
    "join_salted_agg",
    "events_interval_join",
    "window_trailing_range",
    "sample_hash_agg",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")

    from fotmobdatapipeline_spark.plans.catalog import query_map
    from fotmobdatapipeline_spark.session import get_spark

    os.environ.setdefault("SPARK_MASTER", f"local[{cpus}]")
    spark = get_spark(app_name="fotmob-bench", shuffle_partitions=int(cpus))
    qmap = query_map()

    # Warm up parquet footers + the session (JVM/codegen/catalog), so the
    # per-query numbers measure the engine, not first-touch setup.
    from fotmobdatapipeline_spark.sources.registry import TABLES, read_table

    for t in TABLES:
        read_table(spark, sf_dir, t).limit(1).collect()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        t0 = time.perf_counter()
        df = qmap[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        timings[name] = dt
        total += dt
        print(f"# {name}: {dt:.3f}s", file=sys.stderr)

    # BASELINE.md target #5: the full star-schema build incl. all writes.
    import tempfile

    from fotmobdatapipeline_spark.plans.star_build import run_star_build

    with tempfile.TemporaryDirectory(prefix="fotmob_bench_star_") as out:
        t0 = time.perf_counter()
        run_star_build(spark, sf_dir, out)
        dt = round(time.perf_counter() - t0, 3)
    timings["star_build_write"] = dt
    total += dt
    print(f"# star_build_write: {dt:.3f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_suite_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
