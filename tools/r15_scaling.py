"""Round-15 informative scaling block (VERDICT r14 #8): run the heavy
(≥2 s at sf0.1) entries at sf1 under local[8] vs local[32] and report
the per-entry core-scaling ratio.  sf0.1 entries are fixed-cost-bound
(every r14 ratio ≈ 1); at sf1 the data term dominates and a healthy
distributed shape should approach the core ratio on compute-bound
entries.

Usage:
  python tools/r15_scaling.py            # orchestrates both runs
  python tools/r15_scaling.py --inner 8  # one timing pass (internal)

Writes tools/r15_scaling.json: {entry: {"c8": s, "c32": s, "ratio": r}}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

SF1_DIR = "/tmp/spark_graft_synth_sf1"

ENTRIES = [
    # bench's vetted sf1 set, heavy members
    "flagship_revenue_topk",
    "star_denorm_wide",
    "dedup_lsh_candidates",
    "text_sentence_dedup",
    "sim_ivf_topk",
    "lm_perplexity_rank",
    "pack_block_fill",
    "pref_btl_ratings",
    "events_ltv_deciles",
    "events_rfm_segments",
    "events_kendall_tau",
    "join_bloom_prefilter",
    "multimodal_image_dhash",
    # r15 adds: heavy at sf0.1, linear shapes at sf1
    "llm_prep_pipeline_v3",
    "events_mann_kendall",
    "agg_trimmed_mean",
    "agg_winsorized",
    "join_salted_agg",
    "events_session_sweepline",
    "graph_label_propagation",
]

PER_ENTRY_BUDGET = float(os.environ.get("SPARK_GRAFT_SCALING_BUDGET", "240"))


def _inner(cpus: str) -> int:
    os.environ["SPARK_MASTER"] = f"local[{cpus}]"
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    from fotmobdatapipeline_spark.plans.catalog import query_map
    from fotmobdatapipeline_spark.session import get_spark
    from fotmobdatapipeline_spark.sources.synth import generate_scale_tables

    spark = get_spark(app_name=f"r15-scaling-c{cpus}",
                      shuffle_partitions=int(cpus))
    generate_scale_tables(spark, 1.0, SF1_DIR)  # cached after first run
    qmap = query_map()
    out: dict[str, float] = {}
    for name in ENTRIES:
        runs = []
        try:
            for _ in range(2):
                t0 = time.perf_counter()
                qmap[name](spark, SF1_DIR).write.format("noop").mode(
                    "overwrite").save()
                runs.append(round(time.perf_counter() - t0, 3))
                if runs[-1] > PER_ENTRY_BUDGET:
                    break
        except Exception as e:
            print(f"# c{cpus}/{name}: ERROR {str(e)[:90]}", file=sys.stderr)
            continue
        out[name] = min(runs)
        print(f"# c{cpus}/{name}: {min(runs):.3f}s (runs {runs})",
              file=sys.stderr, flush=True)
    print(json.dumps(out))
    spark.stop()
    return 0


def main() -> int:
    if "--inner" in sys.argv:
        return _inner(sys.argv[sys.argv.index("--inner") + 1])
    results: dict[str, dict] = {}
    per_cpu: dict[str, dict] = {}
    for cpus in ["32", "8"]:
        print(f"# === local[{cpus}] pass ===", file=sys.stderr, flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--inner", cpus],
            capture_output=True, text=True)
        sys.stderr.write(proc.stderr[-4000:])
        line = next((ln for ln in reversed(proc.stdout.splitlines())
                     if ln.startswith("{")), "{}")
        per_cpu[cpus] = json.loads(line)
    for name in ENTRIES:
        c8 = per_cpu.get("8", {}).get(name)
        c32 = per_cpu.get("32", {}).get(name)
        if c8 and c32:
            results[name] = {"c8": c8, "c32": c32,
                             "ratio": round(c8 / c32, 2)}
    path = os.path.join(HERE, "r15_scaling.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(f"# written {path}", file=sys.stderr)
    for name, r in sorted(results.items(), key=lambda kv: -kv[1]["ratio"]):
        print(f"# {name}: c8={r['c8']}s c32={r['c32']}s ratio={r['ratio']}",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
