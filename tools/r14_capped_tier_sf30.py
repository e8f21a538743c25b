"""Round-14 capped-tier sf30 probe (VERDICT r13 #7).

The three largest absolute sf10 walls in the ledger are the capped
posting-list tiers: ``sim_tfidf_pairs`` (149.5 s, df<=50),
``text_containment_capped`` (113.0 s, max_df=50), with lossless
``text_containment_pairs`` beside them.  Their scale argument is
arithmetic: total pair volume is Sum_s min(df(s), cap)^2 / 2, and under
a Heaps-consistent vocabulary the number of distinct shingles grows
sublinearly in the corpus while each shingle's contribution is capped
at cap^2/2 — so wall growth from sf10 onward should be at most linear
in data volume.  This script turns that from arithmetic into a second
measured point on the curve: one more decade-third (sf10 -> sf30, 3x
data) for the CAPPED forms, plus ``dedup_jaccard_capped`` as a cheap
control of the same class.

Vocabulary: the sf10 protocol uses doc_vocab=170 (reproduces sf0.1's
shingle density — sources/synth.py:111).  Holding the Heaps exponent
that choice implies (30 -> 170 over 100x data ~ n^0.38), sf30 (3x sf10)
gets doc_vocab = 170 * 3^0.38 ~ 258, rounded to 260.

Only the ``documents`` table is generated (the probed entries read
nothing else); the sf10 corpus must already exist (tools/sf10_sweep.py)
so both points of the new segment come from the same session.

Usage: python tools/r14_capped_tier_sf30.py [--budget 1800]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
SF10_DIR = "/tmp/spark_graft_synth_sf10"
SF30_DIR = "/tmp/spark_graft_synth_sf30"

ENTRIES = ("sim_tfidf_pairs", "text_containment_capped",
           "dedup_jaccard_capped")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=float, default=1800.0)
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession

    from fotmobdatapipeline_spark.plans.catalog import QUERIES, _load_all
    from fotmobdatapipeline_spark.session import tune_session
    from fotmobdatapipeline_spark.sources.synth import generate_scale_tables
    from tools.sf10_sweep import timed_min2

    print("loadavg", os.getloadavg(), flush=True)
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    tune_session(spark)
    _load_all()

    t0 = time.perf_counter()
    generate_scale_tables(spark, 10, SF10_DIR, partitions=64, doc_vocab=170,
                          tables=("documents",))
    generate_scale_tables(spark, 30, SF30_DIR, partitions=96, doc_vocab=260,
                          tables=("documents",))
    print(f"generate/verify: {time.perf_counter() - t0:.1f}s", flush=True)

    results: dict = {}
    for name in ENTRIES:
        b = QUERIES[name].builder
        s10 = timed_min2(spark, b, SF10_DIR, 64, args.budget)
        s30 = timed_min2(spark, b, SF30_DIR, 96, args.budget)
        growth = (
            round(s30 / s10, 2)
            if isinstance(s10, float) and isinstance(s30, float) and s10 > 0
            else None
        )
        results[name] = {"sf10": s10, "sf30": s30, "growth_3x_data": growth}
        print(f"{name}: sf10={s10} sf30={s30} growth={growth} "
              f"(linear would be 3.0)", flush=True)

    out = os.path.join(HERE, "r14_sf30_probe.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(f"wrote {out}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
