"""Full-catalog execution audit: run EVERY catalog entry once at a
given SF (noop sink), print per-entry wall seconds, the slowest tail,
and any errors.  The self-audit that caught the uncapped SimHash band
fan-out (27.9 s at sf0.1) before the driver did; re-run it whenever a
round adds entries.

Usage: python tools/catalog_sweep.py [sf_dir] [cpus]
Defaults: /root/testdata/sf0.1, 32.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"

    from pyspark.sql import SparkSession

    from fotmobdatapipeline_spark.plans.catalog import QUERIES, _load_all
    from fotmobdatapipeline_spark.session import tune_session

    print("loadavg", os.getloadavg(), flush=True)
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    tune_session(spark)
    _load_all()
    times: dict[str, object] = {}
    for name in sorted(QUERIES):
        t0 = time.time()
        try:
            QUERIES[name].builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times[name] = round(time.time() - t0, 2)
        except Exception as e:  # keep sweeping; report at the end
            times[name] = f"ERR {type(e).__name__}: {str(e)[:120]}"
        print(name, times[name], flush=True)

    nums = [(v, k) for k, v in times.items() if isinstance(v, float)]
    print("== slowest ==")
    for v, k in sorted(nums, reverse=True)[:15]:
        print(k, v)
    errs = [(k, v) for k, v in times.items() if not isinstance(v, float)]
    print("errors:", errs)
    print(
        f"== {len(nums)} entries, total {sum(v for v, _ in nums):.1f}s, "
        f"median {sorted(v for v, _ in nums)[len(nums) // 2]:.2f}s =="
    )
    spark.stop()
    return 1 if errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
