"""Round-14 optimization profiler: split each headline entry's bench
wall into (a) Python builder time (DataFrame construction: py4j calls +
any driver-side work in the builder), (b) JVM planning time
(analysis + optimization + physical planning, forced via
executedPlan()), and (c) execution time (noop sink, which re-plans under
AQE but with a warm catalog).  The bench's timed_run() pays a+b+c every
run, so all three are real optimization surface (guide §1.1: decide
where the time actually goes before touching anything).

Usage: python tools/r14_profile.py [entry ...]   (default: all HEADLINE)
Writes tools/r14_profile.json: {entry: {build, plan, exec1, exec2}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    from bench import HEADLINE

    from fotmobdatapipeline_spark.plans.catalog import query_map
    from fotmobdatapipeline_spark.session import get_spark

    names = sys.argv[1:] or HEADLINE
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_MASTER", f"local[{cpus}]")
    spark = get_spark(app_name="r14-profile", shuffle_partitions=int(cpus))
    qmap = query_map()

    from fotmobdatapipeline_spark.sources.registry import TABLES, read_table

    for t in TABLES:
        read_table(spark, SF_DIR, t).limit(1).collect()

    out: dict[str, dict[str, float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"r14-profile: {name}")
        t0 = time.perf_counter()
        df = qmap[name](spark, SF_DIR)
        t1 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        t2 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        # Second full run (fresh build, the bench's second sample shape).
        t4 = time.perf_counter()
        qmap[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        t5 = time.perf_counter()
        rec = {
            "build": round(t1 - t0, 3),
            "plan": round(t2 - t1, 3),
            "exec1": round(t3 - t2, 3),
            "run2": round(t5 - t4, 3),
        }
        out[name] = rec
        print(f"# {name}: {rec}", file=sys.stderr, flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "r14_profile.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# written {path}", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
