"""Capture .explain('formatted') for named catalog entries at sf0.1
into <out_dir>/<entry>_<tag>.txt — round-15 optimization evidence.

Usage: python tools/r15_capture_plans.py <out_dir> <tag> <entry> [entry ...]

Run from a round-start git worktree to produce _before dumps, from the
working tree for _after.  Entries whose returned frame is a checkpoint
leaf (iterative operators) dump as a LogicalRDD scan — for those the
evidence is the operator code + job profiles, as in r14.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    out_dir, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    from fotmobdatapipeline_spark.plans.catalog import query_map
    from fotmobdatapipeline_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_MASTER", f"local[{cpus}]")
    spark = get_spark(app_name="r15-plans", shuffle_partitions=int(cpus))
    qmap = query_map()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qmap[name](spark, SF_DIR)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"# wrote {path}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
