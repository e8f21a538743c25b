"""Capture .explain('formatted') for named catalog entries at sf0.1
into plans/r14/<entry>_<tag>.txt (tag = before/after) — the round-14
optimization evidence files.

Usage: python tools/r14_capture_plans.py <tag> <entry> [entry ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    from fotmobdatapipeline_spark.plans.catalog import query_map
    from fotmobdatapipeline_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_MASTER", f"local[{cpus}]")
    spark = get_spark(app_name="r14-plans", shuffle_partitions=int(cpus))
    qmap = query_map()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r14",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qmap[name](spark, SF_DIR)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"# wrote {path} ({len(plan)} bytes)", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
