"""Round-15 scan-count audit (VERDICT r14 #7): count per-table
``Scan parquet`` nodes in each named entry's FORMATTED physical plan.
Entries with >=3 scans of one table either re-read by design
(estimate-vs-exact, recall curves) or hide a dedupable subtree that
column pruning keeps ReusedExchange from covering (the r14
events_funnel_conversion / cdc_incremental_join_view finding).

Usage: python tools/r15_scan_audit.py <entry> [entry ...]   (or 'all')
Writes tools/r15_scan_audit.json: {entry: {table: n_scans}}.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    from fotmobdatapipeline_spark.plans.catalog import query_map
    from fotmobdatapipeline_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_MASTER", f"local[{cpus}]")
    spark = get_spark(app_name="r15-scan-audit", shuffle_partitions=int(cpus))
    qmap = query_map()
    names = sys.argv[1:]
    if names == ["all"]:
        names = sorted(qmap)
    out: dict[str, dict[str, int]] = {}
    pat = re.compile(r"([a-z_0-9]+)\.parquet")
    for name in names:
        try:
            df = qmap[name](spark, SF_DIR)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:
            out[name] = {"__error__": str(e)[:120]}
            continue
        counts: dict[str, int] = {}
        # Formatted plans put the file path on the Location: line of
        # each scan block; attribute each "Scan parquet" node to the
        # next Location line's table file.
        lines = plan.splitlines()
        pending = 0
        for ln in lines:
            # Count only the detail-block headings "(N) Scan parquet"
            # — the tree summary repeats every scan once more.
            if re.match(r"^\(\d+\) Scan parquet", ln.strip()):
                pending += 1
            elif pending and "Location" in ln:
                m = pat.search(ln)
                t = m.group(1) if m else "__unattributed__"
                counts[t] = counts.get(t, 0) + 1
                pending -= 1
        if pending:
            counts["__unattributed__"] = counts.get("__unattributed__", 0) + pending
        out[name] = counts
        flagged = {t: c for t, c in counts.items() if c >= 3}
        print(f"# {name}: {counts}" + ("  <== >=3" if flagged else ""), flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "r15_scan_audit.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"# written to {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
