"""Round-14 job-level profiler: for each (warm) headline entry, run the
full bench body once with the Spark event log on, then attribute the
wall to Spark JOB time vs driver dead time (py4j chatter, planning,
scheduling gaps).  Entries whose wall is mostly dead time are driver-
bound (guide §7.3); entries with many tiny jobs are paying per-job
fixed cost (iterative operators' per-round materializations).

Usage: python tools/r14_jobprofile.py [entry ...]
Writes tools/r14_jobprofile.json:
  {entry: {wall, n_jobs, job_sec (sum of job wall), dead_sec}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EVDIR = "/tmp/r14_eventlog"


def main() -> int:
    import glob
    import shutil

    from fotmobdatapipeline_spark.plans.catalog import query_map
    from fotmobdatapipeline_spark.session import get_spark

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    names = sys.argv[1:]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_MASTER", f"local[{cpus}]")
    spark = get_spark(
        app_name="r14-jobprofile",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{EVDIR}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    qmap = query_map()

    from fotmobdatapipeline_spark.sources.registry import TABLES, read_table

    for t in TABLES:
        read_table(spark, SF_DIR, t).limit(1).collect()

    # Warm every requested entry once (training memos, codegen) so the
    # profiled run is the bench's steady-state second sample.
    for name in names:
        qmap[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    marks: dict[str, tuple[float, float]] = {}  # entry -> (t0_ms, t1_ms)
    for name in names:
        spark.sparkContext.setJobDescription(f"r14jp:{name}")
        t0 = time.time() * 1000
        qmap[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        t1 = time.time() * 1000
        marks[name] = (t0, t1)
        spark.sparkContext.setJobDescription(None)
    spark.stop()

    # Parse the event log: job submission/completion timestamps.
    jobs = []  # (submit_ms, complete_ms, description)
    starts: dict[int, tuple[float, str]] = {}
    paths = [p for p in glob.glob(f"{EVDIR}/**/*", recursive=True)
             if os.path.isfile(p) and "appstatus" not in os.path.basename(p)]
    for path in paths:
        with open(path, errors="replace") as fh:
            for line in fh:
                if '"SparkListenerJobStart"' in line:
                    ev = json.loads(line)
                    desc = (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )
                    starts[ev["Job ID"]] = (ev["Submission Time"], desc)
                elif '"SparkListenerJobEnd"' in line:
                    ev = json.loads(line)
                    st = starts.get(ev["Job ID"])
                    if st:
                        jobs.append((st[0], ev["Completion Time"], st[1]))

    out: dict[str, dict] = {}
    for name, (t0, t1) in marks.items():
        mine = [j for j in jobs if j[2] == f"r14jp:{name}" and j[0] >= t0 - 50]
        job_sec = sum((c - s) for s, c, _ in mine) / 1000
        out[name] = {
            "wall": round((t1 - t0) / 1000, 3),
            "n_jobs": len(mine),
            "job_sec": round(job_sec, 3),
            "dead_sec": round((t1 - t0) / 1000 - job_sec, 3),
        }
        print(f"# {name}: {out[name]}", file=sys.stderr, flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "r14_jobprofile.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# written {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
