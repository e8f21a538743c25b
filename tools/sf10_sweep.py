"""Rotating sf10 superlinear audit (VERDICT r12 #2): every catalog
entry eventually gets an sf10 wall measurement next to its sf0.1 wall,
~40 entries per round, with results accumulated in a persistent ledger
(tools/sf10_ledger.json) so the rotation resumes where it left off.

Why: round-12 proved sf1 probes can hide 100x+ superlinear terms
(`agg_winsorized` read clean at sf1 and blew up 130x at sf10).  The
only reliable detector is measuring every entry at 100x the suite's
data volume.

Protocol (the r12 probe's, unchanged): synthetic sf10 tables via
sources/synth.generate_scale_tables with the Heaps-consistent
doc_vocab=170 corpus (the legacy 31-word list saturates the 3-gram
shingle space and degenerates every lossless posting-list join by
construction — a corpus artifact, not a plan defect), warm min-of-2,
noop sink, local[32], 48g driver (one JVM hosting 100x the suite's
data needs the headroom a real cluster gives each executor),
64 shuffle partitions at sf10 / 32 at sf0.1.

Flag rule: ratio = sf10_wall / sf0.1_wall on 100x the data.  Healthy
distributed shapes on this box land well under 10x (32-way parallelism
plus fixed overhead absorb most of the growth; r12's clean probes:
recursive walk 5x, PPJoin 20x on corpus-sized joins).  ratio > 30
(3x the healthy band) = flagged for investigation: plan drift, a
documented cardinality bound, or a fix.  A per-entry watchdog cancels
anything past --budget seconds (default 300) and records TIMEOUT —
an automatic flag.

Regression gating (VERDICT r13 #3): every ledger row carries a
``plan_hash`` — a session-normalized fingerprint of the entry's
formatted physical plan at sf0.1.  Each sweep run recomputes all
fingerprints (analysis-only, ~seconds) and re-queues entries whose
plan changed since their measurement, plus any new entries, so the
ledger tracks the code instead of being a one-shot snapshot.
``--backfill-hashes`` is the one-time migration for pre-hash rows.

Usage: python tools/sf10_sweep.py [--n 40] [--budget 300]
                                  [--entries name1,name2,...]
                                  [--backfill-hashes]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
import sys
import threading
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
LEDGER = os.path.join(HERE, "sf10_ledger.json")
SF01 = "/root/testdata/sf0.1"
SF10_DIR = "/tmp/spark_graft_synth_sf10"
FLAG_RATIO = 30.0
# Any entry past NOTE_RATIO must carry a resolution note in the ledger
# even if unflagged (VERDICT r13 #4: dedup_ngram_jaccard sat at 28.5x —
# just under the 30x flag — with no note, so the "zero unexplained"
# claim depended on a threshold hiding the next-worst entry).
NOTE_RATIO = 25.0

# Plan-fingerprint normalization: expression ids, codegen/adaptive plan
# ids and exchange reuse ids vary per session; everything else in the
# formatted explain is a function of the plan shape, which is exactly
# what the sf10 measurement depends on.
_FP_NORM = (
    (re.compile(r"#\d+L?"), "#x"),
    (re.compile(r"plan_id=\d+"), "plan_id=x"),
    (re.compile(r"\[id=#?\d+\]"), "[id=x]"),
    (re.compile(r"ReusedExchange \[\d+\]"), "ReusedExchange [x]"),
    # Lazy localCheckpoint subtrees render as "MapPartitionsRDD[60] at
    # localCheckpoint at ..." — the RDD id is a session counter that
    # shifts with whatever was built before (114 entries carry one).
    (re.compile(r"RDD\[\d+\]"), "RDD[x]"),
    # Common-subexpression aliases (With/CommonExpressionDef) number
    # from a session-global counter too: _common_expr_3 vs _common_expr_11
    # for the identical plan depending on what was built before.
    (re.compile(r"_common_expr_\d+"), "_common_expr_x"),
    # RDD call sites flip between "NativeMethodAccessorImpl.java:0" and
    # "<unknown>:0" with JVM reflection/JIT state (after ~15 reflective
    # calls the accessor is regenerated and the site resolves
    # differently) — pure session noise.
    (re.compile(r"\bat \w+ at [^,\]]+"), "at x at x"),
    # Higher-order-function lambda variables draw fresh names from a
    # session-global counter: "lambda x_6" vs "lambda x_1264".
    (re.compile(r"\blambda \w+#x"), "lambda v#x"),
)
_EXPAND_ARGS = re.compile(r"(Arguments: \[\[)(.*)(\]\])")


def _canon_expand(line: str) -> str:
    """Sort the projection lists inside an Expand node's Arguments line.
    Catalyst's RewriteDistinctAggregates emits one projection per
    distinct-aggregate group in expression-map iteration order, which
    incorporates exprIds — the SAME query builds with the lists in
    different orders call-to-call (observed: dq_null_profile).  The
    multiset of projections is the plan shape; their order is not."""
    m = _EXPAND_ARGS.search(line)
    if not m:
        return line
    groups = sorted(m.group(2).split("], ["))
    return line[: m.start()] + m.group(1) + "], [".join(groups) + m.group(3) \
        + line[m.end():]


def plan_fingerprint(df) -> str:
    """16-hex-digit hash of the session-normalized formatted physical
    plan — the staleness key for ledger rows (VERDICT r13 #3: the sf10
    audit is a snapshot; a plan change must re-queue its entry, the way
    the r13 LSH-verify fix changed dedup_lsh_verified 131.7 -> 104.5 s
    and was only caught because the audit happened to be in flight)."""
    s = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    for rx, rep in _FP_NORM:
        s = rx.sub(rep, s)
    # RewriteDistinctAggregates (any plan mixing distinct and regular
    # aggregates — its Expand rows carry a 'gid' column) assigns gids
    # and projection/key order from expression-map iteration order,
    # which depends on exprId hashes and therefore on everything built
    # before in the session: the SAME query renders differently run to
    # run (measured r14: dq_null_profile, dedup_tier_funnel — the only
    # two such plans in the catalog).  Not normalizable line-wise, so
    # these get a sentinel equal only to itself: excluded from
    # stale-gating, still re-measured on the rotation's normal cadence.
    if "gid#" in s:
        return "UNSTABLE"
    s = "\n".join(_canon_expand(ln) for ln in s.splitlines())
    return hashlib.sha256(s.encode()).hexdigest()[:16]


def all_fingerprints(spark, queries, sf_dir: str = SF01) -> dict:
    """name -> fingerprint (or 'ERR ...'/'UNSTABLE') for every catalog
    entry, built ONCE each at sf0.1 (analysis only — nothing is
    executed, though builders that train model state driver-side do pay
    that cost once per process).

    NOTE: fingerprints must come from the FIRST build in a process — a
    second in-process build of the ~190 entries with shared-subtree
    memos (trained models, lazy checkpoints) legitimately plans against
    the memoized subtree and hashes differently."""
    fps: dict = {}
    for name in sorted(queries):
        try:
            fps[name] = plan_fingerprint(queries[name].builder(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 - per-entry isolation
            fps[name] = f"ERR {type(e).__name__}: {str(e)[:80]}"
    return fps


def load_ledger() -> dict:
    try:
        with open(LEDGER) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def save_ledger(ledger: dict) -> None:
    with open(LEDGER, "w") as fh:
        json.dump(ledger, fh, indent=1, sort_keys=True)


def timed_min2(spark, builder, sf_dir: str, parts: int, budget: float):
    """Warm min-of-2 noop-sink wall, watchdog-cancelled at ``budget``
    seconds per RUN.  Returns seconds (float) or 'TIMEOUT>n'/'ERR ...'."""
    sc = spark.sparkContext
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    runs = []
    for i in range(2):
        group = f"sf10sweep-{time.monotonic_ns()}"
        done = threading.Event()
        timed_out = []

        def watchdog():
            if not done.wait(budget):
                timed_out.append(True)
                sc.cancelJobGroup(group)

        t = threading.Thread(target=watchdog, daemon=True)
        sc.setJobGroup(group, "sf10 sweep", interruptOnCancel=True)
        t.start()
        t0 = time.perf_counter()
        try:
            builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 2))
        except Exception as e:
            if timed_out:
                return f"TIMEOUT>{budget:g}"
            return f"ERR {type(e).__name__}: {str(e)[:120]}"
        finally:
            done.set()
            # PySpark has no clearJobGroup; detach by resetting the
            # thread-local property so later jobs aren't cancellable
            # under a stale group id.
            sc.setLocalProperty("spark.jobGroup.id", None)
        # A first run already past budget won't improve: skip the rerun.
        if runs[-1] > budget:
            break
    return min(runs)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=40)
    ap.add_argument("--budget", type=float, default=300.0)
    ap.add_argument("--entries", default="")
    ap.add_argument("--round", dest="round_tag", default="r14")
    ap.add_argument(
        "--backfill-hashes",
        action="store_true",
        help="record the current plan fingerprint on ledger rows that "
        "lack one, WITHOUT re-measuring (one-time migration: the r13 "
        "ledger predates plan hashing; rows measured before a hash "
        "exists are assumed current-code, which held when this ran — "
        "no r14 change altered a catalog plan shape)",
    )
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession

    from fotmobdatapipeline_spark.plans.catalog import QUERIES, _load_all
    from fotmobdatapipeline_spark.session import tune_session
    from fotmobdatapipeline_spark.sources.synth import generate_scale_tables

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

    ledger = load_ledger()
    t0 = time.perf_counter()
    fps = all_fingerprints(spark, QUERIES)
    print(f"plan fingerprints: {len(fps)} in {time.perf_counter() - t0:.1f}s",
          flush=True)

    if args.backfill_hashes:
        n_set = 0
        for name, rec in ledger.items():
            if name in fps and not rec.get("plan_hash"):
                rec["plan_hash"] = fps[name]
                n_set += 1
        save_ledger(ledger)
        print(f"backfilled plan_hash on {n_set} rows "
              f"({len(ledger)} total)", flush=True)
        spark.stop()
        return 0

    t0 = time.perf_counter()
    generate_scale_tables(spark, 10, SF10_DIR, partitions=64, doc_vocab=170)
    print(f"sf10 generate/verify: {time.perf_counter() - t0:.1f}s", flush=True)

    if args.entries:
        todo = [n for n in args.entries.split(",") if n in QUERIES]
    else:
        # New entries first, then STALE ones — rows whose recorded plan
        # fingerprint no longer matches the current plan (the code
        # changed since the measurement; VERDICT r13 #3).
        new = [n for n in sorted(QUERIES) if n not in ledger]
        stale = [
            n for n in sorted(ledger)
            if n in QUERIES
            and ledger[n].get("plan_hash")
            and not fps.get(n, "ERR").startswith("ERR")
            and fps[n] != ledger[n]["plan_hash"]
        ]
        todo = (new + stale)[: args.n]
        if stale:
            print(f"stale (plan changed since measurement): {stale}",
                  flush=True)
    print(f"sweeping {len(todo)} entries ({len(ledger)} already in ledger, "
          f"{len(QUERIES)} total)", flush=True)

    for name in todo:
        b = QUERIES[name].builder
        s01 = timed_min2(spark, b, SF01, 32, args.budget)
        s10 = timed_min2(spark, b, SF10_DIR, 64, args.budget)
        rec: dict = {"sf01": s01, "sf10": s10, "round": args.round_tag}
        if name in fps and not fps[name].startswith("ERR"):
            rec["plan_hash"] = fps[name]
        # Re-measuring an entry must not erase its recorded resolution
        # (a documented cardinality bound or a pointer to the fix).
        old = ledger.get(name)
        if isinstance(old, dict) and old.get("note"):
            rec["note"] = old["note"]
        if isinstance(s01, float) and isinstance(s10, float) and s01 > 0:
            rec["ratio"] = round(s10 / s01, 1)
            rec["flag"] = rec["ratio"] > FLAG_RATIO
        else:
            rec["ratio"] = None
            rec["flag"] = True  # timeout/error at either scale = investigate
        ledger[name] = rec
        save_ledger(ledger)  # persist per entry: a crash loses nothing
        print(f"{name}: sf0.1={s01} sf10={s10} ratio={rec['ratio']} "
              f"flag={rec['flag']}", flush=True)

    flags = {k: v for k, v in ledger.items() if v.get("flag")}
    print("\n== flagged ==")
    for k, v in sorted(flags.items()):
        print(f"{k}: {v}")
    unnoted = sorted(
        k for k, v in ledger.items()
        if isinstance(v.get("ratio"), (int, float))
        and v["ratio"] > NOTE_RATIO and not v.get("note")
    )
    if unnoted:
        print(f"== NEEDS NOTE (ratio > {NOTE_RATIO:g}x, no resolution "
              f"recorded): {unnoted} ==")
    print(f"== ledger now {len(ledger)}/{len(QUERIES)} entries, "
          f"{len(flags)} flagged, {len(unnoted)} unnoted past "
          f"{NOTE_RATIO:g}x ==")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
