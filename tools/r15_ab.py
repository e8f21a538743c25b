"""Round-15 same-session A/B harness.

The only decision-grade measurement on this sandbox is same-session
interleaved A/B with value-identity checks (cross-session per-entry
walls swing ±20-50% — SCALE.md r14, memory playbook).  Each experiment
defines two variants (setup callables that monkeypatch the operator
module) and a frame builder; the tool interleaves A,B,A,B,... timed
noop runs, reports per-variant minima, and md5-hashes the collected
sorted rows of both variants once to prove value identity.

Usage: python tools/r15_ab.py <experiment> [rounds]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _timed_noop(build) -> float:
    """Times BUILD + noop write — the builder runs inside the timed
    region exactly like bench.py's timed_run (iterative entries do all
    their work in the builder)."""
    t0 = time.perf_counter()
    build().write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def _value_hash(df) -> str:
    rows = sorted(repr(r) for r in df.collect())
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def run_ab(spark, name: str, build, setup_a, setup_b, rounds: int = 3):
    """build() -> DataFrame is called fresh per run (builder time is part
    of the bench's timed region, so it belongs in the A/B too)."""
    a_runs, b_runs = [], []
    for i in range(rounds):
        setup_a()
        spark.sparkContext.setJobDescription(f"{name}: A round {i}")
        a_runs.append(_timed_noop(build))
        setup_b()
        spark.sparkContext.setJobDescription(f"{name}: B round {i}")
        b_runs.append(_timed_noop(build))
        print(f"# {name} round {i}: A={a_runs[-1]:.3f}s B={b_runs[-1]:.3f}s",
              flush=True)
    setup_a()
    ha = _value_hash(build())
    setup_b()
    hb = _value_hash(build())
    ident = ha == hb
    print(f"# {name}: A(min)={min(a_runs):.3f}s B(min)={min(b_runs):.3f}s "
          f"runsA={a_runs} runsB={b_runs} value_identical={ident}", flush=True)
    if not ident:
        print(f"# VALUE MISMATCH: {ha} vs {hb}", flush=True)
    return {"a": a_runs, "b": b_runs, "identical": ident}


def main() -> int:
    exp = sys.argv[1]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from fotmobdatapipeline_spark.session import get_spark
    from fotmobdatapipeline_spark.sources.registry import TABLES, read_table

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_MASTER", f"local[{cpus}]")
    spark = get_spark(app_name=f"r15-ab-{exp}", shuffle_partitions=int(cpus))
    for t in TABLES:
        read_table(spark, SF_DIR, t).limit(1).collect()

    if exp == "powit":
        # A = r15 single array Literal; B = r14 CreateArray of d literals.
        from pyspark.sql import functions as F

        import fotmobdatapipeline_spark.operators.similarity as S

        new_impl = S.power_iteration_top_component

        def build():
            return new_impl(
                read_table(spark, SF_DIR, "embeddings"), iterations=3
            )

        real_lit = F.lit

        def lit_create_array(v):
            if isinstance(v, list):
                return F.array(*[real_lit(x) for x in v])
            return real_lit(v)

        def setup_a():
            S.F.lit = real_lit

        def setup_b():
            S.F.lit = lit_create_array

        try:
            run_ab(spark, "powit", build, setup_a, setup_b, rounds)
        finally:
            S.F.lit = real_lit

    elif exp == "ccheck":
        # connected_dup_clusters: A = r15 carried-old-label convergence
        # filter; B = r14 join-against-old-labels convergence count.
        # Same pairs input, eagerly materialized once.
        from pyspark.sql import functions as F

        import fotmobdatapipeline_spark.operators.dedup as D

        from fotmobdatapipeline_spark.plans import llmdata

        pairs = llmdata._lsh_pairs_shared(spark, SF_DIR)
        pairs.count()  # materialize the shared memo outside the timing

        new_impl = D.connected_dup_clusters

        def old_impl(pairs, id_a="doc_a", id_b="doc_b", max_iterations=15):
            edges = (
                pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
                .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
                .distinct()
                .localCheckpoint()
            )
            labels = edges.groupBy("src").agg(
                F.least(F.min("dst"), F.first("src")).alias("label")
            ).select(F.col("src").alias("v"), "label")
            for _ in range(max_iterations):
                neighbor_min = (
                    edges.join(labels, edges.dst == labels.v)
                    .groupBy("src")
                    .agg(F.min("label").alias("nbr_label"))
                )
                propagated = labels.join(
                    neighbor_min, labels.v == neighbor_min.src, "left"
                ).select(
                    "v",
                    F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
                ).localCheckpoint(eager=False)
                x, y = propagated.alias("x"), propagated.alias("y")
                new_labels = (
                    x.join(y, F.col("x.label") == F.col("y.v"))
                    .select(
                        F.col("x.v").alias("v"),
                        F.least(F.col("x.label"), F.col("y.label")).alias("label"),
                    )
                    .localCheckpoint()
                )
                changed = (
                    new_labels.alias("n")
                    .join(labels.alias("o"), "v")
                    .filter(F.col("n.label") != F.col("o.label"))
                    .limit(1)
                    .count()
                )
                labels = new_labels
                if changed == 0:
                    break
            return labels.select(F.col("v").alias("doc_id"), F.col("label").alias("cluster_id"))

        impl = {"f": new_impl}

        def build():
            return impl["f"](pairs)

        def setup_a():
            impl["f"] = new_impl

        def setup_b():
            impl["f"] = old_impl

        run_ab(spark, "ccheck", build, setup_a, setup_b, rounds)

    elif exp == "textrank":
        # pagerank per-round checkpoint: A = lazy (current, r14), B =
        # eager rounds (r13 form).  Only the round checkpoint differs.
        from pyspark.sql import functions as F

        from fotmobdatapipeline_spark.plans.catalog import query_map

        qmap = query_map()
        import fotmobdatapipeline_spark.operators.graph as G

        new_impl = G.pagerank

        def old_pagerank(edges, src="src", dst="dst", iters=10):
            e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
            nodes = (
                e.select(F.col("src").alias("node"))
                .unionByName(e.select(F.col("dst").alias("node")))
                .distinct()
                .localCheckpoint(eager=True)
            )
            deg = e.groupBy("src").agg(F.count("*").alias("deg"))
            ed = e.join(deg, "src").localCheckpoint(eager=True)
            ranks = nodes.withColumn("rank", F.expr(G._ONE))
            for _ in range(iters):
                contribs = (
                    ed.join(ranks, ed.src == ranks.node)
                    .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
                    .groupBy("node")
                    .agg(F.sum("c").alias("in_sum"))
                )
                ranks = (
                    nodes.join(contribs, "node", "left")
                    .select(
                        "node",
                        (
                            F.expr(G._BASE)
                            + F.expr(G._DAMP)
                            * F.coalesce(F.col("in_sum"), F.expr("CAST(0 AS DECIMAL(38,18))"))
                        )
                        .cast("decimal(38,18)")
                        .alias("rank"),
                    )
                    .localCheckpoint(eager=True)
                )
            return ranks

        def build():
            return qmap["text_textrank_keywords"](spark, SF_DIR)

        def setup_a():
            G.pagerank = new_impl

        def setup_b():
            G.pagerank = old_pagerank

        try:
            run_ab(spark, "textrank", build, setup_a, setup_b, rounds)
        finally:
            G.pagerank = new_impl

    elif exp == "recall":
        # dedup_recall_report: A = shared shingle frame (r15), B = each
        # side tokenizes independently (r14 shape).  Memo cleared per
        # run so every run pays the full LSH + truth build (the
        # fresh-session / driver-correctness shape).
        from pyspark.sql import functions as F

        from fotmobdatapipeline_spark.operators.dedup import word_shingles
        from fotmobdatapipeline_spark.plans import llmdata
        from fotmobdatapipeline_spark.plans.catalog import query_map

        qmap = query_map()
        shared_impl = llmdata._shingles_shared

        def independent_shingles(spark_, sf_dir_):
            docs = read_table(spark_, sf_dir_, "documents")
            return docs.select(
                F.col("doc_id"),
                F.explode(word_shingles(F.col("text"), 3)).alias("s"),
            )

        def build():
            llmdata._SUBTREE_MEMO.clear()
            return qmap["dedup_recall_report"](spark, SF_DIR)

        def setup_a():
            llmdata._shingles_shared = shared_impl

        def setup_b():
            llmdata._shingles_shared = independent_shingles

        try:
            run_ab(spark, "recall", build, setup_a, setup_b, rounds)
        finally:
            llmdata._shingles_shared = shared_impl

    elif exp == "ngram":
        # Uncapped posting tier: A = lazy-checkpointed shingle explode
        # (r15), B = explode duplicated into sizes + postings (r14).
        from pyspark.sql import DataFrame

        from fotmobdatapipeline_spark.plans.catalog import query_map

        qmap = query_map()
        real_ckpt = DataFrame.localCheckpoint
        mode = {"suppress": False}

        def patched(self, eager=True):
            if mode["suppress"] and not eager:
                return self  # r14 shape: no input checkpoint
            return real_ckpt(self, eager=eager)

        entry = sys.argv[3] if len(sys.argv) > 3 else "dedup_ngram_jaccard"

        def build():
            return qmap[entry](spark, SF_DIR)

        def setup_a():
            mode["suppress"] = False

        def setup_b():
            mode["suppress"] = True

        DataFrame.localCheckpoint = patched
        try:
            run_ab(spark, "ngram:" + entry, build, setup_a, setup_b, rounds)
        finally:
            DataFrame.localCheckpoint = real_ckpt

    elif exp == "starbuild":
        # A = overlapped fact+dim writes (current); B = serial dims then
        # fact (r13 form).  Times the full run_star_build (all writes +
        # reporting), the bench's star_build_write shape.
        import tempfile

        from fotmobdatapipeline_spark.plans import star_build as SB

        def run_variant(overlap: bool) -> float:
            with tempfile.TemporaryDirectory(prefix="r15_ab_star_") as out:
                t0 = time.perf_counter()
                if overlap:
                    SB.run_star_build(spark, SF_DIR, out)
                else:
                    _serial_star_build(SB, spark, SF_DIR, out)
                return round(time.perf_counter() - t0, 3)

        def _serial_star_build(SB, spark, sf_dir, out_dir):
            dims = {
                name: df.cache()
                for name, df in SB.build_dims(spark, sf_dir).items()
            }
            for df in dims.values():
                df.count()
            fact = SB.build_fact_df(spark, sf_dir, dims)
            paths = {name: f"{out_dir}/{name}" for name in dims}
            paths["sales_fact"] = f"{out_dir}/sales_fact"
            for name, df in dims.items():
                SB.write_parquet(df, paths[name])
            SB.write_parquet(fact, paths["sales_fact"])
            fact_back = spark.read.parquet(paths["sales_fact"])
            reporting = SB.build_reporting(fact_back, dims)
            SB.write_parquet(
                reporting, f"{out_dir}/sales_reporting",
                partition_by=["order_month"],
            )
            for df in dims.values():
                df.unpersist()

        a_runs, b_runs = [], []
        for i in range(rounds):
            spark.sparkContext.setJobDescription(f"starbuild A round {i}")
            a_runs.append(run_variant(True))
            spark.sparkContext.setJobDescription(f"starbuild B round {i}")
            b_runs.append(run_variant(False))
            print(f"# starbuild round {i}: A(overlap)={a_runs[-1]:.3f}s "
                  f"B(serial)={b_runs[-1]:.3f}s", flush=True)
        print(f"# starbuild: A(min)={min(a_runs):.3f}s B(min)={min(b_runs):.3f}s "
              f"runsA={a_runs} runsB={b_runs}", flush=True)

    else:
        print(f"unknown experiment {exp}", file=sys.stderr)
        return 2
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
