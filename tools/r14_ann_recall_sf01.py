"""Round-14 production-ANN recall at sf0.1 (VERDICT r13 #6).

``sim_recall_production`` pins its >=0.8 recall@5 claim at sf0.01
(500 vectors, k=8 cells of ~62).  This script re-measures the same
production sizing RULES at the sf0.1 corpus (2,000 vectors, 4x):

  * IVF-Flat with k grown to hold cell size (k=32 -> cells ~62, the
    k-growth doctrine from semantic_dedup / SemDeDup), at n_probes
    {4, 8, 16} — 4 probes at k=32 probes the same CELL COUNT FRACTION
    of neighbors-per-cell mass as 2-of-8 did only if recall is driven
    by cell size, which is exactly what the curve shows or refutes;
  * PQ-rerank at the same m=16 x 16-code codebooks (64 bits/vector)
    with shortlist {40, 80} — shortlist 40 is 8% of the sf0.01 corpus
    but 2% of sf0.1's, so both points are reported.

Truth set: exact brute-force cosine top-5 for the 10 fixed queries
(vec_id < 10), computed in-session.

Usage: python tools/r14_ann_recall_sf01.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators import similarity as S
    from fotmobdatapipeline_spark.session import tune_session
    from fotmobdatapipeline_spark.sources.registry import read_table

    print("loadavg", os.getloadavg(), flush=True)
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    tune_session(spark)

    emb = read_table(spark, args.sf_dir, "embeddings")
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < 10)
    truth = (
        S.brute_force_topk(queries, emb, k=5)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    total = truth.count()

    # k grown with the corpus to hold cell size at sf0.01's ~62.
    k = max(8, round(n / 62))
    print(f"corpus={n}, ivf k={k} (cell ~{n // k}), truth={total} pairs",
          flush=True)
    centroids = S.kmeans_lloyd(emb, k=k, iterations=3)

    def recall(t) -> float:
        hits = (
            t.select("query_id", "neighbor_id")
            .join(truth, ["query_id", "neighbor_id"])
            .count()
        )
        return round(hits / total, 3)

    results: dict = {"corpus": n, "ivf_k": k, "truth_pairs": total}
    for p in (4, 8, 16):
        r = recall(S.ivf_topk(queries, emb, centroids, k=5, n_probes=p))
        results[f"ivf_flat_p{p}"] = r
        print(f"ivf_flat k={k} probes={p}: recall@5={r}", flush=True)

    cb = S.pq_train_codebooks(emb, dim=64, m=16, codes=16, iterations=2)
    enc = S.pq_encode(emb, cb, dim=64, m=16)
    for sl in (40, 80):
        r = recall(
            S.pq_rerank_topk(
                queries, cb, enc, emb, dim=64, m=16, codes=16,
                shortlist=sl, k=5,
            )
        )
        results[f"pq_rerank_m16_sl{sl}"] = r
        print(f"pq_rerank m=16x16 shortlist={sl}: recall@5={r}", flush=True)

    out = os.path.join(HERE, "r14_ann_recall_sf01.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    print(f"wrote {out}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
