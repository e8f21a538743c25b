"""Regenerate PLANS.md: formatted physical plans for the headline
queries whose shapes SCALE.md argues about and tests/test_plan_shapes.py
pins.  Run: python tools/gen_plans.py"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PICKS = [
    ("flagship_revenue_topk", "Broadcast dims, single shuffle for the aggregate"),
    ("filter_pushdown_scan", "PushedFilters + pruned ReadSchema at the parquet scan"),
    ("join_range_banded", "Range join rewritten to arithmetic banding: zero Join operators"),
    ("events_interval_join", "Interval self-join as a (user, bucket) equi-join"),
    ("sim_ivf_topk", "IVF: cell-keyed equi-join, no cartesian"),
    ("dedup_minhash_signatures", "Map-side partial aggregation (partial_min) before the doc shuffle"),
    ("market_share", "Q8-shape join tree: dims broadcast, fact-sized orders left to AQE"),
    ("join_salted_agg", "Skew-salted join: composite (key, salt) spreads hot keys"),
    ("min_cost_supplier", "Argmin via struct-min: SortAggregate fallback keeps map-side partial"),
    ("dedup_jaccard_capped", "df-capped postings: skew tail dropped before pair fan-out"),
    ("pack_sequences", "Two-phase prefix sum: no single-partition global window"),
    ("llm_prep_pipeline", "Five-stage prep pipeline in 2 shuffles: map-side stages fused"),
    ("text_vocab_encode", "Distributed top-K vocab: no partition-less Window anywhere"),
    ("cms_heavy_hitters", "Count-min sketch: bounded-shuffle build + broadcast probe"),
    ("cdc_snapshot_diff", "CDC diff: ONE full-outer join, snapshot filters pushed to both scans"),
    ("agg_winsorized", "Winsorize: per-group rank bounds shipped back by broadcast, fact never reshuffled"),
    ("sim_rp_bucket_join", "Size-guarded ANN verify: hint-free candidate joins (AQE decides), corpus never broadcast"),
    ("text_sentence_dedup", "Sentence dedup: checkpointed explode — one corpus scan for three consumers, no per-sentence Window"),
    ("dedup_winnowing_pairs", "Copy-detection pairs: df-capped fan-out, checkpointed fingerprint pipeline"),
    ("text_bm25_topk", "BM25 retrieval: query-term filter before any shuffle, TakeOrderedAndProject top-k"),
    ("text_inverted_index", "Index build: checkpointed tf table — one corpus scan for three consumers"),
    ("text_sentence_neardup", "Fuzzy sentence dedup: checkpointed explode+sign, one corpus scan, combinable min-struct"),
    ("dedup_semantic_clusters", "SemDeDup: cell-confined pair join (never a global cross join), combinable max verdict"),
    ("text_duplicate_passages", "Substring dedup: checkpointed gram explode (one corpus scan), doc-partitioned islands window only"),
    ("dedup_simhash_pairs", "Banded SimHash: checkpointed signatures, (band, key) equi-join candidates, integer Hamming verify"),
    ("sim_pq_adc_topk", "PQ ADC: broadcast LUTs over encoded codes, fixed-order score fold, no SortMergeJoin"),
    ("llm_prep_pipeline_v2", "Prep v2: Gopher filter pushed into both scans, one gram pipeline, hash-dedup on trimmed text"),
    ("events_anomaly_mad", "MAD anomaly flags: raw events collapse to one combinable (type, hour) count; median/MAD windows run on the calendar-bounded aggregate"),
    ("sketch_histogram_quantiles", "Mergeable quantiles: constant-edge histogram (map + combinable agg, no sort near the fact); quantile picks read the checkpointed bucket table"),
    ("sim_pq_rerank_topk", "PQ shortlist + exact rerank: ADC scan over codes, then broadcast-probe fetch of shortlist vectors only — no second full float scan"),
    ("multimodal_bmp_decode", "Real-codec decode: two chained Arrow stages (encode, decode) over (doc_id, payload) only — column-pruned, shuffle-free"),
    ("events_ewm_value", "Trailing EWMA: pruned 3-col scan, one exchange on user_id, a single Window pass, sequential-fold projection — no UDF"),
    ("lm_perplexity_rank", "Perplexity filter: one corpus scan, two <=B-row broadcast LM models, ascending-key fold — no SortMergeJoin near the corpus"),
    ("pack_block_fill", "Concat-and-chunk: two-phase prefix sum (no global window), per-doc bounded span explode, one final block aggregate"),
    ("text_blocklist_hits", "Blocklist: phrase table broadcast into a one-scan multi-length gram join"),
    ("url_domain_mixture_psl", "PSL-as-data: one broadcast join per suffix depth, host side never shuffled before its own aggregate"),
    ("llm_prep_pipeline_v3", "Prep v3: blocklist anti-join + LM cut + hash dedup + prefix-sum packing — models broadcast, two corpus text scans"),
    ("pref_winrate", "Arena win rates: one exploded projection + one map-side-combinable hash aggregate — no join anywhere"),
    ("events_mannwhitney_u", "Mann-Whitney U: distinct-value collapse, then the two-phase prefix scan — every window _pid-scoped, no partition-less sort at any cardinality"),
    ("cdc_incremental_join_view", "IVM: carried-forward side is two anti-join key filters — the dimension appears only in the rebuilt branch"),
    ("multimodal_png_decode", "PNG decode: two chained Arrow stages over (doc_id, payload) only — column-pruned, shuffle-free"),
    ("events_ltv_deciles", "Whale curve: prefix-scan ranks + integer NTILE arithmetic — the r9 global-ntile scale-killer de-windowed"),
    ("multimodal_image_dhash", "Perceptual dHash: map-only Arrow hashing into one combinable aggregate and a distributed TakeOrderedAndProject"),
    ("multimodal_image_dhash_pairs", "Hamming near-dup: four banded equi-joins with a hot-band cap — never all-pairs"),
    ("events_kruskal_wallis", "Kruskal-Wallis: distinct-value collapse, two-phase prefix scan, every window _pid-scoped — the mannwhitney shape at k=5"),
    ("events_spearman_corr", "Spearman: two prefix-scan rank tables broadcast-joined back to the user table, Pearson from one combinable aggregate"),
    ("events_changepoint_hourly", "Changepoint: hourly collapse, chained prefix sums, broadcast total row, struct-min argmin — no global sort"),
    ("graph_label_propagation", "Min-label propagation: per-round hash join + min aggregate, checkpoint-truncated lineage — no window, no collect"),
    ("events_kendall_tau", "Kendall tau: dyadic dominance count — (lvl, blk)-keyed windows for wide levels, _pid-scoped prefix scan for deep ones; no partition-less sort, no pair join"),
    ("join_bloom_prefilter", "Bloom join pruning: 3 broadcast word-table joins on the fact (map-side), exact join on survivors only"),
    ("geo_neighbor_pairs", "Banded 2-D neighbor join: (cy, cx) cell-keyed equi-join with 3x3 fan-out on the small side — no cartesian"),
    ("agg_trimmed_mean", "Trimmed mean: per-(group, value) collapse, ONE grouped prefix scan, rank-span overlap arithmetic — no per-group sort"),
    ("sketch_ams_f2", "AMS F2: five sign-hash sums in one map-side-combinable pass; the only shuffle is the exact-F2 verification group-by"),
]

HEADER = """# PLANS — physical-plan evidence for the scale claims

Generated from `df.explain('formatted')` on sf0.01 (regenerate with
`python tools/gen_plans.py`).  These are the plans the shape tests in
`tests/test_plan_shapes.py` pin; SCALE.md explains why each shape is
the one that survives 100 TB.
"""


def main() -> int:
    from pyspark.sql import SparkSession

    from fotmobdatapipeline_spark.plans.catalog import QUERIES, _load_all

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    _load_all()
    sections = [HEADER]
    for name, why in PICKS:
        df = QUERIES[name].builder(spark, "/root/testdata/sf0.01")
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        plan = re.sub(r"#\d+L?", "", plan)  # strip expr ids for readability
        sections.append(f"## {name}\n\n*{why}*\n\n```\n{plan.strip()}\n```\n")
    out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out_path, "w") as f:
        f.write("\n".join(sections))
    print(f"wrote {out_path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
