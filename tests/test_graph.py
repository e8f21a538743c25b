"""PageRank (operators/graph.py): known closed forms, conservation
bounds, and bit-determinism across partitionings."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F


def _ranks(spark, edges, iters=10, n_parts=None):
    from fotmobdatapipeline_spark.operators.graph import pagerank

    df = spark.createDataFrame(edges, "src long, dst long")
    if n_parts:
        df = df.repartition(n_parts)
    out = pagerank(df, iters=iters)
    return {r["node"]: r["rank"] for r in out.collect()}


def test_cycle_is_uniform(spark):
    """On a directed cycle every node keeps rank exactly 1: the update
    0.15 + 0.85 * 1 is a fixed point, exact in decimal."""
    cycle = [(i, (i + 1) % 5) for i in range(5)]
    got = _ranks(spark, cycle, iters=7)
    assert set(got) == set(range(5))
    assert all(r == Decimal(1) for r in got.values()), got


def test_star_hub_dominates_and_mass_bounded(spark):
    """Star graph (all spokes point at the hub): the hub accumulates all
    spoke mass; total rank <= n (dangling hub leaks)."""
    spokes = 8
    star = [(i, 99) for i in range(spokes)]
    got = _ranks(spark, star, iters=10)
    hub, spoke_ranks = got[99], [got[i] for i in range(spokes)]
    assert all(r == spoke_ranks[0] for r in spoke_ranks)  # symmetry, exact
    assert hub > max(spoke_ranks) * 4
    total = sum(got.values())
    assert total <= Decimal(spokes + 1)


def test_pagerank_deterministic_across_partitionings(spark):
    """Decimal arithmetic makes ranks BIT-identical whatever the
    partitioning — the property double-based ranks cannot give."""
    edges = [(i, (i * 3 + 1) % 40) for i in range(40)] + [
        (i, (i * 7 + 2) % 40) for i in range(40)
    ]
    a = _ranks(spark, edges, iters=6, n_parts=1)
    b = _ranks(spark, edges, iters=6, n_parts=17)
    assert a == b


def test_pagerank_over_neardup_graph_runs(spark):
    """The catalog shape: centrality over the LSH candidate-pair graph
    (undirected -> both directions)."""
    from fotmobdatapipeline_spark.operators.dedup import (
        lsh_band_pairs,
        minhash_signatures,
    )
    from fotmobdatapipeline_spark.operators.graph import pagerank
    from fotmobdatapipeline_spark.sources.registry import read_table
    from tests.conftest import SF_SMALL

    docs = read_table(spark, SF_SMALL, "documents")
    pairs = lsh_band_pairs(minhash_signatures(docs, num_hashes=4), num_hashes=4)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    out = pagerank(edges, iters=5)
    assert out.count() > 0
    assert out.filter(F.col("rank") <= 0).count() == 0
