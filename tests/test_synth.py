"""Synthetic scale generator contracts (sources/synth.py): the bench's
scale section is only meaningful if the generated tables are referentially
sound, deterministic, and schema-identical to the driver testdata."""

from __future__ import annotations

import glob

import pytest


@pytest.fixture(scope="module")
def synth_dir(spark, tmp_path_factory):
    from fotmobdatapipeline_spark.sources.synth import generate_scale_tables

    path = str(tmp_path_factory.mktemp("synth")) + "/sf"
    return generate_scale_tables(spark, 0.01, path, partitions=4)


def test_synth_schema_matches_testdata(spark, synth_dir):
    from fotmobdatapipeline_spark.sources.registry import read_table
    from tests.conftest import SF_SMALL

    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings",
    ):
        got = read_table(spark, synth_dir, t)
        want = read_table(spark, SF_SMALL, t)
        assert [f.name for f in got.schema.fields] == [
            f.name for f in want.schema.fields
        ], t
        # types match except timestamp precision (testdata ms vs written us)
        for g, w in zip(got.schema.fields, want.schema.fields):
            assert g.dataType == w.dataType, (t, g, w)


def test_synth_foreign_keys_are_sound(spark, synth_dir):
    """Every FK lands on an existing PK — the join tree the scale bench
    exercises must never silently drop rows to dangling keys."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.sources.registry import read_table

    t = {n: read_table(spark, synth_dir, n)
         for n in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")}
    checks = [
        (t["nation"], "n_regionkey", t["region"], "r_regionkey"),
        (t["customer"], "c_nationkey", t["nation"], "n_nationkey"),
        (t["supplier"], "s_nationkey", t["nation"], "n_nationkey"),
        (t["orders"], "o_custkey", t["customer"], "c_custkey"),
        (t["lineitem"], "l_orderkey", t["orders"], "o_orderkey"),
        (t["lineitem"], "l_partkey", t["part"], "p_partkey"),
        (t["lineitem"], "l_suppkey", t["supplier"], "s_suppkey"),
    ]
    for child, fk, parent, pk in checks:
        orphans = child.join(
            parent, child[fk] == parent[pk], "left_anti"
        ).count()
        assert orphans == 0, f"{fk} -> {pk}: {orphans} orphans"


def test_synth_is_deterministic_and_idempotent(spark, tmp_path):
    from fotmobdatapipeline_spark.sources.synth import generate_scale_tables
    from fotmobdatapipeline_spark.sources.registry import read_table

    a = generate_scale_tables(spark, 0.002, str(tmp_path / "a"), partitions=2)
    b = generate_scale_tables(spark, 0.002, str(tmp_path / "b"), partitions=4)
    for t in ("customer", "orders", "lineitem"):
        left = read_table(spark, a, t)
        diff = left.exceptAll(read_table(spark, b, t)).count()
        assert diff == 0, f"{t}: content differs across partitionings"

    # idempotence: second call is a no-op (marker respected)
    files_before = sorted(glob.glob(f"{a}/**/*.parquet", recursive=True))
    import os

    mtimes = {f: os.path.getmtime(f) for f in files_before}
    generate_scale_tables(spark, 0.002, a)
    assert {f: os.path.getmtime(f) for f in files_before} == mtimes


def test_synth_stale_partial_cache_regenerates(spark, tmp_path):
    """A dir with a valid marker but a MISSING table (the layout grew
    after the dir was cached — exactly how the round-8 bench lost its
    sf1 scale section to a pre-embeddings /tmp cache) must regenerate,
    not no-op."""
    import os
    import shutil

    from fotmobdatapipeline_spark.sources.registry import read_table
    from fotmobdatapipeline_spark.sources.synth import generate_scale_tables

    path = str(tmp_path / "stale")
    generate_scale_tables(spark, 0.002, path, partitions=2)
    shutil.rmtree(os.path.join(path, "embeddings.parquet"))
    generate_scale_tables(spark, 0.002, path, partitions=2)
    assert read_table(spark, path, "embeddings").count() > 0


def test_synth_table_subset_and_vocab_scaling(spark, tmp_path):
    """Round-12 additions: ``tables=`` writes ONLY the requested subset
    (the sf10 probe's events-only generation must not pay for 60M
    lineitems), unknown names fail loudly, and ``doc_vocab=`` widens
    the documents vocabulary (Heaps-consistent probe corpora) while the
    DEFAULT corpus stays on the legacy word list."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.sources.synth import generate_scale_tables

    path = str(tmp_path / "subset")
    generate_scale_tables(
        spark, 0.002, path, partitions=2, tables=("documents", "events")
    )
    present = {
        t
        for t in ("region", "lineitem", "documents", "events", "embeddings")
        if os.path.exists(os.path.join(path, f"{t}.parquet", "_SUCCESS"))
    }
    assert present == {"documents", "events"}

    with pytest.raises(ValueError, match="unknown synth tables"):
        generate_scale_tables(spark, 0.002, path, tables=("nope",))

    def vocab_size(d):
        return (
            spark.read.parquet(f"{d}/documents.parquet")
            .select(F.explode(F.split("text", " ")).alias("w"))
            .agg(F.countDistinct("w"))
            .collect()[0][0]
        )

    default_vocab = vocab_size(path)
    assert default_vocab <= 30  # legacy list, unchanged by the new knob

    wide = str(tmp_path / "wide")
    generate_scale_tables(
        spark, 0.002, wide, partitions=2, tables=("documents",), doc_vocab=170
    )
    assert default_vocab < vocab_size(wide) <= 170


def test_registry_only_subset(spark, tmp_path):
    """``load_tables/register_views(only=...)`` bind just the requested
    tables (partial datasets must not fail on tables a query never
    reads) and reject unknown names."""
    import pytest

    from fotmobdatapipeline_spark.sources.registry import (
        load_tables,
        register_views,
    )
    from fotmobdatapipeline_spark.sources.synth import generate_scale_tables

    path = str(tmp_path / "only")
    generate_scale_tables(spark, 0.002, path, partitions=2, tables=("events",))
    dfs = register_views(spark, path, only=("events",))
    assert set(dfs) == {"events"}
    assert spark.sql("SELECT COUNT(*) FROM events").collect()[0][0] > 0

    with pytest.raises(ValueError, match="unknown tables"):
        load_tables(spark, path, only=("not_a_table",))


def test_synth_vocab_change_regenerates_documents(spark, tmp_path):
    """ADVICE r12: the completion marker must record doc_vocab, not just
    sf — a path populated with one vocabulary and then requested with
    another must regenerate documents, never silently return the stale
    corpus (the r12 sf10 sweep hit exactly this against /tmp caches)."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.sources.synth import generate_scale_tables

    def vocab_size(d):
        return (
            spark.read.parquet(f"{d}/documents.parquet")
            .select(F.explode(F.split("text", " ")).alias("w"))
            .agg(F.countDistinct("w"))
            .collect()[0][0]
        )

    path = str(tmp_path / "vocabswap")
    generate_scale_tables(spark, 0.002, path, partitions=2, tables=("documents",))
    assert vocab_size(path) <= 30  # legacy list

    # Same path, wider vocab: must REGENERATE, not no-op on the marker.
    generate_scale_tables(
        spark, 0.002, path, partitions=2, tables=("documents",), doc_vocab=170
    )
    assert vocab_size(path) > 30

    # And back: the legacy request against the now-wide corpus regenerates too.
    generate_scale_tables(spark, 0.002, path, partitions=2, tables=("documents",))
    assert vocab_size(path) <= 30

    # A vocab-blind call that does NOT touch documents must not clobber
    # the marker's record of what's on disk.
    generate_scale_tables(
        spark, 0.002, path, partitions=2, tables=("events",), doc_vocab=170
    )
    generate_scale_tables(spark, 0.002, path, partitions=2, tables=("documents",))
    assert vocab_size(path) <= 30  # still fresh: third call was a no-op


def test_synth_window_partition_cardinalities_stay_bounded(spark, synth_dir):
    """VERDICT r12 #7: ``window_distribution`` (PARTITION BY
    c_mktsegment) and ``topk_per_group`` (PARTITION BY p_brand) are
    scale-safe ONLY while the generator keeps those key cardinalities
    small — each partition is a single-task sort, so cardinality is the
    parallelism AND the per-task data fraction.  Pin the generator
    contract so a future synth change can't silently turn either entry
    superlinear (the agg_winsorized class, SCALE.md round-12)."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.sources.registry import read_table

    n_seg = (
        read_table(spark, synth_dir, "customer")
        .agg(F.countDistinct("c_mktsegment"))
        .collect()[0][0]
    )
    assert 1 <= n_seg <= 5, (
        f"c_mktsegment cardinality {n_seg} breaks window_distribution's "
        "documented single-task-sort bound (plans/advanced.py)"
    )
    n_brand = (
        read_table(spark, synth_dir, "part")
        .agg(F.countDistinct("p_brand"))
        .collect()[0][0]
    )
    assert 1 <= n_brand <= 25, (
        f"p_brand cardinality {n_brand} breaks topk_per_group's "
        "documented single-task-sort bound (plans/core.py)"
    )
