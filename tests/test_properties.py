"""Property-based tests (hypothesis) for the dedup/similarity/text
operators — invariants no oracle run can pin down (SURVEY.md §5.3).

Strategy sizes are kept small: each example round-trips through Spark,
so we cap examples and reuse the session-scoped SparkSession.
"""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

WORDS = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog", "agg", "row"]

texts = st.lists(st.sampled_from(WORDS), min_size=3, max_size=12).map(" ".join)

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _docs_df(spark, texts_list):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts_list)], "doc_id long, text string"
    )


@given(st.lists(texts, min_size=2, max_size=5))
@_settings
def test_fingerprint_invariant_under_word_shuffle(spark, texts_list):
    """fingerprint = md5(sorted distinct words) must not change when the
    words of a doc are permuted."""
    from fotmobdatapipeline_spark.operators.dedup import fingerprint

    from pyspark.sql import functions as F

    rng = random.Random(0)
    shuffled = []
    for t in texts_list:
        ws = t.split(" ")
        rng.shuffle(ws)
        shuffled.append(" ".join(ws))
    a = _docs_df(spark, texts_list).select("doc_id", fingerprint(F.col("text")).alias("fp"))
    b = _docs_df(spark, shuffled).select("doc_id", fingerprint(F.col("text")).alias("fp"))
    assert {(r["doc_id"], r["fp"]) for r in a.collect()} == {
        (r["doc_id"], r["fp"]) for r in b.collect()
    }


@given(st.lists(texts, min_size=2, max_size=4))
@_settings
def test_jaccard_bounds_and_identity(spark, texts_list):
    """0 < jaccard <= 1 for reported pairs; a doc duplicated verbatim
    yields jaccard == 1 with its copy."""
    from fotmobdatapipeline_spark.operators.dedup import jaccard_pairs

    docs = texts_list + [texts_list[0]]  # exact duplicate of doc 0
    df = _docs_df(spark, docs)
    rows = jaccard_pairs(df).collect()
    for r in rows:
        assert 0.0 < r["jaccard"] <= 1.0
    dup_pair = [r for r in rows if r["doc_a"] == 0 and r["doc_b"] == len(docs) - 1]
    if len(texts_list[0].split()) >= 3:  # doc 0 has shingles at all
        assert dup_pair and dup_pair[0]["jaccard"] == 1.0


@given(st.lists(texts, min_size=2, max_size=4))
@_settings
def test_minhash_identical_docs_identical_signatures(spark, texts_list):
    from fotmobdatapipeline_spark.operators.dedup import minhash_signatures

    docs = texts_list + [texts_list[0]]
    df = _docs_df(spark, docs)
    sigs = {r["doc_id"]: tuple(r[f"sig_{j}"] for j in range(8)) for r in
            minhash_signatures(df).collect()}
    if 0 in sigs and len(docs) - 1 in sigs:
        assert sigs[0] == sigs[len(docs) - 1]


def test_lsh_candidates_superset_of_high_jaccard(spark):
    """Near-identical docs must collide in at least one LSH band (r=1
    banding: candidate iff ANY signature matches)."""
    from fotmobdatapipeline_spark.operators.dedup import (
        lsh_band_pairs,
        minhash_signatures,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    variant = base + " tail"  # one extra shingle
    df = _docs_df(spark, [base, variant, "totally different words entirely here now"])
    sigs = minhash_signatures(df, num_hashes=4)
    pairs = {(r["doc_a"], r["doc_b"]) for r in lsh_band_pairs(sigs, num_hashes=4).collect()}
    assert (0, 1) in pairs


def test_lsh_band_df_cap_excludes_hot_band(spark):
    """max_band_df bounds the quadratic hot-band fan-out (VERDICT r5 #1):
    a boilerplate corpus where one band key holds half the docs must
    produce ZERO pairs among the boilerplate docs once the cap is below
    the band occupancy, while unrelated cool pairs survive untouched.
    Also pins the row bound: capped pair count <= n_bands * C(cap, 2)."""
    from fotmobdatapipeline_spark.operators.dedup import (
        lsh_band_pairs,
        minhash_signatures,
    )

    boiler = "copyright footer all rights reserved contact us terms of service"
    docs = [boiler] * 10  # ids 0-9: identical -> every band key is hot (df=10)
    docs += [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy dog again and again tail",
    ]  # ids 10, 11: a cool near-dup pair (band df == 2)
    df = _docs_df(spark, docs)
    sigs = minhash_signatures(df, num_hashes=4)

    uncapped = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_band_pairs(sigs, num_hashes=4).collect()
    }
    assert (0, 1) in uncapped and (10, 11) in uncapped

    cap = 5
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_band_pairs(sigs, num_hashes=4, max_band_df=cap).collect()
    }
    assert (10, 11) in capped  # cool pair survives
    assert all(a >= 10 for a, _ in capped), capped  # hot band fully excluded
    assert len(capped) <= 4 * cap * (cap - 1) // 2  # n_bands * C(cap, 2)


def test_lsh_bucket_df_cap_excludes_hot_bucket(spark):
    """max_bucket_df on the sign-LSH pair join: a corpus where one
    bucket holds half the vectors must produce zero pairs from that
    bucket under a cap below its occupancy, while a cool bucket's pair
    survives; pair count bounded by C(cap, 2) per surviving bucket."""
    from fotmobdatapipeline_spark.operators.similarity import lsh_candidate_pairs

    d = 16
    # ids 0-9: first 8 dims all positive -> one hot bucket (df=10)
    hot = [[1.0] * d for _ in range(10)]
    # ids 10, 11: first dim negative -> a different, cool bucket (df=2)
    cool = [([-1.0] + [1.0] * (d - 1)) for _ in range(2)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(hot + cool)],
        "vec_id long, embedding array<float>",
    )
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(df, n_bits=8, min_cosine=-2.0).collect()
    }
    assert (0, 1) in uncapped and (10, 11) in uncapped
    capped = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(
            df, n_bits=8, min_cosine=-2.0, max_bucket_df=5
        ).collect()
    }
    assert capped == {(10, 11)}, capped


def test_rp_bucket_df_cap_excludes_hot_bucket(spark):
    """rp_bucket_topk_pairs under a 50%-hot-bucket corpus: with the cap
    below the hot bucket's occupancy, no returned pair may involve two
    hot-bucket members — the quadratic candidate stage is bounded before
    the verify, and the cool pair still verifies exactly."""
    from fotmobdatapipeline_spark.operators.similarity import (
        rademacher_matrix,
        rp_bucket_topk_pairs,
    )

    d, out_dim = 16, 4
    mat = rademacher_matrix(d, out_dim)
    hot_vec = [1.0] * d
    # A vector whose projection flips every sign lands in the complement
    # bucket: negate the input (sign(-Mx) = -sign(Mx) for nonzero proj).
    cool_vec = [-1.0] * d
    rows = [(i, hot_vec) for i in range(10)]
    rows += [(10, cool_vec), (11, list(cool_vec))]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    res = rp_bucket_topk_pairs(
        df, in_dim=d, out_dim=out_dim, limit=100, max_bucket_df=5
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in res}
    assert all(not (a < 10 and b < 10) for a, b in got), got
    assert (10, 11) in got, got


def test_cosine_topk_self_similarity(spark):
    """A vector duplicated exactly must be its copy's top neighbor with
    cos_sim == 1.0 (bit-exact by the sequential-fold determinism)."""
    from fotmobdatapipeline_spark.operators.similarity import brute_force_topk

    rng = random.Random(1)
    vecs = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(6)]
    vecs.append(list(vecs[0]))  # id 6 == id 0
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    top = brute_force_topk(df.filter("vec_id = 0"), df, k=1).collect()
    assert top[0]["neighbor_id"] == 6
    assert top[0]["cos_sim"] == 1.0


@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 6), st.floats(1.0, 100.0)),
        min_size=1,
        max_size=30,
    )
)
@_settings
def test_salted_join_equals_plain_join(spark, rows):
    """salted_join must be row-identical to the plain equi-join for any
    key distribution (including heavy duplication)."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.joins import salted_join

    probe = spark.createDataFrame(
        [(k, s, v) for k, s, v in rows], "k long, salt_src int, v double"
    )
    build = spark.createDataFrame(
        [(k, f"dim_{k}") for k in range(0, 21, 2)], "k long, attr string"
    )
    plain = probe.join(build, "k").select("k", "v", "attr")
    salted = salted_join(
        probe, build, "k", probe_salt=F.col("salt_src") % 4, n_salts=4
    ).select("k", "v", "attr")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_rejects_build_side_outer(spark):
    """Right/full outer joins would emit each unmatched build row once
    per salt replica — the guard must reject them loudly."""
    import pytest
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.joins import salted_join

    probe = spark.createDataFrame([(1, 1.0)], "k long, v double")
    build = spark.createDataFrame([(1, "a"), (2, "b")], "k long, attr string")
    for how in ("right", "rightouter", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(probe, build, "k", probe_salt=F.lit(0), how=how)
    # left-family joins remain identical to the plain join
    plain = probe.join(build, "k", "left_anti")
    salted = salted_join(probe, build, "k", probe_salt=F.lit(0), how="left_anti")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_team_lookup_raises_on_ambiguous_team_id(spark):
    """fotmob build_star: a teamId carrying two canonical names (canon
    map gap) must fail the fact build loudly, never silently fan out
    shot rows."""
    import pytest

    from fotmobdatapipeline_spark import fotmob

    base = {
        "matchId": "m1", "home_team_id": 10, "away_team_id": 20,
        "away_team_name": "Chelsea", "player_name": "P",
        "shot_type": "goal", "event_type": "Goal", "situation": "OpenPlay",
        "teamId": 10, "xG": 0.5, "xGOT": 0.6, "shot_from_x": 1.0,
        "shot_from_y": 2.0, "is_blocked": False, "blocked_x": 0.0,
        "blocked_y": 0.0, "goal_crossed_y": 0.1, "goal_crossed_z": 0.2,
    }
    row_a = dict(base, shot_id=1, home_team_name="Arsenal")
    row_b = dict(base, shot_id=2, home_team_name="Arsenal FC")
    clean = spark.createDataFrame([row_a, row_b])
    star = fotmob.build_star(clean)
    with pytest.raises(Exception, match="maps to multiple team_dim rows"):
        star["fact_table"].collect()


@given(
    st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=80),
    st.lists(st.sampled_from("abcdefghxyz"), min_size=1, max_size=6, unique=True),
)
@_settings
def test_count_min_sketch_never_undercounts(spark, stream, probes):
    """CMS one-sided error: for ANY key stream and ANY probe set, the
    estimate is >= the true count, unseen keys estimate >= 0, and the
    sketch table never exceeds depth*width rows."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.sketches import (
        cms_estimate,
        count_min_table,
    )

    df = spark.createDataFrame([(k,) for k in stream], "k string")
    cms = count_min_table(df, "k", depth=3, width=8)
    assert cms.count() <= 3 * 8
    pdf = spark.createDataFrame([(k,) for k in probes], "k string")
    got = {r["k"]: r["cms_est"] for r in cms_estimate(cms, pdf, "k", depth=3, width=8).collect()}
    from collections import Counter

    true = Counter(stream)
    for k in probes:
        assert got[k] >= true.get(k, 0), (k, got[k], true.get(k, 0))


@given(st.lists(st.integers(0, 1000), min_size=1, max_size=50, unique=True))
@_settings
def test_hash_sample_is_partitioning_invariant(spark, keys):
    """The content-hash sample must select the same keys regardless of
    how the input is partitioned — the reproducibility property
    df.sample() lacks."""
    from fotmobdatapipeline_spark.operators.sampling import hash_sample

    df1 = spark.createDataFrame([(k,) for k in keys], "k long").repartition(1)
    df8 = spark.createDataFrame([(k,) for k in sorted(keys, reverse=True)], "k long").repartition(8)
    s1 = sorted(r["k"] for r in hash_sample(df1, "k", 0.3).collect())
    s8 = sorted(r["k"] for r in hash_sample(df8, "k", 0.3).collect())
    assert s1 == s8


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 5000), st.booleans()),
        min_size=2,
        max_size=30,
    )
)
@_settings
def test_interval_bucket_join_equals_naive(spark, rows):
    """The 2-bucket equi-join rewrite must produce exactly the naive
    inequality join's pairs for arbitrary user/time layouts."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.joins import interval_bucket_join

    data = [
        (i, u, sec, "purchase" if is_a else "view")
        for i, (u, sec, is_a) in enumerate(rows)
    ]
    ev = (
        spark.createDataFrame(data, "event_id long, user_id long, sec long, event_type string")
        .withColumn("ts", F.timestamp_seconds(F.col("sec")))
        .drop("sec")
    )
    got = interval_bucket_join(
        ev,
        F.col("event_type") == "purchase",
        F.col("event_type") == "view",
        window_seconds=600,
    ).select("a_id", "b_id")
    a = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("a_id"), F.col("user_id").alias("u"), F.col("ts").alias("a_ts")
    )
    b = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("b_id"), F.col("user_id").alias("u2"), F.col("ts").alias("b_ts")
    )
    naive = a.join(
        b,
        (F.col("u") == F.col("u2"))
        & (F.unix_micros("b_ts") > F.unix_micros("a_ts") - 600_000_000)
        & (F.unix_micros("b_ts") <= F.unix_micros("a_ts")),
    ).select("a_id", "b_id")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))


@given(st.lists(st.floats(0.0, 1000.0), min_size=2, max_size=40))
@_settings
def test_exact_quantiles_match_numpy(spark, values):
    """exact_group_quantiles must equal numpy's linear-interpolation
    percentile (the PERCENTILE_CONT definition) to float tolerance."""
    import math

    import numpy as np

    from fotmobdatapipeline_spark.operators.stats import exact_group_quantiles

    df = spark.createDataFrame([("g", v) for v in values], "g string, v double")
    row = exact_group_quantiles(df, "v", ["g"], ps=(0.5, 0.9)).collect()[0]
    want50 = float(np.percentile(np.array(values), 50))
    want90 = float(np.percentile(np.array(values), 90))
    assert math.isclose(row["p50"], want50, rel_tol=1e-9, abs_tol=1e-9)
    assert math.isclose(row["p90"], want90, rel_tol=1e-9, abs_tol=1e-9)


def test_connected_dup_clusters_chain_and_islands(spark):
    """Min-label propagation must assign every member of a connected
    component its smallest id — including across multi-hop chains."""
    from fotmobdatapipeline_spark.operators.dedup import connected_dup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc_a long, doc_b long",
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_dup_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=20,
    )
)
@_settings
def test_connected_dup_clusters_match_union_find(spark, edge_list):
    """Spark connected components must agree with a driver-side
    union-find on arbitrary small graphs."""
    from fotmobdatapipeline_spark.operators.dedup import connected_dup_clusters

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edge_list:
        union(a, b)
    want = {v: find(v) for v in parent}

    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edge_list], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_dup_clusters(pairs).collect()
    }
    assert got == want


def test_short_doc_edge_cases(spark):
    """Documents below the shingle/fingerprint minimums must vanish from
    sketch outputs (not crash, not emit garbage)."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.dedup import (
        minhash_signatures,
        winnowing_fingerprints,
        word_shingles,
    )

    df = _docs_df(spark, ["", "one", "two words", "three words here", "x" * 10])
    # word_shingles: docs with < 3 words yield empty arrays
    sh = df.select(F.size(word_shingles(F.col("text"))).alias("n")).collect()
    assert [r["n"] for r in sh] == [0, 0, 0, 1, 0]
    # minhash drops shingle-less docs
    assert {r["doc_id"] for r in minhash_signatures(df).collect()} == {3}
    # winnowing k=8,w=4: needs >= 11 chars
    fps = winnowing_fingerprints(df, k=8, window=4)
    ids = {r["doc_id"] for r in fps.collect()}
    assert 0 not in ids and 1 not in ids  # "" (0 ch) and "one" (3 ch) drop
    assert 3 in ids  # "three words here" (16 ch) fingerprints

def test_quality_scoring_handles_degenerate_text(spark):
    """Quality ratios must not divide by zero or NaN on empty/one-word
    docs (split('') yields [''], size 1 — by construction safe)."""
    import math

    from fotmobdatapipeline_spark.plans.catalog import query_map

    # exercised via the text_quality builder on a temp view-compatible df
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.functions import text as T

    df = _docs_df(spark, ["", "word", "the the the"])
    t = F.col("text")
    out = df.select(
        T.stopword_ratio(t).alias("stop"),
        T.distinct_word_ratio(t).alias("div"),
        T.avg_word_len(t).alias("awl"),
    ).collect()
    for r in out:
        for v in (r["stop"], r["div"], r["awl"]):
            assert v is not None and not math.isnan(v) and v >= 0.0


def test_kmeans_lloyd_invariants(spark):
    """Lloyd iterations must not increase the (cosine) inertia, must keep
    k stable cells, and must assign every vector."""
    from fotmobdatapipeline_spark.operators.similarity import (
        inertia,
        ivf_assign,
        kmeans_lloyd,
    )
    from fotmobdatapipeline_spark.sources.registry import read_table
    from tests.conftest import SF_SMALL

    emb = read_table(spark, SF_SMALL, "embeddings")
    c0 = kmeans_lloyd(emb, k=4, iterations=0)  # seeds only
    c2 = kmeans_lloyd(emb, k=4, iterations=2)
    assert c2.count() == 4
    i0, i2 = inertia(emb, c0), inertia(emb, c2)
    assert i2 <= i0 + 1e-9, f"inertia must not increase: {i0} -> {i2}"
    assigned = ivf_assign(emb, c2)
    assert assigned.count() == emb.count()
    assert assigned.select("cell").distinct().count() <= 4


def test_kmeans_sampled_training_deterministic(spark):
    """train_sample_mod trains on the content-stable xxhash64(id)%m==0
    slice: two runs (and a repartitioned input) give bit-identical
    centroids, sampled inertia stays in the same regime as full
    training, and a sample smaller than k raises instead of silently
    under-seeding."""
    import pytest as _pytest

    from fotmobdatapipeline_spark.operators.similarity import (
        inertia,
        kmeans_lloyd,
    )
    from fotmobdatapipeline_spark.sources.registry import read_table
    from tests.conftest import SF_SMALL

    emb = read_table(spark, SF_SMALL, "embeddings")
    a = sorted(map(tuple, kmeans_lloyd(emb, k=4, iterations=2,
                                       train_sample_mod=2).collect()))
    b = sorted(map(tuple, kmeans_lloyd(emb.repartition(7), k=4, iterations=2,
                                       train_sample_mod=2).collect()))
    assert a == b  # content-stable sample + fixed-point means

    full = kmeans_lloyd(emb, k=4, iterations=2)
    sampled_df = spark.createDataFrame([list(r) for r in a], full.schema)
    # sampled-trained centroids must still cluster the FULL corpus
    # sanely: within 2x of full-training inertia on this data
    assert inertia(emb, sampled_df) <= 2.0 * inertia(emb, full)

    with _pytest.raises(ValueError, match="training vectors"):
        kmeans_lloyd(emb, k=4, train_sample_mod=10**9)


def test_approx_quantiles_close_to_exact(spark):
    """percentile_approx with accuracy 10k must land within 1% relative
    error of the exact rank-arithmetic quantiles on sf0.001, and the
    catalog query's in-plan rank-bound verdicts must all hold."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.stats import exact_group_quantiles
    from fotmobdatapipeline_spark.plans.catalog import query_map
    from fotmobdatapipeline_spark.sources.registry import read_table
    from tests.conftest import SF_SMALL

    li = read_table(spark, SF_SMALL, "lineitem")
    exact = {
        r["l_returnflag"]: (r["p50"], r["p90"])
        for r in exact_group_quantiles(li, "l_quantity", ["l_returnflag"]).collect()
    }
    approx = {
        r["l_returnflag"]: r["approx_q"]
        for r in li.groupBy("l_returnflag")
        .agg(F.percentile_approx("l_quantity", [0.5, 0.9], 10_000).alias("approx_q"))
        .collect()
    }
    assert set(exact) == set(approx)
    for flag, (e50, e90) in exact.items():
        a50, a90 = approx[flag]
        assert abs(a50 - e50) <= 0.01 * max(e50, 1)
        assert abs(a90 - e90) <= 0.01 * max(e90, 1)

    for r in query_map()["agg_approx_quantiles"](spark, SF_SMALL).collect():
        assert r["p50_in_bounds"] and r["p90_in_bounds"], r


def test_grouped_map_zscore_matches_window_expression(spark):
    """applyInPandas z-score must match the native window-expression
    z-score to float tolerance on every event."""
    import math

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.plans.catalog import query_map
    from fotmobdatapipeline_spark.sources.registry import read_table
    from tests.conftest import SF_SMALL

    got = {
        r["event_id"]: r["z_value"]
        for r in query_map()["events_user_zscore"](spark, SF_SMALL).collect()
    }
    ev = read_table(spark, SF_SMALL, "events")
    w = Window.partitionBy("user_id")
    native = ev.select(
        "event_id",
        (
            (F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w)
        ).alias("z"),
    )
    want = {r["event_id"]: r["z"] for r in native.collect()}
    assert set(got) == set(want)
    for eid, z in want.items():
        assert math.isclose(got[eid], z, rel_tol=1e-9, abs_tol=1e-9), eid


def test_distributed_running_sum_is_partition_invariant(spark):
    """The two-phase prefix sum must equal the single-partition global
    window exactly, at any partitioning."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.prefix import running_sum

    rows = [(i * 7919 % 1000, i % 13 + 1) for i in range(5000)]
    df = (
        spark.createDataFrame(rows, "k long, v long")
        .withColumn("rid", F.monotonically_increasing_id())
    )
    for n_parts in (1, 5, 32):
        got = running_sum(df, ["k", "rid"], "v", n_parts=n_parts)
        w = Window.orderBy("k", "rid").rowsBetween(Window.unboundedPreceding, 0)
        want = df.withColumn("running", F.sum("v").over(w))
        assert sorted(got.select("k", "rid", "running").collect()) == sorted(
            want.select("k", "rid", "running").collect()
        ), n_parts


def test_running_sum_reliable_checkpoint_path(spark, tmp_path):
    """VERDICT r11 #4: the ``reliable_checkpoint=True`` cluster branch
    (``DataFrame.checkpoint()`` into ``setCheckpointDir`` storage — the
    executor-loss-surviving path) must produce BIT-EQUAL output to the
    default localCheckpoint path, for both the global and the grouped
    prefix scan.  Also pins the fail-LOUD contract when no checkpoint
    dir is set — the misconfiguration that would otherwise only surface
    on a real cluster."""
    import pytest
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.prefix import (
        grouped_running_sum,
        running_sum,
    )

    rows = [((i * 31) % 7, (i * 7919) % 500, i % 11 + 1) for i in range(4000)]
    df = (
        spark.createDataFrame(rows, "g long, k long, v long")
        .withColumn("rid", F.monotonically_increasing_id())
        .localCheckpoint()  # freeze rids so both branches see one input
    )

    sc = spark.sparkContext
    prev_dir = sc.getCheckpointDir()
    try:
        # No checkpoint dir set -> the reliable branch must raise at
        # materialization, never silently fall back or corrupt.
        if prev_dir is None:
            with pytest.raises(Exception, match="[Cc]heckpoint"):
                running_sum(
                    df, ["k", "rid"], "v", reliable_checkpoint=True
                ).collect()

        sc.setCheckpointDir(str(tmp_path / "reliable-ckpt"))
        local = sorted(
            running_sum(df, ["k", "rid"], "v")
            .select("k", "rid", "running")
            .collect()
        )
        reliable = sorted(
            running_sum(df, ["k", "rid"], "v", reliable_checkpoint=True)
            .select("k", "rid", "running")
            .collect()
        )
        assert reliable == local

        g_local = sorted(
            grouped_running_sum(df, ["g"], ["k", "rid"], "v")
            .select("g", "k", "rid", "running")
            .collect()
        )
        g_reliable = sorted(
            grouped_running_sum(
                df, ["g"], ["k", "rid"], "v", reliable_checkpoint=True
            )
            .select("g", "k", "rid", "running")
            .collect()
        )
        assert g_reliable == g_local
    finally:
        if prev_dir is not None:
            sc.setCheckpointDir(prev_dir)


def test_pack_sequences_invariants(spark):
    """No sequence exceeds budget + max_chunk - 1 tokens; all sequences
    except the last are at least budget-full when the next chunk exists;
    token totals are conserved."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.plans.catalog import QUERIES, _load_all
    from fotmobdatapipeline_spark.plans.llmdata import _PACK_BUDGET

    _load_all()
    from tests.conftest import SF_SMALL

    out = QUERIES["pack_sequences"].builder(spark, SF_SMALL)
    rows = sorted(out.collect(), key=lambda r: r["seq_id"])
    assert rows, "no sequences packed"
    max_chunk = 64
    for r in rows[:-1]:
        assert r["seq_tokens"] < _PACK_BUDGET + max_chunk
        # every non-final sequence crossed the budget boundary
        assert r["seq_tokens"] > _PACK_BUDGET - max_chunk
    total = sum(r["seq_tokens"] for r in rows)
    from fotmobdatapipeline_spark.functions.chunking import chunk_windows
    from fotmobdatapipeline_spark.sources.registry import read_table

    docs = read_table(spark, SF_SMALL, "documents")
    want_total = (
        docs.select(F.explode(chunk_windows(F.col("text"))).alias("c"))
        .agg(F.sum("c.n_tokens"))
        .first()[0]
    )
    assert total == want_total


def test_ivf_recall_rises_with_nprobe(spark):
    """The recall contract for multi-probe IVF: recall@5 vs brute force
    is monotone in n_probes, with measured floors (0.41/0.56/0.68 at
    sf0.001 with 8 cells) pinned loosely so a regression in cell
    assignment or probe fan-out trips the test."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators import similarity as S
    from fotmobdatapipeline_spark.sources.registry import read_table
    from tests.conftest import SF_SMALL

    emb = read_table(spark, SF_SMALL, "embeddings")
    n_cells, n_q = 8, 40
    centroids = emb.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    queries = emb.filter(F.col("vec_id") < n_q)

    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    truth = topk_sets(S.brute_force_topk(queries, emb, k=5))
    total = sum(len(t) for t in truth.values())
    recalls = []
    for p in (1, 2, 3):
        got = topk_sets(S.ivf_topk(queries, emb, centroids, k=5, n_probes=p))
        hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
        recalls.append(hits / total)
    assert recalls[0] <= recalls[1] <= recalls[2], recalls
    assert recalls[0] >= 0.3 and recalls[1] >= 0.5 and recalls[2] >= 0.6, recalls


def test_kmv_sketch_mergeable_and_bounded(spark):
    """KMV contracts: (1) the sketch is partitioning-invariant; (2) the
    bottom-k of the UNION of two sketches equals the sketch of the union
    (mergeability — the property that lets per-shard sketches compose);
    (3) the estimate lands within the ~1/sqrt(k) relative-error band on
    a known-cardinality set."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.sketches import kmv_estimate, kmv_sketch

    n = 5000
    df = spark.createDataFrame([(f"key{i}",) for i in range(n)], "k string")
    k = 64
    base = [r["h"] for r in kmv_sketch(df, "k", k=k).collect()]
    repart = [r["h"] for r in kmv_sketch(df.repartition(11), "k", k=k).collect()]
    assert sorted(base) == sorted(repart)

    half_a = df.filter(F.col("k") < "key25")  # lexicographic split
    half_b = df.filter(F.col("k") >= "key25")
    merged = (
        kmv_sketch(half_a, "k", k=k)
        .unionByName(kmv_sketch(half_b, "k", k=k))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    assert sorted(r["h"] for r in merged.collect()) == sorted(base)

    est = kmv_estimate(kmv_sketch(df, "k", k=k), k=k).collect()[0]["est_distinct"]
    assert abs(est - n) / n < 4 / (k ** 0.5), est  # ~4 sigma band


def test_bpe_train_hand_computed(spark):
    """Independent pin for the iterative BPE trainer (the oracle replays
    the same algorithm, so a shared bug would pass parity): a tiny corpus
    whose 6 merges — including count ties broken by (lft, rgt) and a
    merged symbol participating in later merges — are computed by hand.

    words: low x3, lower x1, newest x2."""
    from fotmobdatapipeline_spark.plans.llmdata import bpe_train_merges

    docs = spark.createDataFrame(
        [(1, "low low low lower"), (2, "newest newest")], "doc_id long, text string"
    )
    got = [
        (r["step"], r["lft"], r["rgt"], r["pair_count"])
        for r in bpe_train_merges(spark, docs, 6).orderBy("step").collect()
    ]
    assert got == [
        (0, "l", "o", 4),      # lo=4 ties ow=4 -> lft tiebreak
        (1, "lo", "w", 4),     # merged symbol chains immediately
        (2, "e", "s", 2),      # five pairs tie at 2 -> (e,s) smallest
        (3, "e", "w", 2),
        (4, "es", "t", 2),     # 'es' < 'ew' < 'n'
        (5, "ew", "est", 2),
    ], got


def test_bpe_encode_hand_computed(spark):
    """Apply-side twin of the trainer pin: the same tiny corpus's merges
    (computed by hand above) must tokenize each word exactly — greedy
    left-to-right per merge, in rank order, merged symbols composing."""
    from fotmobdatapipeline_spark.plans.llmdata import bpe_encode_words

    docs = spark.createDataFrame(
        [(1, "low low low lower"), (2, "newest newest")], "doc_id long, text string"
    )
    got = {
        r["word"]: (r["tokens"], r["n_tokens"], r["freq"])
        for r in bpe_encode_words(docs, 6).collect()
    }
    assert got == {
        "low": ("low", 1, 3),
        "lower": ("low e r", 3, 1),
        "newest": ("n ewest", 2, 2),
    }, got


def test_funnel_strict_ordering_hand_computed(spark):
    """The funnel is strictly ordered per user: a click before the first
    view doesn't qualify, and a purchase before the first QUALIFYING
    click doesn't either."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.plans.events import funnel_conversion

    rows = [
        # user 1: clean view(1) -> click(2) -> purchase(3)
        (100, 1, "view"), (101, 2, "click"), (102, 3, "purchase"),
        # user 2: click(1) precedes view(2) -> doesn't qualify; click(5)
        # does; purchase(4) is BEFORE the qualifying click -> no step 3.
        (200, 1, "click"), (201, 2, "view"), (202, 4, "purchase"), (203, 5, "click"),
        # user 3: view only.
        (300, 7, "view"),
    ]
    ev = spark.createDataFrame(
        [(eid, eid // 100, t, et) for eid, t, et in rows],
        "event_id long, user_id long, t long, event_type string",
    ).withColumn("ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("t")))

    got = funnel_conversion(ev.select("user_id", "event_type", "ts")).collect()[0]
    assert (got["step1_users"], got["step2_users"], got["step3_users"]) == (3, 2, 1)
    assert abs(got["rate_12"] - 2 / 3) < 1e-15 and got["rate_23"] == 0.5


def test_incremental_dedup_hand_computed(spark):
    """Batch-vs-corpus and within-batch flags compose independently: a
    corpus dup is flagged even as the batch's first occurrence; a
    batch-internal dup is flagged without any corpus hit; word order
    doesn't evade the normalized fingerprint."""
    from fotmobdatapipeline_spark.operators.dedup import incremental_dedup_flags

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, "gamma beta alpha"),   # corpus dup (normalized), first in batch
            (20, "delta epsilon zeta"), # clean
            (30, "delta epsilon zeta"), # within-batch dup of 20
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["dup_of_corpus"], r["dup_within_batch"])
        for r in incremental_dedup_flags(corpus, batch).collect()
    }
    assert got == {10: (True, False), 20: (False, False), 30: (False, True)}, got


def test_length_outliers_hand_computed(spark):
    """Exact lower-median semantics on even and odd group sizes, and the
    all-integer 3xMAD outlier rule: source g has lengths [1,2,3,100]
    (lower median 2, MAD 1, one outlier), source h has [5,7,9]
    (median 7, MAD 2, none)."""
    from fotmobdatapipeline_spark.plans.llmdata import length_outlier_stats

    rows = []
    for i, n in enumerate([1, 2, 3, 100]):
        rows.append((i, "g", " ".join(["w"] * n)))
    for i, n in enumerate([5, 7, 9]):
        rows.append((10 + i, "h", " ".join(["w"] * n)))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["source"]: (r["n_docs"], r["med_len"], r["mad"], r["n_outliers"])
        for r in length_outlier_stats(docs).collect()
    }
    assert got == {"g": (4, 2, 1, 1), "h": (3, 7, 2, 0)}, got


def test_winnowing_copy_pairs_catch_partial_copy(spark):
    """Containment detects a PARTIAL copy (short doc lifted verbatim into
    a longer one) that symmetric Jaccard dilutes below threshold: the
    lifted pair scores near 1.0 on min-side containment while unrelated
    docs never pair."""
    from fotmobdatapipeline_spark.operators.dedup import winnowing_copy_pairs

    lifted = "the quick brown fox jumps over the lazy dog again and again"
    tail = (
        "completely different trailing content follows here with many "
        "more unrelated words stretching this document far past the "
        "original so the symmetric overlap fraction becomes small"
    )
    docs = spark.createDataFrame(
        [
            (1, lifted),
            (2, lifted + " " + tail),
            (3, "an entirely unrelated document about something else whole"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in winnowing_copy_pairs(docs, tau=0.5, max_df=50).collect()
    }
    assert (1, 2) in got and got[(1, 2)] >= 0.7, got
    assert (1, 3) not in got and (2, 3) not in got, got


def test_sentence_dedup_hand_computed(spark):
    """First occurrence by (doc, position) wins corpus-wide; within-doc
    repetition is removed too; docs rebuild in original segment order.
    Also pins the skew-safety shape: no per-sentence Window sort — the
    first-occurrence winner is a map-side-combinable min-struct agg."""
    from fotmobdatapipeline_spark.operators.dedup import sentence_dedup

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),      # segs: "a b", "c d"
            (2, "c d e f a b"),  # "c d" and "a b" are doc-1 dups -> keeps "e f"
            (3, "e f e f x"),    # "e f" first seen in doc 2 -> keeps only "x"
        ],
        "doc_id long, text string",
    )
    out = sentence_dedup(docs, words_per_sentence=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    got = {
        r["doc_id"]: (r["n_sentences"], r["n_kept"], r["text_dedup"])
        for r in out.collect()
    }
    assert got == {1: (2, 2, "a b c d"), 2: (3, 1, "e f"), 3: (3, 1, "x")}, got


def test_reservoir_per_group(spark):
    """Per-group reservoir: exactly min(k, |group|) rows per group,
    partitioning-invariant, and a new salt draws a genuinely different
    (but equally sized) sample."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.sampling import reservoir_per_group

    rows = [(f"g{i % 7}", i) for i in range(500)] + [("tiny", 9001), ("tiny", 9002)]
    df = spark.createDataFrame(rows, "grp string, id long")

    def draw(data, salt):
        got = {}
        for r in reservoir_per_group(data, ("grp",), "id", k=5, salt=salt).collect():
            got.setdefault(r["grp"], set()).add(r["id"])
        return got

    base = draw(df, "0")
    sizes = df.groupBy("grp").count().collect()
    for r in sizes:
        assert len(base[r["grp"]]) == min(5, r["count"]), r
    # Partitioning invariance: same rows chosen at any layout.
    assert draw(df.repartition(13), "0") == base
    # Fresh salt = independent redraw: same sizes, different membership.
    redraw = draw(df, "epoch1")
    assert {g: len(s) for g, s in redraw.items()} == {
        g: len(s) for g, s in base.items()
    }
    assert redraw != base


def test_rp_bucket_recall_contract(spark):
    """Recall contract for the RP sign-bucket ANN path (the analogue of
    the IVF n_probes contract): a true top-5 neighbor is 'found' iff it
    collides with the query's rp_bucket.  Collision needs agreement on
    ALL out_dim sign bits, so recall is monotone NON-INCREASING in
    out_dim (each extra bit can only split buckets) — more bits buys
    smaller candidate sets at the cost of recall.  Floors measured at
    sf0.001 (0.42 at 2 bits, 0.11 at 4) pinned loosely so a regression
    in the projection or bucket derivation trips the test."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators import similarity as S
    from fotmobdatapipeline_spark.sources.registry import read_table
    from tests.conftest import SF_SMALL

    emb = read_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 40)
    truth = {}
    for r in S.brute_force_topk(queries, emb, k=5).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    total = sum(len(t) for t in truth.values())

    def recall(out_dim: int) -> float:
        buckets = {
            r["vec_id"]: r["rp_bucket"]
            for r in S.random_projection(emb, in_dim=64, out_dim=out_dim)
            .select("vec_id", "rp_bucket")
            .collect()
        }
        hits = sum(1 for q, ns in truth.items() for n in ns if buckets[q] == buckets[n])
        return hits / total

    r2, r4, r8 = recall(2), recall(4), recall(8)
    assert r2 >= r4 >= r8, (r2, r4, r8)
    assert r2 >= 0.3 and r4 >= 0.05, (r2, r4)


def test_rp_bucket_join_survives_hot_bucket_skew(spark):
    """Size-guard contract for the RP-bucket verify joins: with one
    bucket holding >=50% of all vectors (quadratic candidate blowup
    inside the hot bucket — the case where a mandatory broadcast of the
    candidate-confined arrays would OOM at scale), the hint-free verify
    must still return exactly the naive same-bucket top-k, and the plan
    must not degenerate into a cartesian/nested-loop join."""
    import itertools
    import math

    from fotmobdatapipeline_spark.operators import similarity as S

    d, out_dim = 16, 4
    mat = S.rademacher_matrix(d, out_dim)
    rows = []
    # Hot half: a strong shared direction plus deterministic jitter far
    # smaller than any projection magnitude -> identical sign pattern.
    base = [1.0 if i % 2 == 0 else -1.0 for i in range(d)]
    for v in range(60):
        rows.append((v, [base[i] + ((v * 7 + i) % 5) * 0.01 for i in range(d)]))
    # Spread half: varied directions across the remaining buckets.
    for v in range(60, 120):
        rows.append((v, [math.sin(0.7 * (v * d + i) + 0.3) for i in range(d)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def bucket(vec):
        b = 0
        for j in range(out_dim):
            y = 0.0
            for x, r in zip(vec, mat[j]):
                y += x * r
            b = b * 2 + (1 if y >= 0 else 0)
        return b

    def cos(a, b):
        num = 0.0
        for x, y in zip(a, b):
            num += x * y
        return num / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    buckets = {v: bucket(vec) for v, vec in rows}
    from collections import Counter

    hot_share = Counter(buckets.values()).most_common(1)[0][1] / len(rows)
    assert hot_share >= 0.5, f"corpus not skewed enough: {hot_share}"

    expected = sorted(
        (-cos(rows[a][1], rows[b][1]), a, b)
        for a, b in itertools.combinations(range(120), 2)
        if buckets[a] == buckets[b]
    )[:20]

    result = S.rp_bucket_topk_pairs(df, in_dim=d, out_dim=out_dim, limit=20)
    plan = result._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    got = result.collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(a, b) for _, a, b in expected]
    for r, (negc, _, _) in zip(got, expected):
        assert abs(r["cos_sim"] - (-negc)) < 1e-12


def test_ivf_kmeans_multiprobe_recall(spark):
    """Trained centroids + multiprobe compose: with k-means cells,
    recall@5 is monotone in n_probes AND the trained single-probe recall
    is at least the arbitrary-fixed-centroid single-probe recall minus
    noise — training must not make the index worse."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators import similarity as S
    from fotmobdatapipeline_spark.sources.registry import read_table
    from tests.conftest import SF_SMALL

    emb = read_table(spark, SF_SMALL, "embeddings")
    n_cells, n_q = 8, 40
    queries = emb.filter(F.col("vec_id") < n_q)
    trained = S.kmeans_lloyd(emb, k=n_cells, iterations=3)
    fixed = emb.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )

    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    truth = topk_sets(S.brute_force_topk(queries, emb, k=5))
    total = sum(len(t) for t in truth.values())

    def recall(centroids, p):
        got = topk_sets(S.ivf_topk(queries, emb, centroids, k=5, n_probes=p))
        return sum(len(got.get(q, set()) & t) for q, t in truth.items()) / total

    r_trained = [recall(trained, p) for p in (1, 2, 3)]
    assert r_trained[0] <= r_trained[1] <= r_trained[2], r_trained
    r_fixed_1 = recall(fixed, 1)
    assert r_trained[0] >= r_fixed_1 - 0.05, (r_trained[0], r_fixed_1)


@given(st.lists(st.lists(st.sampled_from(WORDS), min_size=1, max_size=150).map(" ".join), min_size=1, max_size=4))
@_settings
def test_chunk_windows_tile_any_document(spark, texts_list):
    """For ANY document: chunks reconstruct the token stream exactly —
    concatenating each chunk's first `step` tokens (all of the last
    chunk) yields the original text; chunk indices are contiguous."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.functions.chunking import chunk_windows

    size, step = 7, 5
    df = _docs_df(spark, texts_list).select(
        "doc_id", "text", F.explode(chunk_windows(F.col("text"), size, step)).alias("c")
    )
    rows = df.select("doc_id", "text", "c.chunk_idx", "c.chunk_text").collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault((r["doc_id"], r["text"]), []).append(
            (r["chunk_idx"], r["chunk_text"])
        )
    for (doc_id, text), chunks in by_doc.items():
        chunks.sort()
        assert [i for i, _ in chunks] == list(range(len(chunks)))
        rebuilt: list[str] = []
        for i, ctext in chunks[:-1]:
            rebuilt.extend(ctext.split(" ")[:step])
        rebuilt.extend(chunks[-1][1].split(" "))
        assert " ".join(rebuilt) == text


def test_prefix_filter_equals_naive_threshold_join(spark):
    from pyspark.sql import functions as F
    """Prefix filtering is LOSSLESS: at any threshold the prefix-indexed
    join + exact verify must reproduce the naive all-pairs threshold join
    exactly (doc pair, common count, and jaccard value)."""
    from fotmobdatapipeline_spark.operators.dedup import (
        jaccard_pairs,
        prefix_filter_pairs,
    )
    from fotmobdatapipeline_spark.sources.registry import read_table
    from tests.conftest import SF_SMALL

    docs = read_table(spark, SF_SMALL, "documents")
    for t in (0.4, 0.8):
        naive = {
            (r["doc_a"], r["doc_b"]): (r["common"], r["jaccard"])
            for r in jaccard_pairs(docs).filter(F.col("jaccard") >= t).collect()
        }
        fast = {
            (r["doc_a"], r["doc_b"]): (r["common"], r["jaccard"])
            for r in prefix_filter_pairs(docs, threshold=t).collect()
        }
        assert fast == naive, f"t={t}: prefix join diverged from naive join"


def test_prefix_filter_survives_stop_shingle_skew(spark):
    """Deliberate skew: one shingle in 50% of the corpus.  The df-attach
    stage must handle the hot shingle as rows (windowed count), never as
    one giant task-local posting array, and the output must still equal
    the naive threshold join exactly."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.dedup import (
        jaccard_pairs,
        prefix_filter_pairs,
    )

    rows = []
    for i in range(400):
        if i % 2 == 0:
            # Hot head: every even doc shares the 'alpha beta gamma' shingle.
            rows.append((i, f"alpha beta gamma u{i} v{i} w{i} x{i} y{i}"))
        else:
            rows.append((i, f"p{i} q{i} r{i} s{i} t{i} n{i}"))
    # Plant true near-dups on both sides of the skew.
    rows.append((1000, "alpha beta gamma u2 v2 w2 x2 z"))
    rows.append((1001, "p3 q3 r3 s3 t3 m"))
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)

    for t in (0.4, 0.7):
        naive = {
            (r["doc_a"], r["doc_b"]): (r["common"], r["jaccard"])
            for r in jaccard_pairs(docs).filter(F.col("jaccard") >= t).collect()
        }
        fast = {
            (r["doc_a"], r["doc_b"]): (r["common"], r["jaccard"])
            for r in prefix_filter_pairs(docs, threshold=t).collect()
        }
        assert fast == naive, f"t={t}: skewed prefix join diverged"
        assert fast, "skew corpus must produce at least one true pair"


def test_positional_filter_prunes_template_candidates(spark):
    """PPJoin positional filter on a template-heavy corpus: every doc
    shares a 15-word boilerplate, so the bare prefix filter admits ~all
    pairs as candidates while the true jaccard sits just UNDER the
    threshold.  The positional filter must prune (near-)all of them,
    keep every true pair (near-dup copies planted), and the final output
    must still equal the naive join."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.dedup import (
        _prefix_candidates,
        jaccard_pairs,
        prefix_filter_pairs,
    )

    template = " ".join(f"t{j}" for j in range(15))
    rows = [
        (i, template + " " + " ".join(f"u{i}x{k}" for k in range(5)))
        for i in range(200)
    ]
    # Planted near-dups: copy of doc i with the last word changed.
    for i in range(20):
        rows.append(
            (1000 + i, template + " " + " ".join(f"u{i}x{k}" for k in range(4)) + f" zz{i}")
        )
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    t = 0.6

    loose = _prefix_candidates(docs, "text", "doc_id", t, 3, positional=False).count()
    tight = _prefix_candidates(docs, "text", "doc_id", t, 3, positional=True).count()
    naive = {
        (r["doc_a"], r["doc_b"]): (r["common"], r["jaccard"])
        for r in jaccard_pairs(docs).filter(F.col("jaccard") >= t).collect()
    }
    fast = {
        (r["doc_a"], r["doc_b"]): (r["common"], r["jaccard"])
        for r in prefix_filter_pairs(docs, threshold=t).collect()
    }
    assert fast == naive, "positional-filtered join diverged from naive join"
    no_suffix = {
        (r["doc_a"], r["doc_b"]): (r["common"], r["jaccard"])
        for r in prefix_filter_pairs(docs, threshold=t, suffix=False).collect()
    }
    assert no_suffix == naive, "suffix partition bound changed the output"
    assert naive, "test corpus must contain true near-dup pairs"
    assert tight >= len(naive), "candidates must stay a superset of true pairs"
    # The point: template candidates collapse (>100x here), true pairs stay.
    assert tight < loose / 100, (tight, loose)


def test_prefix_index_is_smaller_than_full_index(spark):
    from pyspark.sql import functions as F
    """The point of the prefix filter: the indexed token count must drop
    by roughly the threshold factor vs indexing every token."""
    from fotmobdatapipeline_spark.operators.dedup import word_shingles
    from fotmobdatapipeline_spark.sources.registry import read_table
    from tests.conftest import SF_SMALL
    from pyspark.sql import Window

    docs = read_table(spark, SF_SMALL, "documents")
    tok = docs.select("doc_id", F.explode(word_shingles(F.col("text"), 3)).alias("s"))
    full = tok.count()
    t = 0.8
    dfreq = tok.groupBy("s").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "s")
    ranked = (
        tok.join(dfreq, "s")
        .withColumn("pos", F.row_number().over(w))
        .withColumn("n_sh", F.count("*").over(Window.partitionBy("doc_id")))
    )
    prefix = ranked.filter(
        F.col("pos") <= F.col("n_sh") - F.floor(F.lit(t) * F.col("n_sh")) + 1
    ).count()
    assert prefix < 0.45 * full, (prefix, full)


def test_random_projection_is_partitioning_invariant(spark):
    """The JL projection must be bit-identical regardless of partition
    layout (strict left-to-right folds, literal matrix), and the sign
    bucket must stay within the out_dim bit range."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.similarity import random_projection
    from fotmobdatapipeline_spark.sources.registry import read_table
    from tests.conftest import SF_SMALL

    emb = read_table(spark, SF_SMALL, "embeddings")
    base = {
        r["vec_id"]: (r["y0"], r["y7"], r["rp_bucket"])
        for r in random_projection(emb, in_dim=64, out_dim=8).collect()
    }
    repart = {
        r["vec_id"]: (r["y0"], r["y7"], r["rp_bucket"])
        for r in random_projection(emb.repartition(7), in_dim=64, out_dim=8).collect()
    }
    assert base == repart
    assert all(0 <= v[2] < 256 for v in base.values())


def test_semantic_dedup_invariants(spark):
    """SemDeDup verdicts: every vector gets exactly one row; each cell's
    lowest id is always kept with null max_sim_prior; a dropped vector
    really does have a smaller-id cluster-mate at cosine >= tau; and
    lowering tau can only drop MORE (kept set is monotone in tau)."""
    from fotmobdatapipeline_spark.operators.similarity import (
        kmeans_lloyd,
        semantic_dedup,
    )
    from fotmobdatapipeline_spark.sources.registry import read_table
    from tests.conftest import SF_SMALL

    emb = read_table(spark, SF_SMALL, "embeddings")
    cents = kmeans_lloyd(emb, k=4, iterations=2)
    hi = semantic_dedup(emb, cents, tau=0.35).collect()
    assert len(hi) == emb.count()
    by_cell: dict[int, list] = {}
    for r in hi:
        by_cell.setdefault(r["cell"], []).append(r)
    for cell, rows in by_cell.items():
        first = min(rows, key=lambda r: r["vec_id"])
        assert first["kept"] and first["max_sim_prior"] is None, (cell, first)
    for r in hi:
        if not r["kept"]:
            assert r["max_sim_prior"] is not None and r["max_sim_prior"] >= 0.35
        elif r["max_sim_prior"] is not None:
            assert r["max_sim_prior"] < 0.35
    lo = {r["vec_id"]: r["kept"] for r in semantic_dedup(emb, cents, tau=0.2).collect()}
    for r in hi:
        if not r["kept"]:
            assert not lo[r["vec_id"]], "tau=0.2 must drop everything tau=0.35 drops"


def test_semantic_dedup_cells_bit_equals_jvm(spark):
    """The numpy batch form (semantic_dedup_cells — the corpus-sized-k
    scale path the r13 sf10 audit forced: k=8 at 200k vectors TIMED OUT
    in the JVM join) must produce EXACTLY the JVM form's rows: cell
    assignment, max_sim_prior DOUBLE (bit-compared via struct pack),
    and verdict, across taus where both verdicts occur.  Its reductions
    are vectorized across rows/pairs but sequential across dimensions,
    so every accumulator evolves through dot()'s IEEE-754 sequence —
    the semantic_dedup_local doctrine applied to the batch operator."""
    import struct

    from fotmobdatapipeline_spark.operators.similarity import (
        kmeans_lloyd,
        semantic_dedup,
        semantic_dedup_cells,
    )
    from fotmobdatapipeline_spark.sources.registry import read_table
    from tests.conftest import SF_SMALL

    def bits(x):
        return None if x is None else struct.pack("<d", x)

    emb = read_table(spark, SF_SMALL, "embeddings")
    cents = kmeans_lloyd(emb, k=4, iterations=2)
    n = emb.count()
    survivors = {}
    for tau in (0.2, 0.3, 0.35):
        jvm = {
            r["vec_id"]: (r["cell"], bits(r["max_sim_prior"]), r["kept"])
            for r in semantic_dedup(emb, cents, tau=tau).collect()
        }
        cells = {
            r["vec_id"]: (r["cell"], bits(r["max_sim_prior"]), r["kept"])
            for r in semantic_dedup_cells(
                emb, cents, tau=tau, block_rows=37
            ).collect()
        }
        assert cells == jvm, f"tau={tau}: numpy batch form diverged from JVM"
        survivors[tau] = sum(1 for v in jvm.values() if v[2])
    # Non-vacuous: both verdicts occur at the middle tau, and block_rows
    # far below the cell size exercises the blocked triangle path.
    assert 0 < survivors[0.3] < n, "only one verdict occurred"


def test_semantic_dedup_cells_string_ids_and_guards(spark):
    """r13 ADVICE: the Arrow schemas must derive the id type from the
    source column (the JVM form accepts any orderable id) — a string id
    must round-trip with verdicts identical to the JVM form under the
    same lexicographic ordering; and block_rows < 1 must raise rather
    than silently keep everything (range(1, n, -1) is empty)."""
    import pytest

    from fotmobdatapipeline_spark.operators.similarity import (
        kmeans_lloyd,
        semantic_dedup,
        semantic_dedup_cells,
    )
    from fotmobdatapipeline_spark.sources.registry import read_table
    from tests.conftest import SF_SMALL

    emb = read_table(spark, SF_SMALL, "embeddings").limit(60)
    cents = kmeans_lloyd(emb, k=3, iterations=1)
    sid = emb.selectExpr(
        "format_string('id%05d', vec_id) AS vec_id", "embedding"
    )
    got = {
        r["vec_id"]: (r["cell"], r["kept"])
        for r in semantic_dedup_cells(sid, cents, tau=0.3).collect()
    }
    want = {
        f"id{r['vec_id']:05d}": (r["cell"], r["kept"])
        for r in semantic_dedup(emb, cents, tau=0.3).collect()
    }
    # format_string is order-isomorphic to the long ids here, so cells
    # AND verdicts must agree exactly with the bigint-id JVM run.
    assert got == want
    with pytest.raises(ValueError, match="block_rows"):
        semantic_dedup_cells(emb, cents, tau=0.3, block_rows=-5)


def test_intradoc_dedup_hand_computed(spark):
    """A doc repeating its own sentence loses the later copies; a
    sentence shared ACROSS docs survives in both (unlike the corpus-wide
    tier); every input doc yields exactly one output row."""
    from fotmobdatapipeline_spark.operators.dedup import intradoc_sentence_dedup

    docs = spark.createDataFrame(
        [
            (1, "a b c d a b c d e f g h"),  # w=2: 'a b','c d','a b','c d','e f','g h'
            (2, "a b x y"),                  # 'a b' shared with doc 1 — must survive
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in intradoc_sentence_dedup(docs, words_per_sentence=2).collect()}
    assert len(out) == 2
    assert out[1]["n_sentences"] == 6 and out[1]["n_kept"] == 4
    assert out[1]["text_intradoc"] == "a b c d e f g h"
    assert out[2]["n_sentences"] == 2 and out[2]["n_kept"] == 2
    assert out[2]["text_intradoc"] == "a b x y"


def test_bloom_filter_no_false_negatives_and_mergeable(spark):
    """Every inserted key must probe true (the Bloom guarantee), and the
    bit_or-merge of two halves' filters must equal the filter of the
    union (mergeability — per-shard filters compose without rescanning)."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.sketches import (
        bloom_filter_table,
        bloom_probe,
    )
    from fotmobdatapipeline_spark.sources.registry import read_table
    from tests.conftest import SF_SMALL

    docs = read_table(spark, SF_SMALL, "documents").select(
        "doc_id", F.col("text").alias("k")
    )
    bf = bloom_filter_table(docs, "k")
    probed = bloom_probe(bf, docs, "k").collect()
    assert probed and all(r["maybe_member"] for r in probed)

    lo = docs.filter(F.col("doc_id") % 2 == 0)
    hi = docs.filter(F.col("doc_id") % 2 == 1)
    merged = (
        bloom_filter_table(lo, "k")
        .unionByName(bloom_filter_table(hi, "k"))
        .groupBy("word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, bf.collect())
    )


def test_hll_registers_mergeable_and_estimate_sane(spark):
    """Per-register max of two halves' register tables == table of the
    union (mergeability); the raw estimate lands within the ~3 sigma
    band (sigma ~ 1.04/sqrt(64) = 13%) of the exact distinct count on a
    universe large enough for the raw regime."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.dedup import word_shingles
    from fotmobdatapipeline_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )
    from fotmobdatapipeline_spark.sources.registry import read_table
    from tests.conftest import SF_SMALL

    docs = read_table(spark, SF_SMALL, "documents")
    sh = docs.select("doc_id", F.explode(word_shingles(F.col("text"), 3)).alias("w"))
    full = hll_registers(sh, "w")
    lo = hll_registers(sh.filter(F.col("doc_id") % 2 == 0), "w")
    hi = hll_registers(sh.filter(F.col("doc_id") % 2 == 1), "w")
    merged = (
        lo.unionByName(hi).groupBy("reg_idx").agg(F.max("max_rho").alias("max_rho"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))

    est = hll_estimate(full).collect()[0]["est_distinct"]
    exact = sh.select("w").distinct().count()
    assert abs(est - exact) / exact < 0.40, (est, exact)


def test_sketch_family_ignores_null_keys(spark):
    """Every sketch builder (CMS / KMV / HLL / Bloom) ignores NULL keys
    — matching Spark's native sketch aggregates — instead of hashing
    them into NULL bucket/register rows.  Each null-bearing input must
    produce a sketch identical to the null-filtered input's sketch."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.sketches import (
        bloom_filter_table,
        bloom_probe,
        count_min_table,
        hll_registers,
        kmv_sketch,
    )

    withnulls = spark.range(0, 500).select(
        F.when(F.col("id") % 5 == 0, None).otherwise(F.col("id") % 40).alias("k")
    )
    clean = withnulls.filter(F.col("k").isNotNull())
    as_sorted = lambda df: sorted(map(tuple, df.collect()))

    for build in (
        lambda d: count_min_table(d, "k"),
        lambda d: kmv_sketch(d, "k"),
        lambda d: hll_registers(d, "k"),
        lambda d: bloom_filter_table(d, "k"),
    ):
        dirty, pure = as_sorted(build(withnulls)), as_sorted(build(clean))
        assert dirty == pure and None not in {v for row in dirty for v in row}

    # a NULL probe key is "not a member", never an error or a NULL verdict
    bf = bloom_filter_table(clean, "k")
    verdicts = bloom_probe(bf, withnulls, "k").collect()
    null_rows = [r for r in verdicts if r["k"] is None]
    assert all(r["maybe_member"] is False for r in null_rows)
    assert all(r["maybe_member"] for r in verdicts if r["k"] is not None)


def test_power_iteration_component_invariants(spark):
    """The returned component is unit-norm; the eigenvalue estimate is
    positive and non-decreasing in iteration count (power iteration
    monotonically improves the Rayleigh quotient, modulo the <1e-9
    fixed-point quantization); determinism: two runs are identical."""
    import math

    from fotmobdatapipeline_spark.operators.similarity import (
        power_iteration_top_component,
    )
    from fotmobdatapipeline_spark.sources.registry import read_table
    from tests.conftest import SF_SMALL

    emb = read_table(spark, SF_SMALL, "embeddings")
    r1 = power_iteration_top_component(emb, iterations=1).collect()
    r3 = power_iteration_top_component(emb, iterations=3).collect()
    r3b = power_iteration_top_component(emb, iterations=3).collect()
    assert sorted(map(tuple, r3)) == sorted(map(tuple, r3b))
    nrm = math.sqrt(sum(r["loading"] ** 2 for r in r3))
    assert abs(nrm - 1.0) < 1e-9
    lam1 = r1[0]["eigenvalue"]
    lam3 = r3[0]["eigenvalue"]
    assert lam1 > 0 and lam3 >= lam1 - 1e-6, (lam1, lam3)


def test_simhash_pairs_pigeonhole_recall(spark):
    """Banding is a pure candidate pruner: every pair within the Hamming
    threshold (<= n_bands - 1 flips) must survive — compare against the
    direct all-pairs Hamming join on a small corpus."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.dedup import (
        simhash_pairs,
        simhash_signatures,
    )

    base = ["the quick brown fox jumps over the lazy dog agg row"] * 4 + [
        "spark window merge sort hash join scan batch stream dup",
        "completely different tokens altogether here now ok fine yes",
    ]
    docs = _docs_df(spark, [f"{t} pad{i % 3}" for i, t in enumerate(base)])
    banded = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_pairs(docs, n_bits=16, n_bands=4, max_hamming=3).collect()
    }
    sigs = simhash_signatures(docs, n_bits=16)
    a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
    b = sigs.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
    ham = sum(
        (F.substring("sa", i, 1) != F.substring("sb", i, 1)).cast("int")
        for i in range(1, 17)
    )
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("h"))
        .filter(F.col("h") <= 3)
        .collect()
    }
    assert banded == exact  # recall 100% at the threshold AND no extras


def test_pq_codes_shape_and_adc_agrees_in_easy_cases(spark):
    """PQ invariants: every vector gets m in-range codes; exact
    duplicates of a query rank first under ADC (their reconstruction is
    identical, so the approx cosine is maximal among equals)."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_train_codebooks,
    )

    dim, m, codes = 8, 2, 2
    rng = random.Random(7)
    rows = []
    for i in range(20):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(dim)]))
    rows.append((20, list(rows[0][1])))  # exact duplicate of vec 0
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = pq_train_codebooks(vecs, dim=dim, m=m, codes=codes, iterations=2)
    assert cb.count() == m * codes
    enc = pq_encode(vecs, cb, dim=dim, m=m)
    got = {r["vec_id"]: r["codes"] for r in enc.collect()}
    assert set(got) == set(range(21))
    for cs in got.values():
        assert len(cs) == m and all(0 <= c < codes for c in cs)
    assert got[20] == got[0]  # identical vectors encode identically
    top = pq_adc_topk(
        vecs.filter(F.col("vec_id") == 0), cb, enc, dim=dim, m=m, codes=codes, k=1
    ).collect()
    # vec 20 reconstructs identically to vec 0 -> maximal approx_cos;
    # ties (other vectors sharing the codes) break on lowest id, so the
    # rank-1 neighbor's codes must equal vec 0's.
    assert len(top) == 1 and got[top[0]["neighbor_id"]] == got[0]


def test_temperature_mixture_upweights_small_groups(spark):
    """T=2 shares sum to 1 and sit between proportional and uniform:
    small groups gain share vs n_g/N, large groups lose."""
    from fotmobdatapipeline_spark.operators.sampling import (
        temperature_mixture_weights,
    )

    rows = [("big", i) for i in range(90)] + [("small", i) for i in range(10)]
    df = spark.createDataFrame(rows, "source string, x long")
    out = {
        r["source"]: r
        for r in temperature_mixture_weights(df, "source", budget=1000).collect()
    }
    shares = sum(r["share"] for r in out.values())
    assert abs(shares - 1.0) < 1e-12
    assert out["small"]["share"] > 0.10  # proportional would be exactly 0.10
    assert out["big"]["share"] < 0.90
    assert abs(out["big"]["expected_docs"] + out["small"]["expected_docs"] - 1000) < 1e-9


def test_tfidf_topterms_rarest_term_wins(spark):
    """A term unique to one document must be that document's top
    keyword (max idf beats any stop term's tf)."""
    from fotmobdatapipeline_spark.operators.retrieval import tfidf_top_terms

    docs = _docs_df(
        spark,
        [
            "the the the the zebra",
            "the the quick quick brown",
            "the quick brown fox dog",
        ],
    )
    top = {
        (r["doc_id"], r["rk"]): r["term"]
        for r in tfidf_top_terms(docs, k=2).collect()
    }
    assert top[(0, 1)] == "zebra"


def test_duplicate_passages_hand_computed(spark):
    """Two docs sharing one 8-word passage inside otherwise-unique text:
    exactly that passage (plus any window-overlap spill) is flagged in
    both; a fully-unique doc reports zero; a doc repeating its own
    passage twice is flagged via the within-doc occurrence rule."""
    from fotmobdatapipeline_spark.operators.dedup import duplicate_passage_stats

    shared = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 words
    docs = _docs_df(
        spark,
        [
            f"u0 u1 u2 {shared} u3 u4",            # doc 0: 8 dup of 14
            f"v0 {shared} v1 v2 v3 v4 v5",          # doc 1: 8 dup of 15
            "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9",        # doc 2: unique
            f"{shared} {shared}",                    # doc 3: all 16 dup
            "short doc",                             # doc 4: < gram_len
        ],
    )
    out = {r["doc_id"]: r for r in duplicate_passage_stats(docs, gram_len=8).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    assert (out[0]["dup_words"], out[0]["n_dup_spans"]) == (8, 1)
    assert (out[1]["dup_words"], out[1]["n_dup_spans"]) == (8, 1)
    assert (out[2]["dup_words"], out[2]["n_dup_spans"]) == (0, 0)
    # doc 3: every 8-window of the 16 words repeats?  The rolling windows
    # crossing the boundary occur once — but windows [0..8] == [8..16]
    # start positions 0 and 8 duplicate, covering 0..7 and 8..15: all 16.
    assert (out[3]["dup_words"], out[3]["n_dup_spans"]) == (16, 1)
    assert out[3]["dup_frac"] == 1.0
    assert (out[4]["dup_words"], out[4]["n_dup_spans"]) == (0, 0)
    assert out[4]["n_words"] == 2


def test_source_overlap_matrix_hand_computed(spark):
    """3 copies of doc X in src A, 2 in src B; 1 unique doc in B:
    pairs(A,A)=3, pairs(A,B)=6, pairs(B,B)=1 — from counting arithmetic
    only, no materialized pairs."""
    from fotmobdatapipeline_spark.operators.dedup import source_overlap_matrix

    x, u = "alpha beta gamma", "totally unique text"
    rows = [(0, x, "A"), (1, x, "A"), (2, x, "A"), (3, x, "B"), (4, x, "B"),
            (5, u, "B")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        (r["source_a"], r["source_b"]): r["dup_pairs"]
        for r in source_overlap_matrix(df).collect()
    }
    assert out == {("A", "A"): 3, ("A", "B"): 6, ("B", "B"): 1}


def test_incremental_passages_hand_computed(spark):
    """A batch doc lifting a corpus passage is flagged; a batch doc
    repeating its own passage is flagged by the within-batch rule; a
    unique batch doc is clean even when the corpus has internal dups."""
    from fotmobdatapipeline_spark.operators.dedup import incremental_passage_stats

    p1 = "alpha bravo charlie delta echo foxtrot golf hotel"   # in corpus
    p2 = "india juliet kilo lima mike nov oscar papa"          # batch-only
    corpus = _docs_df(spark, [f"c0 c1 {p1} c2", "c3 c4 c5 c6 c7 c8 c9 c10"])
    batch = _docs_df(
        spark,
        [
            f"b0 {p1} b1 b2",       # lifts the corpus passage (index rule)
            f"{p2} {p2}",            # self-repeat, gram absent from corpus
            "u0 u1 u2 u3 u4 u5 u6 u7 u8",  # clean
        ],
    )
    out = {r["doc_id"]: r for r in incremental_passage_stats(corpus, batch, gram_len=8).collect()}
    assert set(out) == {0, 1, 2}
    assert (out[0]["dup_words"], out[0]["n_dup_spans"]) == (8, 1)
    assert out[1]["dup_words"] == 16 and out[1]["dup_frac"] == 1.0
    assert (out[2]["dup_words"], out[2]["n_dup_spans"]) == (0, 0)


def test_trim_agrees_with_passage_stats(spark):
    """The applied trim and the stats view of the same detection must
    agree document-by-document: n_kept == n_words - dup_words."""
    from fotmobdatapipeline_spark.operators.dedup import (
        duplicate_passage_stats,
        trim_duplicate_passages,
    )
    from fotmobdatapipeline_spark.sources.registry import read_table
    from tests.conftest import SF_SMALL

    docs = read_table(spark, SF_SMALL, "documents")
    stats = {
        r["doc_id"]: r for r in duplicate_passage_stats(docs, gram_len=8).collect()
    }
    trims = {
        r["doc_id"]: r for r in trim_duplicate_passages(docs, gram_len=8).collect()
    }
    assert set(stats) == set(trims)
    for d in stats:
        assert trims[d]["n_kept"] == stats[d]["n_words"] - stats[d]["dup_words"], d
        assert trims[d]["n_words"] == stats[d]["n_words"], d


def test_histogram_quantile_within_bucket_width(spark):
    """The fixed-bucket histogram estimate stays within one bucket width
    of the exact PERCENTILE_CONT *on this pinned dataset*.  Since the
    r7 alignment both sides target the SAME rank (n-1)*q + 1, so there
    is no systematic rank-convention offset; residual error is bucket
    coarseness, plus (still not a universal invariant) a large value
    gap straddling a bucket boundary can legitimately exceed one width.
    On the pinned sf0.01 lineitem data the bound holds; if the fixture
    is regenerated and this fails, loosen to 2*width before suspecting
    the estimator."""
    from tests.conftest import SF_ORACLE
    from fotmobdatapipeline_spark.plans.catalog import QUERIES, _load_all

    _load_all()
    rows = QUERIES["sketch_histogram_quantiles"].builder(spark, SF_ORACLE).collect()
    assert len(rows) == 6
    for r in rows:
        assert abs(r["err"]) <= 5000.0, r


def test_keep_best_picks_cluster_member_with_max_diversity(spark):
    """dedup_cluster_keep_best must keep a document that (a) belongs to
    the cluster and (b) has the cluster's max diversity, with min-id
    tiebreak — checked against an independent pandas recomputation on a
    hand-built frame with exact dup pairs and a diversity tie."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.functions.text import distinct_word_ratio
    from fotmobdatapipeline_spark.operators.dedup import (
        connected_dup_clusters,
        lsh_band_pairs,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [
            (0, "aa bb aa bb"),            # dup pair {0,1}: diversity 0.5 each -> keep 0
            (1, "aa bb aa bb"),
            (2, "cc dd ee ff"),            # singleton, diversity 1.0
            (3, "gg gg gg hh ii"),         # dup pair {3,4} by identical text
            (4, "gg gg gg hh ii"),
        ],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(docs, num_hashes=4)
    pairs = lsh_band_pairs(sigs, num_hashes=4, rows_per_band=1)
    reps = connected_dup_clusters(pairs)
    lab = (
        docs.select("doc_id", distinct_word_ratio(F.col("text")).alias("div"))
        .join(reps, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
            "div",
        )
    )
    best = (
        lab.groupBy("cluster_id")
        .agg(F.max(F.struct(F.col("div"), (-F.col("doc_id")).alias("n"))).alias("b"))
        .select("cluster_id", (-F.col("b.n")).alias("kept"), F.col("b.div").alias("bd"))
        .collect()
    )
    members = {}
    for r in lab.collect():
        members.setdefault(r["cluster_id"], []).append((r["doc_id"], r["div"]))
    for r in best:
        grp = members[r["cluster_id"]]
        want = min(
            (d for d, v in grp if v == max(v for _, v in grp)),
        )
        assert r["kept"] == want, (r, grp)
        assert (r["kept"], r["bd"]) in grp


def test_bm25_wide_matches_narrow_on_same_query(spark):
    """bm25_topk_wide on the narrow entry's own 3-term query must
    return the same ranked documents as the per-term-column bm25_topk
    (addition ORDER differs — fixed query order vs sorted-term fold —
    so scores may differ in the last ulp; ranking and near-equality
    are the contract)."""
    from fotmobdatapipeline_spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_wide,
    )
    from fotmobdatapipeline_spark.sources.registry import read_table
    from tests.conftest import SF_ORACLE

    docs = read_table(spark, SF_ORACLE, "documents")
    terms = ["dup", "vector", "key"]
    narrow = bm25_topk(docs, terms, k=10).collect()
    wide = bm25_topk_wide(docs, terms, k=10).collect()
    assert [r["doc_id"] for r in narrow] == [r["doc_id"] for r in wide]
    for a, b in zip(narrow, wide):
        assert abs(a["score"] - b["score"]) < 1e-12 * max(1.0, abs(a["score"]))


def test_containment_catches_quote_that_jaccard_dilutes(spark):
    """A small doc quoted whole inside a much larger one: containment of
    the small doc must be 1.0 while symmetric Jaccard is far below —
    the asymmetric coefficient's reason to exist.  Both directions
    present; container-side containment = |A∩B|/|container| small."""
    from fotmobdatapipeline_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
    )

    quote = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(30))
    df = spark.createDataFrame(
        [(0, quote), (1, quote + " " + filler)],
        "doc_id long, text string",
    )
    cont = {
        (r["contained"], r["container"]): r["containment"]
        for r in containment_pairs(df).collect()
    }
    assert cont[(0, 1)] == 1.0
    assert cont[(1, 0)] < 0.1
    jac = {r["doc_a"]: r["jaccard"] for r in jaccard_pairs(df).collect()}
    assert jac[0] < 0.1  # symmetric measure dilutes the full quote


def test_cluster_safe_split_never_splits_a_cluster(spark):
    """The leakage invariant behind split_cluster_safe: every member of
    a near-dup cluster lands in the SAME split (a near-duplicate of a
    training doc can never reach test).  Recomputed per-doc on the
    sf0.01 corpus: group doc-level split assignments by cluster rep and
    assert one distinct split per rep; also all three splits occur."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.sampling import hash_bucket_256
    from fotmobdatapipeline_spark.plans.llmdata import _dup_cluster_reps_shared
    from fotmobdatapipeline_spark.sources.registry import read_table
    from tests.conftest import SF_ORACLE

    docs = read_table(spark, SF_ORACLE, "documents")
    reps = _dup_cluster_reps_shared(spark, SF_ORACLE)
    lab = (
        docs.select("doc_id")
        .join(reps, "doc_id", "left")
        .select("doc_id", F.coalesce("cluster_id", F.col("doc_id")).alias("rep"))
    )
    bucket = hash_bucket_256(F.col("rep"))
    split = (
        F.when(bucket < 205, F.lit("train"))
        .when(bucket < 230, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    per_doc = lab.select("rep", split.alias("split"))
    spans = (
        per_doc.groupBy("rep")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert spans == 0
    assert per_doc.select("split").distinct().count() == 3


def test_kfold_partitions_disjoint_and_complete(spark):
    """split_kfold's folds must partition the corpus: every doc in
    exactly one fold, fold counts summing to the corpus size, and fold
    fate stable under repartition."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_ORACLE
    from fotmobdatapipeline_spark.operators.sampling import hash_bucket_256
    from fotmobdatapipeline_spark.sources.registry import read_table

    docs = read_table(spark, SF_ORACLE, "documents")
    fold = (hash_bucket_256(F.col("doc_id")) % 5).cast("int")
    a = docs.select("doc_id", fold.alias("fold"))
    b = docs.repartition(13).select("doc_id", fold.alias("fold"))
    assert sorted(a.collect()) == sorted(b.collect())
    n = docs.count()
    assert a.count() == n
    assert a.select("doc_id").distinct().count() == n
    assert a.filter((F.col("fold") < 0) | (F.col("fold") >= 5)).count() == 0


def test_running_sum_correct_on_join_sourced_input(spark):
    """Regression pin for the round-5 running_sum bug: with a
    full-outer-join lineage (row order nondeterministic across
    evaluations), the offsets aggregate and the final join used to
    re-execute repartitionByRange with DIFFERENT sampled boundaries —
    offsets from one partitioning joined to rows of another, silently
    corrupting most prefix sums.  The operator now checkpoints the
    partitioned frame; this test drives the exact triggering lineage
    (join -> checkpoint -> chained running_sum) and checks every row
    against a Python fold, twice."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.prefix import running_sum

    a = spark.createDataFrame(
        [((i * 37) % 911 / 7.0, 1 + i % 3) for i in range(911)], "v double, x long"
    ).groupBy("v").agg(F.sum("x").alias("nc"))
    b = spark.createDataFrame(
        [((i * 53) % 1201 / 7.0, 1 + i % 5) for i in range(1201)], "v double, y long"
    ).groupBy("v").agg(F.sum("y").alias("nb"))
    m = (
        a.join(b, "v", "full")
        .select(
            "v",
            F.coalesce("nc", F.lit(0)).alias("nc"),
            F.coalesce("nb", F.lit(0)).alias("nb"),
        )
        .localCheckpoint(eager=False)
    )
    mm = sorted((r["v"], r["nc"], r["nb"]) for r in m.collect())
    tc, tb = {}, {}
    c = d = 0
    for v, nc, nb in mm:
        c += nc
        d += nb
        tc[v], tb[v] = c, d
    for _ in range(2):
        cum = running_sum(
            running_sum(m, ["v"], "nc", out_col="cnc"), ["v"], "nb", out_col="cnb"
        )
        rows = [(r["v"], r["cnc"], r["cnb"]) for r in cum.collect()]
        assert len(rows) == len(mm)
        assert all(tc[v] == cc for v, cc, _ in rows)
        assert all(tb[v] == bb for v, _, bb in rows)


def test_ewm_null_semantics_match_oracle(spark, duck):
    """events_ewm_value on NULL-bearing data: both engines drop NULL
    frame elements and yield NULL (never DIVIDE_BY_ZERO, never NaN) for
    an all-NULL frame.  The driver tables carry no NULL values, so this
    edge is pinned here on a synthetic table."""
    import math

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    sdf = spark.range(0, 16).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") < 12, F.lit(1)).otherwise(F.lit(2)).alias("user_id"),
        F.when(
            (F.col("id") % 3 != 0) & (F.col("id") < 12), F.col("id").cast("double")
        ).alias("value"),
    )
    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-9, 0)
    vals = F.collect_list(F.col("value").cast("double")).over(w)
    fold = F.aggregate(vals, F.lit(0.0), lambda a, b: a * F.lit(0.5) + b)
    norm = F.lit(2.0) * (F.lit(1.0) - F.pow(F.lit(0.5), F.size(vals).cast("double")))
    ewm = F.when(F.size(vals) > 0, fold / norm)
    sres = {r.event_id: r.e for r in sdf.select("event_id", ewm.alias("e")).collect()}

    duck.execute(
        """CREATE OR REPLACE TABLE ewm_null_events AS
           SELECT i AS event_id,
                  CASE WHEN i < 12 THEN 1 ELSE 2 END AS user_id,
                  CASE WHEN i % 3 <> 0 AND i < 12 THEN CAST(i AS DOUBLE) END AS value
           FROM range(16) t(i)"""
    )
    dres = dict(
        duck.execute(
            """WITH fr AS (
                 SELECT event_id,
                        list(CAST(value AS DOUBLE))
                          FILTER (WHERE value IS NOT NULL) OVER (
                          PARTITION BY user_id ORDER BY event_id
                          ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS vs
                 FROM ewm_null_events)
               SELECT event_id, CASE WHEN len(vs) > 0 THEN
                        list_reduce(list_prepend(CAST(0 AS DOUBLE), vs),
                                    (a, b) -> a * CAST(0.5 AS DOUBLE) + b)
                        / (CAST(2 AS DOUBLE)
                           * (CAST(1 AS DOUBLE) - pow(CAST(0.5 AS DOUBLE), len(vs))))
                      END AS e
               FROM fr"""
        ).fetchall()
    )
    assert len(sres) == 16
    for k, v in sres.items():
        assert not (isinstance(v, float) and math.isnan(v))
        assert v == dres[k]
    assert sres[0] is None and sres[12] is None  # empty / all-null frames


def test_blocklist_hits_counts_occurrences(spark):
    """Blocklist semantics: every OCCURRENCE counts (not distinct
    grams), overlapping occurrences each count, multi-length phrases
    match in one pass, clean docs emit no row."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.dedup import blocklist_hits

    docs = spark.createDataFrame(
        [
            (1, "bad bad bad word here"),       # "bad bad" x2 (overlap), "bad word" x1
            (2, "totally clean text"),
            (3, "really bad word and bad word"),  # "bad word" x2
            (4, "bad"),                          # shorter than any phrase
        ],
        "doc_id long, text string",
    )
    phrases = spark.createDataFrame(
        [("bad bad",), ("bad word",), ("never present phrase",)], "phrase string"
    )
    got = {
        r["doc_id"]: (r["n_hits"], r["n_phrases"])
        for r in blocklist_hits(docs, phrases).collect()
    }
    assert got == {1: (3, 2), 3: (2, 1)}


def test_blocklist_empty_phrase_table_yields_no_hits(spark):
    """An empty blocklist (no configured phrases yet) must yield zero
    hits, not an ARRAY<VOID> analysis crash — both batch and the
    streaming expression."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.dedup import blocklist_hits
    from fotmobdatapipeline_spark.streaming.documents import blocklist_flags_expr

    docs = spark.createDataFrame([(1, "some text here")], "doc_id long, text string")
    empty = spark.createDataFrame([], "phrase string")
    assert blocklist_hits(docs, empty).count() == 0
    row = docs.select(blocklist_flags_expr(F.col("text"), []).alias("s")).collect()[0]
    assert (row["s"]["n_hits"], row["s"]["n_phrases"]) == (0, 0)


# ---------------------------------------------------------------------------
# Preference: Spark's decimal BTL path must equal an arbitrary-precision
# Python replay on ANY battle log (including ties and extreme counts).
# ---------------------------------------------------------------------------
_MODELS = ["m1", "m2", "m3", "m4"]

battles_strat = st.lists(
    st.tuples(
        st.sampled_from(_MODELS),
        st.sampled_from(_MODELS),
        st.sampled_from(_MODELS + ["tie"]),
    ).filter(lambda t: t[0] != t[1]),
    min_size=3,
    max_size=12,
)


def _btl_replay_from_battles(rows, iters, unit):
    from collections import defaultdict

    w = defaultdict(int)
    for a, b, winner in rows:
        lo, hi = min(a, b), max(a, b)
        if winner == lo:
            w[(lo, hi, 0)] += 1
        elif winner == hi:
            w[(lo, hi, 1)] += 1
        else:  # non-decisive: excluded from the matrix
            w[(lo, hi)] += 0
    mat = []
    for lo, hi in {(k[0], k[1]) for k in w}:
        w1, w2 = w.get((lo, hi, 0), 0), w.get((lo, hi, 1), 0)
        n = w1 + w2 + 2
        mat.append((lo, hi, n, w1 + 1))
        mat.append((hi, lo, n, w2 + 1))
    models = sorted({m for m, *_ in mat})
    w_tot = {m: 0 for m in models}
    for m, _, _, wx in mat:
        w_tot[m] += wx
    p = {m: unit for m in models}
    for _ in range(iters):
        den = {m: 0 for m in models}
        for m, o, n_pair, _ in mat:
            den[m] += (n_pair * unit * unit) // (p[m] + p[o])
        pn = {m: (w_tot[m] * unit * unit) // den[m] for m in models}
        s = sum(pn.values())
        p = {m: (pn[m] * len(models) * unit) // s for m in models}
    return p


@_settings
@given(battles_strat)
def test_btl_matches_arbitrary_precision_replay(spark, rows):
    from fotmobdatapipeline_spark.operators.preference import (
        UNIT,
        btl_ratings,
        pairwise_win_matrix,
    )

    b = spark.createDataFrame(
        rows, "model_a string, model_b string, winner string"
    )
    got = {
        r["model"]: r["rating_micro"]
        for r in btl_ratings(pairwise_win_matrix(b), iters=4).collect()
    }
    want = _btl_replay_from_battles(rows, iters=4, unit=UNIT)
    assert got == want


# ---------------------------------------------------------------------------
# K-core: Spark peeling must equal a direct Python fixpoint replay.
# ---------------------------------------------------------------------------
edges_strat = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(lambda e: e[0] != e[1]),
    min_size=2,
    max_size=16,
)


def _kcore_replay(edges, k, rounds):
    adj = {}
    und = set()
    for a, b in edges:
        und.add((min(a, b), max(a, b)))
    es = {(a, b) for a, b in und} | {(b, a) for a, b in und}
    for _ in range(rounds):
        deg = {}
        for a, _b in es:
            deg[a] = deg.get(a, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        es = {(a, b) for a, b in es if a in keep and b in keep}
    deg = {}
    for a, _b in es:
        deg[a] = deg.get(a, 0) + 1
    return {(n, d) for n, d in deg.items() if d >= k}


@_settings
@given(edges_strat)
def test_kcore_matches_python_replay(spark, edges):
    from fotmobdatapipeline_spark.operators.graph import kcore

    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        (r["doc_id"], r["core_deg"])
        for r in kcore(pairs, k=2, rounds=4).collect()
    }
    assert got == _kcore_replay(edges, k=2, rounds=4)


def test_grouped_running_sum_matches_per_group_window(spark):
    """grouped_running_sum must equal Window.partitionBy(group)
    .orderBy exactly, at any partition count — including groups that
    straddle range-partition boundaries and single-row groups."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.prefix import grouped_running_sum

    rows = [((i * 31) % 7, (i * 7919) % 500, i % 11 + 1) for i in range(4000)]
    rows += [(99, 0, 5)]  # single-row group
    df = (
        spark.createDataFrame(rows, "g long, k long, v long")
        .withColumn("rid", F.monotonically_increasing_id())
    )
    w = (
        Window.partitionBy("g")
        .orderBy("k", "rid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = sorted(
        df.withColumn("running", F.sum("v").over(w))
        .select("g", "k", "rid", "running")
        .collect()
    )
    for n_parts in (1, 3, 32):
        got = sorted(
            grouped_running_sum(df, ["g"], ["k", "rid"], "v", n_parts=n_parts)
            .select("g", "k", "rid", "running")
            .collect()
        )
        assert got == want, n_parts


def test_kaplan_meier_matches_reference_implementation(spark, tmp_path):
    """events_survival_km against a from-scratch Python KM on a
    synthetic fixture with every edge: converters at the same duration,
    never-converters (censored), a user whose first event IS a
    purchase (duration 0), and censoring times interleaved with
    events."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.plans.catalog import QUERIES, _load_all

    day = 86_400_000_000
    base = 1_700_000_000_000_000
    rows, eid = [], 0

    def add(u, tus, et):
        nonlocal eid
        eid += 1
        rows.append((eid, tus, u, et, 1.0, "{}"))

    # u1: purchase on day 0; u2/u3: purchase day 2; u4: purchase day 5;
    # u5, u6: never purchase (censored at corpus end, day 9).
    add(1, base, "purchase")
    for u in (2, 3):
        add(u, base, "view")
        add(u, base + 2 * day, "purchase")
    add(4, base, "view")
    add(4, base + 5 * day, "purchase")
    for u in (5, 6):
        add(u, base, "view")
        add(u, base + 3 * day, "click")
    add(1, base + 9 * day, "view")  # stretches the corpus end

    df = spark.createDataFrame(
        rows, "event_id long, tus long, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id", F.timestamp_micros("tus").alias("ts"), "user_id",
        "event_type", "value", "props",
    )
    out = tmp_path / "km"
    df.coalesce(1).write.parquet(str(out / "events.parquet"))

    _load_all()
    got = {
        r["duration_days"]: (
            r["n_risk"], r["n_events"], r["n_censored"], r["survival"]
        )
        for r in QUERIES["events_survival_km"].builder(spark, str(out)).collect()
    }

    # Reference KM: durations {0: d1, 2: d2, 5: d1, 9: c2}.
    want = {}
    at_risk, surv = 6, 1.0
    for dur, (d, c) in sorted({0: (1, 0), 2: (2, 0), 5: (1, 0), 9: (0, 2)}.items()):
        surv = surv * (1.0 - d / at_risk)
        want[dur] = (at_risk, d, c, surv)
        at_risk -= d + c
    assert got == want


@given(
    st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)),
        min_size=1,
        max_size=20,
    )
)
@_settings
def test_label_propagation_matches_union_find(spark, edges):
    """On any small graph, fixed-round min-label propagation with
    rounds >= node count must equal true connected components (min node
    id per component), checked against a pure-Python union-find."""
    from fotmobdatapipeline_spark.operators.graph import min_label_propagation

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}

    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["component"]
        for r in min_label_propagation(pairs, rounds=15).collect()
    }
    assert got == want


@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 8)),
        min_size=0,
        max_size=80,
    )
)
@_settings
def test_dominated_pair_weight_matches_bruteforce(spark, pts):
    """operators/ordinal.dominated_pair_weight (the distributed
    merge-sort dominance kernel behind events_kendall_tau) must equal
    the O(n^2) brute-force count on arbitrary small point multisets —
    including heavy ties in either coordinate and the R < 2 degenerate.
    With shuffle.partitions=8 the wide-level window path only engages
    above 4*8 blocks, so the large-rank test below covers it; this one
    exercises the grouped-scan path and the mixed tie handling."""
    from collections import Counter

    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.ordinal import dominated_pair_weight

    cnt = Counter(pts)
    xs = sorted({x for x, _ in cnt})
    xr = {x: i for i, x in enumerate(xs)}
    cells = [(xr[x], y, m) for (x, y), m in cnt.items()]
    brute = sum(
        ma * mb
        for (ra, ya, ma) in cells
        for (rb, yb, mb) in cells
        if ra < rb and ya < yb
    )
    if cells:
        df = spark.createDataFrame(cells, "rk0 bigint, y bigint, w bigint")
    else:
        df = spark.range(0).select(
            F.lit(0).cast("bigint").alias("rk0"),
            F.lit(0).cast("bigint").alias("y"),
            F.lit(0).cast("bigint").alias("w"),
        )
    got = dominated_pair_weight(df, "rk0", "y", "w", len(xs)).collect()[0][0]
    assert got == brute


def test_dominated_pair_weight_wide_path(spark):
    """Force the wide-level window path: with shuffle.partitions=8 the
    cut is 32 blocks, so 512 distinct ranks put levels 1..3 on the
    window path and 4..9 on the grouped scan — both must compose to the
    brute-force total."""
    import random

    from fotmobdatapipeline_spark.operators.ordinal import dominated_pair_weight

    rng = random.Random(11)
    cells = [(r, rng.randint(0, 9), rng.randint(1, 3)) for r in range(512)]
    brute = sum(
        ma * mb
        for (ra, ya, ma) in cells
        for (rb, yb, mb) in cells
        if ra < rb and ya < yb
    )
    df = spark.createDataFrame(cells, "rk0 bigint, y bigint, w bigint")
    got = dominated_pair_weight(df, "rk0", "y", "w", 512).collect()[0][0]
    assert got == brute


def test_kendall_identity_holds(spark):
    """events_kendall_tau invariant: n0 = C + D + n1 + n2 - n_xy (the
    inclusion-exclusion identity the discordant count rides on), checked
    on the sf0.001 events table against scipy-free brute force."""
    from tests.conftest import SF_SMALL

    from fotmobdatapipeline_spark.plans.catalog import QUERIES, _load_all

    _load_all()
    row = QUERIES["events_kendall_tau"].builder(spark, SF_SMALL).collect()[0]
    n0 = row["n"] * (row["n"] - 1) // 2
    # d_pairs was DERIVED from the identity, so re-check C and D against
    # the direct pair definition instead of the identity itself.
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    from pyspark.sql import functions as F

    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum((F.col("value").cast("decimal(12,2)") * 100).cast("bigint")).alias("s"),
            F.count("*").alias("c"),
        )
        .collect()
    )
    pts = [(r["s"], r["c"]) for r in pu]
    c_b = sum(
        1
        for i in range(len(pts))
        for j in range(i + 1, len(pts))
        if (pts[i][0] - pts[j][0]) * (pts[i][1] - pts[j][1]) > 0
    )
    d_b = sum(
        1
        for i in range(len(pts))
        for j in range(i + 1, len(pts))
        if (pts[i][0] - pts[j][0]) * (pts[i][1] - pts[j][1]) < 0
    )
    assert row["c_pairs"] == c_b
    assert row["d_pairs"] == d_b
    tx_b = sum(
        1
        for i in range(len(pts))
        for j in range(i + 1, len(pts))
        if pts[i][0] == pts[j][0]
    )
    ty_b = sum(
        1
        for i in range(len(pts))
        for j in range(i + 1, len(pts))
        if pts[i][1] == pts[j][1]
    )
    txy_b = sum(
        1
        for i in range(len(pts))
        for j in range(i + 1, len(pts))
        if pts[i] == pts[j]
    )
    assert row["ties_x"] == tx_b
    assert row["ties_y"] == ty_b
    assert n0 == c_b + d_b + tx_b + ty_b - txy_b


def test_geo_banded_join_equals_bruteforce(spark):
    """geo_neighbor_pairs' 3x3 cell fan-out is complete: with band width
    == R, |dlat| <= R implies adjacent-or-same cells, so the banded join
    must equal the unbanded O(n^2) join exactly (same pairs, no dups)."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.plans.advanced import _GEO_R2, _geo_col
    from fotmobdatapipeline_spark.plans.catalog import QUERIES, _load_all
    from fotmobdatapipeline_spark.sources.registry import read_table
    from tests.conftest import SF_SMALL

    _load_all()
    got = {
        (r["c_nationkey"], r["n_pairs"], r["n_customers"])
        for r in QUERIES["geo_neighbor_pairs"].builder(spark, SF_SMALL).collect()
    }
    c = read_table(spark, SF_SMALL, "customer").select(
        "c_custkey",
        "c_nationkey",
        _geo_col("lat", F.col("c_custkey")).alias("clat"),
        _geo_col("lon", F.col("c_custkey")).alias("clon"),
    )
    s = read_table(spark, SF_SMALL, "supplier").select(
        _geo_col("lat", F.concat(F.lit("s"), F.col("s_suppkey"))).alias("slat"),
        _geo_col("lon", F.concat(F.lit("s"), F.col("s_suppkey"))).alias("slon"),
    )
    d2 = (F.col("clat") - F.col("slat")) * (F.col("clat") - F.col("slat")) + (
        F.col("clon") - F.col("slon")
    ) * (F.col("clon") - F.col("slon"))
    brute = {
        (r["c_nationkey"], r["n_pairs"], r["n_customers"])
        for r in c.crossJoin(s)
        .filter(d2 <= F.lit(_GEO_R2))
        .groupBy("c_nationkey")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.countDistinct("c_custkey").cast("bigint").alias("n_customers"),
        )
        .collect()
    }
    assert got == brute and got


def test_ams_sketch_is_mergeable_and_sane(spark):
    """sketch_ams_f2's counters are linear: the sketch of two disjoint
    halves sums, component-wise, to the sketch of the whole — the
    mergeability the map-side-combinable claim rests on.  Also pin the
    estimator's 5-wise-median sanity: est within 10x of exact F2 on the
    real table (a loose bound; AMS guarantees relative error in
    expectation, not per-draw)."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.plans.catalog import QUERIES, _load_all
    from fotmobdatapipeline_spark.sources.registry import read_table
    from tests.conftest import SF_SMALL

    _load_all()
    full = QUERIES["sketch_ams_f2"].builder(spark, SF_SMALL).collect()[0]
    assert full["f2_est"] <= 10 * full["f2_exact"]
    assert full["f2_est"] >= full["f2_exact"] / 10

    ev = read_table(spark, SF_SMALL, "events")

    def sketch(df):
        from fotmobdatapipeline_spark.plans.llmdata import _AMS_DEPTH

        def sign(i):
            h = F.md5(F.concat(F.lit(f"ams{i}:"), F.col("user_id").cast("string")))
            return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % 2) * 2 - 1

        return df.agg(
            *[F.sum(sign(i)).cast("bigint").alias(f"z{i}") for i in range(_AMS_DEPTH)]
        ).collect()[0]

    whole = sketch(ev)
    a = sketch(ev.filter(F.col("event_id") % 2 == 0))
    b = sketch(ev.filter(F.col("event_id") % 2 == 1))
    for i in range(5):
        assert a[f"z{i}"] + b[f"z{i}"] == whole[f"z{i}"]


def test_position_attribution_conserves_credit(spark):
    """events_attribution_position invariant: every converting user
    contributes exactly 1.0 total credit (40/20/40 weights sum to 1 for
    any path length), so summed channel credits must equal the number
    of users with >= 1 purchase up to float fold error."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.plans.catalog import QUERIES, _load_all
    from fotmobdatapipeline_spark.sources.registry import read_table
    from tests.conftest import SF_SMALL

    _load_all()
    rows = QUERIES["events_attribution_position"].builder(spark, SF_SMALL).collect()
    total = sum(r["credit"] for r in rows)
    conv = (
        read_table(spark, SF_SMALL, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .count()
    )
    assert abs(total - conv) < 1e-9 * max(conv, 1)


def test_session_sweepline_matches_bruteforce(spark):
    """events_session_sweepline vs a driver-side brute-force sweep over
    the same session intervals at sf0.001: peak, peak start, and covered
    wall-clock must match exactly (the distributed prefix-scan sweep is
    an exact algorithm, not an estimate)."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.plans.catalog import QUERIES, _load_all
    from fotmobdatapipeline_spark.plans.events import _session_numbered
    from fotmobdatapipeline_spark.sources.registry import read_table
    from tests.conftest import SF_SMALL

    _load_all()
    got = QUERIES["events_session_sweepline"].builder(spark, SF_SMALL).collect()[0]
    sess = (
        _session_numbered(read_table(spark, SF_SMALL, "events"))
        .groupBy("user_id", "session_id")
        .agg(F.min("tus").alias("s"), (F.max("tus") + 1).alias("e"))
        .collect()
    )
    deltas: dict[int, int] = {}
    for r in sess:
        deltas[r["s"]] = deltas.get(r["s"], 0) + 1
        deltas[r["e"]] = deltas.get(r["e"], 0) - 1
    ts = sorted(deltas)
    active, peak, peak_t, covered = 0, 0, None, 0
    for i, t in enumerate(ts):
        active += deltas[t]
        if active > peak:
            peak, peak_t = active, t
        if active >= 1 and i + 1 < len(ts):
            covered += ts[i + 1] - t
    assert got["n_sessions"] == len(sess)
    assert got["peak_concurrency"] == peak
    assert got["peak_start_us"] == peak_t
    assert got["covered_us"] == covered


def test_prefix_recompute_gate_classifies_plans(spark):
    """r14: grouped_running_sum checkpoints its INPUT before the
    repartitionByRange (whose boundary-sampling pass recomputes the full
    input lineage) only when that lineage contains shuffle/fan-out
    nodes; a checkpointed leaf or leaf + row-local ops must NOT pay an
    extra persist.  Pin the gate's classification on both plan classes
    and the value-identity of the expensive-input path."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.operators.prefix import (
        _recompute_is_expensive,
        grouped_running_sum,
    )
    from tests.conftest import SF_ORACLE

    pq = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    base = pq.select(
        (F.col("l_orderkey") % 5).alias("g"),
        F.col("l_orderkey").alias("k"),
        (F.col("l_linenumber") % 7 + 1).alias("v"),
    ).limit(200)
    leaf = base.localCheckpoint(eager=False)
    assert not _recompute_is_expensive(leaf)
    assert not _recompute_is_expensive(leaf.select("g", "k", "v"))
    assert not _recompute_is_expensive(leaf.filter(F.col("v") > 1))
    # Shuffle/fan-out over a FILE source: expensive (the sampling pass
    # would re-run the scan + aggregate).
    agg = base.groupBy("g", "k").agg(F.sum("v").alias("v"))
    assert _recompute_is_expensive(agg)
    assert _recompute_is_expensive(base.join(
        base.select(F.col("g").alias("g2")), F.col("g") == F.col("g2")))
    # The same shapes over already-persisted leaves re-evaluate as one
    # cheap pass over executor-local blocks: NOT worth an extra persist
    # (the dominance kernel's level expansion over checkpointed cells).
    assert not _recompute_is_expensive(
        leaf.groupBy("g").agg(F.sum("v").alias("v")))
    assert not _recompute_is_expensive(leaf.join(
        leaf.select(F.col("g").alias("g2")), F.col("g") == F.col("g2")))

    # Value identity through the gated path (aggregate input -> the
    # operator checkpoints it) vs the plain-window truth.
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy("k").rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = sorted(
        agg.withColumn("running", F.sum("v").over(w))
        .select("g", "k", "running").collect()
    )
    got = sorted(
        grouped_running_sum(agg, ["g"], ["k"], "v")
        .select("g", "k", "running").collect()
    )
    assert got == want
