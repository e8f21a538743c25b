"""Z-order clustering (operators/zorder.py): Morton math, write layout,
and the measurable file-skipping win over single-column sorting."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_interleave_bits_known_values(spark):
    from fotmobdatapipeline_spark.operators.zorder import interleave_bits

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 3), (5, 2)], "a long, b long"
    ).select("a", "b", interleave_bits(F.col("a"), F.col("b"), 4).alias("z"))
    got = {(r["a"], r["b"]): r["z"] for r in df.collect()}
    # Morton: a takes even bit positions, b odd.
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(3, 3)] == 15
    # 5=101, 2=010 -> z = 1<<0 | 1<<5 | 1<<4 wait: a bits 0,2 -> pos 0,4; b bit 1 -> pos 3
    assert got[(5, 2)] == (1 << 0) + (1 << 3) + (1 << 4)


def _events_long(spark):
    from fotmobdatapipeline_spark.sources.registry import read_table

    return read_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "value"
    )


def test_zorder_roundtrip_lossless(spark, tmp_path):
    from fotmobdatapipeline_spark.operators.zorder import write_zordered

    ev = _events_long(spark)
    out = str(tmp_path / "z")
    write_zordered(ev, out, "user_id", "ts_us", n_files=16)
    back = spark.read.parquet(out)
    assert sorted(back.columns) == sorted(ev.columns)
    assert sorted(back.collect()) == sorted(ev.collect())


def test_zorder_skips_more_files_than_linear_sort(spark, tmp_path):
    from fotmobdatapipeline_spark.operators.zorder import (
        files_matching_box,
        write_zordered,
    )

    ev = _events_long(spark)
    n_files = 64
    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "linear")
    write_zordered(ev, zdir, "user_id", "ts_us", n_files=n_files)
    # The single-dimension layout a time-series table would naturally have:
    ev.repartitionByRange(n_files, "ts_us").sortWithinPartitions(
        "ts_us"
    ).write.mode("overwrite").parquet(ldir)

    lo_u, hi_u, lo_t, hi_t = ev.select(
        F.min("user_id"), F.max("user_id"), F.min("ts_us"), F.max("ts_us")
    ).first()
    du, dt = (hi_u - lo_u) // 8, (hi_t - lo_t) // 8

    # The query a time-sorted layout is WORST at: a user slab over all
    # time.  Every time-sorted file spans all users -> zero pruning;
    # z-ordered files are spatial rectangles, so most miss the slab.
    user_slab = {"user_id": (lo_u + 3 * du, lo_u + 4 * du)}
    z_hit, z_total = files_matching_box(zdir, user_slab)
    l_hit, l_total = files_matching_box(ldir, user_slab)
    assert z_total == n_files and l_total == n_files
    assert l_hit == n_files  # linear layout reads everything
    assert z_hit <= n_files // 2, (z_hit, l_hit)

    # A 2-D box (user 1/8 x time 1/2): both dims prune, z wins >= 2x.
    box = {
        "user_id": (lo_u + 3 * du, lo_u + 4 * du),
        "ts_us": (lo_t, lo_t + 4 * dt),
    }
    z_box, _ = files_matching_box(zdir, box)
    l_box, _ = files_matching_box(ldir, box)
    assert z_box <= l_box // 2, (z_box, l_box)

    # The tradeoff, stated: on a pure-time query the time-sorted layout
    # is optimal and z-order is merely competitive (it spends half its
    # bits clustering users).
    time_only = {"ts_us": (lo_t + 3 * dt, lo_t + 4 * dt)}
    z_t, _ = files_matching_box(zdir, time_only)
    l_t, _ = files_matching_box(ldir, time_only)
    assert z_t <= max(3 * l_t, n_files // 2), (z_t, l_t)


def test_zorder_correct_results_after_pruned_scan(spark, tmp_path):
    from fotmobdatapipeline_spark.operators.zorder import write_zordered

    ev = _events_long(spark)
    out = str(tmp_path / "z")
    write_zordered(ev, out, "user_id", "ts_us", n_files=16)
    lo_u, hi_u = 10, 40
    got = (
        spark.read.parquet(out)
        .filter((F.col("user_id") >= lo_u) & (F.col("user_id") <= hi_u))
        .agg(F.count("*").alias("n"), F.sum("event_id").alias("s"))
        .first()
    )
    want = (
        ev.filter((F.col("user_id") >= lo_u) & (F.col("user_id") <= hi_u))
        .agg(F.count("*").alias("n"), F.sum("event_id").alias("s"))
        .first()
    )
    assert (got["n"], got["s"]) == (want["n"], want["s"])


def test_zone_maps_hash_layout_skips_nothing(spark):
    """layout_zone_maps' point of contrast: the identical 1995-H1
    predicate evaluated against zone maps of an md5-HASH layout skips
    zero shards (every hash shard spans the whole date range), while the
    time-partitioned layout the entry ships skips most of them."""
    from pyspark.sql import functions as F

    from fotmobdatapipeline_spark.plans.catalog import QUERIES, _load_all
    from fotmobdatapipeline_spark.sources.registry import read_table
    from tests.conftest import SF_SMALL

    _load_all()
    ranged = QUERIES["layout_zone_maps"].builder(spark, SF_SMALL).collect()
    assert sum(1 for r in ranged if r["skip_ship"]) > 0
    assert sum(1 for r in ranged if not r["skip_ship"]) > 0  # H1-95 shards read

    li = read_table(spark, SF_SMALL, "lineitem")
    hashed = (
        li.select(
            (
                F.conv(F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 4), 16, 10)
                .cast("bigint")
                % 8
            ).alias("shard"),
            "l_shipdate",
        )
        .groupBy("shard")
        .agg(F.min("l_shipdate").alias("dmin"), F.max("l_shipdate").alias("dmax"))
        .select(
            (
                (F.col("dmax") < F.lit("1995-01-01").cast("date"))
                | (F.col("dmin") > F.lit("1995-06-30").cast("date"))
            ).alias("skip_ship")
        )
        .collect()
    )
    assert all(not r["skip_ship"] for r in hashed)
