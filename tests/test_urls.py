"""URL canonicalization edge cases the synthetic catalog URLs don't
reach: scheme-less values, https default port, NON-default ports kept,
single-label hosts, tracker-only queries, public-suffix domains."""

from __future__ import annotations

from pyspark.sql import functions as F

from fotmobdatapipeline_spark.functions.urls import (
    canonicalize_url,
    registrable_domain,
    url_host,
)


def _canon(spark, urls: list[str]) -> list[str | None]:
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    return [r["c"] for r in rows]


def test_canonicalize_url_normalizations(spark):
    got = _canon(
        spark,
        [
            "HTTP://WWW.Example.COM:80/A/b/?utm_source=x&z=1&a=2#frag",
            "https://example.com:443/",
            "https://example.com:8443/x",  # non-default port KEPT
            "http://example.com/path///",
            "http://example.com/?utm_campaign=c&fbclid=f&gclid=g&ref=r",
            "ftp://Files.Example.com:21/pub",  # unknown scheme: port kept
            "http://example.com/page#sec?a=1",  # '?' INSIDE fragment: no query
        ],
    )
    assert got == [
        "http://www.example.com/A/b?a=2&z=1",  # path case preserved, params sorted
        "https://example.com",
        "https://example.com:8443/x",
        "http://example.com/path",
        "http://example.com",  # all params were trackers
        "ftp://files.example.com:21/pub",
        "http://example.com/page",  # fragment dropped, '?' inside it too
    ]


def test_canonicalize_url_rejects_non_absolute(spark):
    assert _canon(spark, ["not a url", "/relative/path", "example.com/x"]) == [
        None,
        None,
        None,
    ]


def test_canonical_equivalence_classes(spark):
    """Decorated variants of one page collapse to a single canonical key."""
    variants = [
        "http://Blog.Example.com/post/7?id=7&utm_source=rss",
        "HTTP://blog.example.COM:80/post/7/?id=7",
        "http://blog.example.com/post/7?id=7#comments",
    ]
    assert len(set(_canon(spark, variants))) == 1


def test_registrable_domain_rules(spark):
    df = spark.createDataFrame(
        [
            ("blog.example.co.uk",),
            ("a.b.example.com",),
            ("example.com",),
            ("co.uk",),  # the suffix itself: only 2 labels -> unchanged
            ("localhost",),
            ("news.example.com:8443",),  # port never fragments the domain
            ("user@sub.example.co.uk",),  # userinfo stripped too
        ],
        "host string",
    )
    got = [
        r["d"]
        for r in df.select(registrable_domain(F.col("host")).alias("d")).collect()
    ]
    assert got == [
        "example.co.uk",
        "example.com",
        "example.com",
        "co.uk",
        "localhost",
        "example.com",
        "example.co.uk",
    ]


def test_url_dedup_stream_collapses_decorated_recrawls(spark, tmp_path):
    """Streaming URL dedup: decorated re-crawls of one page collapse to
    a single survivor per watermark horizon; unparseable URLs pass
    through untouched; the batch degradation keeps one row per
    canonical key."""
    from fotmobdatapipeline_spark.streaming.documents import url_dedup_stream

    rows = [
        (1, "http://E.com/p?id=1&utm_source=a", "2024-01-01 10:00:00"),
        (2, "HTTP://e.com:80/p/?id=1", "2024-01-01 10:05:00"),  # same page
        (3, "http://e.com/p?id=1#frag", "2024-01-01 10:10:00"),  # same page
        (4, "http://e.com/q?id=2", "2024-01-01 10:15:00"),
        (5, "not a url", "2024-01-01 10:20:00"),  # passes through
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, ts_s string").select(
        "doc_id", "url", F.col("ts_s").cast("timestamp").alias("ts")
    )

    # batch degradation
    got = url_dedup_stream(df, ts_col="ts")
    ids = sorted(r["doc_id"] for r in got.collect())
    assert len(ids) == 3 and 4 in ids and 5 in ids
    assert len([i for i in ids if i in (1, 2, 3)]) == 1

    # real stream: one micro-batch per file
    src = tmp_path / "src"
    src.mkdir()
    df.coalesce(1).write.parquet(str(src / "b0"))
    stream = spark.readStream.schema(df.schema).parquet(str(src) + "/*")
    q = (
        url_dedup_stream(stream, ts_col="ts")
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "sink"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    landed = sorted(
        r["doc_id"] for r in spark.read.parquet(str(tmp_path / "sink")).collect()
    )
    assert len(landed) == 3 and 4 in landed and 5 in landed

    # batch keeps the DETERMINISTIC first copy: earliest ts wins
    batch_kept = {r["doc_id"] for r in url_dedup_stream(df, ts_col="ts").collect()}
    assert batch_kept == {1, 4, 5}  # doc 1 is the 10:00 crawl

    # a stream without ts_col must raise, not grow state forever
    import pytest

    stream2 = spark.readStream.schema(df.schema).parquet(str(src) + "/*")
    with pytest.raises(ValueError, match="unbounded"):
        url_dedup_stream(stream2)


def test_url_host_default_port_is_scheme_aware(spark):
    df = spark.createDataFrame(
        [("http://h.com:443/x",), ("https://h.com:80/x",)], "url string"
    )
    got = [r["h"] for r in df.select(url_host(F.col("url")).alias("h")).collect()]
    # 443 is NOT default for http (kept); 80 is NOT default for https (kept)
    assert got == ["h.com:443", "h.com:80"]


def test_registrable_domains_psl_table(spark):
    """PSL-as-data (VERDICT r8 #7): a suffix NOT in the static list
    (com.mx) resolves through the table; a 3-label suffix wins over a
    2-label one (longest match); a host that IS a suffix has no
    registrable part; unlisted hosts fall back to the default rule."""
    from fotmobdatapipeline_spark.functions.urls import registrable_domains

    psl = spark.createDataFrame(
        [("com.mx",), ("co.uk",), ("k12.or.us",), ("or.us",)], "suffix string"
    )
    hosts = [
        "shop.example.com.mx",        # table-only 2-label suffix
        "user@blog.example.co.uk:81", # userinfo+port stripped, listed suffix
        "school.district.k12.or.us",  # 3-label beats the or.us 2-label rule
        "portal.or.us",               # 2-label suffix
        "com.mx",                     # host IS a suffix: unchanged
        "news.example.com",           # default rule: last two labels
        "localhost",                  # single label: unchanged
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    out = registrable_domains(df, "host", psl_df=psl)
    got = {r["host"]: r["registrable_domain"] for r in out.collect()}
    assert got == {
        "shop.example.com.mx": "example.com.mx",
        "user@blog.example.co.uk:81": "example.co.uk",
        "school.district.k12.or.us": "district.k12.or.us",
        "portal.or.us": "portal.or.us",
        "com.mx": "com.mx",
        "news.example.com": "example.com",
        "localhost": "localhost",
    }
    # Scale shape: every PSL join is a broadcast hash join (the PSL is
    # model-sized data); the host side never shuffles.
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan


def test_registrable_domains_without_table_matches_static(spark):
    """psl_df=None must be byte-identical to the static-list column
    function on every host shape."""
    from fotmobdatapipeline_spark.functions.urls import registrable_domains

    hosts = ["a.b.co.uk", "x.com", "single", "p.q.r.com.br", "u@h.net:9"]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {
        r["host"]: r["registrable_domain"]
        for r in registrable_domains(df, "host").collect()
    }
    want = {
        r["host"]: r["rd"]
        for r in df.select(
            "host", registrable_domain(F.col("host")).alias("rd")
        ).collect()
    }
    assert got == want


def test_registrable_domains_derives_depth_from_table(spark):
    """Default max_suffix_labels=None must derive the depth range from
    the PSL table so 4-label suffixes (the real PSL ships many) resolve
    instead of silently falling through to the default rule."""
    from fotmobdatapipeline_spark.functions.urls import registrable_domains

    psl = spark.createDataFrame(
        [("s3.dualstack.eu-west-1.amazonaws.com",), ("co.uk",)], "suffix string"
    )
    df = spark.createDataFrame(
        [("bucket.s3.dualstack.eu-west-1.amazonaws.com",), ("a.b.co.uk",)],
        "host string",
    )
    got = {
        r["host"]: r["registrable_domain"]
        for r in registrable_domains(df, "host", psl_df=psl).collect()
    }
    assert got == {
        "bucket.s3.dualstack.eu-west-1.amazonaws.com":
            "bucket.s3.dualstack.eu-west-1.amazonaws.com",
        "a.b.co.uk": "b.co.uk",
    }
