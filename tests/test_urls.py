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


def test_url_host_default_port_is_scheme_aware(spark):
    df = spark.createDataFrame(
        [("http://h.com:443/x",), ("https://h.com:80/x",)], "url string"
    )
    got = [r["h"] for r in df.select(url_host(F.col("url")).alias("h")).collect()]
    # 443 is NOT default for http (kept); 80 is NOT default for https (kept)
    assert got == ["h.com:443", "h.com:80"]
