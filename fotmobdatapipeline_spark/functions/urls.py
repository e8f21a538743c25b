"""URL canonicalization and domain extraction — the web-corpus hygiene
layer of a crawl-scale training-data pipeline (CommonCrawl-style
dedup keys: one canonical form per page, registrable-domain mixing
caps).  Reference surface: SURVEY.md §2's LLM-data-pipeline extension
(the reference itself has no web-corpus path).

All pure native expressions (regexp + array ops — JVM-side, inside
whole-stage codegen; no Python UDFs), so canonicalization of 100 TB of
URLs is a map-only stage that never leaves Tungsten, and every rule has
a value-exact DuckDB twin in plans/llmdata.py.

Canonical form implemented (the widely used safe subset):

* scheme and host lowercased (RFC 3986 §6.2.2.1 case normalization);
  the path keeps its case (paths are case-sensitive);
* default port stripped (``:80`` for http, ``:443`` for https — RFC
  3986 §6.2.3);
* trailing slashes stripped from the path (``/a/`` == ``/a``; root
  becomes the empty path);
* the fragment dropped (never sent to the server);
* tracking parameters removed (``utm_*``, ``fbclid``, ``gclid``,
  ``ref``) and the surviving query parameters SORTED — parameter order
  is almost never semantic, and sorting makes equivalent URLs
  byte-identical dedup keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Parameters that never change page content — the classic tracker list.
TRACKING_PARAM_RE = "^(utm_[a-z]+|fbclid|gclid|ref)="

# Second-level public suffixes the simplified registrable-domain rule
# recognizes (the full public-suffix list is data, not code — a
# production deployment broadcast-joins the PSL table; this static set
# keeps the operator dependency-free and the oracle exact).
SECOND_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "gov.uk", "ac.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "co.in", "co.nz", "com.br", "com.cn",
)

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
# lazy [^#]*? cannot cross a '#', so a '?' that appears only inside the
# fragment is NOT a query ('http://e.com/p#sec?a=1' has no query)
_QUERY_RE = r"^[^#]*?\?([^#]*)"


def url_scheme(url: Column) -> Column:
    """Lowercased scheme ('' when the value is not an absolute URL)."""
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def url_host(url: Column) -> Column:
    """Lowercased authority with the scheme's default port stripped."""
    raw = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    scheme = url_scheme(url)
    return (
        F.when(scheme == "http", F.regexp_replace(raw, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(raw, ":443$", ""))
        .otherwise(raw)
    )


def url_path(url: Column) -> Column:
    """Path with trailing slashes stripped (root → empty string); case
    preserved."""
    return F.regexp_replace(F.regexp_extract(url, _PATH_RE, 1), "/+$", "")


def url_query_canonical(url: Column) -> Column:
    """Query string with tracking parameters removed and the survivors
    sorted; '' when nothing survives."""
    params = F.split(F.regexp_extract(url, _QUERY_RE, 1), "&")
    kept = F.filter(
        params, lambda p: (~p.rlike(TRACKING_PARAM_RE)) & (p != F.lit(""))
    )
    return F.array_join(F.array_sort(kept), "&")


def canonicalize_url(url: Column) -> Column:
    """One canonical byte string per equivalent URL — the dedup key.
    NULL for values that don't parse as absolute URLs (no scheme)."""
    q = url_query_canonical(url)
    canon = F.concat(
        url_scheme(url),
        F.lit("://"),
        url_host(url),
        url_path(url),
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )
    return F.when(url_scheme(url) == "", F.lit(None)).otherwise(canon)


def registrable_domain(host: Column) -> Column:
    """The owner-registered domain of a hostname: last two labels,
    or last THREE when the final two form a recognized second-level
    public suffix ('blog.example.co.uk' → 'example.co.uk').  A bare
    single-label host is returned unchanged.  Userinfo and ports are
    stripped first, so an authority like 'user@news.example.com:8443'
    still maps to 'example.com' rather than a phantom
    'example.com:8443' domain."""
    host = F.regexp_replace(
        F.regexp_replace(host, "^[^@]*@", ""), ":[0-9]+$", ""
    )
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    is_2l_suffix = last2.isin(*SECOND_LEVEL_SUFFIXES)
    return (
        F.when(n <= 1, host)
        .when((n >= 3) & is_2l_suffix, last3)
        .otherwise(last2)
    )


def _last_labels(parts: Column, k: int) -> Column:
    """The last ``k`` labels of a split hostname, dot-joined.
    try_element_at because ANSI mode raises on out-of-bounds; callers
    must still guard k <= size(parts) — concat_ws SKIPS the resulting
    nulls, so an unguarded short host would alias a shallower suffix."""
    return F.concat_ws(
        ".", *[F.try_element_at(parts, F.lit(-i)) for i in range(k, 0, -1)]
    )


def registrable_domains(
    df: DataFrame,
    host_col: str = "host",
    psl_df: DataFrame | None = None,
    out_col: str = "registrable_domain",
    max_suffix_labels: int | None = None,
) -> DataFrame:
    """Attach the registrable domain of ``host_col`` — the PSL-as-data
    production path of :func:`registrable_domain`.

    ``psl_df`` is the public-suffix list AS A TABLE (one column
    ``suffix``, e.g. 'com.mx', 'co.uk', 'k12.or.us'), the way a real
    deployment ships it (the PSL is data that changes monthly, not
    code).  The PSL algorithm — longest matching suffix wins, default
    rule '*' when nothing matches — becomes one LEFT broadcast join per
    suffix depth 2..max (the PSL is ~10k rows, a genuinely model-sized
    broadcast; each join is map-side, so at 100 TB this stays a
    scan-speed stage with zero shuffles) and a depth-priority CASE: a
    k-label suffix match makes the registrable domain the last k+1
    labels; no match falls back to the default rule (last two labels);
    a host that IS a suffix, or a single label, is returned unchanged.

    ``max_suffix_labels=None`` (default) derives the depth range from
    the TABLE itself — one model-sized aggregate, the blocklist_hits
    convention — so the real PSL's 4- and 5-label suffixes
    (s3.dualstack.…amazonaws.com) resolve instead of silently falling
    through to the default rule.  Pass an int only to deliberately cap
    depth.

    ``psl_df=None`` keeps the dependency-free static behavior
    (:data:`SECOND_LEVEL_SUFFIXES` via :func:`registrable_domain`).
    """
    if psl_df is None:
        return df.withColumn(out_col, registrable_domain(F.col(host_col)))
    if max_suffix_labels is None:
        max_suffix_labels = (
            psl_df.agg(
                F.max(F.size(F.split(F.col("suffix"), r"\."))).alias("m")
            ).collect()[0]["m"]
            or 1
        )
    bare = F.regexp_replace(
        F.regexp_replace(F.col(host_col), "^[^@]*@", ""), ":[0-9]+$", ""
    )
    parts = F.split(bare, r"\.")
    n = F.size(parts)
    out = df.withColumn("__rd_parts", parts).withColumn("__rd_n", n)
    matched = []
    for k in range(max_suffix_labels, 1, -1):
        flag = f"__rd_sfx{k}"
        side = F.broadcast(
            psl_df.where(F.size(F.split(F.col("suffix"), r"\.")) == k)
            .select(F.col("suffix").alias(flag))
            .distinct()
        )
        key = F.when(
            F.col("__rd_n") >= k, _last_labels(F.col("__rd_parts"), k)
        )  # NULL (never matches) when the host has fewer labels
        out = out.join(side, key == F.col(flag), "left")
        matched.append((k, flag))
    expr = F.when(F.col("__rd_n") <= 1, _last_labels(F.col("__rd_parts"), 1))
    for k, flag in matched:  # deepest suffix first = longest-match-wins
        expr = expr.when(
            F.col(flag).isNotNull() & (F.col("__rd_n") > k),
            _last_labels(F.col("__rd_parts"), k + 1),
        ).when(
            F.col(flag).isNotNull(),  # host IS the suffix: no registrable part
            _last_labels(F.col("__rd_parts"), k),
        )
    expr = expr.otherwise(_last_labels(F.col("__rd_parts"), 2))
    return out.withColumn(out_col, expr).drop(
        "__rd_parts", "__rd_n", *[flag for _, flag in matched]
    )
