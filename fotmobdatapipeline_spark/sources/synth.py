"""Deterministic synthetic scale generator: TPC-H-ish tables at sf >= 1,
schema-identical to the driver testdata, produced entirely inside Spark.

Purpose: scale evidence beyond the sf0.1 testdata.  sf0.1 fits in one
pandas process' cache — the single-threaded reference engine's best case
and Spark's worst (fixed job overhead dominates).  The bench's scale
section regenerates the star-build comparison at sf1-class volume, where
the data-parallel plan must win.

Design for the generator itself (it is also a 100 TB pattern — "make
data where the workers are"):
* ``spark.range(n, numPartitions=p)`` is an embarrassingly parallel
  source — no shuffle, no driver data, each task synthesizes its slice;
* every column derives from ``xxhash64(key, tag)`` arithmetic — fully
  deterministic across runs/partitionings, so the output is reproducible
  and reusable (a marker file skips regeneration);
* values are written straight to parquet with the testdata's column
  names and physical types, so every catalog query and the pandas
  baseline run unmodified against the generated directory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# v4: the events table joined the layout (v3 embeddings, v2 documents) —
# older cached dirs regenerate so every scale query finds its table.
# The marker alone is necessary but not sufficient: a dir written by a
# code version that knew fewer tables carries a valid older marker, so
# completeness is ALSO checked table-by-table (_TABLES) on every call.
_MARKER = "_SPARK_GRAFT_SYNTH_COMPLETE_V4"

_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "documents", "embeddings", "events",
)

_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
_TYPES = ("ECONOMY ANODIZED", "LARGE BRUSHED", "MEDIUM POLISHED",
          "PROMO BURNISHED", "SMALL PLATED", "STANDARD TIN")
_MATERIALS = ("BRASS", "COPPER", "NICKEL", "STEEL", "TIN")
_NATIONS = (
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
    "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
    "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA",
    "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM",
    "UNITED STATES",
)
_REGIONS = ("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
# Word soup matching the driver testdata's documents vocabulary shape
# (short engine-flavored tokens), so shingle/LSH densities at sf1 are
# comparable to the sf0.1 table the headline numbers come from.
_DOC_WORDS = (
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "merge", "batch", "spark", "line", "sort", "window", "the",
    "a", "join", "shuffle", "plan", "query", "disk", "cache", "codegen",
    "filter", "group", "stream", "state", "sink",
)


def _hmod(key, tag: str, m: int) -> F.Column:
    """Deterministic bucket in [0, m) per (row, tag).  pmod, not abs+%:
    abs(Long.MIN_VALUE) is still negative in Java two's complement, so
    with probability 2^-64 per (row, tag) an abs-based modulo goes
    negative and element_at gets an illegal index <= 0 (a runtime error
    under ANSI).  pmod is non-negative for every input."""
    return F.pmod(F.xxhash64(key, F.lit(tag)), F.lit(m))


def _pick(key, tag: str, values) -> F.Column:
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (_hmod(key, tag, len(values)) + 1).cast("int"))


def _money(key, tag: str, lo_cents: int, hi_cents: int) -> F.Column:
    cents = _hmod(key, tag, hi_cents - lo_cents) + lo_cents
    return (cents / F.lit(100.0)).cast("double")


def _date_ms(key, tag: str, start: str = "1992-01-01", days: int = 2400) -> F.Column:
    d = F.date_add(F.lit(start).cast("date"), _hmod(key, tag, days).cast("int"))
    # NTZ to match the driver testdata's timezone-less physical type.
    return d.cast("timestamp_ntz")


def generate_scale_tables(
    spark: SparkSession,
    sf: float,
    path: str,
    partitions: int = 32,
    force: bool = False,
    tables: tuple[str, ...] | None = None,
    doc_vocab: int | None = None,
) -> str:
    """Materialize region/nation/customer/supplier/part/orders/lineitem
    at scale factor ``sf`` under ``path`` (one parquet dataset per table,
    same layout as the driver testdata).  Idempotent: a marker file makes
    later calls a no-op, so the bench amortizes generation across runs.

    ``tables`` restricts generation to a subset (VERDICT r11 #6: the
    sf10 slow-tail probe needs only events/documents/embeddings — at
    sf10 the full lineitem would be 60M rows of dead weight).  Each
    table's DataFrame construction below is lazy, so skipped tables
    cost nothing; already-written tables (per-table _SUCCESS) are not
    rewritten unless ``force``.

    ``doc_vocab`` (opt-in; default keeps the legacy 30-word list so
    sf1 bench corpora stay byte-comparable across rounds) widens the
    documents vocabulary to N words.  The fixed 30-word list SATURATES
    the 3-gram shingle space at 27k distinct shingles, so shingle df
    grows LINEARLY with corpus size (measured: avg df 9.6 at sf0.1 →
    1709 at sf10) — a density no real corpus has (Heaps' law: vocab
    grows ~n^0.4-0.6) and one that makes every lossless
    posting-list-driven join degenerate by construction.  sf10-class
    probes of the dedup tier should pass a Heaps-consistent vocab
    (~170 at sf10 reproduces sf0.1's shingle density)."""
    want = set(tables if tables is not None else _TABLES)
    unknown = want - set(_TABLES)
    if unknown:
        raise ValueError(f"unknown synth tables: {sorted(unknown)}")
    marker = os.path.join(path, _MARKER)

    # The marker records the GENERATION PARAMETERS, not just completion:
    # a dir populated at a different sf (all tables stale) or with a
    # different documents vocabulary (documents stale — the r12 sweep
    # hit exactly this: a legacy-vocab corpus silently reused for a
    # doc_vocab=170 probe) must regenerate, not return stale data.
    def _read_marker() -> dict[str, str] | None:
        try:
            with open(marker) as fh:
                return dict(ln.strip().split("=", 1) for ln in fh if "=" in ln)
        except OSError:
            return None

    rec = _read_marker()
    vocab_tag = str(doc_vocab) if doc_vocab is not None else "legacy"
    marker_fresh = rec is not None and rec.get("sf") == str(sf)
    # Pre-V5 markers recorded only sf; treat their documents vocab as
    # legacy (the only vocab that existed when they were written).
    docs_fresh = marker_fresh and rec.get("doc_vocab", "legacy") == vocab_tag

    def _done(t: str) -> bool:
        if t == "documents" and not docs_fresh:
            return False
        return os.path.exists(os.path.join(path, f"{t}.parquet", "_SUCCESS"))

    if marker_fresh and all(_done(t) for t in want) and not force:
        return path
    os.makedirs(path, exist_ok=True)
    skip_existing = marker_fresh and not force

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_orders = int(1_500_000 * sf)
    lines_per_order = 4  # ~6M lineitems at sf1, TPC-H's average

    def write(df: DataFrame, name: str) -> None:
        if name not in want or (skip_existing and _done(name)):
            return
        df.write.mode("overwrite").parquet(os.path.join(path, f"{name}.parquet"))

    region = spark.createDataFrame(
        [(i, r) for i, r in enumerate(_REGIONS)], "r_regionkey int, r_name string"
    )
    write(region, "region")

    nation = spark.createDataFrame(
        [(i, n, i % len(_REGIONS)) for i, n in enumerate(_NATIONS)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    write(nation, "nation")

    cust = spark.range(1, n_cust + 1, numPartitions=partitions).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.format_string("%09d", "id")).alias("c_name"),
        _hmod(F.col("id"), "cn", len(_NATIONS)).cast("int").alias("c_nationkey"),
        _money(F.col("id"), "cb", -99999, 999999).alias("c_acctbal"),
        _pick(F.col("id"), "cs", _SEGMENTS).alias("c_mktsegment"),
    )
    write(cust, "customer")

    supp = spark.range(1, n_supp + 1, numPartitions=partitions).select(
        F.col("id").alias("s_suppkey"),
        F.concat(F.lit("Supplier#"), F.format_string("%09d", "id")).alias("s_name"),
        _hmod(F.col("id"), "sn", len(_NATIONS)).cast("int").alias("s_nationkey"),
        _money(F.col("id"), "sb", -99999, 999999).alias("s_acctbal"),
    )
    write(supp, "supplier")

    part = spark.range(1, n_part + 1, numPartitions=partitions).select(
        F.col("id").alias("p_partkey"),
        F.concat(_pick(F.col("id"), "pw1", _MATERIALS), F.lit(" "),
                 _pick(F.col("id"), "pw2", _TYPES)).alias("p_name"),
        F.concat(F.lit("Brand#"),
                 ((_hmod(F.col("id"), "pb", 5)) + 1).cast("string"),
                 ((_hmod(F.col("id"), "pb2", 5)) + 1).cast("string")).alias("p_brand"),
        F.concat(_pick(F.col("id"), "pt", _TYPES), F.lit(" "),
                 _pick(F.col("id"), "pm", _MATERIALS)).alias("p_type"),
        ((_hmod(F.col("id"), "ps", 50)) + 1).cast("int").alias("p_size"),
        _money(F.col("id"), "pr", 90000, 200000).alias("p_retailprice"),
    )
    write(part, "part")

    orders = spark.range(1, n_orders + 1, numPartitions=partitions).select(
        F.col("id").alias("o_orderkey"),
        (_hmod(F.col("id"), "oc", n_cust) + 1).alias("o_custkey"),
        _pick(F.col("id"), "os", ("F", "O", "P")).alias("o_orderstatus"),
        _money(F.col("id"), "ot", 100000, 50000000).alias("o_totalprice"),
        _date_ms(F.col("id"), "od").alias("o_orderdate"),
        _pick(F.col("id"), "op", _PRIORITIES).alias("o_orderpriority"),
    )
    write(orders, "orders")

    li_ids = spark.range(0, n_orders * lines_per_order, numPartitions=partitions)
    okey = (F.col("id") / lines_per_order).cast("long") + 1
    li = li_ids.select(
        okey.alias("l_orderkey"),
        (_hmod(F.col("id"), "lp", n_part) + 1).alias("l_partkey"),
        (_hmod(F.col("id"), "ls", n_supp) + 1).alias("l_suppkey"),
        (F.col("id") % lines_per_order + 1).cast("int").alias("l_linenumber"),
        ((_hmod(F.col("id"), "lq", 50)) + 1).cast("double").alias("l_quantity"),
        _money(F.col("id"), "le", 100000, 10000000).alias("l_extendedprice"),
        ((_hmod(F.col("id"), "ld", 11)) / F.lit(100.0)).cast("double").alias("l_discount"),
        ((_hmod(F.col("id"), "lt", 9)) / F.lit(100.0)).cast("double").alias("l_tax"),
        _pick(F.col("id"), "lr", ("R", "A", "N")).alias("l_returnflag"),
        _pick(F.col("id"), "ll", ("O", "F")).alias("l_linestatus"),
        _date_ms(F.col("id"), "lsd").alias("l_shipdate"),
    )
    write(li, "lineitem")

    # documents: the LLM-pipeline scale table (driver testdata ships it
    # only up to sf0.1 — the dedup/selection operators need sf1-class
    # volume for the same "outgrow one core" evidence the star build
    # gets).  Same schema/word-soup shape as the testdata; ~15% of docs
    # share a text SEED with their 13-block leader, planting exact
    # duplicate clusters for the dedup tier to find.
    n_docs = int(50_000 * sf)
    doc_words = list(_DOC_WORDS)
    if doc_vocab is not None and doc_vocab > len(doc_words):
        doc_words += [f"w{i:04d}" for i in range(doc_vocab - len(doc_words))]
    vocab = F.array(*[F.lit(w) for w in doc_words])
    ids = spark.range(0, n_docs, numPartitions=partitions)
    dup = _hmod(F.col("id"), "ddup", 7) == 0
    seed = F.when(dup, F.col("id") - F.pmod(F.col("id"), F.lit(13))).otherwise(
        F.col("id")
    )
    length = (_hmod(seed, "dlen", 130) + 30).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), length),
        lambda i: F.element_at(
            vocab,
            (F.pmod(F.xxhash64(seed, F.lit("dw"), i), F.lit(len(doc_words))) + 1)
            .cast("int"),
        ),
    )
    text = F.array_join(words, " ")
    docs = ids.select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        _pick(seed, "dlang", ("en", "en", "en", "de", "fr")).alias("lang"),
        F.concat(F.lit("src"), _hmod(F.col("id"), "dsrc", 10).cast("string")).alias(
            "source"
        ),
        F.length(text).cast("long").alias("n_chars"),  # testdata ships int64
    )
    write(docs, "documents")

    # embeddings: label-clustered 64-dim float32 vectors (centroid per
    # label ± per-vector noise, both pure hash arithmetic) — the ANN /
    # semantic-dedup tier's scale table, same schema as the testdata.
    n_vecs = int(20_000 * sf)
    dims = F.sequence(F.lit(0), F.lit(63))
    vecs = spark.range(0, n_vecs, numPartitions=partitions).select(
        F.col("id").alias("vec_id"),
        _hmod(F.col("id"), "el", 10).cast("int").alias("label"),
    )
    centroid = lambda d: (
        F.pmod(F.xxhash64(F.col("label"), F.lit("ec"), d), F.lit(200)) - 100
    ) / F.lit(1000.0)
    noise = lambda d: (
        F.pmod(F.xxhash64(F.col("vec_id"), F.lit("en"), d), F.lit(2000)) - 1000
    ) / F.lit(10000.0)
    emb = F.transform(dims, lambda d: (centroid(d) + noise(d)).cast("float"))
    write(vecs.select("vec_id", emb.alias("embedding"), "label"), "embeddings")

    # events: the A/B-analytics scale table (v4 — VERDICT r9 #5: the
    # statistics family needs sf1-class volume for the same scale
    # evidence the star build gets).  Same shape as the driver testdata:
    # 1M rows/sf over a 30-day January-2024 span, 15k users/sf, 5
    # uniform event types, 2-dp value in [0, 560.22) (=_hmod(id,'ev',
    # 56022)/100, max 560.21) — all pure hash arithmetic, deterministic
    # across runs.
    n_events = int(1_000_000 * sf)
    n_users = max(int(15_000 * sf), 100)
    jan1_us = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in µs
    span_us = 30 * 24 * 3600 * 1_000_000
    evs = spark.range(1, n_events + 1, numPartitions=partitions).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(jan1_us) + F.pmod(F.xxhash64(F.col("id"), F.lit("ets")), F.lit(span_us))
        ).alias("ts"),
        (_hmod(F.col("id"), "eu", n_users) + 1).cast("long").alias("user_id"),
        _pick(F.col("id"), "eet", ("view", "click", "purchase", "signup", "error")).alias(
            "event_type"
        ),
        (_hmod(F.col("id"), "ev", 56022) / F.lit(100.0)).cast("double").alias("value"),
        F.lit("{}").alias("props"),
    )
    write(evs, "events")

    # Preserve the on-disk documents vocab when this call didn't touch
    # documents (the record describes what's on disk, not what was asked).
    final_vocab = (
        vocab_tag
        if "documents" in want or rec is None
        else rec.get("doc_vocab", "legacy")
    )
    with open(marker, "w") as fh:
        fh.write(f"sf={sf}\ndoc_vocab={final_vocab}\n")
    return path
