"""Key-distribution profiling — measure before salting.

Skew is the dominant large-cluster failure mode (one hot key = one
straggler task = the stage's wall time).  ``key_distribution`` is the
cheap diagnostic to run before choosing a join/agg strategy: heavy
hitters, their share of all rows, and how many multiples of the average
key they are.  One shuffle (the groupBy); the stats side is a 1-row
broadcast.  Read it as: ``skew_vs_avg`` ≳ number of shuffle partitions →
that key alone fills a partition → salt it (operators/joins.salted_join)
or rely on AQE skew split for joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_distribution(df: DataFrame, key_cols: Sequence[str], top_k: int = 10) -> DataFrame:
    """Top-``top_k`` heaviest keys with global context: (keys..., n,
    n_keys, share, skew_vs_avg), ordered heaviest first with a unique
    key tiebreak."""
    kcols = list(key_cols)
    counts = df.groupBy(*kcols).agg(F.count("*").alias("n"))
    stats = counts.agg(
        F.count("*").alias("n_keys"), F.sum("n").alias("total")
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .select(
            *kcols,
            "n",
            "n_keys",
            (F.col("n").cast("double") / F.col("total").cast("double")).alias("share"),
            (
                F.col("n").cast("double")
                / (F.col("total").cast("double") / F.col("n_keys").cast("double"))
            ).alias("skew_vs_avg"),
        )
        .orderBy(F.desc("n"), *[F.asc(c) for c in kcols])
        .limit(top_k)
    )


def null_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-column data-quality profile: (column_name, n_null, n_distinct,
    n_rows), one row per requested column.

    Single pass over the data — every null counter is a map-side-combined
    conditional sum in one aggregate (Catalyst expands the multi-distinct
    into one Expand + aggregate, still a single scan); the wide 1-row
    result is then unpivoted driver-free with ``stack``.  The first
    question to ask of a new 100 TB drop before any pipeline stage runs.
    ``n_distinct`` excludes nulls (SQL COUNT(DISTINCT) semantics).
    """
    cols = list(cols)
    aggs = []
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"__null_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__dist_{c}"))
    wide = df.agg(F.count("*").alias("n_rows"), *aggs)
    pairs = ", ".join(f"'{c}', __null_{c}, __dist_{c}" for c in cols)
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {pairs}) AS (column_name, n_null, n_distinct)"
        ),
        "n_rows",
    )


def table_checksum(
    df: DataFrame, cols: Sequence[str], group_by: Sequence[str] = ()
) -> DataFrame:
    """Order-insensitive content checksum: SUM over rows of the first 32
    md5 bits of a canonical '|'-joined row string (nulls marked, so
    (NULL, 'x') differs from ('x', NULL)), mod 2^61, plus the row count.

    The anti-entropy primitive for 100 TB table comparison: replicas /
    snapshot pairs / engine migrations are compared by one aggregate scan
    per side instead of a row join, and the checksum is independent of
    partitioning, row order, and engine (md5 of explicit strings).  A
    mismatch localizes to the ``group_by`` granularity (e.g. partition
    keys), turning "are these 100 TB equal?" into a per-partition drill-
    down.  Collision odds are the birthday bound on 32 bits per row
    summed mod 2^61 — fine for drift *detection*, not cryptographic
    proof.  Columns must be cast to engine-stable strings by the caller
    (exact DECIMAL for money, integer µs for time — never raw doubles).
    """
    canon = F.concat_ws(
        "|", *[F.coalesce(F.col(c).cast("string"), F.lit("\\N")) for c in cols]
    )
    h = F.conv(F.substring(F.md5(canon), 1, 8), 16, 10).cast("decimal(38,0)")
    mod = F.lit(2305843009213693952).cast("decimal(38,0)")  # 2^61
    aggs = [
        F.count("*").alias("n_rows"),
        (F.sum(h) % mod).cast("bigint").alias("checksum"),
    ]
    gb = list(group_by)
    return df.groupBy(*gb).agg(*aggs) if gb else df.agg(*aggs)


# -- ANALYZE-style persisted table statistics ------------------------------

_STATS_FILE = "stats.json"


def _stats_type_sets():
    """(orderable, scalar) leaf-type tuples shared by the table-level
    and partition-level ANALYZE so their column classification can
    never drift apart."""
    from pyspark.sql import types as T

    ordered = (
        T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType,
        T.DoubleType, T.DecimalType, T.DateType, T.TimestampType,
        T.TimestampNTZType, T.BooleanType,
    )
    return ordered, ordered + (T.StringType, T.BinaryType)


def _column_stat_aggs(fields, ordered):
    """Per-column null-count and (orderable only) min/max aggregate
    expressions with the __null__/__min__/__max__ alias scheme both
    ANALYZE forms read back."""
    aggs = []
    for f in fields:
        c = f.name
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__null__{c}"))
        if isinstance(f.dataType, ordered):
            aggs.append(F.min(c).alias(f"__min__{c}"))
            aggs.append(F.max(c).alias(f"__max__{c}"))
    return aggs


def collect_table_stats(
    spark,
    path: str,
    columns: Sequence[str] | None = None,
    persist: bool = True,
) -> dict:
    """One-pass ANALYZE for a parquet table: row count plus per-column
    null count, approximate NDV (HyperLogLog++, rsd 5%), and min/max
    for orderable scalar types.  Everything folds map-side into a
    single-row aggregate — one scan, one tiny driver result — so the
    pass costs the same as ``COUNT(*)`` regardless of table width
    policy at 100 TB.

    With ``persist=True`` the stats land as ``_stats/stats.json``
    beside the data (underscore-prefixed → invisible to Spark's file
    index), published atomically through the warehouse-scheme-aware
    ``StateFs`` so object stores and HDFS both get old-or-new
    semantics.  This is the stats-refresh step a maintenance window
    runs after ``upsert_partitioned`` / ``compact_partitions``, and
    what a planner (or a human) reads instead of re-scanning.
    """
    import json

    df = spark.read.parquet(path)
    if columns is not None:
        df = df.select(*columns)
    ordered, scalar = _stats_type_sets()
    fields = [f for f in df.schema.fields if isinstance(f.dataType, scalar)]
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    aggs += _column_stat_aggs(fields, ordered)
    aggs += [
        F.approx_count_distinct(f.name, rsd=0.05).alias(f"__ndv__{f.name}")
        for f in fields
    ]
    row = df.agg(*aggs).first().asDict()

    def _plain(v):
        return v if v is None or isinstance(v, (int, float, bool, str)) else str(v)

    stats = {
        "row_count": row["__n_rows"],
        "columns": {
            f.name: {
                "type": f.dataType.simpleString(),
                "null_count": row[f"__null__{f.name}"],
                "approx_ndv": row[f"__ndv__{f.name}"],
                **(
                    {
                        "min": _plain(row[f"__min__{f.name}"]),
                        "max": _plain(row[f"__max__{f.name}"]),
                    }
                    if isinstance(f.dataType, ordered)
                    else {}
                ),
            }
            for f in fields
        },
    }
    if persist:
        from fotmobdatapipeline_spark.streaming.statefs import StateFs

        sfs = StateFs(spark, path.rstrip("/") + "/_stats")
        sfs.mkdirs()
        sfs.write_text_atomic(_STATS_FILE, json.dumps(stats, sort_keys=True))
    return stats


def read_table_stats(spark, path: str) -> dict | None:
    """Stats persisted by ``collect_table_stats``, or None if absent."""
    import json

    from fotmobdatapipeline_spark.streaming.statefs import StateFs

    text = StateFs(spark, path.rstrip("/") + "/_stats").read_text(_STATS_FILE)
    return None if text is None else json.loads(text)


# -- incremental ANALYZE: per-partition stats + mergeable-HLL NDV ----------

_PART_STATS_DIR = "_stats/parts"


def _hll_consts():
    from fotmobdatapipeline_spark.operators.sketches import HLL_ALPHA_64, HLL_M

    return HLL_M, HLL_ALPHA_64


def collect_partition_stats(
    spark,
    path: str,
    partition_col: str,
    partitions: Sequence[str] | None = None,
    ndv_cols: Sequence[str] | None = None,
    hist_cols: dict | None = None,
    persist: bool = True,
) -> dict:
    """Incremental ANALYZE: per-PARTITION statistics, refreshable for
    just the partitions a maintenance window touched (O(touched), never
    O(table)) — the property :func:`collect_table_stats` cannot have.

    ``partitions`` (and every partition key in the persisted stats and
    the merged view) is the Hive-escaped DIR-NAME form — it doubles as
    the stats FILENAME, so it must stay filesystem-safe.  Callers
    holding data values convert with
    ``fsutil.escape_partition_value`` (see incremental_sink_with_stats).

    Per partition: row count, per-column null count and min/max
    (orderable scalars), and for each of ``ndv_cols`` a 64-register
    HyperLogLog sketch (the repo's portable HLL, operators/sketches.py)
    stored SPARSELY as {reg_idx: max_rho}.  Registers merge across
    partitions by per-register max, so :func:`read_merged_table_stats`
    reassembles exact table-level counts/min/max/nulls and a
    table-level NDV estimate equal to what a full-table sketch would
    give — without rescanning untouched partitions.

    ``hist_cols`` maps column -> (lo, hi, n_buckets): a FIXED-EDGE
    histogram per partition (values clamped into the edge range),
    stored sparsely and merged across partitions by exact bucket-count
    SUM — so table-level quantile estimates
    (:func:`quantile_from_merged_hist`) also refresh O(touched).
    Fixed edges are what make partition histograms mergeable; pick
    them once from domain knowledge or a first full ANALYZE's
    min/max.

    Partitions are read per-directory (the ``compact_partitions``
    collision rule).  Cost: ONE pass over storage — the unioned frame
    is cached, the base aggregate reads it from disk, and each
    sketched column's register fold reuses the cache.  Each
    partition's stats land as ``_stats/parts/<value>.json`` via the
    scheme-aware StateFs; a FULL refresh (``partitions=None``) also
    deletes stats files for partitions that no longer exist, so
    dropped partitions cannot haunt the merged view.
    """
    import functools
    import json

    from fotmobdatapipeline_spark.operators.sketches import hll_registers
    from fotmobdatapipeline_spark.sources.fsutil import partition_dirs

    dirs = partition_dirs(spark, path, partition_col, only=partitions)
    if not dirs:
        return {}
    legs = [
        spark.read.parquet(pdir).withColumn("__part", F.lit(pval))
        for pval, pdir in dirs
    ]
    df = functools.reduce(lambda a, b: a.unionByName(b), legs).persist()

    ordered, scalar = _stats_type_sets()
    fields = [
        f for f in df.schema.fields
        if f.name != "__part" and isinstance(f.dataType, scalar)
    ]
    aggs = [F.count(F.lit(1)).alias("__n_rows")] + _column_stat_aggs(fields, ordered)
    ndv_cols = list(ndv_cols or [])
    hist_cols = dict(hist_cols or {})
    sketches: dict[str, dict[str, dict[int, int]]] = {}
    hists: dict[str, dict[str, dict[int, int]]] = {}
    try:
        base = {
            r["__part"]: r.asDict()
            for r in df.groupBy("__part").agg(*aggs).collect()
        }
        sketches = {p: {} for p in base}
        hists = {p: {} for p in base}
        for c in ndv_cols:
            regs = hll_registers(
                df, c, m=_hll_consts()[0], group_cols=("__part",)
            ).collect()
            for r in regs:
                sketches[r["__part"]].setdefault(c, {})[int(r["reg_idx"])] = int(
                    r["max_rho"]
                )
        for c, (lo, hi, nb) in hist_cols.items():
            if not (hi > lo and nb > 0):
                raise ValueError(f"bad histogram spec for {c}: {(lo, hi, nb)}")
            width = (float(hi) - float(lo)) / nb
            bucket = F.least(
                F.greatest(
                    F.floor((F.col(c).cast("double") - F.lit(float(lo))) / F.lit(width)),
                    F.lit(0),
                ),
                F.lit(nb - 1),
            ).cast("int")
            rows = (
                df.filter(F.col(c).isNotNull())
                .groupBy("__part", bucket.alias("__b"))
                .agg(F.count(F.lit(1)).alias("__c"))
                .collect()
            )
            for r in rows:
                hists[r["__part"]].setdefault(c, {})[int(r["__b"])] = int(r["__c"])
    finally:
        df.unpersist()

    def _plain(v):
        # Merge-safe serialization: Decimal -> float (numeric compare),
        # date/timestamp -> ISO string (lexical order == chronological);
        # table-level min/max merging in read_merged_table_stats relies
        # on these orderings.
        import decimal

        if v is None or isinstance(v, (int, float, bool, str)):
            return v
        if isinstance(v, decimal.Decimal):
            return float(v)
        return str(v)

    out: dict[str, dict] = {}
    for pval, row in base.items():
        cols = {}
        for f in fields:
            c = f.name
            entry = {
                "type": f.dataType.simpleString(),
                "null_count": row[f"__null__{c}"],
            }
            if isinstance(f.dataType, ordered):
                entry["min"] = _plain(row.get(f"__min__{c}"))
                entry["max"] = _plain(row.get(f"__max__{c}"))
            cols[c] = entry
        out[pval] = {
            "partition_col": partition_col,
            "row_count": row["__n_rows"],
            "columns": cols,
            "hll": {
                c: {str(k): v for k, v in sorted(sketches[pval].get(c, {}).items())}
                for c in ndv_cols
            },
            "hist": {
                c: {
                    "lo": float(lo), "hi": float(hi), "n": nb,
                    "counts": {
                        str(k): v
                        for k, v in sorted(hists[pval].get(c, {}).items())
                    },
                }
                for c, (lo, hi, nb) in hist_cols.items()
            },
        }

    if persist:
        from fotmobdatapipeline_spark.streaming.statefs import StateFs

        sfs = StateFs(spark, path.rstrip("/") + "/" + _PART_STATS_DIR)
        sfs.mkdirs()
        for pval, stats in out.items():
            sfs.write_text_atomic(f"{pval}.json", json.dumps(stats, sort_keys=True))
        if partitions is None:
            # Full refresh is authoritative: drop stats for partitions
            # that no longer exist on disk.
            live = {pval for pval, _ in dirs}
            for name in sfs.listdir():
                if name.endswith(".json") and name[:-5] not in live:
                    sfs.delete(name)
    return out


def _hll_estimate_py(registers: dict[int, int]) -> float:
    """Driver-side replica of operators/sketches.hll_estimate: exact
    powers of two summed in fixed register order, absent registers
    contributing 1 each — the merged-table estimate equals what the
    engine computes on a full-table sketch."""
    m, alpha = _hll_consts()
    sum_inv = 0.0
    for _idx, rho in sorted(registers.items()):
        sum_inv += 1.0 / (1 << rho)
    sum_inv += float(m - len(registers))
    return alpha * m * m / sum_inv


def read_merged_table_stats(spark, path: str) -> dict | None:
    """Merge every persisted per-partition stats file into table-level
    stats: counts and null counts SUM, min/min and max/max, HLL
    registers merge by per-register max and yield ``approx_ndv`` per
    sketched column.  O(#partitions) tiny JSON reads plus one
    partition-dir listing to exclude ORPHANS (stats files whose
    partition was dropped after the last full refresh) — orphaned
    stats are skipped, never merged."""
    import json

    from fotmobdatapipeline_spark.sources.fsutil import partition_dirs
    from fotmobdatapipeline_spark.streaming.statefs import StateFs

    sfs = StateFs(spark, path.rstrip("/") + "/" + _PART_STATS_DIR)
    names = [n for n in sfs.listdir() if n.endswith(".json")]
    if not names:
        return None
    parts = {
        n[:-5]: json.loads(sfs.read_text(n)) for n in sorted(names)
    }
    pcols = {p.get("partition_col") for p in parts.values()} - {None}
    if pcols:
        live = {
            pval
            for pc in pcols
            for pval, _ in partition_dirs(spark, path, pc)
        }
        parts = {pval: p for pval, p in parts.items() if pval in live}
        if not parts:
            return None
    row_count = sum(p["row_count"] for p in parts.values())
    cols: dict[str, dict] = {}
    regs: dict[str, dict[int, int]] = {}
    for p in parts.values():
        for c, e in p["columns"].items():
            tgt = cols.setdefault(
                c, {"type": e["type"], "null_count": 0, "min": None, "max": None}
            )
            tgt["null_count"] += e["null_count"]
            for key, pick in (("min", min), ("max", max)):
                if key in e and e[key] is not None:
                    tgt[key] = e[key] if tgt[key] is None else pick(tgt[key], e[key])
        for c, sketch in p.get("hll", {}).items():
            tgt_r = regs.setdefault(c, {})
            for k, v in sketch.items():
                k = int(k)
                tgt_r[k] = max(tgt_r.get(k, 0), v)
    for c in cols:
        if "min" in cols[c] and cols[c]["min"] is None:
            cols[c].pop("min"); cols[c].pop("max")
    hists: dict[str, dict] = {}
    for p in parts.values():
        for c, h in p.get("hist", {}).items():
            tgt_h = hists.setdefault(
                c, {"lo": h["lo"], "hi": h["hi"], "n": h["n"], "counts": {}}
            )
            if (tgt_h["lo"], tgt_h["hi"], tgt_h["n"]) != (h["lo"], h["hi"], h["n"]):
                raise ValueError(f"histogram edges disagree across partitions for {c}")
            for k, v in h["counts"].items():
                k = int(k)
                tgt_h["counts"][k] = tgt_h["counts"].get(k, 0) + v
    merged = {"row_count": row_count, "columns": cols}
    if regs:
        merged["approx_ndv"] = {c: _hll_estimate_py(r) for c, r in regs.items()}
    if hists:
        merged["hist"] = hists
    merged["partitions"] = sorted(parts)
    return merged


def quantile_from_merged_hist(hist: dict, q: float) -> float:
    """Quantile estimate from a merged fixed-edge histogram: walk the
    cumulative counts to the bucket containing the 1-based rank
    q*(N-1)+1 — PERCENTILE_CONT's interpolation convention, the same
    one ``plans/advanced._sql_hq_est`` targets — and linearly
    interpolate inside it.  Error is bounded by one bucket width — the
    classic equi-width-histogram estimator a planner uses for
    selectivity."""
    if not 0.0 <= q <= 1.0:
        raise ValueError("q must be in [0, 1]")
    lo, hi, nb = hist["lo"], hist["hi"], hist["n"]
    counts = {int(k): v for k, v in hist["counts"].items()}
    total = sum(counts.values())
    if total == 0:
        raise ValueError("empty histogram")
    width = (hi - lo) / nb
    target = q * (total - 1) + 1  # 1-based rank, cum_prev < target <= cum
    cum = 0.0
    for b in range(nb):
        c = counts.get(b, 0)
        if c > 0 and cum < target <= cum + c:
            frac = (target - cum) / c
            return lo + (b + frac) * width
        cum += c
    return hi
