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

    from pyspark.sql import types as T

    df = spark.read.parquet(path)
    if columns is not None:
        df = df.select(*columns)
    ordered = (
        T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType,
        T.DoubleType, T.DecimalType, T.DateType, T.TimestampType,
        T.TimestampNTZType, T.BooleanType,
    )
    scalar = ordered + (T.StringType, T.BinaryType)
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    fields = [f for f in df.schema.fields if isinstance(f.dataType, scalar)]
    for f in fields:
        c = f.name
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__null__{c}"))
        aggs.append(F.approx_count_distinct(c, rsd=0.05).alias(f"__ndv__{c}"))
        if isinstance(f.dataType, ordered):
            aggs.append(F.min(c).alias(f"__min__{c}"))
            aggs.append(F.max(c).alias(f"__max__{c}"))
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
