"""Parquet table registry over the driver testdata.

The reference's only sources are a Selenium scrape and a REST fetch
(fotmob-dag.py:25-44) — browser/network I/O that belongs outside a query
engine.  The engine's source layer reads columnar files: each logical
table is one parquet dataset, read lazily so Catalyst can push filters
and prune columns down to the scan (verify with
``df.explain("formatted")`` → ``PushedFilters`` / ``ReadSchema``).

At 100 TB these would be partitioned/bucketed Delta tables; the API is
the same — ``spark.read.parquet`` on a directory, partition pruning free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazily bind one table.  The ``events`` table has shipped ``ts``
    as either parquet TIMESTAMP(NANOS) — which Spark's vectorized reader
    rejects (PARQUET_TYPE_ILLEGAL), so it is read as raw nanos and
    converted — or as a plain TIMESTAMP(MICROS), which reads natively.
    Detect which from the loaded dtype instead of assuming a generator
    version."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(f"{sf_dir}/events.parquet")
        from pyspark.sql import functions as F

        if dict(raw.dtypes).get("ts") != "bigint":
            # Native TIMESTAMP(MICROS) file: only normalize NTZ -> the
            # session-zone timestamp every downstream expression
            # (unix_micros, windowing) expects.  Session TZ is pinned
            # UTC, so the instant is unchanged.
            return raw.withColumn("ts", F.col("ts").cast("timestamp"))

        # Integer division: epoch-ns values (~1.7e18) exceed double's
        # 2^53 exact range, so `/ 1000` would be off by ±1 µs.
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_file_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    **options,
) -> DataFrame:
    """Format-dispatching file source (parquet/json/csv/text).

    Text formats REQUIRE an explicit schema in production: schema
    inference reads the data twice and infers per-run (a 100 TB JSON
    landing zone must not be re-scanned just to guess types, and a type
    that flips between runs breaks downstream plans).  Inference is
    allowed here only when ``schema=None`` for ad-hoc exploration.
    CSV defaults to header=true; JSON reads one object per line
    (``multiLine`` available via options for whole-file payloads like
    the reference's per-match REST responses).
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("json", "csv"):
        reader = reader.option("inferSchema", "true")
    if fmt == "csv":
        reader = reader.option("header", options.pop("header", "true"))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.format(fmt).load(path)


def write_file_sink(
    df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite", **options
) -> None:
    """Format-dispatching file sink (idempotent overwrite default).
    Parquet for anything analytic; json/csv only as interchange exports —
    they are row-oriented, uncompressed-by-default, and unpruned (every
    query pays full-file reads), so at scale they are edge formats, not
    storage formats."""
    writer = df.write.mode(mode)
    if fmt == "csv":
        writer = writer.option("header", options.pop("header", "true"))
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.format(fmt).save(path)


def load_tables(
    spark: SparkSession, sf_dir: str, only: tuple[str, ...] | None = None
) -> dict[str, DataFrame]:
    """Lazily bind every testdata table under ``sf_dir`` (or just the
    ``only`` subset — binding reads parquet footers eagerly, so a query
    that touches one table shouldn't pay footer I/O for ten, and a
    partial dataset — e.g. the sf10 probe's events-only generation —
    shouldn't fail on tables the query never reads)."""
    names = TABLES if only is None else only
    unknown = set(names) - set(TABLES)
    if unknown:
        raise ValueError(f"unknown tables: {sorted(unknown)}")
    return {t: read_table(spark, sf_dir, t) for t in names}


def register_views(
    spark: SparkSession, sf_dir: str, only: tuple[str, ...] | None = None
) -> dict[str, DataFrame]:
    """Bind tables and register them as temp views so ``spark.sql`` works
    with the same names the DuckDB oracle uses."""
    dfs = load_tables(spark, sf_dir, only=only)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
