"""Keyed upsert (MERGE) into a partitioned parquet table — no Delta/
Iceberg required.

The reference's stated evolution is scheduled incremental batches
(README.md:158); incremental loads need "insert new, replace changed"
semantics.  Without a transactional table format, the scalable pattern
is partition-scoped rewrite:

1. compute the set of partitions the source batch touches (distinct of
   the partition column — small);
2. read ONLY those target partitions (partition pruning keeps this
   proportional to the batch, not the table);
3. anti-join the old rows on the merge key (drop rows being replaced),
   union the new rows;
4. write back with dynamic partition overwrite — untouched partitions
   are never read or written.

Cost is O(size of touched partitions), independent of total table size —
the property that makes daily upserts into a 100 TB table feasible.
Atomicity is per-partition (parquet has no multi-partition transaction);
a production deployment layers Delta/Iceberg on top for snapshot
isolation, with this exact same logical MERGE underneath.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert_partitioned(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    keys: Sequence[str],
    partition_col: str,
) -> None:
    """MERGE ``source`` into the parquet table at ``path``: rows whose
    ``keys`` match an existing row replace it; others are appended.
    ``source`` must contain ``partition_col``, and a key's partition must
    be stable (a moved row would leave its old copy behind — same
    contract Hive-style partitioned MERGE has).

    ``source`` is evaluated three times (touched partitions, key set,
    final write), so it is pinned with ``cache()`` — a nondeterministic
    source lineage (sampled/limited/shuffled input) would otherwise
    delete one key set and insert another."""
    source = source.cache()
    touched = [r[0] for r in source.select(partition_col).distinct().collect()]
    if not touched:
        return

    # Only a genuinely-absent table may fall through to insert-only mode.
    # Any other read failure (permissions, corrupt footer, transient FS
    # error) must abort: proceeding would dynamic-partition-overwrite the
    # touched partitions with source-only rows, silently dropping every
    # pre-existing row in them.  Existence goes through the Hadoop
    # FileSystem API so s3://, hdfs:// and every other warehouse URI
    # scheme resolve correctly — a local os.path check would report
    # "absent" for any remote table and silently drop its rows.
    from pyspark.errors import AnalysisException

    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    existing = fs.exists(jpath)
    if existing:
        try:
            target = spark.read.parquet(path).filter(
                F.col(partition_col).isin(touched)
            )
        except AnalysisException as exc:
            # Races (table dropped between the exists() and the read) are
            # recognized by ERROR CLASS, not message text — message
            # strings change across Spark versions, error classes don't.
            get_cls = getattr(exc, "getErrorClass", lambda: None)
            if get_cls() == "PATH_NOT_FOUND":
                existing = False
            else:
                raise

    if existing:
        kept = target.join(
            F.broadcast(source.select(*keys).distinct()), list(keys), "left_anti"
        )
        out = kept.unionByName(source.select(*kept.columns))
    else:
        out = source

    # Stage the merged partitions to a scratch dir first: the merge reads
    # the same files the final write replaces, and overwriting a path
    # mid-read is undefined for file sources.  Cost: touched partitions
    # are written twice — still O(batch), never O(table).
    import shutil
    import tempfile

    staging = tempfile.mkdtemp(prefix="fotmob_merge_")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out.write.mode("overwrite").partitionBy(partition_col).parquet(staging)
        staged = spark.read.parquet(staging)
        staged.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        source.unpersist()
        shutil.rmtree(staging, ignore_errors=True)


def _partition_file_stats(spark: SparkSession, path: str, partition_col: str):
    """Per-partition (value → (file_count, total_bytes)) via the Hadoop
    FileSystem API, so s3://, hdfs:// and local paths all resolve.  Only
    directory entries named ``partition_col=...`` are counted; data files
    are non-hidden regular files (Spark's _SUCCESS / .crc are skipped)."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    prefix = partition_col + "="
    stats: dict[str, tuple[int, int]] = {}
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith(prefix)):
            continue
        files = bytes_ = 0
        for f in fs.listStatus(st.getPath()):
            fname = f.getPath().getName()
            if f.isFile() and not fname.startswith(("_", ".")):
                files += 1
                bytes_ += f.getLen()
        stats[name[len(prefix):]] = (files, bytes_)
    return stats


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
    partitions: Sequence[str] | None = None,
) -> list[dict]:
    """Small-file compaction for a Hive-partitioned parquet table — the
    OPTIMIZE / bin-packing maintenance pass a long-lived 100 TB table
    needs after many incremental ``upsert_partitioned`` / streaming
    appends.  Each selected partition is rewritten into
    ``ceil(bytes / target_file_bytes)`` files (≥1); partitions already at
    or under that file count, or under ``min_files``, are left untouched
    (their files are never read, never rewritten, mtimes preserved).

    One job compacts ALL selected partitions: rows are shuffled once on
    ``(partition_col, file_bucket)`` where ``file_bucket`` is a per-row
    hash bounded by that partition's target file count — so a partition
    needing 3 files lands in ~3 write tasks while its 10 000-file
    neighbour gets its own fan-in, without a driver loop per partition.
    Cost is O(selected partitions), independent of table size.

    Returns per-partition stats ``{partition, files_before, bytes,
    target_files, files_after}`` for the selected partitions.

    Partition values are matched by their directory-name form; a value
    Hive escapes in the dir name (spaces, ``/``) will not match its
    cast-to-string column form — such partitions are safely skipped
    (never rewritten), not corrupted.
    """
    before = _partition_file_stats(spark, path, partition_col)
    chosen: dict[str, int] = {}
    for pval, (files, bytes_) in before.items():
        if partitions is not None and pval not in set(map(str, partitions)):
            continue
        target = max(1, math.ceil(bytes_ / target_file_bytes))
        if files >= min_files and files > target:
            chosen[pval] = target
    if not chosen:
        return []

    df = spark.read.parquet(path).filter(
        F.col(partition_col).cast("string").isin(list(chosen))
    )
    # partition value → target file count, as a broadcast-sized literal map
    nmap = F.create_map(
        *[F.lit(x) for kv in chosen.items() for x in kv]
    )[F.col(partition_col).cast("string")]
    cols = df.columns
    bucket = F.pmod(F.xxhash64(*[F.col(c) for c in cols]), nmap)
    out = (
        df.withColumn("__file_bucket", bucket)
        .repartition(F.col(partition_col), F.col("__file_bucket"))
        .drop("__file_bucket")
    )

    # Same staging discipline as upsert_partitioned: never overwrite the
    # files a running read is consuming.
    import shutil
    import tempfile

    staging = tempfile.mkdtemp(prefix="fotmob_compact_")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out.write.mode("overwrite").partitionBy(partition_col).parquet(staging)
        staged = spark.read.parquet(staging)
        staged.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        shutil.rmtree(staging, ignore_errors=True)

    after = _partition_file_stats(spark, path, partition_col)
    return [
        {
            "partition": pval,
            "files_before": before[pval][0],
            "bytes": before[pval][1],
            "target_files": tgt,
            "files_after": after.get(pval, (0, 0))[0],
        }
        for pval, tgt in sorted(chosen.items())
    ]
