"""Shared Hadoop-FileSystem helpers for Hive-partitioned table layout.

One scheme-aware implementation of "list the ``col=value`` partition
directories (and their data files)" used by the table-lifecycle
operators (``operators/merge.py`` compaction, ``sources/evolution.py``
evolved reads) — the same py4j FileSystem route as
``streaming/statefs.py``, so ``s3a://``, ``hdfs://``, ``gs://`` and
local paths all resolve through the warehouse's own configuration.
"""

from __future__ import annotations

from collections.abc import Sequence


def _fs_and_path(spark, path: str):
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, jpath


def partition_dirs(
    spark, path: str, partition_col: str, only: Sequence[str] | None = None
) -> list[tuple[str, str]]:
    """Sorted ``(value, directory-uri)`` for every ``partition_col=...``
    child directory.  ``only`` restricts the listing to the named
    values WITHOUT listing the rest of the table — with it the cost is
    O(len(only)) existence checks, not O(#partitions)."""
    fs, jpath = _fs_and_path(spark, path)
    prefix = partition_col + "="
    if only is not None:
        Path = spark.sparkContext._jvm.org.apache.hadoop.fs.Path
        out = []
        for v in only:
            p = Path(f"{path}/{prefix}{v}")
            if fs.exists(p) and fs.getFileStatus(p).isDirectory():
                out.append((str(v), str(p)))
        return sorted(out)
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith(prefix):
            out.append((name[len(prefix):], str(st.getPath())))
    return sorted(out)


def partition_file_stats(
    spark, path: str, partition_col: str, only: Sequence[str] | None = None
) -> dict[str, tuple[int, int]]:
    """Per-partition-value ``(data_file_count, total_bytes)``.  Data
    files are non-hidden regular files (Spark's ``_SUCCESS`` / dot
    files are skipped).  ``only`` bounds the walk as in
    :func:`partition_dirs`."""
    fs, _ = _fs_and_path(spark, path)
    Path = spark.sparkContext._jvm.org.apache.hadoop.fs.Path
    stats: dict[str, tuple[int, int]] = {}
    for pval, pdir in partition_dirs(spark, path, partition_col, only=only):
        files = bytes_ = 0
        for f in fs.listStatus(Path(pdir)):
            fname = f.getPath().getName()
            if f.isFile() and not fname.startswith(("_", ".")):
                files += 1
                bytes_ += f.getLen()
        stats[pval] = (files, bytes_)
    return stats


def delete_path(spark, path: str, recursive: bool = True) -> bool:
    fs, jpath = _fs_and_path(spark, path)
    return bool(fs.delete(jpath, recursive))


_HEX = set("0123456789abcdefABCDEF")

# Catalyst's ExternalCatalogUtils.charToEscape: ASCII control chars
# 0x01-0x1F, DEL, and the Hive-special set.  Spark escapes these (and
# ONLY these) as %XX uppercase-hex in partition directory names.
_ESCAPED_CHARS = frozenset(
    [chr(c) for c in range(0x01, 0x20)]
    + ['"', "#", "%", "'", "*", "/", ":", "=", "?", "\\", "\x7f", "{", "[", "]", "^"]
)


HIVE_DEFAULT_PARTITION = "__HIVE_DEFAULT_PARTITION__"


def escape_partition_value(value: str | None) -> str:
    """The Hive/Spark directory-name form of a partition value — what
    ``partitionBy`` writes and :func:`partition_dirs` lists ('10:30' →
    ``10%3A30``).  Use it to turn DATA values into the ``only=`` keys
    the listing helpers expect.  NULL and '' both land in Spark's
    ``__HIVE_DEFAULT_PARTITION__`` directory (verified against the real
    writer), so they map there too — the one case where
    :func:`unescape_partition_value` is not an inverse (Spark itself
    cannot tell those apart on disk)."""
    if value is None or value == "":
        return HIVE_DEFAULT_PARTITION
    return "".join(
        f"%{ord(c):02X}" if c in _ESCAPED_CHARS else c for c in value
    )


def unescape_partition_value(name: str) -> str:
    """Decode the Hive/Spark directory-name form of a partition value
    back to the real value (inverse of Catalyst's
    ``ExternalCatalogUtils.escapePathName``): every ``%XX`` with two hex
    digits becomes ``chr(0xXX)``; a ``%`` not followed by two hex digits
    is literal.  :func:`partition_dirs` returns dir-name-form values, so
    anything that re-writes a listed value through ``partitionBy`` (which
    escapes AGAIN) must round-trip through this first — ``10:30`` lists
    as ``10%3A30`` and would otherwise re-escape to ``10%253A30``."""
    out: list[str] = []
    i, n = 0, len(name)
    while i < n:
        c = name[i]
        if c == "%" and i + 3 <= n and set(name[i + 1 : i + 3]) <= _HEX:
            out.append(chr(int(name[i + 1 : i + 3], 16)))
            i += 3
        else:
            out.append(c)
            i += 1
    return "".join(out)
