"""Schema-evolution-tolerant parquet reads.

A table that has been appended to for years accumulates schema drift:
new columns appear in recent partitions, and a column written as INT32
in 2023 may be INT64 in 2025.  Spark's ``mergeSchema`` handles the
added-column case but hard-fails on the widened-type case ("Failed to
merge fields"), which makes the whole table unreadable exactly when it
is oldest and biggest.  ``read_evolved`` restores readability:

1. fast path — plain ``mergeSchema`` read (added columns only; zero
   extra cost, partition pruning and pushdown intact);
2. conflict path — discover one schema per partition directory (one
   footer read per partition, O(#partitions) — never O(#files)),
   compute the widened common schema over the numeric lattice
   byte→short→int→long and float→double (int⊔double = double),
   then read each schema-group separately, cast up, and union.

Widening is value-preserving by construction; anything that would need
a narrowing or cross-kind cast (string vs int, decimal vs float)
raises instead of silently corrupting — schema repair is a human
decision, unreadability is not.

Reference scope note: the reference pipeline recreates its tables on
every run (fotmob-dag.py's full-refresh CTAS) so drift cannot occur
there; this operator exists for the incremental 100 TB deployment,
where full refresh is not an option.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Numeric widening lattice: later entries can represent every value of
# earlier ones exactly (float⊔long → double is the one lossy-in-theory
# edge; Spark itself widens that way in unions, we match it).
_INT_ORDER = [T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType()]
_FLOAT_ORDER = [T.FloatType(), T.DoubleType()]


def _widen(a: T.DataType, b: T.DataType) -> T.DataType:
    """Least upper bound of two leaf types, or raise ValueError."""
    if a == b:
        return a
    ints, floats = _INT_ORDER, _FLOAT_ORDER
    if a in ints and b in ints:
        return ints[max(ints.index(a), ints.index(b))]
    if a in floats and b in floats:
        return floats[max(floats.index(a), floats.index(b))]
    if (a in ints and b in floats) or (a in floats and b in ints):
        return T.DoubleType()
    raise ValueError(f"cannot widen {a.simpleString()} vs {b.simpleString()}")


def _widen_schemas(schemas: list[T.StructType]) -> T.StructType:
    """Union of field names; per-name widened type; everything nullable
    (a column absent from some partition is null there)."""
    order: list[str] = []
    types: dict[str, T.DataType] = {}
    for sch in schemas:
        for f in sch.fields:
            if f.name not in types:
                order.append(f.name)
                types[f.name] = f.dataType
            else:
                try:
                    types[f.name] = _widen(types[f.name], f.dataType)
                except ValueError as exc:
                    raise ValueError(f"column '{f.name}': {exc}") from exc
    return T.StructType([T.StructField(n, types[n], True) for n in order])


def conform_schema(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project ``df`` onto ``target``: missing columns become typed
    nulls, present columns are cast (callers pass a widened target, so
    the cast is up the lattice and value-preserving)."""
    have = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for f in target.fields:
        if f.name not in have:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        elif have[f.name] == f.dataType:
            cols.append(F.col(f.name))
        else:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
    return df.select(*cols)


_MERGE_ERROR_CLASSES = (
    "CANNOT_MERGE_SCHEMAS",
    "CANNOT_MERGE_INCOMPATIBLE_DATA_TYPE",
)


def _is_schema_merge_error(exc: Exception) -> bool:
    """True iff the exception carries one of Spark's schema-merge error
    classes — checked via the JVM accessor when present, else via the
    bracketed class token Spark prefixes to every such message."""
    je = getattr(exc, "java_exception", None)
    if je is not None:
        for accessor in ("getCondition", "getErrorClass"):
            try:
                cls = getattr(je, accessor)()
                if cls:
                    return cls in _MERGE_ERROR_CLASSES
            except Exception:
                pass
    msg = str(exc)
    return any(f"[{c}]" in msg for c in _MERGE_ERROR_CLASSES)


def read_evolved(
    spark: SparkSession, path: str, partition_col: str | None = None
) -> DataFrame:
    """Read a parquet table whose partitions disagree on schema.

    Tries the zero-cost ``mergeSchema`` read first; on a merge failure
    (widened physical types across partitions) falls back to
    per-partition-directory conform-and-union, which needs
    ``partition_col`` to enumerate the directories.  The fallback plan
    is a union of per-partition scans — each scan still prunes columns
    and pushes filters; the union adds no shuffle.

    Note one fast/fallback asymmetry: the fast path types the partition
    column via Spark's partition discovery (e.g. int for ``day=3``),
    while the fallback always emits it as string (the DECODED value —
    a ``day=10%3A30`` directory yields ``'10:30'``, matching what the
    fast path's discovery would decode) — cast at the call site if a
    specific type is needed.
    """
    try:
        df = spark.read.option("mergeSchema", "true").parquet(path)
        df.schema  # force footer merge now, not at first action
        return df
    except Exception as exc:
        # Footer-merge failure surfaces as a raw Py4JJavaError wrapping
        # SparkException (no python-side getErrorClass), so recognize it
        # by the stable bracketed ERROR-CLASS tokens in the message —
        # class identifiers, not prose, per the upsert_partitioned
        # convention.  Verified on Spark 4: "[CANNOT_MERGE_SCHEMAS]".
        if not _is_schema_merge_error(exc):
            raise
        if partition_col is None:
            raise ValueError(
                "schema merge failed and no partition_col given for the "
                "per-partition fallback"
            ) from exc

    from fotmobdatapipeline_spark.sources.fsutil import (
        partition_dirs,
        unescape_partition_value,
    )

    parts = partition_dirs(spark, path, partition_col)
    if not parts:
        raise ValueError(f"no {partition_col}=* directories under {path}")
    # One footer read per partition dir: schema inference on a directory
    # reads a single footer unless mergeSchema is set.
    readers = [
        (pval, spark.read.parquet(pdir)) for pval, pdir in parts
    ]
    target = _widen_schemas([df.schema for _, df in readers])
    # partition_dirs values are the Hive-escaped dir-name form; decode so
    # the emitted column holds the real value ('10:30', not '10%3A30').
    conformed = [
        conform_schema(df, target).withColumn(
            partition_col, F.lit(unescape_partition_value(pval))
        )
        for pval, df in readers
    ]
    return functools.reduce(lambda a, b: a.unionByName(b), conformed)
