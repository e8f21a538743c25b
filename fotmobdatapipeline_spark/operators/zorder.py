"""Z-order (Morton) clustering for multi-dimensional data skipping.

A 100 TB table sorted by ONE column skips files only for predicates on
that column; a box query on (user_id, ts) still reads every file.
Z-ordering interleaves the bits of both dimensions, so a range-partition
+ in-file sort by the z-value makes every file cover a small RECTANGLE
of the 2-D space — parquet footer min/max on the ORIGINAL columns then
prunes most files for any 2-D box (the same layout OPTIMIZE ZORDER BY
gives Delta tables; here as a plain-parquet write strategy).

Everything is native Spark expressions (shift/and/or chains inside
whole-stage codegen): no UDF, no Python workers, and the only driver
work is one tiny min/max aggregate to scale dimensions into bit space.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

DEFAULT_BITS = 16


def _as_long(col: Column, dtype) -> Column:
    if isinstance(dtype, TimestampType):
        return F.unix_micros(col)
    return col.cast("long")


def interleave_bits(a: Column, b: Column, bits: int = DEFAULT_BITS) -> Column:
    """Morton code of two already-scaled non-negative ints < 2**bits."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    z = terms[0]
    for t in terms[1:]:
        z = z.bitwiseOR(t)
    return z


def zvalue(df: DataFrame, col_a: str, col_b: str, bits: int = DEFAULT_BITS) -> Column:
    """Z-value column for two numeric/timestamp columns, min/max scaled
    into bit space.  Runs ONE tiny agg job for the bounds — layout-only
    metadata, so the double rounding in the scale step cannot affect
    query results."""
    dtypes = dict(df.dtypes)
    a = _as_long(F.col(col_a), df.schema[col_a].dataType)
    b = _as_long(F.col(col_b), df.schema[col_b].dataType)
    lo_a, hi_a, lo_b, hi_b = df.select(
        F.min(a), F.max(a), F.min(b), F.max(b)
    ).first()
    top = (1 << bits) - 1

    def scale(c: Column, lo: int, hi: int) -> Column:
        if hi == lo:
            return F.lit(0).cast("long")
        return ((c - F.lit(lo)).cast("double") * top / (hi - lo)).cast("long")

    return interleave_bits(scale(a, lo_a, hi_a), scale(b, lo_b, hi_b), bits)


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 32,
    bits: int = DEFAULT_BITS,
) -> None:
    """Write df as parquet clustered by z(col_a, col_b): range-partition
    on the z-value (each output file owns a contiguous z-range = a small
    spatial rectangle) and sort within files so row-group stats are
    tight too."""
    z = zvalue(df, col_a, col_b, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def files_matching_box(path: str, box: dict[str, tuple]) -> tuple[int, int]:
    """Footer-only skipping audit: (files that a box query must read,
    total files), using each file's per-column min/max — exactly the
    pruning a parquet reader does, measured without reading data."""
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        overlaps = True
        for col, (lo, hi) in box.items():
            idx = names[col]
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    mins, maxs = None, None
                    break
                mins.append(st.min)
                maxs.append(st.max)
            if mins is None:
                continue  # no stats -> cannot skip on this column
            if min(mins) > hi or max(maxs) < lo:
                overlaps = False
                break
        if overlaps:
            hit += 1
    return hit, len(files)
