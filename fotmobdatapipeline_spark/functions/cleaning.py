"""Column-level cleaning: bulk renames and value canonicalization.

Reference parity:
* P1 bulk rename — the 13-column rename map at fotmob-dag.py:103-118.
* P2 conditional value update — the Tottenham canonicalization at
  fotmob-dag.py:121.  The reference only fixes ``home_team_name`` (a
  quirk/bug); this engine applies the fix to every column you name, and
  the FotMob pipeline passes both home and away columns (SURVEY.md §7.4).

Both are pure Catalyst projections — no shuffle, fully pushdown-friendly,
scale-independent.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rename_columns(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """Bulk-rename columns; keys absent from ``df`` are ignored (matches
    pandas ``DataFrame.rename`` semantics used by the reference)."""
    present = {k: v for k, v in mapping.items() if k in df.columns}
    return df.withColumnsRenamed(present)


def canonicalize_expr(col: str | Column, mapping: Mapping[str, str]) -> Column:
    """``CASE WHEN col = variant THEN canonical ... ELSE col END``."""
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for variant, canonical in mapping.items():
        cond = c == F.lit(variant)
        expr = F.when(cond, F.lit(canonical)) if expr is None else expr.when(cond, F.lit(canonical))
    return c if expr is None else expr.otherwise(c)


def canonicalize_values(
    df: DataFrame, columns: list[str], mapping: Mapping[str, str]
) -> DataFrame:
    """Replace known value variants with canonical forms in each column."""
    return df.withColumns({c: canonicalize_expr(c, mapping) for c in columns})
