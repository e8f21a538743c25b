"""Exact integer arithmetic helpers shared by the iterative solvers
(Bradley-Terry MM, weighted PageRank): cross-engine bit-exactness
demands every division be an explicit truncation that DuckDB's
HUGEINT ``//`` replays verbatim."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def floor_div(num: str, den: str) -> Column:
    """Exact truncating division of non-negative DECIMAL(38,0) SQL
    expressions that NEVER leaves decimal: (num - num % den) is exactly
    divisible, so the decimal divide yields an exact integer — for
    QUOTIENTS up to ~1e32, NOT 1e38 (ADVICE r9): Spark's
    decimal(38,0)/decimal(38,0) result type is decimal(38,6) under the
    default allowPrecisionLoss, so a quotient above 10^32 overflows the
    38-digit/6-scale budget to NULL (fail-visible, never wrapped).
    Current callers (BTL micro-units, weighted PageRank) keep quotients
    near 1e19; a new caller needing >1e32 must restructure (divide in
    two stages or rescale the micro-units) rather than rely on this
    helper.  Spark's ``div`` operator is NOT usable for this —
    IntegralDivide returns LONG and silently WRAPS when the quotient
    exceeds 2^63 (verified: 2e7 * 1e24 div 2e12 returns a negative),
    which a 100 TB input reaches on one hot key."""
    q = (F.expr(f"({num}) - pmod({num}, {den})")) / F.expr(den)
    return q.cast("decimal(38,0)")
