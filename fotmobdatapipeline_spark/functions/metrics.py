"""Derived dashboard metrics.

Reference parity: M1 — the Looker layer surfaces xG and xGOT directly and
computes SGA (shooting goals added) = xGOT - xG (README.md:5, :151).  In
this engine the metric is a first-class column expression so it is
computed inside whole-stage codegen, not in a BI tool.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sga(xgot: str | Column = "xGOT", xg: str | Column = "xG") -> Column:
    """Shooting goals added: how much post-shot quality exceeded pre-shot
    expectation.  NULL when xGOT is NULL (off-target shots), matching the
    reference's Looker behavior."""
    xgot_c = F.col(xgot) if isinstance(xgot, str) else xgot
    xg_c = F.col(xg) if isinstance(xg, str) else xg
    return (xgot_c - xg_c).alias("sga")
