"""Query catalog: every operator from SURVEY.md §2 as a named pair of
(PySpark builder, DuckDB oracle SQL).

The driver contract (__spark_entry__.py) runs each builder and its oracle
side-by-side at sf0.01 and compares row count + schema + order-insensitive
value hash.  Determinism rules every query here follows:

* Money/aggregate sums go through exact DECIMAL arithmetic, then a final
  CAST to DOUBLE — bit-identical across engines regardless of
  partitioning/summation order.
* Averages are computed as exact-decimal-sum / count in both engines.
* Floating point folds over arrays (dot products) use an explicit
  sequential left-to-right double accumulation in both engines.
* Every LIMIT is preceded by a total ORDER BY with a unique tiebreak.
* Raw timestamps are bucketed (date_trunc) or cast to string/epoch; the
  events table is µs-precision so both engines see identical instants.
* Integer-to-double conversions of values that can exceed 2**64 go
  through VARCHAR in the oracle: DuckDB's direct HUGEINT→DOUBLE and
  DECIMAL(38,0)→DOUBLE casts are NOT correctly rounded above 2**64
  (measured: ~1/1500 values off by 1 ulp) while Spark's
  Decimal→Double is, so `CAST(x AS DOUBLE)` silently diverges there;
  `CAST(CAST(x AS VARCHAR) AS DOUBLE)` is correctly rounded (strtod).
  Found via events_acf_hourly, whose n-scaled squares cross 2**64
  already at sf0.01 (round-11 review).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    # ANSI SQL for DuckDB; None → rows-only check.  A zero-arg callable
    # defers oracle construction (and any filesystem prep it needs, e.g.
    # the fotmob landing zone) from module import to oracle_sql() time.
    oracle: str | Callable[[], str] | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""

    def oracle_text(self) -> str | None:
        return self.oracle() if callable(self.oracle) else self.oracle


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | Callable[[], str] | None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable:
    """Decorator: add a (builder, oracle) pair to the catalog."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            # A silent overwrite would replace an already-verified
            # (builder, oracle) pair with an untested one — fail loud.
            raise ValueError(f"duplicate catalog registration: {name!r}")
        QUERIES[name] = QuerySpec(name=name, builder=fn, oracle=oracle, tags=tags, doc=doc)
        return fn

    return deco


def query_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: spec.builder for name, spec in QUERIES.items()}


def oracle_map() -> dict[str, str]:
    _load_all()
    return {
        name: spec.oracle_text()
        for name, spec in QUERIES.items()
        if spec.oracle is not None
    }


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    import fotmobdatapipeline_spark.plans.advanced  # noqa: F401
    import fotmobdatapipeline_spark.plans.analytics  # noqa: F401
    import fotmobdatapipeline_spark.plans.core  # noqa: F401
    import fotmobdatapipeline_spark.plans.events  # noqa: F401
    import fotmobdatapipeline_spark.plans.llmdata  # noqa: F401
    import fotmobdatapipeline_spark.plans.preference  # noqa: F401

    _LOADED = True


if __name__ == "__main__":
    # Catalog listing: python -m fotmobdatapipeline_spark.plans.catalog
    # (under -m this file runs as __main__, so use the canonical module
    # instance the plan modules actually register into)
    from fotmobdatapipeline_spark.plans import catalog as _canonical

    _canonical._load_all()
    queries = _canonical.QUERIES
    rows_only = [n for n, s in queries.items() if s.oracle is None]
    print(f"{len(queries)} queries ({len(queries) - len(rows_only)} oracle-exact, "
          f"{len(rows_only)} rows-only)\n")
    for name in sorted(queries):
        spec = queries[name]
        mark = " " if spec.oracle is not None else "R"
        tags = ",".join(spec.tags)
        doc = f"  — {spec.doc}" if spec.doc else ""
        print(f"{mark} {name:32s} [{tags}]{doc}")
