"""Zero-extra-pass data-quality metrics via Spark's Observation API.

At 100 TB, a separate validation query doubles the I/O bill.  Spark's
``df.observe`` evaluates aggregate expressions DURING whatever action
already runs (the sink write, the count, the export) — the metrics ride
the same scan, so quality accounting is free.  This module wraps it as
a rules surface:

* :func:`observe_rules` — attach row counts + per-rule violation counts
  to a frame; works on batch (``pyspark.sql.Observation``) and
  streaming (named observation, metrics surfaced per micro-batch in
  ``StreamingQueryProgress.observedMetrics``) frames with the same
  rules dict;
* :func:`violations` — normalize the observed metrics;
* :func:`streaming_observed` — collect a named observation's metrics
  from a streaming query's progress history (one dict per micro-batch).

Rules are BOOLEAN VIOLATION predicates (True = bad row), kept as native
Column expressions so the observation stays inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def _metric_exprs(rules: dict[str, Column]) -> list[Column]:
    # count(1), not count(col): observed rows must include all-null rows.
    exprs = [F.count(F.lit(1)).alias("rows")]
    for name, pred in rules.items():
        if name == "rows":
            raise ValueError("'rows' is reserved for the total row count")
        # sum-of-indicator, not count(when): NULL predicate results
        # (e.g. comparisons against NULL) count as NOT violated, so a
        # rule is never silently satisfied by nulls it forgot to handle
        # — coalesce makes that explicit.
        exprs.append(
            F.sum(F.coalesce(pred.cast("int"), F.lit(0))).alias(name)
        )
    return exprs


def observe_rules(
    df: DataFrame, rules: dict[str, Column], name: str = "dq"
) -> tuple[DataFrame, Observation | None]:
    """Attach quality-rule observation to ``df``.  Returns the frame to
    keep using (write it, aggregate it — any ONE action materializes the
    metrics) and, for batch frames, the :class:`Observation` whose
    ``.get`` yields ``{"rows": n, <rule>: n_violations, ...}`` after
    that action.  Streaming frames return ``None`` for the observation —
    read per-batch metrics with :func:`streaming_observed`."""
    exprs = _metric_exprs(rules)
    if df.isStreaming:
        return df.observe(name, *exprs), None
    obs = Observation(name)
    return df.observe(obs, *exprs), obs


def violations(metrics: dict, rules: dict[str, Column]) -> dict[str, int]:
    """Violation counts per rule from an observed-metrics dict, with
    sum-over-empty-frame NULLs normalized to 0."""
    return {k: int(metrics.get(k) or 0) for k in rules}


def streaming_observed(query, name: str = "dq") -> list[dict]:
    """All observed-metrics dicts named ``name`` from a streaming
    query's retained progress history, oldest first — one entry per
    micro-batch that actually evaluated the observation.  (Spark retains
    the last ~100 progress events; a long-running monitor should drain
    via a StreamingQueryListener instead.)"""
    out = []
    for p in query.recentProgress:
        om = (p.get("observedMetrics") or {}) if isinstance(p, dict) else (
            p.observedMetrics or {}
        )
        if name in om:
            m = om[name]
            out.append(m if isinstance(m, dict) else m.asDict())
    return out
