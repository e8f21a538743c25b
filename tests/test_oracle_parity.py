"""Oracle-differential tests — the in-repo replica of the driver's
correctness gate (__spark_entry__.py): run every catalog query in Spark
AND its DuckDB oracle at sf0.01, then compare row count, column names,
and the order-insensitive multiset of values EXACTLY (no tolerance —
the engine's determinism rules must make values bit-identical).
"""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_ORACLE


def _normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def _spark_rows(df):
    cols = sorted(df.columns)
    return [tuple(_normalize(row[c]) for c in cols) for row in df.collect()], cols


def _duck_rows(con, sql):
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(_normalize(r[i]) for i in order) for r in res.fetchall()]
    return rows, sorted(cols)


def _query_names():
    from fotmobdatapipeline_spark.plans.catalog import QUERIES, _load_all

    _load_all()
    return sorted(QUERIES)


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, duck, name):
    from fotmobdatapipeline_spark.plans.catalog import QUERIES

    spec = QUERIES[name]
    df = spec.builder(spark, SF_ORACLE)
    s_rows, s_cols = _spark_rows(df)
    if spec.oracle is None:
        assert len(s_rows) >= 0  # rows-only check, mirrors the driver
        return
    d_rows, d_cols = _duck_rows(duck, spec.oracle_text())
    assert s_cols == d_cols, f"{name}: column names differ: {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs oracle {len(d_rows)}"
    )
    assert sorted(s_rows, key=repr) == sorted(d_rows, key=repr), (
        f"{name}: value multiset differs"
    )
