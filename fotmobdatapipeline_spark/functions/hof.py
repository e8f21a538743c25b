"""Higher-order-function evaluation helpers.

Spark evaluates a lambda's BODY once per array element, and any outer
(non-lambda-variable) expression the body references is re-evaluated on
every invocation — a d-element ``transform`` whose body mentions a
tokenize/hash subtree runs that subtree d times per row.  Catalyst's
common-subexpression elimination does not reach across lambda scopes,
so the fix is structural: route the shared subtree through a 1-element
``transform`` to turn it into a lambda-bound VALUE.

Measured on the sf0.1 documents table: binding the token split in
``word_shingles`` took the explode-shingles scan from 1.5s to 0.45s
warm (the split had been re-run once per shingle — O(tokens²) work).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind_once(col: Column, fn) -> Column:
    """Evaluate ``col`` once per row and pass the VALUE into ``fn``:
    ``transform(array(col), v -> fn(v))[1]``.  Semantically an identity
    (same expression tree inside ``fn``, bit-identical results) — only
    the evaluation count changes."""
    return F.element_at(F.transform(F.array(col), fn), 1)
