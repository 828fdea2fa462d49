"""NULL-aware comparison helpers (reference analogue: compare_items at
log2sql.py:127-132 — the literal-NULL → IS NULL rendering)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def null_safe_predicate(left: Column, right: Column) -> Column:
    """Evaluating form of the reference's NULL-aware equality:
    ``a <=> b`` (never NULL, NULL==NULL is true)."""
    return left.eqNullSafe(right)


def render_predicate(name: Column, value: Column) -> Column:
    """Rendering form (SQL-text codegen): ```col` IS NULL`` for the
    literal NULL token, else ```col`=value`` — same contract as the CDC
    codegen's predicate builder."""
    bt = F.concat(F.lit("`"), name, F.lit("`"))
    return F.when(value == "NULL", F.concat(bt, F.lit(" IS NULL"))).otherwise(
        F.concat(bt, F.lit("="), value)
    )
