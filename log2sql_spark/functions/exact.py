"""Exact (integer-scaled) money arithmetic.

Cross-engine float determinism rule (see queries/relational.py and the
verify skill): summing doubles is order-dependent and Spark/DuckDB round
differently at decimal-terminating halves, so fixed-point columns are
aggregated as scaled integers — bit-identical in any engine and order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str, scale: int = 100) -> Column:
    """Fixed-point-exact double → exact scaled integer."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * scale, 0).cast("long")


def exact_money_sum(col: Column | str, scale: int = 100) -> Column:
    """sum of a fixed-point column, computed exactly: scaled-int sum
    divided back out. Safe up to 2^63/scale of total value."""
    return F.sum(cents(col, scale)) / float(scale)
