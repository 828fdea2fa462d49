"""Scalar/expression helpers shared across the engine."""

from log2sql_spark.functions.exact import cents, exact_money_sum  # noqa: F401
from log2sql_spark.functions.compare import null_safe_predicate  # noqa: F401
