"""Column profiling + deterministic sampling (data-quality surface).

Pipeline hygiene operators a 100 TB ingest needs before anything else
runs: per-column null/distinct/min/max profiles (one pass, all columns
aggregated together) and a hash-based deterministic sample (reproducible
across runs and engines, unlike TABLESAMPLE/rand()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from log2sql_spark.operators.dedup import md5_long


def profile_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """One row per column: n_rows, n_nulls, n_distinct, min/max (as
    strings, so heterogeneous column types stack into one frame).
    Single aggregation pass — every stat for every column computes in
    the same partial-aggregate."""
    aggs = []
    for c in columns:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(F.count("*").alias("__n"), *aggs)
    stack_expr = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in columns
    )
    return wide.selectExpr(
        "__n AS n_rows",
        f"stack({len(columns)}, {stack_expr}) AS (column, n_nulls, n_distinct, min_str, max_str)",
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str")


def hash_sample(df: DataFrame, key_col: str, fraction_pct: int) -> DataFrame:
    """Deterministic ~fraction_pct% sample: keep rows whose md5-derived
    key hash lands under the threshold. Identical selection in any
    engine/run — reproducible experiment splits."""
    return df.filter(
        F.pmod(md5_long(F.col(key_col).cast("string")), F.lit(100)) < fraction_pct
    )
