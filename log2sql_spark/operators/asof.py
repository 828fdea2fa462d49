"""As-of (time-travel) join: for each left row, the latest right row at
or before its timestamp, per key.

Spark has no native ASOF JOIN (SURVEY.md §2.2 join row). Two
implementations with identical semantics:

* :func:`asof_join` — **union + window**: tag both sides, union, sort
  within key by (ts, side), and carry the last right-side values forward
  with ``last(..., ignoreNulls=True)``. ONE shuffle on the key — the
  same cost as a co-partitioned join; no per-row probing. This is the
  100 TB path: the union preserves the partitioning, and the window
  runs inside each key partition.
* :func:`asof_join_pandas` — grouped ``applyInPandas`` using
  ``pandas.merge_asof`` per key group: the escape hatch when the
  window trick can't express extra options (tolerance, nearest).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: latest ``right`` row with ``right.on <= left.on``
    per ``by`` key. Returns all left columns + requested right columns.

    Ties on the timestamp resolve to the right row (matches
    pandas.merge_asof and DuckDB ASOF JOIN '<=' semantics).

    The right side is carried as ONE struct column with a single
    ``last(ignorenulls=True)``: carrying each right column independently
    would stitch columns from DIFFERENT right rows whenever the latest
    right row holds a NULL in one of them — merge_asof/ASOF JOIN carry
    the whole latest row, NULL fields included.
    """
    import pyspark.sql.types as T

    right_cols = right_cols or [c for c in right.columns if c not in (on, by)]
    r_struct_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in right_cols]
    )

    lt = left.select(
        F.col(by).alias("_key"),
        F.col(on).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    rt = right.select(
        F.col(by).alias("_key"),
        F.col(on).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(lt.schema["_l"].dataType).alias("_l"),
        F.struct(*[F.col(c).alias(c) for c in right_cols]).alias("_r"),
    )
    # right rows sort before left rows at equal ts (side 0 < 1) so an
    # exactly-simultaneous right row IS visible to the left row.
    w = (
        W.partitionBy("_key")
        .orderBy("_ts", "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = lt.unionByName(rt).select(
        "_side",
        "_l",
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    )
    out = carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_r.{c}").alias(c) for c in right_cols],
    )
    return out


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str] | None = None,
    tolerance: pd.Timedelta | None = None,
) -> DataFrame:
    """merge_asof per key group (cogrouped applyInPandas).

    Shuffles both sides once on the key; each group does an O(n log n)
    local merge — Arrow-batched, no driver involvement."""
    import pyspark.sql.types as T

    right_cols = right_cols or [c for c in right.columns if c not in (on, by)]
    out_schema = T.StructType(
        list(left.schema.fields)
        + [T.StructField(c, right.schema[c].dataType) for c in right_cols]
    )
    l_cols, keep = list(left.columns), list(right_cols)

    def merge(lg: pd.DataFrame, rg: pd.DataFrame) -> pd.DataFrame:
        if lg.empty:
            return pd.DataFrame(columns=l_cols + keep)
        lg = lg.sort_values(on)
        if rg.empty:
            # empty frame must keep the `on` dtype or merge_asof rejects it
            rg = lg[[on]].iloc[0:0].copy()
            for c in keep:
                rg[c] = pd.Series(dtype="object")
        else:
            rg = rg.sort_values(on)[[on] + keep]
        merged = pd.merge_asof(
            lg, rg, on=on, direction="backward", suffixes=("", "_r"), tolerance=tolerance
        )
        for c in keep:  # merge_asof suffixes collisions; normalize back
            if f"{c}_r" in merged.columns:
                merged[c] = merged[f"{c}_r"]
        return merged[l_cols + keep]

    return (
        left.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(merge, schema=out_schema)
    )
