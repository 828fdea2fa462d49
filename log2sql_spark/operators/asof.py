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
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join per ``by`` key: ``direction='backward'`` picks the
    latest ``right`` row with ``right.on <= left.on``; ``'forward'`` the
    earliest with ``right.on >= left.on``. Returns all left columns +
    requested right columns.

    Ties on the timestamp resolve to the right row (matches
    pandas.merge_asof and DuckDB ASOF JOIN semantics). With
    ``tolerance_seconds``, a match farther than the tolerance is nulled
    out — the left row is kept (merge_asof tolerance semantics).

    The right side is carried as ONE struct column with a single
    ``last(ignorenulls=True)``: carrying each right column independently
    would stitch columns from DIFFERENT right rows whenever the latest
    right row holds a NULL in one of them — merge_asof/ASOF JOIN carry
    the whole latest row, NULL fields included. Either direction costs
    ONE shuffle on the key (the window's sort order flips, nothing else).
    """
    import pyspark.sql.types as T

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    right_cols = right_cols or [c for c in right.columns if c not in (on, by)]
    # _match_ts rides inside the struct so tolerance can compare against
    # the ACTUAL matched row's timestamp after the window carry.
    r_struct_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in right_cols]
        + [T.StructField("_match_ts", right.schema[on].dataType)]
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
        F.struct(
            *[F.col(c).alias(c) for c in right_cols],
            F.col(on).alias("_match_ts"),
        ).alias("_r"),
    )
    # right rows sort before left rows at equal ts (side 0 < 1) so an
    # exactly-simultaneous right row IS visible to the left row; for
    # 'forward' the timestamp order flips and the carry runs backwards
    # through time, yielding the earliest following right row.
    order = [F.col("_ts").desc() if direction == "forward" else F.col("_ts").asc(), "_side"]
    w = (
        W.partitionBy("_key")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = lt.unionByName(rt).select(
        "_side",
        "_ts",
        "_l",
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    )
    if tolerance_seconds is not None:
        # cast covers TIMESTAMP_NTZ inputs (session TZ is pinned to UTC)
        within = (
            F.abs(
                F.unix_micros(F.col("_r._match_ts").cast("timestamp"))
                - F.unix_micros(F.col("_ts").cast("timestamp"))
            )
            <= int(tolerance_seconds * 1_000_000)
        )
        carried = carried.withColumn(
            "_r", F.when(within, F.col("_r")).otherwise(F.lit(None).cast(r_struct_type))
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


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """``direction='nearest'`` as-of join (pandas merge_asof parity):
    each left row takes the right row with the smallest ABSOLUTE time
    distance; exact-distance ties go to the backward (earlier) row,
    matching merge_asof. Still ONE shuffle on the key: both sides union
    into a single (ts, side) sort, the backward candidate is carried
    with ``last(ignoreNulls)`` over preceding rows and the forward one
    with ``first(ignoreNulls)`` over following rows — two frame scans
    of the same sorted partition, no second exchange, no per-row probe.
    With ``tolerance_seconds``, a winner farther than the tolerance is
    nulled out and the left row kept."""
    import pyspark.sql.types as T

    right_cols = right_cols or [c for c in right.columns if c not in (on, by)]
    r_struct_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in right_cols]
        + [T.StructField("_match_ts", right.schema[on].dataType)]
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
        F.struct(
            *[F.col(c).alias(c) for c in right_cols],
            F.col(on).alias("_match_ts"),
        ).alias("_r"),
    )
    # Right rows sort before left at the same ts, so a simultaneous
    # right row lands in the BACKWARD carry at distance 0 (and wins any
    # tie, per the backward tie rule).
    wb = (
        W.partitionBy("_key")
        .orderBy("_ts", "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy("_key")
        .orderBy("_ts", "_side")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    carried = lt.unionByName(rt).select(
        "_side",
        "_ts",
        "_l",
        F.last("_r", ignorenulls=True).over(wb).alias("_b"),
        F.first("_r", ignorenulls=True).over(wf).alias("_f"),
    )
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    d_b = us(F.col("_ts")) - us(F.col("_b._match_ts"))
    d_f = us(F.col("_f._match_ts")) - us(F.col("_ts"))
    nearest = F.when(
        F.col("_b").isNull(), F.col("_f")
    ).when(
        F.col("_f").isNull() | (d_b <= d_f), F.col("_b")
    ).otherwise(F.col("_f"))
    carried = carried.withColumn("_r", nearest)
    if tolerance_seconds is not None:
        within = (
            F.abs(us(F.col("_r._match_ts")) - us(F.col("_ts")))
            <= int(tolerance_seconds * 1_000_000)
        )
        carried = carried.withColumn(
            "_r",
            F.when(within, F.col("_r")).otherwise(F.lit(None).cast(r_struct_type)),
        )
    return carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_r.{c}").alias(c) for c in right_cols],
    )
