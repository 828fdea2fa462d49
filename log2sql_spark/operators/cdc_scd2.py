"""SCD2 history from the CDC envelope: versioned rows with validity
intervals.

The natural downstream of a change stream: instead of applying changes
(``streaming/cdc_stream.py``) or rendering SQL (``operators/
cdc_codegen.py``), keep *every* version with ``valid_from``/``valid_to``
— the slowly-changing-dimension type-2 table warehouses build from CDC.

One window over (key ORDER BY ts, position): ``valid_to`` is the next
version's ``valid_from``; deletes close the interval without opening a
new one. Single shuffle on the key — the same partitioning an at-scale
history table would be stored under.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def scd2_history(
    resolved: DataFrame,
    key_col: str,
    ts_col: str = "event_ts",
) -> DataFrame:
    """Envelope → versioned history.

    Returns one row per non-delete version carrying the after-image map,
    with ``valid_from`` (its event time), ``valid_to`` (next change's
    event time, NULL while current) and ``is_current``. A delete closes
    the previous version's interval (its row produces no version).
    """
    keyed = resolved.withColumn(
        "_key", F.element_at(F.coalesce("after", "before"), key_col)
    )
    w = W.partitionBy("_key").orderBy(ts_col, "start_pos", "event_seq")
    with_next = keyed.withColumn("_next_ts", F.lead(ts_col).over(w)).withColumn(
        "_next_op", F.lead("op").over(w)
    )
    return (
        with_next.filter(F.col("op") != "delete")
        .select(
            F.col("_key").alias("key"),
            F.col("op").alias("version_op"),
            F.col("after").alias("row_image"),
            F.col(ts_col).alias("valid_from"),
            F.col("_next_ts").alias("valid_to"),
            F.col("_next_ts").isNull().alias("is_current"),
        )
    )
