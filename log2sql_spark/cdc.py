"""End-to-end CDC pipeline: binlog dump → replay / flashback SQL.

The engine-level equivalent of the reference's ``__main__`` driver
(``main.py:109-116``): scan → parse → catalog resolve → filter → codegen,
expressed as one lazy DataFrame chain Catalyst plans as a whole.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from log2sql_spark.operators.cdc_codegen import flashback_sql, replay_sql
from log2sql_spark.operators.cdc_filters import filter_events
from log2sql_spark.sources.binlog import read_binlog
from log2sql_spark.sources.catalog import resolve_columns


def binlog_to_sql(
    spark: SparkSession,
    path: str,
    catalog: DataFrame,
    flashback: bool = False,
    **filters,
) -> DataFrame:
    """Full pipeline. ``filters`` forwards to
    :func:`log2sql_spark.operators.cdc_filters.filter_events`.

    Returns a DataFrame with the envelope columns plus ``pos_info`` and
    ``sql_text``, ordered for application (forward for replay, reverse
    for flashback — the rollback ordering the reference lacks,
    README.md:23-27).
    """
    envelope = read_binlog(spark, path)
    envelope = filter_events(envelope, **filters)
    resolved = resolve_columns(envelope, catalog)
    return flashback_sql(resolved) if flashback else replay_sql(resolved)
