"""Persistent CDC envelope store: partitioned parquet, pruned reads.

At 100 TB of change events the envelope is not reparsed from text per
query — it lands once in a partitioned columnar store and every
downstream read prunes:

* partition layout ``db=…/table=…/op=…`` turns the reference's
  db/table/type filters (``log2sql.py:59-61``) into directory pruning —
  zero I/O for excluded tables;
* position/timestamp range filters (``main.py:91-101``) push down to
  parquet row-group statistics (min/max on start_pos / event_ts).

This module is the batch landing path; the streaming twin is
``streaming/cdc_stream.py`` writing the same layout per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from log2sql_spark.operators.cdc_filters import filter_events

PARTITION_COLS = ("db", "table", "op")


def write_envelope_store(envelope: DataFrame, path: str, mode: str = "append") -> None:
    """Land the envelope partitioned by (db, table, op)."""
    envelope.write.mode(mode).partitionBy(*PARTITION_COLS).parquet(path)


def read_envelope_store(spark: SparkSession, path: str, **filters) -> DataFrame:
    """Read with the standard CDC filters; db/table/op become partition
    pruning, position/datetime ranges push to row-group stats."""
    return filter_events(spark.read.parquet(path), **filters)
