"""Row-level CDC event filters + range pruning.

Reference surface: the db/table/type filters applied per event at
``log2sql.py:59-61`` (args from ``main.py:67-76``) and the
position/datetime range pushed into the mysqlbinlog argv at
``main.py:91-101``. Here they are ordinary Catalyst predicates — the
optimizer pushes them below the catalog join automatically (the
reference runs them *after* its catalog lookups, SURVEY.md §4.1), and
against a partitioned envelope store they become partition pruning.
"""

from __future__ import annotations

from collections.abc import Sequence
from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_events(
    envelope: DataFrame,
    sql_types: Sequence[str] | None = None,
    database: str | None = None,
    tables: Sequence[str] | None = None,
    start_position: int | None = None,
    stop_position: int | None = None,
    start_datetime: datetime | str | None = None,
    stop_datetime: datetime | str | None = None,
    include_ddl: bool = False,
) -> DataFrame:
    """Keep events matching every provided constraint (None = no-op).

    ``include_ddl=True`` keeps ``op='ddl'`` rows regardless of
    ``sql_types`` — a *reachable* version of the reference's dead
    ``--only-dml`` flag (main.py:73-74).
    """
    df = envelope
    cond = F.lit(True)
    if sql_types:
        cond &= F.col("op").isin([t.lower() for t in sql_types])
    if database:
        cond &= F.col("db") == database
    if tables:
        cond &= F.col("table").isin(list(tables))
    if include_ddl:
        cond = cond | (F.col("op") == "ddl")
    elif not sql_types:
        cond &= F.col("op") != "ddl"
    df = df.filter(cond)
    if start_position is not None:
        df = df.filter(F.col("start_pos") >= start_position)
    if stop_position is not None:
        df = df.filter(F.col("stop_pos") <= stop_position)
    if start_datetime is not None:
        df = df.filter(F.col("event_ts") >= F.lit(start_datetime).cast("timestamp"))
    if stop_datetime is not None:
        df = df.filter(F.col("event_ts") < F.lit(stop_datetime).cast("timestamp"))
    return df


def dedup_by_gtid(envelope: DataFrame) -> DataFrame:
    """Exactly-once across re-delivered dumps: keep each GTID's events
    from ONE delivery (the lexicographically first file that contains
    the transaction), drop every other copy.

    A replication retry or an overlapping ``mysqlbinlog`` re-dump
    delivers the same transactions twice; replaying them twice double-
    applies non-idempotent changes. GTIDs (``SET @@SESSION.GTID_NEXT``
    preambles, parsed into the envelope's ``gtid`` column) identify a
    transaction globally, so dedup is a per-GTID winner pick — one
    shuffle on ``gtid``, state bounded by |transactions|, no pairwise
    comparison. GTID-less events (anonymous transactions, dumps from
    servers without GTIDs) pass through untouched: there is nothing
    safe to dedup on, matching MySQL's own semantics where exactly-once
    replication REQUIRES gtid_mode.

    Upstream analog: the reference parses dumps independently and would
    re-print duplicated transactions (no GTID handling anywhere in
    ``log2sql.py``); this operator is what its online twin needs.
    """
    from pyspark.sql import Window as W

    keeper = F.min("file").over(W.partitionBy("gtid"))
    return envelope.withColumn("_keep_file", keeper).filter(
        F.col("gtid").isNull() | (F.col("file") == F.col("_keep_file"))
    ).drop("_keep_file")
