"""Oracle-checked queries for the streaming operator surface.

Registered via their BATCH form: each window builder in
``log2sql_spark.streaming.windows`` accepts batch or streaming input
unchanged, so verifying the batch plan against DuckDB verifies the very
code the streaming path runs (streaming-only semantics — watermarks,
state across micro-batches — are covered by tests/test_streaming.py with
real readStream/writeStream runs; those cannot be expressed in oracle
SQL, SURVEY.md §5.2)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log2sql_spark.registry import query
from log2sql_spark.sources.tables import load_table
from log2sql_spark.streaming.windows import session_windows, sliding_counts, tumbling_counts


@query(
    "stream_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS window_start,
           time_bucket(INTERVAL 5 MINUTE, ts) + INTERVAL 5 MINUTE AS window_end,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY window_start, event_type
    """,
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time windows (same builder the stream runs)."""
    return tumbling_counts(load_table(spark, "events", sf_dir)).orderBy(
        "window_start", "event_type"
    )


@query(
    "stream_sliding_window",
    oracle="""
    SELECT time_bucket(INTERVAL 5 MINUTE, ts) - k.k * INTERVAL 5 MINUTE AS window_start,
           time_bucket(INTERVAL 5 MINUTE, ts) - k.k * INTERVAL 5 MINUTE + INTERVAL 10 MINUTE AS window_end,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events, (VALUES (0), (1)) k(k)
    GROUP BY 1, 2
    ORDER BY window_start
    """,
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (width 10m, slide 5m): every event in 2 windows."""
    return sliding_counts(load_table(spark, "events", sf_dir)).orderBy("window_start")


@query(
    "stream_session_window",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
      FROM events
    ), numbered AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS session_value
    FROM numbered
    GROUP BY user_id, session_no
    ORDER BY user_id, session_start
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows, 30-minute inactivity gap. DuckDB oracle
    computes the same sessions via gaps-and-islands."""
    return session_windows(load_table(spark, "events", sf_dir)).orderBy(
        "user_id", "session_start"
    )


@query(
    "stream_dedup",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_after_dedup,
           (SELECT CAST(count(*) AS BIGINT) FROM events) AS n_original
    FROM (SELECT DISTINCT event_id FROM (SELECT * FROM events UNION ALL SELECT * FROM events))
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once style dedup by event id over an at-least-once (here:
    doubled) stream; streaming twin is dropDuplicatesWithinWatermark."""
    ev = load_table(spark, "events", sf_dir)
    doubled = ev.unionAll(ev)
    return (
        doubled.dropDuplicates(["event_id"])
        .agg(F.count("*").alias("n_after_dedup"))
        .crossJoin(ev.agg(F.count("*").alias("n_original")))
    )


@query(
    "stream_static_join",
    oracle="""
    SELECT c_mktsegment, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment (batch form of the same
    builder the stream runs): events x customer dimension, per-segment
    event rollup. Money via integer cents."""
    from log2sql_spark.streaming.windows import static_enrich_counts

    events = load_table(spark, "events", sf_dir)
    dim = load_table(spark, "customer", sf_dir).select("c_custkey", "c_mktsegment")
    return static_enrich_counts(events, dim).orderBy("c_mktsegment", "event_type")
