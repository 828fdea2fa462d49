"""Event-time windowed aggregations (batch + streaming, one definition).

The reference is fully offline (``main.py:104`` materializes the whole
dump; no windows, no watermarks — SURVEY.md §2.2). These operators give
the engine the streaming-analytics surface: tumbling / sliding / session
windows with watermark-based late-data handling. Each builder takes ANY
events-shaped DataFrame — batch or streaming — so the driver's batch
oracle checks and the streaming pytest exercise the exact same code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, width: str = "5 minutes", watermark: str | None = None) -> DataFrame:
    """Per event_type counts/sums in fixed windows. With a watermark the
    same plan runs incrementally and drops rows later than the bound."""
    if watermark:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(events: DataFrame, width: str = "10 minutes", slide: str = "5 minutes") -> DataFrame:
    """Overlapping windows: each event lands in width/slide windows."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count("*").alias("n_events"), F.countDistinct("user_id").alias("n_users"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "n_users",
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes", watermark: str | None = None) -> DataFrame:
    """Per-user sessions: a session closes after ``gap`` of inactivity.
    Session end (Spark semantics) = last event ts + gap."""
    if watermark:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def static_enrich_counts(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment: events joined to a static dimension
    (broadcast — the dimension is loaded once per executor and never
    shuffles the stream side), aggregated per (segment, event_type).

    In streaming this is the canonical stream-static join: the static
    side is re-broadcast per micro-batch, no state store involved. The
    builder takes batch or streaming events unchanged."""
    return (
        events.join(F.broadcast(dim), events["user_id"] == dim["c_custkey"])
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0).alias("total_value"),
        )
    )


def ohlc_bars(
    events: DataFrame, width: str = "1 hour", watermark: str | None = None
) -> DataFrame:
    """OHLC bars per (window, event_type): open/close selected by
    min_by/max_by over the unique ingest sequence (event_id), high/low
    by extremes — all distributive aggregates, so the SAME plan runs
    batch or incrementally under a watermark (streaming pytest in
    tests/test_streaming.py; batch twin oracle: stream_ohlc_window).
    Money stays integer cents."""
    cents = F.round(F.col("value") * 100).cast("long")
    if watermark:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.min_by(cents, F.col("event_id")).alias("open_cents"),
            F.max(cents).alias("high_cents"),
            F.min(cents).alias("low_cents"),
            F.max_by(cents, F.col("event_id")).alias("close_cents"),
            F.count(F.lit(1)).alias("volume"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "open_cents",
            "high_cents",
            "low_cents",
            "close_cents",
            "volume",
        )
    )
