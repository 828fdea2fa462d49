"""Stream-stream interval join (streaming/joins.py): two live file
streams joined on key + event-time band, across micro-batch boundaries.

maxFilesPerTrigger=1 guarantees the impression and its click arrive in
DIFFERENT micro-batches, so a correct result REQUIRES the join to
buffer state between batches and match through it — the property that
separates a stream-stream join from per-batch joins.
"""

from __future__ import annotations

import pandas as pd


def _write(df_dict, path):
    pd.DataFrame(df_dict).to_parquet(path, coerce_timestamps="us")


def test_stream_stream_interval_join_across_batches(spark, tmp_path, state_provider):
    from log2sql_spark.streaming.joins import attribution_interval_join

    imp_dir, clk_dir = tmp_path / "imp", tmp_path / "clk"
    imp_dir.mkdir(); clk_dir.mkdir()
    # batch 1: impressions only
    _write({
        "ad_id": [1, 2, 3],
        "imp_ts": pd.to_datetime([
            "2024-05-01 12:00:00", "2024-05-01 12:01:00", "2024-05-01 12:02:00",
        ]),
    }, imp_dir / "i0.parquet")
    # clicks arrive in a LATER micro-batch: ad 1 inside the 10-minute
    # window, ad 2 outside it (25 min later), ad 3 never clicks
    _write({
        "c_ad_id": [1, 2],
        "clk_ts": pd.to_datetime([
            "2024-05-01 12:05:00", "2024-05-01 12:26:00",
        ]),
    }, clk_dir / "c0.parquet")

    imp = (
        spark.readStream.schema("ad_id long, imp_ts timestamp")
        .option("maxFilesPerTrigger", "1").parquet(str(imp_dir))
    )
    clk = (
        spark.readStream.schema("c_ad_id long, clk_ts timestamp")
        .option("maxFilesPerTrigger", "1").parquet(str(clk_dir))
    )
    joined = attribution_interval_join(imp, clk)
    q = (
        joined.writeStream.format("memory").queryName("attrib_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT ad_id, c_ad_id FROM attrib_out").collect()
    # only ad 1: inside the band; ad 2's click is out of band; ad 3 unmatched
    assert [(r.ad_id, r.c_ad_id) for r in rows] == [(1, 1)]
    # the join ran as a real stream-stream join with buffered state
    progress = q.recentProgress
    assert any(
        op.get("operatorName") == "symmetricHashJoin"
        and op.get("numRowsTotal", 0) > 0
        for p in progress for op in p.get("stateOperators", [])
    )


def test_stream_stream_left_outer_emits_unmatched_after_watermark(spark, tmp_path, state_provider):
    """Outer results may only surface once the watermark PROVES no
    match can arrive: a late second file advances event time far past
    every impression's band, after which the unmatched impressions (ads
    2, 3) emit with NULL click columns."""
    from log2sql_spark.streaming.joins import attribution_interval_join

    imp_dir, clk_dir = tmp_path / "imp", tmp_path / "clk"
    imp_dir.mkdir(); clk_dir.mkdir()
    _write({
        "ad_id": [1, 2, 3],
        "imp_ts": pd.to_datetime([
            "2024-05-01 12:00:00", "2024-05-01 12:01:00", "2024-05-01 12:02:00",
        ]),
    }, imp_dir / "i0.parquet")
    _write({
        "c_ad_id": [1],
        "clk_ts": pd.to_datetime(["2024-05-01 12:05:00"]),
    }, clk_dir / "c0.parquet")
    # watermark-advancing traffic on BOTH sides (event time >> any band)
    _write({
        "ad_id": [99],
        "imp_ts": pd.to_datetime(["2024-05-01 14:00:00"]),
    }, imp_dir / "i1.parquet")
    _write({
        "c_ad_id": [99],
        "clk_ts": pd.to_datetime(["2024-05-01 14:00:01"]),
    }, clk_dir / "c1.parquet")

    imp = (
        spark.readStream.schema("ad_id long, imp_ts timestamp")
        .option("maxFilesPerTrigger", "1").parquet(str(imp_dir))
    )
    clk = (
        spark.readStream.schema("c_ad_id long, clk_ts timestamp")
        .option("maxFilesPerTrigger", "1").parquet(str(clk_dir))
    )
    joined = attribution_interval_join(imp, clk, how="left_outer")
    q = (
        joined.writeStream.format("memory").queryName("attrib_outer")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.ad_id, r.c_ad_id)
        for r in spark.sql("SELECT ad_id, c_ad_id FROM attrib_outer").collect()
    }
    assert (1, 1) in got and (99, 99) in got      # matched pairs
    assert (2, None) in got and (3, None) in got  # proven-unmatched emit


def test_interval_join_rejects_unknown_how(spark):
    import pytest

    from log2sql_spark.streaming.joins import attribution_interval_join

    df = spark.createDataFrame([], "ad_id long, imp_ts timestamp")
    clk = spark.createDataFrame([], "c_ad_id long, clk_ts timestamp")
    with pytest.raises(ValueError, match="inner|left_outer|full_outer"):
        attribution_interval_join(df, clk, how="cross")


def test_stream_stream_full_outer_emits_both_orphans(spark, tmp_path, state_provider):
    """full_outer = left_outer + orphan CLICKS (a click with no
    qualifying impression — bot traffic / window misses) with NULL
    impression columns, still watermark-gated on both sides."""
    from log2sql_spark.streaming.joins import attribution_interval_join

    imp_dir, clk_dir = tmp_path / "imp", tmp_path / "clk"
    imp_dir.mkdir(); clk_dir.mkdir()
    _write({
        "ad_id": [1, 2],
        "imp_ts": pd.to_datetime([
            "2024-05-01 12:00:00", "2024-05-01 12:01:00",
        ]),
    }, imp_dir / "i0.parquet")
    _write({
        # ad 1 clicks in-window; ad 7 never had an impression; ad 2's
        # click lands an HOUR late (outside the 10-minute band)
        "c_ad_id": [1, 7, 2],
        "clk_ts": pd.to_datetime([
            "2024-05-01 12:05:00", "2024-05-01 12:06:00",
            "2024-05-01 13:30:00",
        ]),
    }, clk_dir / "c0.parquet")
    # watermark-advancing traffic on both sides
    _write({
        "ad_id": [99],
        "imp_ts": pd.to_datetime(["2024-05-01 15:00:00"]),
    }, imp_dir / "i1.parquet")
    _write({
        "c_ad_id": [99],
        "clk_ts": pd.to_datetime(["2024-05-01 15:00:01"]),
    }, clk_dir / "c1.parquet")

    imp = (
        spark.readStream.schema("ad_id long, imp_ts timestamp")
        .option("maxFilesPerTrigger", "1").parquet(str(imp_dir))
    )
    clk = (
        spark.readStream.schema("c_ad_id long, clk_ts timestamp")
        .option("maxFilesPerTrigger", "1").parquet(str(clk_dir))
    )
    joined = attribution_interval_join(imp, clk, how="full_outer")
    q = (
        joined.writeStream.format("memory").queryName("attrib_full")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.ad_id, r.c_ad_id)
        for r in spark.sql("SELECT ad_id, c_ad_id FROM attrib_full").collect()
    }
    assert (1, 1) in got and (99, 99) in got  # matched
    assert (2, None) in got                   # unmatched impression
    assert (None, 7) in got                   # orphan click (no imp at all)
    assert (None, 2) in got                   # out-of-band click is an orphan
