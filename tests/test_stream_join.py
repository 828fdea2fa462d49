"""Stream-stream join: watermarked, time-bounded inner join of two file
streams (the Structured Streaming capability the offline reference's
architecture cannot express)."""

from __future__ import annotations

import os
import time
from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_stream_stream_time_bounded_join(spark, tmp_path):
    clicks_dir, buys_dir = tmp_path / "clicks", tmp_path / "buys"
    click_schema = T.StructType(
        [T.StructField("click_ts", T.TimestampType()), T.StructField("user_id", T.LongType())]
    )
    buy_schema = T.StructType(
        [
            T.StructField("buy_ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("amount", T.DoubleType()),
        ]
    )
    t = lambda m: datetime(2024, 5, 1, 10, m)  # noqa: E731

    def write(d, schema, cols, rows):
        pdf = pd.DataFrame(rows, columns=cols)
        spark.createDataFrame(pdf, schema).coalesce(1).write.mode("append").json(str(d))
        now = time.time()
        for p in d.iterdir():
            os.utime(p, (now, now))

    write(clicks_dir, click_schema, ["click_ts", "user_id"], [
        (t(0), 1),   # followed by a buy at 10:05 -> join
        (t(2), 2),   # followed by a buy at 10:20 -> outside 10-minute bound
        (t(4), 3),   # no buy
    ])
    write(buys_dir, buy_schema, ["buy_ts", "user_id", "amount"], [
        (t(5), 1, 9.99),
        (t(20), 2, 5.00),
        (t(50), 99, 1.00),  # advances the buys watermark so state closes
    ])

    clicks = (
        spark.readStream.schema(click_schema).json(str(clicks_dir)).withWatermark("click_ts", "5 minutes")
    )
    buys = (
        spark.readStream.schema(buy_schema).json(str(buys_dir)).withWatermark("buy_ts", "5 minutes")
    )
    joined = clicks.join(
        buys,
        (clicks["user_id"] == buys["user_id"])
        & (buys["buy_ts"] >= clicks["click_ts"])
        & (buys["buy_ts"] <= clicks["click_ts"] + F.expr("INTERVAL 10 MINUTES")),
        "inner",
    )
    q = (
        joined.select(clicks["user_id"], "click_ts", "buy_ts", "amount")
        .writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from ssj").collect()
    assert [(r["user_id"], r["amount"]) for r in rows] == [(1, 9.99)]


def test_stream_stream_left_outer_join_emits_after_watermark(spark, tmp_path):
    """LEFT OUTER stream-stream join: unmatched clicks must emit
    null-extended — but only once the watermark passes the join bound
    (the outer row cannot be produced while a matching buy could still
    arrive). Two checkpointed runs: run 1 ingests clicks+buys; run 2
    ingests a far-future buy that advances the watermark, flushing the
    outer rows for the unmatched clicks."""
    clicks_dir, buys_dir = tmp_path / "lclicks", tmp_path / "lbuys"
    ckpt = str(tmp_path / "lckpt")
    out_dir = str(tmp_path / "lout")
    click_schema = T.StructType(
        [T.StructField("click_ts", T.TimestampType()), T.StructField("user_id", T.LongType())]
    )
    buy_schema = T.StructType(
        [
            T.StructField("buy_ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("amount", T.DoubleType()),
        ]
    )
    t = lambda m: datetime(2024, 5, 1, 10, 0) + timedelta(minutes=m)  # noqa: E731

    def write(d, schema, cols, rows):
        pdf = pd.DataFrame(rows, columns=cols)
        spark.createDataFrame(pdf, schema).coalesce(1).write.mode("append").json(str(d))
        now = time.time()
        for p in d.iterdir():
            os.utime(p, (now, now))

    def run_once():
        clicks = (
            spark.readStream.schema(click_schema)
            .json(str(clicks_dir))
            .withWatermark("click_ts", "5 minutes")
        )
        buys = (
            spark.readStream.schema(buy_schema)
            .json(str(buys_dir))
            .withWatermark("buy_ts", "5 minutes")
        )
        joined = clicks.join(
            buys,
            (clicks["user_id"] == buys["user_id"])
            & (buys["buy_ts"] >= clicks["click_ts"])
            & (buys["buy_ts"] <= clicks["click_ts"] + F.expr("INTERVAL 10 MINUTES")),
            "leftOuter",
        ).select(clicks["user_id"], "click_ts", "buy_ts", "amount")
        q = (
            joined.writeStream.format("json")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write(clicks_dir, click_schema, ["click_ts", "user_id"], [
        (t(0), 1),   # matched by the buy at 10:05
        (t(2), 2),   # buy at 10:20 is outside the 10-minute bound -> outer
        (t(4), 3),   # no buy at all -> outer
    ])
    write(buys_dir, buy_schema, ["buy_ts", "user_id", "amount"], [
        (t(5), 1, 9.99),
        (t(20), 2, 5.00),
    ])
    run_once()
    # Advance both watermarks far past every click's join bound.
    write(clicks_dir, click_schema, ["click_ts", "user_id"], [(t(120), 98)])
    write(buys_dir, buy_schema, ["buy_ts", "user_id", "amount"], [(t(120), 99, 1.0)])
    run_once()
    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("click_ts", T.TimestampType()),
            T.StructField("buy_ts", T.TimestampType()),
            T.StructField("amount", T.DoubleType()),
        ]
    )
    rows = (
        spark.read.schema(out_schema)
        .json(out_dir)
        .filter("user_id < 90")
        .orderBy("user_id")
        .collect()
    )
    assert [(r["user_id"], r["amount"]) for r in rows] == [
        (1, 9.99),
        (2, None),
        (3, None),
    ]
