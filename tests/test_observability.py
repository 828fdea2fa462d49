"""Pipeline observability via Dataset.observe: row-count/sum audit
metrics collected ON the main pass (accumulator-backed), never by a
second scan — at 100 TB re-counting for audit doubles the read, so
this is the operational surface a production CDC pipeline uses to
cross-check applied-row counts against the source."""

from __future__ import annotations

import json
import time

from pyspark.sql import Observation
from pyspark.sql import functions as F


def test_batch_observe_matches_direct_aggregate(spark):
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    obs = Observation("audit")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("v").alias("sum_v"),
        F.count_if(F.col("v") == 0).alias("zeros"),
    )
    kept = observed.filter(F.col("v") >= 0)
    assert kept.count() == 1000  # the action that populates the metrics
    direct = df.agg(
        F.count(F.lit(1)), F.sum("v"), F.count_if(F.col("v") == 0)
    ).head()
    assert obs.get == {
        "n_rows": direct[0],
        "sum_v": direct[1],
        "zeros": direct[2],
    }


def test_streaming_observe_reports_per_batch_metrics(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    with open(in_dir / "b0.json", "w") as f:
        for i in range(50):
            f.write(json.dumps({"k": i, "v": i % 5}) + "\n")
    stream = (
        spark.readStream.schema("k bigint, v bigint")
        .json(str(in_dir))
        .observe(
            "audit",
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("v").alias("sum_v"),
        )
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("obs_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = [
        p["observedMetrics"]["audit"]
        for p in q.recentProgress
        if p.get("observedMetrics", {}).get("audit")
    ]
    assert rows, "no observed metrics surfaced in streaming progress"
    assert sum(r["n_rows"] for r in rows) == 50
    assert sum(r["sum_v"] for r in rows) == sum(i % 5 for i in range(50))
