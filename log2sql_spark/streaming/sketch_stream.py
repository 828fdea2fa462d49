"""Streaming count-min sketch fold: constant-size frequency state over
an unbounded stream.

The batch sketch queries (queries/sketch.py) build a count-min sketch
in one pass; this is the streaming twin — each micro-batch partial-
aggregates its own fixed-size sketch map-side (``F.count_min_sketch``),
and ``foreachBatch`` merges it into a persisted sketch file. State is
the (eps, confidence)-sized summary — ~KBs regardless of how many
events have flowed — which is the entire point of sketching a stream:
per-key exact state would grow with the key space, the sketch doesn't.

Exactly-once: the fold records the last applied batch id next to the
sketch and skips replays (the same contract as the snapshot store's
streaming writers), and the file swap is tmp+rename atomic. Reference
analog: none — the reference is a batch text parser; this is the
mandated streaming extension surface (SURVEY.md §2.2).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _paths(store_dir: str) -> tuple[str, str]:
    return os.path.join(store_dir, "sketch.bin"), os.path.join(
        store_dir, "state.json"
    )


def _load_state(store_dir: str) -> tuple[bytes | None, int]:
    sk_path, st_path = _paths(store_dir)
    if not os.path.exists(st_path):
        return None, -1
    with open(st_path) as f:
        st = json.load(f)
    with open(sk_path, "rb") as f:
        return f.read(), st["last_batch_id"]


def fold_batch_sketch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    store_dir: str,
    col: str,
    eps: float = 1e-4,
    confidence: float = 0.999,
    seed: int = 42,
) -> bool:
    """Merge one micro-batch's sketch into the store. Returns False if
    the batch id was already applied (replay after restart — skipped)."""
    os.makedirs(store_dir, exist_ok=True)
    prev, last_id = _load_state(store_dir)
    if batch_id <= last_id:
        return False
    row = batch_df.agg(
        F.count_min_sketch(col, F.lit(eps), F.lit(confidence), F.lit(seed)).alias("sk")
    ).head()
    sk_path, st_path = _paths(store_dir)
    # An EMPTY micro-batch aggregates to NULL: record the watermark
    # (the batch is consumed) but leave the sketch untouched.
    if row.sk is not None:
        jvm = spark._jvm
        CMS = jvm.org.apache.spark.util.sketch.CountMinSketch
        merged = CMS.readFrom(bytes(row.sk))
        if prev is not None:
            merged.mergeInPlace(CMS.readFrom(prev))
        out = jvm.java.io.ByteArrayOutputStream()
        merged.writeTo(out)
        tmp = sk_path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(bytes(out.toByteArray()))
        os.replace(tmp, sk_path)  # atomic swap, then publish the watermark
    tmp_st = st_path + ".tmp"
    with open(tmp_st, "w") as f:
        json.dump({"last_batch_id": batch_id}, f)
    os.replace(tmp_st, st_path)
    return True


def stream_countmin_fold(
    stream_df: DataFrame,
    store_dir: str,
    col: str,
    checkpoint: str,
    eps: float = 1e-4,
    confidence: float = 0.999,
    seed: int = 42,
):
    """Wire a streaming DataFrame into the sketch fold (availableNow or
    continuous). Returns the StreamingQuery."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        fold_batch_sketch(
            batch_df.sparkSession, batch_df, batch_id, store_dir, col,
            eps=eps, confidence=confidence, seed=seed,
        )

    return (
        stream_df.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def probe_sketch(spark: SparkSession, store_dir: str, keys: list) -> dict:
    """Driver-side probe of the persisted sketch for a bounded key set."""
    sk_path, _ = _paths(store_dir)
    with open(sk_path, "rb") as f:
        data = f.read()
    sk = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(data)
    return {k: sk.estimateCount(k) for k in keys}


def fold_batch_hll(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    store_dir: str,
    col: str,
    lg_k: int = 20,
) -> bool:
    """Streaming distinct count: merge one micro-batch's DataSketches
    HLL into the store (same exactly-once contract as the count-min
    fold). State is the lgK-sized sketch (~KBs) no matter how many
    distinct keys the stream has carried — and HLL union is lossless
    over sketches of the same lgK, so the folded estimate equals the
    one-shot batch estimate (pytest-asserted)."""
    os.makedirs(store_dir, exist_ok=True)
    sk_path = os.path.join(store_dir, "hll.bin")
    st_path = os.path.join(store_dir, "hll_state.json")
    last_id = -1
    if os.path.exists(st_path):
        with open(st_path) as f:
            last_id = json.load(f)["last_batch_id"]
    if batch_id <= last_id:
        return False
    row = batch_df.agg(
        F.hll_sketch_agg(col, F.lit(lg_k)).alias("sk")
    ).head()
    cur = bytes(row.sk) if row.sk is not None else None
    if cur is not None and os.path.exists(sk_path):
        with open(sk_path, "rb") as f:
            prev = f.read()
        merged_row = batch_df.sparkSession.range(1).select(
            F.expr(
                f"hll_union(X'{prev.hex()}', X'{cur.hex()}')"
            ).alias("m")
        )
        cur = bytes(merged_row.head().m)
    if cur is not None:
        tmp = sk_path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(cur)
        os.replace(tmp, sk_path)
    tmp_st = st_path + ".tmp"
    with open(tmp_st, "w") as f:
        json.dump({"last_batch_id": batch_id}, f)
    os.replace(tmp_st, st_path)
    return True


def probe_hll(spark: SparkSession, store_dir: str) -> int:
    """Driver-side distinct-count estimate from the persisted sketch."""
    sk_path = os.path.join(store_dir, "hll.bin")
    with open(sk_path, "rb") as f:
        data = f.read()
    return spark.range(1).select(
        F.expr(f"hll_sketch_estimate(X'{data.hex()}')").alias("n")
    ).head().n


def fold_batch_kll(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    store_dir: str,
    col: str,
    k: int = 8192,
) -> bool:
    """Streaming quantiles: merge one micro-batch's KLL rank sketch
    into the store (same exactly-once contract as the other folds) —
    the third leg of the streaming-sketch trio: count-min for
    frequencies, HLL for distincts, KLL for quantiles. State is the
    k-bounded sketch; below k items it holds everything, so quantiles
    stay exact at test scale while degrading gracefully to the KLL
    error bound on a real stream."""
    os.makedirs(store_dir, exist_ok=True)
    sk_path = os.path.join(store_dir, "kll.bin")
    st_path = os.path.join(store_dir, "kll_state.json")
    last_id = -1
    if os.path.exists(st_path):
        with open(st_path) as f:
            last_id = json.load(f)["last_batch_id"]
    if batch_id <= last_id:
        return False
    row = batch_df.agg(
        F.kll_sketch_agg_bigint(col, k).alias("sk")
    ).head()
    cur = bytes(row.sk) if row.sk is not None else None
    if cur is not None and os.path.exists(sk_path):
        with open(sk_path, "rb") as f:
            prev = f.read()
        merged = (
            batch_df.sparkSession.range(1)
            .select(
                F.explode(
                    F.array(
                        F.expr(f"X'{prev.hex()}'"), F.expr(f"X'{cur.hex()}'")
                    )
                ).alias("sk")
            )
            .agg(F.kll_merge_agg_bigint("sk", k).alias("m"))
            .head()
        )
        cur = bytes(merged.m)
    if cur is not None:
        tmp = sk_path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(cur)
        os.replace(tmp, sk_path)
    tmp_st = st_path + ".tmp"
    with open(tmp_st, "w") as f:
        json.dump({"last_batch_id": batch_id}, f)
    os.replace(tmp_st, st_path)
    return True


def probe_kll(spark: SparkSession, store_dir: str, quantiles: list[float]) -> dict:
    """Driver-side quantile probe of the persisted rank sketch."""
    sk_path = os.path.join(store_dir, "kll.bin")
    with open(sk_path, "rb") as f:
        data = f.read()
    exprs = [
        F.expr(f"kll_sketch_get_quantile_bigint(X'{data.hex()}', {q})").alias(
            f"q{int(q * 100)}"
        )
        for q in quantiles
    ]
    row = spark.range(1).select(*exprs).head()
    return {f"q{int(q * 100)}": row[f"q{int(q * 100)}"] for q in quantiles}
