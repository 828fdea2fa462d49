"""Streaming count-min sketch fold: constant-size frequency state over
an unbounded stream.

The batch sketch queries (queries/sketch.py) build a count-min sketch
in one pass; this is the streaming twin — each micro-batch partial-
aggregates its own fixed-size sketch map-side (``F.count_min_sketch``),
and ``foreachBatch`` merges it into a persisted sketch file. State is
the (eps, confidence)-sized summary — ~KBs regardless of how many
events have flowed — which is the entire point of sketching a stream:
per-key exact state would grow with the key space, the sketch doesn't.

Exactly-once: there is ONE commit point. The merged sketch lands in a
batch-versioned file (``<name>.<batch_id>.bin``) that nothing reads
until the state file — {last_batch_id, sketch file} in a single
tmp+rename — publishes it. A crash after the sketch write but before
the state publish leaves the state pointing at the PREVIOUS sketch, so
the restarted fold re-merges the batch from the old sketch and simply
overwrites the orphaned attempt — never a double fold. (The first cut
swapped ``sketch.bin`` in place and published the watermark in a second
rename; a crash between the two renames double-counted the batch on
replay — found by the crash-injection tests, fixed by making the state
file the sole commit point.) Same contract as the snapshot store's
streaming writers. Reference analog: none — the reference is a batch
text parser; this is the mandated streaming extension surface
(SURVEY.md §2.2).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _load_sketch(store_dir: str, name: str) -> tuple[bytes | None, int, str | None]:
    """(sketch bytes, last applied batch id, referenced sketch file) —
    resolved through the state file, the single source of truth.

    Migration: the first cut of this module kept the sketch in a fixed
    ``<name>.bin`` (countmin: ``sketch.bin`` + ``state.json`` with only
    ``last_batch_id``). A store written by that layout has a state file
    WITHOUT the ``sketch`` key — treating it as empty would silently
    discard the accumulated sketch while keeping the watermark (data
    loss masked as success), so the legacy bytes are read instead, and
    an unrecognized state file fails loudly rather than folding from
    scratch."""
    st_path = os.path.join(store_dir, f"{name}_state.json")
    if not os.path.exists(st_path):
        # countmin's legacy layout used unprefixed state.json.
        legacy_st = os.path.join(store_dir, "state.json")
        if name == "countmin" and os.path.exists(legacy_st):
            with open(legacy_st) as f:
                st = json.load(f)
            return _legacy_bytes(store_dir, "sketch.bin"), st["last_batch_id"], None
        return None, -1, None
    with open(st_path) as f:
        st = json.load(f)
    if "last_batch_id" not in st:
        raise ValueError(
            f"unrecognized sketch state file {st_path}: keys {sorted(st)}"
        )
    if "sketch" not in st:
        # Legacy layout: same state-file name, sketch in <name>.bin.
        return _legacy_bytes(store_dir, f"{name}.bin"), st["last_batch_id"], None
    data = None
    if st.get("sketch"):
        with open(os.path.join(store_dir, st["sketch"]), "rb") as f:
            data = f.read()
    return data, st["last_batch_id"], st.get("sketch")


def _legacy_bytes(store_dir: str, filename: str) -> bytes | None:
    path = os.path.join(store_dir, filename)
    if not os.path.exists(path):
        raise ValueError(
            f"sketch state file references legacy layout but {path} is missing"
        )
    with open(path, "rb") as f:
        return f.read()


def _commit_sketch(
    store_dir: str,
    name: str,
    batch_id: int,
    data: bytes | None,
    prev_file: str | None,
) -> None:
    """Publish one fold atomically: versioned sketch file first (unreferenced
    until published), then the state file in ONE rename — the commit point.
    ``data=None`` (empty micro-batch) advances the watermark while keeping
    the previous sketch reference. The superseded sketch file is removed
    best-effort AFTER the publish (a crash before the cleanup leaves an
    orphan file, never a wrong state)."""
    st_path = os.path.join(store_dir, f"{name}_state.json")
    sketch_file = prev_file
    if data is not None:
        sketch_file = f"{name}.{batch_id}.bin"
        path = os.path.join(store_dir, sketch_file)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    tmp_st = st_path + ".tmp"
    with open(tmp_st, "w") as f:
        json.dump({"last_batch_id": batch_id, "sketch": sketch_file}, f)
    os.replace(tmp_st, st_path)
    if data is not None and prev_file and prev_file != sketch_file:
        try:
            os.remove(os.path.join(store_dir, prev_file))
        except OSError:
            pass


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
    prev, last_id, prev_file = _load_sketch(store_dir, "countmin")
    if batch_id <= last_id:
        return False
    row = batch_df.agg(
        F.count_min_sketch(col, F.lit(eps), F.lit(confidence), F.lit(seed)).alias("sk")
    ).head()
    # An EMPTY micro-batch aggregates to NULL: record the watermark
    # (the batch is consumed) but keep the previous sketch reference.
    merged_bytes = None
    if row.sk is not None:
        jvm = spark._jvm
        CMS = jvm.org.apache.spark.util.sketch.CountMinSketch
        merged = CMS.readFrom(bytes(row.sk))
        if prev is not None:
            merged.mergeInPlace(CMS.readFrom(prev))
        out = jvm.java.io.ByteArrayOutputStream()
        merged.writeTo(out)
        merged_bytes = bytes(out.toByteArray())
    _commit_sketch(store_dir, "countmin", batch_id, merged_bytes, prev_file)
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
    data, _, _ = _load_sketch(store_dir, "countmin")
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
    prev, last_id, prev_file = _load_sketch(store_dir, "hll")
    if batch_id <= last_id:
        return False
    row = batch_df.agg(
        F.hll_sketch_agg(col, F.lit(lg_k)).alias("sk")
    ).head()
    cur = bytes(row.sk) if row.sk is not None else None
    if cur is not None and prev is not None:
        merged_row = batch_df.sparkSession.range(1).select(
            F.expr(
                f"hll_union(X'{prev.hex()}', X'{cur.hex()}')"
            ).alias("m")
        )
        cur = bytes(merged_row.head().m)
    _commit_sketch(store_dir, "hll", batch_id, cur, prev_file)
    return True


def probe_hll(spark: SparkSession, store_dir: str) -> int:
    """Driver-side distinct-count estimate from the persisted sketch."""
    data, _, _ = _load_sketch(store_dir, "hll")
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
    prev, last_id, prev_file = _load_sketch(store_dir, "kll")
    if batch_id <= last_id:
        return False
    row = batch_df.agg(
        F.kll_sketch_agg_bigint(col, k).alias("sk")
    ).head()
    cur = bytes(row.sk) if row.sk is not None else None
    if cur is not None and prev is not None:
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
    _commit_sketch(store_dir, "kll", batch_id, cur, prev_file)
    return True


def probe_kll(spark: SparkSession, store_dir: str, quantiles: list[float]) -> dict:
    """Driver-side quantile probe of the persisted rank sketch."""
    data, _, _ = _load_sketch(store_dir, "kll")
    exprs = [
        F.expr(f"kll_sketch_get_quantile_bigint(X'{data.hex()}', {q})").alias(
            f"q{int(q * 100)}"
        )
        for q in quantiles
    ]
    row = spark.range(1).select(*exprs).head()
    return {f"q{int(q * 100)}": row[f"q{int(q * 100)}"] for q in quantiles}
