"""Crash injection for the streaming writers — the model is the
MOR-delete crash test (test_store_mor.py): kill the writer between its
data write and its commit point, prove the store stays clean, restart
lands exactly-once, fsck is clean, and vacuum reclaims the orphaned
attempt.

These tests found (and now pin the fix for) a real bug: the sketch
folds' first protocol swapped the sketch file and published the batch-id
watermark in TWO separate renames; a crash between them left a folded
sketch with a stale watermark, and the replay double-counted the batch.
The fix makes the state file the single commit point (batch-versioned
sketch files, unreferenced until the state rename publishes them)."""

from __future__ import annotations

import json
import os

import pytest


def _state_crash(monkeypatch, module, suffix: str):
    """Make the module's os.replace die on the state-file rename — the
    crash window between the data write and the commit point."""
    real = os.replace

    def boom(src, dst, *a, **kw):
        if str(dst).endswith(suffix):
            raise RuntimeError("injected crash before state publish")
        return real(src, dst, *a, **kw)

    monkeypatch.setattr(module.os, "replace", boom)
    return real


def test_countmin_fold_crash_then_replay_exactly_once(spark, tmp_path, monkeypatch):
    from log2sql_spark.streaming import sketch_stream as ss

    store = str(tmp_path / "cms")
    df = spark.createDataFrame([("a",), ("a",), ("b",)], "event_type string")
    assert ss.fold_batch_sketch(spark, df, 0, store, "event_type") is True
    assert ss.probe_sketch(spark, store, ["a", "b"]) == {"a": 2, "b": 1}

    # crash AFTER the batch-1 sketch file is written, BEFORE the state
    # rename publishes it
    _state_crash(monkeypatch, ss, "countmin_state.json")
    with pytest.raises(RuntimeError, match="injected crash"):
        ss.fold_batch_sketch(spark, df, 1, store, "event_type")
    monkeypatch.undo()

    # the store still reads pre-crash state: watermark 0, old counts
    with open(os.path.join(store, "countmin_state.json")) as f:
        st = json.load(f)
    assert st["last_batch_id"] == 0
    assert ss.probe_sketch(spark, store, ["a", "b"]) == {"a": 2, "b": 1}
    # the orphaned attempt file exists but is unreferenced
    assert os.path.exists(os.path.join(store, "countmin.1.bin"))
    assert st["sketch"] == "countmin.0.bin"

    # restart replays batch 1: folds EXACTLY once (overwriting the orphan)
    assert ss.fold_batch_sketch(spark, df, 1, store, "event_type") is True
    assert ss.probe_sketch(spark, store, ["a", "b"]) == {"a": 4, "b": 2}
    # a second replay is skipped by the watermark
    assert ss.fold_batch_sketch(spark, df, 1, store, "event_type") is False
    assert ss.probe_sketch(spark, store, ["a", "b"]) == {"a": 4, "b": 2}
    # the superseded batch-0 sketch was reclaimed after the publish
    assert not os.path.exists(os.path.join(store, "countmin.0.bin"))


def test_hll_fold_crash_then_replay_exactly_once(spark, tmp_path, monkeypatch):
    from log2sql_spark.streaming import sketch_stream as ss

    store = str(tmp_path / "hll")
    b0 = spark.createDataFrame([(i,) for i in range(50)], "k bigint")
    b1 = spark.createDataFrame([(i,) for i in range(40, 90)], "k bigint")
    assert ss.fold_batch_hll(spark, b0, 0, store, "k") is True
    assert ss.probe_hll(spark, store) == 50

    _state_crash(monkeypatch, ss, "hll_state.json")
    with pytest.raises(RuntimeError, match="injected crash"):
        ss.fold_batch_hll(spark, b1, 1, store, "k")
    monkeypatch.undo()
    assert ss.probe_hll(spark, store) == 50  # crash published nothing

    assert ss.fold_batch_hll(spark, b1, 1, store, "k") is True
    assert ss.probe_hll(spark, store) == 90  # 0..89 distinct, exactly once
    assert ss.fold_batch_hll(spark, b1, 1, store, "k") is False
    assert ss.probe_hll(spark, store) == 90


def test_snapshot_stream_writer_replay_after_sink_commit(spark, tmp_path):
    """Crash between sink commit and checkpoint advance: the micro-batch
    replays with the same batch id, and the manifest's stream_batch_id
    high-watermark must swallow the duplicate — same contract as the
    sketch folds, proven on the real writeStream path by deleting the
    checkpoint's commit marker."""
    from log2sql_spark.sources.cdf_datasource import register
    from log2sql_spark.store import SnapshotStore

    register(spark)
    in_dir, store_dir, ckpt = tmp_path / "in", tmp_path / "store", tmp_path / "ckpt"
    in_dir.mkdir()
    with open(in_dir / "b0.json", "w") as f:
        for i in range(20):
            f.write(json.dumps({"k": i, "v": i * 10}) + "\n")

    def run():
        q = (
            spark.readStream.schema("k bigint, v bigint")
            .json(str(in_dir))
            .writeStream.format("snapshot")
            .option("path", str(store_dir))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    with open(in_dir / "b1.json", "w") as f:
        for i in range(20, 25):
            f.write(json.dumps({"k": i, "v": i * 10}) + "\n")
    run()
    store = SnapshotStore(str(store_dir))
    v2 = store.head_version()
    assert store.read(spark).count() == 25
    assert store.snapshot(v2).meta["stream_batch_id"] == 1

    # simulate the crash: batch 1's sink commit landed, the checkpoint
    # commit marker did not
    os.remove(ckpt / "commits" / "1")
    crc = ckpt / "commits" / ".1.crc"  # local-FS checksum sidecar
    if crc.exists():
        os.remove(crc)
    run()  # replays batch 1
    assert store.head_version() == v2  # no second publish
    assert store.read(spark).count() == 25  # no duplicate rows
    assert store.fsck() == []


def test_snapshot_stream_writer_crash_before_publish(spark, tmp_path):
    """Crash between the task's parquet write and the manifest publish:
    the attempt directory is an unreferenced orphan — reads and fsck are
    unaffected, include_orphans vacuum reclaims it, and the restarted
    batch lands exactly once (same contract as commit()'s crash window,
    test_store_mor.py)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from log2sql_spark.sources.cdf_datasource import register
    from log2sql_spark.store import SnapshotStore

    register(spark)
    in_dir, store_dir, ckpt = tmp_path / "in", tmp_path / "store", tmp_path / "ckpt"
    in_dir.mkdir()
    with open(in_dir / "b0.json", "w") as f:
        for i in range(20):
            f.write(json.dumps({"k": i, "v": i * 10}) + "\n")

    def run():
        q = (
            spark.readStream.schema("k bigint, v bigint")
            .json(str(in_dir))
            .writeStream.format("snapshot")
            .option("path", str(store_dir))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    store = SnapshotStore(str(store_dir))
    v1 = store.head_version()

    # the crashed attempt: parquet written, no manifest, abort never ran
    orphan = store_dir / "data" / "w-deadbeef0000"
    orphan.mkdir(parents=True)
    pq.write_table(
        pa.table({"k": pa.array([99], pa.int64()), "v": pa.array([990], pa.int64())}),
        orphan / "part-00000-deadbeef.parquet",
    )

    assert store.head_version() == v1
    assert store.read(spark).count() == 20  # orphan invisible to reads
    assert store.fsck() == []
    deleted = store.vacuum(keep_last=10, include_orphans=True)
    assert any("w-deadbeef0000" in d for d in deleted)
    assert store.read(spark).count() == 20

    # the restarted batch (new input) lands exactly once on the clean store
    with open(in_dir / "b1.json", "w") as f:
        f.write(json.dumps({"k": 99, "v": 990}) + "\n")
    run()
    assert store.read(spark).count() == 21
    assert store.read(spark).filter("k = 99").count() == 1
