"""Streaming CDC apply surviving a concurrent writer.

The foreachBatch merge inside ``apply_changes_to_snapshot_store`` now
passes ``max_retries`` to the store's optimistic concurrency: a
maintenance job (compaction, backfill, a second pipeline) committing
between a micro-batch's read and its publish no longer kills the
stream. The race is injected deterministically by intercepting the
store's publish at class level and landing a competitor commit right
before the first MERGE-mode publish."""

from __future__ import annotations

from datetime import datetime

from log2sql_spark.sources.binlog_fixture import render_binlog
from log2sql_spark.sources.catalog import catalog_from_dict
from log2sql_spark.store.snapshots import SnapshotStore
from log2sql_spark.streaming.cdc_stream import apply_changes_to_snapshot_store

CATALOG = {"shop.orders": {"columns": ["id", "status"], "key_columns": ["id"]}}
TS = datetime(2024, 5, 1, 12, 0, 7)


def test_stream_apply_survives_concurrent_commit(spark, tmp_path, monkeypatch):
    in_dir, ckpt = tmp_path / "in", tmp_path / "ckpt"
    in_dir.mkdir()
    # two files + maxFilesPerTrigger=1 → two micro-batches: the first
    # bootstraps the store (overwrite path), the second goes through
    # the hash-layout MERGE whose publish the competitor races
    (in_dir / "bin.000001.txt").write_text(render_binlog([
        {"op": "insert", "db": "shop", "table": "orders", "ts": TS,
         "values": [(1, "1"), (2, "'a'")]},
    ]))
    (in_dir / "bin.000002.txt").write_text(render_binlog([
        {"op": "insert", "db": "shop", "table": "orders", "ts": TS,
         "values": [(1, "2"), (2, "'b'")]},
    ]))
    cat = catalog_from_dict(spark, CATALOG)
    store_path = str(tmp_path / "store")

    orig_publish = SnapshotStore._publish
    state = {"fired": False}

    def racing_publish(self, manifest):
        # fire once, on the stream's first MERGE publish — the competitor
        # lands an out-of-band append the micro-batch didn't see
        if manifest.get("mode") == "merge" and not state["fired"]:
            state["fired"] = True
            competitor = SnapshotStore(store_path)
            competitor.commit(
                spark.createDataFrame(
                    [("backfill:1", {"note": "ops"})],
                    "key string, after map<string,string>",
                ),
                mode="append",
                target_files=1,
            )
        return orig_publish(self, manifest)

    monkeypatch.setattr(SnapshotStore, "_publish", racing_publish)

    q = apply_changes_to_snapshot_store(
        spark, str(in_dir), cat, store_path, str(ckpt), key_col="id",
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    assert q.exception() is None
    assert state["fired"]

    monkeypatch.setattr(SnapshotStore, "_publish", orig_publish)
    store = SnapshotStore(store_path)
    rows = {r.key: r.after for r in store.read(spark).collect()}
    # both the CDC state AND the competitor's out-of-band row survive
    assert rows["1"] == {"id": "1", "status": "'a'"}
    assert rows["2"] == {"id": "2", "status": "'b'"}
    assert rows["backfill:1"] == {"note": "ops"}


def test_crash_between_rebase_and_checkpoint_replays_idempotently(
    spark, tmp_path, monkeypatch
):
    """VERDICT r10 #6: crash BETWEEN the OCC rebase landing and the
    streaming checkpoint commit. The raced micro-batch's merge already
    published (manifest-only rebase on the competitor's head); the
    checkpoint commit marker never landed, so restart REPLAYS the same
    micro-batch whose effects are already in the store. Row-level
    version ordering (file, start_pos, event_seq) must make the replay
    a no-op on state: same final rows, no duplicates, the competitor's
    out-of-band row intact, fsck clean."""
    in_dir, ckpt = tmp_path / "in", tmp_path / "ckpt"
    in_dir.mkdir()
    (in_dir / "bin.000001.txt").write_text(render_binlog([
        {"op": "insert", "db": "shop", "table": "orders", "ts": TS,
         "values": [(1, "1"), (2, "'a'")]},
    ]))
    (in_dir / "bin.000002.txt").write_text(render_binlog([
        {"op": "insert", "db": "shop", "table": "orders", "ts": TS,
         "values": [(1, "2"), (2, "'b'")]},
    ]))
    cat = catalog_from_dict(spark, CATALOG)
    store_path = str(tmp_path / "store")

    orig_publish = SnapshotStore._publish
    state = {"merge_publishes": 0, "fired": False}

    def racing_publish(self, manifest):
        # fire on the first merge-mode publish: batch 0's merge into the
        # empty bootstrap short-circuits to an overwrite, so the first
        # true MERGE publish is batch 1's — the LAST batch, whose
        # checkpoint commit marker we then delete
        if manifest.get("mode") == "merge":
            state["merge_publishes"] += 1
            if state["merge_publishes"] == 1 and not state["fired"]:
                state["fired"] = True
                competitor = SnapshotStore(store_path)
                competitor.commit(
                    spark.createDataFrame(
                        [("backfill:1", {"note": "ops"})],
                        "key string, after map<string,string>",
                    ),
                    mode="append",
                    target_files=1,
                )
        return orig_publish(self, manifest)

    monkeypatch.setattr(SnapshotStore, "_publish", racing_publish)

    def run():
        q = apply_changes_to_snapshot_store(
            spark, str(in_dir), cat, store_path, str(ckpt), key_col="id",
            max_files_per_trigger=1,
        )
        q.awaitTermination(120)
        assert q.exception() is None

    run()
    assert state["fired"]
    store = SnapshotStore(store_path)
    v_after = store.head_version()
    before = {r.key: r.after for r in store.read(spark).collect()}
    assert before["1"] == {"id": "1", "status": "'a'"}
    assert before["2"] == {"id": "2", "status": "'b'"}
    assert before["backfill:1"] == {"note": "ops"}

    # the crash: batch 1's merge landed (via rebase), its checkpoint
    # commit marker did not
    import os

    os.remove(ckpt / "commits" / "1")
    crc = ckpt / "commits" / ".1.crc"
    if crc.exists():
        os.remove(crc)

    run()  # restart replays batch 1 against the already-rebased head
    store = SnapshotStore(store_path)
    after = {r.key: r.after for r in store.read(spark).collect()}
    assert after == before  # byte-identical state: replay was idempotent
    assert store.read(spark).count() == 3  # no duplicate keys
    assert store.head_version() >= v_after
    assert store.fsck() == []
