"""Merge-on-read deletes (Delta deletion-vector analog):
store/snapshots.py delete_where_mor / materialize_deletes.

Companion query: store_delete_mor_read (oracle-checked final data);
these tests assert what the oracle can't see — that the delete commit
rewrote ZERO data files, that every rewrite path folds pending
tombstones before touching data, and the restriction-matrix edges."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from log2sql_spark.store import SnapshotStore


@pytest.fixture
def store(spark, tmp_path):
    s = SnapshotStore(str(tmp_path / "mor"))
    base = spark.range(0, 400).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("bigint").alias("grp"),
        (F.col("id") * 10).cast("bigint").alias("cents"),
    )
    s.commit(base, mode="overwrite", cluster_by="k", target_files=4)
    return s


def _data_paths(s, v):
    return [e["path"] for e in s.snapshot(v).entries]


def test_mor_delete_rewrites_no_data_files(spark, store):
    v1 = store.head_version()
    v2 = store.delete_where_mor(spark, "grp = 2 AND k < 100")
    assert _data_paths(store, v2) == _data_paths(store, v1)  # zero rewrites
    snap = store.snapshot(v2)
    assert snap.tombstones["key"] == ["k"]
    assert len(snap.tombstones["entries"]) == 1
    got = store.read(spark)
    assert got.filter("grp = 2 AND k < 100").count() == 0
    assert got.count() == 400 - 25
    # time travel: pre-delete snapshot still sees every row
    assert store.read(spark, v1).count() == 400
    # detail + fsck know about the tombstone
    assert store.detail()["pending_delete_files"] == 1
    assert store.fsck() == []


def test_mor_deletes_accumulate_and_materialize(spark, store):
    store.delete_where_mor(spark, "k < 10")
    v3 = store.delete_where_mor(spark, "k >= 390")
    assert len(store.snapshot(v3).tombstones["entries"]) == 2
    assert store.read(spark).count() == 380
    v4 = store.materialize_deletes(spark)
    snap = store.snapshot(v4)
    assert not snap.tombstones
    assert store.read(spark).count() == 380
    # materialize preserved the clustering (pruned merges still work)
    assert snap.cluster_by == "k" and snap.has_stats
    # idempotent no-op afterwards
    assert store.materialize_deletes(spark) == v4


def test_mor_empty_match_publishes_nothing(spark, store):
    v1 = store.head_version()
    assert store.delete_where_mor(spark, "k < 0") == v1
    assert store.head_version() == v1
    assert not store.snapshot(v1).tombstones


def test_merge_folds_pending_tombstones_first(spark, store):
    store.delete_where_mor(spark, "k = 5")
    changes = spark.createDataFrame(
        [(5, 9, 999, 1, "insert")], "k long, grp long, cents long, v long, op string"
    )
    store.merge(spark, changes, "k", "v")
    got = store.read(spark)
    # the re-inserted key is a NEW visible row, not tombstone-shadowed
    assert got.filter("k = 5").count() == 1
    assert got.filter("k = 5").head().cents == 999
    assert not store.snapshot(store.head_version()).tombstones


def test_append_folds_pending_tombstones_first(spark, store):
    store.delete_where_mor(spark, "k = 7")
    extra = spark.createDataFrame([(7, 3, 777)], "k long, grp long, cents long")
    store.commit(extra, mode="append")
    got = store.read(spark)
    assert got.filter("k = 7").count() == 1  # resurrection-inverse guard
    assert got.filter("k = 7").head().cents == 777


def test_mor_composes_with_metadata_commits(spark, store):
    store.delete_where_mor(spark, "k < 50")
    # governance on top of pending tombstones: both apply
    store.set_mask("cents", "CAST(-1 AS BIGINT)")
    got = store.read(spark)
    assert got.count() == 350
    assert got.agg(F.max("cents")).head()[0] == -1
    # rename of a NON-key column composes; the key column refuses
    store.rename_column("cents", "pennies")
    assert store.read(spark).count() == 350
    with pytest.raises(ValueError, match="materialize_deletes"):
        store.rename_column("k", "kk")
    with pytest.raises(ValueError, match="materialize_deletes"):
        store.drop_column("k")


def test_mor_restore_and_vacuum_keep_tombstones(spark, store):
    v2 = store.delete_where_mor(spark, "k < 20")
    store.materialize_deletes(spark)
    v4 = store.restore(v2)  # restore TO the tombstoned version
    assert store.snapshot(v4).tombstones["entries"]
    assert store.read(spark).count() == 380
    # vacuum to head only: the restored head's tombstone files survive
    store.vacuum(keep_last=1)
    assert store.fsck() == []
    assert store.read(spark).count() == 380


def test_mor_diff_sees_the_delete(spark, store):
    v1 = store.head_version()
    v2 = store.delete_where_mor(spark, "k < 3")
    d = store.diff(spark, v1, v2)
    rows = {(r.k, r.change_type) for r in d.collect()}
    assert rows == {(0, "removed"), (1, "removed"), (2, "removed")}


def test_mor_clone_borrows_tombstones(spark, store, tmp_path):
    store.delete_where_mor(spark, "k >= 395")
    clone = store.clone_to(str(tmp_path / "clone"))
    assert clone.read(spark).count() == 395
    # borrowed (absolute) tombstones are never clone-owned
    t = clone.snapshot(1).tombstones
    assert all(os.path.isabs(e["path"]) for e in t["entries"])
    clone.vacuum(keep_last=1)
    assert store.fsck() == []  # source untouched


def test_mor_key_mismatch_refuses(spark, store):
    store.delete_where_mor(spark, "k = 1")
    with pytest.raises(ValueError, match="same key"):
        store.delete_where_mor(spark, "grp = 3", key_cols=["grp"])


def test_mor_delete_streams_to_cdf_subscribers(spark, store, tmp_path):
    """A merge-on-read delete changes no data files, but the CDF stream
    must still emit its rows as ``removed`` (and a restore across it as
    re-``added``) — the file-level diff is blind to tombstones, so the
    source diffs the tombstone key delta explicitly."""
    out_dir, ckpt = tmp_path / "out", tmp_path / "ckpt"

    def drain():
        q = (
            spark.readStream.format("snapshot_cdf")
            .load(store.path)
            .writeStream.format("parquet")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    v1 = store.head_version()
    drain()  # v1: 400 adds
    v2 = store.delete_where_mor(spark, "k < 3")
    drain()
    rows = spark.read.parquet(str(out_dir)).collect()
    v2_rows = {(r.k, r._change_type) for r in rows if r._version == v2}
    assert v2_rows == {(0, "removed"), (1, "removed"), (2, "removed")}
    # restore to the pre-delete version: tombstoned keys come back
    v3 = store.restore(v1)
    drain()
    rows = spark.read.parquet(str(out_dir)).collect()
    v3_rows = {(r.k, r._change_type) for r in rows if r._version == v3}
    assert v3_rows == {(0, "added"), (1, "added"), (2, "added")}
    assert len(rows) == 400 + 3 + 3


def test_cli_delete_mor_and_materialize(spark, store, capsys):
    from log2sql_spark.cli import store_main

    assert store_main(["delete-mor", store.path, "--predicate", "k < 5"]) == 0
    assert capsys.readouterr().out.strip().endswith("v2")
    assert store.read(spark).count() == 395
    assert store.detail()["pending_delete_files"] == 1
    assert store_main(["materialize-deletes", store.path]) == 0
    assert capsys.readouterr().out.strip().endswith("v3")
    assert not store.snapshot(3).tombstones
    assert store.read(spark).count() == 395


def test_snapshot_batch_datasource_honors_tombstones(spark, store):
    """The ``format('snapshot')`` connector must serve the same
    post-delete state as SnapshotStore.read — a format-string change is
    not a way to resurrect merge-on-read-deleted rows."""
    store.delete_where_mor(spark, "k < 10")
    df = spark.read.format("snapshot").load(store.path)
    assert df.count() == 390
    assert df.filter("k < 10").count() == 0


def test_snapshot_writer_refuses_pending_tombstones(spark, store):
    store.delete_where_mor(spark, "k = 0")
    extra = spark.createDataFrame([(900, 1, 1)], "k long, grp long, cents long")
    with pytest.raises(Exception, match="merge-on-read"):
        extra.write.format("snapshot").mode("append").save(store.path)


def test_mor_crash_before_publish_leaves_clean_store(spark, store, monkeypatch):
    """A crash between the tombstone write and the manifest publish must
    leave the store unchanged — the attempt directory is an orphan the
    include_orphans vacuum sweeps, same crash contract as commit()."""
    from log2sql_spark.store.snapshots import SnapshotStore

    v1 = store.head_version()

    def boom(manifest):
        raise RuntimeError("crash before publish")

    monkeypatch.setattr(store, "_publish", boom)
    with pytest.raises(RuntimeError, match="crash"):
        store.delete_where_mor(spark, "k < 5")
    monkeypatch.undo()
    assert store.head_version() == v1
    assert store.read(spark).count() == 400  # nothing deleted
    assert store.fsck() == []
    # the orphan tombstone attempt dir is reclaimed like any other
    fresh = SnapshotStore(store.path)
    deleted = fresh.vacuum(keep_last=1, include_orphans=True)
    assert any("-del-" in d for d in deleted)
    assert fresh.read(spark).count() == 400
