"""One production narrative, every major surface composing:

CDC stream → snapshot store → compaction → release tag → branch WAP
backfill → more CDC on top → tag time travel → time-based retention
with ref pinning → physical cleanup → fsck.

Each surface has its own focused suite; THIS test pins that they
compose — the failure mode integration tests exist for is two features
that pass alone and corrupt state together (e.g. a compaction dropping
the tag's pinned files, a branch merge breaking the stream's next
checkpointed batch, a vacuum tearing a borrowed fork-point)."""

from __future__ import annotations

import time
from datetime import datetime

from log2sql_spark.sources.binlog_fixture import render_binlog
from log2sql_spark.sources.catalog import catalog_from_dict
from log2sql_spark.store import SnapshotStore
from log2sql_spark.streaming.cdc_stream import apply_changes_to_snapshot_store

TS = datetime(2024, 5, 1, 12, 0, 7)
CATALOG = {"shop.orders": {"columns": ["id", "status"], "key_columns": ["id"]}}


def _ins(rid, status):
    return {"op": "insert", "db": "shop", "table": "orders", "ts": TS,
            "values": [(1, str(rid)), (2, f"'{status}'")]}


def _upd(rid, old, new):
    return {"op": "update", "db": "shop", "table": "orders", "ts": TS,
            "before": [(1, str(rid)), (2, f"'{old}'")],
            "after": [(1, str(rid)), (2, f"'{new}'")]}


def _dele(rid, status):
    return {"op": "delete", "db": "shop", "table": "orders", "ts": TS,
            "values": [(1, str(rid)), (2, f"'{status}'")]}


def _state(spark, store):
    return {r.key: r.after["status"] for r in store.read(spark).collect()}


def test_production_lifecycle_composition(spark, tmp_path):
    in_dir, ckpt = tmp_path / "in", tmp_path / "ckpt"
    in_dir.mkdir()
    store_path = str(tmp_path / "store")
    cat = catalog_from_dict(spark, CATALOG)

    def run_stream():
        q = apply_changes_to_snapshot_store(
            spark, str(in_dir), cat, store_path, str(ckpt), key_col="id",
        )
        q.awaitTermination(120)
        assert q.exception() is None

    # --- 1. initial CDC ingest: bootstrap + incremental dumps --------
    (in_dir / "bin.000001.txt").write_text(render_binlog(
        [_ins(i, f"s{i}") for i in range(1, 5)]
    ))
    (in_dir / "bin.000002.txt").write_text(render_binlog(
        [_upd(2, "s2", "paid"), _dele(3, "s3"), _ins(5, "s5")]
    ))
    run_stream()
    store = SnapshotStore(store_path)
    assert _state(spark, store) == {
        "1": "'s1'", "2": "'paid'", "4": "'s4'", "5": "'s5'",
    }

    # --- 2. maintenance compaction is content-transparent ------------
    before = _state(spark, store)
    store.compact(spark)
    assert _state(spark, store) == before
    assert store.fsck() == []

    # --- 3. tag the release ------------------------------------------
    v_tag = store.create_tag("release-1")
    tagged_state = before

    # --- 4. branch write-audit-publish backfill ----------------------
    store.create_branch("backfill")
    br = store.branch("backfill")
    fix = spark.createDataFrame(
        [("4", {"id": "4", "status": "'s4-fixed'"}, "update", 1)],
        "key string, after map<string,string>, op string, seq int",
    )
    br.merge(spark, fix, key_cols="key", version_cols="seq")
    # audit on the branch; main's readers see NOTHING yet
    assert _state(spark, br)["4"] == "'s4-fixed'"
    assert _state(spark, store)["4"] == "'s4'"
    store.merge_branch(spark, "backfill", drop=True)
    assert _state(spark, store)["4"] == "'s4-fixed'"

    # --- 5. the stream keeps running on top of the merged state ------
    (in_dir / "bin.000003.txt").write_text(render_binlog(
        [_ins(6, "s6"), _upd(1, "s1", "shipped")]
    ))
    run_stream()
    assert _state(spark, store) == {
        "1": "'shipped'", "2": "'paid'", "4": "'s4-fixed'", "5": "'s5'",
        "6": "'s6'",
    }

    # --- 6. tag time travel: the release is frozen --------------------
    assert {
        r.key: r.after["status"] for r in store.read_tag(spark, "release-1").collect()
    } == tagged_state

    # --- 7. retention: the tag PINS its version through vacuum --------
    deleted = store.vacuum(keep_last=1, older_than=time.time() + 1)
    assert v_tag in store.versions()  # pinned survived aggressive retention
    assert {
        r.key: r.after["status"] for r in store.read_tag(spark, "release-1").collect()
    } == tagged_state
    # drop the pin: the next sweep reclaims history, head intact
    store.drop_tag("release-1")
    deleted2 = store.vacuum(keep_last=1, older_than=time.time() + 1)
    assert deleted or deleted2  # the narrative actually reclaimed bytes
    assert store.versions() == [store.head_version()]
    assert _state(spark, store) == {
        "1": "'shipped'", "2": "'paid'", "4": "'s4-fixed'", "5": "'s5'",
        "6": "'s6'",
    }
    assert store.fsck() == []

    # --- 8. the audit trail recorded the story -----------------------
    modes = [h["mode"] for h in store.history()]
    assert modes  # only the head survives retention; its mode is real
    # pre-vacuum history carried the full arc: exercised above through
    # tag time-travel + branch isolation; post-vacuum the table is ONE
    # self-contained snapshot a new reader bootstraps from
    fresh = SnapshotStore(store_path)
    assert fresh.read(spark).count() == 5


def test_online_pipeline_composition(spark, tmp_path, monkeypatch):
    """The --stop-never production path end-to-end: live remote tail
    (fake GTID server that DIES mid-transaction at the rotation
    boundary) → watch dir → checkpointed streaming apply → MERGE into
    the snapshot store. Composes the whole-transactions-only trim with
    the store's last-writer-wins version ordering: the crash, the
    rotation, AND a stale-cursor duplicate re-dump all collapse to the
    same final state."""
    import importlib.util
    import os
    import stat

    spec = importlib.util.spec_from_file_location(
        "tbr", os.path.join(os.path.dirname(__file__), "test_binlog_remote.py")
    )
    tbr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tbr)
    from log2sql_spark.sources.binlog_remote import TailState, tail_once, tail_remote_binlog

    bindir = tmp_path / "bin"
    bindir.mkdir()
    script = bindir / "mysqlbinlog"
    script.write_text(tbr._FAKE_GTID)
    script.chmod(script.stat().st_mode | stat.S_IXUSR)
    marker = tmp_path / "crash_once"
    marker.write_text("")
    monkeypatch.setenv("FAKE_CRASH_MARKER", str(marker))
    monkeypatch.setenv("PATH", str(bindir) + os.pathsep + os.environ["PATH"])

    watch = tmp_path / "watch"
    state = tail_remote_binlog(
        str(watch), "bin.000001", poll_interval=0.01, max_iterations=3
    )
    assert state.rotations == 1
    # stale mid-transaction cursor: the server re-dumps g2 WHOLE into a
    # second, differently-named file (duplicate delivery)
    assert tail_once(TailState(log_file="bin.000001", position=350), str(watch))
    assert len(os.listdir(watch)) == 4

    cat = catalog_from_dict(spark, CATALOG)
    store_path = str(tmp_path / "store")
    q = apply_changes_to_snapshot_store(
        spark, str(watch), cat, store_path, str(tmp_path / "ckpt"), key_col="id",
    )
    q.awaitTermination(120)
    assert q.exception() is None

    store = SnapshotStore(store_path)
    assert _state(spark, store) == {
        "1": "'a'", "2": "'b'", "3": "'c'", "4": "'d'", "5": "'e'",
    }
    assert store.read(spark).count() == 5  # dup delivery collapsed
    assert store.fsck() == []
