"""Keyed change data feed (Delta table_changes() parity) and row-level
flashback by feed inversion — the reference's -B mode (log2sql.py:
137-160, including the reverse-order README TODO) executed
transactionally against the snapshot store."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log2sql_spark.store import SnapshotStore, invert_changes


def _store(tmp_path, spark, layout="hash"):
    store = SnapshotStore(str(tmp_path / "s"))
    base = spark.createDataFrame(
        [(k, "base", k * 10) for k in range(1, 21)],
        "k int, status string, cents long",
    )
    store.commit(base, mode="overwrite", cluster_by="k", layout=layout)
    return store


def _merge(spark, store, rows):
    df = spark.createDataFrame(rows, "k int, status string, cents long, op string, seq int")
    return store.merge(spark, df, key_cols="k", version_cols="seq")


def _state(spark, store, version=None) -> set:
    return {tuple(r) for r in store.read(spark, version).collect()}


def test_read_changes_classifies_and_attributes(spark, tmp_path):
    store = _store(tmp_path, spark)
    _merge(spark, store, [
        (1, None, None, "delete", 1),
        (2, "upd", 222, "update", 1),
        (30, "new", 300, "insert", 1),
    ])  # v2
    _merge(spark, store, [
        (2, "upd2", 223, "update", 1),   # re-update the same key
        (30, None, None, "delete", 1),   # delete the v2 insert
    ])  # v3

    feed = {
        tuple(r)
        for r in store.read_changes(spark, 1, 3).select(
            "k", "status", "cents", "_change_type", "_commit_version"
        ).collect()
    }
    assert feed == {
        (1, "base", 10, "delete", 2),
        (2, "base", 20, "update_preimage", 2),
        (2, "upd", 222, "update_postimage", 2),
        (30, "new", 300, "insert", 2),
        (2, "upd", 222, "update_preimage", 3),
        (2, "upd2", 223, "update_postimage", 3),
        (30, "new", 300, "delete", 3),
    }
    # single-step read: only v3's changes
    v3_only = {
        tuple(r)
        for r in store.read_changes(spark, 2, 3).select(
            "k", "_change_type"
        ).collect()
    }
    assert v3_only == {(2, "update_preimage"), (2, "update_postimage"), (30, "delete")}


def test_noop_rewrite_produces_empty_feed(spark, tmp_path):
    """Compaction rewrites files without changing rows: the set diff
    cancels and the feed is empty — maintenance is not churn."""
    store = _store(tmp_path, spark)
    v = store.compact(spark, target_files=2)
    feed = store.read_changes(spark, 1, v)
    assert feed.count() == 0


def test_invert_changes_picks_earliest_state(spark, tmp_path):
    store = _store(tmp_path, spark)
    _merge(spark, store, [(5, "mid", 555, "update", 1)])          # v2
    _merge(spark, store, [(5, None, None, "delete", 1),
                          (40, "born", 400, "insert", 1)])        # v3
    inv = invert_changes(store.read_changes(spark, 1, 3), ["k"])
    rows = {tuple(r) for r in inv.select("k", "status", "cents", "op").collect()}
    # key 5: earliest change is the v2 update -> restore its preimage;
    # key 40: earliest change is the v3 insert -> delete it.
    assert rows == {(5, "base", 50, "update"), (40, "born", 400, "delete")}


@pytest.mark.parametrize("layout", ["hash", "range"])
def test_flashback_to_matches_time_travel(spark, tmp_path, layout):
    """flashback_to(v) merges the inverted feed; the resulting head
    state must equal the time-travel read of v — the row-level undo and
    the manifest pointer agree bit-for-bit."""
    store = _store(tmp_path, spark, layout=layout)
    want = _state(spark, store, 1)
    _merge(spark, store, [
        (1, None, None, "delete", 1),
        (2, "upd", 222, "update", 1),
        (30, "new", 300, "insert", 1),
    ])
    _merge(spark, store, [
        (2, "upd2", 223, "update", 1),
        (3, None, None, "delete", 1),
        (30, "newer", 301, "update", 1),
        (31, "late", 310, "insert", 1),
    ])
    assert _state(spark, store) != want
    v = store.flashback_to(spark, 1)
    assert _state(spark, store, v) == want
    # flashback is a FORWARD commit: the undone states stay readable
    assert (2, "upd2", 223) in _state(spark, store, 3)


def test_flashback_guards(spark, tmp_path):
    store = _store(tmp_path, spark)
    with pytest.raises(ValueError, match="nothing to flash back"):
        store.flashback_to(spark, 1)
    with pytest.raises(ValueError, match="no commits"):
        store.read_changes(spark, 1, 1)


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_flashback_roundtrip_random_histories(spark, tmp_path, seed):
    """Adversarial multi-commit histories (seeded RNG: per commit a
    random mix of inserts of new keys, updates/deletes of live keys,
    including insert-then-delete, delete-then-reinsert, repeated
    updates): flashback_to(v) must equal the time-travel read of v for
    EVERY v in the history, not just v1."""
    import random

    rng = random.Random(seed)
    store = SnapshotStore(str(tmp_path / f"s{seed}"))
    live = {k: ("base", k * 10) for k in range(1, 16)}
    next_key = 100
    base = spark.createDataFrame(
        [(k, s, c) for k, (s, c) in live.items()],
        "k int, status string, cents long",
    )
    store.commit(base, mode="overwrite", cluster_by="k", layout="hash")

    states = {1: set((k, s, c) for k, (s, c) in live.items())}
    for commit in range(2, 6):
        rows = []
        # seq = action order within the commit: the merge's version pick
        # must agree with this sequential bookkeeping when one commit
        # touches the same key twice (e.g. insert then delete).
        for seq in range(rng.randint(2, 5)):
            action = rng.choice(["insert", "update", "delete"])
            if action == "insert" or not live:
                k = next_key
                next_key += 1
                live[k] = (f"n{commit}", rng.randint(0, 999))
                rows.append((k, *live[k], "insert", seq))
            elif action == "update":
                k = rng.choice(sorted(live))
                live[k] = (f"u{commit}", rng.randint(0, 999))
                rows.append((k, *live[k], "update", seq))
            else:
                k = rng.choice(sorted(live))
                s, c = live.pop(k)
                rows.append((k, s, c, "delete", seq))
        _merge(spark, store, rows)
        states[commit] = set((k, s, c) for k, (s, c) in live.items())

    head = store.head_version()
    # Chain flashbacks on one store, deepest target last: each flashback
    # commits a new head, and the next read_changes range simply covers
    # the flashback commit too — undo composes with undo.
    for v in sorted((v for v in states if v != head), reverse=True):
        fb = store.flashback_to(spark, v)
        assert _state(spark, store, fb) == states[v], f"flashback to v{v}"
    # the full history, including every flashback commit, stays readable
    for v, want in states.items():
        assert _state(spark, store, v) == want


def test_read_changes_multi_column_key(spark, tmp_path):
    """Composite keys: classification joins on ALL key columns — two
    rows sharing k1 but differing in k2 are distinct entities."""
    store = SnapshotStore(str(tmp_path / "mk"))
    base = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("b", 1, 30)],
        "g string, k int, cents long",
    )
    store.commit(base, mode="overwrite")
    changes = spark.createDataFrame(
        [("a", 1, 11, "update", 1), ("a", 2, None, "delete", 1),
         ("b", 2, 40, "insert", 1)],
        "g string, k int, cents long, op string, seq int",
    )
    store.merge(spark, changes, key_cols=["g", "k"], version_cols="seq")
    feed = {
        tuple(r)
        for r in store.read_changes(spark, 1, 2, key_cols=["g", "k"]).select(
            "g", "k", "cents", "_change_type"
        ).collect()
    }
    assert feed == {
        ("a", 1, 10, "update_preimage"),
        ("a", 1, 11, "update_postimage"),
        ("a", 2, 20, "delete"),
        ("b", 2, 40, "insert"),
    }
    # key_cols default requires a cluster key on this unclustered store
    with pytest.raises(ValueError, match="no cluster key"):
        store.read_changes(spark, 1, 2)


def test_read_changes_long_history_bounded(spark, tmp_path):
    """50-commit feed: correctness AND bounded driver cost. The
    per-commit union would otherwise nest 50 join+explode subtrees;
    read_changes truncates lineage every _CDF_CHECKPOINT_EVERY commits
    (lazy localCheckpoint), so analysis stays shallow and wall time
    stays linear in commits, not quadratic in plan depth."""
    import time

    store = SnapshotStore(str(tmp_path / "long"))
    base = spark.createDataFrame([(0, 0)], "k int, v int")
    store.commit(base, mode="overwrite", cluster_by="k", target_files=1)
    # 50 single-row append commits; each diff is exactly one insert
    for i in range(1, 51):
        store.commit(
            spark.createDataFrame([(i, i * 10)], "k int, v int"),
            mode="append", target_files=1,
        )
    assert store.head_version() == 51

    t0 = time.time()
    feed = store.read_changes(spark, 1, 51, key_cols="k").select(
        "k", "v", "_change_type", "_commit_version"
    ).collect()
    elapsed = time.time() - t0
    assert {tuple(r) for r in feed} == {
        (i, i * 10, "insert", i + 1) for i in range(1, 51)
    }
    # generous absolute bound: an unbounded 50-deep plan blows well
    # past this on analysis alone; the checkpointed feed runs in seconds
    assert elapsed < 120, f"50-commit feed took {elapsed:.1f}s"


def test_read_changes_reliable_checkpoint_when_dir_set(spark, tmp_path, monkeypatch):
    """On a real cluster, localCheckpoint blocks are executor-local and
    non-replicated — an executor loss mid-action kills a long-history
    read_changes instead of recomputing. When the session has a RELIABLE
    checkpoint dir configured, the lineage truncation must route through
    df.checkpoint (shared-storage blocks that survive executor loss).
    Proven by observing checkpoint files land in the configured dir while
    the feed stays correct; the dir is unset afterwards so other tests
    keep the local-mode fallback."""
    import os

    from log2sql_spark.store import snapshots as snap_mod

    ckpt = tmp_path / "reliable_ckpt"
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    monkeypatch.setattr(snap_mod, "_CDF_CHECKPOINT_EVERY", 2)
    store = SnapshotStore(str(tmp_path / "t"))
    store.commit(
        spark.createDataFrame([(0, 0)], "k int, v int"),
        mode="overwrite", cluster_by="k", target_files=1,
    )
    for i in range(1, 7):
        store.commit(
            spark.createDataFrame([(i, i * 10)], "k int, v int"),
            mode="append", target_files=1,
        )
    sc.setCheckpointDir(str(ckpt))
    try:
        feed = store.read_changes(spark, 1, 7, key_cols="k").select(
            "k", "v", "_change_type", "_commit_version"
        ).collect()
        assert {tuple(r) for r in feed} == {
            (i, i * 10, "insert", i + 1) for i in range(1, 7)
        }
        # reliable checkpoint materialized into the configured dir
        ckpt_files = [
            os.path.join(r, f)
            for r, _, fs in os.walk(str(ckpt)) for f in fs
        ]
        assert ckpt_files, "expected reliable checkpoint blocks in the dir"
    finally:
        # PySpark has no public unset; clear via the JVM context so the
        # rest of the suite sees the original no-dir state
        scala_none = getattr(
            getattr(sc._jvm.scala, "None$"), "MODULE$"
        )
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(scala_none)
        assert sc.getCheckpointDir() is None
