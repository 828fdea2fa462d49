"""Optimistic concurrency control on the snapshot store.

Two writers race `merge(..., max_retries=N)` into the same table; the
publish step (atomic manifest create) picks the winner. The loser:

- REBASES manifest-only when the winner's commit is provably disjoint
  (none of the loser's rewritten files were touched, no winner-added
  file overlaps the loser's key range, no schema/governance drift) —
  zero recomputation, the already-written merge output republishes on
  the new head; this is Delta's conflict-resolution matrix applied to
  the range-clustered layout, decided entirely from per-file stats;
- RECOMPUTES against the new head when the footprints overlap;
- and with the default max_retries=0 keeps the historical fail-fast
  ConflictError.

The race is injected deterministically: the loser's `_publish` is
wrapped so a competitor lands a commit immediately before the loser's
first publish attempt.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log2sql_spark.store import ConflictError, SnapshotStore


def _base_store(spark, tmp_path, n=10_000, files=16):
    store = SnapshotStore(str(tmp_path / "t"))
    base = spark.range(n).select(
        F.col("id").cast("int").alias("k"),
        F.lit("base").alias("status"),
        (F.col("id") * 10).cast("long").alias("cents"),
    )
    store.commit(base, mode="overwrite", cluster_by="k", target_files=files)
    return store


def _changes(spark, keys, status, seq=1):
    return spark.createDataFrame(
        [(k, status, k * 10 + seq, "update", seq) for k in keys],
        "k int, status string, cents long, op string, seq int",
    )


def _inject_race(store, competitor_action):
    """Make `competitor_action()` land a commit right before the
    store's next publish attempt (then restore normal publishing)."""
    orig = store._publish
    state = {"fired": False}

    def racing(manifest):
        if not state["fired"]:
            state["fired"] = True
            competitor_action()
        return orig(manifest)

    store._publish = racing
    return state


def test_disjoint_conflict_rebases_without_recompute(spark, tmp_path):
    store = _base_store(spark, tmp_path)
    competitor = SnapshotStore(store.path)  # second writer, same table

    state = _inject_race(
        store,
        lambda: competitor.merge(
            spark, _changes(spark, range(9_000, 9_050), "theirs"),
            key_cols="k", version_cols="seq",
        ),
    )
    v = store.merge(
        spark, _changes(spark, range(0, 50), "ours"),
        key_cols="k", version_cols="seq", max_retries=2,
    )
    assert state["fired"]
    snap = store.snapshot(v)
    # rebase, not recompute: the manifest says so, and the parent is
    # the competitor's commit
    assert snap.meta.get("rebased_from") == 1
    assert snap.parent == 2 and v == 3
    # both writers' updates are live; everything else untouched
    rows = {r.k: (r.status, r.cents) for r in store.read(spark).collect()}
    assert all(rows[k] == ("ours", k * 10 + 1) for k in range(0, 50))
    assert all(rows[k] == ("theirs", k * 10 + 1) for k in range(9_000, 9_050))
    assert rows[5_000] == ("base", 50_000)
    assert len(rows) == 10_000
    # the competitor's data files are carried into the rebased manifest
    theirs = {e["path"] for e in store.snapshot(2).entries}
    assert {e["path"] for e in snap.entries} & theirs


def test_overlapping_conflict_recomputes(spark, tmp_path):
    store = _base_store(spark, tmp_path)
    competitor = SnapshotStore(store.path)

    # same key band: the winner rewrites the very files the loser read
    _inject_race(
        store,
        lambda: competitor.merge(
            spark, _changes(spark, range(0, 60), "theirs", seq=1),
            key_cols="k", version_cols="seq",
        ),
    )
    v = store.merge(
        spark, _changes(spark, range(0, 50), "ours", seq=2),
        key_cols="k", version_cols="seq", max_retries=2,
    )
    snap = store.snapshot(v)
    assert snap.meta.get("rebased_from") is None  # recomputed, not rebased
    assert snap.parent == 2 and v == 3
    rows = {r.k: (r.status, r.cents) for r in store.read(spark).collect()}
    # recompute re-merged on top of the competitor: ours (seq 2) wins
    # on 0..49, theirs survives on 50..59
    assert all(rows[k] == ("ours", k * 10 + 2) for k in range(0, 50))
    assert all(rows[k] == ("theirs", k * 10 + 1) for k in range(50, 60))
    assert len(rows) == 10_000


def test_governance_drift_forces_recompute(spark, tmp_path):
    """A concurrent governance commit (here: a new CHECK constraint) is
    never rebased onto — even with a disjoint key range the loser
    recomputes, so its rows are validated against the constraint that
    landed mid-flight."""
    store = _base_store(spark, tmp_path, n=2_000, files=4)
    competitor = SnapshotStore(store.path)

    _inject_race(
        store,
        lambda: competitor.add_constraint(spark, "cents_nonneg", "cents >= 0"),
    )
    v = store.merge(
        spark, _changes(spark, range(0, 10), "ours"),
        key_cols="k", version_cols="seq", max_retries=2,
    )
    snap = store.snapshot(v)
    assert snap.meta.get("rebased_from") is None  # recomputed, not rebased
    assert snap.constraints == {"cents_nonneg": "cents >= 0"}
    got = {r.k for r in store.read(spark).filter(F.col("status") == "ours").collect()}
    assert got == set(range(0, 10))


def test_default_is_fail_fast(spark, tmp_path):
    store = _base_store(spark, tmp_path, n=2_000, files=4)
    competitor = SnapshotStore(store.path)
    _inject_race(
        store,
        lambda: competitor.merge(
            spark, _changes(spark, range(1_900, 1_910), "theirs"),
            key_cols="k", version_cols="seq",
        ),
    )
    with pytest.raises(ConflictError):
        store.merge(
            spark, _changes(spark, range(0, 10), "ours"),
            key_cols="k", version_cols="seq",
        )


def test_rebased_history_stays_consistent(spark, tmp_path):
    """After a rebase: time travel, diff, CDF, and flashback all see a
    linear history — the rebased commit is a normal merge commit."""
    store = _base_store(spark, tmp_path, n=2_000, files=4)
    competitor = SnapshotStore(store.path)
    _inject_race(
        store,
        lambda: competitor.merge(
            spark, _changes(spark, range(1_900, 1_910), "theirs"),
            key_cols="k", version_cols="seq",
        ),
    )
    v = store.merge(
        spark, _changes(spark, range(0, 10), "ours"),
        key_cols="k", version_cols="seq", max_retries=2,
    )
    assert store.snapshot(v).meta.get("rebased_from") == 1

    feed = store.read_changes(spark, 1, v, key_cols="k")
    by_version = {
        (r.k, r._change_type, r._commit_version)
        for r in feed.select("k", "_change_type", "_commit_version").collect()
    }
    # competitor's churn attributed to v2, ours to the rebased v3
    assert (1_900, "update_postimage", 2) in by_version
    assert (0, "update_postimage", 3) in by_version
    # flashback to v1 restores the base everywhere
    fb = store.flashback_to(spark, 1)
    rows = {r.k: r.status for r in store.read(spark, fb).collect()}
    assert set(rows.values()) == {"base"} and len(rows) == 2_000


def test_concurrent_appends_rebase(spark, tmp_path):
    """Two racing appenders both land: appends are disjoint by
    construction, so the loser rebases manifest-only and every row
    from both writers is visible, with no recomputation."""
    store = _base_store(spark, tmp_path, n=1_000, files=4)
    competitor = SnapshotStore(store.path)

    theirs = spark.createDataFrame(
        [(20_000 + i, "theirs", i * 10) for i in range(50)],
        "k int, status string, cents long",
    )
    ours = spark.createDataFrame(
        [(10_000 + i, "ours", i * 10) for i in range(50)],
        "k int, status string, cents long",
    )
    state = _inject_race(
        store, lambda: competitor.commit(theirs, mode="append", target_files=1)
    )
    v = store.commit(ours, mode="append", target_files=1, max_retries=2)
    assert state["fired"]
    snap = store.snapshot(v)
    assert snap.meta.get("rebased_from") == 1
    assert snap.parent == 2 and v == 3
    rows = {r.k for r in store.read(spark).collect()}
    assert len(rows) == 1_100
    assert 10_000 in rows and 20_000 in rows and 500 in rows


def test_append_racing_mor_delete_recomputes(spark, tmp_path):
    """A winner landing a merge-on-read tombstone changes governance
    state (pending deletes) — the losing append recomputes through the
    fold-first path instead of rebasing past the tombstone."""
    store = _base_store(spark, tmp_path, n=1_000, files=4)
    competitor = SnapshotStore(store.path)
    _inject_race(
        store, lambda: competitor.delete_where_mor(spark, "k < 10")
    )
    ours = spark.createDataFrame(
        [(10_000, "ours", 0)], "k int, status string, cents long",
    )
    v = store.commit(ours, mode="append", target_files=1, max_retries=2)
    snap = store.snapshot(v)
    assert snap.meta.get("rebased_from") is None  # recomputed
    rows = {r.k for r in store.read(spark).collect()}
    assert 10_000 in rows
    assert not (rows & set(range(10)))  # the MOR delete is honored
    assert len(rows) == 991


def test_compact_rederives_on_conflict(spark, tmp_path):
    """OPTIMIZE racing a live writer: a derived rewrite must never
    blind-retry its stale DataFrame — compact(max_retries=1) re-derives
    from the new head, so the winner's mid-flight merge survives the
    compaction instead of being erased."""
    store = _base_store(spark, tmp_path, n=2_000, files=4)
    competitor = SnapshotStore(store.path)
    _inject_race(
        store,
        lambda: competitor.merge(
            spark, _changes(spark, range(0, 10), "theirs"),
            key_cols="k", version_cols="seq",
        ),
    )
    v = store.compact(spark, target_files=2, max_retries=1)
    assert store.head_version() == v
    rows = {r.k: r.status for r in store.read(spark).collect()}
    assert all(rows[k] == "theirs" for k in range(0, 10))  # winner survived
    assert len(rows) == 2_000
    assert len(store.snapshot(v).entries) <= 2  # and it DID compact


def test_truly_concurrent_writers_converge(spark, tmp_path):
    """REAL concurrency (no injected schedule): four threads merge
    disjoint key bands into the same table simultaneously with
    max_retries=8. Whatever interleaving the scheduler produces —
    every writer lands (4 merge commits on top of the base), every
    band's update is visible, untouched keys keep base values. This is
    the linearizability claim of the OCC path under an adversarial
    schedule rather than a scripted one."""
    import threading

    store_path = str(tmp_path / "t")
    base_store = SnapshotStore(store_path)
    base = spark.range(8_000).select(
        F.col("id").cast("int").alias("k"),
        F.lit("base").alias("status"),
        (F.col("id") * 10).cast("long").alias("cents"),
    )
    base_store.commit(base, mode="overwrite", cluster_by="k", target_files=16)

    bands = [(0, 100), (2_000, 2_100), (4_000, 4_100), (6_000, 6_100)]
    errors: list = []

    def writer(lo, hi):
        try:
            # each thread gets its own handle; Spark supports concurrent
            # driver-side job submission from multiple threads
            SnapshotStore(store_path).merge(
                spark,
                _changes(spark, range(lo, hi), f"w{lo}"),
                key_cols="k", version_cols="seq", max_retries=8,
            )
        except Exception as exc:  # noqa: BLE001 — surfaced below
            errors.append((lo, exc))

    threads = [threading.Thread(target=writer, args=b) for b in bands]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, f"writers failed: {errors}"

    store = SnapshotStore(store_path)
    assert store.head_version() == 1 + len(bands)
    rows = {r.k: r.status for r in store.read(spark).collect()}
    assert len(rows) == 8_000
    for lo, hi in bands:
        assert all(rows[k] == f"w{lo}" for k in range(lo, hi)), f"band {lo}"
    assert rows[7_500] == "base" and rows[1_000] == "base"


def test_publish_is_atomic_put_if_absent(spark, tmp_path, monkeypatch):
    """The commit point must be put-if-absent, not check-then-act: two
    writers can both pass the exists() fast path in the same window, and
    the second publish must FAIL (ConflictError) rather than os.replace
    over the winner — a silent lost update where both callers report
    success. Simulated deterministically: the winner's manifest is on
    disk, and the loser runs with the exists() check blinded so only the
    atomic os.link gate can stop it."""
    import json
    import os

    store = _base_store(spark, tmp_path, n=100, files=2)
    winner = dict(store.snapshot(1).__dict__)  # peek committed manifest path
    manifest_path = os.path.join(store.path, "_manifests", "v1.json")
    assert os.path.exists(manifest_path)
    before = open(manifest_path).read()

    real_exists = os.path.exists
    monkeypatch.setattr(
        "log2sql_spark.store.snapshots.os.path.exists",
        lambda p: False if p == manifest_path else real_exists(p),
    )
    with pytest.raises(ConflictError, match="another writer"):
        store._publish({"version": 1, "parent": None, "mode": "overwrite",
                        "entries": [], "schema": "{}", "meta": {"loser": True}})
    # the winner's bytes are untouched and no inflight temp leaked
    assert open(manifest_path).read() == before
    assert json.loads(before).get("meta", {}).get("loser") is None
    leftovers = [f for f in os.listdir(os.path.dirname(manifest_path))
                 if "inflight" in f]
    assert leftovers == []
    assert winner["version"] == 1


def test_overwrite_retry_needs_state_independent_opt_in(spark, tmp_path):
    """commit(mode='overwrite', max_retries>0) blind-retries the SAME
    DataFrame — only sound when the content does not derive from the
    current head. The API refuses without the explicit assertion, and
    honors it with one: the retried overwrite lands after a lost race."""
    store = _base_store(spark, tmp_path, n=100, files=2)
    competitor = SnapshotStore(store.path)
    fresh = spark.createDataFrame(
        [(1, "fresh", 0)], "k int, status string, cents long",
    )
    with pytest.raises(ValueError, match="state_independent"):
        store.commit(fresh, mode="overwrite", max_retries=2)

    state = _inject_race(
        store,
        lambda: competitor.commit(
            spark.createDataFrame([(2, "theirs", 0)],
                                  "k int, status string, cents long"),
            mode="append", target_files=1,
        ),
    )
    v = store.commit(fresh, mode="overwrite", max_retries=2,
                     state_independent=True)
    assert state["fired"]
    rows = {(r.k, r.status) for r in store.read(spark, v).collect()}
    assert rows == {(1, "fresh")}


def test_rebase_proof_is_manifest_only_on_wide_head(spark, tmp_path, monkeypatch):
    """VERDICT r10 #8: the disjointness proof and the republish must be
    manifest-only — ZERO Spark work, zero parquet reads — even on a
    100-file head. Enforced at the strongest observable boundary: every
    Python→JVM interaction goes through py4j's
    ``GatewayClient.send_command`` (both gateway modes inherit it), so
    an empty capture during ``_rebase_merge`` (which runs the
    ``_rebase_safe`` proof inside it) means the whole rebase — head
    re-read, per-file key-range checks against the winner's added
    files, and the manifest surgery — never touched the JVM, let alone
    a data file. This turns the "zero data I/O rebase" claim from
    implemented into plan-enforced."""
    import py4j.java_gateway as jg

    store = _base_store(spark, tmp_path, n=100_000, files=100)
    assert len(store.snapshot(store.head_version()).entries) >= 100
    competitor = SnapshotStore(store.path)
    state = _inject_race(
        store,
        lambda: competitor.merge(
            spark, _changes(spark, range(90_000, 90_050), "theirs"),
            key_cols="k", version_cols="seq",
        ),
    )

    jvm_commands: list = []
    orig_rebase = SnapshotStore._rebase_merge
    orig_send = jg.GatewayClient.send_command

    def guarded(self, *a, **k):
        def spy(client_self, command, *sa, **sk):
            jvm_commands.append(command)
            return orig_send(client_self, command, *sa, **sk)

        jg.GatewayClient.send_command = spy
        try:
            return orig_rebase(self, *a, **k)
        finally:
            jg.GatewayClient.send_command = orig_send

    monkeypatch.setattr(SnapshotStore, "_rebase_merge", guarded)
    v = store.merge(
        spark, _changes(spark, range(0, 50), "ours"),
        key_cols="k", version_cols="seq", max_retries=2,
    )
    assert state["fired"]
    snap = store.snapshot(v)
    assert snap.meta.get("rebased_from") == 1  # rebase path, not recompute
    assert jvm_commands == [], (
        f"rebase touched the JVM ({len(jvm_commands)} py4j commands) — "
        "the disjointness proof must stay manifest-only"
    )
    # and the rebased table is still right
    rows = {r.k: r.status for r in store.read(spark).collect()}
    assert all(rows[k] == "ours" for k in range(0, 50))
    assert all(rows[k] == "theirs" for k in range(90_000, 90_050))
    assert len(rows) == 100_000


_PROC_WORKER = r'''
import os, sys

sys.path.insert(0, os.environ["OCC_REPO"])
os.environ["SPARK_GRAFT_CPUS"] = "2"
os.environ["SPARK_GRAFT_DRIVER_MEM"] = "1500m"

from pyspark.sql import SparkSession

from log2sql_spark.store import SnapshotStore

store_path = os.environ["OCC_STORE"]
lo, hi = int(os.environ["OCC_LO"]), int(os.environ["OCC_HI"])

spark = (
    SparkSession.builder.master("local[2]")
    .appName(f"occ_worker_{lo}")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.driver.memory", "1500m")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
changes = spark.createDataFrame(
    [(k, f"w{lo}", k * 10 + 1, "update", 1) for k in range(lo, hi)],
    "k int, status string, cents long, op string, seq int",
)
v = SnapshotStore(store_path).merge(
    spark, changes, key_cols="k", version_cols="seq", max_retries=16
)
print(f"WORKER_OK lo={lo} landed_version={v}", flush=True)
spark.stop()
'''


def test_cross_process_occ_race_converges(spark, tmp_path):
    """The deployment shape of the OCC protocol: SEPARATE OS processes
    (each its own JVM + SparkSession — no shared driver, no shared
    Python state, only the store directory and the os.link commit
    point) race merges of disjoint key bands into one store. Exactly
    one writer wins each version, every loser resolves via
    rebase/recompute within its retry budget, every band lands, the
    final state is fsck-clean. This closes the gap the in-driver
    thread/monkeypatch races (above) cannot cover: real process
    isolation means the put-if-absent semantics come entirely from the
    filesystem, not from any in-process lock."""
    import subprocess
    import sys as _sys

    store_path = str(tmp_path / "t")
    base_store = SnapshotStore(store_path)
    base = spark.range(4_000).select(
        F.col("id").cast("int").alias("k"),
        F.lit("base").alias("status"),
        (F.col("id") * 10).cast("long").alias("cents"),
    )
    base_store.commit(base, mode="overwrite", cluster_by="k", target_files=8)

    bands = [(0, 60), (1_500, 1_560), (3_000, 3_060)]
    import os as _os
    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    procs = []
    for lo, hi in bands:
        env = dict(_os.environ)
        env.update({
            "OCC_REPO": repo, "OCC_STORE": store_path,
            "OCC_LO": str(lo), "OCC_HI": str(hi),
        })
        procs.append((lo, subprocess.Popen(
            [_sys.executable, "-c", _PROC_WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )))

    results = {}
    for lo, p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker {lo} failed:\n{out}\n{err[-3000:]}"
        assert "WORKER_OK" in out, out
        results[lo] = out

    store = SnapshotStore(store_path)
    # one winner per version: head advanced exactly once per writer,
    # and the landed versions reported by the workers are all distinct
    assert store.head_version() == 1 + len(bands)
    landed = sorted(
        int(results[lo].split("landed_version=")[1].split()[0]) for lo, _ in bands
    )
    assert landed == [2, 3, 4]
    rows = {r.k: r.status for r in store.read(spark).collect()}
    assert len(rows) == 4_000
    for lo, hi in bands:
        assert all(rows[k] == f"w{lo}" for k in range(lo, hi)), f"band {lo}"
    assert rows[700] == "base" and rows[2_500] == "base"
    assert store.fsck() == []
