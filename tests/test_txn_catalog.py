"""StoreCatalog: multi-table atomic commits (snapshot-of-snapshots).

The consistency claim under test: a reader resolving through the
catalog sees the OLD vector of table versions or the NEW vector, never
one-new/one-old — including across crashes between store commits and
the catalog publish, concurrent catalog writers, and store-level
vacuum racing the catalog's history."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log2sql_spark.store import ConflictError, SnapshotStore, StoreCatalog


def _mkstore(spark, path, rows, status="v1"):
    store = SnapshotStore(str(path))
    store.commit(
        spark.createDataFrame([(k, status) for k in rows], "k long, status string"),
        mode="overwrite",
    )
    return store


def test_commit_multi_is_atomic_vector_swap(spark, tmp_path):
    a = _mkstore(spark, tmp_path / "a", [1, 2])
    b = _mkstore(spark, tmp_path / "b", [10, 20])
    cat = StoreCatalog(str(tmp_path / "cat"))
    cat.register("cur", a.path)
    cat.register("hist", b.path)

    v_before = cat.head_version()
    pinned_before = cat.resolve()

    cat.commit_multi(
        spark,
        {
            "cur": (spark.createDataFrame([(3, "v2")], "k long, status string"),
                    {"mode": "append"}),
            "hist": (spark.createDataFrame([(30, "v2")], "k long, status string"),
                     {"mode": "append"}),
        },
    )

    # new vector: both tables advanced together
    after = cat.resolve()
    assert after["cur"][1] == pinned_before["cur"][1] + 1
    assert after["hist"][1] == pinned_before["hist"][1] + 1
    assert {r.k for r in cat.read(spark, "cur").collect()} == {1, 2, 3}
    assert {r.k for r in cat.read(spark, "hist").collect()} == {10, 20, 30}
    # old vector still resolvable: time travel is consistent too
    assert {r.k for r in cat.read(spark, "cur", version=v_before).collect()} == {1, 2}
    assert {r.k for r in cat.read(spark, "hist", version=v_before).collect()} == {10, 20}


def test_reader_never_sees_mixed_vector_mid_commit(spark, tmp_path):
    """Crash between the store commits and the catalog publish: the
    store heads have MOVED, but the catalog still serves the old
    consistent vector — the half-done transaction is invisible."""
    a = _mkstore(spark, tmp_path / "a", [1])
    b = _mkstore(spark, tmp_path / "b", [10])
    cat = StoreCatalog(str(tmp_path / "cat"))
    cat.register("cur", a.path)
    cat.register("hist", b.path)

    # simulate the crash: land the store commits, never publish
    a.commit(spark.createDataFrame([(2, "x")], "k long, status string"), mode="append")
    # reader through the catalog: still the old vector, both tables
    assert {r.k for r in cat.read(spark, "cur").collect()} == {1}
    assert {r.k for r in cat.read(spark, "hist").collect()} == {10}
    # direct store readers see the new head — the catalog is the
    # isolation boundary, not the store
    assert {r.k for r in a.read(spark).collect()} == {1, 2}


def test_catalog_pins_survive_store_vacuum(spark, tmp_path):
    a = _mkstore(spark, tmp_path / "a", [1])
    cat = StoreCatalog(str(tmp_path / "cat"))
    cat.register("cur", a.path)
    pinned_v = cat.resolve()["cur"][1]

    for i in range(3):  # store moves on; catalog still pins v1
        a.commit(
            spark.createDataFrame([(100 + i, "n")], "k long, status string"),
            mode="overwrite",
        )
    a.vacuum(keep_last=1)
    assert pinned_v in a.versions()  # tag pinned it
    assert {r.k for r in cat.read(spark, "cur").collect()} == {1}

    # expire the catalog history -> pin released -> vacuum reclaims
    cat.register("cur", a.path)  # advance catalog to store head
    dropped = cat.expire(keep_last=1)
    assert dropped
    a.vacuum(keep_last=1)
    assert pinned_v not in a.versions()


def test_disjoint_catalog_writers_rebase(spark, tmp_path):
    a = _mkstore(spark, tmp_path / "a", [1])
    b = _mkstore(spark, tmp_path / "b", [10])
    cat = StoreCatalog(str(tmp_path / "cat"))
    cat.register("cur", a.path)
    cat.register("hist", b.path)

    # writer 1 advances `cur`; writer 2 (stale view) advances `hist`
    a.commit(spark.createDataFrame([(2, "w1")], "k long, status string"), mode="append")
    cat2 = StoreCatalog(str(tmp_path / "cat"))
    base_seen_by_2 = cat2.snapshot()

    cat._commit_pins({"cur": (a.path, a.head_version())})
    # writer 2 publishes from its stale base: disjoint table -> rebases
    b.commit(spark.createDataFrame([(20, "w2")], "k long, status string"), mode="append")
    assert cat2.snapshot() != base_seen_by_2  # sanity: head moved under it
    v = cat2._commit_pins({"hist": (b.path, b.head_version())}, base=base_seen_by_2, max_retries=2)

    final = cat.resolve()
    assert v == cat.head_version()
    assert final["cur"][1] == 2 and final["hist"][1] == 2  # both updates landed


def test_same_table_race_conflicts(spark, tmp_path):
    a = _mkstore(spark, tmp_path / "a", [1])
    cat = StoreCatalog(str(tmp_path / "cat"))
    cat.register("cur", a.path)

    a.commit(spark.createDataFrame([(2, "w1")], "k long, status string"), mode="append")
    cat2 = StoreCatalog(str(tmp_path / "cat"))
    stale = cat2.snapshot()
    cat._commit_pins({"cur": (a.path, 2)})
    # writer 2 tries to pin the SAME table from a stale base
    with pytest.raises(ConflictError, match="moved by a concurrent writer"):
        cat2._commit_pins({"cur": (a.path, 2)}, base=stale, max_retries=3)


def test_commit_multi_requires_registration(spark, tmp_path):
    cat = StoreCatalog(str(tmp_path / "cat"))
    with pytest.raises(ValueError, match="not registered"):
        cat.commit_multi(
            spark,
            {"ghost": (spark.range(1).select(F.col("id").alias("k")), {})},
        )


def test_lost_race_leaves_no_stale_tags(spark, tmp_path):
    """The loser's pre-publish tags must be dropped on conflict —
    otherwise every lost race permanently pins a store version."""
    a = _mkstore(spark, tmp_path / "a", [1])
    b = _mkstore(spark, tmp_path / "b", [10])
    cat = StoreCatalog(str(tmp_path / "cat"))
    cat.register("cur", a.path)
    cat.register("hist", b.path)
    n_tags_a = len(SnapshotStore(a.path).tags())

    cat2 = StoreCatalog(str(tmp_path / "cat"))
    stale = cat2.snapshot()
    a.commit(spark.createDataFrame([(2, "w")], "k long, status string"), mode="append")
    cat._commit_pins({"cur": (a.path, 2)})
    with pytest.raises(ConflictError):
        cat2._commit_pins({"cur": (a.path, 2)}, base=stale, max_retries=0)
    # loser's inflight tag for the contested catalog version is gone:
    # every catalog tag on the store maps to a LIVE catalog version
    cat_tags = {
        t for t in SnapshotStore(a.path).tags() if t.startswith("cat-")
    }
    expected = {cat.snapshot(v)["tag"] for v in cat.versions()}
    assert cat_tags <= expected
    assert len(cat_tags) >= n_tags_a


def test_injected_publish_race_cleans_only_losers_tags(spark, tmp_path):
    """Deterministic EEXIST race: the loser has already CREATED its
    attempt tags when the winner steals the publish slot. The loser's
    cleanup must drop exactly its own nonce-tags and leave the winner's
    pins untouched (tag names are attempt-unique by design)."""
    a = _mkstore(spark, tmp_path / "a", [1])
    b = _mkstore(spark, tmp_path / "b", [10])
    cat = StoreCatalog(str(tmp_path / "cat"))
    cat.register("cur", a.path)
    cat.register("hist", b.path)

    winner = StoreCatalog(str(tmp_path / "cat"))
    loser = StoreCatalog(str(tmp_path / "cat"))
    b.commit(spark.createDataFrame([(20, "l")], "k long, status string"),
             mode="append")

    orig = loser._publish
    fired = {"done": False}

    def racing(manifest):
        if not fired["done"]:
            fired["done"] = True
            # competitor lands the same next version first (disjoint table)
            a.commit(
                spark.createDataFrame([(2, "w")], "k long, status string"),
                mode="append",
            )
            winner._commit_pins({"cur": (a.path, a.head_version())})
        return orig(manifest)

    loser._publish = racing
    v = loser._commit_pins({"hist": (b.path, b.head_version())}, max_retries=2)

    # both writers landed; every cat- tag on every store is recorded in
    # a LIVE catalog manifest — no orphan pins from the lost attempt
    final = cat.resolve()
    assert final["cur"][1] == a.head_version()
    assert final["hist"][1] == b.head_version()
    assert v == cat.head_version()
    live_tags = {cat.snapshot(x)["tag"] for x in cat.versions()}
    for store_path in (a.path, b.path):
        got = {t for t in SnapshotStore(store_path).tags() if t.startswith("cat-")}
        assert got <= live_tags, (store_path, got, live_tags)


def test_cli_catalog_register_resolve_expire(spark, tmp_path, capsys):
    """`store catalog` CLI: register is one atomic catalog commit,
    resolve prints the pinned vector (manifest-only, no Spark startup),
    expire releases old pins."""
    import json as _json

    from log2sql_spark.cli import main

    a = _mkstore(spark, tmp_path / "a", [1, 2])
    cat_dir = str(tmp_path / "cat")
    assert main(["store", "catalog", cat_dir, "--register", "cur", a.path]) == 0
    assert capsys.readouterr().out.strip() == "v1"
    a.commit(spark.createDataFrame([(3, "x")], "k long, status string"),
             mode="append")
    assert main(["store", "catalog", cat_dir, "--register", "cur", a.path]) == 0
    assert capsys.readouterr().out.strip() == "v2"

    assert main(["store", "catalog", cat_dir]) == 0
    rows = [_json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert rows == [{"table": "cur", "path": a.path, "version": 2}]
    assert main(["store", "catalog", cat_dir, "--at-version", "1"]) == 0
    rows = [_json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert rows[0]["version"] == 1

    assert main(["store", "catalog", cat_dir, "--expire-keep-last", "1"]) == 0
    assert capsys.readouterr().out.strip() == "v1"
    cat = StoreCatalog(cat_dir)
    assert cat.versions() == [2]

    # janitor via CLI: plant an orphan pin tag, reap with age gate 0
    orphan = cat._tag_name(77, "cafe0123")
    cat._pin({"cur": {"path": a.path, "version": 1}}, orphan)
    assert main(["store", "catalog", cat_dir, "--janitor",
                 "--older-than-hours", "-1"]) == 0
    assert capsys.readouterr().out.strip() == f"{a.path}:{orphan}"
    assert orphan not in SnapshotStore(a.path).tags()


def test_catalog_fsck_detects_damage(spark, tmp_path):
    """fsck is clean on a healthy catalog, and names the exact problem
    when a member's pinned version or its pin tag is destroyed."""
    import os

    a = _mkstore(spark, tmp_path / "a", [1])
    cat = StoreCatalog(str(tmp_path / "cat"))
    cat.register("cur", a.path)
    a.commit(spark.createDataFrame([(2, "x")], "k long, status string"),
             mode="append")
    cat.register("cur", a.path)
    assert cat.fsck() == []

    # drop the pin tag of catalog v1 -> fsck names the missing tag
    tag1 = cat.snapshot(1)["tag"]
    SnapshotStore(a.path).drop_tag(tag1)
    probs = cat.fsck()
    assert any(tag1 in p and "points at None" in p for p in probs), probs

    # destroy the pinned store manifest -> fsck names the version
    os.remove(os.path.join(a.path, "_manifests", "v1.json"))
    probs = cat.fsck()
    assert any("pinned store version 1 missing" in p for p in probs), probs


_CAT_PROC_WORKER = r'''
import os, sys

sys.path.insert(0, os.environ["CATOCC_REPO"])
os.environ["SPARK_GRAFT_CPUS"] = "2"
os.environ["SPARK_GRAFT_DRIVER_MEM"] = "1500m"

from pyspark.sql import SparkSession

from log2sql_spark.store import SnapshotStore, StoreCatalog

root = os.environ["CATOCC_ROOT"]
table = os.environ["CATOCC_TABLE"]
lo = int(os.environ["CATOCC_LO"])

spark = (
    SparkSession.builder.master("local[2]")
    .appName(f"catocc_{table}")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.driver.memory", "1500m")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
cat = StoreCatalog(root)
rows = spark.createDataFrame(
    [(k, f"p{lo}") for k in range(lo, lo + 20)], "k long, status string"
)
v = cat.commit_multi(
    spark, {table: (rows, {"mode": "append"})}, max_retries=16
)
print(f"CATWORKER_OK table={table} catalog_version={v}", flush=True)
spark.stop()
'''


def test_cross_process_catalog_race_converges(spark, tmp_path):
    """Deployment shape for the catalog commit point: THREE separate OS
    processes (own JVM + SparkSession each) concurrently commit_multi
    to three DIFFERENT tables of one catalog. Disjoint-table races must
    all land via manifest-only rebase — one winner per catalog version,
    final vector carries all three updates, fsck clean."""
    import os as _os
    import subprocess
    import sys as _sys

    root = str(tmp_path / "cat")
    names = ["t_a", "t_b", "t_c"]
    cat = StoreCatalog(root)
    for i, n in enumerate(names):
        _mkstore(spark, tmp_path / n, [i])
        cat.register(n, str(tmp_path / n))
    base_head = cat.head_version()

    procs = []
    for i, n in enumerate(names):
        env = dict(_os.environ)
        env.update({
            "CATOCC_REPO": _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            "CATOCC_ROOT": root, "CATOCC_TABLE": n, "CATOCC_LO": str(100 * (i + 1)),
        })
        procs.append((n, subprocess.Popen(
            [_sys.executable, "-c", _CAT_PROC_WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )))

    landed = {}
    for n, p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker {n} failed:\n{out}\n{err[-3000:]}"
        landed[n] = int(out.split("catalog_version=")[1].split()[0])

    assert sorted(landed.values()) == [base_head + 1, base_head + 2, base_head + 3]
    assert cat.head_version() == base_head + 3
    final = cat.resolve()
    for i, n in enumerate(names):
        rows = {r.k for r in cat.read(spark, n).collect()}
        assert rows == {i} | set(range(100 * (i + 1), 100 * (i + 1) + 20)), n
        assert final[n][1] == 2  # every member store advanced exactly once
    assert cat.fsck() == []


def test_catalog_consistent_cdf_across_tables(spark, tmp_path):
    """read_changes addressed by CATALOG versions: both tables' feeds
    cut at the same transaction boundary; an unmoved table yields an
    empty feed, not the store-head drift."""
    a = _mkstore(spark, tmp_path / "a", [1, 2])
    b = _mkstore(spark, tmp_path / "b", [10])
    cat = StoreCatalog(str(tmp_path / "cat"))
    cat.register("cur", a.path)
    cat.register("hist", b.path)
    v0 = cat.head_version()

    # txn 1: both tables move
    cat.commit_multi(spark, {
        "cur": (spark.createDataFrame([(3, "n")], "k long, status string"),
                {"mode": "append"}),
        "hist": (spark.createDataFrame([(11, "n")], "k long, status string"),
                 {"mode": "append"}),
    })
    v1 = cat.head_version()
    # out-of-band store churn AFTER the catalog pin: must NOT leak into
    # the catalog-addressed feed
    a.commit(spark.createDataFrame([(99, "oob")], "k long, status string"),
             mode="append")

    cur_feed = cat.read_changes(spark, "cur", v0, v1, key_cols="k").collect()
    hist_feed = cat.read_changes(spark, "hist", v0, v1, key_cols="k").collect()
    assert {(r.k, r._change_type) for r in cur_feed} == {(3, "insert")}
    assert {(r.k, r._change_type) for r in hist_feed} == {(11, "insert")}

    # txn 2: only hist moves; cur's catalog-addressed feed is EMPTY
    cat.commit_multi(spark, {
        "hist": (spark.createDataFrame([(12, "n2")], "k long, status string"),
                 {"mode": "append"}),
    })
    v2 = cat.head_version()
    assert cat.read_changes(spark, "cur", v1, v2, key_cols="k").count() == 0
    assert {
        (r.k, r._change_type)
        for r in cat.read_changes(spark, "hist", v1, v2, key_cols="k").collect()
    } == {(12, "insert")}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="not present"):
        cat.read_changes(spark, "ghost", v0, v2)


# ---------------------------------------------------------------------------
# round 13: abort compensation + pin-tag janitor (r12 ADVICE items)
# ---------------------------------------------------------------------------


def test_aborted_commit_multi_compensates_store_commits(spark, tmp_path, monkeypatch):
    """Cross-table atomicity for ABORTED writers: a commit_multi that
    loses the catalog race rolls its store commits back (metadata-only
    restore), so the aborted rows never ride into the table's next
    successful catalog advance — the r12-advice leak."""
    a = _mkstore(spark, tmp_path / "a", [1])
    b = _mkstore(spark, tmp_path / "b", [10])
    cat1 = StoreCatalog(str(tmp_path / "cat"))
    cat1.register("cur", a.path)
    cat1.register("hist", b.path)

    # winner's store commit exists already; its catalog publish will be
    # injected between the loser's store commits and catalog publish
    a.commit(spark.createDataFrame([(2, "w1")], "k long, status string"),
             mode="append")
    winner_cur_v = a.head_version()

    cat2 = StoreCatalog(str(tmp_path / "cat"))
    real = cat2._commit_pins

    def race(pins, base=None, **kw):
        cat1._commit_pins({"cur": (a.path, winner_cur_v)})
        return real(pins, base=base, **kw)

    monkeypatch.setattr(cat2, "_commit_pins", race)
    with pytest.raises(ConflictError) as ei:
        cat2.commit_multi(spark, {
            "cur": (spark.createDataFrame([(3, "w2")], "k long, status string"),
                    {"mode": "append"}),
            "hist": (spark.createDataFrame([(30, "w2")], "k long, status string"),
                     {"mode": "append"}),
        })
    assert ei.value.uncompensated == []

    # both store HEADS mirror the pre-transaction states
    assert {r.k for r in a.read(spark).collect()} == {1, 2}
    assert {r.k for r in b.read(spark).collect()} == {10}
    # the aborted versions stay time-travel-visible but the next
    # successful catalog advance of each table carries no aborted rows
    cat1.commit_multi(spark, {
        "hist": (spark.createDataFrame([(11, "w3")], "k long, status string"),
                 {"mode": "append"}),
    })
    assert {r.k for r in cat1.read(spark, "hist").collect()} == {10, 11}
    assert {r.k for r in cat1.read(spark, "cur").collect()} == {1, 2}


def test_aborted_commit_multi_reports_uncompensated_stacked_table(
    spark, tmp_path, monkeypatch
):
    """A third writer stacking a store commit ON TOP of the loser's
    inside the race window makes that table uncompensatable — the
    loser must not restore under someone else's head. The name rides
    on the raised error."""
    a = _mkstore(spark, tmp_path / "a", [1])
    cat1 = StoreCatalog(str(tmp_path / "cat"))
    cat1.register("cur", a.path)

    cat2 = StoreCatalog(str(tmp_path / "cat"))
    real = cat2._commit_pins

    def race(pins, base=None, **kw):
        # winner stacks a commit ON TOP of the loser's and pins it
        a.commit(spark.createDataFrame([(9, "w1")], "k long, status string"),
                 mode="append")
        cat1._commit_pins({"cur": (a.path, a.head_version())})
        return real(pins, base=base, **kw)

    monkeypatch.setattr(cat2, "_commit_pins", race)
    with pytest.raises(ConflictError) as ei:
        cat2.commit_multi(spark, {
            "cur": (spark.createDataFrame([(3, "w2")], "k long, status string"),
                    {"mode": "append"}),
        })
    assert ei.value.uncompensated == ["cur"]
    # the winner's pinned state (which includes the loser's rows — the
    # winner appended on top of them) is untouched
    assert {r.k for r in cat1.read(spark, "cur").collect()} == {1, 3, 9}


def test_janitor_reaps_only_old_orphan_pin_tags(spark, tmp_path):
    import time as _time

    a = _mkstore(spark, tmp_path / "a", [1])
    cat = StoreCatalog(str(tmp_path / "cat"))
    cat.register("cur", a.path)
    live = {t for t in SnapshotStore(a.path).tags() if t.startswith("cat-")}

    # a writer that _pin-ed then died before _publish
    orphan = cat._tag_name(99, "deadbeef")
    cat._pin({"cur": {"path": a.path, "version": 1}}, orphan)
    assert orphan in SnapshotStore(a.path).tags()

    # fresh orphan: inside the age gate (an in-flight writer), kept
    assert cat.janitor(older_than_secs=3600.0) == []
    assert orphan in SnapshotStore(a.path).tags()

    # old orphan: reaped; live catalog pins untouched
    dropped = cat.janitor(older_than_secs=3600.0, now=_time.time() + 7200)
    assert dropped == [f"{a.path}:{orphan}"]
    after = {t for t in SnapshotStore(a.path).tags() if t.startswith("cat-")}
    assert after == live


def test_expire_crash_window_degrades_to_orphan_tag(spark, tmp_path, monkeypatch):
    """expire() now removes the manifest FIRST: a crash before the
    unpin leaves an orphan tag (safe — janitor reaps it), never a
    listed catalog version whose pins are already gone."""
    a = _mkstore(spark, tmp_path / "a", [1])
    cat = StoreCatalog(str(tmp_path / "cat"))
    cat.register("cur", a.path)
    v1_tag = cat.snapshot()["tag"]
    a.commit(spark.createDataFrame([(2, "x")], "k long, status string"),
             mode="append")
    cat._commit_pins({"cur": (a.path, a.head_version())})

    monkeypatch.setattr(cat, "_unpin", lambda *args, **kw: None)  # crash here
    dropped = cat.expire(keep_last=1)
    assert dropped == [1]
    assert cat.versions() == [2]  # manifest gone despite the "crash"
    assert v1_tag in SnapshotStore(a.path).tags()  # orphan tag debris

    cat2 = StoreCatalog(str(tmp_path / "cat"))  # un-patched instance
    import time as _time

    reaped = cat2.janitor(older_than_secs=3600.0, now=_time.time() + 7200)
    assert f"{a.path}:{v1_tag}" in reaped
    assert v1_tag not in SnapshotStore(a.path).tags()
    assert cat2.fsck() == []
