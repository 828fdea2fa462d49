"""Named refs on the snapshot store: tags and branches (Iceberg refs).

A TAG is an immutable named pointer that pins its version against
vacuum — release/audit retention. A BRANCH is an independent line of
development (physically a shallow clone borrowing the fork-point files
by absolute path) on which EVERY store operation works unchanged;
merge_branch lands the branch state on main as one atomic commit,
hard-linking branch-owned files (zero-copy) and rewriting borrowed
entries back to main-relative paths. This generalizes
commit(audit=True)'s write-audit-publish to multi-commit staging.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from log2sql_spark.store import ConflictError, SnapshotStore


def _store(spark, tmp_path, n=1_000):
    store = SnapshotStore(str(tmp_path / "t"))
    base = spark.range(n).select(
        F.col("id").cast("int").alias("k"),
        F.lit("base").alias("status"),
        (F.col("id") * 10).cast("long").alias("cents"),
    )
    store.commit(base, mode="overwrite", cluster_by="k", target_files=4)
    return store


# ---- tags ----------------------------------------------------------


def test_tag_create_read_drop(spark, tmp_path):
    store = _store(spark, tmp_path)
    store.commit(
        spark.createDataFrame([(5_000, "v2", 0)],
                              "k int, status string, cents long"),
        mode="append", target_files=1,
    )
    assert store.create_tag("release-1.0", version=1) == 1
    assert store.create_tag("latest") == 2  # default = head
    assert store.tags() == {"latest": 2, "release-1.0": 1}
    assert store.tag_version("release-1.0") == 1
    assert store.read_tag(spark, "release-1.0").count() == 1_000
    assert store.read_tag(spark, "latest").count() == 1_001
    store.drop_tag("latest")
    assert store.tags() == {"release-1.0": 1}
    with pytest.raises(ValueError, match="no tag"):
        store.tag_version("latest")
    with pytest.raises(ValueError, match="no tag"):
        store.drop_tag("latest")


def test_tag_validation_and_uniqueness(spark, tmp_path):
    store = _store(spark, tmp_path, n=10)
    with pytest.raises(ValueError, match="invalid ref name"):
        store.create_tag("../escape")
    with pytest.raises(ValueError, match="nonexistent version"):
        store.create_tag("ghost", version=99)
    store.create_tag("r1")
    with pytest.raises(ConflictError, match="already exists"):
        store.create_tag("r1")  # immutable: no silent repointing


def test_tag_pins_version_against_vacuum(spark, tmp_path):
    """vacuum(keep_last=1) must retain a tagged old version — manifest
    AND data — and reap it once the tag is dropped."""
    store = _store(spark, tmp_path, n=200)
    store.create_tag("audit-2026Q3", version=1)
    big = spark.range(300).select(
        F.col("id").cast("int").alias("k"),
        F.lit("v2").alias("status"),
        F.lit(0).cast("long").alias("cents"),
    )
    store.commit(big, mode="overwrite", cluster_by="k", target_files=2)
    store.vacuum(keep_last=1)
    assert store.versions() == [1, 2]  # pinned v1 survived
    assert store.read(spark, 1).count() == 200  # data intact, not just manifest
    store.drop_tag("audit-2026Q3")
    deleted = store.vacuum(keep_last=1)
    assert store.versions() == [2]
    assert deleted  # v1's directory actually reaped this time


# ---- branches ------------------------------------------------------


def test_branch_wap_fast_forward(spark, tmp_path):
    """The write-audit-publish flow across MULTIPLE commits: stage an
    append and a merge on a branch (main's readers see none of it),
    validate the branch head, then merge_branch lands main in ONE
    atomic commit whose state equals the branch head."""
    store = _store(spark, tmp_path)
    br = store.create_branch("wap")
    assert list(store.branch_refs()) == ["wap"]

    br.commit(
        spark.createDataFrame([(5_000, "new", 1)],
                              "k int, status string, cents long"),
        mode="append", target_files=1,
    )
    br.merge(
        spark,
        spark.createDataFrame([(0, "upd", 99, "update", 1)],
                              "k int, status string, cents long, op string, seq int"),
        key_cols="k", version_cols="seq",
    )
    # isolation: main untouched while the branch evolved
    assert store.head_version() == 1
    assert store.read(spark).count() == 1_000
    branch_state = {(r.k, r.status) for r in store.branch("wap").read(spark).collect()}
    assert (5_000, "new") in branch_state and (0, "upd") in branch_state

    v = store.merge_branch(spark, "wap", drop=True)
    assert v == 2
    snap = store.snapshot(v)
    assert snap.meta["merged_branch"] == "wap"
    assert snap.meta["fast_forward"] is True
    main_state = {(r.k, r.status) for r in store.read(spark).collect()}
    assert main_state == branch_state
    assert store.branch_refs() == {}  # drop=True
    assert not os.path.isdir(os.path.join(store.path, "_branches", "wap"))
    # merged data survives the branch drop (hard links, not references)
    assert store.read(spark).count() == 1_001
    assert store.fsck(v) == []


def test_branch_merge_onto_moved_main_appends_rebase(spark, tmp_path):
    """Main moved after the fork, but the branch only APPENDED and
    neither side drifted schema/layout/governance: the merge lands
    without recomputation — main's head entries plus the branch-added
    files."""
    store = _store(spark, tmp_path)
    store.create_branch("feed")
    store.branch("feed").commit(
        spark.createDataFrame([(7_000, "branch", 0)],
                              "k int, status string, cents long"),
        mode="append", target_files=1,
    )
    # main moves concurrently
    store.commit(
        spark.createDataFrame([(6_000, "main", 0)],
                              "k int, status string, cents long"),
        mode="append", target_files=1,
    )
    v = store.merge_branch(spark, "feed")
    snap = store.snapshot(v)
    assert snap.meta["fast_forward"] is False
    rows = {r.k: r.status for r in store.read(spark, v).collect()}
    assert rows[6_000] == "main" and rows[7_000] == "branch"
    assert len(rows) == 1_002


def test_branch_merge_conflict_on_divergence(spark, tmp_path):
    """Main overwrote after the fork — the branch's borrowed base is
    stale and the append-rebase rule cannot prove disjointness: the
    merge must refuse, never silently resurrect pre-overwrite rows."""
    store = _store(spark, tmp_path, n=100)
    store.create_branch("stale")
    store.branch("stale").commit(
        spark.createDataFrame([(9_000, "branch", 0)],
                              "k int, status string, cents long"),
        mode="append", target_files=1,
    )
    fresh = spark.createDataFrame([(1, "rewritten", 0)],
                                  "k int, status string, cents long")
    store.commit(fresh, mode="overwrite", cluster_by="k", target_files=1)
    with pytest.raises(ConflictError, match="re-fork"):
        store.merge_branch(spark, "stale")
    # main unharmed
    assert {r.status for r in store.read(spark).collect()} == {"rewritten"}


def test_branch_merge_is_zero_copy_hard_links(spark, tmp_path):
    """Branch-owned parquet files land in main by hard link — the
    merged file shares its inode with the branch's (st_nlink >= 2),
    no bytes copied."""
    store = _store(spark, tmp_path, n=50)
    store.create_branch("zc")
    store.branch("zc").commit(
        spark.createDataFrame([(5_000, "new", 0)],
                              "k int, status string, cents long"),
        mode="append", target_files=1,
    )
    v = store.merge_branch(spark, "zc")
    base_rel = {e["path"] for e in store.snapshot(1).entries}
    added = [e for e in store.snapshot(v).entries if e["path"] not in base_rel]
    assert added
    linked = False
    for e in added:
        p = os.path.join(store.path, e["path"])
        if os.path.isdir(p):
            for root, _d, fs in os.walk(p):
                linked |= any(
                    os.stat(os.path.join(root, f)).st_nlink >= 2 for f in fs
                )
        elif os.path.isfile(p):
            linked |= os.stat(p).st_nlink >= 2
    assert linked


def test_branch_base_pinned_against_vacuum(spark, tmp_path):
    """A live branch borrows its fork-point files by absolute path —
    main's vacuum must keep that version alive (else the branch
    dangles), and may reap it after drop_branch."""
    store = _store(spark, tmp_path, n=100)
    store.create_branch("longlived")
    store.commit(
        spark.createDataFrame([(1, "v2", 0)],
                              "k int, status string, cents long"),
        mode="overwrite", cluster_by="k", target_files=1,
    )
    store.vacuum(keep_last=1)
    assert 1 in store.versions()  # fork-point pinned
    assert store.branch("longlived").read(spark).count() == 100  # no dangle
    store.drop_branch("longlived")
    store.vacuum(keep_last=1)
    assert store.versions() == [2]


def test_forget_refuses_while_refs_pin_history(spark, tmp_path):
    store = _store(spark, tmp_path, n=100)
    store.create_tag("keep", version=1)
    with pytest.raises(ValueError, match="physical erasure"):
        store.forget(spark, [1], key_col="k")
    store.drop_tag("keep")
    store.forget(spark, [1], key_col="k")
    assert 1 not in {r.k for r in store.read(spark).collect()}


def test_merge_branch_occ_retry_on_publish_race(spark, tmp_path):
    """A competitor lands an append between merge_branch's head read
    and its publish: max_retries re-derives against the new head (the
    branch is append-only, so the rebase rule still applies) and both
    writers' rows land."""
    store = _store(spark, tmp_path, n=100)
    competitor = SnapshotStore(store.path)
    store.create_branch("race")
    store.branch("race").commit(
        spark.createDataFrame([(8_000, "branch", 0)],
                              "k int, status string, cents long"),
        mode="append", target_files=1,
    )

    orig = store._publish
    state = {"fired": False}

    def racing(manifest):
        if not state["fired"]:
            state["fired"] = True
            competitor.commit(
                spark.createDataFrame([(8_500, "competitor", 0)],
                                      "k int, status string, cents long"),
                mode="append", target_files=1,
            )
        return orig(manifest)

    store._publish = racing
    v = store.merge_branch(spark, "race", max_retries=2)
    assert state["fired"]
    rows = {r.k: r.status for r in store.read(spark, v).collect()}
    assert rows[8_000] == "branch" and rows[8_500] == "competitor"
    assert len(rows) == 102


def test_streaming_wap_into_branch_then_merge(spark, tmp_path):
    """Streaming write-audit-publish: the production CDC apply stream
    targets a BRANCH of the serving table (a branch is a full store, so
    apply_changes_to_snapshot_store needs zero changes), the branch head
    is validated, then merge_branch publishes the whole ingest to main
    atomically — readers of main never see a half-applied stream."""
    from log2sql_spark.sources.catalog import catalog_from_dict
    from log2sql_spark.streaming.cdc_stream import apply_changes_to_snapshot_store
    from tests.test_streaming import CATALOG, TS, _dump

    main = SnapshotStore(str(tmp_path / "serving"))
    seed = spark.createDataFrame(
        [("0", {"id": "0", "status": "'seed'"})], "key string, after map<string,string>",
    )
    main.commit(seed, mode="overwrite", cluster_by="key", target_files=1)
    br = main.create_branch("ingest")

    in_dir, ckpt = tmp_path / "in", tmp_path / "ckpt"
    in_dir.mkdir()
    _dump(in_dir / "bin.000001.txt", [
        {"op": "insert", "db": "shop", "table": "orders", "ts": TS,
         "values": [(1, "1"), (2, "'new'")]},
        {"op": "update", "db": "shop", "table": "orders", "ts": TS,
         "before": [(1, "1"), (2, "'new'")],
         "after": [(1, "1"), (2, "'shipped'")]},
    ])
    cat = catalog_from_dict(spark, CATALOG)
    q = apply_changes_to_snapshot_store(
        spark, str(in_dir), cat, br.path, str(ckpt), key_col="id",
    )
    q.awaitTermination(120)

    # main untouched during the whole ingest; branch holds the applied state
    assert {r.key for r in main.read(spark).collect()} == {"0"}
    staged = {r.key: r.after for r in br.read(spark).collect()}
    assert staged["1"]["status"] == "'shipped'" and "0" in staged

    v = main.merge_branch(spark, "ingest", drop=True)
    published = {r.key: r.after for r in main.read(spark, v).collect()}
    assert published == staged


def test_cli_tag_branch_merge(spark, tmp_path, capsys):
    """The lakehouse-CLI surface for refs: tag create/list/drop and
    branch create/list are manifest-only (no Spark startup);
    merge-branch runs the zero-copy publish. Round-trips the whole WAP
    flow through store_main."""
    import json

    from log2sql_spark.cli import store_main

    store = _store(spark, tmp_path, n=50)
    path = store.path

    assert store_main(["tag", path, "--create", "rel-1", "--at-version", "1"]) == 0
    assert capsys.readouterr().out.strip() == "v1"
    assert store_main(["tag", path]) == 0
    assert json.loads(capsys.readouterr().out) == {"tag": "rel-1", "version": 1}

    assert store_main(["branch", path, "--create", "wap"]) == 0
    br_path = capsys.readouterr().out.strip()
    assert os.path.isdir(br_path)
    SnapshotStore(br_path).commit(
        spark.createDataFrame([(9_999, "staged", 0)],
                              "k int, status string, cents long"),
        mode="append", target_files=1,
    )
    assert store_main(["branch", path]) == 0
    listed = json.loads(capsys.readouterr().out)
    assert listed == {"branch": "wap", "base_version": 1, "head": 2}

    assert store_main(["merge-branch", path, "--name", "wap", "--drop"]) == 0
    assert capsys.readouterr().out.strip() == "v2"
    assert {r.k for r in store.read(spark).collect()} >= {9_999}
    assert store.branch_refs() == {}

    assert store_main(["tag", path, "--drop", "rel-1"]) == 0
    assert capsys.readouterr().out.strip() == "rel-1"
    assert store.tags() == {}


def test_expire_tags_max_ref_age(spark, tmp_path):
    """Iceberg max-ref-age: expire_tags drops only tags older than the
    horizon (branches never auto-expire — they hold unpublished work),
    and the next vacuum reaps the newly unpinned version."""
    import json as _json
    import os as _os

    store = _store(spark, tmp_path, n=100)
    store.create_tag("nightly-old", version=1)
    store.create_tag("nightly-new", version=1)
    # age the first tag on disk deterministically
    p = _os.path.join(store.path, "_refs", "tags", "nightly-old.json")
    ref = _json.load(open(p))
    ref["created_at"] -= 10_000
    _json.dump(ref, open(p, "w"))

    dropped = store.expire_tags(older_than_secs=5_000)
    assert dropped == ["nightly-old"]
    assert set(store.tags()) == {"nightly-new"}

    store.commit(
        spark.createDataFrame([(1, "v2", 0)],
                              "k int, status string, cents long"),
        mode="overwrite", cluster_by="k", target_files=1,
    )
    store.vacuum(keep_last=1)
    assert store.versions() == [1, 2]  # still pinned by nightly-new
    store.expire_tags(older_than_secs=-1)  # everything is now "old"
    store.vacuum(keep_last=1)
    assert store.versions() == [2]
