"""SnapshotStore: atomic manifest commits, time travel, MERGE, vacuum,
and crash/conflict behavior (log2sql_spark/store/snapshots.py)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from log2sql_spark.store import ConflictError, SnapshotStore


@pytest.fixture
def store(tmp_path):
    return SnapshotStore(str(tmp_path / "snapstore"))


def _df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, val string")


def test_append_and_overwrite_versions(spark, store):
    v1 = store.commit(_df(spark, [(1, "a"), (2, "b")]), mode="append")
    v2 = store.commit(_df(spark, [(3, "c")]), mode="append")
    assert (v1, v2) == (1, 2)
    assert store.read(spark).count() == 3  # append composes
    assert store.read(spark, version=1).count() == 2  # time travel
    v3 = store.commit(_df(spark, [(9, "z")]), mode="overwrite")
    assert v3 == 3
    assert [r.k for r in store.read(spark).collect()] == [9]
    # overwrite deleted nothing: v1/v2 still reconstruct
    assert store.read(spark, version=2).count() == 3


def test_merge_semantics(spark, store):
    store.commit(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    changes = spark.createDataFrame(
        [
            (2, "B", "update", 1),
            (3, None, "delete", 1),
            (4, "d", "insert", 1),
            # late-arriving lower version for k=2 must lose
            (2, "OLD", "update", 0),
        ],
        "k bigint, val string, op string, seq int",
    )
    store.merge(spark, changes, key_cols="k", version_cols="seq")
    got = {r.k: r.val for r in store.read(spark).collect()}
    assert got == {1: "a", 2: "B", 4: "d"}
    # idempotent re-delivery: merging the same batch again changes nothing
    store.merge(spark, changes, key_cols="k", version_cols="seq")
    assert {r.k: r.val for r in store.read(spark).collect()} == got


def test_unpublished_data_is_invisible(spark, store):
    store.commit(_df(spark, [(1, "a")]))
    # simulate a crashed commit: data directory written, no manifest
    orphan = os.path.join(store.path, "data", "v2-crashed")
    _df(spark, [(99, "zz")]).write.parquet(orphan)
    assert [r.k for r in store.read(spark).collect()] == [1]
    assert store.head_version() == 1


def test_conflict_detection(spark, store):
    store.commit(_df(spark, [(1, "a")]))
    # another writer publishes version 2 out from under us
    rogue = {"version": 2, "parent": 1, "mode": "append", "dirs": []}
    with open(os.path.join(store.path, "_manifests", "v2.json"), "w") as f:
        json.dump(rogue, f)
    with pytest.raises(ConflictError):
        store._publish({"version": 2, "parent": 1, "mode": "append", "dirs": []})


def test_vacuum(spark, store):
    store.commit(_df(spark, [(1, "a")]))
    store.commit(_df(spark, [(2, "b")]), mode="overwrite")
    store.commit(_df(spark, [(3, "c")]), mode="overwrite")
    # orphan from a crashed attempt
    orphan = os.path.join(store.path, "data", "vX-orphan")
    _df(spark, [(0, "x")]).write.parquet(orphan)
    deleted = store.vacuum(keep_last=1, include_orphans=True)
    assert store.versions() == [3]
    assert [r.k for r in store.read(spark).collect()] == [3]
    assert len(deleted) == 3  # v1 dir, v2 dir, orphan
    with pytest.raises(FileNotFoundError):
        store.snapshot(1)


def test_vacuum_keeps_shared_dirs(spark, store):
    # v1 append, v2 append: v2 references v1's dir — vacuum(keep=1)
    # must NOT delete the shared dir
    store.commit(_df(spark, [(1, "a")]))
    store.commit(_df(spark, [(2, "b")]), mode="append")
    store.vacuum(keep_last=1)
    assert sorted(r.k for r in store.read(spark).collect()) == [1, 2]
