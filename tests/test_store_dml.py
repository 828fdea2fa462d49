"""DELETE WHERE / UPDATE WHERE on the snapshot store: Delta DML parity
with file-carry pruning (store/snapshots.py delete_where/update_where).

Companion query: store_update_delete_where_read (oracle-checked data);
these tests assert the SCALE claims the oracle can't see — which files
were rewritten vs carried by reference — plus the contract edges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log2sql_spark.store import SnapshotStore


@pytest.fixture
def clustered(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "dml"))
    base = spark.range(0, 800).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).cast("bigint").alias("grp"),
        (F.col("id") * 10).cast("bigint").alias("cents"),
    )
    store.commit(base, mode="overwrite", cluster_by="k", target_files=8)
    return store


def _paths(store, version):
    return {e["path"] for e in store.snapshot(version).entries}


def test_delete_where_prunes_and_carries(spark, clustered):
    v1 = clustered.head_version()
    before = _paths(clustered, v1)
    v2 = clustered.delete_where(
        spark, "k >= 100 AND k < 200 AND k % 2 = 0", key_bounds=(100, 199)
    )
    after = _paths(clustered, v2)
    carried = before & after
    # 8 range files over [0, 800) → the [100, 200) band overlaps 1-2;
    # the other ≥6 carry by reference (zero bytes rewritten for them).
    assert len(carried) >= len(before) - 2
    got = clustered.read(spark)
    assert got.filter("k >= 100 AND k < 200 AND k % 2 = 0").count() == 0
    # narrower-than-band predicate: odd keys inside the band survive
    assert got.filter("k >= 100 AND k < 200").count() == 50
    assert got.count() == 750


def test_update_where_prunes_and_carries(spark, clustered):
    v1 = clustered.head_version()
    before = _paths(clustered, v1)
    v2 = clustered.update_where(
        spark, {"cents": "cents + 1"}, "k >= 300 AND k < 350 AND grp = 0",
        key_bounds=(300, 349),
    )
    after = _paths(clustered, v2)
    assert len(before & after) >= len(before) - 2
    got = clustered.read(spark)
    # matching rows updated, in-file non-matching rows byte-identical
    assert got.filter("k >= 300 AND k < 350 AND grp = 0 AND cents = k*10+1").count() == 10
    assert got.filter("cents != k * 10").count() == 10
    assert got.count() == 800


def test_update_where_may_leave_own_predicate(spark, clustered):
    # an UPDATE that moves rows OUT of its own WHERE clause is legal
    # (replace_where would refuse this post-image)
    clustered.update_where(
        spark, {"grp": "grp + 100"}, "grp = 1", key_bounds=None
    )
    got = clustered.read(spark)
    assert got.filter("grp = 1").count() == 0
    assert got.filter("grp = 101").count() == 160


def test_update_cluster_key_falls_back_to_full_rewrite(spark, clustered):
    v1 = clustered.head_version()
    before = _paths(clustered, v1)
    v2 = clustered.update_where(
        spark, {"k": "k + 10000"}, "k < 100", key_bounds=(0, 99)
    )
    # pruned path refused (cluster key updated): nothing carries
    assert not (_paths(clustered, v2) & before)
    got = clustered.read(spark)
    assert got.filter("k >= 10000").count() == 100
    assert got.count() == 800


def test_delete_where_nonoverlapping_bounds_is_cheap(spark, clustered):
    v1 = clustered.head_version()
    before = _paths(clustered, v1)
    v2 = clustered.delete_where(spark, "k >= 100000", key_bounds=(100000, 200000))
    # no file overlaps the band: every file carries
    assert _paths(clustered, v2) == before
    assert clustered.read(spark).count() == 800


def test_update_where_unknown_column_refuses(spark, clustered):
    with pytest.raises(ValueError, match="unknown columns"):
        clustered.update_where(spark, {"nope": "1"}, "k < 10")


def test_dml_preserves_time_travel_and_constraints(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "c"))
    base = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    store.commit(base, mode="overwrite", cluster_by="k", target_files=4)
    store.add_constraint(spark, "v_nonneg", "v >= 0")
    v = store.delete_where(spark, "k < 10", key_bounds=(0, 9))
    assert store.read(spark, version=v - 1).count() == 100  # time travel
    assert store.read(spark).count() == 90
    # constraint survives the DML commit and still enforces
    with pytest.raises(ValueError, match="v_nonneg"):
        store.update_where(spark, {"v": "-1"}, "k = 50", key_bounds=(50, 50))
