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


def test_clustered_commit_records_file_stats(spark, store):
    df = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") % 7).cast("string").alias("val"))
    store.commit(df, cluster_by="k", target_files=4)
    snap = store.snapshot(1)
    assert snap.cluster_by == "k"
    assert snap.has_stats
    assert len(snap.entries) == 4
    # files are range-disjoint and cover [0, 999]
    ranges = sorted((e["min"], e["max"]) for e in snap.entries)
    assert ranges[0][0] == 0 and ranges[-1][1] == 999
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
        assert a_hi < b_lo


def test_pruned_merge_rewrites_only_overlapping_files(spark, store):
    df = spark.range(0, 1000).select(F.col("id").alias("k"), F.lit("x").alias("val"))
    store.commit(df, cluster_by="k", target_files=4)
    before = store.snapshot(1).entries
    # changes confined to keys 10..20: exactly one file overlaps
    changes = spark.createDataFrame(
        [(10, "UPD", "update", 1), (20, None, "delete", 1)],
        "k bigint, val string, op string, seq int",
    )
    store.merge(spark, changes, key_cols="k", version_cols="seq")
    after = store.snapshot(2)
    assert after.mode == "merge"
    before_paths = {e["path"] for e in before}
    after_paths = {e["path"] for e in after.entries}
    carried = before_paths & after_paths
    assert len(carried) == 3  # 3 of 4 files untouched, carried by reference
    # data is correct
    got = {r.k: r.val for r in store.read(spark).filter(F.col("k").isin(10, 20, 30)).collect()}
    assert got == {10: "UPD", 30: "x"}
    assert store.read(spark).count() == 999
    # time travel to v1 still has the original 1000 rows
    assert store.read(spark, 1).count() == 1000
    # the CDF between versions only compares the rewritten footprint
    d = {(r.k, r.change_type) for r in store.diff(spark, 1, 2).collect()}
    assert (10, "added") in d and (10, "removed") in d and (20, "removed") in d
    assert not any(k == 30 for k, _ in d)


def test_pruned_merge_insert_outside_all_ranges(spark, store):
    store.commit(
        spark.range(0, 100).select(F.col("id").alias("k"), F.lit("x").alias("val")),
        cluster_by="k", target_files=2,
    )
    changes = spark.createDataFrame(
        [(5000, "new", "insert", 1)], "k bigint, val string, op string, seq int"
    )
    store.merge(spark, changes, key_cols="k", version_cols="seq")
    assert store.read(spark).count() == 101
    assert store.read(spark).filter(F.col("k") == 5000).count() == 1


def test_compact_reduces_files_keeps_data(spark, store):
    for i in range(5):
        store.commit(
            spark.range(i * 10, i * 10 + 10).select(F.col("id").alias("k"), F.lit(str(i)).alias("val")),
            mode="append",
        )
    assert len(store.snapshot(store.head_version()).entries) == 5
    store.compact(spark, target_files=1)
    head = store.snapshot(store.head_version())
    assert len(head.dirs) == 1
    assert store.read(spark).count() == 50


def test_footer_stats_with_colliding_nested_leaf(spark, store):
    # a map column's internal leaf is also named "key" — stats must come
    # from the TOP-LEVEL key column (regression: leaf-name collision)
    df = spark.createDataFrame(
        [("a", {"zz": "1"}), ("m", {"aa": "2"})],
        "key string, after map<string,string>",
    )
    store.commit(df, cluster_by="key", target_files=1)
    snap = store.snapshot(1)
    assert snap.has_stats
    lo = min(e["min"] for e in snap.entries)
    hi = max(e["max"] for e in snap.entries)
    assert (lo, hi) == ("a", "m")


def test_append_schema_evolution(spark, store):
    store.commit(_df(spark, [(1, "a")]))
    widened = spark.createDataFrame(
        [(2, "b", "eu")], "k bigint, val string, region string"
    )
    # schema enforcement by default (Delta semantics)...
    with pytest.raises(ValueError, match="merge_schema=True"):
        store.commit(widened, mode="append")
    # ...explicit opt-in widens additively
    store.commit(widened, mode="append", merge_schema=True)
    head = store.read(spark)
    assert set(head.columns) == {"k", "val", "region"}
    got = {r.k: r.region for r in head.collect()}
    assert got == {1: None, 2: "eu"}  # old rows read as NULL in new cols
    # time travel: v1 keeps its original (narrow) schema
    assert set(store.read(spark, 1).columns) == {"k", "val"}


def test_hash_layout_bucket_pruned_merge(spark, store):
    df = spark.createDataFrame(
        [(f"user-{i}", "x") for i in range(200)], "k string, val string"
    )
    store.commit(df, cluster_by="k", layout="hash", target_files=8)
    snap = store.snapshot(1)
    assert snap.layout == "hash" and snap.n_buckets == 8
    assert snap.has_buckets and len(snap.entries) == 8
    assert set(store.read(spark).columns) == {"k", "val"}  # _bucket hidden

    changes = spark.createDataFrame(
        [("user-7", "UPD", "update", 1), ("user-8", None, "delete", 1),
         ("user-9999", "new", "insert", 1)],
        "k string, val string, op string, seq int",
    )
    store.merge(spark, changes, key_cols="k", version_cols="seq")
    after = store.snapshot(2)
    assert after.mode == "merge" and after.layout == "hash"
    carried = {e["path"] for e in snap.entries} & {e["path"] for e in after.entries}
    assert len(carried) >= 5  # at most 3 buckets rewritten
    got = {r.k: r.val for r in store.read(spark).filter(
        F.col("k").isin("user-7", "user-8", "user-9999", "user-11")).collect()}
    assert got == {"user-7": "UPD", "user-9999": "new", "user-11": "x"}
    assert store.read(spark).count() == 200  # -1 delete +1 insert

    # point lookup prunes to the key's bucket(s)
    pruned = store.read_pruned(spark, ["user-7"])
    n_files = pruned.select(F.input_file_name()).distinct().count()
    assert n_files <= 2
    assert pruned.filter(F.col("k") == "user-7").count() == 1

    # compaction preserves bucketing
    store.compact(spark)
    head = store.snapshot(store.head_version())
    assert head.layout == "hash" and head.n_buckets == 8
    assert store.read(spark).count() == 200


def test_hash_layout_null_keys(spark, store):
    df = spark.createDataFrame(
        [("a", "1"), (None, "2"), (None, "3")], "k string, val string"
    )
    store.commit(df, cluster_by="k", layout="hash", target_files=4)
    assert store.read(spark).count() == 3  # null keys stored, not crashed
    # merging a null-key change touches bucket 0, where nulls live
    changes = spark.createDataFrame(
        [(None, "X", "update", 1)], "k string, val string, op string, seq int"
    )
    store.merge(spark, changes, key_cols="k", version_cols="seq")
    vals = sorted(
        r.val for r in store.read(spark).filter(F.col("k").isNull()).collect()
    )
    # merge_into groups ALL null keys as one key: latest change wins
    assert vals == ["X"]


def test_rename_column_metadata_only(spark, store, tmp_path):
    """rename_column rewrites zero data files; reads reconcile physical
    generations; pruning follows the renamed cluster key."""
    df = spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("cents")
    )
    store.commit(df, cluster_by="k")
    files_before = sorted(
        str(p) for p in (tmp_path / "snapstore" / "data").rglob("*.parquet")
    )
    v = store.rename_column("cents", "price_cents")
    files_after = sorted(
        str(p) for p in (tmp_path / "snapstore" / "data").rglob("*.parquet")
    )
    assert files_before == files_after  # metadata-only
    assert store.read(spark).columns == ["k", "price_cents"]
    # time travel shows the pre-rename schema
    assert store.read(spark, v - 1).columns == ["k", "cents"]
    # append under the logical name, then a chained rename across BOTH
    # physical generations, then rename-back to the original physical
    store.commit(
        spark.range(20, 25).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("price_cents")
        ),
        mode="append",
        cluster_by="k",
    )
    store.rename_column("price_cents", "pc2")
    assert store.read(spark).columns == ["k", "pc2"]
    assert store.read(spark).agg(F.sum("pc2")).head()[0] == sum(
        i * 10 for i in range(25)
    )
    store.rename_column("pc2", "cents")
    assert store.read(spark).columns == ["k", "cents"]
    # pruned read across mixed generations
    got = {
        (r.k, r.cents)
        for r in store.read_pruned(spark, [3, 22])
        .filter(F.col("k").isin([3, 22]))
        .collect()
    }
    assert got == {(3, 30), (22, 220)}
    # appending the physical name of a renamed column is rejected
    store.rename_column("cents", "money")
    with pytest.raises(ValueError, match="collide with physical"):
        store.commit(
            spark.range(1).select(F.col("id").alias("k"), F.lit(1).alias("cents")),
            mode="append",
        )
    # compact materializes the mapping
    store.compact(spark)
    head = store.snapshot(store.head_version())
    assert head.renames == {}
    assert store.read(spark).columns == ["k", "money"]


def test_rename_column_validation(spark, store):
    store.commit(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="no column"):
        store.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        store.rename_column("val", "k")
    with pytest.raises(ValueError, match="empty store"):
        SnapshotStore(store.path + "_empty").rename_column("a", "b")


def test_clone_shallow_zero_copy_and_isolation(spark, store, tmp_path):
    """clone_to copies no data; clone commits/vacuum never touch the
    source; source overwrites never change the clone."""
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("cents")
    )
    store.commit(df, cluster_by="k")
    clone = store.clone_to(str(tmp_path / "clone"))
    # zero copy: the clone has no data directory at all yet
    assert not (tmp_path / "clone" / "data").exists()
    assert clone.read(spark).count() == 10
    # diverge: append to the clone, overwrite the source
    clone.commit(
        spark.range(10, 13).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("cents")
        ),
        mode="append",
        cluster_by="k",
    )
    assert clone.read(spark).count() == 13
    assert store.read(spark).count() == 10
    # clone vacuum can only delete clone-owned dirs (borrowed entries
    # are absolute → unowned); source bytes survive
    clone.vacuum(keep_last=1)
    assert store.read(spark).count() == 10
    assert clone.read(spark).count() == 13
    # source fsck clean, clone fsck clean
    assert store.fsck() == [] and clone.fsck() == []
    # cloning into a non-empty store is rejected
    with pytest.raises(ValueError, match="not empty"):
        store.clone_to(str(tmp_path / "clone"))
    # renames travel with the clone
    store.rename_column("cents", "money")
    c2 = store.clone_to(str(tmp_path / "clone2"))
    assert c2.read(spark).columns == ["k", "money"]


def test_generated_columns_compute_validate_inherit(spark, store):
    df = spark.range(5).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("cents")
    )
    store.commit(df, generated={"band": "cents div 250"})
    got = {(r.k, r.band) for r in store.read(spark).collect()}
    assert got == {(0, 0), (1, 0), (2, 0), (3, 1), (4, 1)}
    # append WITHOUT the column: spec inherited, store computes it
    store.commit(
        spark.range(5, 7).select(
            F.col("id").alias("k"), (F.col("id") * 100).alias("cents")
        ),
        mode="append",
    )
    assert store.read(spark).filter("k = 6").head().band == 2
    # append WITH a lying value: rejected before any byte lands
    head = store.head_version()
    with pytest.raises(ValueError, match="generated column"):
        store.commit(
            spark.range(7, 8).select(
                F.col("id").alias("k"),
                (F.col("id") * 100).alias("cents"),
                F.lit(99).cast("bigint").alias("band"),
            ),
            mode="append",
        )
    assert store.head_version() == head
    # compaction keeps the spec; rename of a referenced column refuses
    store.compact(spark)
    assert store.snapshot(store.head_version()).generated == {
        "band": "cents div 250"
    }
    with pytest.raises(ValueError, match="referenced by generated"):
        store.rename_column("cents", "money")
    # renaming the generated column itself follows the spec
    store.rename_column("band", "price_band")
    assert store.snapshot(store.head_version()).generated == {
        "price_band": "cents div 250"
    }


def test_drop_column_metadata_only(spark, store, tmp_path):
    """drop_column rewrites nothing; reads exclude every physical
    generation; name reuse is blocked until compaction rewrites the
    old bytes out."""
    df = spark.range(10).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("cents"),
        F.lit("x").alias("note"),
    )
    store.commit(df, cluster_by="k")
    files_before = sorted(
        str(p) for p in (tmp_path / "snapstore" / "data").rglob("*.parquet")
    )
    v = store.drop_column("note")
    files_after = sorted(
        str(p) for p in (tmp_path / "snapstore" / "data").rglob("*.parquet")
    )
    assert files_before == files_after
    assert store.read(spark).columns == ["k", "cents"]
    assert store.read(spark, v - 1).columns == ["k", "cents", "note"]  # time travel
    # append without the column: fine; WITH the dropped name: blocked
    store.commit(
        spark.range(10, 12).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("cents")
        ),
        mode="append",
        cluster_by="k",
    )
    assert store.read(spark).count() == 12
    with pytest.raises(ValueError, match="reuse dropped"):
        store.commit(
            spark.range(12, 13).select(
                F.col("id").alias("k"),
                (F.col("id") * 10).alias("cents"),
                F.lit("y").alias("note"),
            ),
            mode="append",
            cluster_by="k",
            merge_schema=True,
        )
    with pytest.raises(ValueError, match="was dropped"):
        store.rename_column("cents", "note")
    # a RENAMED column drops all its physical generations
    store.rename_column("cents", "money")
    store.drop_column("money")
    assert store.read(spark).columns == ["k"]
    # compact materializes: name becomes reusable
    store.compact(spark)
    assert store.snapshot(store.head_version()).dropped == []
    store.commit(
        spark.range(1).select(F.col("id").alias("k"), F.lit("z").alias("note")),
        mode="append",
        merge_schema=True,
    )
    assert "note" in store.read(spark).columns
    # guards
    with pytest.raises(ValueError, match="cluster key"):
        s2 = SnapshotStore(str(tmp_path / "s2"))
        s2.commit(
            spark.range(3).select(F.col("id").alias("k"), F.lit(1).alias("v")),
            cluster_by="k",
        )
        s2.drop_column("k")


def test_read_policies_mask_and_row_filter(spark, store):
    """Column masks + row filters: governed reads see policy output,
    maintenance reads raw; policies are snapshot-versioned, survive
    compaction, and block renames/drops of referenced columns."""
    df = spark.range(10).select(
        F.col("id").alias("k"),
        (F.col("id") * 111).alias("cents"),
        F.concat(F.lit("user"), F.col("id")).alias("email"),
    )
    store.commit(df, cluster_by="k")
    v_raw = store.head_version()
    store.set_mask("email", "concat(substr(email, 1, 4), '***')")
    store.set_row_filter("k % 2 = 0")
    got = {r.k: (r.cents, r.email) for r in store.read(spark).collect()}
    assert set(got) == {0, 2, 4, 6, 8}
    assert got[4] == (444, "user***")
    # raw owner path + time travel to the pre-policy snapshot
    assert store.read(spark, apply_policies=False).count() == 10
    assert store.read(spark, v_raw).count() == 10
    assert store.read(spark, v_raw).filter("k = 3").head().email == "user3"
    # pruned reads are governed too
    pruned = store.read_pruned(spark, [3, 4]).filter(F.col("k").isin([3, 4]))
    assert {(r.k, r.email) for r in pruned.collect()} == {(4, "user***")}
    # a merge neither sees masked values nor destroys raw ones
    ch = spark.createDataFrame(
        [(4, 999, "user4", "upsert", 1)], "k long, cents long, email string, op string, _seq long"
    )
    store.merge(spark, ch, "k", "_seq")
    assert store.read(spark, apply_policies=False).filter("k = 3").head().email == "user3"
    assert store.read(spark).filter("k = 4").head().cents == 999
    # governance survives compaction
    store.compact(spark)
    assert store.read(spark).count() == 5
    assert store.snapshot(store.head_version()).policies["row_filter"] == "k % 2 = 0"
    # policy-referenced columns refuse rename/drop (the cluster-key
    # guard fires first for k; the mask guard for email)
    with pytest.raises(ValueError, match="cluster key"):
        store.drop_column("k")
    with pytest.raises(ValueError, match="read policy"):
        store.rename_column("k", "pk")
    with pytest.raises(ValueError, match="read policy"):
        store.rename_column("email", "contact")
    # dropping the policy unblocks the rename, and a self-referencing
    # mask set under the NEW name works
    store.drop_mask("email")
    store.rename_column("email", "contact")
    store.set_mask("contact", "concat(substr(contact, 1, 4), '***')")
    assert store.read(spark).filter("k = 4").head().contact == "user***"


def test_rename_masked_column_blocked_when_expr_references_it(spark, store):
    df = spark.range(3).select(F.col("id").alias("k"), F.lit("x").alias("email"))
    store.commit(df)
    store.set_mask("email", "concat(substr(email, 1, 1), '***')")
    with pytest.raises(ValueError, match="read policy"):
        store.rename_column("email", "contact")


def test_policy_validation(spark, store):
    store.commit(
        spark.range(3).select(F.col("id").alias("k"), F.lit(1).alias("v")),
        cluster_by="k",
    )
    with pytest.raises(ValueError, match="no column"):
        store.set_mask("nope", "1")
    with pytest.raises(ValueError, match="cluster key"):
        store.set_mask("k", "0")
    with pytest.raises(ValueError, match="no mask"):
        store.drop_mask("v")
    store.set_row_filter("v > 0")
    store.drop_row_filter()
    with pytest.raises(ValueError, match="no row filter"):
        store.drop_row_filter()


def test_snapshot_datasource_respects_rename_and_policies(spark, store, tmp_path):
    """format('snapshot') resolves renamed columns across physical
    generations and refuses a policied store unless the caller takes
    the owner path explicitly."""
    from pyspark.errors import AnalysisException

    df = spark.range(5).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("cents")
    )
    store.commit(df, cluster_by="k")
    store.rename_column("cents", "money")
    store.commit(
        spark.range(5, 7).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("money")
        ),
        mode="append",
        cluster_by="k",
    )
    got = spark.read.format("snapshot").load(store.path)
    assert got.columns == ["k", "money"]
    # both physical generations resolve (no silent NULLs for old files)
    assert {r.money for r in got.collect()} == {0, 10, 20, 30, 40, 50, 60}

    store.set_mask("money", "0")
    with pytest.raises(Exception, match="read policies"):
        spark.read.format("snapshot").load(store.path).collect()
    raw = spark.read.format("snapshot").option("raw", "true").load(store.path)
    assert {r.money for r in raw.collect()} == {0, 10, 20, 30, 40, 50, 60}


def test_snapshot_datasource_writer_roundtrip(spark, store, tmp_path):
    """df.write.format('snapshot'): DSv2 write path honoring the store's
    commit protocol — overwrite, append with union schema, guards for
    mapped/policied stores, and vacuum-sweepable orphans on abort."""
    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("cents"),
        (F.col("id") % 2 == 0).alias("flag"),
    )
    df.write.format("snapshot").mode("overwrite").save(store.path)
    assert store.head_version() == 1
    assert store.read(spark).count() == 100
    assert store.snapshot(1).meta.get("writer") == "datasource"
    # append composes and is readable through BOTH paths
    spark.range(100, 120).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("cents"),
        F.lit(True).alias("flag"),
    ).write.format("snapshot").mode("append").save(store.path)
    assert store.read(spark).count() == 120
    assert spark.read.format("snapshot").load(store.path).count() == 120
    # appends to a mapped/policied store refuse the raw writer
    store.rename_column("cents", "money")
    with pytest.raises(Exception, match="column mappings"):
        spark.range(3).select(
            F.col("id").alias("k"),
            (F.col("id") * 2).alias("money"),
            F.lit(True).alias("flag"),
        ).write.format("snapshot").mode("append").save(store.path)
    # overwrite resets the mapping and succeeds
    spark.range(5).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("money"),
        F.lit(False).alias("flag"),
    ).write.format("snapshot").mode("overwrite").save(store.path)
    assert store.read(spark).count() == 5
    assert store.snapshot(store.head_version()).renames == {}


def test_compact_small_partial_rewrite(spark, store, tmp_path):
    """compact_small rewrites only the small-file backlog; right-sized
    files carry by reference (OPTIMIZE semantics), pruning survives,
    and a shaped store is a no-op."""
    # sha2 payload: incompressible, so the two base files stay over the
    # size threshold after snappy
    big = spark.range(0, 200_000).select(
        F.col("id").alias("k"), F.sha2(F.col("id").cast("string"), 256).alias("val")
    )
    store.commit(big, cluster_by="k", target_files=2)
    for i in range(4):  # streaming-style small appends
        store.commit(
            spark.range(200_000 + i * 10, 200_000 + i * 10 + 10).select(
                F.col("id").alias("k"), F.lit("s").alias("val")
            ),
            mode="append",
            cluster_by="k",
            target_files=1,
        )
    before = store.snapshot(store.head_version()).entries
    assert len(before) == 6
    total_before = store.read(spark).count()
    v = store.compact_small(spark, min_file_mb=1.0, target_files=1)
    head = store.snapshot(v)
    assert head.mode == "compact"
    # the two big files carried by reference, 4 small ones merged to 1
    before_paths = {e["path"] for e in before}
    after_paths = {e["path"] for e in head.entries}
    assert len(before_paths & after_paths) == 2
    assert len(head.entries) == 3
    assert store.read(spark).count() == total_before
    # stats intact on every entry -> pruned reads still work
    assert head.has_stats
    got = store.read_pruned(spark, [200_005]).filter("k = 200005").count()
    assert got == 1
    # already shaped: second run is a no-op
    assert store.compact_small(spark, min_file_mb=1.0, target_files=1) is None


def test_persistent_check_constraints(spark, store):
    """add_constraint validates existing data, then every future
    commit/merge enforces it; violations abort pre-publish; compaction
    and policy commits carry the constraint forward."""
    from log2sql_spark.store.snapshots import ExpectationError

    store.commit(
        spark.range(10).select(F.col("id").alias("k"), (F.col("id") * 10).alias("cents")),
        cluster_by="k",
    )
    # existing data violates -> refused, nothing published
    with pytest.raises(ExpectationError):
        store.add_constraint(spark, "big", "cents >= 50")
    assert store.head_version() == 1
    store.add_constraint(spark, "non_negative", "cents >= 0")
    # good append passes; bad append aborts with no new version
    store.commit(
        spark.range(10, 12).select(F.col("id").alias("k"), (F.col("id") * 10).alias("cents")),
        mode="append", cluster_by="k",
    )
    head = store.head_version()
    with pytest.raises(ExpectationError, match="non_negative"):
        store.commit(
            spark.range(1).select(F.col("id").alias("k"), F.lit(-5).cast("bigint").alias("cents")),
            mode="append", cluster_by="k",
        )
    assert store.head_version() == head
    # merge enforcement on the pruned path
    bad = spark.createDataFrame([(3, -1, "update", 1)], "k long, cents long, op string, _seq long")
    with pytest.raises(ExpectationError):
        store.merge(spark, bad, "k", "_seq")
    good = spark.createDataFrame([(3, 999, "update", 1)], "k long, cents long, op string, _seq long")
    store.merge(spark, good, "k", "_seq")
    # NULL predicate passes (SQL CHECK semantics)
    store.commit(
        spark.range(100, 101).select(
            F.col("id").alias("k"), F.lit(None).cast("bigint").alias("cents")
        ),
        mode="append", cluster_by="k",
    )
    # survives compaction; dropping it unblocks violations
    store.compact(spark)
    assert store.snapshot(store.head_version()).constraints == {"non_negative": "cents >= 0"}
    store.drop_constraint("non_negative")
    store.commit(
        spark.range(1).select(F.col("id").alias("k"), F.lit(-5).cast("bigint").alias("cents")),
        mode="append",
    )
    # rename of a constrained column is blocked while the check exists
    store2 = SnapshotStore(store.path + "_2")
    store2.commit(spark.range(3).select(F.col("id").alias("k"), (F.col("id")).alias("cents")))
    store2.add_constraint(spark, "nn", "cents >= 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        store2.rename_column("cents", "money")


def test_compact_small_on_clone_materializes_locally(spark, store, tmp_path):
    """compact_small on a shallow clone rewrites qualifying BORROWED
    files into clone-owned storage (incremental deep-copy) and never
    touches the source bytes."""
    store.commit(
        spark.range(50).select(F.col("id").alias("k"), F.lit("v").alias("val")),
        cluster_by="k",
        target_files=4,
    )
    clone = store.clone_to(str(tmp_path / "clone"))
    v = clone.compact_small(spark, min_file_mb=64.0, target_files=1)
    assert v is not None
    head = clone.snapshot(v)
    # everything was small -> all entries now clone-local (relative)
    assert all(not os.path.isabs(e["path"]) for e in head.entries)
    assert clone.read(spark).count() == 50
    # source untouched and still reads
    assert store.read(spark).count() == 50
    assert store.fsck() == []


def test_unclustered_merge_keeps_governance_and_constraints(spark, store):
    """Regression: the full-rewrite merge fallback used a plain
    overwrite commit, which silently RESET constraints, masks/row
    filters, and generated-column specs (the pruned/hash paths carried
    them via _inherited)."""
    store.commit(_df(spark, [(1, "a"), (2, "b")]))  # unclustered
    store.add_constraint(spark, "val_nn", "val IS NOT NULL")
    store.set_mask("val", "'***'")
    changes = spark.createDataFrame(
        [(1, "a2", "update", 1)], "k bigint, val string, op string, seq int"
    )
    v = store.merge(spark, changes, key_cols="k", version_cols="seq")
    snap = store.snapshot(v)
    assert snap.constraints == {"val_nn": "val IS NOT NULL"}
    assert snap.policies.get("masks") == {"val": "'***'"}
    # and the carried constraint is ENFORCED on the next merge
    bad = spark.createDataFrame(
        [(2, None, "update", 2)], "k bigint, val string, op string, seq int"
    )
    with pytest.raises(Exception, match="val_nn"):
        store.merge(spark, bad, key_cols="k", version_cols="seq")


def test_replace_where_full_rewrite(spark, store):
    store.commit(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    repl = _df(spark, [(2, "B2"), (2, "B3")])  # duplicate keys fine: row-level op
    v = store.replace_where(spark, repl, "k = 2")
    got = sorted((r.k, r.val) for r in store.read(spark, v).collect())
    assert got == [(1, "a"), (2, "B2"), (2, "B3"), (3, "c")]


def test_replace_where_rejects_out_of_scope_rows(spark, store):
    store.commit(_df(spark, [(1, "a")]))
    head = store.head_version()
    with pytest.raises(ValueError, match="do not all satisfy"):
        store.replace_where(spark, _df(spark, [(5, "x")]), "k = 2")
    assert store.head_version() == head  # nothing published


def test_replace_where_rejects_schema_drift(spark, store):
    store.commit(_df(spark, [(1, "a")]))
    other = spark.createDataFrame([(1,)], "k bigint")
    with pytest.raises(ValueError, match="store schema"):
        store.replace_where(spark, other, "k = 1")


def test_replace_where_pruned_carries_files(spark, store):
    df = spark.range(1, 101).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("val")
    )
    store.commit(df, cluster_by="k", target_files=8)
    v1 = store.head_version()
    before = {e["path"] for e in store.snapshot(v1).entries}
    repl = spark.range(10, 16).select(
        F.col("id").alias("k"), F.lit("NEW").alias("val")
    )
    v2 = store.replace_where(
        spark, repl, "k BETWEEN 10 AND 15", key_bounds=(10, 15)
    )
    after = store.snapshot(v2).entries
    carried = [e for e in after if e["path"] in before]
    assert carried, "no files carried by reference through replace_where"
    got = {r.k: r.val for r in store.read(spark, v2).collect()}
    assert got[10] == "NEW" and got[15] == "NEW" and len(got) == 100
    assert got[9] == "v9" and got[16] == "v16"


def test_replace_where_enforces_constraints(spark, store):
    store.commit(_df(spark, [(1, "a"), (2, "b")]))
    store.add_constraint(spark, "val_nn", "val IS NOT NULL")
    with pytest.raises(Exception, match="val_nn"):
        store.replace_where(spark, _df(spark, [(2, None)]), "k = 2")
    v = store.replace_where(spark, _df(spark, [(2, "ok")]), "k = 2")
    assert store.snapshot(v).constraints == {"val_nn": "val IS NOT NULL"}


def test_replace_where_on_renamed_store(spark, store):
    """replace_where over a store with a metadata-only column rename:
    touched files hold the OLD physical name (reconciled at read), the
    replacement batch arrives under the NEW logical name, untouched
    files carry — and the post-replace read is consistent across the
    mixed generations."""
    df = spark.range(1, 101).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("val")
    )
    store.commit(df, cluster_by="k", target_files=8)
    store.rename_column("val", "label")
    repl = spark.range(40, 46).select(
        F.col("id").alias("k"), F.lit("NEW").alias("label")
    )
    v = store.replace_where(
        spark, repl, "k BETWEEN 40 AND 45", key_bounds=(40, 45)
    )
    snap = store.snapshot(v)
    assert snap.renames  # the mapping survived the partial rewrite
    got = {r.k: r.label for r in store.read(spark, v).collect()}
    assert got[40] == "NEW" and got[45] == "NEW"
    assert got[39] == "v39" and got[46] == "v46" and len(got) == 100


def test_analyze_any_column_stats_prune(spark, tmp_path):
    """analyze() records per-file footer stats for arbitrary columns as
    a metadata-only commit; read_pruned_stats skips files on any
    analyzed column with zero false negatives, and un-analyzed files
    are conservatively kept."""
    from pyspark.sql import functions as F

    from log2sql_spark.store import SnapshotStore

    store = SnapshotStore(str(tmp_path / "az"))
    # time-ordered ingest: ingest_id is the cluster key, odate follows it
    base = spark.range(0, 1000).select(
        F.col("id").alias("ingest_id"),
        (F.lit(20240000) + (F.col("id") / 10).cast("long")).alias("odate_int"),
        (F.col("id") * 3).alias("cents"),
    )
    v1 = store.commit(base, mode="overwrite", cluster_by="ingest_id", target_files=8)
    v2 = store.analyze(["odate_int"])
    assert v2 == v1 + 1
    snap = store.snapshot(v2)
    # metadata-only: same data paths, stats added
    assert [e["path"] for e in snap.entries] == [
        e["path"] for e in store.snapshot(v1).entries
    ]
    assert all("odate_int" in (e.get("stats") or {}) for e in snap.entries)

    got = store.read_pruned_stats(spark, {"odate_int": (20240010, 20240019)})
    rows = got.filter("odate_int BETWEEN 20240010 AND 20240019")
    assert rows.count() == 100  # no false negatives
    # pruning power: the superset read touched fewer files than the table
    pruned_files = [
        e for e in snap.entries
        if e["stats"]["odate_int"][0] <= 20240019
        and e["stats"]["odate_int"][1] >= 20240010
    ]
    assert 0 < len(pruned_files) < len(snap.entries)
    assert got.count() <= 1000 // 8 * 2  # at most ~2 of 8 files read

    # a later append lacks stats -> conservatively kept, still correct
    extra = spark.createDataFrame(
        [(5000, 20240015, 1)], "ingest_id long, odate_int long, cents long"
    )
    store.commit(extra, mode="append")
    got2 = store.read_pruned_stats(spark, {"odate_int": (20240010, 20240019)})
    assert got2.filter("odate_int BETWEEN 20240010 AND 20240019").count() == 101

    # masked columns refuse analyze (manifest stats would leak)
    store.set_mask("cents", "CAST(0 AS BIGINT)")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="masked"):
        store.analyze(["cents"])


def test_compact_where_band_rewrite(spark, store, tmp_path):
    """compact_where (Delta OPTIMIZE ... WHERE): hot-band ingest
    fragments ONE key region; the filtered compaction rewrites only the
    band's files (selected manifest-only from per-file stats), carries
    the cold majority by reference, keeps pruning and time travel."""
    base = spark.range(0, 100_000).select(
        F.col("id").alias("k"), F.sha2(F.col("id").cast("string"), 256).alias("val")
    )
    store.commit(base, cluster_by="k", target_files=8)
    for i in range(5):  # streaming-style small merges, all in k < 1000
        store.commit(
            spark.createDataFrame(
                [(i * 100 + j, "hot") for j in range(10)],
                "k long, val string",
            ),
            mode="append",
            cluster_by="k",
            target_files=1,
        )
    before = store.snapshot(store.head_version()).entries
    assert len(before) == 13
    total_before = store.read(spark).count()
    cold_paths = {
        e["path"] for e in before if e.get("min") is not None and e["min"] >= 1000
    }
    assert len(cold_paths) == 7  # 7 of the 8 base files are cold

    v = store.compact_where(spark, 0, 999, target_files=1)
    head = store.snapshot(v)
    assert head.mode == "compact"
    assert head.meta["where"] == [0, 999]
    after_paths = {e["path"] for e in head.entries}
    # every cold file carried BY REFERENCE; the 6 band files merged to 1
    assert cold_paths <= after_paths
    assert len(head.entries) == 8
    assert head.meta["compacted_files"] == 6
    assert store.read(spark).count() == total_before
    assert head.has_stats
    # pruning still works on both sides of the band
    assert store.read_pruned(spark, [5]).filter("k = 5").count() == 2
    assert store.read_pruned(spark, [50_000]).filter("k = 50000").count() == 1
    # time travel: the fragmented pre-compact version is intact
    assert store.read(spark, version=v - 1).count() == total_before
    # band already shaped: second run is a no-op
    assert store.compact_where(spark, 0, 999, target_files=1) is None


def test_compact_where_requires_range_layout(spark, tmp_path):
    s = SnapshotStore(str(tmp_path / "hashstore"))
    s.commit(
        spark.createDataFrame([(str(i), "v") for i in range(100)], "k string, val string"),
        cluster_by="k",
        layout="hash",
        target_files=4,
    )
    with pytest.raises(ValueError, match="range-clustered"):
        s.compact_where(spark, "0", "9")


def test_files_metadata_table(spark, store):
    """files() — Iceberg's .files metadata table: one row per live data
    file with size + stringified key bounds, manifest-only, version-
    addressable, and consistent with what compact_where then does."""
    store.commit(
        spark.range(1000).select(F.col("id").alias("k"), F.lit("v").alias("val")),
        cluster_by="k",
        target_files=4,
    )
    meta = store.files(spark)
    rows = meta.collect()
    assert len(rows) == 4
    assert all(r.size_bytes > 0 for r in rows)
    # bounds stringified, cover the key space, usable for band planning
    bounds = sorted((int(r.min_key), int(r.max_key)) for r in rows)
    assert bounds[0][0] == 0 and bounds[-1][1] == 999
    assert all(r.bucket is None for r in rows)
    # version-addressable: after compaction the head table shrinks but
    # the old version's files() is unchanged
    v1 = store.head_version()
    store.compact(spark, target_files=1)
    assert store.files(spark).count() == 1
    assert store.files(spark, version=v1).count() == 4


def test_vacuum_older_than_time_axis(spark, store, monkeypatch):
    """vacuum(older_than=): the time-based retention axis composes with
    keep_last as 'keep at least N AND everything newer than T' —
    Iceberg expire_snapshots(older_than) / Delta logRetentionDuration
    semantics. Head and recent versions survive an aggressive
    keep_last; dry-run first, then the real sweep."""
    import time as _time

    base = _time.time()
    # three commits with controlled publish times: v1 old, v2 old, v3 new
    for i, age_s in enumerate([7200, 7100, 60]):  # seconds ago
        monkeypatch.setattr(_time, "time", lambda a=age_s: base - a)
        store.commit(_df(spark, [(i, f"v{i}")]), mode="overwrite")
    monkeypatch.undo()
    assert store.versions() == [1, 2, 3]
    cutoff = base - 3600  # drop only versions older than 1 hour

    # keep_last=1 alone would drop v1 AND v2; the time axis keeps
    # nothing extra here (both are older than the cutoff)...
    dry = store.vacuum(keep_last=1, older_than=cutoff, dry_run=True)
    assert store.versions() == [1, 2, 3]  # dry-run touched nothing
    assert len(dry) == 2

    # ...but a cutoff of 2 hours ago protects v2 (7100s < 7200s old)
    protected = store.vacuum(
        keep_last=1, older_than=base - 7150, dry_run=True
    )
    assert len(protected) == 1  # only v1 is both outside keep AND too old

    store.vacuum(keep_last=1, older_than=cutoff)
    assert store.versions() == [3]
    assert [r.k for r in store.read(spark).collect()] == [2]


def test_sql_table_over_python_datasource_is_pinned(spark, store):
    """Environment pin (upstream limitation, pyspark 4.1.2): a SQL
    table CREATEd USING the Python DSv2 snapshot source resolves its
    schema at CREATE time (options flow there — including the file:
    URI the SQL path qualifies, which _local_path normalizes), but the
    subsequent SELECT constructs the reader with EMPTY options, so the
    SQL surface cannot address the store. Readers use the DataFrame
    API (spark.read.format('snapshot').option('path', ...)) instead.
    If this SELECT starts working after a pyspark upgrade, replace the
    pin with full SQL DML coverage.

    Attempted fallbacks (r12, pyspark 4.1.2 — all carry the path at
    CREATE, none deliver it to reader construction at SELECT):
    ``TBLPROPERTIES (path '...')``, ``LOCATION '...'``, and the
    original ``OPTIONS (path '...')`` — each CREATE succeeds (schema
    resolves), each SELECT fails with the same empty-options reader
    init, so there is no property channel to smuggle the path through;
    the pin below exercises OPTIONS and LOCATION explicitly so an
    upgrade that fixes EITHER channel trips the assertion."""
    from log2sql_spark.sources.cdf_datasource import register

    store.commit(_df(spark, [(1, "a"), (2, "b")]))
    register(spark)
    name = "pin_sqlsnap"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(f"CREATE TABLE {name} USING snapshot OPTIONS (path '{store.path}')")
    try:
        # CREATE worked (schema resolved through the options)
        assert [f.name for f in spark.table(name).schema.fields] == ["k", "val"]
        err = None
        try:
            spark.sql(f"SELECT * FROM {name}").collect()
        except Exception as exc:  # noqa: BLE001
            err = str(exc)
        assert err is not None, (
            "SQL SELECT over the Python DSv2 snapshot source now works — "
            "options reached the reader; replace this pin with SQL DML "
            "coverage (SELECT/INSERT INTO over the store)"
        )
        assert "requires a path" in err
        # LOCATION fallback: same CREATE-ok / SELECT-empty-options fate
        loc = "pin_sqlsnap_loc"
        spark.sql(f"DROP TABLE IF EXISTS {loc}")
        spark.sql(f"CREATE TABLE {loc} USING snapshot LOCATION '{store.path}'")
        try:
            loc_err = None
            try:
                spark.sql(f"SELECT * FROM {loc}").collect()
            except Exception as exc:  # noqa: BLE001
                loc_err = str(exc)
            assert loc_err is not None, (
                "SQL SELECT via LOCATION now reaches the Python DSv2 "
                "reader — replace this pin with SQL DML coverage"
            )
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {loc}")
        # the DataFrame API remains the working surface
        got = (
            spark.read.format("snapshot").option("path", store.path).load()
        )
        assert got.count() == 2
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_compact_where_randomized_content_transparency(spark, store):
    """Property: for seeded random hot bands and fragment layouts,
    compact_where is content-transparent (read-back multiset equal),
    carries every provably-outside file by path, and keeps stats on
    all entries. Three trials, one Spark fixture."""
    import random

    rng = random.Random(20240816)
    base = spark.range(0, 30_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).cast("string").alias("val")
    )
    store.commit(base, mode="overwrite", cluster_by="k", target_files=6)
    for trial in range(3):
        lo = rng.randint(0, 25_000)
        hi = lo + rng.randint(500, 4_000)
        for i in range(rng.randint(2, 4)):  # fragment the band
            n = rng.randint(5, 40)
            keys = [rng.randint(lo, hi) + 100_000 * (trial + 1) for _ in range(n)]
            store.commit(
                spark.createDataFrame(
                    [(k, f"t{trial}") for k in keys], "k long, val string"
                ),
                mode="append",
                cluster_by="k",
                target_files=1,
            )
        head_before = store.snapshot(store.head_version())
        before_counts = {
            (r.k, r.val): r.n
            for r in store.read(spark).groupBy("k", "val")
            .agg(F.count(F.lit(1)).alias("n")).collect()
        }
        # appended keys were offset OUT of [lo, hi]; compact a band that
        # still overlaps some base files AND the fresh fragments' range
        band_lo, band_hi = lo, hi + 100_000 * (trial + 1)
        outside = {
            e["path"] for e in head_before.entries
            if e.get("min") is not None and (e["max"] < band_lo or e["min"] > band_hi)
        }
        v = store.compact_where(spark, band_lo, band_hi, target_files=1)
        if v is None:
            continue  # band held <= 1 file this trial: legal no-op
        head = store.snapshot(v)
        after_paths = {e["path"] for e in head.entries}
        assert outside <= after_paths  # every provably-cold file carried
        assert head.has_stats
        after_counts = {
            (r.k, r.val): r.n
            for r in store.read(spark).groupBy("k", "val")
            .agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert after_counts == before_counts  # content-transparent
        assert store.fsck() == []


def test_compact_where_race_fails_fast_and_clean(spark, store, monkeypatch):
    """A writer landing between compact_where's head read and its
    publish costs a clean ConflictError (compaction is a DERIVED
    rewrite — blind retry could erase the winner, so fail-fast is the
    contract, same as compact(max_retries=0)); the store is untouched
    and the loser's data directory is vacuum-able, never referenced."""
    store.commit(
        spark.range(2_000).select(F.col("id").alias("k"), F.lit("v").alias("val")),
        cluster_by="k",
        target_files=4,
    )
    for i in range(2):
        store.commit(
            spark.createDataFrame([(i, "hot")], "k long, val string"),
            mode="append", cluster_by="k", target_files=1,
        )
    competitor = SnapshotStore(store.path)
    orig = store._publish
    state = {"fired": False}

    def racing(manifest):
        if not state["fired"]:
            state["fired"] = True
            competitor.commit(
                spark.createDataFrame([(9_999, "theirs")], "k long, val string"),
                mode="append", cluster_by="k", target_files=1,
            )
        return orig(manifest)

    store._publish = racing
    head_before = store.head_version()
    with pytest.raises(ConflictError):
        store.compact_where(spark, 0, 500, target_files=1)
    assert state["fired"]
    # the winner's commit is head; content includes both writers' rows
    store2 = SnapshotStore(store.path)
    assert store2.head_version() == head_before + 1
    rows = {r.k: r.val for r in store2.read(spark).collect()}
    assert rows[9_999] == "theirs"
    assert rows[0] == "hot" and rows[1] == "hot"
    assert store2.fsck() == []


def test_compact_where_retry_rederives_band_from_new_head(spark, store):
    """compact_where(max_retries=1): a lost publish race RE-SELECTS the
    band from the winner's head — the winner's in-band append is
    included in the second rewrite, never erased by a stale republish."""
    store.commit(
        spark.range(2_000).select(F.col("id").alias("k"), F.lit("v").alias("val")),
        cluster_by="k",
        target_files=4,
    )
    for i in range(2):
        store.commit(
            spark.createDataFrame([(i, "hot")], "k long, val string"),
            mode="append", cluster_by="k", target_files=1,
        )
    competitor = SnapshotStore(store.path)
    orig = store._publish
    state = {"fired": False}

    def racing(manifest):
        if manifest.get("mode") == "compact" and not state["fired"]:
            state["fired"] = True
            competitor.commit(  # IN-BAND append the stale attempt missed
                spark.createDataFrame([(3, "theirs")], "k long, val string"),
                mode="append", cluster_by="k", target_files=1,
            )
        return orig(manifest)

    store._publish = racing
    v = store.compact_where(spark, 0, 500, target_files=1, max_retries=1)
    assert state["fired"] and v is not None
    store2 = SnapshotStore(store.path)
    vals: dict[int, set] = {}
    for r in store2.read(spark).collect():
        vals.setdefault(r.k, set()).add(r.val)
    assert "theirs" in vals[3]  # the winner's in-band row survived
    assert "hot" in vals[0] and "hot" in vals[1]
    # 2000 base + 2 hot appends + the competitor's append
    assert store2.read(spark).count() == 2_003
    assert store2.fsck() == []
