"""Store ergonomics: commit-time constraints, timestamp time travel,
DESCRIBE HISTORY."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest


def _store(tmp_path, name):
    from log2sql_spark.store import SnapshotStore

    return SnapshotStore(str(tmp_path / name))


def test_commit_constraints_reject_before_writing(spark, tmp_path):
    from log2sql_spark.operators.expectations import between, not_null
    from log2sql_spark.store.snapshots import ExpectationError

    store = _store(tmp_path, "cstore")
    good = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    v1 = store.commit(
        good, expect=[not_null("k_set", "k"), between("v_range", "v", 0, 6)]
    )
    assert v1 == 1

    bad = good.unionByName(
        spark.range(3).select(
            (F.col("id") + 1000).alias("k"), F.lit(99).alias("v")
        )
    )
    with pytest.raises(ExpectationError) as ei:
        store.commit(bad, expect=[between("v_range", "v", 0, 6)])
    assert ("v_range", 3) in ei.value.failures
    # Atomicity: the failed commit left no new version and no data.
    assert store.head_version() == 1
    assert store.read(spark).count() == 100


def test_history_and_timestamp_time_travel(spark, tmp_path):
    store = _store(tmp_path, "hstore")
    df1 = spark.range(10).select(F.col("id").alias("k"))
    df2 = spark.range(20).select(F.col("id").alias("k"))
    store.commit(df1, meta={"who": "first"})
    t_between = None
    import time as _t

    t_between = _t.time()
    _t.sleep(0.05)
    store.commit(df2, mode="overwrite", meta={"who": "second"})

    hist = store.history()
    assert [h["version"] for h in hist] == [1, 2]
    assert hist[0]["meta"] == {"who": "first"}
    assert hist[1]["mode"] == "overwrite"
    assert all(h["created_at"] is not None for h in hist)
    assert hist[0]["created_at"] <= hist[1]["created_at"]

    # AS OF between the two commits resolves to v1.
    assert store.version_at(t_between) == 1
    assert store.read_as_of(spark, t_between).count() == 10
    assert store.read_as_of(spark, _t.time()).count() == 20
    with pytest.raises(ValueError):
        store.version_at(hist[0]["created_at"] - 10)


def test_merge_manifests_carry_created_at(spark, tmp_path):
    store = _store(tmp_path, "mstore")
    base = spark.range(1000).select(
        F.col("id").alias("k"), F.col("id").alias("payload")
    )
    store.commit(base, mode="overwrite", cluster_by="k", target_files=4)
    changes = (
        base.filter(F.col("k") < 50)
        .select("k", (F.col("payload") + 1).alias("payload"))
        .withColumn("op", F.lit("update"))
        .withColumn("seq", F.lit(1))
    )
    v2 = store.merge(spark, changes, key_cols="k", version_cols="seq")
    assert store.snapshot(v2).created_at is not None


def test_forget_physically_erases_keys(spark, tmp_path):
    """GDPR erasure: after forget(), the forgotten payload bytes exist
    in NO file under the store — not in old versions, not in orphaned
    pre-delete copies of rewritten files."""
    import os

    # Uncompressed parquet so payload bytes are literal in the files —
    # under snappy both presence and absence checks would be vacuous.
    spark.conf.set("spark.sql.parquet.compression.codec", "uncompressed")
    try:
        store = _store(tmp_path, "gdprstore")
        df = spark.range(200).select(
            F.col("id").alias("k"),
            F.concat(F.lit("SENTINEL-"), F.col("id").cast("string"), F.lit("-END"))
            .alias("payload"),
        )
        store.commit(df, mode="overwrite", cluster_by="k", target_files=8)
        # a second commit so pre-delete history exists
        extra = spark.range(200, 210).select(
            F.col("id").alias("k"),
            F.concat(F.lit("SENTINEL-"), F.col("id").cast("string"), F.lit("-END"))
            .alias("payload"),
        )
        upserts = extra.withColumn("op", F.lit("insert")).withColumn(
            "seq", F.lit(1).cast("long")
        )
        store.merge(spark, upserts, key_cols="k", version_cols="seq")

        doomed = [5, 42, 205]
        v = store.forget(spark, doomed)
        assert v == store.head_version()

        remaining = {r.k for r in store.read(spark).select("k").collect()}
        assert remaining == set(range(210)) - set(doomed)

        blobs = []
        for root, _dirs, files in os.walk(str(tmp_path / "gdprstore")):
            for f in files:
                if f.endswith(".parquet"):
                    with open(os.path.join(root, f), "rb") as fh:
                        blobs.append(fh.read())
        allbytes = b"".join(blobs)
        for k in doomed:
            assert f"SENTINEL-{k}-END".encode() not in allbytes, f"key {k} bytes survive"
        assert b"SENTINEL-7-END" in allbytes  # untouched keys still present
        # history was purged down to the delete commit
        assert store.versions() == [store.head_version()]
    finally:
        spark.conf.set("spark.sql.parquet.compression.codec", "snappy")


def test_restore_is_metadata_only_and_time_travel_safe(spark, tmp_path):
    from log2sql_spark.store import SnapshotStore

    store = SnapshotStore(str(tmp_path / "s"))
    store.commit(
        spark.createDataFrame([(k, f"v{k}") for k in range(10)], "k bigint, val string"),
        mode="overwrite",
    )
    changes = spark.createDataFrame(
        [(3, "OOPS", "update", 1)], "k bigint, val string, op string, seq int"
    )
    store.merge(spark, changes, key_cols="k", version_cols="seq")
    assert {r.val for r in store.read(spark).filter("k = 3").collect()} == {"OOPS"}

    v3 = store.restore(1)
    assert v3 == 3 and store.head_version() == 3
    # head now mirrors v1; the mistaken v2 stays time-travel-readable
    assert {r.val for r in store.read(spark).filter("k = 3").collect()} == {"v3"}
    assert {r.val for r in store.read(spark, 2).filter("k = 3").collect()} == {"OOPS"}
    snap = store.snapshot(3)
    assert snap.mode == "restore" and snap.meta["restored_from"] == 1
    # metadata-only: restored entries reference v1's files verbatim
    assert snap.entries == store.snapshot(1).entries


def test_restore_refuses_vacuumed_version(spark, tmp_path):
    import pytest as _pytest

    from log2sql_spark.store import SnapshotStore

    store = SnapshotStore(str(tmp_path / "s"))
    store.commit(
        spark.createDataFrame([(1, "a")], "k bigint, val string"), mode="overwrite"
    )
    store.commit(
        spark.createDataFrame([(2, "b")], "k bigint, val string"), mode="overwrite"
    )
    # simulate a vacuum bug / partial cleanup: v1's manifest survives
    # but its data directory is gone (a full vacuum also drops the
    # manifest, which surfaces as FileNotFoundError — equally loud)
    import shutil

    victim = os.path.join(str(tmp_path / "s"), store.snapshot(1).entries[0]["path"])
    shutil.rmtree(victim, ignore_errors=True)
    if os.path.isfile(victim):
        os.remove(victim)
    with _pytest.raises(ValueError, match="vacuumed"):
        store.restore(1)


def test_cli_restore_and_fsck(spark, tmp_path, capsys):
    from log2sql_spark.cli import store_main
    from log2sql_spark.store import SnapshotStore

    path = str(tmp_path / "s")
    store = SnapshotStore(path)
    store.commit(
        spark.createDataFrame([(1, "a")], "k bigint, val string"), mode="overwrite"
    )
    store.commit(
        spark.createDataFrame([(2, "b")], "k bigint, val string"), mode="overwrite"
    )
    assert store_main(["restore", path, "--to-version", "1"]) == 0
    assert capsys.readouterr().out.strip() == "v3"
    assert {r.k for r in store.read(spark).collect()} == {1}
    assert store_main(["fsck", path]) == 0
    # damage a referenced file: fsck exits nonzero and names it
    victim = store.snapshot(3).entries[0]["path"]
    victim_file = os.path.join(path, victim)
    if os.path.isdir(victim_file):
        import shutil

        shutil.rmtree(victim_file)
    else:
        os.remove(victim_file)
    assert store_main(["fsck", path]) == 1
    assert victim in capsys.readouterr().out


def test_cli_analyze_records_stats(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    from log2sql_spark.cli import store_main
    from log2sql_spark.store import SnapshotStore

    path = str(tmp_path / "az")
    store = SnapshotStore(path)
    base = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    store.commit(base, mode="overwrite", cluster_by="k", target_files=4)
    assert store_main(["analyze", path, "--columns", "v"]) == 0
    assert capsys.readouterr().out.strip() == "v2"
    snap = store.snapshot(2)
    assert all("v" in (e.get("stats") or {}) for e in snap.entries)


def test_vacuum_dry_run_touches_nothing(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    from log2sql_spark.cli import store_main
    from log2sql_spark.store import SnapshotStore

    path = str(tmp_path / "dv")
    store = SnapshotStore(path)
    base = spark.range(0, 50).select(F.col("id").alias("k"))
    store.commit(base, mode="overwrite")
    store.commit(base, mode="overwrite")  # v1 now reclaimable
    would = store.vacuum(keep_last=1, dry_run=True)
    assert would  # something reported...
    assert store.versions() == [1, 2]  # ...nothing removed
    assert store.read(spark, 1).count() == 50  # old version still readable
    assert store_main(["vacuum", path, "--dry-run"]) == 0
    assert capsys.readouterr().out.strip()  # CLI prints the report
    assert store.versions() == [1, 2]
    # the real run deletes exactly what the dry run reported
    assert store.vacuum(keep_last=1) == would
    assert store.versions() == [2]


def test_history_carries_operation_metrics(spark, tmp_path):
    """Delta operationMetrics parity: every publish stamps files
    added/removed/carried + bytes written, making write amplification
    visible in DESCRIBE HISTORY — a pruned merge shows mostly-carried
    files; a full overwrite shows zero carried."""
    from pyspark.sql import functions as F

    from log2sql_spark.store import SnapshotStore

    store = SnapshotStore(str(tmp_path / "m"))
    base = spark.range(1_000).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 10).cast("long").alias("cents"),
    )
    store.commit(base, mode="overwrite", cluster_by="k", target_files=8)
    changes = spark.createDataFrame(
        [(5, 51, "update", 1)], "k int, cents long, op string, seq int"
    )
    store.merge(spark, changes, key_cols="k", version_cols="seq")

    h = {e["version"]: e["metrics"] for e in store.history()}
    assert h[1]["files_added"] == 8 and h[1]["files_removed"] == 0
    assert h[1]["files_carried"] == 0 and h[1]["bytes_added"] > 0
    # pruned merge: ONE file rewritten, seven carried by reference
    assert h[2]["files_added"] == 1 and h[2]["files_removed"] == 1
    assert h[2]["files_carried"] == 7
    assert 0 < h[2]["bytes_added"] < h[1]["bytes_added"]
