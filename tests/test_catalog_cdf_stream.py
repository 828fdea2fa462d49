"""catalog_cdf streaming source (round 13, verdict #5): one micro-batch
per CATALOG version, carrying every member table's keyed changes
between pinned store versions — the multi-table transaction arrives
atomically (no torn reads across tables), exactly-once by catalog
version across restarts (sources/catalog_cdf_datasource.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from log2sql_spark.store import SnapshotStore, StoreCatalog


def _mkcat(spark, root):
    cur = SnapshotStore(os.path.join(str(root), "cur"))
    hist = SnapshotStore(os.path.join(str(root), "hist"))
    base = spark.createDataFrame(
        [(1, 10), (2, 20)], "k bigint, cents bigint"
    )
    cur.commit(base, mode="overwrite", cluster_by="k", target_files=1)
    hist.commit(base, mode="overwrite", cluster_by="k", target_files=1)
    cat = StoreCatalog(str(root))
    cat.register("cur", cur.path)   # catalog v1
    cat.register("hist", hist.path)  # catalog v2
    return cat


def _txn(spark, cat, k, cents):
    return cat.commit_multi(
        spark,
        {
            "cur": (
                spark.createDataFrame([(k, cents)], "k bigint, cents bigint"),
                {"mode": "append", "target_files": 1},
            ),
            "hist": (
                spark.createDataFrame(
                    [(k + 100, cents + 1)], "k bigint, cents bigint"
                ),
                {"mode": "append", "target_files": 1},
            ),
        },
    )


def _drain(spark, root, out_dir, ckpt, **opts):
    reader = spark.readStream.format("catalog_cdf")
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load(str(root))
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None


def test_transaction_arrives_as_one_atomic_vector(spark, tmp_path):
    root, out, ckpt = tmp_path / "cat", tmp_path / "out", tmp_path / "ckpt"
    cat = _mkcat(spark, root)
    v3 = _txn(spark, cat, 3, 30)

    _drain(spark, root, out, ckpt, key="k")
    rows = spark.read.parquet(str(out)).collect()
    by_ver: dict[int, set] = {}
    for r in rows:
        by_ver.setdefault(r._catalog_version, set()).add(
            (r._table, r.k, r.cents, r._change_type)
        )
    # v1/v2 (register): each table's full pinned state as inserts
    assert by_ver[1] == {("cur", 1, 10, "insert"), ("cur", 2, 20, "insert")}
    assert by_ver[2] == {("hist", 1, 10, "insert"), ("hist", 2, 20, "insert")}
    # v3 = the commit_multi txn: BOTH tables' changes in ONE batch —
    # the torn read a per-store subscription cannot rule out
    assert by_ver[v3] == {
        ("cur", 3, 30, "insert"),
        ("hist", 103, 31, "insert"),
    }


def test_restart_mid_vector_is_exactly_once(spark, tmp_path):
    """Crash before the checkpoint commit: the replayed micro-batch
    re-emits the SAME catalog version byte-identically and nothing is
    duplicated — exactly-once by catalog version."""
    root, out, ckpt = tmp_path / "cat", tmp_path / "out", tmp_path / "ckpt"
    cat = _mkcat(spark, root)
    _txn(spark, cat, 3, 30)
    _drain(spark, root, out, ckpt, key="k")
    n_before = spark.read.parquet(str(out)).count()

    # crash window: the last micro-batch's sink commit is gone, the
    # offsets entry survives -> the engine replays that batch
    commits = sorted(
        f for f in os.listdir(ckpt / "commits") if not f.startswith(".")
    )
    os.remove(ckpt / "commits" / commits[-1])
    crc = ckpt / "commits" / f".{commits[-1]}.crc"
    if crc.exists():
        os.remove(crc)
    _txn(spark, cat, 4, 40)  # new txn arrives while "crashed"
    _drain(spark, root, out, ckpt, key="k")

    # the recovery run REPLAYS the crashed batch byte-identically and
    # stops (availableNow bounds a run by the work available at start,
    # and a restored uncommitted batch IS that work) — nothing
    # duplicated, nothing lost
    rows = spark.read.parquet(str(out)).collect()
    keyed = [
        (r._catalog_version, r._table, r.k, r._change_type) for r in rows
    ]
    assert len(keyed) == len(set(keyed)), "replayed batch duplicated rows"
    assert len(set(keyed)) == n_before

    # the next drain streams the txn that arrived during the crash,
    # exactly once on top of the replayed history
    _drain(spark, root, out, ckpt, key="k")
    rows = spark.read.parquet(str(out)).collect()
    keyed = [
        (r._catalog_version, r._table, r.k, r._change_type) for r in rows
    ]
    assert len(keyed) == len(set(keyed))
    assert len(set(keyed)) == n_before + 2
    by_ver = {}
    for t in keyed:
        by_ver.setdefault(t[0], set()).add(t[1:])
    assert by_ver[max(by_ver)] == {
        ("cur", 4, "insert"),
        ("hist", 104, "insert"),
    }


def test_updates_classify_and_tables_filter(spark, tmp_path):
    root, out, ckpt = tmp_path / "cat", tmp_path / "out", tmp_path / "ckpt"
    cat = _mkcat(spark, root)
    # overwrite-style change via merge on the member store through the
    # catalog txn: update k=1 in cur only
    cat.commit_multi(
        spark,
        {
            "cur": (
                spark.createDataFrame([(1, 11), (2, 20)], "k bigint, cents bigint"),
                {"mode": "overwrite", "cluster_by": "k", "target_files": 1},
            ),
        },
    )
    _drain(spark, root, out, ckpt, key="k", tables="cur", startingVersion=3)
    rows = spark.read.parquet(str(out)).collect()
    assert {r._table for r in rows} == {"cur"}
    got = {(r.k, r.cents, r._change_type) for r in rows}
    assert got == {
        (1, 10, "update_preimage"),
        (1, 11, "update_postimage"),
    }


def test_expired_parent_is_a_loud_error(spark, tmp_path):
    root, out, ckpt = tmp_path / "cat", tmp_path / "out", tmp_path / "ckpt"
    cat = _mkcat(spark, root)
    _txn(spark, cat, 3, 30)
    _txn(spark, cat, 5, 50)
    cat.expire(keep_last=1)  # v1..v3 gone; only v4 remains
    with pytest.raises(Exception, match="expired|no longer exists"):
        _drain(spark, root, out, ckpt, key="k")


def test_batch_twin_matches_stream(spark, tmp_path):
    """read_changes_all (the oracle-checked batch twin) returns exactly
    the rows the stream emits for the same catalog version range."""
    root, out, ckpt = tmp_path / "cat", tmp_path / "out", tmp_path / "ckpt"
    cat = _mkcat(spark, root)
    v2 = cat.head_version()
    v3 = _txn(spark, cat, 3, 30)

    batch = cat.read_changes_all(spark, v2, v3, key_cols="k")
    got_batch = {
        (r._table, r.k, r.cents, r._change_type) for r in batch.collect()
    }
    _drain(spark, root, out, ckpt, key="k", startingVersion=3)
    got_stream = {
        (r._table, r.k, r.cents, r._change_type)
        for r in spark.read.parquet(str(out)).collect()
    }
    assert got_batch == got_stream == {
        ("cur", 3, 30, "insert"),
        ("hist", 103, 31, "insert"),
    }


def test_backward_pin_raises_instead_of_silent_skip(spark, tmp_path):
    """A table restored/re-pointed to an OLDER store version must fail
    the feed loudly (r13 advice): silently skipping the rewind while the
    offset advances is indistinguishable from 'no change' downstream,
    yet history the subscriber already consumed has been rewritten."""
    root, out, ckpt = tmp_path / "cat", tmp_path / "out", tmp_path / "ckpt"
    cat = _mkcat(spark, root)
    _txn(spark, cat, 3, 30)                  # catalog v3: cur -> store v2
    _drain(spark, root, out, ckpt, key="k")  # consumer caught up through v3
    # Re-point cur BACKWARD to store v1 (a restore-style re-point) -> v4.
    cur_path = cat.snapshot()["tables"]["cur"]["path"]
    cat._commit_pins({"cur": (cur_path, 1)})
    q = (
        spark.readStream.format("catalog_cdf")
        .option("key", "k")
        .load(str(root))
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception) as ei:
        q.awaitTermination(120)
        exc = q.exception()
        if exc is not None:
            raise exc
        raise AssertionError("backward pin was consumed without error")
    assert "moved backward" in str(ei.value)
