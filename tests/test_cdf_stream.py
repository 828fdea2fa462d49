"""snapshot_cdf streaming source: every store version becomes a
micro-batch of row-level changes; restarts resume from the
checkpointed version (sources/cdf_datasource.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from log2sql_spark.store import SnapshotStore


def _drain(spark, store_dir, out_dir, ckpt):
    q = (
        spark.readStream.format("snapshot_cdf")
        .load(str(store_dir))
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_cdf_stream_versions_and_restart(spark, tmp_path):
    store_dir, out_dir, ckpt = tmp_path / "s", tmp_path / "out", tmp_path / "ckpt"
    store = SnapshotStore(str(store_dir))
    store.commit(
        spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, val string"),
        cluster_by="k", layout="hash", target_files=2,
    )
    changes = spark.createDataFrame(
        [(2, "B", "update", 1), (3, "c", "insert", 1)],
        "k bigint, val string, op string, seq int",
    )
    store.merge(spark, changes, key_cols="k", version_cols="seq")

    _drain(spark, store_dir, out_dir, ckpt)
    got = {
        (r.k, r.val, r._version, r._change_type)
        for r in spark.read.parquet(str(out_dir)).collect()
    }
    assert got == {
        (1, "a", 1, "added"),
        (2, "b", 1, "added"),
        (2, "b", 2, "removed"),
        (2, "B", 2, "added"),
        (3, "c", 2, "added"),
    }

    # new version after restart: only ITS diff streams
    store.merge(
        spark,
        spark.createDataFrame([(1, None, "delete", 2)],
                              "k bigint, val string, op string, seq int"),
        key_cols="k", version_cols="seq",
    )
    _drain(spark, store_dir, out_dir, ckpt)
    rows = spark.read.parquet(str(out_dir)).collect()
    assert len(rows) == 6
    assert {(r.k, r._version, r._change_type) for r in rows if r._version == 3} == {
        (1, 3, "removed")
    }
