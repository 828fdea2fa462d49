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


def test_full_chain_binlog_to_store_to_cdf(spark, tmp_path):
    """The whole pipeline: binlog dump stream -> MERGE INTO the snapshot
    store -> CDF stream -> downstream consumer, with no component aware
    of the others beyond the store contract."""
    from datetime import datetime

    from log2sql_spark.sources.binlog_fixture import render_binlog
    from log2sql_spark.sources.catalog import catalog_from_dict
    from log2sql_spark.streaming.cdc_stream import apply_changes_to_snapshot_store

    ts = datetime(2024, 5, 1, 12, 0, 7)
    in_dir, store_dir = tmp_path / "in", tmp_path / "store"
    ckpt1, ckpt2, out_dir = tmp_path / "c1", tmp_path / "c2", tmp_path / "out"
    in_dir.mkdir()
    cat = catalog_from_dict(
        spark, {"shop.orders": {"columns": ["id", "status"], "key_columns": ["id"]}}
    )
    (in_dir / "bin.000001.txt").write_text(render_binlog([
        {"op": "insert", "db": "shop", "table": "orders", "ts": ts,
         "values": [(1, "1"), (2, "'new'")]},
        {"op": "insert", "db": "shop", "table": "orders", "ts": ts,
         "values": [(1, "2"), (2, "'new'")]},
        {"op": "update", "db": "shop", "table": "orders", "ts": ts,
         "before": [(1, "2"), (2, "'new'")], "after": [(1, "2"), (2, "'done'")]},
    ]))
    q = apply_changes_to_snapshot_store(
        spark, str(in_dir), cat, str(store_dir), str(ckpt1), key_col="id"
    )
    q.awaitTermination(120)

    q2 = (
        spark.readStream.format("snapshot_cdf")
        .load(str(store_dir))
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt2))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    feed = spark.read.parquet(str(out_dir))
    # final state reached through the feed == final state in the store
    adds = {r.key: r.after for r in feed.filter(F.col("_change_type") == "added").collect()}
    assert adds["1"] == {"id": "1", "status": "'new'"}
    assert adds["2"] == {"id": "2", "status": "'done'"}  # latest change won
    assert feed.filter(F.col("_change_type") == "removed").count() == 0


def test_snapshot_batch_datasource_with_pruning(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "bs"))
    df = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
    store.commit(df, cluster_by="k", target_files=8)
    changes = spark.createDataFrame(
        [(10, 999, "update", 1)], "k bigint, v bigint, op string, seq int"
    )
    store.merge(spark, changes, key_cols="k", version_cols="seq")

    # head read through the SQL surface
    head = spark.read.format("snapshot").load(str(store.path))
    assert head.count() == 1000
    got = head.filter(F.col("k").isin(10, 500)).orderBy("k").collect()
    assert [(r.k, r.v) for r in got] == [(10, 999), (500, 1500)]
    # point filter plans fewer partitions than the file count (pruned)
    pruned = spark.read.format("snapshot").load(str(store.path)).filter(F.col("k") == 10)
    assert pruned.count() == 1
    assert pruned.rdd.getNumPartitions() < 8

    # time travel via option
    v1 = spark.read.format("snapshot").option("version", 1).load(str(store.path))
    assert v1.filter(F.col("k") == 10).head().v == 30


def test_cdf_stream_resolves_renamed_generations(spark, tmp_path):
    """A rename mid-history must not NULL the CDF rows of pre-rename
    files: the reader resolves each subscriber field through that
    version's physical generations."""
    from pyspark.sql import functions as F

    from log2sql_spark.store import SnapshotStore

    store = SnapshotStore(str(tmp_path / "store"))
    store.commit(
        spark.range(3).select(F.col("id").alias("k"), (F.col("id") * 10).alias("cents")),
        cluster_by="k",
    )
    store.rename_column("cents", "money")
    store.commit(
        spark.range(3, 5).select(F.col("id").alias("k"), (F.col("id") * 10).alias("money")),
        mode="append",
        cluster_by="k",
    )
    out_dir, ckpt = tmp_path / "out", tmp_path / "ckpt"
    q = (
        spark.readStream.format("snapshot_cdf")
        .schema("k bigint, money bigint, _version bigint, _change_type string")
        .load(str(store.path))
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r.k, r.money, r._change_type)
        for r in spark.read.parquet(str(out_dir)).collect()
    }
    # v1's adds come from PRE-rename files: money must carry the values
    assert (0, 0, "added") in rows and (2, 20, "added") in rows
    assert (4, 40, "added") in rows
    assert not any(m is None for _, m, _ in rows)


def test_snapshot_stream_writer_exactly_once(spark, tmp_path):
    """writeStream.format('snapshot'): each micro-batch commits one
    snapshot; a restart with no new input re-commits nothing (the
    manifest's stream_batch_id is the high-watermark)."""
    import json as _json

    from pyspark.sql import functions as F

    from log2sql_spark.sources.cdf_datasource import register
    from log2sql_spark.store import SnapshotStore

    register(spark)
    in_dir, store_dir, ckpt = tmp_path / "in", tmp_path / "store", tmp_path / "ckpt"
    in_dir.mkdir()
    with open(in_dir / "b0.json", "w") as f:
        for i in range(20):
            f.write(_json.dumps({"k": i, "v": i * 10}) + "\n")

    def run():
        q = (
            spark.readStream.schema("k bigint, v bigint")
            .json(str(in_dir))
            .writeStream.format("snapshot")
            .option("path", str(store_dir))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    store = SnapshotStore(str(store_dir))
    assert store.read(spark).count() == 20
    v1 = store.head_version()
    assert store.snapshot(v1).meta["stream_batch_id"] == 0
    # restart without new data: no new version
    run()
    assert store.head_version() == v1
    # new file -> exactly one more snapshot, composed with the first
    with open(in_dir / "b1.json", "w") as f:
        for i in range(20, 25):
            f.write(_json.dumps({"k": i, "v": i * 10}) + "\n")
    run()
    assert store.head_version() == v1 + 1
    assert store.read(spark).count() == 25
    assert store.read(spark, v1).count() == 20  # time travel intact


def test_snapshot_batch_timestamp_as_of(spark, tmp_path):
    """format('snapshot').option('timestampAsOf', epoch) resolves to the
    version current at that wall-clock — DataSource parity with
    SnapshotStore.read_as_of."""
    import time as _time

    path = str(tmp_path / "taso")
    store = SnapshotStore(path)
    store.commit(
        spark.createDataFrame([(1, "a")], "k bigint, val string"), mode="overwrite"
    )
    _time.sleep(0.05)
    t_between = _time.time()
    _time.sleep(0.05)
    store.commit(
        spark.createDataFrame([(2, "b")], "k bigint, val string"), mode="overwrite"
    )
    old = (
        spark.read.format("snapshot")
        .option("timestampAsOf", str(t_between))
        .load(path)
    )
    assert [(r.k, r.val) for r in old.collect()] == [(1, "a")]
    head = spark.read.format("snapshot").load(path)
    assert [(r.k, r.val) for r in head.collect()] == [(2, "b")]


def test_cdf_stream_keyed_change_types(spark, tmp_path):
    """.option('key', 'k'): the stream emits Delta-CDF change types —
    updates pair pre/post images of the key inside one version, the
    initial commit streams as inserts, deletes carry the preimage."""
    store_dir, out_dir, ckpt = tmp_path / "s", tmp_path / "o", tmp_path / "c"
    store = SnapshotStore(str(store_dir))
    store.commit(
        spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, val string"),
        cluster_by="k", layout="hash", target_files=2,
    )
    store.merge(
        spark,
        spark.createDataFrame(
            [(2, "B", "update", 1), (3, "c", "insert", 1), (1, None, "delete", 1)],
            "k bigint, val string, op string, seq int",
        ),
        key_cols="k", version_cols="seq",
    )
    q = (
        spark.readStream.format("snapshot_cdf")
        .option("key", "k")
        .load(str(store_dir))
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.k, r.val, r._version, r._change_type)
        for r in spark.read.parquet(str(out_dir)).collect()
    }
    assert got == {
        (1, "a", 1, "insert"),
        (2, "b", 1, "insert"),
        (1, "a", 2, "delete"),
        (2, "b", 2, "update_preimage"),
        (2, "B", 2, "update_postimage"),
        (3, "c", 2, "insert"),
    }


def test_cdf_stream_keyed_rejects_unknown_key(spark, tmp_path):
    import pytest

    store_dir = tmp_path / "s"
    store = SnapshotStore(str(store_dir))
    store.commit(spark.createDataFrame([(1, "a")], "k bigint, val string"))
    with pytest.raises(Exception, match="key columns not in store schema"):
        (
            spark.readStream.format("snapshot_cdf")
            .option("key", "nope")
            .load(str(store_dir))
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "c2"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination(60)
        )
