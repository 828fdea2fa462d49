"""Streaming MIN/MAX materialized view (cdc_stream.py:
maintain_minmax_mv_stream): the non-distributive IVM fold composed with
the replica store, across micro-batches, restarts, and re-delivery."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from log2sql_spark.sources.binlog_fixture import render_binlog
from log2sql_spark.sources.catalog import catalog_from_dict
from log2sql_spark.store import SnapshotStore
from log2sql_spark.streaming.cdc_stream import maintain_minmax_mv_stream

CATALOG = {"shop.m": {"columns": ["id", "grp", "val"], "key_columns": ["id"]}}
TS = datetime(2024, 5, 1, 12, 0, 7)


def _ins(i, g, v):
    return {"op": "insert", "db": "shop", "table": "m", "ts": TS,
            "values": [(1, str(i)), (2, f"'{g}'"), (3, str(v))]}


def _del(i, g, v):
    return {"op": "delete", "db": "shop", "table": "m", "ts": TS,
            "values": [(1, str(i)), (2, f"'{g}'"), (3, str(v))]}


def _upd(i, g, v, g2, v2):
    return {"op": "update", "db": "shop", "table": "m", "ts": TS,
            "before": [(1, str(i)), (2, f"'{g}'"), (3, str(v))],
            "after": [(1, str(i)), (2, f"'{g2}'"), (3, str(v2))]}


def _run(spark, tmp_path):
    cat = catalog_from_dict(spark, CATALOG)
    return maintain_minmax_mv_stream(
        spark,
        str(tmp_path / "in"),
        cat,
        str(tmp_path / "replica"),
        str(tmp_path / "view"),
        str(tmp_path / "ckpt"),
        key_col="id",
        group_col="grp",
        val_col="val",
    )


def _view(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "view"))
    return {
        r["grp"]: (r["n"], r["min_v"], r["max_v"])
        for r in store.read(spark).collect()
    }


def _recompute(spark, tmp_path):
    replica = SnapshotStore(str(tmp_path / "replica"))
    rows = (
        replica.read(spark)
        .select(
            F.element_at("after", "grp").alias("grp"),
            F.element_at("after", "val").cast("long").alias("val"),
        )
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("val").alias("min_v"),
            F.max("val").alias("max_v"),
        )
        .collect()
    )
    return {r["grp"]: (r["n"], r["min_v"], r["max_v"]) for r in rows}


def test_minmax_view_tracks_replica_across_batches(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "bin.000001.txt").write_text(render_binlog([
        _ins(1, "a", 10), _ins(2, "a", 50), _ins(3, "a", 30),
        _ins(4, "b", 7), _ins(5, "b", 9),
    ]))
    q = _run(spark, tmp_path)
    q.awaitTermination(120)
    assert _view(spark, tmp_path) == _recompute(spark, tmp_path)
    assert _view(spark, tmp_path)["'a'"] == (3, 10, 50)

    # batch 2: delete group a's MAX (dirty -> recompute), move id 5 to
    # group a (clean fold on a's insert side, dirty on b: 9 was b's max)
    (in_dir / "bin.000002.txt").write_text(render_binlog([
        _del(2, "a", 50),
        _upd(5, "b", 9, "a", 60),
    ]))
    q2 = _run(spark, tmp_path)
    q2.awaitTermination(120)
    got = _view(spark, tmp_path)
    assert got == _recompute(spark, tmp_path)
    assert got["'a'"] == (3, 10, 60)  # max recomputed away from 50
    assert got["'b'"] == (1, 7, 7)

    # restart with no new files: nothing re-folds, view unchanged
    q3 = _run(spark, tmp_path)
    q3.awaitTermination(120)
    assert _view(spark, tmp_path) == got


def test_minmax_view_group_drains_to_zero(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "bin.000001.txt").write_text(render_binlog([
        _ins(1, "x", 5), _ins(2, "y", 6),
    ]))
    _run(spark, tmp_path).awaitTermination(120)
    (in_dir / "bin.000002.txt").write_text(render_binlog([
        _del(1, "x", 5),
    ]))
    _run(spark, tmp_path).awaitTermination(120)
    got = _view(spark, tmp_path)
    assert "'x'" not in got  # drained group drops out of the view
    assert got == _recompute(spark, tmp_path)
