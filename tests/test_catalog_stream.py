"""Streaming multi-table CDC apply with atomic cross-table visibility
(apply_changes_to_catalog): per micro-batch, per-table merges + ONE
StoreCatalog publish pinning the whole vector."""

from __future__ import annotations

from datetime import datetime

from log2sql_spark.sources.binlog_fixture import render_binlog
from log2sql_spark.sources.catalog import catalog_from_dict
from log2sql_spark.store import StoreCatalog

TS = datetime(2024, 5, 1, 12, 0, 7)


def _cat(spark):
    return catalog_from_dict(
        spark,
        {
            "shop.orders": {"columns": ["id", "status"], "key_columns": ["id"]},
            "shop.items": {"columns": ["id", "qty"], "key_columns": ["id"]},
        },
    )


def _run(spark, in_dir, cat, root, ckpt):
    from log2sql_spark.streaming.cdc_stream import apply_changes_to_catalog

    q = apply_changes_to_catalog(
        spark, str(in_dir), cat, str(root), str(ckpt),
        tables=["shop.orders", "shop.items"],
    )
    q.awaitTermination(180)
    assert q.exception() is None


def _vector(spark, root):
    cat = StoreCatalog(str(root))
    out = {}
    for name in ("shop.orders", "shop.items"):
        rows = {
            r.key: dict(r.after) for r in cat.read(spark, name).collect()
        }
        out[name] = rows
    return cat, out


def test_multi_table_vector_advances_atomically(spark, tmp_path):
    in_dir, root, ckpt = tmp_path / "in", tmp_path / "root", tmp_path / "ckpt"
    in_dir.mkdir()
    (in_dir / "bin.000001.txt").write_text(render_binlog([
        {"op": "insert", "db": "shop", "table": "orders", "ts": TS,
         "values": [(1, "1"), (2, "'new'")]},
        {"op": "insert", "db": "shop", "table": "items", "ts": TS,
         "values": [(1, "10"), (2, "3")]},
    ]))
    cat_df = _cat(spark)
    _run(spark, in_dir, cat_df, root, ckpt)

    cat, vec = _vector(spark, root)
    v_after_b0 = cat.head_version()
    assert vec["shop.orders"] == {"1": {"id": "1", "status": "'new'"}}
    assert vec["shop.items"] == {"10": {"id": "10", "qty": "3"}}
    assert cat.snapshot()["meta"]["batch_id"] == 0

    # batch 1: touches ONLY orders; items' pin carries unchanged
    (in_dir / "bin.000002.txt").write_text(render_binlog([
        {"op": "update", "db": "shop", "table": "orders", "ts": TS,
         "before": [(1, "1"), (2, "'new'")],
         "after": [(1, "1"), (2, "'shipped'")]},
    ]))
    _run(spark, in_dir, cat_df, root, ckpt)
    cat, vec = _vector(spark, root)
    assert cat.head_version() == v_after_b0 + 1
    assert vec["shop.orders"]["1"]["status"] == "'shipped'"
    assert vec["shop.items"] == {"10": {"id": "10", "qty": "3"}}
    # items' pinned store version did not move between the two batches
    r0 = cat.resolve(v_after_b0)
    r1 = cat.resolve()
    assert r0["shop.items"] == r1["shop.items"]
    assert r1["shop.orders"][1] == r0["shop.orders"][1] + 1
    # the PRE-batch-1 vector still resolves consistently (time travel)
    assert {
        r.key: dict(r.after)
        for r in cat.read(spark, "shop.orders", version=v_after_b0).collect()
    }["1"]["status"] == "'new'"


def test_replayed_batch_publishes_no_second_vector(spark, tmp_path):
    import os

    in_dir, root, ckpt = tmp_path / "in", tmp_path / "root", tmp_path / "ckpt"
    in_dir.mkdir()
    (in_dir / "bin.000001.txt").write_text(render_binlog([
        {"op": "insert", "db": "shop", "table": "orders", "ts": TS,
         "values": [(1, "1"), (2, "'a'")]},
        {"op": "insert", "db": "shop", "table": "items", "ts": TS,
         "values": [(1, "7"), (2, "2")]},
    ]))
    cat_df = _cat(spark)
    _run(spark, in_dir, cat_df, root, ckpt)
    cat, vec_before = _vector(spark, root)
    head_before = cat.head_version()

    # crash before checkpoint commit: replay micro-batch 0
    os.remove(ckpt / "commits" / "0")
    crc = ckpt / "commits" / ".0.crc"
    if crc.exists():
        os.remove(crc)
    _run(spark, in_dir, cat_df, root, ckpt)

    cat, vec_after = _vector(spark, root)
    assert cat.head_version() == head_before  # no second catalog version
    assert vec_after == vec_before  # rows idempotent under re-delivery


def test_unrouted_tables_dead_lettered_not_dropped(spark, tmp_path):
    """db.table values present in the dump but absent from `tables`
    land in root/_dead_letter/batch=<id> and are named in the catalog
    manifest meta — never silently dropped (r12 ADVICE)."""
    from log2sql_spark.sources.catalog import catalog_from_dict

    in_dir, root, ckpt = tmp_path / "in", tmp_path / "root", tmp_path / "ckpt"
    in_dir.mkdir()
    (in_dir / "bin.000001.txt").write_text(render_binlog([
        {"op": "insert", "db": "shop", "table": "orders", "ts": TS,
         "values": [(1, "1"), (2, "'a'")]},
        {"op": "insert", "db": "shop", "table": "ghost", "ts": TS,
         "values": [(1, "41"), (2, "9")]},
    ]))
    cat_df = catalog_from_dict(spark, {
        "shop.orders": {"columns": ["id", "status"], "key_columns": ["id"]},
        "shop.ghost": {"columns": ["id", "qty"], "key_columns": ["id"]},
    })
    from log2sql_spark.streaming.cdc_stream import apply_changes_to_catalog

    q = apply_changes_to_catalog(
        spark, str(in_dir), cat_df, str(root), str(ckpt),
        tables=["shop.orders"],
    )
    q.awaitTermination(180)
    assert q.exception() is None

    cat = StoreCatalog(str(root))
    assert cat.snapshot()["meta"]["unrouted"] == ["shop.ghost"]
    dl = spark.read.parquet(str(root / "_dead_letter" / "batch=0"))
    rows = dl.collect()
    assert {r._tbl for r in rows} == {"shop.ghost"}
    assert {r.key for r in rows} == {"41"}
    # the routed table still applied normally
    assert {
        r.key for r in cat.read(spark, "shop.orders").collect()
    } == {"1"}


def test_interleaved_register_does_not_reset_replay_watermark(spark, tmp_path):
    """The exactly-once guard scans back to the most recent manifest
    CARRYING a batch_id — an interleaved catalog publish without one
    (register() of a new table) must not let a replayed micro-batch
    republish a duplicate catalog version (r12 ADVICE)."""
    import os

    from log2sql_spark.store import SnapshotStore

    in_dir, root, ckpt = tmp_path / "in", tmp_path / "root", tmp_path / "ckpt"
    in_dir.mkdir()
    (in_dir / "bin.000001.txt").write_text(render_binlog([
        {"op": "insert", "db": "shop", "table": "orders", "ts": TS,
         "values": [(1, "1"), (2, "'a'")]},
    ]))
    cat_df = _cat(spark)
    _run(spark, in_dir, cat_df, root, ckpt)
    cat = StoreCatalog(str(root))

    # out-of-band catalog publish WITHOUT a batch_id: register a new
    # table (the CLI `store catalog --register` path)
    side = SnapshotStore(str(tmp_path / "side"))
    side.commit(
        spark.createDataFrame([("x", {"id": "x"})],
                              "key string, after map<string,string>"),
        mode="overwrite",
    )
    cat.register("side.table", side.path)
    head_before = cat.head_version()
    assert "batch_id" not in cat.snapshot()["meta"]

    # crash before checkpoint commit: replay micro-batch 0
    os.remove(ckpt / "commits" / "0")
    crc = ckpt / "commits" / ".0.crc"
    if crc.exists():
        os.remove(crc)
    _run(spark, in_dir, cat_df, root, ckpt)

    cat = StoreCatalog(str(root))
    assert cat.head_version() == head_before  # no duplicate vector
