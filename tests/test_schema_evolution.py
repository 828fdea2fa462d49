"""Schema evolution: mid-stream ALTER TABLE ADD COLUMN evolves the
catalog for subsequent events (the reference gets this from per-event
information_schema lookups; the engine gets it from a position-versioned
catalog + as-of resolution)."""

from __future__ import annotations

from datetime import datetime

from log2sql_spark.sources.binlog import read_binlog
from log2sql_spark.sources.binlog_fixture import render_binlog
from log2sql_spark.sources.catalog import catalog_from_dict
from log2sql_spark.sources.catalog_evolution import (
    ddl_catalog_deltas,
    resolve_columns_versioned,
    versioned_catalog,
)

TS = datetime(2024, 5, 1, 12, 0, 7)


def _resolve(spark, tmp_path, events, base_spec):
    p = tmp_path / "dump.txt"
    p.write_text(render_binlog(events))
    envelope = read_binlog(spark, str(p))
    base = catalog_from_dict(spark, base_spec)
    versions = versioned_catalog(base, ddl_catalog_deltas(envelope))
    return resolve_columns_versioned(envelope, versions)


def test_add_column_applies_to_later_events_only(spark, tmp_path):
    events = [
        {"op": "insert", "db": "shop", "table": "orders", "ts": TS,
         "values": [(1, "1"), (2, "'a'")]},
        {"op": "ddl", "db": "shop", "table": None, "ts": TS,
         "statement": "ALTER TABLE orders ADD COLUMN note VARCHAR(20)"},
        {"op": "insert", "db": "shop", "table": "orders", "ts": TS,
         "values": [(1, "2"), (2, "'b'"), (3, "'hello'")]},
    ]
    out = _resolve(
        spark, tmp_path, events,
        {"shop.orders": {"columns": ["id", "status"], "key_columns": ["id"]}},
    )
    rows = sorted(
        (r for r in out.collect() if r["op"] == "insert"),
        key=lambda r: r["start_pos"],
    )
    # before the ALTER: 2 columns; after: the third ordinal resolves to `note`
    assert rows[0]["after"] == {"id": "1", "status": "'a'"}
    assert rows[1]["after"] == {"id": "2", "status": "'b'", "note": "'hello'"}


def test_multiple_adds_accumulate(spark, tmp_path):
    events = [
        {"op": "ddl", "db": "shop", "table": None, "ts": TS,
         "statement": "ALTER TABLE orders ADD COLUMN c3 INT"},
        {"op": "ddl", "db": "shop", "table": None, "ts": TS,
         "statement": "ALTER TABLE `shop`.`orders` ADD `c4` INT"},
        {"op": "insert", "db": "shop", "table": "orders", "ts": TS,
         "values": [(1, "1"), (2, "'x'"), (3, "3"), (4, "4")]},
    ]
    out = _resolve(
        spark, tmp_path, events,
        {"shop.orders": {"columns": ["id", "status"], "key_columns": ["id"]}},
    )
    (ins,) = [r for r in out.collect() if r["op"] == "insert"]
    assert ins["after"] == {"id": "1", "status": "'x'", "c3": "3", "c4": "4"}


def test_no_ddl_matches_static_resolution(spark, tmp_path):
    from log2sql_spark.sources.catalog import resolve_columns

    events = [
        {"op": "insert", "db": "shop", "table": "orders", "ts": TS,
         "values": [(1, "1"), (2, "'a'")]},
        {"op": "delete", "db": "shop", "table": "orders", "ts": TS,
         "values": [(1, "1"), (2, "'a'")]},
    ]
    p = tmp_path / "d2.txt"
    p.write_text(render_binlog(events))
    envelope = read_binlog(spark, str(p))
    base = catalog_from_dict(
        spark, {"shop.orders": {"columns": ["id", "status"], "key_columns": ["id"]}}
    )
    static = {
        (r["op"], r["start_pos"]): (r["before"], r["after"])
        for r in resolve_columns(envelope, base).collect()
    }
    versioned = {
        (r["op"], r["start_pos"]): (r["before"], r["after"])
        for r in resolve_columns_versioned(
            envelope, versioned_catalog(base, ddl_catalog_deltas(envelope))
        ).collect()
    }
    assert static == versioned


def test_streaming_evolution_across_batches_and_restart(spark, tmp_path):
    """A DDL in one micro-batch must evolve resolution for events in
    LATER batches and survive a checkpointed restart (deltas persisted
    next to the checkpoint)."""
    from log2sql_spark.streaming.cdc_stream import stream_binlog_to_sql

    in_dir, out_dir, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ck"
    in_dir.mkdir()
    cat = catalog_from_dict(
        spark, {"shop.orders": {"columns": ["id", "status"], "key_columns": ["id"]}}
    )
    (in_dir / "bin.000001.txt").write_text(
        render_binlog(
            [
                {"op": "insert", "db": "shop", "table": "orders", "ts": TS,
                 "values": [(1, "1"), (2, "'a'")]},
                {"op": "ddl", "db": "shop", "table": None, "ts": TS,
                 "statement": "ALTER TABLE orders ADD COLUMN note VARCHAR(20)"},
            ]
        )
    )
    q = stream_binlog_to_sql(
        spark, str(in_dir), cat, str(out_dir), str(ckpt), evolve_schema=True
    )
    q.awaitTermination(120)

    # batch 2 arrives after a RESTART: the persisted deltas must apply
    (in_dir / "bin.000002.txt").write_text(
        render_binlog(
            [
                {"op": "insert", "db": "shop", "table": "orders", "ts": TS,
                 "values": [(1, "2"), (2, "'b'"), (3, "'hi'")]},
            ]
        )
    )
    q2 = stream_binlog_to_sql(
        spark, str(in_dir), cat, str(out_dir), str(ckpt), evolve_schema=True
    )
    q2.awaitTermination(120)
    sqls = {r["sql_text"] for r in spark.read.parquet(str(out_dir)).collect() if r["op"] == "insert"}
    assert "INSERT INTO `shop`.`orders`(`id`, `status`) VALUES (1, 'a');" in sqls
    assert (
        "INSERT INTO `shop`.`orders`(`id`, `status`, `note`) VALUES (2, 'b', 'hi');" in sqls
    )


def test_unknown_table_still_falls_back_to_ordinals(spark, tmp_path):
    events = [
        {"op": "insert", "db": "ghost", "table": "t", "ts": TS, "values": [(1, "9")]}
    ]
    out = _resolve(
        spark, tmp_path, events,
        {"shop.orders": {"columns": ["id"], "key_columns": ["id"]}},
    )
    (row,) = out.collect()
    assert row["after"] == {"@1": "9"}
