"""Golden + property tests for replay/flashback codegen (R10–R13)."""

from __future__ import annotations

from datetime import datetime

import pytest

from log2sql_spark.cdc import binlog_to_sql
from log2sql_spark.operators.cdc_codegen import flashback_sql, replay_sql
from log2sql_spark.sources.binlog import read_binlog
from log2sql_spark.sources.binlog_fixture import render_binlog
from log2sql_spark.sources.catalog import catalog_from_dict, resolve_columns

TS = datetime(2024, 5, 1, 12, 0, 7)

CATALOG = {
    "shop.orders": {"columns": ["id", "status", "amount"], "key_columns": ["id"]},
    "shop.nokey": {"columns": ["a", "b"], "key_columns": []},
}


@pytest.fixture(scope="module")
def catalog(spark):
    return catalog_from_dict(spark, CATALOG)


def _pipeline(spark, tmp_path, events, catalog, flashback=False, **filters):
    p = tmp_path / "dump.txt"
    p.write_text(render_binlog(events))
    return binlog_to_sql(spark, str(p), catalog, flashback=flashback, **filters)


def test_replay_insert(spark, tmp_path, catalog):
    events = [
        {
            "op": "insert",
            "db": "shop",
            "table": "orders",
            "ts": TS,
            "values": [(1, "42"), (2, "'pending'"), (3, "99.5")],
        }
    ]
    (row,) = _pipeline(spark, tmp_path, events, catalog).collect()
    assert row["sql_text"] == (
        "INSERT INTO `shop`.`orders`(`id`, `status`, `amount`) VALUES (42, 'pending', 99.5);"
    )
    assert row["pos_info"] == "# start-pos: 4; stop-pos: 124; datetime: 2024-05-01 12:00:07"


def test_replay_delete_prefers_key_image(spark, tmp_path, catalog):
    events = [
        {
            "op": "delete",
            "db": "shop",
            "table": "orders",
            "ts": TS,
            "values": [(1, "42"), (2, "'pending'"), (3, "99.5")],
        }
    ]
    (row,) = _pipeline(spark, tmp_path, events, catalog).collect()
    assert row["sql_text"] == "DELETE FROM `shop`.`orders` WHERE `id`=42 LIMIT 1;"


def test_replay_delete_keyless_uses_full_image(spark, tmp_path, catalog):
    events = [
        {
            "op": "delete",
            "db": "shop",
            "table": "nokey",
            "ts": TS,
            "values": [(1, "1"), (2, "'x'")],
        }
    ]
    (row,) = _pipeline(spark, tmp_path, events, catalog).collect()
    assert row["sql_text"] == "DELETE FROM `shop`.`nokey` WHERE `a`=1 AND `b`='x' LIMIT 1;"


def test_replay_update_sets_after_where_before_key(spark, tmp_path, catalog):
    events = [
        {
            "op": "update",
            "db": "shop",
            "table": "orders",
            "ts": TS,
            "before": [(1, "42"), (2, "'pending'"), (3, "99.5")],
            "after": [(1, "42"), (2, "'shipped'"), (3, "99.5")],
        }
    ]
    (row,) = _pipeline(spark, tmp_path, events, catalog).collect()
    assert row["sql_text"] == (
        "UPDATE `shop`.`orders` SET `id`=42, `status`='shipped', `amount`=99.5"
        " WHERE `id`=42 LIMIT 1;"
    )


def test_null_renders_is_null_in_predicates(spark, tmp_path, catalog):
    """log2sql.py:127-132: literal NULL token → IS NULL in WHERE."""
    events = [
        {
            "op": "delete",
            "db": "shop",
            "table": "nokey",
            "ts": TS,
            "values": [(1, "NULL"), (2, "'x'")],
        }
    ]
    (row,) = _pipeline(spark, tmp_path, events, catalog).collect()
    assert row["sql_text"] == "DELETE FROM `shop`.`nokey` WHERE `a` IS NULL AND `b`='x' LIMIT 1;"


def test_flashback_inverts_ops(spark, tmp_path, catalog):
    events = [
        {
            "op": "insert",
            "db": "shop",
            "table": "orders",
            "ts": TS,
            "values": [(1, "42"), (2, "'pending'"), (3, "99.5")],
        },
        {
            "op": "delete",
            "db": "shop",
            "table": "orders",
            "ts": TS,
            "values": [(1, "7"), (2, "'old'"), (3, "1.0")],
        },
        {
            "op": "update",
            "db": "shop",
            "table": "orders",
            "ts": TS,
            "before": [(1, "42"), (2, "'pending'")],
            "after": [(1, "42"), (2, "'shipped'")],
        },
    ]
    rows = _pipeline(spark, tmp_path, events, catalog, flashback=True).collect()
    # Reverse position order: the update (latest) rolls back first —
    # fixes the reference's forward-ordered flashback (README.md:23-27).
    assert [r["start_pos"] for r in rows] == [244, 124, 4]
    sqls = [r["sql_text"] for r in rows]
    assert sqls[0] == (
        "UPDATE `shop`.`orders` SET `id`=42, `status`='pending' WHERE `id`=42 LIMIT 1;"
    )
    assert sqls[1] == (
        "INSERT INTO `shop`.`orders`(`id`, `status`, `amount`) VALUES (7, 'old', 1.0);"
    )
    assert sqls[2] == "DELETE FROM `shop`.`orders` WHERE `id`=42 LIMIT 1;"


def test_filters_by_type_db_table_and_position(spark, tmp_path, catalog):
    events = [
        {"op": "insert", "db": "shop", "table": "orders", "ts": TS, "values": [(1, "1")]},
        {"op": "delete", "db": "shop", "table": "orders", "ts": TS, "values": [(1, "2")]},
        {"op": "insert", "db": "shop", "table": "nokey", "ts": TS, "values": [(1, "3")]},
        {"op": "insert", "db": "other", "table": "orders", "ts": TS, "values": [(1, "4")]},
    ]
    df = _pipeline(
        spark, tmp_path, events, catalog,
        sql_types=["insert"], database="shop", tables=["orders"],
    )
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["after"] == {"id": "1"}

    df2 = _pipeline(spark, tmp_path, events, catalog, start_position=124, stop_position=400)
    vals = {next(iter((r["after"] or r["before"]).values())) for r in df2.collect()}
    assert vals == {"2", "3"}


def test_unknown_table_keeps_ordinal_names(spark, tmp_path, catalog):
    events = [
        {"op": "insert", "db": "ghost", "table": "t", "ts": TS, "values": [(1, "5")]}
    ]
    (row,) = _pipeline(spark, tmp_path, events, catalog).collect()
    assert row["after"] == {"@1": "5"}
    assert row["sql_text"] == "INSERT INTO `ghost`.`t`(`@1`) VALUES (5);"


def test_ddl_passthrough_when_included(spark, tmp_path, catalog):
    events = [
        {"op": "ddl", "db": "shop", "table": None, "ts": TS, "statement": "DROP TABLE old"},
        {"op": "insert", "db": "shop", "table": "orders", "ts": TS, "values": [(1, "1")]},
    ]
    df = _pipeline(spark, tmp_path, events, catalog, include_ddl=True)
    ops = {r["op"]: r["sql_text"] for r in df.collect()}
    assert ops["ddl"].startswith("DROP TABLE old")
    df2 = _pipeline(spark, tmp_path, events, catalog)
    assert [r["op"] for r in df2.collect()] == ["insert"]


def test_replay_flashback_roundtrip_property(spark, tmp_path, catalog):
    """flashback(replay(e)) returns the pre-image: applying replay then
    flashback SQL to a row state is a no-op. Verified symbolically: the
    flashback statement's SET/VALUES equals the replay statement's
    pre-image for every op."""
    events = [
        {
            "op": "update",
            "db": "shop",
            "table": "orders",
            "ts": TS,
            "before": [(1, "10"), (2, "'a'"), (3, "1.5")],
            "after": [(1, "10"), (2, "'b'"), (3, "2.5")],
        }
    ]
    p = tmp_path / "d.txt"
    p.write_text(render_binlog(events))
    resolved = resolve_columns(read_binlog(spark, str(p)), catalog)
    fwd = replay_sql(resolved).collect()[0]["sql_text"]
    back = flashback_sql(resolved).collect()[0]["sql_text"]
    assert "SET `id`=10, `status`='b', `amount`=2.5" in fwd
    assert "SET `id`=10, `status`='a', `amount`=1.5" in back
    assert "WHERE `id`=10" in fwd and "WHERE `id`=10" in back
