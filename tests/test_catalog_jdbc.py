"""Contract tests for the JDBC catalog transform.

No MySQL server exists in this sandbox, so the transform behind
``catalog_from_jdbc`` (factored as ``catalog_from_information_schema``)
is exercised with synthetic ``information_schema.columns`` /
``statistics`` DataFrames shaped exactly like MySQL's — covering the
PK branch (reference log2sql.py:34-36), the unique-index fallback
(log2sql.py:39-46), and the no-key case, plus end-to-end ordinal
resolution through ``resolve_columns``.
"""

from __future__ import annotations

import pytest

from log2sql_spark.sources.catalog import catalog_from_information_schema

COLS_SCHEMA = (
    "TABLE_SCHEMA string, TABLE_NAME string, COLUMN_NAME string, "
    "ORDINAL_POSITION long, COLUMN_KEY string"
)
STATS_SCHEMA = (
    "TABLE_SCHEMA string, TABLE_NAME string, NON_UNIQUE long, "
    "INDEX_NAME string, SEQ_IN_INDEX long, COLUMN_NAME string"
)


@pytest.fixture(scope="module")
def catalog_rows(spark):
    cols = spark.createDataFrame(
        [
            # shop.orders: composite PK (id, region) — PRI branch
            ("shop", "orders", "id", 1, "PRI"),
            ("shop", "orders", "region", 2, "PRI"),
            ("shop", "orders", "status", 3, ""),
            # shop.events: NO pk, unique index on (dev, seq) — fallback branch
            ("shop", "events", "dev", 1, "UNI"),
            ("shop", "events", "seq", 2, ""),
            ("shop", "events", "payload", 3, ""),
            # shop.logline: no pk, no unique index — empty key_columns
            ("shop", "logline", "msg", 1, ""),
            # ordinal order must come from ORDINAL_POSITION, not row order
            ("shop", "shuffled", "c", 3, ""),
            ("shop", "shuffled", "a", 1, "PRI"),
            ("shop", "shuffled", "b", 2, ""),
        ],
        COLS_SCHEMA,
    )
    stats = spark.createDataFrame(
        [
            # events: two unique indexes; first BY NAME is idx_a(dev,seq) —
            # deterministic stand-in for the reference's unordered LIMIT 1.
            ("shop", "events", 0, "idx_a", 1, "dev"),
            ("shop", "events", 0, "idx_a", 2, "seq"),
            ("shop", "events", 0, "idx_b", 1, "payload"),
            # a NON-unique index that must be ignored
            ("shop", "events", 1, "idx_nonuniq", 1, "payload"),
            # orders has a PK; its unique index must NOT override it
            ("shop", "orders", 0, "uniq_status", 1, "status"),
        ],
        STATS_SCHEMA,
    )
    return {
        (r["db"], r["table"]): r.asDict()
        for r in catalog_from_information_schema(cols, stats).collect()
    }


def test_pk_branch_wins_over_unique_index(catalog_rows):
    row = catalog_rows[("shop", "orders")]
    assert row["columns"] == ["id", "region", "status"]
    assert row["key_columns"] == ["id", "region"]  # not ['status']


def test_unique_fallback_branch(catalog_rows):
    row = catalog_rows[("shop", "events")]
    assert row["columns"] == ["dev", "seq", "payload"]
    # first unique index by name (idx_a), in SEQ_IN_INDEX order;
    # idx_b and the non-unique index are ignored
    assert row["key_columns"] == ["dev", "seq"]


def test_no_key_at_all_is_empty(catalog_rows):
    assert catalog_rows[("shop", "logline")]["key_columns"] == []


def test_columns_ordered_by_ordinal_not_row_order(catalog_rows):
    assert catalog_rows[("shop", "shuffled")]["columns"] == ["a", "b", "c"]
    assert catalog_rows[("shop", "shuffled")]["key_columns"] == ["a"]


def test_resolves_ordinals_end_to_end(spark):
    """The synthetic-information_schema catalog plugs into
    resolve_columns exactly like the JSON/dict catalogs."""
    from log2sql_spark.sources.binlog import read_binlog  # noqa: F401  (import parity)
    from log2sql_spark.sources.catalog import resolve_columns

    cols = spark.createDataFrame(
        [("shop", "orders", "id", 1, "PRI"), ("shop", "orders", "status", 2, "")],
        COLS_SCHEMA,
    )
    stats = spark.createDataFrame([], STATS_SCHEMA)
    catalog = catalog_from_information_schema(cols, stats)

    envelope = spark.createDataFrame(
        [("f", 0, "insert", "shop", "orders", 4, 124, None,
          None, {"1": "7", "2": "'new'"}, None)],
        "file string, event_seq long, op string, db string, table string, "
        "start_pos long, stop_pos long, event_ts timestamp, "
        "before map<string,string>, after map<string,string>, statement string",
    )
    out = resolve_columns(envelope, catalog).collect()[0]
    assert out["after"] == {"id": "7", "status": "'new'"}
    assert out["key_columns"] == ["id"]


def test_quarantine_reason_survives_null_db_table(spark):
    """split_catalog_misses must stamp a non-NULL reason even when db
    or table is NULL (the most malformed events are exactly the ones
    the dead-letter sink needs a machine-readable reason for)."""
    from log2sql_spark.sources.catalog import split_catalog_misses

    env_schema = (
        "file string, event_seq long, op string, db string, table string, "
        "start_pos long, stop_pos long, event_ts timestamp, "
        "before map<string,string>, after map<string,string>, statement string"
    )
    envelope = spark.createDataFrame(
        [
            ("f", 0, "insert", None, "ghost", 4, 124, None, None, {"1": "7"}, None),
            ("f", 1, "insert", "legacy", None, 4, 124, None, None, {"1": "8"}, None),
            ("f", 2, "insert", None, None, 4, 124, None, None, {"1": "9"}, None),
        ],
        env_schema,
    )
    catalog = spark.createDataFrame(
        [("shop", "orders", ["id"], ["id"])],
        "db string, table string, columns array<string>, key_columns array<string>",
    )
    ok, rejected = split_catalog_misses(envelope, catalog)
    assert ok.count() == 0
    reasons = {r.event_seq: r.reason for r in rejected.collect()}
    assert reasons == {
        0: "unknown_table: no catalog entry for <null>.ghost",
        1: "unknown_table: no catalog entry for legacy.<null>",
        2: "unknown_table: no catalog entry for <null>.<null>",
    }
