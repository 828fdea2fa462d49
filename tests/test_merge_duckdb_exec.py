"""Machine-validate the Delta-seam MERGE INTO renders by EXECUTING them
on DuckDB (tools/duckdb_merge.py — clause skeleton translated, every
condition/assignment/insert expression copied verbatim) and
hash-matching the final table state against the engine's own apply path
(snapshot-store merge_into / merge_full_sync). Round 8 only
golden-compared the text; an expression-level rendering bug could not
fail a string comparison, but it fails this."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from log2sql_spark.operators.merge import (
    merge_full_sync,
    merge_into,
    render_merge_full_sync_sql,
    render_merge_into_sql,
)
from tools.duckdb_merge import execute_merge_duckdb, parse_merge

TARGET = [(1, "new", 100), (2, "old", 200), (3, "keep", 300)]
TARGET_SCHEMA = "k int, status string, cents long"

# change feed: multiple versions per key (exercises the row_number pick
# inside USING), update+delete on the same key, insert-then-update of a
# new key, a delete for an absent key (must not insert), and a late
# stale version that must lose.
CHANGES = [
    # key 1: update v1, then delete v2 -> final: gone
    (1, "upd", 111, "update", 1),
    (1, None, None, "delete", 2),
    # key 2: stale update v1 loses to fresher update v2
    (2, "stale", 201, "update", 1),
    (2, "fresh", 222, "update", 2),
    # key 4: insert v1 then update v2 -> final: updated image
    (4, "born", 400, "insert", 1),
    (4, "grown", 444, "update", 2),
    # key 9: delete of a key the target never had -> no insert
    (9, None, None, "delete", 1),
]
CHANGES_SCHEMA = "k int, status string, cents long, op string, seq int"


def _duck_with_target():
    con = duckdb.connect()
    con.execute("CREATE TABLE tgt (k INT, status VARCHAR, cents BIGINT)")
    con.executemany("INSERT INTO tgt VALUES (?, ?, ?)", TARGET)
    return con


def _rows(df) -> set:
    return {tuple(r) for r in df.collect()}


def test_rendered_cdc_merge_executes_and_matches_engine_apply(spark):
    changes = spark.createDataFrame(CHANGES, CHANGES_SCHEMA)
    store = spark.createDataFrame(TARGET, TARGET_SCHEMA)

    engine_final = merge_into(
        store, changes, key_cols="k", version_cols="seq"
    ).select("k", "status", "cents")

    sql = render_merge_into_sql(
        "tgt", "changes_v", ["k"], ["status", "cents"], ["seq"]
    )
    con = _duck_with_target()
    con.register(
        "changes_v",
        pd.DataFrame(CHANGES, columns=["k", "status", "cents", "op", "seq"]),
    )
    execute_merge_duckdb(con, sql)
    duck_final = {
        tuple(r) for r in con.execute("SELECT k, status, cents FROM tgt").fetchall()
    }

    expected = {(2, "fresh", 222), (3, "keep", 300), (4, "grown", 444)}
    assert duck_final == expected
    assert _rows(engine_final) == expected  # both engines, same final state


@pytest.mark.parametrize(
    "action,set_exprs,set_cols,expected",
    [
        (
            "delete",
            None,
            None,
            {(1, "synced", 1), (5, "newrow", 5)},
        ),
        (
            "update",
            {"status": "'inactive'"},
            "inactive",
            {(1, "synced", 1), (5, "newrow", 5), (2, "inactive", 200), (3, "inactive", 300)},
        ),
        (
            "keep",
            None,
            None,
            {(1, "synced", 1), (5, "newrow", 5), (2, "old", 200), (3, "keep", 300)},
        ),
    ],
)
def test_rendered_full_sync_merge_executes_and_matches_engine(
    spark, action, set_exprs, set_cols, expected
):
    snapshot = [(1, "synced", 1), (5, "newrow", 5)]
    store = spark.createDataFrame(TARGET, TARGET_SCHEMA)
    src = spark.createDataFrame(snapshot, TARGET_SCHEMA)

    cols = {"status": F.lit(set_cols)} if set_cols else None
    engine_final = merge_full_sync(
        store, src, key_cols="k", not_matched_by_source=action, set_cols=cols
    ).select("k", "status", "cents")

    sql = render_merge_full_sync_sql(
        "tgt", "snapshot_v", ["k"], ["status", "cents"],
        not_matched_by_source=action, set_exprs=set_exprs,
    )
    con = _duck_with_target()
    con.register(
        "snapshot_v", pd.DataFrame(snapshot, columns=["k", "status", "cents"])
    )
    execute_merge_duckdb(con, sql)
    duck_final = {
        tuple(r) for r in con.execute("SELECT k, status, cents FROM tgt").fetchall()
    }
    assert duck_final == expected
    assert _rows(engine_final) == expected


def test_parse_merge_clause_structure():
    sql = render_merge_into_sql("t", "v", ["k"], ["a"], ["seq"])
    p = parse_merge(sql)
    kinds = [(c.kind, c.action) for c in p["clauses"]]
    assert kinds == [
        ("matched", "delete"),
        ("matched", "update"),
        ("not_matched", "insert"),
    ]
    # delete clause precedes update (first-match-wins golden contract)
    assert p["clauses"][0].condition.strip() == "s.`op` = 'delete'"
    assert p["on"] == "t.`k` = s.`k`"


def test_matched_clause_order_is_load_bearing_on_duckdb():
    """Flip the delete/update clause order and the same feed produces a
    DIFFERENT final state — proof the executor honors first-match-wins
    rather than applying clauses independently."""
    sql = render_merge_into_sql("tgt", "changes_v", ["k"], ["status", "cents"], ["seq"])
    # hand-build the swapped variant: update clause first, unguarded
    swapped = sql.replace(
        "WHEN MATCHED AND s.`op` = 'delete' THEN DELETE\n"
        "WHEN MATCHED THEN UPDATE SET t.`status` = s.`status`, t.`cents` = s.`cents`",
        "WHEN MATCHED THEN UPDATE SET t.`status` = s.`status`, t.`cents` = s.`cents`\n"
        "WHEN MATCHED AND s.`op` = 'delete' THEN DELETE",
    )
    assert swapped != sql
    feed = pd.DataFrame(
        [(1, None, None, "delete", 1)],
        columns=["k", "status", "cents", "op", "seq"],
    )
    con = _duck_with_target()
    con.register("changes_v", feed)
    execute_merge_duckdb(con, sql)
    assert con.execute("SELECT count(*) FROM tgt WHERE k = 1").fetchone()[0] == 0

    con2 = _duck_with_target()
    con2.register("changes_v", feed)
    execute_merge_duckdb(con2, swapped)
    # update clause wins first: row 1 survives with nulled image
    got = con2.execute("SELECT k, status, cents FROM tgt WHERE k = 1").fetchall()
    assert got == [(1, None, None)]
