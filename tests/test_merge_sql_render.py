"""Golden tests for the Delta swap-in seam (operators/merge.py):
the rendered MERGE INTO statements are the exact SQL a Delta target
would execute for merge_into / merge_full_sync semantics. Text is
pinned verbatim (the golden contract) AND round-tripped through
Spark's SQL parser so a syntax regression can't hide behind a
whitespace-tolerant comparison."""

from __future__ import annotations

import pytest

from log2sql_spark.operators.merge import (
    execute_merge,
    render_merge_full_sync_sql,
    render_merge_into_sql,
)

GOLDEN_CDC = """\
MERGE INTO `shop`.`orders` AS t
USING (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY `o_orderkey` ORDER BY `file` DESC, `start_pos` DESC, `event_seq` DESC) AS _rn
    FROM changes_v
  ) WHERE _rn = 1
) AS s
ON t.`o_orderkey` = s.`o_orderkey`
WHEN MATCHED AND s.`op` = 'delete' THEN DELETE
WHEN MATCHED THEN UPDATE SET t.`o_orderstatus` = s.`o_orderstatus`, t.`o_totalprice_cents` = s.`o_totalprice_cents`
WHEN NOT MATCHED AND s.`op` <> 'delete' THEN
  INSERT (`o_orderkey`, `o_orderstatus`, `o_totalprice_cents`) VALUES (s.`o_orderkey`, s.`o_orderstatus`, s.`o_totalprice_cents`)"""

GOLDEN_FULL_SYNC_DELETE = """\
MERGE INTO `shop`.`orders` AS t
USING snapshot_v AS s
ON t.`o_orderkey` = s.`o_orderkey`
WHEN MATCHED THEN UPDATE SET t.`o_orderstatus` = s.`o_orderstatus`
WHEN NOT MATCHED THEN INSERT (`o_orderkey`, `o_orderstatus`) VALUES (s.`o_orderkey`, s.`o_orderstatus`)
WHEN NOT MATCHED BY SOURCE THEN DELETE"""

GOLDEN_FULL_SYNC_DEACTIVATE = """\
MERGE INTO `shop`.`orders` AS t
USING snapshot_v AS s
ON t.`o_orderkey` = s.`o_orderkey`
WHEN MATCHED THEN UPDATE SET t.`o_orderstatus` = s.`o_orderstatus`, t.`is_active` = s.`is_active`
WHEN NOT MATCHED THEN INSERT (`o_orderkey`, `o_orderstatus`, `is_active`) VALUES (s.`o_orderkey`, s.`o_orderstatus`, s.`is_active`)
WHEN NOT MATCHED BY SOURCE THEN UPDATE SET t.`is_active` = false"""


def _assert_parses(spark, sql: str) -> None:
    """The statement must be syntactically valid Spark SQL (MERGE INTO
    incl. WHEN NOT MATCHED BY SOURCE is native Spark 4 grammar; only
    execution needs a row-level-op table)."""
    spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)


def test_cdc_merge_sql_golden(spark):
    sql = render_merge_into_sql(
        "`shop`.`orders`",
        "changes_v",
        ["o_orderkey"],
        ["o_orderstatus", "o_totalprice_cents"],
        ["file", "start_pos", "event_seq"],
    )
    assert sql == GOLDEN_CDC
    _assert_parses(spark, sql)


def test_full_sync_delete_golden(spark):
    sql = render_merge_full_sync_sql(
        "`shop`.`orders`",
        "snapshot_v",
        ["o_orderkey"],
        ["o_orderstatus"],
        not_matched_by_source="delete",
    )
    assert sql == GOLDEN_FULL_SYNC_DELETE
    _assert_parses(spark, sql)


def test_full_sync_deactivate_golden(spark):
    sql = render_merge_full_sync_sql(
        "`shop`.`orders`",
        "snapshot_v",
        ["o_orderkey"],
        ["o_orderstatus", "is_active"],
        not_matched_by_source="update",
        set_exprs={"is_active": "false"},
    )
    assert sql == GOLDEN_FULL_SYNC_DEACTIVATE
    _assert_parses(spark, sql)


def test_full_sync_keep_omits_clause(spark):
    sql = render_merge_full_sync_sql(
        "t", "s_v", ["k"], ["v"], not_matched_by_source="keep"
    )
    assert "NOT MATCHED BY SOURCE" not in sql
    _assert_parses(spark, sql)


def test_execute_merge_snapshot_backend_unchanged(spark, tmp_path):
    """The seam's default backend is the existing snapshot-store merge:
    same result as before the seam existed."""
    from pyspark.sql import functions as F

    from log2sql_spark.store import SnapshotStore

    store = SnapshotStore(str(tmp_path / "s"))
    store.commit(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"),
        mode="overwrite",
    )
    changes = spark.createDataFrame(
        [(2, "b2", "update", 1), (3, "c", "insert", 1), (1, None, "delete", 1)],
        "k int, v string, op string, seq int",
    )
    out = execute_merge(
        spark, changes, "ignored", key_cols="k", version_cols="seq", store=store
    )
    assert out is None
    rows = {
        (r.k, r.v)
        for r in store.read(spark).select("k", "v").collect()
    }
    assert rows == {(2, "b2"), (3, "c")}


def test_execute_merge_delta_backend_renders_and_gates(spark):
    """backend=\"delta\" renders the golden SQL and hands it to
    spark.sql — with no Delta catalog in this container the analyzer
    rejects the target table, which is the honest env gate."""
    changes = spark.createDataFrame(
        [(1, "a", "insert", 1)], "k int, v string, op string, seq int"
    )
    with pytest.raises(Exception, match="(?i)table|not found|delta"):
        execute_merge(
            spark,
            changes,
            "`nocat`.`notable`",
            key_cols="k",
            version_cols="seq",
            backend="delta",
        )
