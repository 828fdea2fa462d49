"""merge_into semantics: the Delta-MERGE-equivalent CDC apply operator."""

from __future__ import annotations

from log2sql_spark.operators.merge import merge_into


def _run(spark, store_rows, change_rows):
    store = spark.createDataFrame(store_rows, "key long, val string")
    changes = spark.createDataFrame(
        change_rows, "op string, key long, val string, version long"
    )
    out = merge_into(store, changes, key_cols="key", version_cols="version")
    return {r["key"]: r["val"] for r in out.collect()}


def test_merge_upsert_delete_untouched(spark):
    got = _run(
        spark,
        [(1, "a"), (2, "b"), (3, "c")],
        [
            ("update", 1, "a2", 1),
            ("delete", 2, None, 1),
            ("insert", 4, "d", 1),
        ],
    )
    assert got == {1: "a2", 3: "c", 4: "d"}


def test_merge_version_ordering_not_arrival_order(spark):
    got = _run(
        spark,
        [(1, "a")],
        [("update", 1, "v2", 2), ("update", 1, "v1", 1)],  # v2 listed first
    )
    assert got == {1: "v2"}


def test_merge_insert_overwrites_existing_key(spark):
    """Binlog row images are authoritative: an insert on an existing key
    upserts (CDC replay semantics), it does not error or duplicate."""
    got = _run(spark, [(1, "old")], [("insert", 1, "new", 1)])
    assert got == {1: "new"}


def test_merge_delete_missing_key_is_noop(spark):
    got = _run(spark, [(1, "a")], [("delete", 99, None, 1)])
    assert got == {1: "a"}


def test_merge_replay_is_idempotent(spark):
    """Applying the merged result's changes again yields the same state:
    store rows always rank below changes, so re-delivery is safe."""
    changes = [("update", 1, "a2", 1), ("delete", 2, None, 1), ("insert", 4, "d", 1)]
    once = _run(spark, [(1, "a"), (2, "b")], changes)
    twice = _run(spark, list(once.items()), changes)
    assert once == twice == {1: "a2", 4: "d"}


def test_merge_single_shuffle_plan(spark):
    """The plan must be union -> one exchange on key -> window; no join
    of store against changes."""
    store = spark.createDataFrame([(1, "a")], "key long, val string")
    changes = spark.createDataFrame(
        [("update", 1, "b", 1)], "op string, key long, val string, version long"
    )
    qe = merge_into(store, changes, "key", "version")._jdf.queryExecution()
    assert "Join" not in qe.optimizedPlan().toString()
    executed = qe.executedPlan().toString()
    # one hash exchange on the key, and eager top-1 pruning before it
    assert executed.count("Exchange hashpartitioning") == 1
    assert "WindowGroupLimit" in qe.optimizedPlan().toString()


def _sync(spark, store_rows, source_rows, action, set_cols=None):
    from pyspark.sql import functions as F

    from log2sql_spark.operators.merge import merge_full_sync

    store = spark.createDataFrame(store_rows, "key long, val string, active boolean")
    source = spark.createDataFrame(source_rows, "key long, val string, active boolean")
    out = merge_full_sync(
        store, source, "key", not_matched_by_source=action, set_cols=set_cols
    )
    return {r["key"]: (r["val"], r["active"]) for r in out.collect()}


def test_full_sync_delete_drops_vanished_keys(spark):
    got = _sync(
        spark,
        [(1, "a", True), (2, "b", True), (3, "c", True)],
        [(1, "a2", True), (4, "d", True)],  # 2 and 3 vanished
        "delete",
    )
    assert got == {1: ("a2", True), 4: ("d", True)}


def test_full_sync_keep_leaves_vanished_keys(spark):
    got = _sync(
        spark,
        [(1, "a", True), (2, "b", True)],
        [(1, "a2", True)],
        "keep",
    )
    assert got == {1: ("a2", True), 2: ("b", True)}


def test_full_sync_update_flags_vanished_keys(spark):
    from pyspark.sql import functions as F

    got = _sync(
        spark,
        [(1, "a", True), (2, "b", True)],
        [(1, "a2", True)],
        "update",
        {"active": F.lit(False)},
    )
    assert got == {1: ("a2", True), 2: ("b", False)}


def test_full_sync_rejects_bad_action_and_missing_cols(spark):
    import pytest
    from pyspark.sql import functions as F

    from log2sql_spark.operators.merge import merge_full_sync

    store = spark.createDataFrame([(1, "a")], "key long, val string")
    source = spark.createDataFrame([(1,)], "key long")
    with pytest.raises(ValueError, match="unknown action"):
        merge_full_sync(store, store, "key", not_matched_by_source="upsert")
    with pytest.raises(ValueError, match="needs set_cols"):
        merge_full_sync(store, store, "key", not_matched_by_source="update")
    with pytest.raises(ValueError, match="lacks store columns"):
        merge_full_sync(store, source, "key")
    with pytest.raises(ValueError, match="not in store"):
        merge_full_sync(
            store,
            store,
            "key",
            not_matched_by_source="update",
            set_cols={"nope": F.lit(1)},
        )


def test_full_sync_single_shuffle_plan(spark):
    """Same scale contract as merge_into: one exchange on the key."""
    from pyspark.sql import functions as F

    from log2sql_spark.operators.merge import merge_full_sync

    store = spark.createDataFrame([(1, "a", True)], "key long, val string, active boolean")
    source = spark.createDataFrame([(1, "b", True)], "key long, val string, active boolean")
    out = merge_full_sync(store, source, "key")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "SortMergeJoin" not in plan and "BroadcastNestedLoop" not in plan
