"""MERGE INTO semantics over a keyed store — the CDC apply primitive.

The reference's end state is "replay SQL applied to a MySQL server"
(``log2sql.py:161-185``); SURVEY.md §1.1 names ``foreachBatch → MERGE
INTO`` as the real production apply path. Without a transactional table
format in this container, :func:`merge_into` expresses the identical
semantics as one Spark plan over the store's current contents:

* latest change per key wins (ordered by the caller's version columns —
  for binlog CDC that is ``(file, start_pos, event_seq)``);
* ``delete`` removes the key; ``insert``/``update`` upsert the change's
  data image (binlog row images are authoritative, so an ``insert`` on
  an existing key overwrites — CDC replay semantics, matching Delta's
  ``whenMatched.updateAll().whenNotMatched.insertAll()`` +
  ``whenMatched('op = delete').delete()``);
* keys untouched by any change keep their store row.

Scale shape: ONE shuffle on the key columns and one window — no join of
store against changes, no driver collection. On a real deployment the
same call site becomes ``DeltaTable.merge`` and the window collapses
into the table format's transaction log; partitioning the store by key
keeps the rewrite local either way.
"""

from __future__ import annotations

import uuid

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def merge_into(
    store: DataFrame,
    changes: DataFrame,
    key_cols: list[str] | str,
    version_cols: list[str] | str,
    op_col: str = "op",
    delete_op: str = "delete",
    merge_schema: bool = False,
) -> DataFrame:
    """Return the store's contents after applying ``changes``.

    ``store`` holds the current rows (key + data columns, no op/version).
    ``changes`` holds key + the same data columns + ``op_col`` + the
    version columns that order changes within a key. Any change outranks
    the store row; among changes the greatest version wins, so replaying
    a batch twice (or a superset batch) is idempotent.

    Schema evolution (Delta ``mergeSchema`` analog): a change batch
    carrying columns the store lacks raises by default — silent
    dropping hides producer mistakes. With ``merge_schema=True`` the
    new columns join the output schema and pre-existing store rows get
    NULLs for them (additive widening; removing or retyping a column is
    a rewrite, as in Delta).
    """
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    version_cols = (
        [version_cols] if isinstance(version_cols, str) else list(version_cols)
    )
    data_cols = [c for c in store.columns if c not in key_cols]
    expected = set(key_cols) | set(data_cols) | {op_col} | set(version_cols)
    extra = [c for c in changes.columns if c not in expected]
    if extra and not merge_schema:
        raise ValueError(
            f"change batch has columns not in the store: {extra}; pass "
            "merge_schema=True to evolve the schema (old rows read NULL)"
        )
    new_cols = extra if merge_schema else []

    s = store.select(
        *key_cols,
        *data_cols,
        *[
            F.lit(None).cast(changes.schema[c].dataType).alias(c)
            for c in new_cols
        ],
        F.lit(None).cast("string").alias("_op"),
        F.lit(0).alias("_pri"),
        *[
            F.lit(None).cast(changes.schema[v].dataType).alias(v)
            for v in version_cols
        ],
    )
    data_cols = data_cols + new_cols
    c = changes.select(
        *key_cols,
        *data_cols,
        F.col(op_col).alias("_op"),
        F.lit(1).alias("_pri"),
        *version_cols,
    )
    order: list[Column] = [F.desc("_pri")] + [F.desc(v) for v in version_cols]
    w = W.partitionBy(*key_cols).orderBy(*order)
    return (
        s.unionByName(c)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .filter((F.col("_op").isNull()) | (F.col("_op") != delete_op))
        .select(*key_cols, *data_cols)
    )


def merge_full_sync(
    store: DataFrame,
    source: DataFrame,
    key_cols: list[str] | str,
    not_matched_by_source: str = "delete",
    set_cols: dict[str, Column] | None = None,
) -> DataFrame:
    """Delta's ``WHEN NOT MATCHED BY SOURCE`` merge: reconcile the store
    against a FULL source snapshot (not a change feed).

    Source rows win per key (matched → update-all, unmatched → insert);
    store keys ABSENT from the source get the ``not_matched_by_source``
    action: ``"delete"`` drops them, ``"keep"`` leaves them untouched,
    ``"update"`` applies ``set_cols`` (e.g. ``{"is_active":
    F.lit(False)}``) — the soft-delete/deactivation pattern a periodic
    snapshot sync needs (reference analog: replaying a full dump over an
    existing table, ``log2sql.py:161-185``, where vanished rows must be
    reconciled, which the reference cannot express).

    Scale shape: identical to :func:`merge_into` — ONE shuffle on the
    key columns and one window; no store-vs-source join, no collect.
    The source snapshot streams through the same union, so a 100 TB
    store syncs at the cost of a co-partitioned window, and on a real
    Delta deployment the call site is the three-clause ``MERGE INTO``.
    """
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not_matched_by_source not in ("delete", "keep", "update"):
        raise ValueError(f"unknown action: {not_matched_by_source!r}")
    if not_matched_by_source == "update" and not set_cols:
        raise ValueError("action 'update' needs set_cols")
    data_cols = [c for c in store.columns if c not in key_cols]
    missing = [c for c in key_cols + data_cols if c not in source.columns]
    if missing:
        raise ValueError(f"source snapshot lacks store columns: {missing}")

    s = store.select(*key_cols, *data_cols, F.lit(0).alias("_pri"))
    src = source.select(*key_cols, *data_cols, F.lit(1).alias("_pri"))
    w = W.partitionBy(*key_cols).orderBy(F.desc("_pri"))
    picked = (
        s.unionByName(src)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    store_only = F.col("_pri") == 0
    if not_matched_by_source == "delete":
        picked = picked.filter(~store_only)
    elif not_matched_by_source == "update":
        assert set_cols is not None
        for name, expr in set_cols.items():
            if name not in data_cols:
                raise ValueError(f"set_cols target {name!r} not in store")
            picked = picked.withColumn(
                name, F.when(store_only, expr).otherwise(F.col(name))
            )
    return picked.select(*key_cols, *data_cols)


# --- Delta swap-in seam ------------------------------------------------------
#
# On a real deployment the apply target is a transactional table format
# (Delta/Iceberg), and the two merge functions above become MERGE INTO
# statements executed by the table format's engine. These renderers emit
# that exact SQL so the swap is a one-line backend change, and the golden
# tests (tests/test_merge_sql_render.py) pin the statement text — the
# contract a Delta target would execute — without needing delta-spark in
# this container. Reference analog: the stdout sink (log2sql.py:14),
# whose real-world meaning is "apply this SQL to a table".


def _q(name: str) -> str:
    return f"`{name}`"


def render_merge_into_sql(
    target_table: str,
    source_view: str,
    key_cols: list[str] | str,
    data_cols: list[str],
    version_cols: list[str] | str,
    op_col: str = "op",
    delete_op: str = "delete",
) -> str:
    """Render the Delta ``MERGE INTO`` equivalent of :func:`merge_into`.

    The latest-change-per-key pick rides INSIDE the USING subquery
    (``row_number`` over the version order) because Delta requires the
    merge source to match each target row at most once — feeding the
    raw change feed would abort with a duplicate-source-row error.
    Clause order matters and is part of the golden contract: the
    delete-matched clause precedes update-matched (first match wins in
    SQL MERGE), mirroring ``merge_into``'s op precedence.
    """
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    version_cols = (
        [version_cols] if isinstance(version_cols, str) else list(version_cols)
    )
    on = " AND ".join(f"t.{_q(k)} = s.{_q(k)}" for k in key_cols)
    part = ", ".join(_q(k) for k in key_cols)
    order = ", ".join(f"{_q(v)} DESC" for v in version_cols)
    sets = ", ".join(f"t.{_q(c)} = s.{_q(c)}" for c in data_cols)
    all_cols = key_cols + data_cols
    ins_cols = ", ".join(_q(c) for c in all_cols)
    ins_vals = ", ".join(f"s.{_q(c)}" for c in all_cols)
    return (
        f"MERGE INTO {target_table} AS t\n"
        f"USING (\n"
        f"  SELECT * FROM (\n"
        f"    SELECT *, row_number() OVER (PARTITION BY {part} ORDER BY {order}) AS _rn\n"
        f"    FROM {source_view}\n"
        f"  ) WHERE _rn = 1\n"
        f") AS s\n"
        f"ON {on}\n"
        f"WHEN MATCHED AND s.{_q(op_col)} = '{delete_op}' THEN DELETE\n"
        f"WHEN MATCHED THEN UPDATE SET {sets}\n"
        f"WHEN NOT MATCHED AND s.{_q(op_col)} <> '{delete_op}' THEN\n"
        f"  INSERT ({ins_cols}) VALUES ({ins_vals})"
    )


def render_merge_full_sync_sql(
    target_table: str,
    source_view: str,
    key_cols: list[str] | str,
    data_cols: list[str],
    not_matched_by_source: str = "delete",
    set_exprs: dict[str, str] | None = None,
) -> str:
    """Render the 3-clause Delta ``MERGE INTO`` equivalent of
    :func:`merge_full_sync`, including ``WHEN NOT MATCHED BY SOURCE``
    (the clause Delta added in 2.3 for full-snapshot reconciliation).
    ``not_matched_by_source``: ``"delete"`` emits the DELETE clause,
    ``"update"`` emits UPDATE SET from ``set_exprs`` (SQL expression
    strings, e.g. ``{"is_active": "false"}``), ``"keep"`` omits the
    clause — absent clause == rows untouched, exactly Delta semantics.
    """
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not_matched_by_source not in ("delete", "keep", "update"):
        raise ValueError(f"unknown action: {not_matched_by_source!r}")
    if not_matched_by_source == "update" and not set_exprs:
        raise ValueError("action 'update' needs set_exprs")
    on = " AND ".join(f"t.{_q(k)} = s.{_q(k)}" for k in key_cols)
    sets = ", ".join(f"t.{_q(c)} = s.{_q(c)}" for c in data_cols)
    all_cols = key_cols + data_cols
    ins_cols = ", ".join(_q(c) for c in all_cols)
    ins_vals = ", ".join(f"s.{_q(c)}" for c in all_cols)
    sql = (
        f"MERGE INTO {target_table} AS t\n"
        f"USING {source_view} AS s\n"
        f"ON {on}\n"
        f"WHEN MATCHED THEN UPDATE SET {sets}\n"
        f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
    )
    if not_matched_by_source == "delete":
        sql += "\nWHEN NOT MATCHED BY SOURCE THEN DELETE"
    elif not_matched_by_source == "update":
        assert set_exprs is not None
        nm_sets = ", ".join(f"t.{_q(c)} = {e}" for c, e in set_exprs.items())
        sql += f"\nWHEN NOT MATCHED BY SOURCE THEN UPDATE SET {nm_sets}"
    return sql


def execute_merge(
    spark,
    changes: DataFrame,
    target_table: str,
    key_cols: list[str] | str,
    version_cols: list[str] | str,
    backend: str = "snapshot",
    store=None,
    op_col: str = "op",
    delete_op: str = "delete",
) -> str | None:
    """The backend seam: one call site, two targets.

    ``backend="snapshot"`` (default) applies via the snapshot store's
    merge (unchanged path — ``store`` is the SnapshotStore). With
    ``backend="delta"`` the changes register as a temp view and the
    rendered ``MERGE INTO`` executes against ``target_table`` — which
    requires a Delta (or other row-level-op DSv2) table; in this
    container, where no such catalog exists, the statement is rendered
    and returned but executing it raises the analyzer's table error,
    so the call is env-gated by the caller. Returns the SQL text for
    the delta backend (for logging/audit), None for snapshot."""
    if backend == "snapshot":
        if store is None:
            raise ValueError("snapshot backend needs store=")
        store.merge(spark, changes, key_cols=key_cols, version_cols=version_cols)
        return None
    if backend != "delta":
        raise ValueError(f"unknown backend: {backend!r}")
    key_list = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    version_list = (
        [version_cols] if isinstance(version_cols, str) else list(version_cols)
    )
    data_cols = [
        c
        for c in changes.columns
        if c not in key_list and c != op_col and c not in version_list
    ]
    # Per-call unique view name: a fixed name would let two merges in
    # flight on the same SparkSession (e.g. two foreachBatch sinks)
    # clobber each other's view between createOrReplaceTempView and
    # spark.sql, merging the wrong batch into a target.
    view = f"_merge_changes_{uuid.uuid4().hex}"
    changes.createOrReplaceTempView(view)
    try:
        sql = render_merge_into_sql(
            target_table,
            view,
            key_list,
            data_cols,
            version_list,
            op_col=op_col,
            delete_op=delete_op,
        )
        spark.sql(sql)
    finally:
        spark.catalog.dropTempView(view)
    return sql
