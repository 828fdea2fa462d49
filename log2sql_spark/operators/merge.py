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
