"""Schema evolution: a position-versioned catalog from in-stream DDL.

The reference queries ``information_schema`` per event (``log2sql.py:29-46``),
so it always sees the *current* schema — its one advantage over a static
broadcast catalog: a dump containing ``ALTER TABLE … ADD COLUMN`` mid-stream
resolves later events against the evolved schema. This module restores
that with engine design instead of N+1 lookups:

1. DDL events in the envelope (``op='ddl'``) are parsed for
   ``ALTER TABLE … ADD COLUMN`` statements;
2. each produces a new catalog *version* valid from that event's
   ``start_pos``;
3. DML events resolve against the version in force at their position —
   an as-of join of events to catalog versions on (db, table) by
   position, built from one window over the union (the same
   single-shuffle as-of pattern as ``operators/asof.py``).

Only ADD COLUMN evolves the ordinal map (mysqlbinlog ordinals are
append-only for it); DROP/MODIFY would need table-id tracking the text
dump doesn't carry — documented limitation, matching what the text
format itself can express.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_ADD_COL_RE = (
    r"(?is)alter\s+table\s+`?(?:(\w+)`?\.`?)?(\w+)`?\s+add\s+(?:column\s+)?`?(\w+)`?"
)


def ddl_catalog_deltas(envelope: DataFrame) -> DataFrame:
    """DDL events → (db, table, added_column, file, start_pos) rows.

    The file is part of the validity key: binlog positions restart per
    file, and sequentially-named dump files (mysql-bin.00000N) sort in
    arrival order, so (file, start_pos) is the global event order."""
    ddl = envelope.filter(F.col("op") == "ddl")
    return (
        ddl.select(
            "file",
            "start_pos",
            F.coalesce(
                F.regexp_extract("statement", _ADD_COL_RE, 1), F.lit("")
            ).alias("stmt_db"),
            F.col("db").alias("ctx_db"),
            F.regexp_extract("statement", _ADD_COL_RE, 2).alias("table"),
            F.regexp_extract("statement", _ADD_COL_RE, 3).alias("added_column"),
        )
        .filter(F.col("added_column") != "")
        .select(
            F.when(F.col("stmt_db") != "", F.col("stmt_db"))
            .otherwise(F.col("ctx_db"))
            .alias("db"),
            "table",
            "added_column",
            "file",
            "start_pos",
        )
    )


def versioned_catalog(base_catalog: DataFrame, deltas: DataFrame) -> DataFrame:
    """Base catalog + ADD COLUMN deltas → versions with ``valid_from_pos``.

    Version 0 (the base schema) is valid from position -1; each delta
    appends its column to every earlier version's column list via a
    running collect over the (db, table) window — one shuffle."""
    base = base_catalog.select(
        "db", "table", "columns", "key_columns",
        F.lit("").alias("valid_from_file"),
        F.lit(-1).cast("long").alias("valid_from_pos"),
    )
    if deltas.isEmpty():
        return base
    w = (
        W.partitionBy("db", "table")
        .orderBy("file", "start_pos")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    evolved = (
        deltas.withColumn("added_so_far", F.collect_list("added_column").over(w))
        .join(base_catalog.select("db", "table", "columns", "key_columns"), ["db", "table"])
        .select(
            "db",
            "table",
            F.concat("columns", "added_so_far").alias("columns"),
            "key_columns",
            F.col("file").alias("valid_from_file"),
            F.col("start_pos").alias("valid_from_pos"),
        )
    )
    return base.unionByName(evolved)


def resolve_columns_versioned(envelope: DataFrame, catalog_versions: DataFrame) -> DataFrame:
    """Resolve each event against the catalog version in force at its
    position: as-of join on (db, table) by start_pos (union + window —
    single shuffle, same pattern as operators/asof.py), then the usual
    ordinal→name map rebuild."""
    ev = (
        envelope.withColumn("_side", F.lit(1))
        .withColumn("_file", F.col("file"))
        .withColumn("_pos", F.col("start_pos").cast("long"))
    )
    cat = catalog_versions.select(
        "db",
        "table",
        F.lit(0).alias("_side"),
        F.col("valid_from_file").alias("_file"),
        F.col("valid_from_pos").alias("_pos"),
        F.col("columns").alias("_cat_columns"),
        F.col("key_columns").alias("_cat_keys"),
    )
    ev_cols = [c for c in envelope.columns]
    both = ev.select(
        "db", "table", "_side", "_file", "_pos",
        F.struct(*ev_cols).alias("_ev"),
        F.lit(None).cast("array<string>").alias("_cat_columns"),
        F.lit(None).cast("array<string>").alias("_cat_keys"),
    ).unionByName(
        cat.select(
            "db", "table", "_side", "_file", "_pos",
            F.lit(None).cast(
                ev.select(F.struct(*ev_cols).alias("s")).schema["s"].dataType.simpleString()
            ).alias("_ev"),
            "_cat_columns", "_cat_keys",
        )
    )
    w = (
        W.partitionBy("db", "table")
        .orderBy("_file", "_pos", "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = both.select(
        "_side",
        "_ev",
        F.last("_cat_columns", ignorenulls=True).over(w).alias("columns"),
        F.last("_cat_keys", ignorenulls=True).over(w).alias("key_columns"),
    ).filter(F.col("_side") == 1)

    def rename(path: str):
        img = F.col(f"_ev.{path}")
        return F.when(img.isNull(), F.lit(None).cast("map<string,string>")).otherwise(
            F.map_from_entries(
                F.transform(
                    F.map_entries(img),
                    lambda e: F.struct(
                        F.coalesce(
                            F.element_at(F.col("columns"), e["key"].cast("int")),
                            F.concat(F.lit("@"), e["key"]),
                        ).alias("key"),
                        e["value"].alias("value"),
                    ),
                )
            )
        )

    out_cols = [F.col(f"_ev.{c}").alias(c) for c in ev_cols if c not in ("before", "after")]
    return carried.select(
        *out_cols,
        rename("before").alias("before"),
        rename("after").alias("after"),
        F.coalesce("key_columns", F.array().cast("array<string>")).alias("key_columns"),
    )
