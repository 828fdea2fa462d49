"""Table catalog: (db, table) → column names + key columns.

The reference resolves ``@N`` ordinals to column names with a live
``information_schema.columns`` query **per event** (``log2sql.py:29-46``
— an N+1 network round-trip), with a unique-index fallback when no
primary key exists (``log2sql.py:39-46``). Here the catalog is loaded
**once** into a small DataFrame and broadcast-joined to the event
stream: at 100 TB of events the catalog is still a few thousand rows,
so the join never shuffles the fact side.

Catalog sources:

* :func:`catalog_from_dict` — in-memory spec (tests, config files);
* :func:`catalog_from_json` — JSON file with the same shape;
* :func:`catalog_from_jdbc` — a single JDBC read of
  ``information_schema.columns`` + ``statistics`` (requires a reachable
  MySQL and a JDBC driver jar; import-gated, not exercised in CI).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CATALOG_SCHEMA = T.StructType(
    [
        T.StructField("db", T.StringType(), False),
        T.StructField("table", T.StringType(), False),
        # Column names in ordinal order (1-based ordinal = array index + 1).
        T.StructField("columns", T.ArrayType(T.StringType()), False),
        # Primary-key column names; if the table has none, the first
        # unique index's columns (the reference's fallback) — may be empty.
        T.StructField("key_columns", T.ArrayType(T.StringType()), False),
    ]
)


def catalog_from_dict(spark: SparkSession, spec: dict) -> DataFrame:
    """Build a catalog DataFrame from ``{"db.table": {"columns": [...],
    "key_columns": [...]}}``.

    Rendered as a SQL ``VALUES`` literal (a JVM LocalRelation) via
    :func:`~log2sql_spark.localrel.values_df`, not
    ``createDataFrame(rows)``: the latter plans as a pickled Python RDD
    (``Scan ExistingRDD``), so every execution that broadcasts the
    catalog first runs a Python-worker job just to deserialize these few
    rows — measurable fixed overhead on every CDC query execution."""
    from log2sql_spark.localrel import values_df

    rows = []
    for qualified, info in spec.items():
        db, _, table = qualified.partition(".")
        rows.append(
            (db, table, list(info["columns"]), list(info.get("key_columns", [])))
        )
    return values_df(
        spark,
        rows,
        "db string, table string, columns array<string>, key_columns array<string>",
    )


def catalog_from_json(spark: SparkSession, path: str) -> DataFrame:
    with open(path) as fh:
        return catalog_from_dict(spark, json.load(fh))


def catalog_from_jdbc(spark: SparkSession, url: str, properties: dict | None = None) -> DataFrame:
    """One-shot JDBC catalog load (replaces the reference's per-event
    queries at log2sql.py:29-46 with two reads total).

    The JDBC reads are the only untestable part in this sandbox (no
    MySQL server / driver jar); the whole transform lives in
    :func:`catalog_from_information_schema` and is contract-tested with
    synthetic ``information_schema`` DataFrames.
    """
    properties = properties or {}
    cols = spark.read.jdbc(url, "information_schema.columns", properties=properties)
    stats = spark.read.jdbc(url, "information_schema.statistics", properties=properties)
    return catalog_from_information_schema(cols, stats)


def catalog_from_information_schema(cols: DataFrame, stats: DataFrame) -> DataFrame:
    """``information_schema.columns`` + ``.statistics`` → catalog rows.

    Primary keys come from ``COLUMN_KEY='PRI'`` (reference
    log2sql.py:34-36); tables without one fall back to the columns of
    ONE unique index, mirroring the reference's STATISTICS subquery
    (log2sql.py:39-46) — the reference takes an unordered ``LIMIT 1``,
    here the first index *by name* so the choice is deterministic.
    Tables with neither get an empty ``key_columns`` array.
    """
    from pyspark.sql import Window as W

    base = (
        cols.select(
            F.col("TABLE_SCHEMA").alias("db"),
            F.col("TABLE_NAME").alias("table"),
            F.col("COLUMN_NAME").alias("column_name"),
            F.col("ORDINAL_POSITION").cast("int").alias("ordinal"),
            (F.col("COLUMN_KEY") == "PRI").alias("is_pk"),
        )
    )
    columns = (
        base.groupBy("db", "table")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ordinal", "column_name"))
            ).alias("ordered"),
        )
        .select(
            "db",
            "table",
            F.transform("ordered", lambda s: s["column_name"]).alias("columns"),
        )
    )
    pks = (
        base.filter("is_pk")
        .groupBy("db", "table")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ordinal", "column_name"))),
                lambda s: s["column_name"],
            ).alias("pk_columns")
        )
    )
    first_unique = (
        stats.filter(F.col("NON_UNIQUE") == 0)
        .select(
            F.col("TABLE_SCHEMA").alias("db"),
            F.col("TABLE_NAME").alias("table"),
            F.col("INDEX_NAME").alias("index_name"),
            F.col("SEQ_IN_INDEX").cast("int").alias("seq"),
            F.col("COLUMN_NAME").alias("column_name"),
        )
        .withColumn(
            "idx_rank",
            F.dense_rank().over(W.partitionBy("db", "table").orderBy("index_name")),
        )
        .filter(F.col("idx_rank") == 1)
        .groupBy("db", "table")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seq", "column_name"))),
                lambda s: s["column_name"],
            ).alias("uniq_columns")
        )
    )
    return (
        columns.join(pks, ["db", "table"], "left")
        .join(first_unique, ["db", "table"], "left")
        .select(
            "db",
            "table",
            "columns",
            F.coalesce("pk_columns", "uniq_columns", F.array().cast("array<string>")).alias(
                "key_columns"
            ),
        )
    )


def resolve_columns(envelope: DataFrame, catalog: DataFrame) -> DataFrame:
    """Ordinal-keyed images → column-named images via broadcast join.

    ``before``/``after`` arrive keyed by ordinal ("1", "2", …); the
    catalog names them. Unknown (db, table) pairs keep ordinal keys as
    ``@N`` (left join — events never get dropped by catalog gaps).
    All map surgery is JVM-side (`transform`/`map_from_entries`), no UDF.
    """

    def rename(col: str):
        return F.when(
            F.col(col).isNull(), F.lit(None).cast("map<string,string>")
        ).otherwise(
            F.map_from_entries(
                F.transform(
                    F.map_entries(F.col(col)),
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

    return (
        envelope.join(F.broadcast(catalog), ["db", "table"], "left")
        .withColumn("before", rename("before"))
        .withColumn("after", rename("after"))
        .withColumn(
            "key_columns",
            F.coalesce("key_columns", F.array().cast("array<string>")),
        )
        .drop("columns")
    )


def split_catalog_misses(
    envelope: DataFrame, catalog: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Dead-letter split: ``(resolvable, quarantined)``.

    :func:`resolve_columns` deliberately never drops an event — an
    unknown (db, table) keeps ordinal ``@N`` keys so nothing vanishes
    silently. But LETTING those rows flow onward is its own failure
    mode: replay codegen renders ``@1`` column names (SQL no target
    accepts) and the keyed store apply derives a NULL key, merging
    every rogue-table row into one phantom record. Production CDC
    pipelines route them to a QUARANTINE instead (Debezium's
    dead-letter topic, DLT's expectations): this split diverts
    non-DDL events whose (db, table) misses the catalog into a reject
    frame carrying a machine-readable ``reason``, and passes DDL
    straight through (DDL is db-scoped passthrough by design,
    reference log2sql.py:13-14 — a catalog miss is not an error for
    it). One broadcast semi/anti-join pair on the tiny catalog; the
    event stream is scanned once per side and never shuffled."""
    keys = catalog.select("db", "table").distinct()
    hit = F.broadcast(keys.withColumn("_cat_hit", F.lit(1)))
    tagged = envelope.join(hit, ["db", "table"], "left")
    ok = (F.col("_cat_hit").isNotNull()) | (F.col("op") == "ddl")
    resolvable = tagged.filter(ok).drop("_cat_hit")
    quarantined = (
        tagged.filter(~ok)
        .drop("_cat_hit")
        .withColumn(
            # coalesce each part: F.concat would yield NULL for a NULL
            # db/table — exactly the most malformed events would lose
            # their machine-readable reason in the dead-letter sink
            "reason",
            F.concat(
                F.lit("unknown_table: no catalog entry for "),
                F.coalesce(F.col("db"), F.lit("<null>")),
                F.lit("."),
                F.coalesce(F.col("table"), F.lit("<null>")),
            ),
        )
    )
    return resolvable, quarantined
