"""Oracle-checked CDC queries (reference surface R1–R13, SURVEY.md §2.1).

Each query synthesizes a mysqlbinlog -vv dump *from the driver's orders
table* (deterministic row-by-row rendering), runs the full Spark
pipeline — text scan → event segmentation → catalog broadcast-join →
filter → replay/flashback codegen — and returns the rendered SQL. The
DuckDB oracle reconstructs the expected statements from the same orders
rows by independent string concatenation, so parser, catalog resolution
and codegen are all cross-checked against real data.

Money is carried as integer cents (``o_totalprice_cents``) so every
token the two engines render is integer/string — no float-formatting
ambiguity in the compare.
"""

from __future__ import annotations

import os

from log2sql_spark.scratch import scratch_dir

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from log2sql_spark.cdc import binlog_to_sql
from log2sql_spark.registry import query
from log2sql_spark.sources.binlog_fixture import render_binlog
from log2sql_spark.sources.catalog import catalog_from_dict

_ORDER_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice_cents",
    "o_orderdate",
    "o_orderpriority",
]
_CATALOG_SPEC = {
    "shop.orders": {"columns": _ORDER_COLS, "key_columns": ["o_orderkey"]}
}
_KEY_MAX = 2000  # orders subset: o_orderkey <= 2000 (~2k rows at sf0.01)


_SUBSET_CACHE: dict[str, list] = {}


def _orders_subset(spark: SparkSession, sf_dir: str):
    """Deterministic fixture rows (bounded, test-scale scaffolding — not
    the data path, which stays fully distributed). Read driver-side with
    DuckDB: no Spark job for fixture generation, ~2s saved per cold
    session. Cached per sf_dir across the five CDC queries."""
    if sf_dir not in _SUBSET_CACHE:
        import duckdb

        pdf = duckdb.connect().execute(
            f"""
            SELECT *, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
            FROM '{sf_dir}/orders.parquet'
            WHERE o_orderkey <= {_KEY_MAX}
            ORDER BY o_orderkey
            """
        ).fetchdf()
        _SUBSET_CACHE[sf_dir] = [row._asdict() for row in pdf.itertuples(index=False)]
    return _SUBSET_CACHE[sf_dir]


def _row_tokens(r) -> list[tuple[int, str]]:
    return [
        (1, str(r["o_orderkey"])),
        (2, str(r["o_custkey"])),
        (3, f"'{r['o_orderstatus']}'"),
        (4, str(r["cents"])),
        (5, f"'{r['o_orderdate'].strftime('%Y-%m-%d %H:%M:%S')}'"),
        (6, f"'{r['o_orderpriority']}'"),
    ]


_DUMP_CACHE: dict[str, str] = {}


def _write_dump(events: list[dict]) -> str:
    """Render events to a dump file once per distinct content: repeated
    invocations (bench best-of-N, oracle re-checks) reuse the file, so
    fixture synthesis never rides inside a measured execution."""
    text = render_binlog(events)
    key = f"{len(text)}:{hash(text)}"
    if key not in _DUMP_CACHE:
        d = scratch_dir("log2sql_fixture_")
        path = os.path.join(d, "mysql-bin.000001.txt")
        with open(path, "w") as fh:
            fh.write(text)
        _DUMP_CACHE[key] = path
    return _DUMP_CACHE[key]


# Shared oracle fragments ---------------------------------------------------

_ORACLE_BASE = f"""
    WITH src AS (
      SELECT *,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) AS rn
      FROM orders WHERE o_orderkey <= {_KEY_MAX}
    )
"""

_VALUES_EXPR = (
    "o_orderkey || ', ' || o_custkey || ', ''' || o_orderstatus || ''', ' || cents"
    " || ', ''' || strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') || ''', '''"
    " || o_orderpriority || ''''"
)

_COL_LIST = "`o_orderkey`, `o_custkey`, `o_orderstatus`, `o_totalprice_cents`, `o_orderdate`, `o_orderpriority`"


@query(
    "cdc_insert_replay",
    oracle=_ORACLE_BASE
    + f"""
    SELECT 4 + 120 * (rn - 1) AS start_pos,
           4 + 120 * rn AS stop_pos,
           'INSERT INTO `shop`.`orders`({_COL_LIST}) VALUES (' || {_VALUES_EXPR} || ');' AS sql_text
    FROM src
    ORDER BY start_pos
    """,
)
def cdc_insert_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT events → replay SQL (R1,R2,R4,R5,R6,R8,R12 end-to-end)."""
    rows = _orders_subset(spark, sf_dir)
    events = [
        {
            "op": "insert",
            "db": "shop",
            "table": "orders",
            "ts": r["o_orderdate"],
            "values": _row_tokens(r),
        }
        for r in rows
    ]
    path = _write_dump(events)
    cat = catalog_from_dict(spark, _CATALOG_SPEC)
    return binlog_to_sql(spark, path, cat).select("start_pos", "stop_pos", "sql_text")


@query(
    "cdc_split_parse_replay",
    oracle=_ORACLE_BASE
    + f"""
    SELECT 4 + 120 * (rn - 1) AS start_pos,
           4 + 120 * rn AS stop_pos,
           'INSERT INTO `shop`.`orders`({_COL_LIST}) VALUES (' || {_VALUES_EXPR} || ');' AS sql_text
    FROM src
    ORDER BY start_pos
    """,
)
def cdc_split_parse_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same end-to-end replay as ``cdc_insert_replay`` but through the
    intra-file PARALLEL scan (``read_binlog_split``, 16 KiB chunks →
    ~40 tasks over one file): proves the chunked reader's event
    stitching (boundary alignment, event_seq prefix-sum, `use` carry)
    is invisible to the rest of the pipeline — identical oracle."""
    rows = _orders_subset(spark, sf_dir)
    events = [
        {
            "op": "insert",
            "db": "shop",
            "table": "orders",
            "ts": r["o_orderdate"],
            "values": _row_tokens(r),
        }
        for r in rows
    ]
    path = _write_dump(events)
    cat = catalog_from_dict(spark, _CATALOG_SPEC)
    return binlog_to_sql(spark, path, cat, split_chunk_bytes=16_384).select(
        "start_pos", "stop_pos", "sql_text"
    )


@query(
    "cdc_delete_replay_keyed",
    oracle=_ORACLE_BASE
    + """
    SELECT 4 + 120 * (rn - 1) AS start_pos,
           'DELETE FROM `shop`.`orders` WHERE `o_orderkey`=' || o_orderkey || ' LIMIT 1;' AS sql_text
    FROM src
    ORDER BY start_pos
    """,
)
def cdc_delete_replay_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE events carry the full row image but the rendered WHERE uses
    only the key image (key preference, log2sql.py:169-172 ↔ R7/R12)."""
    rows = _orders_subset(spark, sf_dir)
    events = [
        {
            "op": "delete",
            "db": "shop",
            "table": "orders",
            "ts": r["o_orderdate"],
            "values": _row_tokens(r),
        }
        for r in rows
    ]
    path = _write_dump(events)
    cat = catalog_from_dict(spark, _CATALOG_SPEC)
    return binlog_to_sql(spark, path, cat).select("start_pos", "sql_text")


@query(
    "cdc_update_flashback",
    oracle=_ORACLE_BASE
    + """
    SELECT 4 + 120 * (rn - 1) AS start_pos,
           'UPDATE `shop`.`orders` SET `o_orderkey`=' || o_orderkey
             || ', `o_totalprice_cents`=' || cents
             || ' WHERE `o_orderkey`=' || o_orderkey || ' LIMIT 1;' AS sql_text,
           CAST(count(*) OVER () - rn AS BIGINT) AS apply_rank
    FROM src
    ORDER BY start_pos
    """,
)
def cdc_update_flashback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE events (+500 cents) → flashback SQL restoring the original
    amount, in reverse position order (fixes README.md:23-27).
    ``apply_rank`` encodes the reverse ordering so the order-insensitive
    hash still verifies it. The output is a serial rollback script, so
    a TOTAL apply order is semantic — but the rank is computed
    DISTRIBUTED (r14): per-128KiB-block row_number + cumulative block
    offsets over |log bytes / 128KiB| (block, count) pairs, never a
    single-task sort over the events themselves (positions are unique
    byte offsets, so no tie-break is needed)."""
    rows = _orders_subset(spark, sf_dir)
    events = [
        {
            "op": "update",
            "db": "shop",
            "table": "orders",
            "ts": r["o_orderdate"],
            "before": [(1, str(r["o_orderkey"])), (4, str(r["cents"]))],
            "after": [(1, str(r["o_orderkey"])), (4, str(r["cents"] + 500))],
        }
        for r in rows
    ]
    path = _write_dump(events)
    cat = catalog_from_dict(spark, _CATALOG_SPEC)
    # ordered=False: the apply order is ENCODED in apply_rank (computed
    # from start_pos values), so the flashback presentation sort would
    # be a dead range exchange + a sampling pass re-reading the cache —
    # the rank operator's aggregate/join consumers don't see row order.
    df = binlog_to_sql(spark, path, cat, flashback=True, ordered=False)
    from log2sql_spark.operators.ranks import distributed_global_rank

    return (
        distributed_global_rank(
            df,
            "start_pos",
            [],
            descending=True,
            coarse=F.floor(F.col("start_pos") / 131072),
            out="__r",
        )
        .select(
            "start_pos",
            "sql_text",
            (F.col("__r") - 1).cast("long").alias("apply_rank"),
        )
    )


@query(
    "cdc_store_pruned_read",
    oracle=_ORACLE_BASE
    + """
    SELECT CASE WHEN o_orderkey % 3 = 1 THEN 'insert' ELSE 'update' END AS op,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(min(o_orderkey) AS BIGINT) AS min_key
    FROM src
    WHERE o_orderkey % 3 <> 0
    GROUP BY 1
    ORDER BY op
    """,
)
def cdc_store_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Envelope store round trip: parse a mixed dump, land it as
    (db, table, op)-partitioned parquet, read back with op filters that
    become *partition pruning* (tests/test_plans.py asserts the
    PartitionFilters in the plan). The at-scale layout for the
    reference's db/table/type filters (log2sql.py:59-61)."""
    from log2sql_spark.sources.binlog import read_binlog
    from log2sql_spark.sources.cdc_store import read_envelope_store, write_envelope_store

    rows = _orders_subset(spark, sf_dir)
    events = []
    for r in rows:
        k = r["o_orderkey"] % 3
        base = {"db": "shop", "table": "orders", "ts": r["o_orderdate"]}
        if k == 0:
            events.append({**base, "op": "delete", "values": _row_tokens(r)})
        elif k == 1:
            events.append({**base, "op": "insert", "values": _row_tokens(r)})
        else:
            events.append(
                {
                    **base,
                    "op": "update",
                    "before": [(1, str(r["o_orderkey"]))],
                    "after": [(1, str(r["o_orderkey"]))],
                }
            )
    path = _write_dump(events)
    store = scratch_dir("log2sql_store_")
    write_envelope_store(read_binlog(spark, path), store, mode="overwrite")
    pruned = read_envelope_store(spark, store, sql_types=["insert", "update"])
    return (
        pruned.groupBy("op")
        .agg(
            F.count("*").alias("n_events"),
            F.min(F.element_at(F.coalesce("after", "before"), "1").cast("long")).alias("min_key"),
        )
        .orderBy("op")
    )


@query(
    "cdc_typed_roundtrip",
    oracle=_ORACLE_BASE
    + """
    SELECT 'insert' AS op, o_orderkey, o_custkey, o_orderstatus,
           cents AS o_totalprice_cents, o_orderdate, o_orderpriority
    FROM src
    ORDER BY o_orderkey
    """,
)
def cdc_typed_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """typed_view round trip (SURVEY.md §1.2): orders → binlog text →
    envelope → typed columns, compared against the original table. The
    strongest CDC statement: parsing + catalog + untokenize + casts must
    all be lossless for the hash to match."""
    from log2sql_spark.operators.cdc_typed import typed_view
    from log2sql_spark.sources.binlog import read_binlog
    from log2sql_spark.sources.catalog import resolve_columns

    rows = _orders_subset(spark, sf_dir)
    events = [
        {
            "op": "insert",
            "db": "shop",
            "table": "orders",
            "ts": r["o_orderdate"],
            "values": _row_tokens(r),
        }
        for r in rows
    ]
    path = _write_dump(events)
    cat = catalog_from_dict(spark, _CATALOG_SPEC)
    resolved = resolve_columns(read_binlog(spark, path), cat)
    typed = typed_view(
        resolved,
        {
            "o_orderkey": "bigint",
            "o_custkey": "bigint",
            "o_orderstatus": "string",
            "o_totalprice_cents": "bigint",
            "o_orderdate": "timestamp",
            "o_orderpriority": "string",
        },
    )
    return typed.select(
        "op", "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice_cents", "o_orderdate", "o_orderpriority",
    ).orderBy("o_orderkey")


@query(
    "cdc_schema_evolution",
    oracle=_ORACLE_BASE
    + """
    SELECT o_orderkey,
           CASE WHEN o_orderkey > 1000 THEN CAST(o_orderkey * 2 AS VARCHAR) END AS extra_val,
           CASE WHEN o_orderkey > 1000 THEN 7 ELSE 6 END AS n_cols
    FROM src
    ORDER BY o_orderkey
    """,
)
def cdc_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mid-stream ALTER TABLE ADD COLUMN: events before the DDL resolve
    against the 6-column schema, events after it against 7 — via the
    position-versioned catalog + as-of resolution (restores the dynamic
    -schema behavior the reference gets from per-event
    information_schema lookups, without the N+1 round-trips)."""
    from log2sql_spark.sources.binlog import read_binlog
    from log2sql_spark.sources.catalog_evolution import (
        ddl_catalog_deltas,
        resolve_columns_versioned,
        versioned_catalog,
    )

    rows = _orders_subset(spark, sf_dir)
    events = []
    for r in rows:
        if r["o_orderkey"] <= 1000:
            events.append(
                {"op": "insert", "db": "shop", "table": "orders",
                 "ts": r["o_orderdate"], "values": _row_tokens(r)}
            )
    events.append(
        {"op": "ddl", "db": "shop", "table": None, "ts": rows[0]["o_orderdate"],
         "statement": "ALTER TABLE orders ADD COLUMN extra VARCHAR(30)"}
    )
    for r in rows:
        if r["o_orderkey"] > 1000:
            events.append(
                {"op": "insert", "db": "shop", "table": "orders",
                 "ts": r["o_orderdate"],
                 "values": _row_tokens(r) + [(7, str(r["o_orderkey"] * 2))]}
            )
    path = _write_dump(events)
    base = catalog_from_dict(spark, _CATALOG_SPEC)
    envelope = read_binlog(spark, path)
    resolved = resolve_columns_versioned(
        envelope, versioned_catalog(base, ddl_catalog_deltas(envelope))
    )
    return (
        resolved.filter(F.col("op") == "insert")
        .select(
            F.element_at("after", "o_orderkey").cast("long").alias("o_orderkey"),
            F.element_at("after", "extra").alias("extra_val"),
            F.size(F.map_keys(F.col("after"))).alias("n_cols"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "cdc_scd2_history",
    oracle=_ORACLE_BASE
    + """
    , versions AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS key, 'insert' AS version_op,
             o_orderdate AS valid_from, cents AS version_cents
      FROM src
      UNION ALL
      SELECT CAST(o_orderkey AS VARCHAR), 'update',
             o_orderdate + INTERVAL 1 SECOND, cents + 500
      FROM src
      UNION ALL
      SELECT CAST(o_orderkey AS VARCHAR), 'update',
             o_orderdate + INTERVAL 2 SECOND, cents + 1000
      FROM src
    )
    SELECT key, version_op, valid_from,
           lead(valid_from) OVER (PARTITION BY key ORDER BY valid_from) AS valid_to,
           (lead(valid_from) OVER (PARTITION BY key ORDER BY valid_from) IS NULL) AS is_current,
           version_cents
    FROM versions
    ORDER BY key, valid_from
    """,
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 from CDC: insert + two updates per order become three
    versioned rows with validity intervals; the latest is current. One
    window over the key — the warehouse history-table build."""
    from datetime import timedelta

    from log2sql_spark.operators.cdc_scd2 import scd2_history
    from log2sql_spark.sources.binlog import read_binlog
    from log2sql_spark.sources.catalog import resolve_columns

    rows = _orders_subset(spark, sf_dir)
    events = []
    for r in rows:
        base = {"db": "shop", "table": "orders", "ts": r["o_orderdate"]}
        key = str(r["o_orderkey"])
        events.append({**base, "op": "insert",
                       "values": [(1, key), (4, str(r["cents"]))]})
        events.append({**base, "op": "update", "ts": r["o_orderdate"] + timedelta(seconds=1),
                       "before": [(1, key), (4, str(r["cents"]))],
                       "after": [(1, key), (4, str(r["cents"] + 500))]})
        events.append({**base, "op": "update", "ts": r["o_orderdate"] + timedelta(seconds=2),
                       "before": [(1, key), (4, str(r["cents"] + 500))],
                       "after": [(1, key), (4, str(r["cents"] + 1000))]})
    path = _write_dump(events)
    cat = catalog_from_dict(spark, _CATALOG_SPEC)
    resolved = resolve_columns(read_binlog(spark, path), cat)
    hist = scd2_history(resolved, key_col="o_orderkey")
    return hist.select(
        "key",
        "version_op",
        "valid_from",
        "valid_to",
        "is_current",
        F.element_at("row_image", "o_totalprice_cents").cast("long").alias("version_cents"),
    ).orderBy("key", "valid_from")


@query(
    "cdc_filter_pushdown",
    oracle=_ORACLE_BASE
    + f"""
    SELECT CASE WHEN o_orderkey % 3 = 0 THEN 'delete'
                WHEN o_orderkey % 3 = 1 THEN 'insert'
                ELSE 'update' END AS op,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(min(4 + 120 * (rn - 1)) AS BIGINT) AS first_pos,
           CAST(max(4 + 120 * (rn - 1)) AS BIGINT) AS last_pos
    FROM src
    WHERE 4 + 120 * (rn - 1) >= 1204
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY 1
    ORDER BY op
    """,
)
def cdc_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-op dump + position/datetime/type filters (R9 + the range
    pushdown of R1), aggregated per op."""
    rows = _orders_subset(spark, sf_dir)
    events = []
    for r in rows:
        k = r["o_orderkey"] % 3
        base = {"db": "shop", "table": "orders", "ts": r["o_orderdate"]}
        if k == 0:
            events.append({**base, "op": "delete", "values": _row_tokens(r)})
        elif k == 1:
            events.append({**base, "op": "insert", "values": _row_tokens(r)})
        else:
            events.append(
                {
                    **base,
                    "op": "update",
                    "before": [(1, str(r["o_orderkey"])), (4, str(r["cents"]))],
                    "after": [(1, str(r["o_orderkey"])), (4, str(r["cents"] + 1))],
                }
            )
    path = _write_dump(events)
    cat = catalog_from_dict(spark, _CATALOG_SPEC)
    df = binlog_to_sql(
        spark,
        path,
        cat,
        start_position=1204,
        start_datetime="1996-01-01 00:00:00",
    )
    return (
        df.groupBy("op")
        .agg(
            F.count("*").alias("n_events"),
            F.min("start_pos").alias("first_pos"),
            F.max("start_pos").alias("last_pos"),
        )
        .orderBy("op")
    )


@query(
    "cdc_apply_final_state",
    oracle=_ORACLE_BASE
    + """
    SELECT CAST(o_orderkey AS VARCHAR) AS key,
           CASE WHEN o_orderkey % 3 = 0 THEN cents + 500 ELSE cents END AS cents
    FROM src
    WHERE o_orderkey % 5 <> 0
    ORDER BY key
    """,
)
def cdc_apply_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE materialization: a mixed insert/update/delete dump is
    replayed into final table state — newest image per key wins
    (ordered by file, start_pos, event_seq — the same ranking the
    streaming keyed-state apply uses), deletes drop the key. This is
    what ``DeltaTable.merge`` would compute; here it is one window over
    the parsed envelope. Every key is inserted; keys %3==0 get a +500
    update; keys %5==0 are deleted — the oracle rebuilds the surviving
    state arithmetically."""
    from pyspark.sql import Window as W

    from log2sql_spark.sources.binlog import read_binlog
    from log2sql_spark.sources.catalog import resolve_columns

    rows = _orders_subset(spark, sf_dir)
    events = []
    for r in rows:
        events.append(
            {"op": "insert", "db": "shop", "table": "orders",
             "ts": r["o_orderdate"], "values": _row_tokens(r)}
        )
    for r in rows:
        if r["o_orderkey"] % 3 == 0:
            events.append(
                {"op": "update", "db": "shop", "table": "orders",
                 "ts": r["o_orderdate"],
                 "before": [(1, str(r["o_orderkey"])), (4, str(r["cents"]))],
                 "after": [(1, str(r["o_orderkey"])), (4, str(r["cents"] + 500))]}
            )
    for r in rows:
        if r["o_orderkey"] % 5 == 0:
            events.append(
                {"op": "delete", "db": "shop", "table": "orders",
                 "ts": r["o_orderdate"],
                 "values": [(1, str(r["o_orderkey"]))]}
            )
    path = _write_dump(events)
    cat = catalog_from_dict(spark, _CATALOG_SPEC)
    resolved = resolve_columns(read_binlog(spark, path), cat)
    changes = resolved.select(
        F.element_at(F.coalesce("after", "before"), "o_orderkey").alias("key"),
        "op",
        "after",
        "file",
        "start_pos",
        "event_seq",
    )
    w = W.partitionBy("key").orderBy(
        F.desc("file"), F.desc("start_pos"), F.desc("event_seq")
    )
    return (
        changes.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .filter(F.col("op") != "delete")
        .select(
            "key",
            F.element_at("after", "o_totalprice_cents").cast("long").alias("cents"),
        )
        .orderBy("key")
    )


@query(
    "cdc_merge_upsert",
    oracle="""
    WITH src AS (
      SELECT CAST(o_orderkey AS BIGINT) AS key, o_orderstatus AS status,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey <= 2000
    )
    SELECT key, status, cents FROM src WHERE key % 3 = 2
    UNION ALL
    SELECT key,
           CASE WHEN key % 9 = 0 THEN 'U2' ELSE 'U1' END AS status,
           cents + CASE WHEN key % 9 = 0 THEN 2 ELSE 1 END AS cents
    FROM src WHERE key % 3 = 0
    UNION ALL
    SELECT key + 100000 AS key, 'N' AS status, cents FROM src WHERE key % 3 = 2
    ORDER BY key
    """,
)
def cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reusable MERGE INTO operator (operators/merge.py) against a
    real store: updates overwrite (and a second-version update outranks
    the first — version ordering, not arrival order), deletes drop the
    key, inserts land, untouched keys survive. One shuffle + one window;
    the oracle reconstructs the final state set-algebraically, a
    genuinely different formulation than the union-rank plan.
    (Reference analog: the applied replay SQL, log2sql.py:161-185.)"""
    from log2sql_spark.operators.merge import merge_into
    from log2sql_spark.sources.tables import load_table

    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_orderkey") <= _KEY_MAX)
    store = orders.select(
        F.col("o_orderkey").cast("long").alias("key"),
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    upd1 = store.filter(F.col("key") % 3 == 0).select(
        F.lit("update").alias("op"),
        "key",
        F.lit("U1").alias("status"),
        (F.col("cents") + 1).alias("cents"),
        F.lit(1).alias("version"),
    )
    upd2 = store.filter(F.col("key") % 9 == 0).select(
        F.lit("update").alias("op"),
        "key",
        F.lit("U2").alias("status"),
        (F.col("cents") + 2).alias("cents"),
        F.lit(2).alias("version"),
    )
    dels = store.filter(F.col("key") % 3 == 1).select(
        F.lit("delete").alias("op"),
        "key",
        F.lit(None).cast("string").alias("status"),
        F.lit(None).cast("long").alias("cents"),
        F.lit(1).alias("version"),
    )
    ins = store.filter(F.col("key") % 3 == 2).select(
        F.lit("insert").alias("op"),
        (F.col("key") + 100000).alias("key"),
        F.lit("N").alias("status"),
        F.col("cents"),
        F.lit(1).alias("version"),
    )
    changes = upd1.unionByName(upd2).unionByName(dels).unionByName(ins)
    return merge_into(store, changes, key_cols="key", version_cols="version").orderBy(
        "key"
    )


@query(
    "cdc_datasource_scan",
    oracle=_ORACLE_BASE
    + """
    SELECT 4 + 120 * (rn - 1) AS start_pos,
           4 + 120 * rn AS stop_pos,
           'insert' AS op, 'shop' AS db, 'orders' AS "table",
           CAST(o_orderkey AS VARCHAR) AS key
    FROM src
    WHERE o_orderkey % 2 = 0 AND 4 + 120 * (rn - 1) >= 1000
    ORDER BY start_pos
    """,
)
def cdc_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 'binlog' Python DataSource (Spark 4 DataSource V2 API):
    ``spark.read.format('binlog')`` with REAL predicate pushdown — the
    op/db equality and the start_pos range are handled inside the
    source (``BinlogReader.pushFilters``), so filtered events never
    reach Spark, mirroring the reference's argv-level range pushdown
    (main.py:88-105). The residual key predicate stays in Spark."""
    from log2sql_spark.sources.binlog_datasource import register

    register(spark)  # the driver's session doesn't come from get_spark()
    rows = _orders_subset(spark, sf_dir)
    events = [
        {"op": "insert", "db": "shop", "table": "orders",
         "ts": r["o_orderdate"], "values": _row_tokens(r)}
        for r in rows
    ]
    path = _write_dump(events)
    env = (
        spark.read.format("binlog")
        .load(path)
        .filter(
            (F.col("op") == "insert")
            & (F.col("db") == "shop")
            & (F.col("start_pos") >= 1000)
        )
        .select(
            "start_pos", "stop_pos", "op", "db", "table",
            # raw envelope: row images are keyed by ordinal ("1", "2", ...)
            # until resolve_columns applies the catalog
            F.element_at("after", "1").alias("key"),
        )
        .filter(F.col("key").cast("long") % 2 == 0)
    )
    return env.orderBy("start_pos")


@query(
    "cdc_scd2_asof_lookup",
    oracle=_ORACLE_BASE
    + """
    , versions AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS key, 'insert' AS version_op,
             o_orderdate AS valid_from, cents AS version_cents
      FROM src
      UNION ALL
      SELECT CAST(o_orderkey AS VARCHAR), 'update',
             o_orderdate + INTERVAL 1 SECOND, cents + 500
      FROM src
      UNION ALL
      SELECT CAST(o_orderkey AS VARCHAR), 'update',
             o_orderdate + INTERVAL 2 SECOND, cents + 1000
      FROM src
    ),
    hist AS (
      SELECT key, version_op, valid_from,
             lead(valid_from) OVER (PARTITION BY key ORDER BY valid_from)
               AS valid_to,
             version_cents
      FROM versions
    ),
    lookups AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS key,
             o_orderdate + CASE WHEN o_orderkey % 2 = 0
                                THEN INTERVAL '1500' MILLISECOND
                                ELSE INTERVAL '30' SECOND END AS as_of
      FROM src
    )
    SELECT l.key, l.as_of, h.version_op, h.version_cents
    FROM lookups l JOIN hist h
      ON l.key = h.key
     AND h.valid_from <= l.as_of
     AND (h.valid_to IS NULL OR l.as_of < h.valid_to)
    ORDER BY l.key
    """,
)
def cdc_scd2_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup against the SCD2 history: each key asks
    "what was the row AS OF t?" — even keys probe mid-history (t =
    first update's validity window), odd keys probe after the last
    change (current version). One equi-join on the key plus the
    validity-interval predicate; because validity windows partition
    time per key, exactly one version matches — the correctness
    property a warehouse's temporal join relies on."""
    from datetime import timedelta

    from log2sql_spark.operators.cdc_scd2 import scd2_history
    from log2sql_spark.sources.binlog import read_binlog
    from log2sql_spark.sources.catalog import resolve_columns

    rows = _orders_subset(spark, sf_dir)
    events = []
    for r in rows:
        base = {"db": "shop", "table": "orders", "ts": r["o_orderdate"]}
        key = str(r["o_orderkey"])
        events.append({**base, "op": "insert",
                       "values": [(1, key), (4, str(r["cents"]))]})
        events.append({**base, "op": "update", "ts": r["o_orderdate"] + timedelta(seconds=1),
                       "before": [(1, key), (4, str(r["cents"]))],
                       "after": [(1, key), (4, str(r["cents"] + 500))]})
        events.append({**base, "op": "update", "ts": r["o_orderdate"] + timedelta(seconds=2),
                       "before": [(1, key), (4, str(r["cents"] + 500))],
                       "after": [(1, key), (4, str(r["cents"] + 1000))]})
    path = _write_dump(events)
    cat = catalog_from_dict(spark, _CATALOG_SPEC)
    hist = scd2_history(
        resolve_columns(read_binlog(spark, path), cat), key_col="o_orderkey"
    ).select(
        "key",
        "version_op",
        "valid_from",
        "valid_to",
        F.element_at("row_image", "o_totalprice_cents").cast("long").alias(
            "version_cents"
        ),
    )
    def _py_ts(ts):
        return ts.to_pydatetime() if hasattr(ts, "to_pydatetime") else ts

    lookups = spark.createDataFrame(
        [
            (
                str(r["o_orderkey"]),
                _py_ts(r["o_orderdate"])
                + (
                    timedelta(milliseconds=1500)
                    if r["o_orderkey"] % 2 == 0
                    else timedelta(seconds=30)
                ),
            )
            for r in rows
        ],
        "key string, as_of timestamp",
    )
    return (
        lookups.join(hist, "key")
        .filter(
            (F.col("valid_from") <= F.col("as_of"))
            & (F.col("valid_to").isNull() | (F.col("as_of") < F.col("valid_to")))
        )
        .select("key", "as_of", "version_op", "version_cents")
        .orderBy("key")
    )


_GTID_UUID = "3e11fa47-71ca-11e1-9e33-c80aa9429562"


@query(
    "cdc_gtid_dedup_replay",
    oracle=_ORACLE_BASE
    + f"""
    , stats AS (
      SELECT CAST(sum(CASE WHEN rn % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
      FROM src
    ),
    newsrc AS (
      SELECT *, CAST(row_number() OVER (ORDER BY rn) AS BIGINT) AS jn
      FROM src WHERE rn % 5 = 0
    )
    SELECT 4 + 120 * (rn - 1) AS start_pos,
           'INSERT INTO `shop`.`orders`({_COL_LIST}) VALUES (' || {_VALUES_EXPR} || ');' AS sql_text
    FROM src
    UNION ALL
    SELECT 4 + 120 * (n_dup + jn - 1) AS start_pos,
           'INSERT INTO `shop`.`orders`({_COL_LIST}) VALUES ('
             || {_VALUES_EXPR.replace("o_orderkey", "(o_orderkey + 100000)", 1)} || ');' AS sql_text
    FROM newsrc, stats
    ORDER BY start_pos, sql_text
    """,
)
def cdc_gtid_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once replay across RE-DELIVERED dumps: file A holds every
    row as its own GTID'd transaction; file B re-delivers one third of
    them (identical GTIDs — a replication retry) plus genuinely new
    transactions. ``dedup_by_gtid`` keeps each transaction from one
    delivery, so the replay stream contains file A's events exactly once
    plus only file B's NEW transactions — the oracle reconstructs that
    exact multiset (original positions + file-B positions for the new
    rows), so one surviving duplicate or one lost new row breaks the
    hash. The reference would re-print duplicated transactions verbatim
    (no GTID handling in ``log2sql.py``); GTID parse is the public
    mysqlbinlog ``SET @@SESSION.GTID_NEXT`` preamble."""
    from log2sql_spark.cdc import envelope_to_sql
    from log2sql_spark.operators.cdc_filters import dedup_by_gtid
    from log2sql_spark.sources.binlog import read_binlog

    rows = _orders_subset(spark, sf_dir)

    def ins(r, key_shift=0, gtid_seq=0):
        toks = _row_tokens(r)
        if key_shift:
            toks = [(1, str(r["o_orderkey"] + key_shift))] + toks[1:]
        return {
            "op": "insert",
            "db": "shop",
            "table": "orders",
            "ts": r["o_orderdate"],
            "values": toks,
            "gtid": f"{_GTID_UUID}:{gtid_seq}",
            "commit": True,
        }

    file_a = [ins(r, gtid_seq=i + 1) for i, r in enumerate(rows)]
    dups = [ins(r, gtid_seq=i + 1) for i, r in enumerate(rows) if (i + 1) % 3 == 0]
    news = [
        ins(r, key_shift=100000, gtid_seq=len(rows) + j + 1)
        for j, r in enumerate(r2 for i2, r2 in enumerate(rows) if (i2 + 1) % 5 == 0)
    ]
    d = scratch_dir("log2sql_gtid_")
    path_a = os.path.join(d, "mysql-bin.000001.txt")
    path_b = os.path.join(d, "mysql-bin.000002.txt")
    with open(path_a, "w") as fh:
        fh.write(render_binlog(file_a))
    with open(path_b, "w") as fh:
        fh.write(render_binlog(dups + news))

    cat = catalog_from_dict(spark, _CATALOG_SPEC)
    envelope = dedup_by_gtid(read_binlog(spark, [path_a, path_b]))
    return (
        envelope_to_sql(envelope, cat)
        .select("start_pos", "sql_text")
        .orderBy("start_pos", "sql_text")
    )


@query(
    "cdc_txn_grouping",
    oracle=_ORACLE_BASE
    + f"""
    , bounds AS (SELECT CAST(count(*) AS BIGINT) AS n FROM src)
    SELECT CAST((rn - 1) // 5 AS BIGINT) AS txn_seq,
           '{_GTID_UUID}:' || CAST((rn - 1) // 5 + 1 AS VARCHAR) AS gtid,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(4 + 120 * (min(rn) - 1) AS BIGINT) AS first_pos,
           CAST(4 + 120 * max(rn) AS BIGINT) AS last_pos
    FROM src
    GROUP BY 1, 2
    ORDER BY txn_seq
    """,
)
def cdc_txn_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BEGIN..COMMIT transaction grouping: the dump batches every 5 row
    events into one GTID'd transaction (``SET GTID_NEXT`` + ``BEGIN``
    preamble, ``COMMIT`` terminator — the real mysqlbinlog layout), and
    the parser assigns each event its 0-based per-file ``txn_seq`` plus
    the owning ``gtid``. Grouping by transaction yields the unit a
    TRANSACTION-ATOMIC apply needs (all-or-nothing per txn — what the
    downstream MERGE must treat as one batch to preserve source
    atomicity); the oracle recomputes membership, GTIDs, and position
    spans arithmetically from the row numbers."""
    rows = _orders_subset(spark, sf_dir)
    events = []
    for i, r in enumerate(rows):
        ev = {
            "op": "insert",
            "db": "shop",
            "table": "orders",
            "ts": r["o_orderdate"],
            "values": _row_tokens(r),
        }
        if i % 5 == 0:  # first event of the transaction
            ev["gtid"] = f"{_GTID_UUID}:{i // 5 + 1}"
        if i % 5 == 4 or i == len(rows) - 1:
            ev["commit"] = True
        events.append(ev)
    path = _write_dump(events)
    from log2sql_spark.sources.binlog import read_binlog

    return (
        read_binlog(spark, path)
        .groupBy("txn_seq", "gtid")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("start_pos").alias("first_pos"),
            F.max("stop_pos").alias("last_pos"),
        )
        .orderBy("txn_seq")
    )


@query(
    "cdc_merge_full_sync",
    oracle="""
    WITH src AS (
      SELECT CAST(o_orderkey AS BIGINT) AS key, o_orderstatus AS status,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey <= 2000
    )
    SELECT key, status,
           CASE WHEN key % 2 = 0 THEN cents + 5 ELSE cents END AS cents,
           TRUE AS is_active
    FROM src WHERE key % 4 <> 1
    UNION ALL
    SELECT key, status, cents, FALSE AS is_active
    FROM src WHERE key % 4 = 1
    UNION ALL
    SELECT key + 200000 AS key, 'N' AS status, cents, TRUE AS is_active
    FROM src WHERE key % 4 = 2
    ORDER BY key
    """,
)
def cdc_merge_full_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta's three-clause MERGE (WHEN NOT MATCHED BY SOURCE): the
    store reconciled against a FULL periodic snapshot — source rows
    update/insert, keys that vanished from the snapshot are soft-
    deactivated (``is_active=false``) instead of silently surviving.
    The reconciliation a full-dump re-sync needs and a change-feed
    MERGE cannot express (reference analog: replaying a complete dump
    over an existing table, log2sql.py:161-185). One shuffle + one
    window, same shape as cdc_merge_upsert."""
    from log2sql_spark.operators.merge import merge_full_sync
    from log2sql_spark.sources.tables import load_table

    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_orderkey") <= _KEY_MAX)
    store = orders.select(
        F.col("o_orderkey").cast("long").alias("key"),
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.lit(True).alias("is_active"),
    )
    snap_upd = store.filter(F.col("key") % 4 != 1).withColumn(
        "cents",
        F.when(F.col("key") % 2 == 0, F.col("cents") + 5).otherwise(F.col("cents")),
    )
    snap_new = store.filter(F.col("key") % 4 == 2).select(
        (F.col("key") + 200000).alias("key"),
        F.lit("N").alias("status"),
        "cents",
        F.lit(True).alias("is_active"),
    )
    source = snap_upd.unionByName(snap_new)
    return merge_full_sync(
        store,
        source,
        "key",
        not_matched_by_source="update",
        set_cols={"is_active": F.lit(False)},
    ).orderBy("key")


@query(
    "cdc_lag_monitor",
    oracle=_ORACLE_BASE
    + """
    , ins AS (
      SELECT count(*) AS n, min(o_orderdate) AS mn, max(o_orderdate) AS mx
      FROM src
    ), upd AS (
      SELECT count(*) AS n, min(o_orderdate) AS mn, max(o_orderdate) AS mx
      FROM src WHERE o_orderkey % 3 = 0
    ), del AS (
      SELECT count(*) AS n, min(o_orderdate) AS mn, max(o_orderdate) AS mx
      FROM src WHERE o_orderkey % 5 = 0
    ), tot AS (
      SELECT max(o_orderdate) AS head FROM src
    )
    SELECT * FROM (
      SELECT 'insert' AS op,
             CAST(ins.n AS BIGINT) AS n_events,
             CAST(4 AS BIGINT) AS first_pos,
             CAST(4 + 120 * ins.n AS BIGINT) AS last_stop,
             CAST(120 * ins.n AS BIGINT) AS n_bytes,
             CAST(epoch(tot.head) - epoch(ins.mx) AS BIGINT) AS lag_s,
             CAST(epoch(ins.mx) - epoch(ins.mn) AS BIGINT) AS span_s
      FROM ins, tot
      UNION ALL
      SELECT 'update',
             CAST(upd.n AS BIGINT),
             CAST(4 + 120 * ins.n AS BIGINT),
             CAST(4 + 120 * (ins.n + upd.n) AS BIGINT),
             CAST(120 * upd.n AS BIGINT),
             CAST(epoch(tot.head) - epoch(upd.mx) AS BIGINT),
             CAST(epoch(upd.mx) - epoch(upd.mn) AS BIGINT)
      FROM ins, upd, tot
      UNION ALL
      SELECT 'delete',
             CAST(del.n AS BIGINT),
             CAST(4 + 120 * (ins.n + upd.n) AS BIGINT),
             CAST(4 + 120 * (ins.n + upd.n + del.n) AS BIGINT),
             CAST(120 * del.n AS BIGINT),
             CAST(epoch(tot.head) - epoch(del.mx) AS BIGINT),
             CAST(epoch(del.mx) - epoch(del.mn) AS BIGINT)
      FROM ins, upd, del, tot
    ) ORDER BY op
    """,
)
def cdc_lag_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC pipeline observability: per-op event counts, byte ranges,
    time span, and replication lag (dump-head timestamp minus the op's
    newest event) straight off the parsed envelope — the monitoring
    report a production CDC consumer exports per table (reference has
    no observability at all; its loop at main.py:109-116 is silent).

    This is also the one query that cross-checks the parser's
    position/timestamp extraction across ALL THREE DML kinds at once:
    the oracle reconstructs every number analytically from the fixture
    arithmetic (positions advance 120/event in generation order —
    inserts, then updates, then deletes), so a parser that misreads an
    Update_rows header or drops a Delete_rows timestamp shifts a count
    or a byte range and fails the hash. One groupBy("op") over the
    envelope plus a broadcast 1-row head timestamp; never touches row
    images, so the plan is the same at any dump size.
    """
    from log2sql_spark.sources.binlog import read_binlog

    rows = _orders_subset(spark, sf_dir)
    events = [
        {"op": "insert", "db": "shop", "table": "orders",
         "ts": r["o_orderdate"], "values": _row_tokens(r)}
        for r in rows
    ]
    events += [
        {"op": "update", "db": "shop", "table": "orders",
         "ts": r["o_orderdate"], "before": _row_tokens(r),
         "after": _row_tokens(r)}
        for r in rows if r["o_orderkey"] % 3 == 0
    ]
    events += [
        {"op": "delete", "db": "shop", "table": "orders",
         "ts": r["o_orderdate"], "values": _row_tokens(r)}
        for r in rows if r["o_orderkey"] % 5 == 0
    ]
    path = _write_dump(events)
    env = read_binlog(spark, path)
    head = env.agg(F.max("event_ts").alias("head_ts"))
    per_op = env.groupBy("op").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("start_pos").cast("long").alias("first_pos"),
        F.max("stop_pos").cast("long").alias("last_stop"),
        F.min("event_ts").alias("mn"),
        F.max("event_ts").alias("mx"),
    )
    return (
        per_op.crossJoin(F.broadcast(head))
        .select(
            "op",
            "n_events",
            "first_pos",
            "last_stop",
            (F.col("last_stop") - F.col("first_pos")).alias("n_bytes"),
            (F.unix_timestamp("head_ts") - F.unix_timestamp("mx"))
            .cast("long")
            .alias("lag_s"),
            (F.unix_timestamp("mx") - F.unix_timestamp("mn"))
            .cast("long")
            .alias("span_s"),
        )
        .orderBy("op")
    )


@query(
    "cdc_integrity_audit",
    oracle=_ORACLE_BASE
    + """
    , a AS (SELECT count(*) AS n FROM src),
    b AS (SELECT count(*) AS n FROM src WHERE o_orderkey % 4 = 0)
    SELECT * FROM (
      SELECT 'redelivery-a.txt' AS file,
             CAST(a.n AS BIGINT) AS n_events,
             CAST(0 AS BIGINT) AS n_violations,
             CAST(0 AS BIGINT) AS n_gaps,
             CAST(b.n AS BIGINT) AS n_dup_cross_file
      FROM a, b
      UNION ALL
      SELECT 'redelivery-b.txt',
             CAST(b.n AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             CAST(b.n AS BIGINT)
      FROM b
    ) ORDER BY file
    """,
)
def cdc_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binlog stream integrity audit: per-file position monotonicity
    violations, coverage gaps (start_pos != previous stop_pos — a
    dropped event), and cross-file duplicate row images (a partial
    re-delivery) — the checks a CDC consumer runs before trusting an
    at-least-once transport, none of which the reference performs (it
    applies whatever arrives, main.py:109-116).

    The fixture IS the failure scenario: file B re-delivers a quarter
    of file A's events (fresh per-file positions, identical images),
    so the duplicate counter provably fires while both files' position
    chains audit clean — zeros the oracle asserts, not zeros from an
    unexercised branch. Row images dedup by a canonical digest
    (sorted map entries — map iteration order is not cross-engine
    material), the same content-hash discipline as exact document
    dedup. Shape: per-file windows (file count = parallelism, no
    global order), one digest aggregate; both scale with files x
    events/file, never globally sequential.
    """
    from log2sql_spark.sources.binlog import read_binlog

    rows = _orders_subset(spark, sf_dir)

    def _ev(r):
        return {"op": "insert", "db": "shop", "table": "orders",
                "ts": r["o_orderdate"], "values": _row_tokens(r)}

    full = [_ev(r) for r in rows]
    redelivered = [_ev(r) for r in rows if r["o_orderkey"] % 4 == 0]
    text_a = render_binlog(full)
    text_b = render_binlog(redelivered)
    key = f"integrity:{len(text_a)}:{hash(text_a)}:{hash(text_b)}"
    if key not in _DUMP_CACHE:
        d = scratch_dir("log2sql_fixture_")
        for name, text in (("redelivery-a.txt", text_a),
                           ("redelivery-b.txt", text_b)):
            with open(os.path.join(d, name), "w") as fh:
                fh.write(text)
        _DUMP_CACHE[key] = d
    d = _DUMP_CACHE[key]

    env = read_binlog(
        spark,
        [os.path.join(d, "redelivery-a.txt"),
         os.path.join(d, "redelivery-b.txt")],
    ).select(
        F.element_at(F.split("file", "/"), -1).alias("file"),
        "event_seq", "start_pos", "stop_pos", "table",
        F.coalesce("after", "before").alias("img"),
    )
    digest = F.sha2(
        F.concat_ws(
            "|",
            F.col("table"),
            F.expr(
                "array_join(transform(array_sort(map_keys(img)),"
                " k -> concat(k, '=', img[k])), ',')"
            ),
        ),
        256,
    )
    w = Window.partitionBy("file").orderBy("event_seq")
    flagged = env.withColumn("digest", digest).withColumn(
        "violation",
        (F.col("start_pos") <= F.lag("start_pos").over(w)).cast("int"),
    ).withColumn(
        "gap",
        (
            F.lag("stop_pos").over(w).isNotNull()
            & (F.col("start_pos") != F.lag("stop_pos").over(w))
        ).cast("int"),
    )
    cross = flagged.groupBy("digest").agg(
        F.countDistinct("file").alias("nf")
    )
    return (
        flagged.join(cross, "digest")
        .groupBy("file")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.coalesce(F.col("violation"), F.lit(0)))
            .cast("long")
            .alias("n_violations"),
            F.sum("gap").cast("long").alias("n_gaps"),
            F.sum((F.col("nf") > 1).cast("int"))
            .cast("long")
            .alias("n_dup_cross_file"),
        )
        .orderBy("file")
    )


@query(
    "cdc_bootstrap_snapshot_tail",
    oracle=_ORACLE_BASE
    + """
    SELECT CAST(o_orderkey + 100000 AS VARCHAR) AS key,
           CAST(55 AS BIGINT) AS cents
    FROM src WHERE o_orderkey % 50 = 0
    UNION ALL
    SELECT CAST(o_orderkey AS VARCHAR) AS key,
           CAST(CASE WHEN o_orderkey % 9 = 0 THEN cents + 123 ELSE cents END
                + CASE WHEN o_orderkey % 4 = 0 THEN 700 ELSE 0 END AS BIGINT)
             AS cents
    FROM src WHERE o_orderkey % 7 <> 0
    ORDER BY key
    """,
)
def cdc_bootstrap_snapshot_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard CDC BOOTSTRAP the reference (an offline one-shot
    parser) has no story for: a consistent snapshot taken at binlog
    position P, composed with the log tail STRICTLY AFTER P — Debezium's
    snapshot-then-stream handoff, and the reference's own
    --start-position argument (main.py:91-101) given its real meaning.
    Three things must compose exactly: (1) keys whose entire history
    predates the dump (here: the k%9 price corrections — the binlog that
    produced them is PURGED, only the snapshot knows them) survive via
    the snapshot baseline; (2) the overlap window (events <= P that are
    also reflected in the snapshot) is EXCLUDED by the watermark filter
    — Catalyst pushes start_pos > P into the scan, the reference's range
    pushdown done declaratively; (3) the tail (updates, deletes, new
    inserts) folds onto the baseline with the same newest-wins-per-key
    window every apply path uses, snapshot images ranked below any log
    event. The oracle rebuilds the final state arithmetically; a single
    key resurrected from the purged region, double-applied from the
    overlap, or missed from the tail breaks the hash."""
    from pyspark.sql import Window as W

    from log2sql_spark.sources.binlog import read_binlog
    from log2sql_spark.sources.catalog import resolve_columns

    rows = _orders_subset(spark, sf_dir)

    # overlap window: the last pre-P events — price corrections already
    # reflected in the snapshot (k % 9 == 0)
    events = []
    for r in rows:
        if r["o_orderkey"] % 9 == 0:
            events.append(
                {"op": "update", "db": "shop", "table": "orders",
                 "ts": r["o_orderdate"],
                 "before": [(1, str(r["o_orderkey"])), (4, str(r["cents"]))],
                 "after": [(1, str(r["o_orderkey"])), (4, str(r["cents"] + 123))]}
            )
    n_overlap = len(events)
    watermark = 4 + 120 * n_overlap - 120  # start_pos of the LAST overlap event

    # tail (> P): updates on k%4, then deletes on k%7 (later position →
    # delete beats update on k%28), then brand-new inserts on k%50
    for r in rows:
        if r["o_orderkey"] % 4 == 0:
            snap_cents = r["cents"] + 123 if r["o_orderkey"] % 9 == 0 else r["cents"]
            events.append(
                {"op": "update", "db": "shop", "table": "orders",
                 "ts": r["o_orderdate"],
                 "before": [(1, str(r["o_orderkey"])), (4, str(snap_cents))],
                 "after": [(1, str(r["o_orderkey"])), (4, str(snap_cents + 700))]}
            )
    for r in rows:
        if r["o_orderkey"] % 7 == 0:
            events.append(
                {"op": "delete", "db": "shop", "table": "orders",
                 "ts": r["o_orderdate"],
                 "values": [(1, str(r["o_orderkey"]))]}
            )
    for r in rows:
        if r["o_orderkey"] % 50 == 0:
            nr = dict(r)
            nr["o_orderkey"] = r["o_orderkey"] + 100000
            nr["cents"] = 55
            events.append(
                {"op": "insert", "db": "shop", "table": "orders",
                 "ts": r["o_orderdate"], "values": _row_tokens(nr)}
            )
    path = _write_dump(events)
    cat = catalog_from_dict(spark, _CATALOG_SPEC)

    tail = (
        resolve_columns(read_binlog(spark, path), cat)
        .filter(F.col("start_pos") > watermark)  # pushed into the scan
        .select(
            F.element_at(F.coalesce("after", "before"), "o_orderkey").alias("key"),
            "op",
            F.element_at("after", "o_totalprice_cents").cast("long").alias("cents"),
            "start_pos",
            "event_seq",
        )
    )
    snapshot = spark.createDataFrame(
        [
            (
                str(r["o_orderkey"]),
                "insert",
                int(r["cents"] + 123 if r["o_orderkey"] % 9 == 0 else r["cents"]),
            )
            for r in rows
        ],
        "key string, op string, cents bigint",
    ).select(
        "key", "op", "cents",
        F.lit(-1).cast("bigint").alias("start_pos"),  # ranks below any event
        F.lit(-1).cast("bigint").alias("event_seq"),
    )
    w = W.partitionBy("key").orderBy(F.desc("start_pos"), F.desc("event_seq"))
    return (
        tail.unionByName(snapshot)
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .filter(F.col("op") != "delete")
        .select("key", "cents")
        .orderBy("key")
    )


@query(
    "cdc_ddl_store_migration",
    oracle=_ORACLE_BASE
    + """
    SELECT o_orderkey AS k, cents,
           CASE WHEN o_orderkey > 1000 THEN CAST(o_orderkey * 2 AS VARCHAR) END
             AS extra
    FROM src
    ORDER BY k
    """,
)
def cdc_ddl_store_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full DDL migration path, source to sink: a mid-stream ALTER
    TABLE ADD COLUMN drives BOTH the catalog (position-versioned
    resolution — pre-DDL events resolve 6 columns, post-DDL 7; the
    reachable twin of the reference's dead DDL branch, main.py:73-74)
    AND the target store's schema (the post-DDL batch commits with
    merge_schema=True — the manifest records the union schema and the
    pre-DDL files read NULL for the new column, Delta's additive
    evolution). What the oracle checks: every pre-DDL row lands with
    extra IS NULL, every post-DDL row carries its value, and nothing is
    lost or re-typed crossing the migration — i.e. the schema change
    flowed from a parsed binlog STATEMENT to an evolved TABLE with no
    manual step, which is the operational point of CDC schema
    handling. Splitting the batch at the DDL position is one bounded
    driver-side read of the (tiny) DDL event set."""
    from log2sql_spark.sources.binlog import read_binlog
    from log2sql_spark.sources.catalog_evolution import (
        ddl_catalog_deltas,
        resolve_columns_versioned,
        versioned_catalog,
    )
    from log2sql_spark.store import SnapshotStore

    rows = _orders_subset(spark, sf_dir)
    events = []
    for r in rows:
        if r["o_orderkey"] <= 1000:
            events.append(
                {"op": "insert", "db": "shop", "table": "orders",
                 "ts": r["o_orderdate"], "values": _row_tokens(r)}
            )
    events.append(
        {"op": "ddl", "db": "shop", "table": None, "ts": rows[0]["o_orderdate"],
         "statement": "ALTER TABLE orders ADD COLUMN extra VARCHAR(30)"}
    )
    for r in rows:
        if r["o_orderkey"] > 1000:
            events.append(
                {"op": "insert", "db": "shop", "table": "orders",
                 "ts": r["o_orderdate"],
                 "values": _row_tokens(r) + [(7, str(r["o_orderkey"] * 2))]}
            )
    path = _write_dump(events)
    base = catalog_from_dict(spark, _CATALOG_SPEC)
    envelope = read_binlog(spark, path)
    resolved = resolve_columns_versioned(
        envelope, versioned_catalog(base, ddl_catalog_deltas(envelope))
    )
    ddl_pos = (
        envelope.filter(F.col("op") == "ddl")
        .agg(F.min("start_pos"))
        .collect()[0][0]
    )  # bounded: one row per DDL statement in the dump
    typed = resolved.filter(F.col("op") == "insert").select(
        F.element_at("after", "o_orderkey").cast("long").alias("k"),
        F.element_at("after", "o_totalprice_cents").cast("long").alias("cents"),
        F.element_at("after", "extra").alias("extra"),
        "start_pos",
    )

    def build():
        store = SnapshotStore(scratch_dir("log2sql_ddlmig_"))
        store.commit(
            typed.filter(F.col("start_pos") < ddl_pos).select("k", "cents"),
            mode="overwrite",
        )
        store.commit(
            typed.filter(F.col("start_pos") > ddl_pos).select(
                "k", "cents", "extra"
            ),
            mode="append",
            merge_schema=True,
        )
        return store

    from log2sql_spark.queries.table_format import _cached_build

    store = _cached_build("ddl_migration", sf_dir, build)
    return store.read(spark).select("k", "cents", "extra").orderBy("k")


@query(
    "cdc_flashback_point_in_time",
    oracle=_ORACLE_BASE
    + f"""
    , u AS (
      SELECT 2 AS f, 4 + 120 * (rn - 1) AS start_pos,
             'UPDATE `shop`.`orders` SET `o_orderkey`=' || o_orderkey
               || ', `o_totalprice_cents`=' || cents
               || ' WHERE `o_orderkey`=' || o_orderkey || ' LIMIT 1;'
               AS sql_text
      FROM src
    ), d AS (
      SELECT 3 AS f,
             4 + 120 * (row_number() OVER (ORDER BY o_orderkey) - 1)
               AS start_pos,
             'INSERT INTO `shop`.`orders`({_COL_LIST}) VALUES ('
               || o_orderkey || ', ' || o_custkey || ', ''' || o_orderstatus
               || ''', ' || (cents + 500) || ', '''
               || strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') || ''', '''
               || o_orderpriority || ''');' AS sql_text
      FROM src WHERE o_orderkey % 6 = 0
    ), allv AS (
      SELECT * FROM u UNION ALL SELECT * FROM d
    )
    SELECT f, start_pos, sql_text,
           CAST(row_number() OVER (ORDER BY f DESC, start_pos DESC) - 1
                AS BIGINT) AS apply_rank
    FROM allv
    ORDER BY f, start_pos
    """,
)
def cdc_flashback_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time ROLLBACK — the reference's actual use case
    (flashback mode + --start-datetime, main.py:30-34) run as one
    script over a multi-file history: inserts (file 1, before the
    rollback point) are OUT of scope via the datetime filter; the
    file-2 updates and file-3 deletes at/after it invert (update swaps
    images, delete becomes INSERT of the deleted row — which carries
    the post-update amount, because the fixture deletes happened after
    the updates) and the whole script orders REVERSE-chronologically
    ACROSS file rotations (file desc, position desc — undo the delete
    first, then the update), the global ordering the reference's
    single-pass printer cannot produce (README.md:23-27). apply_rank
    encodes that ordering for the order-insensitive hash; the oracle
    rebuilds every inverted statement and its rank by string
    arithmetic. The total order is semantic (a serial rollback script),
    but the rank is computed DISTRIBUTED (r14): per-FILE row_number
    (position desc inside each rotation) + cumulative per-file count
    offsets over |files| rows — the two-small-aggregates decomposition,
    no single-task sort over the events."""
    import os as _os

    from log2sql_spark.cdc import binlog_to_sql
    from log2sql_spark.sources.binlog_fixture import render_binlog

    rows = _orders_subset(spark, sf_dir)
    ts_early = rows[0]["o_orderdate"].replace(hour=1)
    ts_mid = rows[0]["o_orderdate"].replace(hour=12)
    ts_late = rows[0]["o_orderdate"].replace(hour=18)

    inserts = [
        {"op": "insert", "db": "shop", "table": "orders", "ts": ts_early,
         "values": _row_tokens(r)}
        for r in rows
    ]
    updates = [
        {"op": "update", "db": "shop", "table": "orders", "ts": ts_mid,
         "before": [(1, str(r["o_orderkey"])), (4, str(r["cents"]))],
         "after": [(1, str(r["o_orderkey"])), (4, str(r["cents"] + 500))]}
        for r in rows
    ]
    deletes = []
    for r in rows:
        if r["o_orderkey"] % 6 == 0:
            nr = dict(r)
            nr["cents"] = r["cents"] + 500  # post-update row image
            deletes.append(
                {"op": "delete", "db": "shop", "table": "orders",
                 "ts": ts_late, "values": _row_tokens(nr)}
            )
    key = f"pit:{len(rows)}"
    if key not in _DUMP_CACHE:
        d = scratch_dir("log2sql_pitfb_")
        for i, evs in enumerate([inserts, updates, deletes], start=1):
            with open(_os.path.join(d, f"mysql-bin.00000{i}.txt"), "w") as fh:
                fh.write(render_binlog(evs))
        _DUMP_CACHE[key] = d
    paths = [
        _os.path.join(_DUMP_CACHE[key], f"mysql-bin.00000{i}.txt")
        for i in (1, 2, 3)
    ]
    cat = catalog_from_dict(spark, _CATALOG_SPEC)
    # ordered=False: apply order is encoded in apply_rank and the final
    # presentation orderBy below — the intermediate flashback sort would
    # be dead work (see cdc_update_flashback).
    df = binlog_to_sql(
        spark, paths, cat, flashback=True, ordered=False, start_datetime=ts_mid
    )
    from log2sql_spark.operators.ranks import distributed_global_rank

    f_num = F.regexp_extract("file", r"mysql-bin\.(\d+)\.txt", 1).cast("int")
    ranked = distributed_global_rank(
        df.withColumn("f", f_num),
        "f",
        [F.desc("start_pos")],
        descending=True,
        out="__r",
    )
    return ranked.select(
        "f",
        "start_pos",
        "sql_text",
        (F.col("__r") - 1).cast("long").alias("apply_rank"),
    ).orderBy("f", "start_pos")


@query(
    "cdc_conflict_bidirectional",
    oracle=_ORACLE_BASE
    + """
    SELECT o_orderkey AS k,
           CAST(cents + 100 AS BIGINT) AS site_a_cents,
           CAST(cents + 200 AS BIGINT) AS site_b_cents,
           CASE WHEN o_orderkey % 2 = 0 THEN 'a' ELSE 'b' END AS winner_site,
           CAST(CASE WHEN o_orderkey % 2 = 0 THEN cents + 100
                     ELSE cents + 200 END AS BIGINT) AS resolved_cents
    FROM src
    WHERE o_orderkey % 15 = 0
    ORDER BY k
    """,
)
def cdc_conflict_bidirectional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional (active-active) replication conflict detection —
    the operational hazard single-direction CDC never sees: the SAME
    key updated at BOTH sites within the exchange window. Each site's
    binlog parses independently (site = file identity); keys present
    on both update streams are conflicts, resolved deterministically
    by last-writer-wins on event time with site-precedence ('a') on
    ties — the policy documented by every active-active system
    (MySQL Group Replication certifies, DMS/Aurora use LWW). The
    fixture interleaves clock orders (site A writes LATER for even
    keys, earlier for odd), so the winner column exercises both
    directions and a tie-break that silently preferred one site would
    break the hash. One equi-join of the two (already filtered,
    key-distinct) update streams — cost is |conflicting keys|, never
    dump size."""
    import os as _os

    from log2sql_spark.sources.binlog import read_binlog
    from log2sql_spark.sources.binlog_fixture import render_binlog
    from log2sql_spark.sources.catalog import resolve_columns

    rows = _orders_subset(spark, sf_dir)
    t10 = rows[0]["o_orderdate"].replace(hour=10)
    t11 = rows[0]["o_orderdate"].replace(hour=11)
    t12 = rows[0]["o_orderdate"].replace(hour=12)

    def upd(r, add, ts):
        return {"op": "update", "db": "shop", "table": "orders", "ts": ts,
                "before": [(1, str(r["o_orderkey"])), (4, str(r["cents"]))],
                "after": [(1, str(r["o_orderkey"])), (4, str(r["cents"] + add))]}

    site_a = [
        upd(r, 100, t12 if r["o_orderkey"] % 2 == 0 else t10)
        for r in rows if r["o_orderkey"] % 3 == 0
    ]
    site_b = [upd(r, 200, t11) for r in rows if r["o_orderkey"] % 5 == 0]
    key = f"bidi:{len(rows)}"
    if key not in _DUMP_CACHE:
        d = scratch_dir("log2sql_bidi_")
        with open(_os.path.join(d, "site-a-bin.000001.txt"), "w") as fh:
            fh.write(render_binlog(site_a))
        with open(_os.path.join(d, "site-b-bin.000001.txt"), "w") as fh:
            fh.write(render_binlog(site_b))
        _DUMP_CACHE[key] = d
    d = _DUMP_CACHE[key]
    paths = [
        _os.path.join(d, "site-a-bin.000001.txt"),
        _os.path.join(d, "site-b-bin.000001.txt"),
    ]
    cat = catalog_from_dict(spark, _CATALOG_SPEC)
    resolved = resolve_columns(read_binlog(spark, paths), cat).filter(
        F.col("op") == "update"
    )
    site = F.when(F.col("file").contains("site-a"), "a").otherwise("b")
    ups = resolved.select(
        F.element_at("after", "o_orderkey").cast("long").alias("k"),
        F.element_at("after", "o_totalprice_cents").cast("long").alias("cents"),
        "event_ts",
        site.alias("site"),
    )
    a = ups.filter(F.col("site") == "a").select(
        "k", F.col("cents").alias("site_a_cents"), F.col("event_ts").alias("ts_a")
    )
    b = ups.filter(F.col("site") == "b").select(
        "k", F.col("cents").alias("site_b_cents"), F.col("event_ts").alias("ts_b")
    )
    winner = F.when(F.col("ts_a") >= F.col("ts_b"), "a").otherwise("b")
    return (
        a.join(b, "k")
        .select(
            "k",
            "site_a_cents",
            "site_b_cents",
            winner.alias("winner_site"),
            F.when(winner == "a", F.col("site_a_cents"))
            .otherwise(F.col("site_b_cents"))
            .alias("resolved_cents"),
        )
        .orderBy("k")
    )


_TOPIC_CACHE: dict[str, str] = {}


def _write_debezium_topic(spark: SparkSession, sf_dir: str) -> str:
    """Synthesize a file-simulated Debezium topic from the orders subset
    (driver-side fixture scaffolding, cached per sf_dir).

    History per key k (partition = k % 4, per-partition offsets):
      wave 0  insert  (full after image, gtid uuid:1:<k>)
      wave 1  update  for k % 3 == 0: status -> 'U', cents + 100
      wave 2  delete  for k % 5 == 0 (before image, null after)
              + a Kafka tombstone record (null value)
    then the ENTIRE insert wave re-delivered verbatim (same gtids, the
    original stale images) on partition file topic-9 with fresh offsets
    — an overlapping re-dump/re-snapshot. Without GTID dedup those
    stale high-offset copies would win last-writer-wins for every
    updated key and resurrect every deleted key, so the dedup is
    hash-checked by the final state, not just asserted."""
    key = sf_dir
    if key in _TOPIC_CACHE:
        return _TOPIC_CACHE[key]
    import json

    from log2sql_spark.sources.debezium import render_debezium_record

    rows = _orders_subset(spark, sf_dir)
    lines: dict[int, list[str]] = {p: [] for p in (0, 1, 2, 3, 9)}
    offsets: dict[int, int] = {p: 0 for p in lines}
    positions: dict[int, int] = {}
    redeliver: list[tuple[int, dict]] = []

    def emit(partition: int, **kw) -> None:
        kw.setdefault("db", "shop")
        kw.setdefault("table", "orders")
        rec = render_debezium_record(
            partition=partition, offset=offsets[partition], **kw
        )
        lines[partition].append(rec)
        offsets[partition] += 1

    def image(r, status: str | None = None, cents_add: int = 0) -> dict:
        return {
            "o_orderkey": r["o_orderkey"],
            "o_custkey": r["o_custkey"],
            "o_orderstatus": status or r["o_orderstatus"],
            "o_totalprice_cents": r["cents"] + cents_add,
            "o_orderpriority": r["o_orderpriority"],
        }

    pos = 4
    for r in rows:
        k = int(r["o_orderkey"])
        ts = int(r["o_orderdate"].timestamp() * 1000)
        kw = dict(
            op="c",
            key=str(k),
            before=None,
            after=image(r),
            ts_ms=ts,
            pos=pos,
            gtid=f"b6f7a3e0-1dcb-11ee-0000-000000000001:1:{k}",
        )
        emit(k % 4, **kw)
        redeliver.append((k, kw))
        pos += 120
    for r in rows:
        k = int(r["o_orderkey"])
        if k % 3 != 0:
            continue
        emit(
            k % 4,
            op="u",
            key=str(k),
            before=image(r),
            after=image(r, status="U", cents_add=100),
            ts_ms=int(r["o_orderdate"].timestamp() * 1000) + 1000,
            pos=pos,
            gtid=f"b6f7a3e0-1dcb-11ee-0000-000000000001:2:{k}",
        )
        pos += 120
    for r in rows:
        k = int(r["o_orderkey"])
        if k % 5 != 0:
            continue
        last = image(r, status="U", cents_add=100) if k % 3 == 0 else image(r)
        emit(
            k % 4,
            op="d",
            key=str(k),
            before=last,
            after=None,
            ts_ms=int(r["o_orderdate"].timestamp() * 1000) + 2000,
            pos=pos,
            gtid=f"b6f7a3e0-1dcb-11ee-0000-000000000001:3:{k}",
        )
        pos += 120
        # Kafka log-compaction tombstone Debezium emits after a delete
        lines[k % 4].append(
            json.dumps(
                {
                    "partition": k % 4,
                    "offset": offsets[k % 4],
                    "key": str(k),
                    "value": None,
                }
            )
        )
        offsets[k % 4] += 1
    for _k, kw in redeliver:  # overlapping re-dump: stale images, same gtids
        emit(9, **kw)

    d = scratch_dir("log2sql_debezium_")
    for p, recs in lines.items():
        with open(os.path.join(d, f"topic-{p}.jsonl"), "w") as fh:
            fh.write("\n".join(recs) + ("\n" if recs else ""))
    _TOPIC_CACHE[key] = d
    return d


@query(
    "cdc_debezium_apply_state",
    oracle=f"""
    WITH src AS (
      SELECT *, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey <= {_KEY_MAX}
    )
    SELECT o_orderkey,
           o_custkey,
           CASE WHEN o_orderkey % 3 = 0 THEN 'U' ELSE o_orderstatus END
             AS o_orderstatus,
           CASE WHEN o_orderkey % 3 = 0 THEN cents + 100 ELSE cents END
             AS o_totalprice_cents,
           o_orderpriority
    FROM src
    WHERE o_orderkey % 5 <> 0
    ORDER BY o_orderkey
    """,
)
def cdc_debezium_apply_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debezium transport end-to-end: Kafka-shaped JSON change events
    (insert/update/delete waves + log-compaction tombstones + an
    overlapping re-dump of stale images on another partition) parsed
    into the shared envelope (`sources/debezium.py`), GTID-deduped with
    the SAME operator the binlog path uses (operators/cdc_filters.py),
    and folded to final state by per-key last-writer-wins on
    (partition, offset) — Kafka's ordering contract, valid because
    Debezium keys records by primary key. The re-delivered stale
    inserts carry HIGHER offsets than the updates/deletes they predate,
    so if GTID dedup failed the final state would show reverted
    statuses and resurrected keys — the dedup is hash-checked, not
    asserted. Reference analog: `--stop-never` (main.py:26-27), the
    online mode whose production transport this is."""
    from log2sql_spark.operators.cdc_filters import dedup_by_gtid
    from log2sql_spark.sources.debezium import (
        debezium_to_envelope,
        read_debezium_topic,
    )

    topic = _write_debezium_topic(spark, sf_dir)
    env = dedup_by_gtid(debezium_to_envelope(read_debezium_topic(spark, topic)))
    keyed = env.select(
        F.coalesce(
            F.element_at("after", "o_orderkey"),
            F.element_at("before", "o_orderkey"),
        )
        .cast("long")
        .alias("_key"),
        "op",
        "after",
        "event_seq",
    )
    return (
        keyed.groupBy("_key")
        .agg(
            F.max_by("op", "event_seq").alias("_last_op"),
            F.max_by("after", "event_seq").alias("after"),
        )
        .filter(F.col("_last_op") != "delete")
        .select(
            F.col("_key").alias("o_orderkey"),
            F.element_at("after", "o_custkey").cast("long").alias("o_custkey"),
            F.element_at("after", "o_orderstatus").alias("o_orderstatus"),
            F.element_at("after", "o_totalprice_cents")
            .cast("long")
            .alias("o_totalprice_cents"),
            F.element_at("after", "o_orderpriority").alias("o_orderpriority"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "cdc_debezium_replay_sql",
    oracle=f"""
    WITH src AS (
      SELECT *, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey <= {_KEY_MAX}
    ),
    ins AS (
      SELECT 'INSERT INTO `shop`.`orders`(`o_orderkey`, `o_custkey`, '
             || '`o_orderstatus`, `o_totalprice_cents`, `o_orderpriority`) '
             || 'VALUES (' || o_orderkey || ', ' || o_custkey || ', '''
             || o_orderstatus || ''', ' || cents || ', ''' || o_orderpriority
             || ''');' AS sql_text
      FROM src
    ),
    upd AS (
      SELECT 'UPDATE `shop`.`orders` SET `o_orderkey`=' || o_orderkey
             || ', `o_custkey`=' || o_custkey
             || ', `o_orderstatus`=''U'', `o_totalprice_cents`=' || (cents + 100)
             || ', `o_orderpriority`=''' || o_orderpriority
             || ''' WHERE `o_orderkey`=' || o_orderkey || ' LIMIT 1;' AS sql_text
      FROM src WHERE o_orderkey % 3 = 0
    ),
    del AS (
      SELECT 'DELETE FROM `shop`.`orders` WHERE `o_orderkey`=' || o_orderkey
             || ' LIMIT 1;' AS sql_text
      FROM src WHERE o_orderkey % 5 = 0
    )
    SELECT sql_text FROM ins
    UNION ALL SELECT sql_text FROM upd
    UNION ALL SELECT sql_text FROM del
    ORDER BY sql_text
    """,
)
def cdc_debezium_replay_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship OUTPUT (replay SQL, log2sql.py:161-185)
    on the Debezium transport: Kafka-shaped change events → GTID dedup
    (the re-dumped stale copies on partition 9 must render NOTHING —
    a dedup failure duplicates statements and breaks the rowcount) →
    SQL-literal re-tokenization (`sources/debezium.py:sql_tokens` —
    typed JSON values back to quoted/escaped literals) → the UNCHANGED
    replay codegen, with key_columns attached by one broadcast catalog
    join. End-to-end this is `main.py:109-116` with Kafka instead of
    mysqlbinlog files."""
    from log2sql_spark.operators.cdc_codegen import with_sql_text
    from log2sql_spark.operators.cdc_filters import dedup_by_gtid
    from log2sql_spark.sources.debezium import (
        debezium_to_envelope,
        read_debezium_topic,
        sql_tokens,
    )

    topic = _write_debezium_topic(spark, sf_dir)
    env = sql_tokens(
        dedup_by_gtid(debezium_to_envelope(read_debezium_topic(spark, topic)))
    )
    cat = catalog_from_dict(spark, _CATALOG_SPEC)
    resolved = env.join(
        F.broadcast(cat.select("db", "table", "key_columns")),
        ["db", "table"],
        "left",
    )
    return with_sql_text(resolved).select("sql_text").orderBy("sql_text")


@query(
    "cdc_quarantine_report",
    oracle=f"""
    WITH src AS (
      SELECT o_orderkey AS k FROM orders WHERE o_orderkey <= {_KEY_MAX}
    )
    SELECT 'legacy' AS db, 'ghost' AS tbl,
           'unknown_table: no catalog entry for legacy.ghost' AS status,
           CAST(count(*) AS BIGINT) AS n_events
    FROM src WHERE k % 5 = 0
    UNION ALL
    SELECT 'shop', 'orders', 'resolved', CAST(count(*) AS BIGINT) FROM src
    UNION ALL
    SELECT 'shop', 'rogue_audit',
           'unknown_table: no catalog entry for shop.rogue_audit',
           CAST(count(*) AS BIGINT)
    FROM src WHERE k % 3 = 0
    UNION ALL
    SELECT 'shop', NULL, 'resolved', CAST(1 AS BIGINT)
    ORDER BY db, tbl NULLS FIRST, status
    """,
)
def cdc_quarantine_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter accounting for the CDC pipeline: one dump carrying
    catalog-known orders events, two rogue tables the catalog has
    never heard of, and a DDL statement — split by
    ``split_catalog_misses`` (sources/catalog.py) into the resolvable
    stream and the quarantine, then rolled up per (db, table, status).
    Pins the full contract in one hash: known tables resolve, EVERY
    rogue event is quarantined with its machine-readable reason (never
    silently dropped, never flowed into replay with ``@N`` columns or
    a NULL-derived store key), and DDL passes through untouched — a
    catalog miss is not an error for db-scoped passthrough (reference
    log2sql.py:13-14). The split is one broadcast anti/semi pair on
    the tiny catalog; the report aggregate is map-side combinable.
    Streaming twin (batch-keyed idempotent quarantine sink):
    tests/test_streaming.py::test_stream_apply_quarantines_catalog_misses.
    """
    from log2sql_spark.sources.binlog import read_binlog
    from log2sql_spark.sources.catalog import split_catalog_misses

    rows = _orders_subset(spark, sf_dir)
    events = []
    for r in rows:
        events.append(
            {"op": "insert", "db": "shop", "table": "orders",
             "ts": r["o_orderdate"], "values": _row_tokens(r)}
        )
        if r["o_orderkey"] % 3 == 0:
            events.append(
                {"op": "insert", "db": "shop", "table": "rogue_audit",
                 "ts": r["o_orderdate"],
                 "values": [(1, str(r["o_orderkey"])), (2, "'x'")]}
            )
        if r["o_orderkey"] % 5 == 0:
            events.append(
                {"op": "delete", "db": "legacy", "table": "ghost",
                 "ts": r["o_orderdate"],
                 "values": [(1, str(r["o_orderkey"]))]}
            )
    events.append(
        {"op": "ddl", "db": "shop", "ts": rows[0]["o_orderdate"],
         "statement": "ALTER TABLE audit_log ADD COLUMN note VARCHAR(64)"}
    )
    dump = _write_dump(events)
    envelope = read_binlog(spark, dump)
    cat = catalog_from_dict(spark, _CATALOG_SPEC)
    resolvable, quarantined = split_catalog_misses(envelope, cat)
    report = resolvable.withColumn("status", F.lit("resolved")).select(
        "db", F.col("table").alias("tbl"), "status"
    ).unionByName(
        quarantined.select(
            "db", F.col("table").alias("tbl"), F.col("reason").alias("status")
        )
    )
    return (
        report.groupBy("db", "tbl", "status")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.col("db"), F.col("tbl").asc_nulls_first(), F.col("status"))
    )
