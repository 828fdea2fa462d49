"""Debezium-envelope CDC ingestion — the transport real deployments use.

The binlog path (`sources/binlog.py`) parses mysqlbinlog text dumps;
production change streams instead arrive as Debezium JSON change events
on Kafka: one record per row image, `payload.op` ∈ {c,u,d,r},
`payload.before`/`payload.after` as name-keyed typed JSON objects, and
`payload.source` carrying (file, pos, ts_ms, gtid) binlog provenance.
Kafka's ordering contract is per-partition, and Debezium keys records by
primary key, so all events for one key share a partition and
(partition, offset) totally orders each key's history.

This module lands that transport in the engine's shared ENVELOPE_SCHEMA
(`sources/binlog.py`) so merge / SCD2 / GTID dedup / the streaming MV
apply run unchanged:

- ``file``      ← ``topic-<partition>`` (the ordering domain; for the
                  text path it is the dump file, for Kafka the partition)
- ``event_seq`` ← Kafka offset (monotone within the ordering domain)
- ``op``        ← c/r → insert, u → update, d → delete
- ``before``/``after`` ← the typed JSON objects coerced to
                  map<string,string> by `from_json` — canonical string
                  forms, name-keyed (the binlog path's ordinal-keyed maps
                  need `resolve_columns`; Debezium carries names in-band,
                  so the envelope is born resolved)
- ``start_pos``/``stop_pos`` ← ``source.pos``
- ``event_ts``  ← ``source.ts_ms`` (epoch millis)
- ``gtid``/``txn_seq`` ← ``source.gtid`` / ``transaction.total_order``

The "topic" here is a directory of JSONL files, each line
``{"partition": P, "offset": O, "key": K, "value": "<debezium json>"}``
— the exact column shape `spark.read(Stream).format("kafka")` yields
(value as a string instead of bytes). Swapping in real Kafka is the
documented one-line change in :func:`read_debezium_topic`; nothing in
this sandbox can host a broker, so the file simulation is what the
tests drive, and everything after the source columns is identical.

Reference analog: the reference consumes `mysqlbinlog` output only
(`main.py:88-105`); its commented-out `--stop-never` (`main.py:26-27`)
is the online mode whose real-world shape is exactly this transport.

All parsing is `from_json` with explicit schemas — JVM-side, no Python
in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The Kafka record shape (file-simulated): what format("kafka") returns,
# with `value` as string (Kafka gives bytes; CAST(value AS STRING) is
# the standard first step either way).
TOPIC_SCHEMA = T.StructType(
    [
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("key", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
    ]
)

# Debezium envelope payload: before/after stay map<string,string> (the
# from_json coercion renders typed JSON values in canonical string form)
# so one schema covers every table.
_PAYLOAD_SCHEMA = (
    "struct<payload: struct<"
    "before: map<string,string>, after: map<string,string>, "
    "source: struct<version: string, connector: string, name: string, "
    "ts_ms: bigint, db: string, table: string, server_id: bigint, "
    "gtid: string, file: string, pos: bigint, row: int, snapshot: string>, "
    "op: string, ts_ms: bigint, "
    "transaction: struct<id: string, total_order: bigint, "
    "data_collection_order: bigint>>>"
)


def read_debezium_topic(spark: SparkSession, path: str) -> DataFrame:
    """Batch-read a file-simulated topic directory (JSONL).

    Real Kafka swap-in::

        spark.read.format("kafka")
             .option("kafka.bootstrap.servers", ...)
             .option("subscribe", topic)
             .load()
             .select("partition", "offset",
                     F.col("key").cast("string").alias("key"),
                     F.col("value").cast("string").alias("value"))

    — every transformation downstream of these four columns is shared.
    """
    return spark.read.schema(TOPIC_SCHEMA).json(path)


def read_debezium_topic_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin of :func:`read_debezium_topic` (file discovery →
    micro-batches; real Kafka is the same four-column swap-in on
    ``spark.readStream.format("kafka")``)."""
    return spark.readStream.schema(TOPIC_SCHEMA).json(path)


def debezium_to_envelope(records: DataFrame, keep_key: bool = False) -> DataFrame:
    """(partition, offset, key, value) → the engine's envelope schema.

    Pure `from_json` + column mapping: one narrow JVM projection, no
    shuffle, no Python. The result is born name-keyed (no
    `resolve_columns` needed) and carries the binlog provenance Debezium
    preserves, so position/lag monitoring works unchanged. Tombstone
    records (null value — Kafka log-compaction markers Debezium emits
    after deletes) are dropped, as every consumer of the envelope
    expects row images. ``keep_key=True`` appends the Kafka record key
    as ``_kafka_key`` (Debezium keys records by primary key, so this IS
    the row's key — what a multi-table apply needs without a catalog).
    """
    p = F.from_json("value", _PAYLOAD_SCHEMA).getField("payload")
    extra = [F.col("key").alias("_kafka_key")] if keep_key else []
    return records.filter(F.col("value").isNotNull()).select(
        # Zero-padded: downstream ordering (dedup_by_gtid min(file), merge
        # version_cols) is lexicographic on `file`, and an unpadded
        # 'topic-10' < 'topic-2' would let a re-delivered copy on a
        # high-numbered partition outrank the key's home partition.
        F.format_string("topic-%05d", F.col("partition")).alias("file"),
        F.col("offset").alias("event_seq"),
        F.when(p.getField("op").isin("c", "r"), F.lit("insert"))
        .when(p.getField("op") == "u", F.lit("update"))
        .when(p.getField("op") == "d", F.lit("delete"))
        .otherwise(p.getField("op"))
        .alias("op"),
        p.getField("source").getField("db").alias("db"),
        p.getField("source").getField("table").alias("table"),
        p.getField("source").getField("pos").alias("start_pos"),
        p.getField("source").getField("pos").alias("stop_pos"),
        F.timestamp_millis(p.getField("source").getField("ts_ms")).alias("event_ts"),
        p.getField("before").alias("before"),
        p.getField("after").alias("after"),
        F.lit(None).cast("string").alias("statement"),
        p.getField("source").getField("gtid").alias("gtid"),
        p.getField("transaction").getField("total_order").alias("txn_seq"),
        *extra,
    ).filter(F.col("op").isNotNull())


def render_debezium_record(
    *,
    partition: int,
    offset: int,
    op: str,
    db: str,
    table: str,
    key: str,
    before: dict | None,
    after: dict | None,
    ts_ms: int,
    pos: int,
    gtid: str | None = None,
    txn_order: int | None = None,
) -> str:
    """Render ONE topic line (fixture/test scaffolding, driver-side only).

    Emits the documented Kafka-record shape with a faithful Debezium
    MySQL envelope as the value — the same nesting, field names and
    op codes a real connector produces — so the parse path is tested
    against the true wire format, not a convenient subset."""
    import json

    payload = {
        "before": before,
        "after": after,
        "source": {
            "version": "2.5.0.Final",
            "connector": "mysql",
            "name": "shop-server",
            "ts_ms": ts_ms,
            "db": db,
            "table": table,
            "server_id": 1,
            "gtid": gtid,
            "file": "mysql-bin.000001",
            "pos": pos,
            "row": 0,
            "snapshot": "false",
        },
        "op": op,
        "ts_ms": ts_ms,
        "transaction": (
            None
            if txn_order is None
            else {
                "id": gtid or f"txn-{txn_order}",
                "total_order": txn_order,
                "data_collection_order": 1,
            }
        ),
    }
    return json.dumps(
        {
            "partition": partition,
            "offset": offset,
            "key": key,
            "value": json.dumps({"payload": payload}),
        }
    )


def apply_debezium_topic(
    spark: SparkSession, path: str, key_col: str
) -> DataFrame:
    """Batch apply: fold a topic's whole history into final table state.

    Per-key last-writer-wins by (partition, offset) — valid because
    Debezium keys records by primary key, so one key's history lives in
    ONE partition and offsets totally order it. The fold is the
    single-shuffle max_by pattern: one aggregate per key picks the
    latest image, then delete-terminated keys drop. No window sort, no
    per-key state beyond the 1-row aggregate."""
    env = debezium_to_envelope(read_debezium_topic(spark, path))
    # latest op/image per key: order by event_seq (offset) within the
    # key's single partition; the key for deletes rides in `before`.
    keyed = env.select(
        F.coalesce(
            F.element_at("after", key_col), F.element_at("before", key_col)
        ).alias("_key"),
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
        .select("_key", "after")
    )


def sql_tokens(envelope: DataFrame) -> DataFrame:
    """Re-render the envelope's plain-string values as SQL literal
    tokens so the replay/flashback codegen (operators/cdc_codegen.py)
    runs unchanged on the Debezium transport.

    The binlog path's maps already carry SQL tokens (mysqlbinlog -vv
    prints them quoted); Debezium payloads are typed JSON, so after the
    from_json coercion a value is a bare canonical string. The literal
    rules here are a generic SQL renderer's: JSON null → ``NULL``
    (which the codegen's predicate builder turns into ``IS NULL``),
    numeric/boolean forms stay bare, everything else single-quotes with
    ``''`` escaping. Pure `transform_values` — JVM-side, no shuffle.
    """
    lit_re = r"^(-?[0-9]+(\.[0-9]+)?([eE]-?[0-9]+)?|true|false)$"

    def to_sql(m):
        return F.transform_values(
            m,
            lambda _, v: F.when(v.isNull(), F.lit("NULL"))
            .when(v.rlike(lit_re), v)
            .otherwise(
                F.concat(
                    F.lit("'"),
                    F.regexp_replace(v, "'", "''"),
                    F.lit("'"),
                )
            ),
        )

    return envelope.withColumn("before", to_sql(F.col("before"))).withColumn(
        "after", to_sql(F.col("after"))
    )
