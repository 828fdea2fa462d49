"""Kafka swap-in contract for the Debezium source.

No Kafka broker (or the spark-sql-kafka connector jar) is installable
in this container — `pip`/`apt` are off and there is no network — so
the swap-in cannot run against a live topic here. This test pins the
contract instead, at the exact seam the docstring documents:

1. KAFKA_SOURCE_SCHEMA below is the column shape Spark's
   ``format("kafka")`` source has returned since it was introduced
   (key/value BINARY, topic STRING, partition INT, offset LONG,
   timestamp TIMESTAMP, timestampType INT — fixed by the connector,
   not by topic contents).
2. The documented 4-column swap-in select from
   ``read_debezium_topic``'s docstring is applied VERBATIM to a
   DataFrame of that exact shape (bytes and all).
3. The result must round-trip through ``debezium_to_envelope``
   unchanged — same rows as the file-simulated path on identical
   records.

If a future environment does have the connector, the gate test below
starts reporting it so the live swap-in can replace this pin.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from log2sql_spark.sources.debezium import (
    TOPIC_SCHEMA,
    debezium_to_envelope,
    read_debezium_topic,
    render_debezium_record,
)

# The batch/streaming Kafka source's fixed output schema (Spark
# Structured Streaming + Kafka integration guide; stable across Spark
# 2.x-4.x). `headers` is opt-in via includeHeaders and excluded here.
KAFKA_SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("timestampType", T.IntegerType(), True),
    ]
)


def _swap_in_select(kafka_df):
    """The docstring's swap-in, verbatim: four columns, key/value cast
    from bytes. Everything downstream is shared with the file path."""
    return kafka_df.select(
        "partition",
        "offset",
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
    )


def _records():
    return [
        render_debezium_record(
            partition=0, offset=0, op="c", db="shop", table="orders", key="1",
            before=None, after={"id": 1, "status": "new", "amount": 100},
            ts_ms=1_700_000_000_000, pos=4, gtid="uuid:1", txn_order=1,
        ),
        render_debezium_record(
            partition=0, offset=1, op="u", db="shop", table="orders", key="1",
            before={"id": 1, "status": "new", "amount": 100},
            after={"id": 1, "status": "done", "amount": 110},
            ts_ms=1_700_000_001_000, pos=124,
        ),
        render_debezium_record(
            partition=1, offset=0, op="d", db="shop", table="orders", key="2",
            before={"id": 2, "status": "new", "amount": 50}, after=None,
            ts_ms=1_700_000_002_000, pos=244,
        ),
    ]


def test_swap_in_select_matches_file_path(spark, tmp_path):
    """A DataFrame with the REAL Kafka source schema (binary key/value),
    put through the documented select, parses to the identical envelope
    as the file-simulated topic on the same records — so the only
    difference between test and production is the reader, never the
    transform chain."""
    import datetime

    lines = _records()
    # Kafka-shaped rows: the JSONL's (partition, offset, key, value)
    # become the connector's columns, key/value as bytes.
    kafka_rows = []
    for line in lines:
        rec = json.loads(line)  # value is the envelope JSON, already a string
        kafka_rows.append(
            (
                rec["key"].encode(),
                rec["value"].encode(),
                "shop-server.shop.orders",
                rec["partition"],
                rec["offset"],
                datetime.datetime(2024, 5, 1, 12, 0, 0),
                0,
            )
        )
    kafka_df = spark.createDataFrame(kafka_rows, KAFKA_SOURCE_SCHEMA)
    selected = _swap_in_select(kafka_df)
    # contract: the select lands exactly on TOPIC_SCHEMA's columns/types
    assert [(f.name, f.dataType) for f in selected.schema.fields] == [
        (f.name, f.dataType) for f in TOPIC_SCHEMA.fields
    ]

    via_kafka = {
        tuple(r)
        for r in debezium_to_envelope(selected)
        .select("file", "event_seq", "op", "db", "table")
        .collect()
    }
    topic_dir = tmp_path / "t"
    topic_dir.mkdir()
    (topic_dir / "part-0.jsonl").write_text("\n".join(lines) + "\n")
    via_file = {
        tuple(r)
        for r in debezium_to_envelope(read_debezium_topic(spark, str(topic_dir)))
        .select("file", "event_seq", "op", "db", "table")
        .collect()
    }
    assert via_kafka == via_file
    assert len(via_kafka) == 3


def test_kafka_connector_absent_is_the_documented_refusal(spark, tmp_path):
    """Environment pin: format('kafka') is NOT loadable here (no
    connector jar, no installable broker), which is why the swap-in is
    contract-tested instead of run live. If this starts passing with a
    real connector, replace the pin with the live read."""
    err = None
    try:
        spark.read.format("kafka").option(
            "kafka.bootstrap.servers", "localhost:9092"
        ).option("subscribe", "t").load()
    except Exception as exc:  # noqa: BLE001
        err = str(exc)
    assert err is not None, (
        "format('kafka') loaded — a connector is now available; "
        "upgrade this contract test to a live swap-in read"
    )
    assert "kafka" in err.lower()
