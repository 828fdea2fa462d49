"""Debezium-envelope transport: parse, GTID dedup reuse, and the
restart-proof streaming MV fold running UNCHANGED on Kafka-shaped JSON
change events (sources/debezium.py) — the wire format real deployments
see, vs the reference's offline mysqlbinlog dumps (main.py:26-27)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from log2sql_spark.sources.debezium import (
    debezium_to_envelope,
    read_debezium_topic,
    render_debezium_record,
)


def _write_topic(path, records):
    path.mkdir(parents=True, exist_ok=True)
    by_part: dict[int, list[str]] = {}
    for rec in records:
        p = json.loads(rec)["partition"]
        by_part.setdefault(p, []).append(rec)
    for p, recs in by_part.items():
        (path / f"topic-{p}.jsonl").write_text("\n".join(recs) + "\n")


def test_envelope_mapping(spark, tmp_path):
    recs = [
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
            partition=0, offset=2, op="d", db="shop", table="orders", key="1",
            before={"id": 1, "status": "done", "amount": 110}, after=None,
            ts_ms=1_700_000_002_000, pos=244,
        ),
        # Kafka log-compaction tombstone: null value, must be dropped
        json.dumps({"partition": 0, "offset": 3, "key": "1", "value": None}),
        # snapshot read (op=r) maps to insert
        render_debezium_record(
            partition=1, offset=0, op="r", db="shop", table="orders", key="2",
            before=None, after={"id": 2, "status": "new", "amount": 50},
            ts_ms=1_700_000_000_500, pos=4,
        ),
    ]
    _write_topic(tmp_path / "t", recs)
    env = debezium_to_envelope(
        read_debezium_topic(spark, str(tmp_path / "t"))
    ).orderBy("file", "event_seq")
    rows = env.collect()
    assert [r.op for r in rows] == ["insert", "update", "delete", "insert"]
    assert rows[0].file == "topic-00000" and rows[0].event_seq == 0
    assert rows[0].after == {"id": "1", "status": "new", "amount": "100"}
    assert rows[0].before is None
    assert rows[0].gtid == "uuid:1" and rows[0].txn_seq == 1
    assert rows[0].start_pos == 4 and rows[0].stop_pos == 4
    assert rows[0].event_ts.year == 2023  # ts_ms decoded, not epoch-seconds
    assert rows[1].before["status"] == "new" and rows[1].after["status"] == "done"
    assert rows[2].after is None and rows[2].before["amount"] == "110"
    assert rows[3].file == "topic-00001" and rows[3].op == "insert"
    # column names match the engine envelope exactly
    from log2sql_spark.sources.binlog import ENVELOPE_SCHEMA

    assert env.columns == [f.name for f in ENVELOPE_SCHEMA.fields]


def test_gtid_dedup_runs_unchanged_on_debezium(spark, tmp_path):
    """An overlapping re-delivery on another partition file carries the
    same GTIDs; dedup_by_gtid (written for binlog dumps) must keep one
    copy per transaction with zero changes."""
    from log2sql_spark.operators.cdc_filters import dedup_by_gtid

    base = dict(op="c", db="shop", table="orders", before=None,
                ts_ms=1_700_000_000_000)
    recs = [
        render_debezium_record(partition=0, offset=0, key="1", pos=4,
                               after={"id": 1, "amount": 100},
                               gtid="uuid:1", **base),
        render_debezium_record(partition=0, offset=1, key="3", pos=124,
                               after={"id": 3, "amount": 70},
                               gtid="uuid:2", **base),
        # re-dump of transaction uuid:1 on partition 9
        render_debezium_record(partition=9, offset=0, key="1", pos=4,
                               after={"id": 1, "amount": 100},
                               gtid="uuid:1", **base),
    ]
    _write_topic(tmp_path / "t", recs)
    env = debezium_to_envelope(read_debezium_topic(spark, str(tmp_path / "t")))
    assert env.count() == 3
    kept = dedup_by_gtid(env).select("file", "gtid").collect()
    assert len(kept) == 2
    assert {(r.file, r.gtid) for r in kept} == {
        ("topic-00000", "uuid:1"), ("topic-00000", "uuid:2"),
    }


def test_maintain_mv_stream_debezium_restart(spark, tmp_path):
    """The streaming MV fold (delta IVM + batch-id exactly-once) on the
    Debezium transport, across a restart: batch 1 folds inserts, batch 2
    (new topic file after restart) folds a group-moving update + a
    delete. Same assertions as the binlog twin test_maintain_mv_stream —
    the transport is the only thing that changed."""
    from log2sql_spark.store import SnapshotStore
    from log2sql_spark.streaming.cdc_stream import maintain_mv_stream

    in_dir, store_dir, ckpt = tmp_path / "in", tmp_path / "mv", tmp_path / "ckpt"
    base = dict(db="shop", table="orders", ts_ms=1_700_000_000_000)
    _write_topic(in_dir, [
        render_debezium_record(partition=0, offset=0, op="c", key="1", pos=4,
                               before=None,
                               after={"id": 1, "status": "new", "amount": 100},
                               **base),
        render_debezium_record(partition=0, offset=1, op="c", key="2", pos=124,
                               before=None,
                               after={"id": 2, "status": "new", "amount": 50},
                               **base),
        render_debezium_record(partition=1, offset=0, op="c", key="3", pos=244,
                               before=None,
                               after={"id": 3, "status": "done", "amount": 70},
                               **base),
        # an unrelated table in the same topic must not leak into the MV
        render_debezium_record(partition=2, offset=0, op="c", key="9", pos=364,
                               db="other", table="t", ts_ms=1_700_000_000_000,
                               before=None, after={"id": 9, "amount": 999}),
    ])
    q = maintain_mv_stream(spark, str(in_dir), None, str(store_dir), str(ckpt),
                           group_col="status", sum_col="amount",
                           database="shop", table="orders",
                           transport="debezium")
    q.awaitTermination(120)
    store = SnapshotStore(str(store_dir))
    mv = {r.status: (r.n, r.sum_amount) for r in store.read(spark).collect()}
    assert mv == {"new": (2, 150), "done": (1, 70)}

    # batch 2 after restart: group-moving update + delete on a new file
    _write_topic(in_dir, [
        render_debezium_record(partition=3, offset=0, op="u", key="1", pos=484,
                               before={"id": 1, "status": "new", "amount": 100},
                               after={"id": 1, "status": "done", "amount": 110},
                               **base),
        render_debezium_record(partition=3, offset=1, op="d", key="2", pos=604,
                               before={"id": 2, "status": "new", "amount": 50},
                               after=None, **base),
    ])
    q2 = maintain_mv_stream(spark, str(in_dir), None, str(store_dir), str(ckpt),
                            group_col="status", sum_col="amount",
                            database="shop", table="orders",
                            transport="debezium")
    q2.awaitTermination(120)
    mv2 = {r.status: (r.n, r.sum_amount) for r in store.read(spark).collect()}
    assert mv2 == {"done": (2, 180)}  # 'new' hit zero and dropped out
    head = store.snapshot(store.head_version())
    assert head.meta["batch_id"] >= 1

    # exactly-once on a THIRD run with no new data: the checkpoint
    # yields no batch, the MV must not double-fold
    q3 = maintain_mv_stream(spark, str(in_dir), None, str(store_dir), str(ckpt),
                            group_col="status", sum_col="amount",
                            database="shop", table="orders",
                            transport="debezium")
    q3.awaitTermination(120)
    mv3 = {r.status: (r.n, r.sum_amount) for r in store.read(spark).collect()}
    assert mv3 == mv2


def test_apply_to_snapshot_store_debezium_multitable(spark, tmp_path):
    """foreachBatch -> MERGE INTO the snapshot store on the Debezium
    transport, multi-table (key_col=None) with NO catalog — the key is
    db.table + the Kafka record key Debezium derives from the primary
    key. Update wins over insert by (partition, pos, offset) ordering;
    a second run with no new data commits nothing."""
    from log2sql_spark.store import SnapshotStore
    from log2sql_spark.streaming.cdc_stream import apply_changes_to_snapshot_store

    in_dir, store_dir, ckpt = tmp_path / "in", tmp_path / "store", tmp_path / "ckpt"
    base = dict(ts_ms=1_700_000_000_000)
    _write_topic(in_dir, [
        render_debezium_record(partition=0, offset=0, op="c", key="1", pos=4,
                               db="shop", table="orders", before=None,
                               after={"id": 1, "status": "new"}, **base),
        render_debezium_record(partition=0, offset=1, op="u", key="1", pos=124,
                               db="shop", table="orders",
                               before={"id": 1, "status": "new"},
                               after={"id": 1, "status": "done"}, **base),
        # same key value in ANOTHER table must not collide
        render_debezium_record(partition=1, offset=0, op="c", key="1", pos=244,
                               db="shop", table="users", before=None,
                               after={"uid": 1, "name": "ann"}, **base),
    ])

    def run():
        q = apply_changes_to_snapshot_store(
            spark, str(in_dir), None, str(store_dir), str(ckpt),
            key_col=None, transport="debezium",
        )
        q.awaitTermination(120)

    run()
    store = SnapshotStore(str(store_dir))
    rows = {r.key: dict(r.after) for r in store.read(spark).collect()}
    assert rows == {
        "shop.orders:1": {"id": "1", "status": "done"},
        "shop.users:1": {"uid": "1", "name": "ann"},
    }
    v1 = store.head_version()
    run()  # no new data: no new version
    assert store.head_version() == v1


def test_partition_file_order_is_numeric(spark, tmp_path):
    """Regression: with >=10 partitions the envelope `file` must sort
    numerically — an unpadded 'topic-10' < 'topic-2' let a stale
    re-delivered copy on partition 10 outrank the home partition 2 in
    dedup_by_gtid's min(file) pick and in merge version ordering."""
    from log2sql_spark.operators.cdc_filters import dedup_by_gtid

    base = dict(op="c", db="shop", table="orders", before=None,
                ts_ms=1_700_000_000_000)
    recs = [
        # home delivery on partition 2
        render_debezium_record(partition=2, offset=0, key="1", pos=4,
                               after={"id": 1, "amount": 100},
                               gtid="uuid:7", **base),
        # stale re-delivery on partition 10 (lexicographically earlier
        # than 'topic-2' when unpadded)
        render_debezium_record(partition=10, offset=0, key="1", pos=4,
                               after={"id": 1, "amount": 100},
                               gtid="uuid:7", **base),
    ]
    _write_topic(tmp_path / "t", recs)
    env = debezium_to_envelope(read_debezium_topic(spark, str(tmp_path / "t")))
    files = sorted(r.file for r in env.select("file").collect())
    assert files == ["topic-00002", "topic-00010"]  # numeric == lexicographic
    kept = dedup_by_gtid(env).select("file").collect()
    assert [r.file for r in kept] == ["topic-00002"]
