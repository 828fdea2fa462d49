"""Streaming semantics tests: real readStream/writeStream micro-batch
runs — online CDC ingestion, incremental restarts, watermark late-data
drops, cross-batch keyed state (SURVEY.md §5.2 item 4)."""

from __future__ import annotations

import time
from datetime import datetime

import pytest

from log2sql_spark.sources.binlog_fixture import render_binlog
from log2sql_spark.sources.catalog import catalog_from_dict
from log2sql_spark.streaming.cdc_stream import apply_changes_to_state, stream_binlog_to_sql

CATALOG = {"shop.orders": {"columns": ["id", "status"], "key_columns": ["id"]}}
TS = datetime(2024, 5, 1, 12, 0, 7)


def _dump(path, events):
    path.write_text(render_binlog(events))


def test_stream_binlog_to_sql_and_incremental_restart(spark, tmp_path):
    in_dir, out_dir, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    in_dir.mkdir()
    cat = catalog_from_dict(spark, CATALOG)

    _dump(in_dir / "bin.000001.txt", [
        {"op": "insert", "db": "shop", "table": "orders", "ts": TS, "values": [(1, "1"), (2, "'a'")]},
    ])
    _dump(in_dir / "bin.000002.txt", [
        {"op": "insert", "db": "shop", "table": "orders", "ts": TS, "values": [(1, "2"), (2, "'b'")]},
    ])
    q = stream_binlog_to_sql(spark, str(in_dir), cat, str(out_dir), str(ckpt))
    q.awaitTermination(120)
    got = {r["sql_text"] for r in spark.read.parquet(str(out_dir)).collect()}
    assert got == {
        "INSERT INTO `shop`.`orders`(`id`, `status`) VALUES (1, 'a');",
        "INSERT INTO `shop`.`orders`(`id`, `status`) VALUES (2, 'b');",
    }

    # restart with the same checkpoint: only the NEW file is processed
    _dump(in_dir / "bin.000003.txt", [
        {"op": "delete", "db": "shop", "table": "orders", "ts": TS, "values": [(1, "1"), (2, "'a'")]},
    ])
    q2 = stream_binlog_to_sql(spark, str(in_dir), cat, str(out_dir), str(ckpt))
    q2.awaitTermination(120)
    rows = spark.read.parquet(str(out_dir)).collect()
    assert len(rows) == 3  # no reprocessing of files 1-2
    assert "DELETE FROM `shop`.`orders` WHERE `id`=1 LIMIT 1;" in {r["sql_text"] for r in rows}


def test_apply_changes_maintains_latest_state(spark, tmp_path):
    in_dir, state, ckpt = tmp_path / "in", tmp_path / "state", tmp_path / "ckpt"
    in_dir.mkdir()
    cat = catalog_from_dict(spark, CATALOG)
    _dump(in_dir / "bin.000001.txt", [
        {"op": "insert", "db": "shop", "table": "orders", "ts": TS, "values": [(1, "1"), (2, "'new'")]},
        {"op": "insert", "db": "shop", "table": "orders", "ts": TS, "values": [(1, "2"), (2, "'new'")]},
        {"op": "update", "db": "shop", "table": "orders", "ts": TS,
         "before": [(1, "1"), (2, "'new'")], "after": [(1, "1"), (2, "'shipped'")]},
        {"op": "delete", "db": "shop", "table": "orders", "ts": TS, "values": [(1, "2"), (2, "'new'")]},
    ])
    q = apply_changes_to_state(spark, str(in_dir), cat, str(state), str(ckpt), key_col="id")
    q.awaitTermination(120)
    rows = {r["key"]: r["after"] for r in spark.read.parquet(str(state)).collect()}
    assert rows == {"1": {"id": "1", "status": "'shipped'"}}


def test_watermark_drops_late_rows(spark, tmp_path, state_provider):
    """Append-mode windowed agg with watermark: a row older than the
    watermark arriving in a later micro-batch is dropped."""
    import pandas as pd

    in_dir = tmp_path / "ev"
    in_dir.mkdir()
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ])

    def write_file(name, rows):
        pdf = pd.DataFrame(rows, columns=["ts", "event_type", "user_id", "value"])
        spark.createDataFrame(pdf, schema).coalesce(1).write.mode("append").json(
            str(in_dir / name)
        )

    t = lambda m, s=0: datetime(2024, 5, 1, 10, m, s)  # noqa: E731
    # The late-event filter uses the previous batch's watermark (Spark
    # 3.4+ separates late-event vs eviction watermarks), so the late row
    # must arrive two batches after the advance to be deterministically
    # dropped — hence three files.
    write_file("f1", [
        (t(0), "click", 1, 1.0),
        (t(2), "click", 2, 1.0),
        (t(20), "click", 3, 1.0),  # advances watermark to 10:15
    ])
    write_file("f2", [(t(25), "click", 4, 1.0)])
    write_file("f3", [
        (t(1), "late", 9, 99.0),   # far behind watermark -> dropped
        (t(40), "click", 5, 1.0),
    ])
    # set mtimes so the file source orders f1 < f2 < f3
    import os

    now = time.time()
    for i, name in enumerate(["f1", "f2", "f3"]):
        d = in_dir / name
        for p in d.iterdir():
            os.utime(p, (now - 100 + i * 30, now - 100 + i * 30))

    from log2sql_spark.streaming.windows import tumbling_counts

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")  # one file per micro-batch so the
        .json(str(in_dir / "*"))            # watermark advances between f1 and f2
    )
    agg = tumbling_counts(stream, width="5 minutes", watermark="5 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {
        (r["window_start"].minute, r["event_type"]): r["n_events"]
        for r in spark.sql("select * from wm_test").collect()
    }
    # the 10:00-10:05 window must contain only the 2 on-time clicks;
    # the late 10:01 row from f2 must NOT appear anywhere
    assert out.get((0, "click")) == 2
    assert all(et != "late" for (_, et) in out)


def test_running_user_totals_accumulate_across_batches(spark, tmp_path, state_provider):
    """applyInPandasWithState keeps per-user totals across micro-batches."""
    import os

    import pandas as pd
    from pyspark.sql import types as T

    in_dir = tmp_path / "st"
    in_dir.mkdir()
    schema = T.StructType([
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ])

    def write_file(name, rows, mtime):
        pdf = pd.DataFrame(rows, columns=["ts", "user_id", "value"])
        d = in_dir / name
        spark.createDataFrame(pdf, schema).coalesce(1).write.mode("append").json(str(d))
        for p in d.iterdir():
            os.utime(p, (mtime, mtime))

    now = time.time()
    write_file("b1", [(TS, 1, 1.50), (TS, 1, 2.25), (TS, 2, 10.0)], now - 100)
    write_file("b2", [(TS, 1, 0.25), (TS, 3, 5.0)], now - 50)

    from log2sql_spark.streaming.stateful import running_user_totals

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(in_dir / "*"))
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("totals_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    pdf = spark.sql(
        "select user_id, max(events_seen) es, max(total_value_cents) c"
        " from totals_test group by user_id"
    ).collect()
    got = {r["user_id"]: (r["es"], r["c"]) for r in pdf}
    assert got[1] == (3, 400)   # 1.50+2.25+0.25 across two batches
    assert got[2] == (1, 1000)
    assert got[3] == (1, 500)


def test_apply_changes_survives_file_rotation(spark, tmp_path):
    """start_pos restarts per binlog file: a later file's early event
    (small start_pos) must still beat an earlier file's late event in
    one micro-batch — ordering is (file, start_pos, event_seq), never
    start_pos alone."""
    in_dir, state, ckpt = tmp_path / "in", tmp_path / "state", tmp_path / "ckpt"
    in_dir.mkdir()
    cat = catalog_from_dict(spark, CATALOG)
    # file 1: many events push start_pos high before updating key 1
    _dump(in_dir / "bin.000001.txt", [
        {"op": "insert", "db": "shop", "table": "orders", "ts": TS,
         "values": [(1, str(i)), (2, "'seed'")]} for i in range(2, 9)
    ] + [
        {"op": "insert", "db": "shop", "table": "orders", "ts": TS,
         "values": [(1, "1"), (2, "'from_file1'")]},
    ])
    # file 2 (rotation): positions restart near 4; updates the same key
    _dump(in_dir / "bin.000002.txt", [
        {"op": "update", "db": "shop", "table": "orders", "ts": TS,
         "before": [(1, "1"), (2, "'from_file1'")],
         "after": [(1, "1"), (2, "'from_file2'")]},
    ])
    q = apply_changes_to_state(spark, str(in_dir), cat, str(state), str(ckpt), key_col="id")
    q.awaitTermination(120)
    rows = {r["key"]: r["after"]["status"] for r in spark.read.parquet(str(state)).collect()}
    assert rows["1"] == "'from_file2'"


def test_stream_parse_survives_multipartition_file(spark, tmp_path):
    """Round-1 hazard: a dump file big enough for the streaming text
    source to split across many input partitions. Line order must come
    from the wholetext re-read, not partition enumeration. Forcing
    maxPartitionBytes to 1KB makes the old monotonically_increasing_id
    reconstruction see dozens of partitions for one file."""
    in_dir, out_dir, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    in_dir.mkdir()
    # keyless catalog: WHERE carries the full before-image, so the
    # rendered SQL exposes the before/after line pairing.
    cat = catalog_from_dict(
        spark, {"shop.orders": {"columns": ["id", "status"], "key_columns": []}}
    )
    # 300 updates whose before/after chain encodes line order: row i
    # updates status 'v{i-1}' -> 'v{i}', so any line reordering breaks
    # the rendered WHERE/SET pairing.
    events = [
        {"op": "update", "db": "shop", "table": "orders", "ts": TS,
         "before": [(1, "1"), (2, f"'v{i-1}'")], "after": [(1, "1"), (2, f"'v{i}'")]}
        for i in range(1, 301)
    ]
    _dump(in_dir / "bin.000001.txt", events)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
    try:
        q = stream_binlog_to_sql(spark, str(in_dir), cat, str(out_dir), str(ckpt))
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    rows = spark.read.parquet(str(out_dir)).orderBy("event_seq").collect()
    assert len(rows) == 300
    for i, r in enumerate(rows, start=1):
        assert r["sql_text"] == (
            "UPDATE `shop`.`orders` SET `id`=1, `status`='v%d' "
            "WHERE `id`=1 AND `status`='v%d' LIMIT 1;" % (i, i - 1)
        ), r["sql_text"]


def test_stream_static_join_runs_as_stream(spark, tmp_path):
    """static_enrich_counts on a real readStream: the static dimension
    broadcasts per micro-batch, no state store needed for the join."""
    import pandas as pd

    from log2sql_spark.streaming.windows import static_enrich_counts

    ev_dir = tmp_path / "ev"
    pd.DataFrame(
        {
            "ts": pd.to_datetime(["2024-05-01 12:00:00", "2024-05-01 12:01:00"]),
            "user_id": [1, 2],
            "event_type": ["click", "view"],
            "value": [1.5, 2.25],
        }
    ).to_parquet(ev_dir / "part0.parquet") if ev_dir.mkdir() is None else None
    dim = spark.createDataFrame(
        [(1, "BUILDING"), (2, "MACHINERY")], ["c_custkey", "c_mktsegment"]
    )
    stream = spark.readStream.schema(
        "ts timestamp, user_id long, event_type string, value double"
    ).parquet(str(ev_dir))
    q = (
        static_enrich_counts(stream, dim)
        .writeStream.format("memory")
        .queryName("enrich_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r["c_mktsegment"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM enrich_out").collect()
    }
    assert rows == {("BUILDING", "click"): (1, 1.5), ("MACHINERY", "view"): (1, 2.25)}


def test_binlog_stream_datasource(spark, tmp_path):
    """readStream.format('binlog'): files picked up in rotation order
    across restarts, offset = last file name in the checkpoint."""
    in_dir, out, ckpt = tmp_path / "in", tmp_path / "o", tmp_path / "c"
    in_dir.mkdir()
    _dump(in_dir / "mysql-bin.000001.txt", [
        {"op": "insert", "db": "shop", "table": "orders", "ts": TS, "values": [(1, "1")]},
    ])
    _dump(in_dir / "mysql-bin.000002.txt", [
        {"op": "delete", "db": "shop", "table": "orders", "ts": TS, "values": [(1, "2")]},
    ])

    def run():
        q = (
            spark.readStream.format("binlog")
            .load(str(in_dir))
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    got = {(r["op"], r["file"].rsplit("/", 1)[-1])
           for r in spark.read.parquet(str(out)).collect()}
    assert got == {("insert", "mysql-bin.000001.txt"), ("delete", "mysql-bin.000002.txt")}

    # restart: only the NEW rotation file is read
    _dump(in_dir / "mysql-bin.000003.txt", [
        {"op": "insert", "db": "shop", "table": "orders", "ts": TS, "values": [(1, "3")]},
    ])
    run()
    rows = spark.read.parquet(str(out)).collect()
    assert len(rows) == 3


def test_drop_duplicates_within_watermark_stream(spark, tmp_path, state_provider):
    """Real dropDuplicatesWithinWatermark run: duplicates of a key
    arriving within the watermark window are suppressed across
    micro-batches; the state for expired keys is dropped (the streaming
    twin of the batch stream_dedup query)."""
    import pandas as pd

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    pd.DataFrame(
        {
            "ts": pd.to_datetime(["2024-05-01 12:00:00", "2024-05-01 12:00:30"]),
            "event_id": [1, 1],  # duplicate within the window
            "v": [10, 11],
        }
    ).to_parquet(in_dir / "b0.parquet", coerce_timestamps="us")
    stream = (
        spark.readStream.schema("ts timestamp, event_id long, v long")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(in_dir))
    )
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM dedup_out").collect()
    assert len(rows) == 1 and rows[0]["event_id"] == 1


def test_apply_changes_to_snapshot_store(spark, tmp_path):
    from log2sql_spark.store import SnapshotStore
    from log2sql_spark.streaming.cdc_stream import apply_changes_to_snapshot_store

    in_dir, store_dir, ckpt = tmp_path / "in", tmp_path / "snapstore", tmp_path / "ckpt"
    in_dir.mkdir()
    cat = catalog_from_dict(spark, CATALOG)
    _dump(in_dir / "bin.000001.txt", [
        {"op": "insert", "db": "shop", "table": "orders", "ts": TS, "values": [(1, "1"), (2, "'new'")]},
        {"op": "insert", "db": "shop", "table": "orders", "ts": TS, "values": [(1, "2"), (2, "'new'")]},
        {"op": "update", "db": "shop", "table": "orders", "ts": TS,
         "before": [(1, "1"), (2, "'new'")], "after": [(1, "1"), (2, "'shipped'")]},
    ])
    q = apply_changes_to_snapshot_store(spark, str(in_dir), cat, str(store_dir), str(ckpt), key_col="id")
    q.awaitTermination(120)
    # the observe() audit: per-batch input FILE counts ride the
    # streaming progress, no second scan (the discovery stream is one
    # row per file since it moved to binaryFile; content is re-read
    # wholetext inside the batch)
    audited = sum(
        p["observedMetrics"]["cdc_audit"]["n_lines"]
        for p in q.recentProgress
        if p.get("observedMetrics", {}).get("cdc_audit")
    )
    assert audited == 1  # one dump file in this batch
    store = SnapshotStore(str(store_dir))
    head1 = store.head_version()
    rows = {r["key"]: r["after"] for r in store.read(spark).select("key", "after").collect()}
    assert rows == {"1": {"id": "1", "status": "'shipped'"},
                    "2": {"id": "2", "status": "'new'"}}

    # second micro-batch (restart, new file): delete key 2 — new snapshot,
    # and the pre-delete state stays time-travelable
    _dump(in_dir / "bin.000002.txt", [
        {"op": "delete", "db": "shop", "table": "orders", "ts": TS, "values": [(1, "2"), (2, "'new'")]},
    ])
    q2 = apply_changes_to_snapshot_store(spark, str(in_dir), cat, str(store_dir), str(ckpt), key_col="id")
    q2.awaitTermination(120)
    assert store.head_version() > head1
    assert [r["key"] for r in store.read(spark).select("key").collect()] == ["1"]
    old = {r["key"] for r in store.read(spark, version=head1).select("key").collect()}
    assert old == {"1", "2"}


def test_maintain_mv_stream(spark, tmp_path):
    from log2sql_spark.store import SnapshotStore
    from log2sql_spark.streaming.cdc_stream import maintain_mv_stream

    in_dir, store_dir, ckpt = tmp_path / "in", tmp_path / "mv", tmp_path / "ckpt"
    in_dir.mkdir()
    cat = catalog_from_dict(
        spark,
        {"shop.orders": {"columns": ["id", "status", "amount"], "key_columns": ["id"]}},
    )
    _dump(in_dir / "bin.000001.txt", [
        {"op": "insert", "db": "shop", "table": "orders", "ts": TS,
         "values": [(1, "1"), (2, "'new'"), (3, "100")]},
        {"op": "insert", "db": "shop", "table": "orders", "ts": TS,
         "values": [(1, "2"), (2, "'new'"), (3, "50")]},
        {"op": "insert", "db": "shop", "table": "orders", "ts": TS,
         "values": [(1, "3"), (2, "'done'"), (3, "70")]},
    ])
    # an unrelated table in the same dump must not leak into the MV
    _dump(in_dir / "bin.000000.txt", [
        {"op": "insert", "db": "other", "table": "t", "ts": TS,
         "values": [(1, "9")]},
    ])
    q = maintain_mv_stream(spark, str(in_dir), cat, str(store_dir), str(ckpt),
                           group_col="status", sum_col="amount",
                           database="shop", table="orders")
    q.awaitTermination(120)
    store = SnapshotStore(str(store_dir))
    mv = {r.status: (r.n, r.sum_amount) for r in store.read(spark).collect()}
    assert mv == {"'new'": (2, 150), "'done'": (1, 70)}

    # batch 2 after restart: group-moving update + delete
    _dump(in_dir / "bin.000002.txt", [
        {"op": "update", "db": "shop", "table": "orders", "ts": TS,
         "before": [(1, "1"), (2, "'new'"), (3, "100")],
         "after": [(1, "1"), (2, "'done'"), (3, "110")]},
        {"op": "delete", "db": "shop", "table": "orders", "ts": TS,
         "values": [(1, "2"), (2, "'new'"), (3, "50")]},
    ])
    q2 = maintain_mv_stream(spark, str(in_dir), cat, str(store_dir), str(ckpt),
                            group_col="status", sum_col="amount",
                            database="shop", table="orders")
    q2.awaitTermination(120)
    mv2 = {r.status: (r.n, r.sum_amount) for r in store.read(spark).collect()}
    assert mv2 == {"'done'": (2, 180)}  # 'new' hit zero and dropped out
    assert store.snapshot(store.head_version()).meta["batch_id"] >= 1


def test_apply_snapshot_store_multi_table(spark, tmp_path):
    from log2sql_spark.store import SnapshotStore
    from log2sql_spark.streaming.cdc_stream import apply_changes_to_snapshot_store

    in_dir, store_dir, ckpt = tmp_path / "in", tmp_path / "mt", tmp_path / "ckpt"
    in_dir.mkdir()
    cat = catalog_from_dict(spark, {
        "shop.orders": {"columns": ["id", "status"], "key_columns": ["id"]},
        "shop.users": {"columns": ["uid", "name"], "key_columns": ["uid"]},
    })
    _dump(in_dir / "bin.000001.txt", [
        {"op": "insert", "db": "shop", "table": "orders", "ts": TS,
         "values": [(1, "1"), (2, "'new'")]},
        {"op": "insert", "db": "shop", "table": "users", "ts": TS,
         "values": [(1, "1"), (2, "'ann'")]},  # same key value, other table
        {"op": "update", "db": "shop", "table": "users", "ts": TS,
         "before": [(1, "1"), (2, "'ann'")], "after": [(1, "1"), (2, "'anne'")]},
    ])
    q = apply_changes_to_snapshot_store(
        spark, str(in_dir), cat, str(store_dir), str(ckpt), key_col=None
    )
    q.awaitTermination(120)
    rows = {r.key: r.after for r in SnapshotStore(str(store_dir)).read(spark).collect()}
    # the same key VALUE under two tables stays two independent rows
    assert rows == {
        "shop.orders:1": {"id": "1", "status": "'new'"},
        "shop.users:1": {"uid": "1", "name": "'anne'"},
    }


def test_stream_apply_auto_compacts(spark, tmp_path):
    """Continuous ingest with a tiny auto-compact threshold: after
    several micro-batches the store must have been rewritten into few
    files, with the data exactly intact."""
    from log2sql_spark.store import SnapshotStore
    from log2sql_spark.streaming.cdc_stream import apply_changes_to_snapshot_store

    in_dir, store_dir, ckpt = tmp_path / "in", tmp_path / "acstore", tmp_path / "ckpt"
    in_dir.mkdir()
    cat = catalog_from_dict(spark, CATALOG)
    for b in range(4):
        _dump(in_dir / f"bin.{b:06d}.txt", [
            {"op": "insert", "db": "shop", "table": "orders", "ts": TS,
             "values": [(1, str(100 * b + i)), (2, "'new'")]}
            for i in range(5)
        ])
        q = apply_changes_to_snapshot_store(
            spark, str(in_dir), cat, str(store_dir), str(ckpt),
            key_col="id", auto_compact_files=6,
        )
        q.awaitTermination(120)

    store = SnapshotStore(str(store_dir))
    assert store.read(spark).count() == 20
    assert store.file_count() <= 10, (
        f"auto-compact never fired: {store.file_count()} files"
    )
    # a compaction appears in history as an overwrite commit
    assert any(h["mode"] == "overwrite" and h["version"] > 1 for h in store.history())


def test_streaming_ohlc_bars(spark, tmp_path, state_provider):
    """The OHLC builder runs INCREMENTALLY: two micro-batches of ticks
    produce the same bars as one batch pass over all rows (min_by /
    max_by state merges across batches)."""
    import json as _json

    from log2sql_spark.streaming.windows import ohlc_bars

    in_dir, out_dir, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    in_dir.mkdir()
    rows1 = [
        {"event_id": 1, "ts": "2024-03-01T10:05:00", "event_type": "trade", "value": 5.0},
        {"event_id": 2, "ts": "2024-03-01T10:10:00", "event_type": "trade", "value": 9.0},
    ]
    rows2 = [
        {"event_id": 3, "ts": "2024-03-01T10:20:00", "event_type": "trade", "value": 1.0},
        {"event_id": 4, "ts": "2024-03-01T10:40:00", "event_type": "trade", "value": 7.0},
    ]

    def run():
        stream = (
            spark.readStream.schema(
                "event_id bigint, ts timestamp, event_type string, value double"
            ).json(str(in_dir))
        )
        q = (
            ohlc_bars(stream, width="1 hour", watermark="2 hours")
            .writeStream.format("memory")
            .queryName("ohlc_sink")
            .outputMode("complete")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    with open(in_dir / "b0.json", "w") as f:
        for r in rows1:
            f.write(_json.dumps(r) + "\n")
    run()
    with open(in_dir / "b1.json", "w") as f:
        for r in rows2:
            f.write(_json.dumps(r) + "\n")
    run()
    (bar,) = spark.sql("SELECT * FROM ohlc_sink").collect()
    # open from event 1, close from event 4 — state merged across batches
    assert (
        bar.open_cents, bar.high_cents, bar.low_cents, bar.close_cents, bar.volume
    ) == (500, 900, 100, 700, 4)


def test_timed_out_sessions_flush_and_evict(spark, tmp_path, state_provider):
    """EventTimeTimeout sessionization: sessions emit only after the
    watermark passes last-activity+gap, state is evicted on flush, and
    the custom payload (purchase flag) rides out with the session."""
    import os
    import time
    from datetime import datetime, timedelta

    import pandas as pd
    from pyspark.sql import types as T

    from log2sql_spark.streaming.stateful import timed_out_sessions

    src = tmp_path / "sess_src"
    out = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "sess_ckpt")
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    t0 = datetime(2024, 6, 1, 9, 0)

    def write(rows):
        pdf = pd.DataFrame(rows, columns=["ts", "user_id", "event_type"])
        spark.createDataFrame(pdf, schema).coalesce(1).write.mode("append").json(str(src))
        now = time.time()
        for p in src.iterdir():
            os.utime(p, (now, now))

    def run_once():
        stream = spark.readStream.schema(schema).json(str(src))
        q = (
            timed_out_sessions(stream, gap_minutes=30, watermark="5 minutes")
            .writeStream.format("json")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write([
        (t0, 1, "view"),
        (t0 + timedelta(minutes=5), 1, "purchase"),
        (t0 + timedelta(minutes=2), 2, "view"),
    ])
    run_once()  # watermark hasn't passed gap: nothing flushed yet

    write([(t0 + timedelta(hours=6), 99, "view")])  # advance watermark
    run_once()  # users 1 and 2 time out and flush

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("has_purchase", T.BooleanType()),
        ]
    )
    rows = {
        r.user_id: r
        for r in spark.read.schema(out_schema).json(out).filter("user_id < 90").collect()
    }
    assert set(rows) == {1, 2}
    assert rows[1].n_events == 2 and rows[1].has_purchase is True
    assert rows[2].n_events == 1 and rows[2].has_purchase is False
    assert rows[1].session_end.minute == 5


def test_stateful_ops_on_rocksdb_state_store(spark, tmp_path):
    """The at-scale state backend: the same stateful session operator
    must run (and keep exactly-once flush semantics) under the RocksDB
    state store provider — heap state dies at 100 TB key spaces; this
    proves the operators aren't accidentally coupled to the default
    HDFS-backed heap provider."""
    import os
    import time
    from datetime import datetime, timedelta

    import pandas as pd
    from pyspark.sql import types as T

    from log2sql_spark.streaming.stateful import timed_out_sessions

    src = tmp_path / "rdb_src"
    out = str(tmp_path / "rdb_out")
    ckpt = str(tmp_path / "rdb_ckpt")
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    t0 = datetime(2024, 6, 1, 9, 0)

    def write(rows):
        pdf = pd.DataFrame(rows, columns=["ts", "user_id", "event_type"])
        spark.createDataFrame(pdf, schema).coalesce(1).write.mode("append").json(str(src))
        now = time.time()
        for p in src.iterdir():
            os.utime(p, (now, now))

    def run_once():
        stream = spark.readStream.schema(schema).json(str(src))
        q = (
            timed_out_sessions(stream, gap_minutes=30, watermark="5 minutes")
            .writeStream.format("json")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        write([(t0, 1, "view"), (t0 + timedelta(minutes=3), 1, "purchase")])
        run_once()
        write([(t0 + timedelta(hours=6), 99, "view")])
        run_once()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("has_purchase", T.BooleanType()),
        ]
    )
    rows = spark.read.schema(out_schema).json(out).filter("user_id = 1").collect()
    assert len(rows) == 1 and rows[0].n_events == 2 and rows[0].has_purchase


def test_back_interval_maps_to_processing_time_trigger(spark, tmp_path):
    """--back-interval (reference main.py:82-83's declared-but-unused
    rollback throttle) is honored as the processing-time trigger on the
    --stop-never path: micro-batches are paced, files still process."""
    from log2sql_spark.streaming.cdc_stream import _trigger_kwargs

    # the mapping itself
    assert _trigger_kwargs(None) == {"availableNow": True}
    assert _trigger_kwargs(2.5) == {"processingTime": "2.5 seconds"}

    # a real paced stream: processingTime trigger, runs until stopped
    in_dir, out_dir, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ck"
    in_dir.mkdir()
    cat = catalog_from_dict(spark, CATALOG)
    _dump(in_dir / "bin.000001.txt", [
        {"op": "insert", "db": "shop", "table": "orders", "ts": TS,
         "values": [(1, "1"), (2, "'a'")]},
    ])
    q = stream_binlog_to_sql(
        spark, str(in_dir), cat, str(out_dir), str(ckpt),
        trigger_interval=0.5, max_files_per_trigger=1,
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                if spark.read.parquet(str(out_dir)).count() >= 1:
                    break
            except Exception:
                pass
            time.sleep(0.5)
        assert q.isActive  # processingTime trigger keeps running
    finally:
        q.stop()
    got = {r["sql_text"] for r in spark.read.parquet(str(out_dir)).collect()}
    assert got == {"INSERT INTO `shop`.`orders`(`id`, `status`) VALUES (1, 'a');"}


def test_cli_back_interval_flag_parses():
    from log2sql_spark.cli import build_parser

    p = build_parser()
    args = p.parse_args(["--watch-dir", "w", "--stop-never", "--out", "o",
                         "--checkpoint", "c", "--back-interval", "1.5",
                         "--max-files-per-trigger", "3"])
    assert args.back_interval == 1.5 and args.max_files_per_trigger == 3
    # default: no throttle -> drain-and-stop availableNow trigger
    args = p.parse_args(["--start-file", "x"])
    assert args.back_interval is None and args.max_files_per_trigger is None


def test_stream_apply_quarantines_catalog_misses(spark, tmp_path):
    """Dead-letter path: rogue-table events divert to the quarantine
    (with a machine-readable reason) instead of merging into the store
    under a NULL-derived key; good rows flow; a replayed batch
    rewrites its quarantine partition rather than double-appending."""
    from log2sql_spark.sources.binlog_fixture import render_binlog
    from log2sql_spark.sources.catalog import catalog_from_dict
    from log2sql_spark.store import SnapshotStore
    from log2sql_spark.streaming.cdc_stream import apply_changes_to_snapshot_store

    in_dir, ckpt, dlq = tmp_path / "in", tmp_path / "ckpt", tmp_path / "dlq"
    in_dir.mkdir()
    ts = datetime(2024, 5, 1, 12, 0, 7)
    good = [
        {"op": "insert", "db": "shop", "table": "orders", "ts": ts,
         "values": [(1, str(i)), (2, f"'s{i}'")]}
        for i in (1, 2)
    ]
    rogue = [
        {"op": "insert", "db": "shop", "table": "rogue_tbl", "ts": ts,
         "values": [(1, "99"), (2, "'x'")]},
        {"op": "delete", "db": "legacy", "table": "ghost", "ts": ts,
         "values": [(1, "7")]},
    ]
    (in_dir / "bin.000001.txt").write_text(render_binlog(good + rogue))
    cat = catalog_from_dict(
        spark, {"shop.orders": {"columns": ["id", "status"], "key_columns": ["id"]}}
    )
    store_path = str(tmp_path / "store")

    q = apply_changes_to_snapshot_store(
        spark, str(in_dir), cat, store_path, str(ckpt), key_col="id",
        quarantine_dir=str(dlq),
    )
    q.awaitTermination(120)
    assert q.exception() is None

    store = SnapshotStore(store_path)
    rows = {r.key: r.after for r in store.read(spark).collect()}
    # ONLY the catalog-known rows merged; no NULL-key phantom record
    assert set(rows) == {"1", "2"}
    rejected = spark.read.parquet(str(dlq))
    got = {(r.db, r.table, r.op, r.reason) for r in rejected.collect()}
    assert got == {
        ("shop", "rogue_tbl", "insert",
         "unknown_table: no catalog entry for shop.rogue_tbl"),
        ("legacy", "ghost", "delete",
         "unknown_table: no catalog entry for legacy.ghost"),
    }

    # replay the micro-batch (crash before checkpoint commit): the
    # batch-keyed overwrite leaves the quarantine byte-identical
    import os as _os

    _os.remove(ckpt / "commits" / "0")
    crc = ckpt / "commits" / ".0.crc"
    if crc.exists():
        _os.remove(crc)
    q = apply_changes_to_snapshot_store(
        spark, str(in_dir), cat, store_path, str(ckpt), key_col="id",
        quarantine_dir=str(dlq),
    )
    q.awaitTermination(120)
    assert q.exception() is None
    assert spark.read.parquet(str(dlq)).count() == 2  # not 4
    assert {r.key for r in SnapshotStore(store_path).read(spark).collect()} == {"1", "2"}
