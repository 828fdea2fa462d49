"""transformWithState (Spark 4 StatefulProcessor) running totals:
state persists across micro-batches and restarts from the checkpoint
(log2sql_spark/streaming/stateful_v2.py).

transformWithState's driver worker speaks protobuf to the JVM state
server; where the python ``protobuf`` package is absent (this
container, installs disallowed) running_totals_stream falls back to an
identical-semantics applyInPandasWithState twin — the test runs either
way, exercising whichever path the environment supports."""

from __future__ import annotations

import json

from log2sql_spark.streaming.stateful_v2 import has_protobuf


def _write_batch(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


_ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def _run(spark, in_dir, out_dir, ckpt):
    from log2sql_spark.streaming.stateful_v2 import running_totals_stream

    # transformWithState requires the RocksDB state store provider;
    # the applyInPandasWithState fallback uses the default provider.
    saved = spark.conf.get(_PROVIDER_CONF, None)
    if has_protobuf():
        spark.conf.set(_PROVIDER_CONF, _ROCKSDB)
    try:
        events = (
            spark.readStream.schema("user_id bigint, value double")
            .json(str(in_dir))
        )
        q = (
            running_totals_stream(events)
            .writeStream.format("parquet")
            .option("path", str(out_dir))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        if saved is None:
            spark.conf.unset(_PROVIDER_CONF)
        else:
            spark.conf.set(_PROVIDER_CONF, saved)


def test_running_totals_accumulate_across_restarts(spark, tmp_path):
    in_dir, out_dir, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    in_dir.mkdir()
    _write_batch(in_dir / "b1.json", [
        {"user_id": 1, "value": 10.0},
        {"user_id": 1, "value": 5.0},
        {"user_id": 2, "value": 1.0},
    ])
    _run(spark, in_dir, out_dir, ckpt)
    rows = {
        (r.user_id, r.n): r.total for r in spark.read.parquet(str(out_dir)).collect()
    }
    assert rows[(1, 2)] == 15.0 and rows[(2, 1)] == 1.0

    # restart with a new file: state carried by the checkpointed store
    _write_batch(in_dir / "b2.json", [
        {"user_id": 1, "value": 2.5},
        {"user_id": 3, "value": 7.0},
    ])
    _run(spark, in_dir, out_dir, ckpt)
    latest = {}
    for r in spark.read.parquet(str(out_dir)).collect():
        if r.user_id not in latest or r.n > latest[r.user_id][1]:
            latest[r.user_id] = (r.total, r.n)
    assert latest[1] == (17.5, 3)  # 15.0 + 2.5 across the restart
    assert latest[2] == (1.0, 1)
    assert latest[3] == (7.0, 1)
