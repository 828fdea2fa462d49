"""Streaming count-min fold: constant-size frequency state across
micro-batches, exactly-once under replay, estimates match exact counts
on collision-free cardinalities (same contract as the batch sketch
queries' oracles)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from log2sql_spark.streaming.sketch_stream import (
    fold_batch_sketch,
    probe_sketch,
    stream_countmin_fold,
)

SCHEMA = T.StructType([T.StructField("event_type", T.StringType())])


def _write(spark, d, rows):
    import os
    import time

    spark.createDataFrame([(r,) for r in rows], SCHEMA).coalesce(1).write.mode(
        "append"
    ).json(str(d))
    now = time.time()
    for p in d.iterdir():
        os.utime(p, (now, now))


def test_stream_fold_matches_exact_counts(spark, tmp_path):
    src = tmp_path / "src"
    store = str(tmp_path / "cms")
    ckpt = str(tmp_path / "ckpt")
    batch1 = ["view"] * 40 + ["click"] * 7
    batch2 = ["view"] * 13 + ["purchase"] * 5

    _write(spark, src, batch1)
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = stream_countmin_fold(stream, store, "event_type", ckpt)
    q.awaitTermination(120)

    _write(spark, src, batch2)
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = stream_countmin_fold(stream, store, "event_type", ckpt)
    q.awaitTermination(120)

    got = probe_sketch(spark, store, ["view", "click", "purchase", "absent"])
    assert got == {"view": 53, "click": 7, "purchase": 5, "absent": 0}


def test_fold_skips_replayed_batch(spark, tmp_path):
    store = str(tmp_path / "cms2")
    df = spark.createDataFrame([("a",), ("a",), ("b",)], SCHEMA)
    assert fold_batch_sketch(spark, df, 0, store, "event_type") is True
    # replay of batch 0 (restart before checkpoint commit): no double count
    assert fold_batch_sketch(spark, df, 0, store, "event_type") is False
    assert probe_sketch(spark, store, ["a", "b"]) == {"a": 2, "b": 1}
    assert fold_batch_sketch(spark, df, 1, store, "event_type") is True
    assert probe_sketch(spark, store, ["a", "b"]) == {"a": 4, "b": 2}
    with open(f"{store}/countmin_state.json") as f:
        assert json.load(f)["last_batch_id"] == 1


def test_hll_fold_matches_one_shot_estimate(spark, tmp_path):
    """The folded per-batch HLL union must equal the one-shot sketch of
    the full stream (HLL union over same-lgK sketches is lossless), and
    at these cardinalities the estimate is exact."""
    from log2sql_spark.streaming.sketch_stream import fold_batch_hll, probe_hll

    store = str(tmp_path / "hll")
    b1 = spark.createDataFrame([(f"u{i}",) for i in range(500)], SCHEMA)
    b2 = spark.createDataFrame(
        [(f"u{i}",) for i in range(300, 800)], SCHEMA  # 200 overlap
    )
    assert fold_batch_hll(spark, b1, 0, store, "event_type") is True
    assert fold_batch_hll(spark, b1, 0, store, "event_type") is False  # replay
    assert fold_batch_hll(spark, b2, 1, store, "event_type") is True
    assert probe_hll(spark, store) == 800


def test_kll_fold_quantiles_exact_below_k(spark, tmp_path):
    """Folded per-batch KLL == one-shot sketch of the whole stream at
    sub-k cardinality: quantiles exact, replay skipped."""
    from pyspark.sql import types as T2

    from log2sql_spark.streaming.sketch_stream import fold_batch_kll, probe_kll

    store = str(tmp_path / "kll")
    schema = T2.StructType([T2.StructField("v", T2.LongType())])
    b1 = spark.createDataFrame([(i,) for i in range(1, 501)], schema)
    b2 = spark.createDataFrame([(i,) for i in range(501, 1001)], schema)
    assert fold_batch_kll(spark, b1, 0, store, "v") is True
    assert fold_batch_kll(spark, b1, 0, store, "v") is False  # replay
    assert fold_batch_kll(spark, b2, 1, store, "v") is True
    got = probe_kll(spark, store, [0.25, 0.5, 0.9])
    assert got == {"q25": 250, "q50": 500, "q90": 900}


def test_folds_survive_empty_batch(spark, tmp_path):
    """An empty micro-batch must advance the watermark without touching
    (or corrupting) the persisted sketches — the CMS/HLL/KLL aggregates
    all return NULL over zero rows, which crashed the first fold
    implementation."""
    from pyspark.sql import types as T2

    from log2sql_spark.streaming.sketch_stream import (
        fold_batch_hll,
        fold_batch_kll,
        fold_batch_sketch,
        probe_hll,
        probe_kll,
        probe_sketch,
    )

    store_c = str(tmp_path / "ec")
    store_h = str(tmp_path / "eh")
    store_k = str(tmp_path / "ek")
    full = spark.createDataFrame([("a",), ("a",), ("b",)], SCHEMA)
    empty = spark.createDataFrame([], SCHEMA)
    lschema = T2.StructType([T2.StructField("v", T2.LongType())])
    lfull = spark.createDataFrame([(i,) for i in range(1, 11)], lschema)
    lempty = spark.createDataFrame([], lschema)

    assert fold_batch_sketch(spark, full, 0, store_c, "event_type") is True
    assert fold_batch_sketch(spark, empty, 1, store_c, "event_type") is True
    assert probe_sketch(spark, store_c, ["a", "b"]) == {"a": 2, "b": 1}

    assert fold_batch_hll(spark, full, 0, store_h, "event_type") is True
    assert fold_batch_hll(spark, empty, 1, store_h, "event_type") is True
    assert probe_hll(spark, store_h) == 2

    assert fold_batch_kll(spark, lfull, 0, store_k, "v") is True
    assert fold_batch_kll(spark, lempty, 1, store_k, "v") is True
    assert probe_kll(spark, store_k, [0.5]) == {"q50": 5}


def test_legacy_state_layout_migrates(spark, tmp_path):
    """A store written by the first-cut layout (countmin: state.json +
    sketch.bin; hll/kll: <name>_state.json without a 'sketch' key +
    <name>.bin) must fold ON TOP of the accumulated sketch, not silently
    restart from empty while keeping the watermark."""
    import os

    import pytest

    from log2sql_spark.streaming.sketch_stream import (
        fold_batch_hll,
        probe_hll,
    )

    # --- countmin legacy: build bytes via the modern fold, then rewrite
    # the store in the legacy layout.
    store = str(tmp_path / "legacy_cms")
    df = spark.createDataFrame([("a",), ("a",), ("b",)], SCHEMA)
    assert fold_batch_sketch(spark, df, 0, store, "event_type") is True
    with open(f"{store}/countmin_state.json") as f:
        st = json.load(f)
    with open(f"{store}/{st['sketch']}", "rb") as f:
        sketch_bytes = f.read()
    os.remove(f"{store}/{st['sketch']}")
    os.remove(f"{store}/countmin_state.json")
    with open(f"{store}/sketch.bin", "wb") as f:
        f.write(sketch_bytes)
    with open(f"{store}/state.json", "w") as f:
        json.dump({"last_batch_id": 0}, f)

    assert fold_batch_sketch(spark, df, 1, store, "event_type") is True
    assert probe_sketch(spark, store, ["a", "b"]) == {"a": 4, "b": 2}

    # --- hll legacy: same state-file name, sketch in hll.bin, no key.
    store2 = str(tmp_path / "legacy_hll")
    df2 = spark.createDataFrame([(str(i),) for i in range(100)], SCHEMA)
    assert fold_batch_hll(spark, df2, 0, store2, "event_type") is True
    with open(f"{store2}/hll_state.json") as f:
        st2 = json.load(f)
    with open(f"{store2}/{st2['sketch']}", "rb") as f:
        hll_bytes = f.read()
    os.remove(f"{store2}/{st2['sketch']}")
    with open(f"{store2}/hll.bin", "wb") as f:
        f.write(hll_bytes)
    with open(f"{store2}/hll_state.json", "w") as f:
        json.dump({"last_batch_id": 0}, f)

    df3 = spark.createDataFrame([(str(i),) for i in range(100, 150)], SCHEMA)
    assert fold_batch_hll(spark, df3, 1, store2, "event_type") is True
    assert abs(probe_hll(spark, store2) - 150) <= 3  # folded on top, not reset

    # --- corrupted / unrecognized state fails loudly, never folds empty.
    store3 = str(tmp_path / "bad")
    os.makedirs(store3)
    with open(f"{store3}/countmin_state.json", "w") as f:
        json.dump({"watermark": 5}, f)
    with pytest.raises(ValueError, match="unrecognized"):
        fold_batch_sketch(spark, df, 0, store3, "event_type")

    # legacy state referencing a missing sketch file also fails loudly
    store4 = str(tmp_path / "bad2")
    os.makedirs(store4)
    with open(f"{store4}/hll_state.json", "w") as f:
        json.dump({"last_batch_id": 3}, f)
    with pytest.raises(ValueError, match="legacy layout"):
        fold_batch_hll(spark, df2, 4, store4, "event_type")
