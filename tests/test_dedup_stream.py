"""Incremental streaming near-dup dedup (streaming/dedup_stream.py).

The scenario the batch path cannot cover: a near-duplicate of an
already-seen document arrives in a LATER micro-batch (even after a
restart) and is still flagged, because MinHash signatures persist in
the parquet store across batches.
"""

from __future__ import annotations

import pandas as pd
import pytest

from log2sql_spark.streaming.dedup_stream import (
    minhash_dedup_sink,
    near_dup_pairs,
    process_dedup_batch,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm stone wall near the old garden gate in the morning sun"
)
NEAR = BASE.replace("morning", "evening")  # one token differs
OTHER = (
    "completely different content about distributed query engines and "
    "shuffle partitioning strategies for large scale data processing jobs"
)


def _write_batch(path, ids, texts):
    pd.DataFrame({"doc_id": ids, "text": texts}).to_parquet(path)


def test_near_dup_in_later_microbatch_is_flagged(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")

    stream = spark.readStream.schema("doc_id long, text string").parquet(str(in_dir))

    # batch 1: the original + an unrelated doc
    _write_batch(in_dir / "b1.parquet", [1, 2], [BASE, OTHER])
    q = minhash_dedup_sink(stream, store, ck, threshold=0.5)
    q.awaitTermination(120)
    assert near_dup_pairs(spark, store).count() == 0

    # batch 2 (separate availableNow run, same checkpoint — i.e. a
    # restart): a near-duplicate of doc 1 arrives
    _write_batch(in_dir / "b2.parquet", [101], [NEAR])
    q = minhash_dedup_sink(stream, store, ck, threshold=0.5)
    q.awaitTermination(120)

    pairs = {(r.id_a, r.id_b): r.est_jaccard for r in near_dup_pairs(spark, store).collect()}
    assert (1, 101) in pairs
    assert pairs[(1, 101)] >= 0.5
    assert all(k == (1, 101) for k in pairs)  # no false positives

    # signature store now holds all three docs
    sigs = spark.read.parquet(f"{store}/signatures")
    assert {r.id for r in sigs.select("id").collect()} == {1, 2, 101}


def test_within_batch_pair_flagged_once(spark, tmp_path):
    store = str(tmp_path / "store")
    batch = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": [BASE, NEAR, OTHER]})
    )
    process_dedup_batch(batch, store, threshold=0.5)
    pairs = near_dup_pairs(spark, store).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}

    # replaying the same batch appends duplicates to the store, but the
    # read-side dedup keeps consumers exactly-once
    process_dedup_batch(batch, store, threshold=0.5)
    assert near_dup_pairs(spark, store).filter("id_a = 1 AND id_b = 2").count() == 1


def test_exact_duplicate_across_batches_estimates_one(spark, tmp_path):
    store = str(tmp_path / "store")
    b1 = spark.createDataFrame(pd.DataFrame({"doc_id": [10], "text": [BASE]}))
    b2 = spark.createDataFrame(pd.DataFrame({"doc_id": [20], "text": [BASE]}))
    process_dedup_batch(b1, store)
    process_dedup_batch(b2, store)
    rows = near_dup_pairs(spark, store).collect()
    assert len(rows) == 1 and rows[0].id_a == 10 and rows[0].id_b == 20
    assert rows[0].est_jaccard == pytest.approx(1.0)


def test_compact_store_preserves_contents(spark, tmp_path):
    """Many tiny per-batch files → few compacted files, same data."""
    import os

    from log2sql_spark.streaming.dedup_stream import compact_store

    store = str(tmp_path / "store")
    for b in range(6):
        batch = spark.createDataFrame(
            pd.DataFrame(
                {"doc_id": [100 * b, 100 * b + 1], "text": [BASE, BASE + f" extra {b}"]}
            )
        )
        process_dedup_batch(batch, store, threshold=0.5)
    before_pairs = sorted(
        (r.id_a, r.id_b, r.est_jaccard) for r in near_dup_pairs(spark, store).collect()
    )
    sig_dir = f"{store}/signatures"
    n_before = len([f for f in os.listdir(sig_dir) if f.endswith(".parquet")])
    assert n_before >= 6  # one per batch

    counts = compact_store(spark, store)
    assert counts["signatures"] == 1 and counts["pairs"] == 1
    after_pairs = sorted(
        (r.id_a, r.id_b, r.est_jaccard) for r in near_dup_pairs(spark, store).collect()
    )
    assert after_pairs == before_pairs
    assert spark.read.parquet(sig_dir).count() == 12

    # the stream keeps working against the compacted store
    nxt = spark.createDataFrame(pd.DataFrame({"doc_id": [9999], "text": [BASE]}))
    process_dedup_batch(nxt, store, threshold=0.5)
    assert near_dup_pairs(spark, store).filter("id_b = 9999").count() >= 6
