"""Incremental streaming exact-substring dedup
(streaming/substr_stream.py).

The behavior the pairwise streams cannot give: when a copy of an
already-seen document arrives in a LATER micro-batch, the HISTORY side
retroactively gains its duplicated span too — and after any sequence
of batches the stream's state equals the batch operator run over the
union corpus (batch-equivalence, the strongest check available since
the semantics aren't SQL-expressible incrementally).
"""

from __future__ import annotations

import pandas as pd

from log2sql_spark.operators.dedup import duplicate_spans
from log2sql_spark.streaming.substr_stream import (
    current_spans,
    process_substr_batch,
    substr_dedup_sink,
)


def _tok(n, prefix="w"):
    return " ".join(f"{prefix}{i}" for i in range(n))


DOC_A = _tok(20)                       # 20 tokens, will be copied later
DOC_B = _tok(18, "u")                  # unique forever
DOC_A_COPY = "copy arrives now late then " + DOC_A  # 5-token prefix shift


def _spanset(df):
    return {(r.doc_id, r.span_start, r.span_len) for r in df.collect()}


def test_late_copy_retroactively_spans_the_history_side(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    store, ck = str(tmp_path / "store"), str(tmp_path / "ck")
    stream = spark.readStream.schema("doc_id long, text string").parquet(str(in_dir))

    # batch 1: original + unrelated — nothing duplicated yet
    pd.DataFrame({"doc_id": [1, 2], "text": [DOC_A, DOC_B]}).to_parquet(
        in_dir / "b1.parquet"
    )
    q = substr_dedup_sink(stream, store, ck)
    q.awaitTermination(120)
    assert q.exception() is None
    assert _spanset(current_spans(spark, store)) == set()

    # batch 2 (separate availableNow run, same checkpoint = restart):
    # a prefixed copy of doc 1 arrives
    pd.DataFrame({"doc_id": [101], "text": [DOC_A_COPY]}).to_parquet(
        in_dir / "b2.parquet"
    )
    q = substr_dedup_sink(stream, store, ck)
    q.awaitTermination(120)
    assert q.exception() is None

    got = _spanset(current_spans(spark, store))
    # the NEW doc's span starts after its 5-token prefix; the HISTORY
    # doc (batch 1!) retroactively gains its full-body span
    assert got == {(1, 0, 20), (101, 5, 20)}


def test_batch_equivalence_over_three_batches(spark, tmp_path):
    """After any batch sequence, stream state == duplicate_spans over
    the union corpus — including within-batch dups, cross-batch dups,
    and spans that EXTEND when more context duplicates later."""
    store = str(tmp_path / "store")
    batches = [
        [(1, DOC_A), (2, DOC_B)],
        [(3, _tok(30, "x")), (4, "pad one two three four " + _tok(30, "x"))],
        [(5, DOC_A_COPY), (6, _tok(16, "q")), (7, _tok(16, "q"))],
    ]
    seen: list[tuple] = []
    for bid, rows in enumerate(batches):
        seen.extend(rows)
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [r[0] for r in rows],
                          "text": [r[1] for r in rows]})
        )
        process_substr_batch(df, store, bid)
        # equivalence holds at EVERY prefix of the batch sequence
        corpus = spark.createDataFrame(
            pd.DataFrame({"doc_id": [r[0] for r in seen],
                          "text": [r[1] for r in seen]})
        )
        assert _spanset(current_spans(spark, store)) == _spanset(
            duplicate_spans(corpus, min_len=15)
        ), f"diverged after batch {bid}"


def test_replayed_batch_is_idempotent(spark, tmp_path):
    store = str(tmp_path / "store")
    b1 = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": [DOC_A, DOC_A_COPY]})
    )
    process_substr_batch(b1, store, 0)
    before = _spanset(current_spans(spark, store))
    assert before == {(1, 0, 20), (2, 5, 20)}
    process_substr_batch(b1, store, 0)  # crash-replay of the same batch
    assert _spanset(current_spans(spark, store)) == before
    # the index holds exactly one copy of the batch's rows
    import os

    idx_batches = os.listdir(os.path.join(store, "index"))
    assert idx_batches == ["batch=0"]
