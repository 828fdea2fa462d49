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


# ---- r14: store lifecycle (compaction), append-only guard, apply twin ----


def test_compaction_bounds_read_cost_and_preserves_equivalence(spark, tmp_path):
    """After many batches + compact_substr_store: (a) the spans table
    reads O(current state) files instead of one directory per batch,
    (b) current_spans still equals batch duplicate_spans over the union
    corpus, and (c) the incremental path keeps working on top of the
    compacted store."""
    import os

    from log2sql_spark.streaming.substr_stream import (
        compact_substr_store,
        parquet_file_count,
    )

    store = str(tmp_path / "store")
    seen: list[tuple] = []
    # 12 batches: every third doc is a prefixed copy of DOC_A
    for bid in range(12):
        text = DOC_A_COPY if bid % 3 == 0 else _tok(16, f"b{bid}_")
        rows = [(1000 + bid, text)]
        seen.extend(rows)
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [r[0] for r in rows],
                          "text": [r[1] for r in rows]})
        )
        process_substr_batch(df, store, bid)

    spans_root = os.path.join(store, "spans")
    files_before = parquet_file_count(spans_root)
    dirs_before = len(os.listdir(spans_root))
    assert dirs_before == 12  # one directory per batch — the smell

    stats = compact_substr_store(spark, store)
    assert stats["spans"]["through"] == 11
    assert parquet_file_count(spans_root) < files_before
    # exactly one generation dir left; folded batch dirs removed
    assert os.listdir(spans_root) == ["compact=11"]
    assert os.listdir(os.path.join(store, "index")) == ["compact=11"]

    corpus = spark.createDataFrame(
        pd.DataFrame({"doc_id": [r[0] for r in seen],
                      "text": [r[1] for r in seen]})
    )
    assert _spanset(current_spans(spark, store)) == _spanset(
        duplicate_spans(corpus, min_len=15)
    )

    # replay of a FOLDED batch is a no-op (exactly-once vs compaction)
    df0 = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1000], "text": [DOC_A_COPY]})
    )
    process_substr_batch(df0, store, 0)
    assert os.listdir(os.path.join(store, "index")) == ["compact=11"]

    # the incremental path continues on top of the compacted store
    rows = [(2000, DOC_A)]  # another copy: extends history spans
    seen.extend(rows)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [2000], "text": [DOC_A]})
    )
    process_substr_batch(df, store, 12)
    corpus = spark.createDataFrame(
        pd.DataFrame({"doc_id": [r[0] for r in seen],
                      "text": [r[1] for r in seen]})
    )
    assert _spanset(current_spans(spark, store)) == _spanset(
        duplicate_spans(corpus, min_len=15)
    )


def test_compaction_crash_windows_recovered(spark, tmp_path):
    """Crash injection for compact_substr_store's three windows:
    (1) crash after writing the ``.tmp`` generation (before rename) —
    readers ignore it, the next compaction clears it; (2) crash after
    the rename but before dropping the folded batch dirs; (3) crash
    before removing the superseded predecessor generation. For (2) and
    (3) the recovery must run EVEN WITH NO NEW BATCHES — the pre-r14
    short-circuit leaked them forever on a store that never ingests
    again. Reader results must be byte-identical through every state."""
    import os
    import shutil

    from log2sql_spark.streaming.substr_stream import compact_substr_store

    store = str(tmp_path / "store")
    seen: list[tuple] = []
    for bid in range(6):
        text = DOC_A_COPY if bid % 3 == 0 else _tok(16, f"b{bid}_")
        rows = [(1000 + bid, text)]
        seen.extend(rows)
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [r[0] for r in rows],
                          "text": [r[1] for r in rows]})
        )
        process_substr_batch(df, store, bid)
    corpus = spark.createDataFrame(
        pd.DataFrame({"doc_id": [r[0] for r in seen],
                      "text": [r[1] for r in seen]})
    )
    want = _spanset(duplicate_spans(corpus, min_len=15))
    spans_root = os.path.join(store, "spans")

    compact_substr_store(spark, store)
    assert os.listdir(spans_root) == ["compact=5"]

    # window 1: incomplete .tmp generation from a crashed compaction
    os.makedirs(os.path.join(spans_root, "compact=9.tmp"))
    assert _spanset(current_spans(spark, store)) == want  # reader blind to it

    # windows 2+3: resurrect a folded batch dir and a superseded
    # predecessor generation (what a crash mid-cleanup leaves behind)
    shutil.copytree(
        os.path.join(spans_root, "compact=5"),
        os.path.join(spans_root, "batch=3"),
    )
    shutil.copytree(
        os.path.join(spans_root, "compact=5"),
        os.path.join(spans_root, "compact=2"),
    )
    # readers ignore both (no double counting)
    assert _spanset(current_spans(spark, store)) == want

    # recovery with NOTHING new to fold must reclaim all three
    compact_substr_store(spark, store)
    assert os.listdir(spans_root) == ["compact=5"]
    assert _spanset(current_spans(spark, store)) == want

    # and the store still ingests + compacts normally afterwards
    seen.append((2000, DOC_A))
    process_substr_batch(
        spark.createDataFrame(
            pd.DataFrame({"doc_id": [2000], "text": [DOC_A]})
        ),
        store,
        6,
    )
    compact_substr_store(spark, store)
    assert os.listdir(spans_root) == ["compact=6"]
    corpus = spark.createDataFrame(
        pd.DataFrame({"doc_id": [r[0] for r in seen],
                      "text": [r[1] for r in seen]})
    )
    assert _spanset(current_spans(spark, store)) == _spanset(
        duplicate_spans(corpus, min_len=15)
    )


def test_reingested_doc_id_fails_loudly(spark, tmp_path):
    """Append-only contract (r13 advice): a doc_id re-arriving in a
    LATER batch must raise instead of silently self-colliding in the
    corpus-wide hash counts."""
    import pytest

    store = str(tmp_path / "store")
    b1 = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": [DOC_A, DOC_B]})
    )
    process_substr_batch(b1, store, 0)
    b2 = spark.createDataFrame(
        pd.DataFrame({"doc_id": [2], "text": ["edited " + DOC_B]})
    )
    with pytest.raises(ValueError, match="re-arrived"):
        process_substr_batch(b2, store, 1)
    # same-batch crash replay remains idempotent (not a re-ingestion)
    process_substr_batch(b1, store, 0)


def test_incremental_apply_equals_batch_apply(spark, tmp_path):
    """The apply twin (verdict #6): after any batch sequence — with a
    compaction interleaved — current_clean equals the batch
    apply_duplicate_spans over the union corpus, and each batch
    re-emits exactly the docs whose span set changed."""
    import os

    from log2sql_spark.operators.dedup import apply_duplicate_spans
    from log2sql_spark.streaming.substr_stream import (
        compact_substr_store,
        current_clean,
        process_substr_batch,
    )

    store = str(tmp_path / "store")
    batches = [
        [(1, DOC_A), (2, DOC_B)],
        [(3, _tok(30, "x")), (4, "pad one two three four " + _tok(30, "x"))],
        [(5, DOC_A_COPY), (6, _tok(16, "q")), (7, _tok(16, "q"))],
    ]

    def _cleanset(df):
        return {
            (r.doc_id, r.kept_tokens, r.removed_tokens, r.cleaned_text)
            for r in df.collect()
        }

    seen: list[tuple] = []
    for bid, rows in enumerate(batches):
        seen.extend(rows)
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [r[0] for r in rows],
                          "text": [r[1] for r in rows]})
        )
        process_substr_batch(df, store, bid, store_text=True)
        if bid == 1:
            compact_substr_store(spark, store)
        corpus = spark.createDataFrame(
            pd.DataFrame({"doc_id": [r[0] for r in seen],
                          "text": [r[1] for r in seen]})
        )
        assert _cleanset(current_clean(spark, store)) == _cleanset(
            apply_duplicate_spans(corpus, min_len=15)
        ), f"diverged after batch {bid}"

    # batch 2 changed: its own docs (5, 6, 7) + retro doc 1 (DOC_A's
    # span is new); docs 2/3/4 span sets did not change -> not re-emitted
    emitted = {
        r.doc_id
        for r in spark.read.schema(
            "doc_id long, kept_tokens long, removed_tokens long,"
            " cleaned_text string, batch_id long"
        ).parquet(os.path.join(store, "clean", "batch=2")).collect()
    }
    assert emitted == {1, 5, 6, 7}


def test_apply_sink_end_to_end(spark, tmp_path):
    """substr_apply_sink drives the apply twin through a real
    readStream/foreachBatch restart, exactly-once by batch id."""
    from log2sql_spark.operators.dedup import apply_duplicate_spans
    from log2sql_spark.streaming.substr_stream import (
        current_clean,
        substr_apply_sink,
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    store, ck = str(tmp_path / "store"), str(tmp_path / "ck")
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(in_dir)
    )
    pd.DataFrame({"doc_id": [1, 2], "text": [DOC_A, DOC_B]}).to_parquet(
        in_dir / "b1.parquet"
    )
    q = substr_apply_sink(stream, store, ck)
    q.awaitTermination(120)
    assert q.exception() is None

    pd.DataFrame({"doc_id": [101], "text": [DOC_A_COPY]}).to_parquet(
        in_dir / "b2.parquet"
    )
    q = substr_apply_sink(stream, store, ck)
    q.awaitTermination(120)
    assert q.exception() is None

    corpus = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2, 101], "text": [DOC_A, DOC_B, DOC_A_COPY]}
        )
    )
    got = {
        (r.doc_id, r.cleaned_text)
        for r in current_clean(spark, store).collect()
    }
    want = {
        (r.doc_id, r.cleaned_text)
        for r in apply_duplicate_spans(corpus, min_len=15).collect()
    }
    assert got == want
    # doc 1 is fully duplicated -> cleaned empty; doc 101 keeps its prefix
    by_id = dict(got)
    assert by_id[1] == ""
    assert by_id[101] == "copy arrives now late then"
