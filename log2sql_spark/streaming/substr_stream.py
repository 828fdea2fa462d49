"""Incremental exact-substring duplicate detection over a document
stream — the streaming twin of ``operators/dedup.py::duplicate_spans``
(query ``llm_dedup_substring``) — plus the incremental APPLY twin of
``llm_dedup_substring_apply`` (r14).

A duplicate SUBSTRING arriving batches later must still be caught —
and, unlike pairwise near-dup flagging, it must also retroactively
extend the HISTORY side: when a copy of last week's document arrives,
last week's document now contains a duplicated span too. The batch
operator sees the whole corpus and gets this for free; the stream
keeps a positional window-hash index and recomputes spans for exactly
the documents a batch affects:

1. Window hashes of the incoming docs (same expression path as batch:
   one posexplode, md5 digests — never text) land APPEND-ONLY under
   ``<store>/index/batch=<id>`` (overwritten idempotently on replay).
2. Affected docs = the batch's docs ∪ historical docs sharing any of
   the batch's hashes (an index semi-join — only colliding hashes
   meet, never an all-pairs probe).
3. For the affected docs only: re-derive duplicated positions (their
   hashes counted over the full index) and run-merge to maximal spans
   — the same helpers the batch operator uses.
4. The affected docs' FULL span sets land under
   ``<store>/spans/batch=<id>``; reads take the latest batch per doc
   (``current_spans``). Span sets are monotone under an append-only
   corpus, so latest-wins is exact.

Store lifecycle (r14, verdict #2): every micro-batch adds one
``batch=<id>`` directory per store table, so a long-running stream
accumulates thousands of footer-dominated directories and the read
cost of ``current_spans`` grows with batch count.
``compact_substr_store`` folds everything processed so far into a
single ``compact=<through>`` generation per table — superseded span
and clean rows are PRUNED (latest batch per doc), the index and
arrival registry are rewritten to target-size files — and removes the
folded ``batch=`` directories. Reads resolve the newest ``compact=``
generation plus only the batch directories NEWER than it, so read
cost after compaction is O(current state), not O(batches). Crash
ordering: the compacted generation is renamed into place BEFORE any
folded directory is removed, and readers ignore batch dirs at or
below the newest generation, so a crash mid-cleanup never double
counts or loses rows; a replayed micro-batch whose directory was
already folded is skipped by its id (exactly-once against compaction).
Like the sibling ``dedup_stream.compact_store``: maintenance is
single-writer — run it between ``availableNow`` passes, never beside
an active writer.

Append-only contract (r13 advice): the incremental index assumes a
``doc_id`` never re-arrives with different text — a re-ingested id
would append a second set of window hashes for the same (doc, pos)
and self-collide. ``process_substr_batch`` now ENFORCES it: each
batch's ids land in an arrival registry (``<store>/seen``) and a batch
containing an already-seen id fails loudly instead of corrupting the
hash counts (a crash-replay of the SAME batch id stays idempotent —
its own prior attempt is excluded from the check).

Incremental APPLY (r14, verdict #6): ``substr_apply_sink`` also lands
each batch's raw text (``<store>/docs`` — O(corpus text) state, the
honest lower bound for excising history docs) and re-emits CLEANED
text under ``<store>/clean/batch=<id>`` for exactly the docs whose
span set changed: the batch's own docs plus retroactive history docs
whose new span set differs from their previous one (a history doc can
collide yet keep an identical span set — those are not re-emitted).
``current_clean`` (latest batch per doc) then equals the batch
``apply_duplicate_spans`` over the union corpus — pinned in
tests/test_substr_stream.py.

Scale posture, stated honestly: the index state is O(corpus tokens) ×
~48 B — the inherent lower bound for EXACT substring dedup against
history (it IS the distributed suffix-index; MinHash state is smaller
because it answers a weaker, probabilistic question). Per-batch COST
is batch tokens + the rows of docs sharing content with the batch
(bounded by duplication degree), never the corpus; the span windows
run per affected doc only. Exactly-once for consumers: batch-id
directories make replays byte-identical (at-least-once in the store,
latest-wins on read).

Batch-equivalence is pinned in tests/test_substr_stream.py: after any
sequence of batches — with compaction interleaved anywhere — both
``current_spans`` and ``current_clean`` equal their batch operators
over the union corpus, including the retroactive history side.

Reference analog: none (offline single-pass parser); SURVEY.md §2.2
"streaming stateful" extension surface beside dedup_stream.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.dedup import (
    excise_spans,
    merge_positions_to_spans,
    positional_window_hashes,
)

IDX_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("pos", T.IntegerType()),
        T.StructField("h", T.StringType()),
    ]
)

SPANS_SCHEMA = "doc_id long, span_start long, span_len long, batch_id long"
SEEN_SCHEMA = "doc_id long"
DOCS_SCHEMA = "doc_id long, text string"
CLEAN_SCHEMA = (
    "doc_id long, kept_tokens long, removed_tokens long, "
    "cleaned_text string, batch_id long"
)


def _index_root(store_dir: str) -> str:
    return os.path.join(store_dir, "index")


def _spans_root(store_dir: str) -> str:
    return os.path.join(store_dir, "spans")


def _seen_root(store_dir: str) -> str:
    return os.path.join(store_dir, "seen")


def _docs_root(store_dir: str) -> str:
    return os.path.join(store_dir, "docs")


def _clean_root(store_dir: str) -> str:
    return os.path.join(store_dir, "clean")


def _compact_gen(root: str) -> int:
    """Newest ``compact=<through>`` generation under ``root`` (-1 if
    none). Batch directories with id <= this are folded in (or were
    removed); readers and replays must ignore them."""
    if not os.path.isdir(root):
        return -1
    gens = [
        int(name[8:])
        for name in os.listdir(root)
        if name.startswith("compact=") and not name.endswith(".tmp")
    ]
    return max(gens, default=-1)


def _batch_ids(root: str) -> list[int]:
    if not os.path.isdir(root):
        return []
    return sorted(
        int(name[6:]) for name in os.listdir(root) if name.startswith("batch=")
    )


def _read_root(
    spark: SparkSession,
    root: str,
    schema,
    exclude_batch: int | None = None,
) -> DataFrame:
    """Current visible content of a store table: the newest compacted
    generation plus every batch directory NEWER than it. Batch dirs at
    or below the generation are folded copies (possibly not yet
    removed after a crash mid-cleanup) and are ignored — never double
    counted. ``exclude_batch`` drops one live batch dir (a replaying
    batch excluding its own prior attempt)."""
    g = _compact_gen(root)
    paths = []
    if g >= 0:
        paths.append(os.path.join(root, f"compact={g}"))
    for bid in _batch_ids(root):
        if bid > g and bid != exclude_batch:
            paths.append(os.path.join(root, f"batch={bid}"))
    if not paths:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*paths)


def _stored_index(
    spark: SparkSession, store_dir: str, exclude_batch: int | None = None
) -> DataFrame:
    return _read_root(
        spark, _index_root(store_dir), IDX_SCHEMA, exclude_batch=exclude_batch
    )


def _latest_per_doc(df: DataFrame) -> DataFrame:
    w = Window.partitionBy("doc_id")
    return (
        df.withColumn("_mx", F.max("batch_id").over(w))
        .filter(F.col("batch_id") == F.col("_mx"))
        .drop("_mx")
    )


def process_substr_batch(
    batch: DataFrame,
    store_dir: str,
    batch_id: int,
    min_len: int = 15,
    text_col: str = "text",
    id_col: str = "doc_id",
    store_text: bool = False,
) -> None:
    """One micro-batch of incremental substring-dedup (callable
    directly for tests, or via the ``foreachBatch`` closures below).
    With ``store_text=True`` also lands the batch's raw text and
    re-emits cleaned text for every doc whose span set changed (the
    incremental apply twin)."""
    spark = batch.sparkSession
    if batch_id <= _compact_gen(_index_root(store_dir)):
        # Replay of a batch whose directory was already folded into a
        # compacted generation: its effects are fully present; writing
        # again would double-count its window hashes.
        return
    batch = batch.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))

    # Append-only contract guard (r13 advice): a doc_id re-arriving in
    # a LATER batch would self-collide in the corpus-wide hash counts.
    # The replaying batch's own prior attempt is excluded, so crash
    # replays stay idempotent.
    batch_ids_df = batch.select("doc_id").distinct()
    seen_prior = _read_root(
        spark, _seen_root(store_dir), SEEN_SCHEMA, exclude_batch=batch_id
    )
    clash = (
        seen_prior.join(batch_ids_df, "doc_id").limit(5).collect()
    )
    if clash:
        ids = sorted(r.doc_id for r in clash)
        raise ValueError(
            f"substr_stream: doc_id(s) {ids} re-arrived in batch "
            f"{batch_id}; the incremental substring index is append-only "
            "(a re-ingested id would append duplicate window hashes and "
            "mark the whole doc as duplicated). Route updates through a "
            "new doc_id, or rebuild the store."
        )
    batch_ids_df.write.mode("overwrite").parquet(
        os.path.join(_seen_root(store_dir), f"batch={batch_id}")
    )

    new_pos = positional_window_hashes(
        batch, text_col="text", id_col="doc_id", min_len=min_len
    ).select("doc_id", "pos", "h")
    # Retro side BEFORE the index append: historical docs sharing any
    # of this batch's hashes (reading after the append would also work
    # — the batch's own docs are in the affected set anyway — but the
    # pre-append read keeps the semi-join against history only).
    batch_h = new_pos.select("h").distinct()
    prior = _stored_index(spark, store_dir, exclude_batch=batch_id)
    retro_docs = prior.join(batch_h, "h").select("doc_id").distinct()
    affected = retro_docs.unionByName(
        new_pos.select("doc_id").distinct()
    ).distinct().persist()
    affected.count()  # materialize before the index gains this batch

    # Previous span state of the affected docs (needed for the apply
    # twin's changed-set; must be read BEFORE spans/batch=<id> lands).
    old_spans = None
    if store_text:
        old_spans = (
            _latest_per_doc(
                _read_root(
                    spark,
                    _spans_root(store_dir),
                    SPANS_SCHEMA,
                    exclude_batch=batch_id,
                )
            )
            .join(affected, "doc_id")
            .select("doc_id", "span_start", "span_len")
            .persist()
        )
        old_spans.count()

    # idempotent landing: a replayed batch overwrites its own directory
    new_pos.write.mode("overwrite").parquet(
        os.path.join(_index_root(store_dir), f"batch={batch_id}")
    )

    # Recompute the affected docs' spans over the FULL index (which now
    # includes this batch): duplicated position = its window hash
    # appears >=2 times corpus-wide.
    full_idx = _stored_index(spark, store_dir)
    aff_idx = full_idx.join(affected, "doc_id")
    h_counts = (
        full_idx.join(aff_idx.select("h").distinct(), "h")
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
    )
    dup_pos = aff_idx.join(h_counts, "h").select("doc_id", "pos")
    spans = merge_positions_to_spans(dup_pos, "doc_id", min_len)
    spans.withColumn("batch_id", F.lit(batch_id).cast("long")).write.mode(
        "overwrite"
    ).parquet(os.path.join(_spans_root(store_dir), f"batch={batch_id}"))

    if store_text:
        _apply_step(
            spark, batch, store_dir, batch_id, affected, old_spans, min_len
        )
        old_spans.unpersist()
    affected.unpersist()


def _apply_step(
    spark: SparkSession,
    batch: DataFrame,
    store_dir: str,
    batch_id: int,
    affected: DataFrame,
    old_spans: DataFrame,
    min_len: int,
) -> None:
    """Incremental excision: land the batch's raw text, then re-emit
    cleaned text for exactly the docs whose span set changed — the
    batch's own docs (first arrival) plus retroactive history docs
    whose NEW span set differs from their previous one. Exactly-once
    by batch-id directory, like every other table in the store."""
    batch.write.mode("overwrite").parquet(
        os.path.join(_docs_root(store_dir), f"batch={batch_id}")
    )
    new_spans = (
        spark.read.schema(SPANS_SCHEMA)
        .parquet(os.path.join(_spans_root(store_dir), f"batch={batch_id}"))
        .select("doc_id", "span_start", "span_len")
    )
    # changed = symmetric difference of (old, new) span sets non-empty
    diff = old_spans.withColumn("_o", F.lit(1)).join(
        new_spans.withColumn("_n", F.lit(1)),
        ["doc_id", "span_start", "span_len"],
        "full_outer",
    )
    changed_retro = (
        diff.filter(F.col("_o").isNull() | F.col("_n").isNull())
        .select("doc_id")
        .distinct()
    )
    batch_ids_df = batch.select("doc_id")
    emit_ids = batch_ids_df.unionByName(changed_retro).distinct()
    # text for the emit set: the batch carries its own; history docs
    # come from the raw-text store (which includes this batch too —
    # reading it back keeps one code path).
    texts = (
        _read_root(spark, _docs_root(store_dir), DOCS_SCHEMA)
        .join(emit_ids, "doc_id")
    )
    cleaned = excise_spans(
        texts, new_spans.join(emit_ids, "doc_id"), text_col="text",
        id_col="doc_id",
    )
    cleaned.withColumn("batch_id", F.lit(batch_id).cast("long")).write.mode(
        "overwrite"
    ).parquet(os.path.join(_clean_root(store_dir), f"batch={batch_id}"))


def substr_dedup_sink(
    docs_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    min_len: int = 15,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Attach incremental substring-dedup to a streaming document
    DataFrame. Returns the started StreamingQuery."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        process_substr_batch(
            batch,
            store_dir,
            batch_id,
            min_len=min_len,
            text_col=text_col,
            id_col=id_col,
        )

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def substr_apply_sink(
    docs_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    min_len: int = 15,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Detection PLUS incremental excision: like ``substr_dedup_sink``
    but also maintains the cleaned-corpus table (``current_clean``),
    re-emitting cleaned text for exactly the docs whose span set each
    batch changed — including retroactive history docs. Requires the
    raw-text store from batch 0 (attach this sink from the start; the
    plain sink keeps no text to re-clean history with)."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        process_substr_batch(
            batch,
            store_dir,
            batch_id,
            min_len=min_len,
            text_col=text_col,
            id_col=id_col,
            store_text=True,
        )

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def current_spans(spark: SparkSession, store_dir: str) -> DataFrame:
    """Latest span set per document (monotone under an append-only
    corpus, so latest batch per doc is the exact current state)."""
    root = _spans_root(store_dir)
    if not os.path.isdir(root):
        return spark.createDataFrame([], SPANS_SCHEMA).select(
            "doc_id", "span_start", "span_len"
        )
    return _latest_per_doc(_read_root(spark, root, SPANS_SCHEMA)).select(
        "doc_id", "span_start", "span_len"
    )


def current_clean(spark: SparkSession, store_dir: str) -> DataFrame:
    """Latest cleaned text per document — equals the batch
    ``apply_duplicate_spans`` over the union corpus (pinned in
    tests/test_substr_stream.py). Only meaningful under
    ``substr_apply_sink``."""
    root = _clean_root(store_dir)
    if not os.path.isdir(root):
        return spark.createDataFrame([], CLEAN_SCHEMA).drop("batch_id")
    return _latest_per_doc(_read_root(spark, root, CLEAN_SCHEMA)).drop(
        "batch_id"
    )


def parquet_file_count(root: str) -> int:
    """Parquet data files currently visible under a store table — the
    read-cost metric the compaction BENCH line reports."""
    g = _compact_gen(root)
    dirs = [os.path.join(root, f"compact={g}")] if g >= 0 else []
    dirs += [
        os.path.join(root, f"batch={b}") for b in _batch_ids(root) if b > g
    ]
    n = 0
    for d in dirs:
        n += sum(
            1
            for f in os.listdir(d)
            if f.endswith(".parquet") and not f.startswith(".")
        )
    return n


def compact_substr_store(
    spark: SparkSession, store_dir: str, target_file_mb: int = 128
) -> dict:
    """Fold every processed batch directory into one ``compact=<through>``
    generation per store table, pruning superseded rows (spans/clean
    keep only the latest batch per doc; index and registries rewrite
    verbatim to target-size files). Returns per-table
    {files_before, files_after, rows} stats.

    Crash-safe ordering per table: write the generation to a ``.tmp``,
    rename it into place, THEN remove the folded directories — readers
    ignore batch dirs at or below the newest generation, so a crash
    mid-cleanup is only wasted disk, never duplicate or lost rows.
    Single-writer maintenance: run between availableNow passes, never
    beside an active writer (same contract as
    ``dedup_stream.compact_store``)."""
    import shutil

    from ..sources.compaction import dir_bytes

    out: dict[str, dict] = {}
    tables = (
        ("index", _index_root(store_dir), IDX_SCHEMA, "verbatim", ["h"]),
        ("spans", _spans_root(store_dir), SPANS_SCHEMA, "latest", ["doc_id"]),
        ("seen", _seen_root(store_dir), SEEN_SCHEMA, "distinct", ["doc_id"]),
        ("docs", _docs_root(store_dir), DOCS_SCHEMA, "distinct", ["doc_id"]),
        ("clean", _clean_root(store_dir), CLEAN_SCHEMA, "latest", ["doc_id"]),
    )
    for name, root, schema, mode, sort in tables:
        if not os.path.isdir(root):
            continue
        gen = _compact_gen(root)
        through = max([gen, *_batch_ids(root)])
        # Recovery FIRST, even with nothing new to fold: a crash inside
        # a prior compaction can leave (a) an incomplete ``.tmp``
        # generation, (b) folded batch dirs <= gen, (c) the superseded
        # predecessor ``compact=<old>`` — readers already ignore all
        # three, so this is disk reclamation, not correctness; without
        # it a store that never receives another batch leaks them
        # forever (the pre-r14 short-circuit skipped straight past).
        for entry in os.listdir(root):
            if entry.endswith(".tmp"):
                shutil.rmtree(os.path.join(root, entry), ignore_errors=True)
            elif entry.startswith("compact=") and int(entry[8:]) < gen:
                shutil.rmtree(os.path.join(root, entry), ignore_errors=True)
        for bid in _batch_ids(root):
            if bid <= gen:
                shutil.rmtree(
                    os.path.join(root, f"batch={bid}"), ignore_errors=True
                )
        if through <= gen:
            continue  # nothing new since the last compaction
        df = _read_root(spark, root, schema)
        if mode == "latest":
            df = _latest_per_doc(df)
        elif mode == "distinct":
            df = df.distinct()
        files_before = parquet_file_count(root)
        n_files = max(
            1, -(-dir_bytes(root) // (target_file_mb * 1024 * 1024))
        )
        tmp = os.path.join(root, f"compact={through}.tmp")
        df.repartitionByRange(n_files, *sort).write.mode("overwrite").parquet(
            tmp
        )
        os.rename(tmp, os.path.join(root, f"compact={through}"))
        # now safe to drop the folded inputs
        for bid in _batch_ids(root):
            if bid <= through:
                shutil.rmtree(
                    os.path.join(root, f"batch={bid}"), ignore_errors=True
                )
        if gen >= 0:
            shutil.rmtree(
                os.path.join(root, f"compact={gen}"), ignore_errors=True
            )
        out[name] = {
            "files_before": files_before,
            "files_after": parquet_file_count(root),
            "through": through,
        }
    return out
