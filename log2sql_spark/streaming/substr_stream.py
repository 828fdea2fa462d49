"""Incremental exact-substring duplicate detection over a document
stream — the streaming twin of ``operators/dedup.py::duplicate_spans``
(query ``llm_dedup_substring``).

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
sequence of batches, ``current_spans`` equals ``duplicate_spans`` over
the union corpus — including the retroactive history side.

Reference analog: none (offline single-pass parser); SURVEY.md §2.2
"streaming stateful" extension surface beside dedup_stream.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.dedup import (
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


def _index_root(store_dir: str) -> str:
    return os.path.join(store_dir, "index")


def _spans_root(store_dir: str) -> str:
    return os.path.join(store_dir, "spans")


def _stored_index(spark: SparkSession, store_dir: str) -> DataFrame:
    root = _index_root(store_dir)
    if not os.path.isdir(root):
        return spark.createDataFrame([], IDX_SCHEMA)
    return (
        spark.read.schema(IDX_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(root)
    )


def process_substr_batch(
    batch: DataFrame,
    store_dir: str,
    batch_id: int,
    min_len: int = 15,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """One micro-batch of incremental substring-dedup (callable
    directly for tests, or via the ``foreachBatch`` closure below)."""
    spark = batch.sparkSession
    new_pos = positional_window_hashes(
        batch, text_col=text_col, id_col=id_col, min_len=min_len
    ).select(F.col(id_col).alias("doc_id"), "pos", "h")
    # Retro side BEFORE the index append: historical docs sharing any
    # of this batch's hashes (reading after the append would also work
    # — the batch's own docs are in the affected set anyway — but the
    # pre-append read keeps the semi-join against history only).
    batch_h = new_pos.select("h").distinct()
    prior = _stored_index(spark, store_dir)
    retro_docs = prior.join(batch_h, "h").select("doc_id").distinct()
    affected = retro_docs.unionByName(
        new_pos.select("doc_id").distinct()
    ).distinct().persist()
    affected.count()  # materialize before the index gains this batch

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
    affected.unpersist()


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


def current_spans(spark: SparkSession, store_dir: str) -> DataFrame:
    """Latest span set per document (monotone under an append-only
    corpus, so latest batch per doc is the exact current state)."""
    root = _spans_root(store_dir)
    schema = (
        "doc_id long, span_start long, span_len long, batch_id long"
    )
    if not os.path.isdir(root):
        return spark.createDataFrame([], schema)
    all_spans = (
        spark.read.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(root)
    )
    latest = Window.partitionBy("doc_id")
    return (
        all_spans.withColumn("_mx", F.max("batch_id").over(latest))
        .filter(F.col("batch_id") == F.col("_mx"))
        .select("doc_id", "span_start", "span_len")
    )
