"""Incremental near-duplicate detection over a document stream.

Batch twin: ``operators/dedup.py`` MinHash+LSH (query
``llm_dedup_minhash_lsh``, ``queries/llm.py``). The reference has no
streaming at all (offline parser, ``/root/reference/main.py:103``); this
is the engine-side extension SURVEY.md §2.2 "streaming stateful" calls
for: a near-duplicate arriving in a LATER micro-batch is still caught,
because signatures persist across batches.

Per micro-batch (``foreachBatch``):

1. MinHash signatures of the incoming docs — the same JVM expression
   path as batch (one explode + 64 map-side-combined min aggregates).
2. Banded LSH equi-join of the new signatures against the persisted
   signature store ∪ the batch itself. Only bucket collisions meet —
   never an all-pairs join against history.
3. Verify candidates by signature agreement: the fraction of equal
   MinHash positions is an unbiased estimator of Jaccard (the store
   keeps signatures, not documents — at 100 TB the state is
   |corpus| × (8 B id + 64×8 B sig), not the corpus itself).
4. Append flagged pairs to ``<store>/pairs`` and the new signatures to
   ``<store>/signatures`` — pairs are materialized BEFORE the signature
   append so the lazy read of the old store never sees this batch's
   files.

State is plain parquet keyed by the checkpoint: restart = resume. A
replayed batch may re-append the same pairs; ``near_dup_pairs`` dedups
on read (exactly-once for consumers, at-least-once in the store).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.dedup import minhash_signatures

SIG_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("sig", T.ArrayType(T.LongType())),
    ]
)


def _sig_path(store_dir: str) -> str:
    return os.path.join(store_dir, "signatures")


def _pair_path(store_dir: str) -> str:
    return os.path.join(store_dir, "pairs")


def _stored_signatures(spark: SparkSession, store_dir: str) -> DataFrame:
    path = _sig_path(store_dir)
    # First batch is the ONLY silent-empty case; a genuine read failure
    # (corrupt footer, permissions) must propagate — treating it as
    # "first batch" would silently drop all cross-batch pairs.
    if not os.path.isdir(path):
        return spark.createDataFrame([], SIG_SCHEMA)
    return spark.read.schema(SIG_SCHEMA).parquet(path)


def _banded(sigs: DataFrame, bands: int) -> DataFrame:
    """(id, band, slice) rows — one per LSH band, same slicing as
    ``operators.dedup.lsh_candidate_pairs``."""
    return sigs.select(
        "id",
        "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bi: F.struct(
                    bi.alias("band"),
                    F.slice(
                        F.col("sig"),
                        (bi * (F.size("sig") / bands).cast("int") + 1).cast("int"),
                        (F.size("sig") / bands).cast("int"),
                    ).alias("slice"),
                ),
            )
        ).alias("bs"),
    ).select("id", "sig", F.col("bs.band").alias("band"), F.col("bs.slice").alias("slice"))


def sig_agreement(sa, sb):
    """Fraction of equal MinHash positions — unbiased Jaccard estimate."""
    return F.aggregate(
        F.zip_with(sa, sb, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.size(sa)


def process_dedup_batch(
    batch: DataFrame,
    store_dir: str,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 32,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """One micro-batch of incremental near-dup detection (callable
    directly for tests, or via the ``foreachBatch`` closure below)."""
    spark = batch.sparkSession
    new_sigs = minhash_signatures(
        batch, num_hashes=num_hashes, n=n, text_col=text_col, id_col=id_col
    ).persist()
    old_sigs = _stored_signatures(spark, store_dir)

    new_b = _banded(new_sigs, bands)
    all_b = _banded(old_sigs, bands).unionByName(new_b)
    # New-vs-(old ∪ new): every emitted pair has ≥1 side in this batch,
    # so a pair is reported exactly once, in the batch its second member
    # arrives. id_a < id_b canonicalizes within-batch double matches.
    cands = (
        new_b.alias("a")
        .join(all_b.alias("b"), ["band", "slice"])
        .filter(F.col("a.id") != F.col("b.id"))
        .select(
            F.least("a.id", "b.id").alias("id_a"),
            F.greatest("a.id", "b.id").alias("id_b"),
            sig_agreement(F.col("a.sig"), F.col("b.sig")).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .distinct()
    )
    # Materialize pairs BEFORE appending signatures: the candidate plan
    # lazily reads the signature store, and appending first would make
    # this batch self-join against its own store files.
    cands.write.mode("append").parquet(_pair_path(store_dir))
    new_sigs.write.mode("append").parquet(_sig_path(store_dir))
    new_sigs.unpersist()


def minhash_dedup_sink(
    docs_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 32,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Attach incremental near-dup detection to a streaming document
    DataFrame. Returns the started StreamingQuery."""

    def _process(batch: DataFrame, _batch_id: int) -> None:
        process_dedup_batch(
            batch,
            store_dir,
            threshold=threshold,
            num_hashes=num_hashes,
            bands=bands,
            n=n,
            text_col=text_col,
            id_col=id_col,
        )

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def near_dup_pairs(spark: SparkSession, store_dir: str) -> DataFrame:
    """Flagged pairs, deduplicated on read (replay-safe)."""
    return (
        spark.read.parquet(_pair_path(store_dir))
        .groupBy("id_a", "id_b")
        .agg(F.max("est_jaccard").alias("est_jaccard"))
    )


def compact_store(spark: SparkSession, store_dir: str, target_file_mb: int = 128) -> dict:
    """Periodic maintenance: every micro-batch appends one small parquet
    file per store table, so a long-running stream accumulates thousands
    of footer-dominated files. Rewrites both tables to ~target-sized
    files (signatures clustered by id so bucket joins get selective
    row-group stats). Run between availableNow passes or from a
    scheduled maintenance job — never concurrently with an active
    writer."""
    from ..sources.compaction import compact_parquet

    out = {}
    for name, path, sort in (
        ("signatures", _sig_path(store_dir), ["id"]),
        ("pairs", _pair_path(store_dir), ["id_a", "id_b"]),
    ):
        if os.path.isdir(path):
            out[name] = compact_parquet(spark, path, target_file_mb, sort_by=sort)
    return out
