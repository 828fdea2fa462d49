"""Semantic invariants for the curation wave: chunking coverage, bloom
no-false-negatives, SemDeDup keep policy, RRF fusion bounds.

The oracle sweep hash-checks exact outputs; these tests pin the
*properties* that make the operators correct by design, so a future
refactor that still happens to hash-match a stale oracle cannot
silently weaken the semantics.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from log2sql_spark.registry import all_queries


def test_chunk_windows_cover_every_token(spark, sf_dir):
    """Every token index of every document falls inside >= 1 chunk, and
    every chunk except a doc's last is exactly CHUNK_SIZE tokens."""
    from log2sql_spark.queries.curation import _CHUNK_SIZE, _CHUNK_STRIDE

    out = all_queries()["llm_chunk_sliding_window"](spark, sf_dir)
    rows = out.collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n")
    )
    n_by_doc = {r.doc_id: r.n for r in docs.collect()}

    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(n_by_doc)

    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        n = n_by_doc[doc_id]
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        covered_end = 0
        for c in chunks:
            start = c.chunk_idx * _CHUNK_STRIDE
            assert start <= covered_end, "gap between consecutive chunks"
            covered_end = max(covered_end, start + c.n_tokens)
        assert covered_end == n, f"doc {doc_id}: tail tokens uncovered"
        for c in chunks[:-1]:
            assert c.n_tokens == _CHUNK_SIZE


def test_bloom_has_no_false_negatives(spark, sf_dir):
    """Every (doc, gram) the EXACT eval-set intersection flags must be
    flagged by the bloom filter too — bloom errors are one-sided."""
    from log2sql_spark.operators.dedup import word_ngrams

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    grams_of = docs.select(
        "doc_id", F.explode(word_ngrams(F.col("text"), n=3)).alias("gram")
    )
    eval_grams = grams_of.filter(F.col("doc_id") >= 450).select("gram").distinct()
    exact = (
        grams_of.filter(F.col("doc_id") < 300)
        .join(eval_grams, "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_exact"))
    )
    bloom = all_queries()["llm_decontaminate_bloom"](spark, sf_dir)
    joined = bloom.join(exact, "doc_id", "left").fillna(0, subset=["n_exact"])
    bad = joined.filter(F.col("n_flagged") < F.col("n_exact")).count()
    assert bad == 0


def test_semdedup_prunes_only_within_clusters(spark, sf_dir):
    out = all_queries()["llm_semdedup"](spark, sf_dir).collect()
    kept = {r.vec_id for r in out if r.kept}
    dropped = {r.vec_id for r in out if not r.kept}
    # The planted near-identical variants (vec_id >= 10000) must all be
    # pruned in favor of their lower-id originals.
    assert all(v >= 10000 for v in dropped)
    assert {v - 10000 for v in dropped} <= kept
    # Every cluster retains at least one member.
    clusters_all = {r.centroid_id for r in out}
    clusters_kept = {r.centroid_id for r in out if r.kept}
    assert clusters_all == clusters_kept


def test_rrf_orders_and_bounds(spark, sf_dir):
    from log2sql_spark.queries.curation import _RRF_K, _RRF_TOPN

    rows = all_queries()["search_hybrid_rrf"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    scores = [r.rrf for r in rows]
    assert scores == sorted(scores, reverse=True)
    hi = 2 * round(1.0 / (_RRF_K + 1), 6)
    for r in rows:
        assert 0 < r.rrf <= hi
        assert r.bm25_rank is None or 1 <= r.bm25_rank <= _RRF_TOPN
        assert r.dense_rank is None or 1 <= r.dense_rank <= _RRF_TOPN
        assert r.bm25_rank is not None or r.dense_rank is not None
