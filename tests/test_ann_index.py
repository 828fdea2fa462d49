"""Persistent IVF index (operators/ann_index.py): build-once/probe-many
equivalence with the direct ivf_topk, and manifest-stat read pruning."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from log2sql_spark.operators.ann_index import build_ivf_index, ivf_topk_indexed
from log2sql_spark.operators.similarity import ivf_topk
from log2sql_spark.sources.tables import load_table
from log2sql_spark.store import SnapshotStore

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r.query_id, r.neighbor_id, round(r.cos_sim, 6), r.rank) for r in df.collect()
    )


def test_indexed_matches_direct_ivf(spark, tmp_path):
    emb = load_table(spark, "embeddings", SF)
    centroids = emb.filter(F.col("vec_id") % 25 == 0)
    idx = str(tmp_path / "ivf")
    build_ivf_index(spark, idx, emb, centroids)

    queries = emb.filter(F.col("vec_id") < 20)
    direct = ivf_topk(queries, emb, centroids, k=5, nprobe=3)
    indexed = ivf_topk_indexed(spark, idx, queries, k=5, nprobe=3)
    assert _rows(indexed) == _rows(direct)

    # build once, probe again with a DIFFERENT batch — no rebuild
    head_before = SnapshotStore(idx).head_version()
    queries2 = emb.filter((F.col("vec_id") >= 20) & (F.col("vec_id") < 30))
    direct2 = ivf_topk(queries2, emb, centroids, k=5, nprobe=3)
    indexed2 = ivf_topk_indexed(spark, idx, queries2, k=5, nprobe=3)
    assert _rows(indexed2) == _rows(direct2)
    assert SnapshotStore(idx).head_version() == head_before


def test_read_pruned_skips_files(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "s"))
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    store.commit(df, cluster_by="k", target_files=8)
    snap = store.snapshot(1)
    assert len(snap.entries) == 8

    pruned = store.read_pruned(spark, [3, 5])
    # the pruned frame reads a strict subset of files
    n_files = pruned.select(F.input_file_name()).distinct().count()
    assert n_files == 1
    got = sorted(r.k for r in pruned.filter(F.col("k").isin(3, 5)).collect())
    assert got == [3, 5]

    # values outside every range -> empty, schema intact
    assert store.read_pruned(spark, [10**9]).count() == 0


def test_kmeans_training_improves_centroids(spark):
    from log2sql_spark.operators.ann_index import (
        kmeans_inertia,
        train_kmeans_centroids,
    )

    emb = load_table(spark, "embeddings", SF).select("vec_id", "embedding")
    naive = emb.orderBy("vec_id").limit(8)
    trained = train_kmeans_centroids(spark, emb, k=8, iterations=4)
    assert trained.count() == 8
    i_naive = kmeans_inertia(emb, naive)
    i_trained = kmeans_inertia(emb, trained)
    assert i_trained < i_naive  # Lloyd's iterations must reduce inertia

    # deterministic: retraining reproduces the exact centroids
    again = train_kmeans_centroids(spark, emb, k=8, iterations=4)
    a = {r.vec_id: list(r.embedding) for r in trained.collect()}
    b = {r.vec_id: list(r.embedding) for r in again.collect()}
    assert a == b


def test_append_to_index_matches_fresh_build(spark, tmp_path):
    """An append-maintained index (frozen quantizer) must be
    indistinguishable from a fresh build over the union — and the
    append must keep the manifest's pruning stats alive."""
    from log2sql_spark.operators.ann_index import append_to_index

    emb = load_table(spark, "embeddings", SF)
    centroids = emb.filter(F.col("vec_id") % 25 == 0)
    idx = str(tmp_path / "ivf_incr")
    build_ivf_index(spark, idx, emb.filter(F.col("vec_id") % 2 == 0), centroids)
    v1_entries = set(
        e["path"] for e in SnapshotStore(idx).snapshot(1).entries
    )
    append_to_index(spark, idx, emb.filter(F.col("vec_id") % 2 == 1))
    store = SnapshotStore(idx)
    snap = store.snapshot(store.head_version())
    # old files untouched (append, not rewrite); stats on every entry
    assert v1_entries < {e["path"] for e in snap.entries}
    assert snap.cluster_by == "centroid_id" and snap.has_stats

    queries = emb.filter(F.col("vec_id") < 20)
    direct = ivf_topk(queries, emb, centroids, k=5, nprobe=3)
    indexed = ivf_topk_indexed(spark, idx, queries, k=5, nprobe=3)
    assert _rows(indexed) == _rows(direct)


def test_drift_report_flips_on_skewed_append(spark, tmp_path):
    """index_drift_report (r14, verdict #3): balanced at build time ->
    every cell verdict 0; after a batch concentrated on ONE cell
    appends, that cell's share moves past the threshold and its
    rebuild_cell verdict flips to 1 — the rebuild trigger
    append_to_index documents."""
    from log2sql_spark.operators.ann_index import (
        append_to_index,
        index_drift_report,
    )

    emb = load_table(spark, "embeddings", SF)
    centroids = emb.filter((F.col("vec_id") % 25 == 0) & (F.col("vec_id") < 625))
    idx = str(tmp_path / "ivf")
    build_ivf_index(spark, idx, emb, centroids)

    # build-time histogram persisted beside the centroid store
    hist = SnapshotStore(idx + "_build_hist").read(spark)
    n_total = load_table(spark, "embeddings", SF).count()
    assert hist.agg(F.sum("build_n")).head()[0] == n_total

    # freshly built: live == build everywhere, zero drift
    rep0 = index_drift_report(spark, idx, threshold_bp=100)
    assert rep0.filter(F.col("rebuild_cell") == 1).count() == 0
    assert rep0.agg(F.max("drift_bp")).head()[0] == 0

    # skewed append: many copies of one cell's member vectors (fresh
    # ids) — assignment against the frozen quantizer lands them all in
    # the same cell
    hot = emb.filter(F.col("vec_id") == 1).select("embedding")
    n_hot = max(50, n_total // 3)
    skew = (
        spark.range(n_hot)
        .select((F.col("id") + 1_000_000).alias("vec_id"))
        .crossJoin(F.broadcast(hot))
    )
    append_to_index(spark, idx, skew)

    rep1 = index_drift_report(spark, idx, threshold_bp=100)
    flagged = rep1.filter(F.col("rebuild_cell") == 1)
    assert flagged.count() >= 1
    # the flagged cell is the one that GAINED share
    top = flagged.orderBy(F.desc("drift_bp")).head()
    assert top.live_share_bp > top.build_share_bp
    # counts reconcile: live total = build total + appended rows
    assert rep1.agg(F.sum("live_n")).head()[0] == n_total + n_hot
    # the build-time reference histogram is immutable under appends
    assert rep1.agg(F.sum("build_n")).head()[0] == n_total
