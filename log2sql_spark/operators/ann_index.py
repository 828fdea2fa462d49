"""Persistent IVF index: build once into a snapshot store, probe many.

``ivf_topk`` (operators/similarity.py) recomputes the centroid
assignment on every call — fine for one-shot queries, wasteful for a
serving pattern where one corpus answers many query batches. Here the
inverted file is MATERIALIZED: vectors are assigned to centroids once
and committed to a :class:`~log2sql_spark.store.SnapshotStore`
CLUSTERED on ``centroid_id``, so the manifest carries per-file
centroid-id ranges. A probe then reads only the files whose range
intersects the probed centroid ids (`read_pruned`) — at 100 TB the
scan cost per query batch is nprobe/|centroids| of the corpus, served
straight from the index files, with the assignment cost paid once at
build time. Rebuilds after corpus changes are ordinary store commits
(atomic, time-travelable), and the same store supports MERGE for
incremental vector upserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from log2sql_spark.operators.similarity import (
    assign_to_centroids_vectorized,
    cosine,
)
from log2sql_spark.store import SnapshotStore


def build_ivf_index(
    spark: SparkSession,
    index_path: str,
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_files: int = 8,
) -> SnapshotStore:
    """Materialize the inverted file: (id, vec, centroid_id) clustered
    by centroid_id (range-partitioned files + manifest stats), plus the
    centroid table as a sibling store. Returns the index store."""
    assigned = assign_to_centroids_vectorized(vectors, centroids, id_col, vec_col)
    store = SnapshotStore(index_path)
    store.commit(
        assigned, mode="overwrite", cluster_by="centroid_id", target_files=target_files
    )
    cent_store = SnapshotStore(index_path + "_centroids")
    cent_store.commit(
        centroids.select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid_vec")
        ),
        mode="overwrite",
    )
    # Build-time cell-balance reference (r14, verdict #3): the per-cell
    # count histogram the drift monitor compares live counts against.
    hist_store = SnapshotStore(index_path + "_build_hist")
    hist_store.commit(
        assigned.groupBy("centroid_id").agg(
            F.count(F.lit(1)).cast("long").alias("build_n")
        ),
        mode="overwrite",
    )
    return store


def ivf_topk_indexed(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k against a prebuilt index. The probe set
    (|queries| × nprobe centroid ids) is computed against the broadcast
    centroid table, then the inverted file is read PRUNED to the files
    whose centroid range intersects the probe set — everything else
    never leaves disk."""
    cent = SnapshotStore(index_path + "_centroids").read(spark)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    probes = (
        q.join(F.broadcast(cent))
        .withColumn("c_sim", cosine(F.col("q_vec"), F.col("centroid_vec")))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(F.desc("c_sim"), F.asc("centroid_id"))
            ),
        )
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "q_vec", "centroid_id")
    )
    probe_ids = sorted(
        r.centroid_id for r in probes.select("centroid_id").distinct().collect()
    )
    index = SnapshotStore(index_path)
    lists = index.read_pruned(spark, probe_ids).filter(
        F.col("centroid_id").isin(probe_ids)
    )
    scored = (
        lists.join(probes, "centroid_id")
        .filter(F.col("query_id") != F.col("id"))
        .withColumn("cos_sim", cosine(F.col("q_vec"), F.col("vec")))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("id").alias("neighbor_id"), "cos_sim", "rank")
    )


def train_kmeans_centroids(
    spark: SparkSession,
    vectors: DataFrame,
    k: int = 16,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed Lloyd's k-means for IVF centroid training.

    Init is deterministic (the k vectors with the smallest ids — no RNG,
    so retraining reproduces the index bit-for-bit). Each round assigns
    every vector via the numpy-matmul path and recomputes centroids as
    per-cluster means with ONE aggregate (posexplode to (dim, value),
    avg per (centroid, dim), rebuild the array) — all map-side combined,
    so a round costs one pass over the vectors + a |k| x |dim| shuffle.
    Empty clusters keep their previous centroid. Returns (vec_id,
    embedding) shaped like a centroid table for build_ivf_index.
    """
    centroids = (
        vectors.orderBy(id_col)
        .limit(k)
        .select(
            F.row_number()
            .over(W.orderBy(id_col))
            .cast("long")
            .alias("cid"),
            F.col(vec_col).alias("cvec"),
        )
    )
    cent_rows = centroids.collect()  # k rows, tiny by contract
    for _ in range(iterations):
        cent_df = spark.createDataFrame(
            [(r.cid, r.cvec) for r in cent_rows], "vec_id long, embedding array<float>"
        )
        assigned = assign_to_centroids_vectorized(
            vectors, cent_df, id_col=id_col, vec_col=vec_col
        )
        means = (
            assigned.select(
                "centroid_id", F.posexplode("vec").alias("dim", "val")
            )
            .groupBy("centroid_id", "dim")
            .agg(F.avg("val").alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("dim", "m"))
                ).alias("dims")
            )
            .select(
                "centroid_id",
                F.transform("dims", lambda s: s["m"].cast("float")).alias("cvec"),
            )
            .collect()
        )
        new = {r.centroid_id: r.cvec for r in means}
        cent_rows = [
            type(r)(cid=r.cid, cvec=new.get(r.cid, r.cvec)) for r in cent_rows
        ]
    return spark.createDataFrame(
        [(r.cid, r.cvec) for r in cent_rows], "vec_id long, embedding array<float>"
    )


def kmeans_inertia(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Mean cosine distance (1 - similarity) of every vector to its
    assigned centroid — the convergence metric for the trainer."""
    assigned = assign_to_centroids_vectorized(vectors, centroids, id_col, vec_col)
    cent = centroids.select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cvec")
    )
    row = (
        assigned.join(F.broadcast(cent), "centroid_id")
        .select((1 - cosine(F.col("vec"), F.col("cvec"))).alias("d"))
        .agg(F.avg("d").alias("inertia"))
        .head()
    )
    return float(row.inertia)


def index_drift_report(
    spark: SparkSession, index_path: str, threshold_bp: int = 100
) -> DataFrame:
    """Cell-balance drift monitor (r14, verdict #3) — implements the
    rebuild trigger :func:`append_to_index` documents: per-cell LIVE
    counts from the index are compared against the BUILD-time histogram
    persisted beside the centroid store, as integer basis-point shares
    (exact cross-engine — no float division anywhere). A cell whose
    corpus share moved by >= ``threshold_bp`` basis points flags
    ``rebuild_cell`` = 1; any flagged cell means the frozen coarse
    quantizer no longer matches the corpus distribution and probe cost
    is drifting away from nprobe/|cells| — time to re-train centroids
    (a rebuild commit).

    Plan shape: one count aggregate over the index (map-side combined,
    |cells| output rows), a full-outer join of two |cells| relations,
    and a broadcast 1-row totals join — nothing data-proportional
    shuffles."""
    hist = SnapshotStore(index_path + "_build_hist").read(spark)
    live = (
        SnapshotStore(index_path)
        .read(spark)
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).cast("long").alias("live_n"))
    )
    cells = (
        hist.join(live, "centroid_id", "full_outer")
        .fillna(0, ["build_n", "live_n"])
    )
    totals = cells.agg(
        F.sum("build_n").alias("bt"), F.sum("live_n").alias("lt")
    )
    return (
        cells.crossJoin(F.broadcast(totals))
        .select(
            F.col("centroid_id").cast("long").alias("centroid_id"),
            F.col("build_n").cast("long").alias("build_n"),
            F.col("live_n").cast("long").alias("live_n"),
            F.expr("10000 * build_n DIV bt").cast("long").alias("build_share_bp"),
            F.expr("10000 * live_n DIV lt").cast("long").alias("live_share_bp"),
            F.expr(
                "abs(10000 * live_n DIV lt - 10000 * build_n DIV bt)"
            ).cast("long").alias("drift_bp"),
        )
        .withColumn(
            "rebuild_cell", (F.col("drift_bp") >= threshold_bp).cast("int")
        )
    )


def append_to_index(
    spark: SparkSession,
    index_path: str,
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_files: int = 4,
) -> SnapshotStore:
    """Index FRESHNESS without a rebuild (FAISS ``IndexIVF.add`` /
    Milvus insert semantics): new vectors are assigned against the
    FROZEN coarse quantizer — the centroid sibling store written at
    build time — and land as ONE clustered append commit. The manifest
    gains per-file centroid-id stats for the new files only; existing
    files are untouched, so the append is atomic, time-travelable, and
    O(|new vectors|) regardless of index size. Probes are unchanged:
    ``read_pruned`` sees old and new files through the same stats.
    The trade-off is the classic IVF one — cell balance drifts as the
    corpus distribution moves; re-training centroids is a rebuild,
    and :func:`index_drift_report` implements the detector (live
    per-cell counts vs the build-time histogram persisted at
    ``<path>_build_hist``, integer basis-point shares)."""
    cent = (
        SnapshotStore(index_path + "_centroids")
        .read(spark)
        .select(
            F.col("centroid_id").alias(id_col),
            F.col("centroid_vec").alias(vec_col),
        )
    )
    assigned = assign_to_centroids_vectorized(vectors, cent, id_col, vec_col)
    store = SnapshotStore(index_path)
    store.commit(
        assigned, mode="append", cluster_by="centroid_id", target_files=target_files
    )
    return store
