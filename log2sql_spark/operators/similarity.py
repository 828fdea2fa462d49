"""Similarity search over embedding columns (array<float>).

North-star operator family (absent from the reference; SURVEY.md §2.2).
Two tiers:

* **brute-force cosine top-k** — the correctness baseline. Queries are
  broadcast (a query set is small by definition); candidates stream
  through executors; a per-query window keeps top-k. Cost O(|Q|·|C|·d)
  but embarrassingly parallel and shuffle-light (only top-k rows move).
* **IVF top-k** — the 100 TB path: vectors are assigned to their
  nearest centroid once (an O(|C|·|centroids|) broadcast pass, stored
  co-partitioned); a query probes only the ``nprobe`` nearest inverted
  lists, cutting the scanned fraction to nprobe/n_centroids.

The dot product is a sequential JVM fold (``aggregate`` over
``zip_with``) in float64 — bit-reproducible across engines, which makes
even the ANN variant oracle-checkable when centroid choice is
deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold double dot product (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos_sim, rank).

    ``queries`` is broadcast — the join is a map-side nested loop, no
    shuffle of the candidate corpus; only k rows per query survive the
    window (WindowGroupLimit prunes eagerly)."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    c = candidates.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def assign_to_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec, centroid_id): nearest centroid by cosine, broadcast pass.
    At scale this result is written partitioned by centroid_id — the
    inverted file."""
    c = centroids.select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid_vec")
    )
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    scored = v.join(F.broadcast(c)).withColumn(
        "c_sim", cosine(F.col("vec"), F.col("centroid_vec"))
    )
    w = W.partitionBy("id").orderBy(F.desc("c_sim"), F.asc("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("id", "vec", "centroid_id")
    )


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: probe the nprobe nearest inverted lists.

    Same output shape as brute_force_topk; recall < 1 by construction,
    trading scanned volume (nprobe/|centroids|) for it."""
    assigned = assign_to_centroids(candidates, centroids, id_col, vec_col)

    c = centroids.select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid_vec")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    probes = (
        q.join(F.broadcast(c))
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
    scored = (
        assigned.join(probes, "centroid_id")
        .filter(F.col("query_id") != F.col("id"))
        .withColumn("cos_sim", cosine(F.col("q_vec"), F.col("vec")))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("id").alias("neighbor_id"), "cos_sim", "rank")
    )
