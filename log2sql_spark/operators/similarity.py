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
    """NULL (not an ANSI DIVIDE_BY_ZERO crash) for a zero-norm input:
    one all-zero embedding in 100 TB must not kill the job, and every
    threshold/top-k comparison drops the NULL exactly like DuckDB's
    0/0 = NaN fails the same comparison."""
    return F.try_divide(_dot(a, b), _norm(a) * _norm(b))


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
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    # Same two scale guards as assign_to_centroids: the nested loop is
    # compute-dominant and inherits the candidates' partitioning (one
    # parquet file = 1-2 cores working), and per-side norms fold once
    # per row instead of once per pair (the pair then costs ONE dot,
    # not three). Values are bit-identical: the per-side folds are the
    # same sequential folds the inline cosine performed.
    par = candidates.sparkSession.sparkContext.defaultParallelism
    if c.rdd.getNumPartitions() < par:
        c = c.repartition(par)
    c = c.withColumn("c_norm", _norm(F.col("c_vec")))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_sim",
            F.try_divide(
                _dot(F.col("q_vec"), F.col("c_vec")),
                F.col("q_norm") * F.col("c_norm"),
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def vectorized_partial_scores(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 65_536,
) -> DataFrame:
    """Arrow-vectorized twin of :func:`brute_force_topk`: the query
    matrix rides into every task as a broadcast numpy array and each
    candidate batch is scored with one float64 matmul.

    Spark's higher-order-function fold (`aggregate`/`zip_with`) is
    interpreted per element — fine for correctness, slow at volume; this
    is the documented fast path (BLAS batch × query matmul) and is
    ~5-20× faster at 10⁵+ candidates. Scores can differ from the
    sequential fold in the last float ulp (BLAS summation order), which
    is why the oracle-checked exact query uses the fold and this variant
    is benchmarked/tested against it for set equality.

    Each Arrow batch emits only its *partial top-k*: per query, the k-th
    largest score is found with ``np.partition`` (O(|batch|)) and only
    candidates at-or-above that threshold survive (ties at the boundary
    are all kept, so the emitted set provably contains the global top-k
    under the (-cos_sim, neighbor_id) total order). The pre-shuffle
    volume is therefore ≈|Q|·k rows per batch instead of |batch|·|Q| —
    at 10⁹ candidates and Q=100 that is the difference between shuffling
    ~10⁵·k rows and shuffling 10¹¹. The global window is then a cheap
    final reduce over ≤|Q|·k·n_batches rows."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    # The query set must be driver-resident (it broadcasts as a numpy
    # matrix); enforce the "small by contract" bound instead of trusting
    # it — an oversized query set would otherwise OOM the driver.
    q_rows = queries.select(id_col, vec_col).limit(max_queries + 1).collect()
    if len(q_rows) > max_queries:
        raise ValueError(
            f"brute_force_topk_vectorized: query set exceeds {max_queries} rows; "
            "swap the sides or use ivf_topk for large query sets"
        )
    if not q_rows:  # np.array([]) is 1-D; short-circuit the degenerate case
        spark = candidates.sparkSession
        return spark.createDataFrame([], "query_id long, neighbor_id long, cos_sim double")
    q_ids = np.array([r[id_col] for r in q_rows])
    q_mat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)

    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast((q_ids, q_mat, q_norm))

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat, norms = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            c_ids = pdf[id_col].to_numpy()
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            c_norm = np.linalg.norm(c_mat, axis=1)
            sims = (mat @ c_mat.T) / np.outer(norms, c_norm)  # |Q| × |batch|
            # Self-matches never rank: force them below any real score so
            # the partial top-k never spends a slot on them.
            sims[ids[:, None] == c_ids[None, :]] = -np.inf
            n_q, n_c = sims.shape
            kk = min(k, n_c)
            # k-th largest per query row; keep everything >= it (boundary
            # ties included — sufficiency: a candidate below its batch's
            # k-th score is dominated by k batch-mates and can never be
            # in the global top-k).
            thresh = np.partition(sims, n_c - kk, axis=1)[:, n_c - kk]
            keep = (sims >= thresh[:, None]) & np.isfinite(sims)
            qi, ci = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "query_id": ids[qi],
                    "neighbor_id": c_ids[ci],
                    "cos_sim": sims[qi, ci],
                }
            )

    return candidates.select(id_col, vec_col).mapInPandas(score, schema=out_schema)


def brute_force_topk_vectorized(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_queries: int = 65_536,
) -> DataFrame:
    """Arrow-vectorized exact cosine top-k (see
    :func:`vectorized_partial_scores` for the scoring/partial-top-k
    contract). The global window here only reduces ≤|Q|·k·n_batches
    pre-pruned rows — the heavy |Q|×|C| cross-product never shuffles."""
    scored = vectorized_partial_scores(
        queries, candidates, k, id_col, vec_col, max_queries
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
        F.col(id_col).alias("centroid_id"),
        F.col(vec_col).alias("centroid_vec"),
        _norm(F.col(vec_col)).alias("c_norm"),
    )
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    # The |vectors| x |centroids| score is the compute-dominant stage and
    # inherits the INPUT's partitioning — one parquet file would run it
    # on 1-2 cores. Spread the narrow vector rows first (same rationale
    # as minhash_dedup_pairs); norms are precomputed once per side so
    # each pair evaluates only the dot product (the naive cosine
    # recomputes both norms per pair: 3x the higher-order-function work,
    # which is interpreted, not codegen'd).
    par = vectors.sparkSession.sparkContext.defaultParallelism
    if v.rdd.getNumPartitions() < par:
        v = v.repartition(par)
    v = v.withColumn("v_norm", _norm(F.col("vec")))
    scored = v.join(F.broadcast(c)).withColumn(
        "c_sim",
        F.try_divide(
            _dot(F.col("vec"), F.col("centroid_vec")),
            F.col("v_norm") * F.col("c_norm"),
        ),
    )
    # Argmax via max_by, NOT a per-id window: the |vectors| x |centroids|
    # cross product partial-aggregates map-side to ONE row per vector
    # before the shuffle. The window form shuffled the entire scored
    # cross product (vec + centroid_vec per row) — at 20k vectors x 800
    # centroids that is a 16M-row, multi-GB shuffle and took minutes;
    # this form shuffles |vectors| rows. Tie-break matches the old
    # ordering (c_sim desc, centroid_id asc) via the (c_sim, -centroid)
    # struct key.
    return (
        scored.groupBy("id")
        .agg(
            F.max_by(
                F.col("centroid_id"),
                F.struct(F.col("c_sim"), (-F.col("centroid_id")).alias("tb")),
            ).alias("centroid_id"),
            F.first("vec").alias("vec"),
        )
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
    vectorized_assign: bool = True,
) -> DataFrame:
    """IVF approximate top-k: probe the nprobe nearest inverted lists.

    Same output shape as brute_force_topk; recall < 1 by construction,
    trading scanned volume (nprobe/|centroids|) for it. Assignment runs
    through the numpy-matmul path by default (oracle-identical to the
    expression fold — verified at every SF by llm_ann_indexed sharing
    llm_sim_topk_ivf's SQL oracle); pass ``vectorized_assign=False``
    for the pure-expression twin."""
    assign = (
        assign_to_centroids_vectorized if vectorized_assign else assign_to_centroids
    )
    assigned = assign(candidates, centroids, id_col, vec_col)

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


def assign_to_centroids_vectorized(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """BLAS form of :func:`assign_to_centroids`: the centroid matrix is
    small by design (that is what makes it a centroid table), so it
    rides to every task as a numpy array and each Arrow batch assigns
    via one normalized matmul + argmax — thousands of times fewer
    interpreter dispatches than the per-pair higher-order-function
    cosine. Tie-break matches the expression form: numpy argmax takes
    the FIRST maximum and the centroid axis is sorted by id, so ties go
    to the smallest centroid_id."""
    import numpy as np
    import pandas as pd

    cents = centroids.select(id_col, vec_col).collect()
    cid = np.array([r[0] for r in cents], dtype=np.int64)
    order = np.argsort(cid)
    cid = cid[order]
    C = np.array([list(r[1]) for r in cents], dtype=np.float64)[order]
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    par = vectors.sparkSession.sparkContext.defaultParallelism
    if v.rdd.getNumPartitions() < par:
        v = v.repartition(par)

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(pdf["vec"].tolist(), dtype=np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            best = np.argmax(Vn @ Cn.T, axis=1)
            yield pd.DataFrame(
                {"id": pdf["id"].values, "vec": pdf["vec"], "centroid_id": cid[best]}
            )

    return v.mapInPandas(assign, schema="id long, vec array<float>, centroid_id long")


def pq_codes(
    vecs: DataFrame,
    codebook: DataFrame,
    m: int = 4,
    id_col: str = "id",
    vec_col: str = "qv",
) -> DataFrame:
    """Product-quantization encoding: each vector splits into ``m``
    subvectors, each assigned to its nearest codebook centroid (exact
    integer L2 over pre-quantized components; ties break to the lowest
    code — bit-deterministic across engines).

    ``vecs``: (id, qv array<bigint>); ``codebook``: (sub, code, cv) —
    per-subspace centroid subvectors. Output: one row per vector with
    ``m`` code columns (c0..c{m-1}) and the total squared quantization
    error. At 64 dims / m=4 / 16 codes this stores 2 bytes per vector
    instead of 256 — the compression that lets an ANN index hold 1e11
    vectors in RAM (IVF-PQ, Jégou et al., TPAMI 2011).

    Scale shape: subvector explode is map-side (|V|·m rows), the
    codebook join is a BROADCAST (m·k tiny rows), and the argmin is one
    partial-aggregating groupBy on (id, sub) followed by a pivot-style
    re-aggregation on id — two shuffles of code-sized rows, never of
    raw vectors, linear in |V|.
    """
    dim_expr = f"int(size({vec_col}) / {m})"
    subs = vecs.select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {m - 1}), "
                f"mm -> slice({vec_col}, mm * {dim_expr} + 1, {dim_expr}))"
            )
        ).alias("sub", "sv"),
    )
    joined = subs.join(F.broadcast(codebook), "sub")
    dist = F.expr(
        "aggregate(zip_with(sv, cv, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"
    )
    best = (
        joined.select(id_col, "sub", "code", dist.alias("d"))
        .groupBy(id_col, "sub")
        .agg(F.min(F.struct(F.col("d"), F.col("code"))).alias("b"))
    )
    return best.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("sub") == mm, F.col("b.code"))).cast("bigint").alias(f"c{mm}")
            for mm in range(m)
        ],
        F.sum("b.d").cast("bigint").alias("err"),
    )


def gram_matrix(
    vecs: DataFrame, dim: int, id_col: str = "id", vec_col: str = "qv"
) -> DataFrame:
    """Distributed Gram matrix X^T X over pre-quantized integer
    vectors — the one-pass building block of covariance/PCA/linear
    regression at scale: each Arrow batch contributes a d x d partial
    (numpy int64 matmul, no Python loop over rows), partitions emit
    only their d(d+1)/2 upper-triangle cells, and one tiny groupBy
    folds the partials. The shuffle moves O(partitions * d^2) cells —
    never a vector — so a 100 TB embedding table reduces to a
    driver-sized matrix in a single pass; eigen-decomposition of the
    result is an O(d^3) driver/NumPy afterthought, not a cluster job.

    Integer inputs make the cell sums order-free and therefore
    bit-identical across engines and across partitionings (float
    accumulation order would differ run to run).

    Output: (i, j, g) for i <= j, g = sum over rows of qv[i]*qv[j].
    """
    import numpy as np
    import pandas as pd

    def gram(batches):
        acc = np.zeros((dim, dim), dtype=np.int64)
        seen = False
        for pdf in batches:
            if len(pdf):
                X = np.stack(pdf[vec_col].to_numpy()).astype(np.int64)
                acc += X.T @ X
                seen = True
        if seen:
            iu = np.triu_indices(dim)
            yield pd.DataFrame(
                {"i": iu[0].astype("int32"), "j": iu[1].astype("int32"),
                 "g": acc[iu]}
            )

    partials = vecs.select(vec_col).mapInPandas(
        gram, schema="i int, j int, g long"
    )
    return partials.groupBy("i", "j").agg(F.sum("g").cast("long").alias("g"))
