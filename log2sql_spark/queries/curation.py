r"""Corpus-curation operators round 3: chunking, bloom decontamination,
semantic dedup, hybrid retrieval fusion.

Four pipeline stages a training-data build runs between raw documents
and tokenized shards, each expressed as pure JVM DataFrame plans:

- sliding-window chunking (the RAG/embedding prep step: one explode,
  no shuffle at all — chunk boundaries are per-row arithmetic);
- bloom-filter decontamination (the eval-set n-gram filter when the
  eval set is too large to broadcast exactly: the bitmap is m bits
  regardless of |eval|, and membership is bit arithmetic on a
  broadcast array<long> literal — no join against the eval side);
- SemDeDup-style semantic dedup (cluster embeddings, prune within
  clusters only: globally linear in |corpus|, quadratic only inside a
  cluster — the published recipe for embedding-level dedup at scale);
- reciprocal-rank fusion of BM25 and dense cosine rankings (the
  standard hybrid-retrieval reducer; two bounded top-k lists, one
  outer join).

Reference analog: none — the reference (305 LoC, `main.py`,
`log2sql.py`) has no corpus operators; this is the mandated
LLM-pipeline extension surface (SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from log2sql_spark.registry import query
from log2sql_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# Sliding-window chunking
# --------------------------------------------------------------------------

_CHUNK_SIZE = 32
_CHUNK_STRIDE = 24


@query(
    "llm_chunk_sliding_window",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents
    ), c AS (
      SELECT doc_id, toks,
             1 + (greatest(0, len(toks) - {_CHUNK_SIZE}) + {_CHUNK_STRIDE - 1})
                 // {_CHUNK_STRIDE} AS n_chunks
      FROM t
    ), e AS (
      SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_idx FROM c
    )
    SELECT doc_id,
           CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(len(toks[CAST(chunk_idx * {_CHUNK_STRIDE} + 1 AS INTEGER)
                         : CAST(chunk_idx * {_CHUNK_STRIDE} + {_CHUNK_SIZE} AS INTEGER)])
                AS BIGINT) AS n_tokens,
           md5(array_to_string(
               toks[CAST(chunk_idx * {_CHUNK_STRIDE} + 1 AS INTEGER)
                    : CAST(chunk_idx * {_CHUNK_STRIDE} + {_CHUNK_SIZE} AS INTEGER)], ' '))
             AS chunk_md5
    FROM e
    ORDER BY doc_id, chunk_idx
    """,
)
def llm_chunk_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunks (size 32, stride 24) — the
    embedding/RAG prep step. Per-document arithmetic only: split once,
    posexplode a 0..n_chunks-1 sequence, slice the token array per
    chunk. A map-only pass (the orderBy is presentation-only) whose
    partitioning inherits the scan's — at 100 TB the many-file input
    provides the parallelism and nothing shuffles; locally a single
    small corpus file would pin the md5 work to 1-2 cores, so an
    under-partitioned input is spread once first."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_chunks = (
        F.lit(1)
        + F.expr(
            f"(greatest(0, size(split(trim(text), '\\\\s+')) - {_CHUNK_SIZE})"
            f" + {_CHUNK_STRIDE - 1}) div {_CHUNK_STRIDE}"
        )
    ).cast("int")
    out = (
        docs.select("doc_id", toks.alias("toks"), n_chunks.alias("n_chunks"))
        .select(
            "doc_id",
            "toks",
            F.posexplode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias(
                "chunk_idx", "_i"
            ),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.slice(
                F.col("toks"),
                F.col("chunk_idx") * _CHUNK_STRIDE + 1,
                F.lit(_CHUNK_SIZE),
            ).alias("chunk_toks"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.size("chunk_toks").cast("long").alias("n_tokens"),
            F.md5(F.array_join("chunk_toks", " ")).alias("chunk_md5"),
        )
    )
    return out.orderBy("doc_id", "chunk_idx")


# --------------------------------------------------------------------------
# Bloom-filter decontamination
# --------------------------------------------------------------------------

_BLOOM_BITS = 1 << 18  # m: 262144 bits -> 4096-long bitmap (32 KiB)
_BLOOM_SLICES = (1, 9, 17)  # k=3 md5-substring hash functions


def _bloom_positions(gram: Column) -> list[Column]:
    """k portable hash positions for a gram: 60-bit slices of md5(gram)
    mod m. md5 is bit-identical across Spark and DuckDB, so the oracle
    reproduces the exact bitmap semantics (false positives included)."""
    h = F.md5(gram)
    return [
        F.pmod(
            F.conv(F.substring(h, start, 15), 16, 10).cast("long"), F.lit(_BLOOM_BITS)
        )
        for start in _BLOOM_SLICES
    ]


def _bloom_oracle() -> str:
    m = _BLOOM_BITS
    pos_exprs = [
        f"('0x' || substr(md5(gram), {s}, 15))::BIGINT % {m}" for s in _BLOOM_SLICES
    ]
    eval_bits = " UNION ".join(
        f"SELECT {p} AS pos FROM eval_grams" for p in pos_exprs
    )
    all_set = " AND ".join(f"({p}) IN (SELECT pos FROM bits)" for p in pos_exprs)
    return rf"""
    WITH grams_of AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(len(regexp_split_to_array(trim(text), '\s+')) - 1, 1)),
               i -> regexp_split_to_array(trim(text), '\s+')[i] || ' ' ||
                    regexp_split_to_array(trim(text), '\s+')[i+1] || ' ' ||
                    regexp_split_to_array(trim(text), '\s+')[i+2]))) AS gram
      FROM documents
    ), eval_grams AS (
      SELECT DISTINCT gram FROM grams_of WHERE doc_id >= 450
    ), bits AS ({eval_bits}),
    train AS (SELECT doc_id, gram FROM grams_of WHERE doc_id < 300),
    flagged AS (
      SELECT doc_id, gram FROM train WHERE {all_set}
    ), stats AS (
      SELECT t.doc_id,
             CAST(count(DISTINCT t.gram) AS BIGINT) AS n_grams,
             CAST(count(DISTINCT f.gram) AS BIGINT) AS n_flagged
      FROM train t LEFT JOIN flagged f
        ON t.doc_id = f.doc_id AND t.gram = f.gram
      GROUP BY t.doc_id
    )
    -- every train doc gets a verdict, including gram-less ones (< 3
    -- tokens): the report contract is per-document, not per-gram
    SELECT d.doc_id,
           coalesce(s.n_grams, 0) AS n_grams,
           coalesce(s.n_flagged, 0) AS n_flagged,
           coalesce(s.n_flagged, 0) > 0 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id < 300) d
    LEFT JOIN stats s ON d.doc_id = s.doc_id
    ORDER BY d.doc_id
    """


@query("llm_decontaminate_bloom", oracle=_bloom_oracle())
def llm_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter eval-set decontamination. The broadcast-exact-set
    contamination check (llm_contamination_check) ships the whole eval
    gram set to every executor; when the eval suite is itself large,
    the bloom bitmap caps that at m bits (here 32 KiB for m=2^18,
    k=3) at the cost of a deterministic false-positive rate — the
    right trade for a REJECT filter, where a false positive only drops
    a clean document.

    Build: eval 3-gram positions (k portable md5-slice hashes), then
    one distinct-aggregate whose output is bounded by m (NOT |eval|)
    before a driver fold into 4096 longs — the only collect, ≤ m/64
    words by construction. Probe: the bitmap rides into the train scan
    as an array<long> literal; membership is element_at + (>> & 1) bit
    arithmetic inside a SQL lambda over the per-doc gram array —
    map-only, no join against the eval side, not even a groupBy (the
    gram array is already distinct). The oracle reproduces the pooled-
    bit semantics (any eval gram × any hash can set a probed bit), so
    false positives hash-match too."""
    from log2sql_spark.operators.dedup import word_ngrams

    docs = load_table(spark, "documents", sf_dir)
    par = spark.sparkContext.defaultParallelism
    eval_docs = docs.filter(F.col("doc_id") >= 450).select("doc_id", "text")
    if eval_docs.rdd.getNumPartitions() < par:
        eval_docs = eval_docs.repartition(par)
    eval_pos = (
        eval_docs
        .select(F.explode(word_ngrams(F.col("text"), n=3)).alias("gram"))
        .select(F.explode(F.array(*_bloom_positions(F.col("gram")))).alias("pos"))
        .distinct()
    )
    words = [0] * (_BLOOM_BITS // 64)
    for (pos,) in eval_pos.collect():  # bounded by m/64 words, see docstring
        words[pos // 64] |= 1 << (pos % 64)
    # Two's-complement fold into signed longs for the JVM literal.
    bitmap = F.lit([w - (1 << 64) if w >= (1 << 63) else w for w in words])

    # Probe side is a single map-only projection: word_ngrams is
    # already distinct per doc, so flagged counts are array ops over
    # the gram array — no explode, no shuffle at all (the orderBy is
    # presentation-only). The bit test lives in a SQL lambda because
    # the PySpark shiftright/shiftleft wrappers only take int-literal
    # shifts.
    # md5 ONCE per gram: higher-order lambdas are interpreted (no
    # codegen common-subexpression elimination), so spelling the three
    # bit probes inline made every gram pay 3 md5 digests (and every
    # position a second conv parse for the % 64). Hoist through nested
    # transforms — grams -> md5 hex -> the k positions -> forall bit
    # test — and each gram costs 1 md5 + k convs (guide §1.2 "per-task
    # work"); the arithmetic per probe is unchanged, so verdicts and
    # false positives are bit-identical.
    slices = ", ".join(str(s) for s in _BLOOM_SLICES)
    flagged_sql = (
        "size(filter("
        "  transform(transform(_grams, g -> md5(g)),"
        f"            h -> transform(array({slices}),"
        "                            s -> pmod(cast(conv(substr(h, s, 15), 16, 10)"
        f"                                          as bigint), {_BLOOM_BITS}))),"
        "  ps -> forall(ps, p ->"
        "          (shiftright(element_at(_bm, cast(p div 64 as int) + 1),"
        "                      cast(p % 64 as int)) & 1) = 1)))"
    )
    # The probe's parallelism is inherited from the input partitioning;
    # a small compressed corpus file would run the md5-heavy lambda on
    # 1-2 cores. Spread the narrow doc rows first (same fix as
    # minhash_dedup_pairs) — the round-robin shuffle moves raw text
    # once, the gram/hash work then uses every core.
    train = docs.filter(F.col("doc_id") < 300).select("doc_id", "text")
    if train.rdd.getNumPartitions() < par:
        train = train.repartition(par)
    return (
        train
        .select(
            "doc_id",
            word_ngrams(F.col("text"), n=3).alias("_grams"),
        )
        .withColumn("_bm", bitmap)
        .select(
            "doc_id",
            F.size("_grams").cast("long").alias("n_grams"),
            F.expr(f"cast({flagged_sql} as bigint)").alias("n_flagged"),
        )
        .withColumn("contaminated", F.col("n_flagged") > 0)
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# SemDeDup: cluster-then-prune semantic dedup
# --------------------------------------------------------------------------

_SEM_TAU = 0.99


@query(
    "llm_semdedup",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300
      UNION ALL
      SELECT vec_id + 10000 AS vec_id,
             list_transform(range(1, len(embedding) + 1),
               i -> CAST(embedding[i] AS DOUBLE)
                    * (1 + 0.01 * (((CAST(i AS INTEGER) - 1) % 3) - 1))) AS embedding
      FROM embeddings WHERE vec_id < 50
    ), cent AS (
      SELECT vec_id AS centroid_id, embedding AS centv
      FROM embeddings WHERE vec_id % 20 = 0 AND vec_id < 300
    ), assign_scored AS (
      SELECT vec_id, embedding, centroid_id,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY (list_sum(list_transform(range(1, len(embedding) + 1),
                          i -> CAST(embedding[i] AS DOUBLE) * CAST(centv[i] AS DOUBLE))))
                        / (sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
                             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))
                         * sqrt(list_sum(list_transform(range(1, len(centv) + 1),
                             i -> CAST(centv[i] AS DOUBLE) * CAST(centv[i] AS DOUBLE)))))
                        DESC, centroid_id) AS rn
      FROM corpus, cent
    ), assigned AS (
      SELECT vec_id, embedding, centroid_id FROM assign_scored WHERE rn = 1
    ), dropped AS (
      SELECT DISTINCT b.vec_id
      FROM assigned a JOIN assigned b
        ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
      WHERE (list_sum(list_transform(range(1, len(a.embedding) + 1),
               i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))
            / (sqrt(list_sum(list_transform(range(1, len(a.embedding) + 1),
                 i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
             * sqrt(list_sum(list_transform(range(1, len(b.embedding) + 1),
                 i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))))
            >= {_SEM_TAU}
    )
    SELECT a.vec_id, a.centroid_id,
           d.vec_id IS NULL AS kept
    FROM assigned a LEFT JOIN dropped d ON a.vec_id = d.vec_id
    ORDER BY a.vec_id
    """,
)
def llm_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: assign every embedding to its
    nearest (cosine) centroid, then prune ONLY within clusters — a
    document is dropped when a lower-id clustermate sits within cosine
    ≥ 0.99. Published recipe (SemDeDup, Abbas et al. 2023): clustering
    makes the quadratic step local, so total cost is |corpus| × k for
    assignment plus Σ|cluster|², never |corpus|².

    Plan shape: centroids are a broadcast side (tiny by construction);
    assignment is one broadcast join + per-row argmax (max_by over the
    cluster candidates — one shuffle on vec_id); the prune self-join
    shuffles on centroid_id only. Deterministic centroids (vec_id % 20)
    stand in for the k-means trainer (operators/ann_index.py) so the
    full pipeline — including which near-dup of a pair survives — is
    reproduced in the SQL oracle and hash-checked."""
    from log2sql_spark.operators.similarity import cosine

    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") < 300).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    variants = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: x.cast("double") * (1 + 0.01 * ((i % 3) - 1))
        ).alias("embedding"),
    )
    corpus = base.unionByName(variants)
    centroids = base.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centv")
    )

    scored = corpus.join(F.broadcast(centroids)).withColumn(
        "cos_c", cosine(F.col("embedding"), F.col("centv"))
    )
    assigned = scored.groupBy("vec_id").agg(
        F.first("embedding").alias("embedding"),
        F.max_by(
            F.col("centroid_id"),
            F.struct(F.col("cos_c"), -F.col("centroid_id")),
        ).alias("centroid_id"),
    )
    # Both sides of the prune self-join and the final keep-flag join
    # read `assigned`; persist so assignment runs once.
    assigned = assigned.persist()

    a = assigned.select(
        F.col("vec_id").alias("id_a"),
        F.col("centroid_id").alias("cid"),
        F.col("embedding").alias("emb_a"),
    )
    b = assigned.select(
        F.col("vec_id").alias("id_b"),
        F.col("centroid_id").alias("cid"),
        F.col("embedding").alias("emb_b"),
    )
    dropped = (
        a.join(b, (a.cid == b.cid) & (F.col("id_a") < F.col("id_b")))
        .filter(cosine(F.col("emb_a"), F.col("emb_b")) >= _SEM_TAU)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    return (
        assigned.join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            "centroid_id",
            F.coalesce(~F.col("_dropped"), F.lit(True)).alias("kept"),
        )
        .orderBy("vec_id")
    )


# --------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of BM25 and dense rankings
# --------------------------------------------------------------------------

_RRF_K = 60
_RRF_TOPN = 50


@query(
    "search_hybrid_rrf",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      FROM documents
    ),
    doclen AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs,
             (SELECT avg(CAST(dl AS DOUBLE)) FROM doclen) AS avgdl
      FROM documents
    ),
    qterms AS (SELECT unnest(['spark', 'hash', 'window', 'merge']) AS tok),
    tf AS (
      SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
      FROM toks JOIN qterms USING (tok) GROUP BY doc_id, tok
    ),
    df AS (
      SELECT tok, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
      FROM toks JOIN qterms USING (tok) GROUP BY tok
    ),
    bm25 AS (
      SELECT doc_id,
             round(sum(
               ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * (1.2 + 1)
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl / s.avgdl))
             ), 6) AS score
      FROM tf JOIN df USING (tok) JOIN doclen USING (doc_id) CROSS JOIN stats s
      GROUP BY doc_id
    ),
    bm25_rank AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS r
      FROM bm25 QUALIFY r <= {_RRF_TOPN}
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    dense AS (
      SELECT vec_id AS doc_id,
             round((list_sum(list_transform(range(1, len(embedding) + 1),
                     i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
                   / (sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
                        i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))
                    * sqrt(list_sum(list_transform(range(1, len(qv) + 1),
                        i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))), 6)
               AS score
      FROM embeddings, q WHERE vec_id <> 0
    ),
    dense_rank_ AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS r
      FROM dense QUALIFY r <= {_RRF_TOPN}
    ),
    fused AS (
      SELECT coalesce(b.doc_id, d.doc_id) AS doc_id,
             round(coalesce(CAST(1.0 AS DOUBLE) / ({_RRF_K} + b.r), 0)
                 + coalesce(CAST(1.0 AS DOUBLE) / ({_RRF_K} + d.r), 0), 6) AS rrf,
             b.r AS bm25_rank, d.r AS dense_rank
      FROM bm25_rank b FULL OUTER JOIN dense_rank_ d ON b.doc_id = d.doc_id
    )
    SELECT doc_id, rrf, bm25_rank, dense_rank
    FROM fused
    ORDER BY rrf DESC, doc_id
    LIMIT 20
    """,
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion (k=60) of the BM25
    lexical top-50 and the dense-cosine top-50 (query = embedding 0;
    vec_id doubles as doc_id in the synthetic corpus). RRF needs only
    the two rank lists — both bounded at top-50, so the fusion join is
    trivially broadcastable no matter the corpus size; scores round to
    6dp before ranking so the order is cross-engine deterministic."""
    from log2sql_spark.operators.dedup import tokens
    from log2sql_spark.operators.similarity import cosine
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    # Lexical branch: same map-side shape as llm_bm25_search — per-doc
    # dl and the four tfs are array arithmetic over ONE materialized
    # split (no token-stream explode/persist, no (doc, tok) shuffle);
    # the corpus scalars fall out of one single-row aggregate. A term
    # the doc lacks contributes exact +0.0 to the double sum, so the
    # per-doc score is the same sum the exploded formulation computed.
    toked = docs.select("doc_id", tokens(F.col("text")).alias("_toks"))
    tf_cols = [
        F.size(F.filter("_toks", lambda x: x == t)).cast("double").alias(f"_tf{i}")
        for i, t in enumerate(_QUERY_TERMS_RRF)
    ]
    per_doc = toked.select(
        "doc_id", F.size("_toks").cast("double").alias("dl"), *tf_cols
    ).persist()
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(F.when(F.col("dl") > 0, F.col("dl"))).alias("avgdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("double")).alias(f"_df{i}")
            for i in range(len(_QUERY_TERMS_RRF))
        ],
    )
    k1, b = 1.2, 0.75

    def _term_score(i: int):
        tf, df = F.col(f"_tf{i}"), F.col(f"_df{i}")
        idf = F.log(1 + (F.col("n_docs") - df + 0.5) / (df + 0.5))
        return F.when(
            tf > 0,
            idf * tf * (k1 + 1)
            / (tf + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        ).otherwise(F.lit(0.0))

    score = _term_score(0)
    for i in range(1, len(_QUERY_TERMS_RRF)):
        score = score + _term_score(i)
    any_tf = F.greatest(*[F.col(f"_tf{i}") for i in range(len(_QUERY_TERMS_RRF))])
    bm25 = (
        per_doc.filter(any_tf > 0)
        .crossJoin(F.broadcast(stats))
        .select("doc_id", F.round(score, 6).alias("score"))
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    bm25_rank = (
        bm25.withColumn("r", F.row_number().over(w).cast("long"))
        .filter(F.col("r") <= _RRF_TOPN)
        .select("doc_id", F.col("r").alias("bm25_rank"))
    )

    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    dense = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("embedding"), F.col("qv")), 6).alias("score"),
        )
    )
    dense_rank = (
        dense.withColumn("r", F.row_number().over(w).cast("long"))
        .filter(F.col("r") <= _RRF_TOPN)
        .select("doc_id", F.col("r").alias("dense_rank"))
    )

    fused = (
        bm25_rank.join(dense_rank, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce(1.0 / (_RRF_K + F.col("bm25_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (_RRF_K + F.col("dense_rank")), F.lit(0.0)),
                6,
            ).alias("rrf"),
            "bm25_rank",
            "dense_rank",
        )
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(20)
    )
    return fused


_QUERY_TERMS_RRF = ("spark", "hash", "window", "merge")


# --------------------------------------------------------------------------
# Temperature-based mixture resampling
# --------------------------------------------------------------------------

_MIX_T = 0.5  # temperature exponent: sqrt-flattening toward the median source


@query(
    "llm_mix_temperature_resample",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id, source,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok
      FROM documents
    ), per_src AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS toks
      FROM tok GROUP BY source
    ), tot AS (SELECT CAST(sum(toks) AS DOUBLE) AS all_toks,
                      median(toks / (SELECT CAST(sum(toks) AS DOUBLE) FROM per_src))
                        AS med_share
               FROM per_src),
    probs AS (
      SELECT source, n_docs, toks,
             least(1.0, sqrt(t.med_share / (toks / t.all_toks))) AS keep_prob
      FROM per_src, tot t
    ), kept AS (
      SELECT k.source, count(*) AS n_kept
      FROM tok k JOIN probs p ON k.source = p.source
      WHERE ('0x' || substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 15))::BIGINT
            / CAST(1152921504606846976 AS DOUBLE) < p.keep_prob
      GROUP BY k.source
    )
    SELECT p.source, p.n_docs, p.toks,
           round(p.keep_prob, 6) AS keep_prob,
           CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept
    FROM probs p LEFT JOIN kept USING (source)
    ORDER BY p.source
    """,
)
def llm_mix_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened mixture resampling: over-represented
    sources are hash-deterministically downsampled so token shares move
    toward the median source — keep_prob = min(1, (median_share /
    share)^T) with T=0.5, the standard sqrt-flattening. Every step is
    cross-engine exact: shares are integer-token ratios, the median of
    20 per-source shares is order-insensitive, and the accept decision
    hashes doc_id through md5 into [0,1) — so which documents survive
    is reproduced by the oracle, not just how many. Two passes over the
    cached token counts (one aggregate, one filtered count) and a
    driver-side decision table re-broadcast as literals — no shuffle of
    document text at all."""
    import math
    import statistics

    from log2sql_spark.operators.dedup import tokens

    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select(
        "doc_id", "source", F.size(tokens(F.col("text"))).cast("long").alias("n_tok")
    )
    tok = tok.persist()
    # The mixture decision table is |sources| rows by construction —
    # ONE aggregate collects it, and the share/median/keep_prob math
    # runs driver-side in IEEE doubles (bit-identical to the engines'),
    # so the corpus is scanned exactly twice with zero mid-plan joins.
    per_src = tok.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("toks")
    ).collect()
    all_toks = float(sum(r.toks for r in per_src))
    shares = {r.source: r.toks / all_toks for r in per_src}
    med_share = statistics.median(shares.values())
    keep_prob = {
        s: min(1.0, math.sqrt(med_share / sh)) for s, sh in shares.items()
    }
    from log2sql_spark.localrel import values_df

    probs = values_df(
        spark,
        [
            (r.source, int(r.n_docs), int(r.toks), keep_prob[r.source])
            for r in per_src
        ],
        "source string, n_docs long, toks long, keep_prob double",
    )
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
        "long"
    ) / F.lit(float(1 << 60))
    kept = (
        tok.join(F.broadcast(probs.select("source", "keep_prob")), "source")
        .filter(u < F.col("keep_prob"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        probs.join(kept, "source", "left")
        .select(
            "source",
            "n_docs",
            "toks",
            F.round("keep_prob", 6).alias("keep_prob"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# End-to-end curation disposition
# --------------------------------------------------------------------------

_E2E_MIN_TOKENS = 35


@query(
    "llm_curation_e2e",
    oracle=rf"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 450
      UNION ALL
      SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id < 100
    ), t AS (
      SELECT doc_id, text,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
             min(doc_id) OVER (PARTITION BY md5(text)) AS keeper_id
      FROM corpus
    ), grams_of AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(len(regexp_split_to_array(trim(text), '\s+')) - 1, 1)),
               i -> regexp_split_to_array(trim(text), '\s+')[i] || ' ' ||
                    regexp_split_to_array(trim(text), '\s+')[i+1] || ' ' ||
                    regexp_split_to_array(trim(text), '\s+')[i+2]))) AS gram
      FROM corpus
    ), eval_grams AS (
      SELECT DISTINCT unnest(list_distinct(list_transform(
               range(1, greatest(len(regexp_split_to_array(trim(text), '\s+')) - 1, 1)),
               i -> regexp_split_to_array(trim(text), '\s+')[i] || ' ' ||
                    regexp_split_to_array(trim(text), '\s+')[i+1] || ' ' ||
                    regexp_split_to_array(trim(text), '\s+')[i+2]))) AS gram
      FROM documents WHERE doc_id >= 450
    ), gstats AS (
      SELECT g.doc_id,
             count(*) AS n_grams,
             count(e.gram) AS n_shared
      FROM grams_of g LEFT JOIN eval_grams e ON g.gram = e.gram
      GROUP BY g.doc_id
    ), d AS (
      SELECT t.doc_id, t.n_tokens, t.keeper_id,
             coalesce(s.n_grams, 0) AS n_grams,
             coalesce(s.n_shared, 0) AS n_shared,
             ('0x' || substr(md5(CAST(t.doc_id AS VARCHAR) || ':split-v1'), 1, 15))::BIGINT
               % 100 AS bucket
      FROM t LEFT JOIN gstats s ON t.doc_id = s.doc_id
    )
    SELECT doc_id, n_tokens,
           CASE
             WHEN n_tokens < {_E2E_MIN_TOKENS} THEN 'too_short'
             WHEN keeper_id <> doc_id THEN 'duplicate'
             WHEN n_shared * 20 >= n_grams THEN 'contaminated'
             WHEN bucket < 90 THEN 'train'
             WHEN bucket < 95 THEN 'val'
             ELSE 'test'
           END AS disposition
    FROM d
    ORDER BY doc_id
    """,
)
def llm_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation funnel as ONE query: quality gate (token
    floor) → exact-dup keeper policy → eval-set decontamination (≥5%
    shared distinct 3-grams) → deterministic 90/5/5 split, with the
    FIRST failing stage as each document's disposition. Composes the
    already-verified operators (exact_dedup, contamination_check's
    integer threshold, split_assign) over a corpus with planted exact
    copies; every per-doc verdict — including which twin of a dup pair
    survives and which split a survivor lands in — is reproduced by
    the oracle. Plan shape: the dup stage shuffles 16-byte digests,
    the contamination probe broadcasts the eval gram set, the split is
    per-row hash arithmetic; document text itself is never joined."""
    from log2sql_spark.operators.dedup import word_ngrams
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 450).unionByName(
        docs.filter(F.col("doc_id") < 100).select(
            (F.col("doc_id") + 10000).alias("doc_id"), "text"
        )
    )
    # Spread the narrow doc rows before the gram-heavy stages (see
    # minhash_dedup_pairs): a small compressed corpus file otherwise
    # pins the explode/md5 work to 1-2 cores.
    par = spark.sparkContext.defaultParallelism
    if corpus.rdd.getNumPartitions() < par:
        corpus = corpus.repartition(par)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    base = corpus.select(
        "doc_id",
        "text",
        F.size(toks).cast("long").alias("n_tokens"),
        F.min("doc_id").over(Window.partitionBy(F.md5("text"))).alias("keeper_id"),
    )

    grams_of = corpus.select(
        "doc_id", F.explode(word_ngrams(F.col("text"), n=3)).alias("gram")
    )
    eval_docs = docs.filter(F.col("doc_id") >= 450)
    if eval_docs.rdd.getNumPartitions() < par:
        eval_docs = eval_docs.repartition(par)
    eval_grams = (
        eval_docs
        .select(F.explode(word_ngrams(F.col("text"), n=3)).alias("gram"))
        .distinct()
    )
    gstats = (
        grams_of.join(F.broadcast(eval_grams.withColumn("_hit", F.lit(1))), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("_hit").alias("n_shared"),
        )
    )

    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":split-v1"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    d = base.join(gstats, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "keeper_id",
        F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
        bucket.alias("bucket"),
    )
    return d.select(
        "doc_id",
        "n_tokens",
        F.when(F.col("n_tokens") < _E2E_MIN_TOKENS, "too_short")
        .when(F.col("keeper_id") != F.col("doc_id"), "duplicate")
        .when(F.col("n_shared") * 20 >= F.col("n_grams"), "contaminated")
        .when(F.col("bucket") < 90, "train")
        .when(F.col("bucket") < 95, "val")
        .otherwise("test")
        .alias("disposition"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# URL canonicalization dedup
# --------------------------------------------------------------------------

_URL_SYNTH_SQL = """
      SELECT doc_id,
             'HTTP://Example' || CAST(doc_id % 10 AS VARCHAR) || '.COM'
             || CASE WHEN doc_id % 3 = 0 THEN ':80' ELSE '' END
             || '/Path/' || CAST(doc_id % 25 AS VARCHAR)
             || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
             || '?utm_source=feed&b=' || CAST(doc_id % 5 AS VARCHAR)
             || '&a=' || CAST(doc_id % 7 AS VARCHAR)
             || CASE WHEN doc_id % 4 = 0 THEN '#sec' ELSE '' END AS url
      FROM documents
"""


@query(
    "llm_dedup_url_canonical",
    oracle=rf"""
    WITH raw AS ({_URL_SYNTH_SQL}),
    s AS (
      SELECT doc_id, regexp_replace(url, '#.*$', '') AS base FROM raw
    ), parts AS (
      SELECT doc_id, base,
             regexp_replace(lower(regexp_extract(base,
               '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)), ':80$', '') AS origin,
             regexp_replace(regexp_extract(base, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?]*)', 1),
               '/+$', '') AS path,
             regexp_extract(base, '\?(.*)$', 1) AS qs
      FROM s
    ), canon AS (
      SELECT doc_id,
             origin || path ||
             CASE WHEN array_to_string(list_sort(list_filter(string_split(qs, '&'),
                        p -> NOT starts_with(p, 'utm_') AND p <> '')), '&') <> ''
                  THEN '?' || array_to_string(list_sort(list_filter(string_split(qs, '&'),
                        p -> NOT starts_with(p, 'utm_') AND p <> '')), '&')
                  ELSE '' END AS canonical_url
      FROM parts
    )
    SELECT canonical_url,
           CAST(count(*) AS BIGINT) AS n_variants,
           CAST(min(doc_id) AS BIGINT) AS keeper_id
    FROM canon
    GROUP BY canonical_url
    HAVING count(*) >= 2
    ORDER BY canonical_url
    """,
)
def llm_dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup by canonicalization — the crawl-curation step
    that collapses scheme/host case, default :80 ports, trailing
    slashes, fragments, tracking (utm_*) params, and query-param order
    into one canonical form before content ever downloads. URLs are
    synthesized deterministically from doc_id (the corpus has no URL
    column) with all six variance axes planted; the canonical-key
    period is lcm(10,25,5,7)=350, below the sf0.01 corpus of 500 docs,
    so duplicate groups EXIST at the oracle scale (a 700-period first
    cut matched the oracle vacuously on 0 rows); every canonicalization
    rule is an anchored single-match regex or an array op, identical
    in both engines, so group membership and the keeper choice are
    hash-checked. Map-only until the final groupBy on the canonical
    string — at crawl scale the shuffle carries (url, id), never
    content."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)  # regex-heavy map stage: use all cores
    url = F.concat(
        F.lit("HTTP://Example"),
        (F.col("doc_id") % 10).cast("string"),
        F.lit(".COM"),
        F.when(F.col("doc_id") % 3 == 0, ":80").otherwise(""),
        F.lit("/Path/"),
        (F.col("doc_id") % 25).cast("string"),
        F.when(F.col("doc_id") % 2 == 0, "/").otherwise(""),
        F.lit("?utm_source=feed&b="),
        (F.col("doc_id") % 5).cast("string"),
        F.lit("&a="),
        (F.col("doc_id") % 7).cast("string"),
        F.when(F.col("doc_id") % 4 == 0, "#sec").otherwise(""),
    )
    base = F.regexp_replace(url, r"#.*$", "")
    origin = F.regexp_replace(
        F.lower(F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)),
        r":80$",
        "",
    )
    path = F.regexp_replace(
        F.regexp_extract(base, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?]*)", 1),
        r"/+$",
        "",
    )
    qs = F.regexp_extract(base, r"\?(.*)$", 1)
    params = F.array_join(
        F.array_sort(
            F.filter(
                F.split(qs, "&"),
                lambda p: (~p.startswith("utm_")) & (p != ""),
            )
        ),
        "&",
    )
    canonical = F.concat(
        origin,
        path,
        F.when(params != "", F.concat(F.lit("?"), params)).otherwise(""),
    )
    return (
        docs.select("doc_id", canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("doc_id").alias("keeper_id"),
        )
        .filter(F.col("n_variants") >= 2)
        .orderBy("canonical_url")
    )


@query(
    "llm_dedup_cdc_chunks",
    oracle=r"""
    WITH b AS (
      SELECT doc_id AS id, regexp_split_to_array(trim(text), '\s+') AS w,
             len(regexp_split_to_array(trim(text), '\s+')) AS n
      FROM documents
    ),
    c AS (
      SELECT id, w, n,
             [p for p in range(4, n)
                if ('0x' || substr(md5(array_to_string(w[p-3:p], ' ')), 1, 15))::BIGINT % 16 = 0] AS bpos
      FROM b
    ),
    d AS (
      SELECT id, w, n,
             list_prepend(1, [p + 1 for p in bpos]) AS starts,
             list_append(bpos, n) AS ends
      FROM c
    ),
    chunks AS (
      SELECT id,
             unnest([md5(array_to_string(w[starts[k]:ends[k]], ' '))
                     for k in range(1, len(starts) + 1)]) AS chunk_hash
      FROM d
    )
    SELECT chunk_hash,
           CAST(count(DISTINCT id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_occ
    FROM chunks
    GROUP BY chunk_hash
    HAVING count(DISTINCT id) >= 2
    ORDER BY chunk_hash
    """,
)
def llm_dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined-chunking dedup: rolling-hash boundaries segment
    every document into variable chunks whose edges follow CONTENT, so
    a passage duplicated with a leading insertion still produces
    identical chunks (fixed 12-token windows — llm_repeated_passages —
    shift; CDC chunks don't). Reports every chunk shared by >=2 docs.
    Boundary detection is per-row JVM array arithmetic (map-only, no
    shuffle); the only wide step is the final chunk-hash aggregate —
    16-byte digests, never text. The oracle recomputes boundaries,
    segmentation, and hashes bit-for-bit in DuckDB list comprehensions.
    Reference analog: none — LLM-pipeline extension (SURVEY.md §2.2)."""
    from log2sql_spark.operators.dedup import cdc_chunk_hashes

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    return (
        cdc_chunk_hashes(docs, mod=16)
        .groupBy("chunk_hash")
        .agg(
            F.count_distinct("id").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_occ"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy("chunk_hash")
    )
