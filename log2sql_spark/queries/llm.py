"""Oracle-checked LLM-pipeline queries (north-star operator families:
dedup, similarity search, text analysis, multimodal columns).

The documents table has no duplicates, so dedup queries build a corpus
with deterministic exact copies (doc_id+10000) and near-duplicates
(doc_id+20000, last word dropped) — identically on both engines — so
the operators have real work whose output the oracle can reproduce.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from log2sql_spark.operators.dedup import (
    _hash_params,
    exact_dedup,
    exploded_grams,
    gram_df_stats,
    lsh_bucket_stats,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup_pairs,
)
from log2sql_spark.operators.multimodal import (
    audio_features,
    decode_image_features,
    documents_as_media,
    fake_decode_features,
    resize_features,
    synthesize_audio,
    synthesize_gradient_images,
    synthesize_images,
    synthesize_videos,
    video_frame_features,
)
from log2sql_spark.operators.similarity import brute_force_topk, ivf_topk
from log2sql_spark.operators.textops import (
    with_fingerprints,
    with_lang_id,
    with_text_stats,
    with_token_counts,
)
from log2sql_spark.registry import query
from log2sql_spark.sources.tables import load_table
from log2sql_spark.streaming.dedup_stream import near_dup_pairs, process_dedup_batch

_CORPUS_SQL = r"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 600
      UNION ALL
      SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id < 100
      UNION ALL
      SELECT doc_id + 20000 AS doc_id, regexp_replace(text, '\s+\S+$', '') AS text
      FROM documents WHERE doc_id >= 100 AND doc_id < 150
    )
"""


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    base = docs.filter(F.col("doc_id") < 600)
    copies = docs.filter(F.col("doc_id") < 100).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    near = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 150)).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
    )
    return base.unionByName(copies).unionByName(near)


# --------------------------------------------------------------------------
# Deduplication
# --------------------------------------------------------------------------

@query(
    "llm_dedup_exact",
    oracle=_CORPUS_SQL
    + """
    SELECT md5(text) AS content_hash,
           CAST(min(doc_id) AS BIGINT) AS keeper_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM corpus
    GROUP BY md5(text)
    HAVING count(*) > 1
    ORDER BY keeper_id
    """,
)
def llm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content hash (duplicate groups only)."""
    return (
        exact_dedup(_corpus(spark, sf_dir))
        .filter(F.col("n_copies") > 1)
        .orderBy("keeper_id")
    )


@query(
    "llm_dedup_ngram_jaccard",
    oracle=_CORPUS_SQL
    + r"""
    , grams AS (
      SELECT doc_id AS id, unnest(list_distinct(g.grams)) AS gram
      FROM (
        SELECT doc_id,
               list_transform(
                 range(1, greatest(len(regexp_split_to_array(trim(text), '\s+')) - 1, 1)),
                 i -> regexp_split_to_array(trim(text), '\s+')[i] || ' ' ||
                      regexp_split_to_array(trim(text), '\s+')[i+1] || ' ' ||
                      regexp_split_to_array(trim(text), '\s+')[i+2]
               ) AS grams
        FROM corpus
      ) g(doc_id, grams)
    ), sizes AS (
      SELECT id, count(*) AS n FROM grams GROUP BY id
    ), inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
      FROM grams a JOIN grams b USING (gram)
      WHERE a.id < b.id
      GROUP BY a.id, b.id
    )
    SELECT id_a, id_b,
           n_inter / (sa.n + sb.n - n_inter) AS jaccard
    FROM inter
      JOIN sizes sa ON sa.id = id_a
      JOIN sizes sb ON sb.id = id_b
    WHERE n_inter / (sa.n + sb.n - n_inter) >= 0.6
    ORDER BY id_a, id_b
    """,
)
def llm_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs word-3-gram Jaccard ≥ 0.6 (similarity self-join
    on the gram — pairs only meet through shared grams)."""
    return ngram_jaccard_pairs(_corpus(spark, sf_dir), threshold=0.6).orderBy("id_a", "id_b")


@query(
    "llm_dedup_minhash_lsh",
    oracle=_CORPUS_SQL
    + r"""
    , grams AS (
      SELECT doc_id AS id, unnest(list_distinct(g.grams)) AS gram
      FROM (
        SELECT doc_id,
               list_transform(
                 range(1, greatest(len(regexp_split_to_array(trim(text), '\s+')) - 1, 1)),
                 i -> regexp_split_to_array(trim(text), '\s+')[i] || ' ' ||
                      regexp_split_to_array(trim(text), '\s+')[i+1] || ' ' ||
                      regexp_split_to_array(trim(text), '\s+')[i+2]
               ) AS grams
        FROM corpus
      ) g(doc_id, grams)
    ), sizes AS (
      SELECT id, count(*) AS n FROM grams GROUP BY id
    ), inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
      FROM grams a JOIN grams b USING (gram)
      WHERE a.id < b.id
      GROUP BY a.id, b.id
    )
    SELECT id_a, id_b,
           n_inter / (sa.n + sb.n - n_inter) AS jaccard
    FROM inter
      JOIN sizes sa ON sa.id = id_a
      JOIN sizes sb ON sb.id = id_b
    WHERE n_inter / (sa.n + sb.n - n_inter) >= 0.6
    ORDER BY id_a, id_b
    """,
)
def llm_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + banded LSH (32 bands × 2 rows) candidates, verified
    by exact Jaccard ≥ 0.6. At that threshold the LSH miss probability
    is (1-0.6²)^32 ≈ 6e-7 per pair, so the verified output equals the
    exact all-pairs oracle; the candidate step is what scales — it
    touches only bucket collisions, never |corpus|² pairs."""
    return minhash_dedup_pairs(
        _corpus(spark, sf_dir), threshold=0.6, num_hashes=64, bands=32
    ).orderBy("id_a", "id_b")


@query(
    "llm_dedup_simhash",
    oracle=_CORPUS_SQL
    + r"""
    , toks AS (
      SELECT doc_id AS id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      FROM corpus
      WHERE doc_id < 200 OR doc_id >= 10000
    ), th AS (
      SELECT id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks
    ), votes AS (
      SELECT id, r.range AS k,
             sum(CASE WHEN (h >> CAST(r.range AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS vote
      FROM th, range(0, 60) r
      GROUP BY id, r.range
    ), sh AS (
      SELECT id, sum(CASE WHEN vote > 0
                          THEN (CAST(1 AS BIGINT) << CAST(k AS INTEGER))
                          ELSE 0 END) AS simhash
      FROM votes GROUP BY id
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM sh a JOIN sh b ON a.id < b.id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 4
    ORDER BY id_a, id_b
    """,
)
def llm_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash near-dup pairs (hamming ≤ 4) over originals +
    exact copies. The md5-derived bit votes are engine-reproducible, so
    even the fingerprints themselves are oracle-checked.

    Candidate generation is pigeonhole-banded (5 × 12-bit bands; hamming
    ≤ 4 ⇒ at least one band identical), an equi-join on (band_idx,
    band_bits) — the oracle's all-pairs join exists only DuckDB-side as
    the semantic spec. No BroadcastNestedLoopJoin in this plan."""
    corpus = _corpus(spark, sf_dir).filter(
        (F.col("doc_id") < 200) | (F.col("doc_id") >= 10000)
    )
    sh = simhash(corpus)
    return simhash_near_dup_pairs(sh, bits=60, max_hamming=4).orderBy("id_a", "id_b")


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------

_DOT = (
    "list_sum(list_transform(range(1, len({a}) + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def _cos_sql(a: str, b: str) -> str:
    return (
        f"({_DOT.format(a=a, b=b)}) / "
        f"(sqrt({_DOT.format(a=a, b=a)}) * sqrt({_DOT.format(a=b, b=b)}))"
    )


@query(
    "llm_sim_topk_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 20),
         c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
         scored AS (
           SELECT query_id, neighbor_id, {_cos_sql('qv', 'cv')} AS cos_sim
           FROM q, c WHERE query_id <> neighbor_id
         ),
         ranked AS (
           SELECT query_id, neighbor_id, cos_sim,
                  CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
           FROM scored
         )
    SELECT query_id, neighbor_id, round(cos_sim, 6) AS cos_sim, rank
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank
    """,
)
def llm_sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for 20 query vectors (broadcast nested loop;
    the fold-based dot product is bit-identical to the oracle's)."""
    emb = load_table(spark, "embeddings", sf_dir)
    out = brute_force_topk(emb.filter(F.col("vec_id") < 20), emb, k=5)
    return out.withColumn("cos_sim", F.round("cos_sim", 6)).orderBy("query_id", "rank")


_IVF_ORACLE = f"""
    WITH cent AS (
      SELECT vec_id AS centroid_id, embedding AS centv
      FROM embeddings WHERE vec_id % 25 = 0
    ), vecs AS (
      SELECT vec_id AS id, embedding AS vec FROM embeddings
    ), assign_scored AS (
      SELECT id, vec, centroid_id,
             row_number() OVER (PARTITION BY id
               ORDER BY {_cos_sql('vec', 'centv')} DESC, centroid_id) AS rn
      FROM vecs, cent
    ), assigned AS (
      SELECT id, vec, centroid_id FROM assign_scored WHERE rn = 1
    ), q AS (
      SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 20
    ), probe_scored AS (
      SELECT query_id, qv, centroid_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY {_cos_sql('qv', 'centv')} DESC, centroid_id) AS rn
      FROM q, cent
    ), probes AS (
      SELECT query_id, qv, centroid_id FROM probe_scored WHERE rn <= 3
    ), cand AS (
      SELECT p.query_id, p.qv, a.id, a.vec
      FROM probes p JOIN assigned a USING (centroid_id)
      WHERE p.query_id <> a.id
    ), ranked AS (
      SELECT query_id, id AS neighbor_id,
             {_cos_sql('qv', 'vec')} AS cos_sim,
             CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY {_cos_sql('qv', 'vec')} DESC, id) AS BIGINT) AS rank
      FROM cand
    )
    SELECT query_id, neighbor_id, round(cos_sim, 6) AS cos_sim, rank
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank
    """


@query(
    "llm_sim_topk_ivf",
    oracle=_IVF_ORACLE,
)
def llm_sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5: 1/25th of vectors as deterministic
    centroids, nprobe=3. The full ANN pipeline (assign → probe →
    rescore) is reproduced in SQL, so even the *approximate* result is
    hash-checked, not just row-counted."""
    emb = load_table(spark, "embeddings", sf_dir)
    centroids = emb.filter(F.col("vec_id") % 25 == 0)
    out = ivf_topk(emb.filter(F.col("vec_id") < 20), emb, centroids, k=5, nprobe=3)
    return out.withColumn("cos_sim", F.round("cos_sim", 6)).orderBy("query_id", "rank")


@query(
    "llm_ann_indexed",
    oracle=_IVF_ORACLE,
)
def llm_ann_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SERVING form of IVF: the inverted file is built ONCE into a
    snapshot store clustered by centroid_id (operators/ann_index.py),
    then the query batch probes it — the store's manifest stats prune
    the read down to the files holding the probed centroids, so per-
    batch scan cost is nprobe/|centroids| of the corpus with the
    assignment cost paid at build time. Same centroids/nprobe as
    llm_sim_topk_ivf, hence the identical oracle: the index round-trip
    must be semantically invisible."""
    import os

    from log2sql_spark.operators.ann_index import build_ivf_index, ivf_topk_indexed
    from log2sql_spark.scratch import scratch_dir

    emb = load_table(spark, "embeddings", sf_dir)
    centroids = emb.filter(F.col("vec_id") % 25 == 0)
    idx = os.path.join(scratch_dir("log2sql_annidx_"), "ivf")
    build_ivf_index(spark, idx, emb, centroids)
    out = ivf_topk_indexed(spark, idx, emb.filter(F.col("vec_id") < 20), k=5, nprobe=3)
    return out.withColumn("cos_sim", F.round("cos_sim", 6)).orderBy("query_id", "rank")


@query(
    "llm_dedup_clusters",
    oracle=_CORPUS_SQL
    + r"""
    , grams AS (
      SELECT doc_id AS id, unnest(list_distinct(g.grams)) AS gram
      FROM (
        SELECT doc_id,
               list_transform(
                 range(1, greatest(len(regexp_split_to_array(trim(text), '\s+')) - 1, 1)),
                 i -> regexp_split_to_array(trim(text), '\s+')[i] || ' ' ||
                      regexp_split_to_array(trim(text), '\s+')[i+1] || ' ' ||
                      regexp_split_to_array(trim(text), '\s+')[i+2]
               ) AS grams
        FROM corpus
      ) g(doc_id, grams)
    ), sizes AS (SELECT id, count(*) AS n FROM grams GROUP BY id),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
      FROM grams a JOIN grams b USING (gram) WHERE a.id < b.id
      GROUP BY a.id, b.id
    ), pairs AS (
      SELECT id_a, id_b FROM inter
        JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
      WHERE n_inter / (sa.n + sb.n - n_inter) >= 0.6
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach AS (
      -- transitive closure of the (tiny) dup graph, then min per node
      WITH RECURSIVE r(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src
      )
      SELECT * FROM r
    )
    SELECT src AS id,
           CAST(least(src, min(dst)) AS BIGINT) AS cluster_id
    FROM reach GROUP BY src
    ORDER BY id
    """,
)
def llm_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → connected components (cluster_id = min doc id of
    the component, i.e. the canonical keeper). Iterative label
    propagation on Spark; the oracle computes the same components with a
    recursive CTE."""
    from log2sql_spark.operators.dedup import dedup_clusters

    pairs = ngram_jaccard_pairs(_corpus(spark, sf_dir), threshold=0.6)
    return dedup_clusters(pairs).orderBy("id")


@query(
    "llm_unigram_logprob",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id AS id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      FROM documents WHERE doc_id < 300
    ), total AS (SELECT count(*) AS n FROM toks),
    vocab AS (SELECT tok, count(*) AS tf FROM toks GROUP BY tok)
    SELECT id,
           round(avg(ln(tf / (SELECT CAST(n AS DOUBLE) FROM total))), 6) AS mean_logprob,
           CAST(count(*) AS BIGINT) AS n_tokens
    FROM toks JOIN vocab USING (tok)
    GROUP BY id
    ORDER BY id
    """,
)
def llm_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality score: mean token log-probability under the
    corpus distribution (cheap perplexity proxy for quality ranking)."""
    from log2sql_spark.operators.textops import unigram_logprob_scores

    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 300)
    return unigram_logprob_scores(docs).orderBy("id")


@query(
    "llm_vocabulary",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS token
      FROM documents
    )
    SELECT token,
           CAST(count(*) AS BIGINT) AS doc_freq
    FROM toks
    GROUP BY token
    ORDER BY doc_freq DESC, token
    LIMIT 50
    """,
)
def llm_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary building: top-50 tokens by document frequency (the
    explode is the only wide step; counts partial-aggregate map-side)."""
    from log2sql_spark.operators.dedup import tokens

    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select("doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("token"))
        .limit(50)
    )


_EMB_CORPUS_SQL = """
    WITH corpus AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300
      UNION ALL
      SELECT vec_id + 10000 AS vec_id,
             list_transform(range(1, len(embedding) + 1),
               i -> CAST(embedding[i] AS DOUBLE)
                    * (1 + 0.01 * (((CAST(i AS INTEGER) - 1) % 3) - 1))) AS embedding
      FROM embeddings WHERE vec_id < 50
    )
"""


def _emb_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings + deterministically perturbed near-dup variants
    (identical arithmetic on both engines)."""
    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") < 300).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    variants = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x.cast("double") * (1 + 0.01 * ((i % 3) - 1)),
        ).alias("embedding"),
    )
    return base.unionByName(variants)


@query(
    "llm_dedup_embedding_cosine",
    oracle=_EMB_CORPUS_SQL
    + f"""
    , pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {_cos_sql('a.embedding', 'b.embedding')} AS cos_sim
      FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, round(cos_sim, 6) AS cos_sim
    FROM pairs WHERE cos_sim >= 0.99
    ORDER BY id_a, id_b
    """,
)
def llm_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos ≥ 0.99), exact all-pairs —
    the correctness baseline the LSH variant is verified against."""
    corpus = _emb_corpus(spark, sf_dir)
    a, b = corpus.alias("a"), corpus.alias("b")
    from log2sql_spark.operators.similarity import cosine

    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .withColumn("cos_sim", cosine(F.col("a.embedding"), F.col("b.embedding")))
        .filter(F.col("cos_sim") >= 0.99)
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round("cos_sim", 6).alias("cos_sim"),
        )
        .orderBy("id_a", "id_b")
    )


@query(
    "llm_dedup_embedding_rplsh",
    oracle=_EMB_CORPUS_SQL
    + f"""
    , pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {_cos_sql('a.embedding', 'b.embedding')} AS cos_sim
      FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, round(cos_sim, 6) AS cos_sim
    FROM pairs WHERE cos_sim >= 0.99
    ORDER BY id_a, id_b
    """,
)
def llm_dedup_embedding_rplsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-projection (sign) LSH near-dup: 16 md5-derived ±1
    hyperplanes → 16-bit sketch → 4-bit band buckets → candidates →
    exact-cosine verify ≥ 0.99. At that threshold the per-pair LSH miss
    probability is ~1e-8, so the verified output equals the exact
    all-pairs oracle; the candidate join is the scale path (bucket
    collisions, not |corpus|²)."""
    from log2sql_spark.operators.dedup import md5_long
    from log2sql_spark.operators.similarity import cosine

    corpus = _emb_corpus(spark, sf_dir)
    # (id, dim, value) → 16 signed contributions per element → sketch bits
    elems = corpus.select("vec_id", F.posexplode("embedding").alias("d", "val"))
    contribs = elems.select(
        "vec_id",
        "val",
        "d",
        F.explode(F.sequence(F.lit(0), F.lit(15))).alias("j"),
    ).withColumn(
        "contrib",
        F.col("val")
        * F.when(
            F.pmod(md5_long(F.concat_ws("_", F.col("j"), F.col("d"))), F.lit(2)) == 1, 1.0
        ).otherwise(-1.0),
    )
    bits = (
        contribs.groupBy("vec_id", "j")
        .agg(F.sum("contrib").alias("proj"))
        .withColumn("bit", (F.col("proj") > 0).cast("long"))
    )
    sketches = bits.groupBy("vec_id").agg(
        F.sum(F.expr("shiftleft(bit, CAST(j AS INT))")).alias("sketch")
    )
    # 4 bands × 4 bits; ONE explode + ONE self-join on (band, value)
    # instead of four separate band joins (plan audit: 17 → ~4 shuffles)
    bands = sketches.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(f"shiftright(sketch, {4 * b}) & 15").alias("bv"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("vec_id", F.col("bb.band").alias("band"), F.col("bb.bv").alias("bv"))
    cands = (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "bv"])
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(F.col("x.vec_id").alias("id_a"), F.col("y.vec_id").alias("id_b"))
        .distinct()
    )
    verified = (
        cands.join(corpus.withColumnsRenamed({"vec_id": "id_a", "embedding": "ea"}), "id_a")
        .join(corpus.withColumnsRenamed({"vec_id": "id_b", "embedding": "eb"}), "id_b")
        .withColumn("cos_sim", cosine(F.col("ea"), F.col("eb")))
        .filter(F.col("cos_sim") >= 0.99)
        .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
    )
    return verified.orderBy("id_a", "id_b")


@query(
    "llm_approx_percentile",
    oracle="""
    SELECT lang,
           quantile_cont(n_chars, 0.5) AS exact_median_chars,
           quantile_cont(n_chars, 0.9) AS exact_p90_chars,
           TRUE AS median_within_bound,
           TRUE AS p90_within_bound
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def llm_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (GK sketch) over document lengths — the 100 TB
    substitute for exact quantiles.

    The sketch value is engine-specific, so the query exposes EXACT
    interpolated percentile twins (oracle-checked against DuckDB's
    quantile_cont, the same linear-interpolation definition) plus
    rank-bound booleans: at accuracy 1000 the GK rank error is at most
    n/1000 ranks, so the approximate median/p90 must land inside the
    exact [p40,p60] / [p85,p95] value range. The oracle asserts TRUE —
    a drifting sketch fails the hash gate."""
    return (
        load_table(spark, "documents", sf_dir)
        .groupBy("lang")
        .agg(
            F.percentile("n_chars", F.lit(0.5)).alias("exact_median_chars"),
            F.percentile("n_chars", F.lit(0.9)).alias("exact_p90_chars"),
            F.approx_percentile("n_chars", 0.5, 1000).alias("_am"),
            F.approx_percentile("n_chars", 0.9, 1000).alias("_ap"),
            F.percentile("n_chars", F.lit(0.4)).alias("_p40"),
            F.percentile("n_chars", F.lit(0.6)).alias("_p60"),
            F.percentile("n_chars", F.lit(0.85)).alias("_p85"),
            F.percentile("n_chars", F.lit(0.95)).alias("_p95"),
        )
        .select(
            "lang",
            "exact_median_chars",
            "exact_p90_chars",
            F.col("_am").between(F.col("_p40"), F.col("_p60")).alias("median_within_bound"),
            F.col("_ap").between(F.col("_p85"), F.col("_p95")).alias("p90_within_bound"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------

@query(
    "llm_text_stats",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, text,
             regexp_split_to_array(trim(text), '\s+') AS toks,
             length(text) AS nc
      FROM documents WHERE doc_id < 400
    )
    SELECT doc_id,
           CAST(nc AS BIGINT) AS n_chars_calc,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
           len(list_distinct(toks)) / len(toks) AS type_token_ratio,
           (nc - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) / nc AS punct_ratio,
           len(list_filter(toks, x -> lower(x) IN ('the','a','of','and','to','in','is','it','for','on'))) / len(toks) AS stopword_ratio,
           (nc - (len(toks) - 1)) / len(toks) AS avg_token_len,
           least(1.0, (len(list_distinct(toks)) / len(toks)) * 0.5
                      + least(1.0, len(toks) / 100.0) * 0.5) AS quality_score
    FROM t
    ORDER BY doc_id
    """,
)
def llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter feature set: lengths, type-token ratio, punctuation
    and stopword ratios, composite quality score."""
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 400)
    return with_text_stats(docs).select(
        "doc_id",
        "n_chars_calc",
        "n_tokens",
        "n_distinct_tokens",
        "type_token_ratio",
        "punct_ratio",
        "stopword_ratio",
        "avg_token_len",
        "quality_score",
    ).orderBy("doc_id")


@query(
    "llm_lang_id",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, lang, text,
             regexp_split_to_array(trim(text), '\s+') AS toks,
             length(text) - length(regexp_replace(text, '[一-鿿]', '', 'g')) AS cjk
      FROM documents
    ), scored AS (
      SELECT doc_id, lang, cjk,
             len(list_filter(toks, x -> lower(x) IN ('the','a','of','and','to','in','is','it','for','on'))) AS en_hits,
             len(list_filter(toks, x -> lower(x) IN ('el','la','de','los','las','un','una','y','en','que'))) AS es_hits,
             length(text) AS nc
      FROM t
    ), pred AS (
      SELECT lang,
             CASE WHEN cjk * 10 > nc THEN 'zh'
                  WHEN es_hits > en_hits THEN 'es'
                  ELSE 'en' END AS lang_pred
      FROM scored
    )
    SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY lang, lang_pred
    ORDER BY lang, lang_pred
    """,
)
def llm_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (CJK share + stopword votes) rolled up into
    a confusion matrix against the provided lang labels."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        with_lang_id(docs)
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "lang_pred")
    )


@query(
    "llm_token_counts",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_ws_tokens,
           CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'),
                w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT) AS n_bpe_tokens
    FROM documents
    WHERE doc_id < 400
    ORDER BY doc_id
    """,
)
def llm_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish (ceil(len/4) per word) token counting."""
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 400)
    return with_token_counts(docs).select("doc_id", "n_ws_tokens", "n_bpe_tokens").orderBy(
        "doc_id"
    )


@query(
    "llm_fingerprint",
    oracle=r"""
    WITH h AS (
      SELECT doc_id AS id,
             list_transform(range(1, length(text) - 6),
               i -> ('0x' || substr(md5(substr(text, CAST(i AS INTEGER), 8)), 1, 15))::BIGINT) AS hashes
      FROM documents WHERE doc_id < 300
    ), fp AS (
      SELECT id,
             list_distinct(list_transform(range(0, len(hashes) - 3),
               j -> list_min(list_transform(range(CAST(j AS INTEGER) + 1, CAST(j AS INTEGER) + 5),
                     i -> hashes[CAST(i AS INTEGER)])))) AS fps
      FROM h
    )
    SELECT id, CAST(len(fps) AS BIGINT) AS n_fingerprints, list_min(fps) AS min_fp
    FROM fp
    ORDER BY id
    """,
)
def llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (char 8-grams, window 4): the rolling-hash
    document fingerprint; identical md5-derived hashes both engines."""
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 300)
    # 300 heavy rows (char-gram explode per doc): one task per row beats
    # one task per file-split.
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    return with_fingerprints(docs).orderBy("id")


# --------------------------------------------------------------------------
# Multimodal columns
# --------------------------------------------------------------------------

@query(
    "llm_multimodal_features",
    oracle=r"""
    SELECT doc_id AS asset_id,
           'image' AS modality,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           list_sum(list_transform(range(1, length(text) + 1),
               i -> ascii(substr(text, CAST(i AS INTEGER), 1)))) * 1.0
             / octet_length(encode(text)) AS byte_mean,
           CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS first_byte,
           md5(text) AS content_hash
    FROM documents
    WHERE doc_id < 300
    ORDER BY asset_id
    """,
)
def llm_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column + Arrow-batched mapInPandas feature extraction
    (the real multimodal plumbing; codec stubbed, bytes real). The
    oracle recomputes the byte-level features from the text the payload
    was built from — verifying the pandas path end-to-end."""
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 300)
    media = documents_as_media(docs)
    # coalesce(1) + sortWithinPartitions == orderBy here (total order,
    # identical rows) but plans with NO exchange: a range sort's
    # sampling pass would execute the Python-boundary child a second
    # time (guide §2.4), and the input is bounded (<300 docs) by the
    # query's own filter at any scale, so one sort task is the floor.
    return (
        fake_decode_features(media).coalesce(1).sortWithinPartitions("asset_id")
    )


@query(
    "llm_multimodal_decode",
    oracle=r"""
    SELECT doc_id AS asset_id,
           CASE WHEN doc_id % 2 = 0 THEN 'ppm' ELSE 'bmp' END AS format,
           CAST(1 + doc_id % 13 AS INTEGER) AS width,
           CAST(1 + doc_id % 7 AS INTEGER) AS height,
           CAST((1 + doc_id % 13) * (1 + doc_id % 7) AS BIGINT) AS n_pixels,
           ((1 + doc_id % 127) + (1 + (doc_id * 7) % 127)
             + (1 + (doc_id * 13) % 127)) / 3.0 AS pixel_mean,
           CAST(1 + doc_id % 127 AS INTEGER) AS r0,
           CAST(1 + (doc_id * 7) % 127 AS INTEGER) AS g0,
           CAST(1 + (doc_id * 13) % 127 AS INTEGER) AS b0,
           md5(repeat(chr(CAST(1 + doc_id % 127 AS INTEGER))
                      || chr(CAST(1 + (doc_id * 7) % 127 AS INTEGER))
                      || chr(CAST(1 + (doc_id * 13) % 127 AS INTEGER)),
                      CAST((1 + doc_id % 13) * (1 + doc_id % 7) AS INTEGER)))
             AS raster_md5
    FROM documents
    WHERE doc_id < 300
    ORDER BY asset_id
    """,
)
def llm_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, no codec library: deterministic PPM/BMP payloads
    are synthesized per doc_id (genuine headers, BMP row padding, BGR,
    bottom-up raster), then parsed back by the pure-Python decoders
    inside Arrow-batched mapInPandas. The oracle rebuilds every feature
    analytically — including md5 of the decoded RGB raster (channels
    kept in [1,127] so the SQL string is byte-identical UTF-8) — so a
    header, padding, channel-order, or orientation bug hash-mismatches.
    Upgrades the reference-class stub (multimodal codecs absent in
    container) to a working decode path."""
    docs = (
        load_table(spark, "documents", sf_dir)
        .filter(F.col("doc_id") < 300)
        .select("doc_id")
    )
    media = synthesize_images(docs)
    # bounded input (<300 docs): exchange-free total sort, see
    # llm_multimodal_features
    return (
        decode_image_features(media).coalesce(1).sortWithinPartitions("asset_id")
    )


@query(
    "llm_multimodal_audio",
    oracle=r"""
    WITH p AS (
      SELECT doc_id, 400 + doc_id % 50 AS n,
             list_transform(range(0, 400 + doc_id % 50),
               i -> ((doc_id * 31 + i * 7) % 201) - 100) AS s
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id AS asset_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(n AS BIGINT) AS n_samples,
           CAST((n * 1000) // 8000 AS BIGINT) AS duration_ms,
           CAST(list_sum(s) AS BIGINT) / n AS mean_sample,
           sqrt(CAST(list_sum(list_transform(s, x -> x * x)) AS BIGINT) / n) AS rms,
           CAST(s[1] AS INTEGER) AS first_sample,
           md5(array_to_string(list_transform(s, x -> CAST(x AS VARCHAR)), ','))
             AS samples_md5
    FROM p
    ORDER BY asset_id
    """,
)
def llm_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, no codec library: deterministic PCM16 mono WAV
    payloads (genuine RIFF chunk structure) parsed back by the pure-
    Python chunk walker inside mapInPandas. The oracle rebuilds the
    waveform arithmetically — mean/rms are single correctly-rounded
    divisions of exact integers, and the md5 covers every sample."""
    docs = (
        load_table(spark, "documents", sf_dir)
        .filter(F.col("doc_id") < 200)
        .select("doc_id")
    )
    # bounded input (<200 docs): exchange-free total sort, see
    # llm_multimodal_features
    return (
        audio_features(synthesize_audio(docs))
        .coalesce(1)
        .sortWithinPartitions("asset_id")
    )


@query(
    "llm_multimodal_resize",
    oracle=r"""
    WITH p AS (
      SELECT doc_id, 4 + doc_id % 9 AS w, 3 + doc_id % 5 AS h
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id AS asset_id,
           CAST(w AS INTEGER) AS src_w,
           CAST(h AS INTEGER) AS src_h,
           CAST(4 AS INTEGER) AS out_w,
           CAST(3 AS INTEGER) AS out_h,
           CAST(1 + doc_id % 127 AS INTEGER) AS r00,
           CAST(1 + doc_id % 127 AS INTEGER) AS g00,
           CAST(1 + doc_id % 127 AS INTEGER) AS b00,
           md5(list_aggregate(list_transform(range(0, 12), p ->
               chr(CAST(1 + (((p % 4) * w) // 4 * 3
                        + ((p // 4) * h) // 3 * 5 + doc_id) % 127 AS INTEGER))
            || chr(CAST(1 + (((p % 4) * w) // 4 * 7
                        + ((p // 4) * h) // 3 * 11 + doc_id) % 127 AS INTEGER))
            || chr(CAST(1 + (((p % 4) * w) // 4 * 13
                        + ((p // 4) * h) // 3 * 17 + doc_id) % 127 AS INTEGER))
           ), 'string_agg', '')) AS resized_md5
    FROM p
    ORDER BY asset_id
    """,
)
def llm_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize with REAL resampling: gradient PPMs (pixel = f(x, y,
    id)) are decoded and nearest-neighbor-resized to 4x3; the oracle
    re-derives every output pixel from the floor source mapping
    src = (dst * src_dim) // dst_dim and md5s the resized raster, so a
    wrong source coordinate anywhere hash-mismatches."""
    docs = (
        load_table(spark, "documents", sf_dir)
        .filter(F.col("doc_id") < 200)
        .select("doc_id")
    )
    # bounded input (<200 docs): exchange-free total sort, see
    # llm_multimodal_features
    return (
        resize_features(synthesize_gradient_images(docs), 4, 3)
        .coalesce(1)
        .sortWithinPartitions("asset_id")
    )


@query(
    "llm_multimodal_video_frames",
    oracle=r"""
    WITH p AS (
      SELECT doc_id, 2 + doc_id % 3 AS w, 1 + doc_id % 3 AS h,
             unnest(range(0, 3 + doc_id % 4, 2)) AS f
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id AS asset_id,
           CAST(f AS INTEGER) AS frame_idx,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           ((1 + (doc_id + 11 * f) % 127) + (1 + (7 * doc_id + 5 * f) % 127)
             + (1 + (13 * doc_id + 3 * f) % 127)) / 3.0 AS frame_mean,
           md5(repeat(chr(CAST(1 + (doc_id + 11 * f) % 127 AS INTEGER))
                   || chr(CAST(1 + (7 * doc_id + 5 * f) % 127 AS INTEGER))
                   || chr(CAST(1 + (13 * doc_id + 3 * f) % 127 AS INTEGER)),
                   CAST(w * h AS INTEGER))) AS frame_md5
    FROM p
    ORDER BY asset_id, frame_idx
    """,
)
def llm_multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling over the PPMV toy container (real mp4/mkv
    demux needs ffmpeg — absent here — but the container walk, per-frame
    decode, and the row-expanding mapInPandas shape are all real): every
    2nd frame's mean and raster md5, one output row per sampled frame."""
    docs = (
        load_table(spark, "documents", sf_dir)
        .filter(F.col("doc_id") < 200)
        .select("doc_id")
    )
    # bounded input (<200 docs): exchange-free total sort, see
    # llm_multimodal_features
    return (
        video_frame_features(synthesize_videos(docs), every=2)
        .coalesce(1)
        .sortWithinPartitions("asset_id", "frame_idx")
    )


@query(
    "llm_kmeans_silhouette",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS cvec FROM embeddings
      WHERE vec_id % 25 = 0 AND vec_id < 625
    ),
    v AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
    d AS (
      SELECT id, cid, 1 - ({_cos_sql('vec', 'cvec')}) AS d FROM v, cent
    ),
    r AS (
      SELECT id, cid, d,
             row_number() OVER (PARTITION BY id ORDER BY d, cid) AS rn
      FROM d
    ),
    p AS (
      SELECT id,
             max(CASE WHEN rn = 1 THEN cid END) AS cluster,
             max(CASE WHEN rn = 1 THEN d END) AS a,
             max(CASE WHEN rn = 2 THEN d END) AS b
      FROM r WHERE rn <= 2 GROUP BY id
    ),
    s AS (
      SELECT cluster,
             CAST(floor(1e6 * CASE WHEN greatest(a, b) = 0 THEN 0.0
                        ELSE (b - a) / greatest(a, b) END) AS BIGINT) AS s_ppm
      FROM p
    )
    SELECT CAST(cluster AS BIGINT) AS cluster,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(s_ppm) // count(*) AS BIGINT) AS mean_silhouette_ppm
    FROM s GROUP BY cluster ORDER BY cluster
    """,
)
def llm_kmeans_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-quality eval: SIMPLIFIED silhouette (centroid-based —
    Pampalk's variant; the O(n^2) pairwise form is exactly what a 100 TB
    corpus cannot afford) per cluster over the embedding corpus. a =
    cosine distance to the assigned (nearest) centroid, b = distance to
    the runner-up, s = (b - a)/max(a, b) in [-0..1]: clusters whose mean
    sits near 0 are the ones SemDeDup/k-means curation should not trust.
    Completes the eval family the ANN side already has (recall@k for
    IVF/PQ/LSH): the k-means trainer gets its quality number too.

    Shape: |V| x 25 broadcast-centroid distances (map-side nested loop,
    no corpus shuffle), ONE per-vector window shared by the assigned
    and runner-up ranks, one groupBy(cluster). Cross-engine exactness:
    both distances come from the same IEEE expression, per-vector s is
    floor-quantized to ppm BEFORE aggregation, and the cluster mean is
    an integer division of integer sums — no float-summation order
    anywhere. Distance ties broken by centroid id on both engines."""
    emb = load_table(spark, "embeddings", sf_dir)
    # FIXED 25-centroid codebook (vec_id % 25 == 0, < 625): the
    # centroid count is a model parameter — deriving it from the corpus
    # (every 25th vector) made |V| x |C| quadratic in the corpus and
    # the sf1 budget run caught it at ~2000 centroids.
    cent = emb.filter(
        (F.col("vec_id") % 25 == 0) & (F.col("vec_id") < 625)
    ).select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"))
    # Per-SIDE norms computed once (the r5 IVF-assignment lesson: the
    # pairwise expression would re-fold |a| and |b| per (vec, centroid)
    # pair — 3x the flops for identical IEEE values).
    from log2sql_spark.operators.similarity import _dot, _norm

    vecs = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    ).withColumn("vn", _norm(F.col("vec")))
    cent = cent.withColumn("cn", _norm(F.col("cvec")))
    # The 25 centroids fold into ONE array row (sorted by cid — unique,
    # so the sort never compares the vector field) broadcast to every
    # task: per-vector assigned/runner-up distances become a map-side
    # array_sort over 25 (d, cid) structs instead of a 25x-row explode
    # through a per-id window shuffle + re-aggregation (guide §2.4
    # "remove shuffles outright"). array_sort on the struct orders by
    # (d, cid) exactly like the former Window.orderBy("d", "cid"), so
    # cluster/a/b are bit-identical; the only remaining exchange is the
    # 25-key cluster aggregate.
    cent_arr = cent.agg(
        F.sort_array(F.collect_list(F.struct("cid", "cvec", "cn"))).alias("cents")
    )
    per = vecs.crossJoin(F.broadcast(cent_arr)).select(
        "id",
        F.array_sort(
            F.transform(
                "cents",
                lambda c: F.struct(
                    (
                        F.lit(1)
                        - F.try_divide(
                            _dot(F.col("vec"), c["cvec"]), F.col("vn") * c["cn"]
                        )
                    ).alias("d"),
                    c["cid"].alias("cid"),
                ),
            )
        ).alias("ds"),
    ).select(
        "id",
        F.col("ds")[0]["cid"].alias("cluster"),
        F.col("ds")[0]["d"].alias("a"),
        F.col("ds")[1]["d"].alias("b"),
    )
    s = per.select(
        "cluster",
        F.floor(
            1e6
            * F.when(F.greatest("a", "b") == 0, F.lit(0.0)).otherwise(
                (F.col("b") - F.col("a")) / F.greatest("a", "b")
            )
        )
        .cast("long")
        .alias("s_ppm"),
    )
    return (
        s.groupBy(F.col("cluster").cast("long").alias("cluster"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr("sum(s_ppm) div count(*)").cast("long").alias("mean_silhouette_ppm"),
        )
        .orderBy("cluster")
    )


@query(
    "llm_knn_classify",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv, label AS true_label
      FROM embeddings WHERE vec_id >= 100 AND vec_id < 150
    ), c AS (
      SELECT vec_id AS neighbor_id, embedding AS cv, label FROM embeddings
    ), scored AS (
      SELECT query_id, true_label, neighbor_id, label,
             {_cos_sql('qv', 'cv')} AS cos_sim
      FROM q, c WHERE query_id <> neighbor_id
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY cos_sim DESC, neighbor_id) AS rk
      FROM scored
    ), votes AS (
      SELECT query_id, true_label, label, CAST(count(*) AS BIGINT) AS votes
      FROM ranked WHERE rk <= 5
      GROUP BY query_id, true_label, label
    ), best AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY votes DESC, label) AS rn
      FROM votes
    )
    SELECT query_id,
           CAST(label AS INTEGER) AS predicted_label,
           votes,
           CAST(true_label AS INTEGER) AS true_label,
           CAST(CASE WHEN label = true_label THEN 1 ELSE 0 END AS INTEGER) AS correct
    FROM best WHERE rn = 1
    ORDER BY query_id
    """,
)
def llm_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification over the embedding column (k=5 majority vote,
    ties broken by smallest label): the evaluation-time companion to
    similarity search — broadcast query set, exact neighbors, then a
    counts-only vote aggregate. Deterministic end to end, so even the
    predictions are oracle-checked."""
    from pyspark.sql import Window as W

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 150))
    nn = brute_force_topk(queries, emb, k=5)
    labels = emb.select(F.col("vec_id").alias("neighbor_id"), "label")
    truth = emb.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    votes = (
        nn.join(F.broadcast(labels), "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count("*").cast("long").alias("votes"))
    )
    best = votes.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("query_id").orderBy(F.desc("votes"), F.asc("label"))
        ),
    ).filter("rn = 1")
    return (
        best.join(F.broadcast(truth), "query_id")
        .select(
            "query_id",
            F.col("label").cast("int").alias("predicted_label"),
            "votes",
            F.col("true_label").cast("int").alias("true_label"),
            (F.col("label") == F.col("true_label")).cast("int").alias("correct"),
        )
        .orderBy("query_id")
    )


# --------------------------------------------------------------------------
# LSH observability + hot-bucket guard (scale instrumentation)
# --------------------------------------------------------------------------

_GRAMS_SQL = r"""
    , grams AS (
      SELECT doc_id AS id, unnest(list_distinct(g.grams)) AS gram
      FROM (
        SELECT doc_id,
               list_transform(
                 range(1, greatest(len(regexp_split_to_array(trim(text), '\s+')) - 1, 1)),
                 i -> regexp_split_to_array(trim(text), '\s+')[i] || ' ' ||
                      regexp_split_to_array(trim(text), '\s+')[i+1] || ' ' ||
                      regexp_split_to_array(trim(text), '\s+')[i+2]
               ) AS grams
        FROM corpus
      ) g(doc_id, grams)
    )
"""

_P = 2_147_483_647
_A16, _B16 = _hash_params(16)


def _minhash16_sql() -> str:
    """DuckDB CTEs reproducing minhash_signatures(num_hashes=16) and its
    8-band × 2-row slicing, with the seed-42 hash parameters inlined —
    the signature path itself is oracle-checked, not just the verified
    pairs downstream of it."""
    hcols = ",\n             ".join(
        f"min(({_A16[i]} * x + {_B16[i]}) % {_P}) AS h{i}" for i in range(16)
    )
    bandrows = "\n      UNION ALL\n      ".join(
        f"SELECT id, {b} AS band, [h{2 * b}, h{2 * b + 1}] AS slice FROM hs"
        for b in range(8)
    )
    return f"""
    , gh AS (
      SELECT id, ('0x' || substr(md5(gram), 1, 15))::BIGINT % {_P} AS x FROM grams
    ), hs AS (
      SELECT id,
             {hcols}
      FROM gh GROUP BY id
    ), bandrows AS (
      {bandrows}
    )
"""


@query(
    "llm_lsh_bucket_stats",
    oracle=_CORPUS_SQL
    + _GRAMS_SQL
    + _minhash16_sql()
    + """
    , buckets AS (
      SELECT band, slice, CAST(count(*) AS BIGINT) AS bucket_n
      FROM bandrows GROUP BY band, slice
    )
    SELECT bucket_n, CAST(count(*) AS BIGINT) AS n_buckets
    FROM buckets GROUP BY bucket_n
    ORDER BY bucket_n
    """,
)
def llm_lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucket-size histogram — the observability companion to the
    hot-bucket guard. A bucket of k signatures costs k²/2 candidate
    pairs, so this histogram IS the join's cost model; ops reads it to
    pick (or audit) ``max_bucket_size``. One extra aggregate over the
    exact banding used for candidates."""
    sigs = minhash_signatures(_corpus(spark, sf_dir), num_hashes=16)
    return lsh_bucket_stats(sigs, bands=8).orderBy("bucket_n")


_SKEW_SQL = r"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 30
      UNION ALL
      SELECT 5000 + r.range AS doc_id, d.text
      FROM documents d, range(1, 13) r
      WHERE d.doc_id = 0
    )
"""


def _skewed_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30 distinct docs + 12 extra copies of doc 0: the 13 identical
    documents share one signature, so every band has a 13-member hot
    bucket — the boilerplate-skew shape that turns uncapped LSH
    quadratic."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    base = docs.filter(F.col("doc_id") < 30)
    boiler = (
        docs.filter(F.col("doc_id") == 0)
        .crossJoin(spark.range(1, 13).select(F.col("id").alias("rep")))
        .select((F.lit(5000) + F.col("rep")).cast("long").alias("doc_id"), "text")
    )
    return base.unionByName(boiler)


@query(
    "llm_dedup_lsh_capped",
    oracle=_SKEW_SQL
    + _GRAMS_SQL
    + _minhash16_sql()
    + """
    , sized AS (
      SELECT id, band, slice,
             count(*) OVER (PARTITION BY band, slice) AS bucket_n,
             min(id) OVER (PARTITION BY band, slice) AS bucket_min
      FROM bandrows
    ), allp AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM sized a JOIN sized b USING (band, slice)
      WHERE a.bucket_n <= 4 AND a.id < b.id
    ), star AS (
      SELECT bucket_min AS id_a, id AS id_b FROM sized
      WHERE bucket_n > 4 AND id <> bucket_min
    )
    SELECT DISTINCT id_a, id_b FROM (
      SELECT * FROM allp UNION ALL SELECT * FROM star
    )
    ORDER BY id_a, id_b
    """,
)
def llm_dedup_lsh_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-bucket-guarded LSH candidates on a skewed corpus: buckets
    over the cap (the 13 identical docs) emit star pairs around the
    bucket minimum — O(k) instead of O(k²) — while normal buckets keep
    full enumeration. The oracle reproduces the exact star/all-pairs
    split, so the guard's semantics (not just its cost) are checked."""
    sigs = minhash_signatures(_skewed_corpus(spark, sf_dir), num_hashes=16)
    return lsh_candidate_pairs(sigs, bands=8, max_bucket_size=4).orderBy("id_a", "id_b")


@query(
    "llm_jaccard_df_stats",
    oracle=_CORPUS_SQL
    + _GRAMS_SQL
    + """
    , dfs AS (SELECT gram, CAST(count(*) AS BIGINT) AS df FROM grams GROUP BY gram)
    SELECT CASE WHEN df = 1 THEN 'singleton'
                WHEN df <= 16 THEN 'joinable'
                ELSE 'capped' END AS gram_class,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(df) AS BIGINT) AS n_occurrences
    FROM dfs GROUP BY 1
    ORDER BY gram_class
    """,
)
def llm_jaccard_df_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall accounting for ngram_jaccard_pairs' df-prune: how many
    grams (and occurrences) are singleton / joinable / capped at
    max_gram_df=16. A qualifying pair is missed only if every shared
    gram is 'capped' — this makes that trade-off a measured quantity
    instead of a silent knob."""
    grams = exploded_grams(_corpus(spark, sf_dir))
    return gram_df_stats(grams, max_gram_df=16).orderBy("gram_class")


@query(
    "stream_minhash_dedup",
    oracle=_CORPUS_SQL
    + _GRAMS_SQL
    + _minhash16_sql()
    + """
    , cands AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM bandrows a JOIN bandrows b USING (band, slice)
      WHERE a.id < b.id
    ), agree AS (
      SELECT c.id_a, c.id_b,
             ("""
    + " + ".join(f"CASE WHEN x.h{i} = y.h{i} THEN 1 ELSE 0 END" for i in range(16))
    + """) AS n_agree
      FROM cands c JOIN hs x ON x.id = c.id_a JOIN hs y ON y.id = c.id_b
    )
    SELECT id_a, id_b, n_agree / 16.0 AS est_jaccard
    FROM agree
    WHERE n_agree / 16.0 >= 0.5
    ORDER BY id_a, id_b
    """,
)
def stream_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-replayable twin of the incremental streaming dedup
    (streaming/dedup_stream.py): the corpus arrives as two micro-batches
    — originals first, then the exact copies and near-duplicates — each
    processed against the persisted signature store. The union of
    per-batch flags equals the one-shot LSH result (every qualifying
    pair is emitted exactly once, in the batch its second member
    arrives), which is what the oracle computes. est_jaccard is
    n_agree/16 — a dyadic rational, so the double compares bit-for-bit
    across engines."""
    from log2sql_spark.scratch import scratch_dir

    corpus = _corpus(spark, sf_dir)
    store = os.path.join(scratch_dir("log2sql_sdd_"), "store")
    process_dedup_batch(
        corpus.filter(F.col("doc_id") < 600), store,
        threshold=0.5, num_hashes=16, bands=8,
    )
    process_dedup_batch(
        corpus.filter(F.col("doc_id") >= 10000), store,
        threshold=0.5, num_hashes=16, bands=8,
    )
    return near_dup_pairs(spark, store).orderBy("id_a", "id_b")


def _ngram_sql(n: int) -> str:
    """DuckDB CTE for per-doc DISTINCT word n-grams (mirrors
    operators.dedup.word_ngrams for any n)."""
    arr = r"regexp_split_to_array(trim(text), '\s+')"
    terms = " || ' ' || ".join(f"{arr}[i+{j}]" if j else f"{arr}[i]" for j in range(n))
    return f"""
    , grams AS (
      SELECT doc_id AS id, unnest(list_distinct(g.grams)) AS gram
      FROM (
        SELECT doc_id,
               list_transform(
                 range(1, greatest(len({arr}) - {n - 2}, 1)),
                 i -> {terms}
               ) AS grams
        FROM corpus
      ) g(doc_id, grams)
    )
"""


@query(
    "llm_repeated_passages",
    oracle=r"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      WHERE doc_id < 50 OR (doc_id >= 100 AND doc_id < 110)
      UNION ALL
      SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id < 50
      UNION ALL
      SELECT doc_id + 20000 AS doc_id, regexp_replace(text, '\s+\S+$', '') AS text
      FROM documents WHERE doc_id >= 100 AND doc_id < 110
    )
    """
    + _ngram_sql(12)
    + """
    SELECT gram AS passage,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(id) AS BIGINT) AS first_doc
    FROM grams
    GROUP BY gram
    HAVING count(*) >= 2
    ORDER BY passage
    """,
)
def llm_repeated_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level (substring) dedup: 12-token windows shared by ≥2
    documents — the cross-doc repeated-passage detector (boilerplate,
    licenses, quoted chunks) that doc-level Jaccard can't see and
    per-doc winnowing doesn't aggregate. One explode + one groupBy on
    the window text: the shuffle key is the passage, so cost scales
    with corpus token count, and the HAVING prunes the (overwhelming)
    unique-window majority map-side-partially before the reduce."""
    from log2sql_spark.operators.dedup import word_ngrams

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    orig = docs.filter(
        (F.col("doc_id") < 50) | ((F.col("doc_id") >= 100) & (F.col("doc_id") < 110))
    )
    copies = docs.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    near = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 110)).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
    )
    corpus = orig.unionByName(copies).unionByName(near)
    passages = corpus.select(
        F.col("doc_id").alias("id"),
        F.explode(word_ngrams(F.col("text"), 12)).alias("passage"),
    )
    return (
        passages.groupBy("passage")
        .agg(F.count("*").alias("n_docs"), F.min("id").alias("first_doc"))
        .filter(F.col("n_docs") >= 2)
        .orderBy("passage")
    )


@query(
    "llm_dedup_substring",
    oracle=r"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 60
      UNION ALL
      SELECT doc_id + 10000 AS doc_id,
             'copy ' || CAST(doc_id AS VARCHAR)
               || ' of prior document follows now ' || text AS text
      FROM documents WHERE doc_id < 25
    ),
    tok AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM corpus
    ),
    pos AS (
      SELECT doc_id, i - 1 AS pos, md5(array_to_string(toks[i:i+14], ' ')) AS h
      FROM tok, LATERAL unnest(range(1, greatest(len(toks) - 13, 1))) AS g(i)
    ),
    dup AS (
      SELECT doc_id, pos
      FROM (SELECT *, count(*) OVER (PARTITION BY h) AS c FROM pos)
      WHERE c >= 2
    ),
    runs AS (
      SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                       = pos - 1 THEN 0 ELSE 1 END AS brk
      FROM dup
    ),
    rid AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
      FROM runs
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(pos) - min(pos) + 15 AS BIGINT) AS span_len
    FROM rid
    GROUP BY doc_id, run_id
    ORDER BY doc_id, span_start
    """,
)
def llm_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-agnostic exact-substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" — the
    ExactSubstr step of C4/Pile curation): every MAXIMAL duplicated
    token span of length >= 15 in the corpus, as (doc_id, span_start,
    span_len). The fixed-window detector (llm_repeated_passages) can
    only say "this 12-gram repeats"; this one recovers the full extent
    of each duplicated region whatever its length — the suffix-array
    result, distributed.

    Shape (never all-pairs, never a suffix array's global sort of
    every suffix): a duplicated substring of length m >= L appears as
    a run of m-L+1 CONSECUTIVE duplicated L-token windows, so (1) one
    posexplode emits (doc, pos, md5(window)) — hashes shuffle, never
    text; (2) one window-count over the hash marks duplicated
    positions (the unique-window majority dies here); (3) a per-doc
    lag/sum window merges consecutive positions into maximal runs.
    Cost is linear in corpus tokens with two shuffle keys (hash, then
    doc) — at 100 TB both partition cleanly and the hot aggregate is
    a count, not a candidate join. Same-doc repeats count as
    duplicates, matching the reference algorithm. Corpus plants
    25 full copies behind a 7-token prefix, so copies' spans start at
    offset 7 — position arithmetic is oracle-checked, not just
    membership. Pipeline shape documented on
    operators.dedup.duplicate_spans; 10x-docs linearity measured
    per-round in BENCH.json (substr_dedup_linearity)."""
    from log2sql_spark.operators.dedup import duplicate_spans

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    orig = docs.filter(F.col("doc_id") < 60)
    copies = docs.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(
            F.lit("copy "),
            F.col("doc_id").cast("string"),
            F.lit(" of prior document follows now "),
            F.col("text"),
        ).alias("text"),
    )
    corpus = orig.unionByName(copies)
    return duplicate_spans(corpus, min_len=15).orderBy("doc_id", "span_start")


@query(
    "llm_dedup_substring_apply",
    oracle=r"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 60
      UNION ALL
      SELECT doc_id + 10000 AS doc_id,
             'copy ' || CAST(doc_id AS VARCHAR)
               || ' of prior document follows now ' || text AS text
      FROM documents WHERE doc_id < 25
    ),
    tok AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM corpus
    ),
    pos AS (
      SELECT doc_id, i - 1 AS pos, md5(array_to_string(toks[i:i+14], ' ')) AS h
      FROM tok, LATERAL unnest(range(1, greatest(len(toks) - 13, 1))) AS g(i)
    ),
    dup AS (
      SELECT doc_id, pos
      FROM (SELECT *, count(*) OVER (PARTITION BY h) AS c FROM pos)
      WHERE c >= 2
    ),
    runs AS (
      SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                       = pos - 1 THEN 0 ELSE 1 END AS brk
      FROM dup
    ),
    rid AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
      FROM runs
    ),
    spans AS (
      SELECT doc_id, min(pos) AS span_start, max(pos) - min(pos) + 15 AS span_len
      FROM rid GROUP BY doc_id, run_id
    ),
    covered AS (
      SELECT DISTINCT doc_id, unnest(range(span_start, span_start + span_len)) AS pos
      FROM spans
    ),
    tokpos AS (
      SELECT doc_id, i - 1 AS pos, toks[i] AS tok
      FROM tok, LATERAL unnest(range(1, len(toks) + 1)) AS g(i)
    ),
    kept AS (
      SELECT t.doc_id, t.pos, t.tok
      FROM tokpos t ANTI JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos
    ),
    agg AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_tokens,
             md5(string_agg(tok, ' ' ORDER BY pos)) AS cleaned_md5
      FROM kept GROUP BY doc_id
    )
    SELECT c.doc_id,
           CAST(coalesce(a.kept_tokens, 0) AS BIGINT) AS kept_tokens,
           CAST(len(t.toks) - coalesce(a.kept_tokens, 0) AS BIGINT) AS removed_tokens,
           coalesce(a.cleaned_md5, md5('')) AS cleaned_md5
    FROM corpus c
    JOIN tok t USING (doc_id)
    LEFT JOIN agg a ON a.doc_id = c.doc_id
    ORDER BY c.doc_id
    """,
)
def llm_dedup_substring_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY half of exact-substring dedup (round 13): excise every
    duplicated span llm_dedup_substring detects from every document and
    emit per-doc (kept_tokens, removed_tokens, md5(cleaned_text)) — the
    transform that actually produces the cleaned corpus, remove-
    everywhere policy (a fully-duplicated doc comes back empty with
    md5('')). Hashing the reconstructed text makes the oracle check the
    EXCISION itself — token order, boundaries, and whitespace joining —
    not just the removal counts. Shape on top of detection: spans
    collect per doc (a few structs, never positions), one left join
    back to the corpus, and a map-only JVM filter lambda probing the
    token index against the span array — no token explode, no per-doc
    sort (operators/dedup.py::apply_duplicate_spans)."""
    from log2sql_spark.operators.dedup import apply_duplicate_spans

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    orig = docs.filter(F.col("doc_id") < 60)
    copies = docs.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(
            F.lit("copy "),
            F.col("doc_id").cast("string"),
            F.lit(" of prior document follows now "),
            F.col("text"),
        ).alias("text"),
    )
    corpus = orig.unionByName(copies)
    return (
        apply_duplicate_spans(corpus, min_len=15)
        .select(
            "doc_id",
            "kept_tokens",
            "removed_tokens",
            F.md5("cleaned_text").alias("cleaned_md5"),
        )
        .orderBy("doc_id")
    )


@query(
    "llm_ann_recall_eval",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 20),
         c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
         ex_scored AS (
           SELECT query_id, neighbor_id,
                  CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY {_cos_sql('qv', 'cv')} DESC, neighbor_id) AS BIGINT) AS rank
           FROM q, c WHERE query_id <> neighbor_id
         ),
         exact AS (SELECT query_id, neighbor_id FROM ex_scored WHERE rank <= 5),
         cent AS (
           SELECT vec_id AS centroid_id, embedding AS centv
           FROM embeddings WHERE vec_id % 25 = 0
         ),
         vecs AS (SELECT vec_id AS id, embedding AS vec FROM embeddings),
         assign_scored AS (
           SELECT id, vec, centroid_id,
                  row_number() OVER (PARTITION BY id
                    ORDER BY {_cos_sql('vec', 'centv')} DESC, centroid_id) AS rn
           FROM vecs, cent
         ),
         assigned AS (SELECT id, vec, centroid_id FROM assign_scored WHERE rn = 1),
         probe_scored AS (
           SELECT query_id, qv, centroid_id,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY {_cos_sql('qv', 'centv')} DESC, centroid_id) AS rn
           FROM q, cent
         ),
         probes AS (SELECT query_id, qv, centroid_id FROM probe_scored WHERE rn <= 3),
         cand AS (
           SELECT p.query_id, p.qv, a.id, a.vec
           FROM probes p JOIN assigned a USING (centroid_id)
           WHERE p.query_id <> a.id
         ),
         ivf_ranked AS (
           SELECT query_id, id AS neighbor_id,
                  CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY {_cos_sql('qv', 'vec')} DESC, id) AS BIGINT) AS rank
           FROM cand
         ),
         ivf AS (SELECT query_id, neighbor_id FROM ivf_ranked WHERE rank <= 5),
         hits AS (
           SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_hit
           FROM exact e JOIN ivf USING (query_id, neighbor_id)
           GROUP BY e.query_id
         )
    SELECT qq.query_id, CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
           coalesce(n_hit, 0) / 5.0 AS recall_at_5
    FROM (SELECT DISTINCT query_id FROM exact) qq LEFT JOIN hits USING (query_id)
    ORDER BY query_id
    """,
)
def llm_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured ANN quality: recall@5 of the IVF index (nprobe=3)
    against the exact top-5, per query vector. The 'measure, don't
    guess' companion to llm_sim_topk_ivf — approximation error is a
    number the pipeline reports, not an assumption. Both retrieval
    chains and the recall division are reproduced in the oracle, so
    the evaluation itself is hash-checked."""
    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < 20)
    exact = brute_force_topk(q, emb, k=5).select("query_id", "neighbor_id")
    centroids = emb.filter(F.col("vec_id") % 25 == 0)
    approx = ivf_topk(q, emb, centroids, k=5, nprobe=3).select(
        "query_id", "neighbor_id"
    )
    hits = (
        exact.join(approx, ["query_id", "neighbor_id"], "semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        exact.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            (F.coalesce("n_hit", F.lit(0)) / 5.0).alias("recall_at_5"),
        )
        .orderBy("query_id")
    )


@query(
    "llm_bigram_logprob",
    oracle=r"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 400
    ), toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a FROM corpus
    ), bg AS (
      SELECT doc_id, u.w1 AS w1, u.w2 AS w2
      FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(a)),
                      i -> {'w1': a[i], 'w2': a[i + 1]})) AS u
        FROM toks
      )
    ), c12 AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY w1, w2
    ), c1 AS (
      SELECT w1, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY w1
    ), v AS (
      SELECT CAST(count(DISTINCT t) AS DOUBLE) AS vsz
      FROM (SELECT unnest(a) AS t FROM toks)
    ), scored AS (
      SELECT b.doc_id, ln((c12.c + 1.0) / (c1.c + vsz)) AS lp
      FROM bg b JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(round(sum(lp) * 1000000) AS BIGINT) AS logprob_micro,
           CAST(round(exp(-sum(lp) / count(*)) * 1000000) AS BIGINT) AS ppl_micro
    FROM scored GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def llm_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring with add-1 smoothing — the
    perplexity-filter curation signal one tier above unigram
    (llm_unigram_logprob). Bigram/unigram counts are two aggregates
    over the exploded pair table; the vocabulary size is a broadcast
    scalar; scoring joins each document's pairs to the counts (train =
    corpus, so every pair hits). Scores are emitted integer-quantized:
    each ln() term is bit-identical cross-engine and the summation
    reorder error (~1e-11) is far below the 1e-6 quantum."""
    docs = (
        load_table(spark, "documents", sf_dir)
        .filter(F.col("doc_id") < 400)
        .select("doc_id", F.split(F.trim("text"), r"\s+").alias("a"))
    )
    bg = docs.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("a", 1, F.size("a") - 1).alias("w1"),
                F.slice("a", 2, F.size("a") - 1).alias("w2"),
            )
        ).alias("u"),
    ).select("doc_id", F.col("u.w1").alias("w1"), F.col("u.w2").alias("w2"))
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    v = docs.select(F.explode("a").alias("t")).agg(
        F.countDistinct("t").cast("double").alias("vsz")
    )
    scored = (
        bg.join(c12, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            F.log((F.col("c12") + 1.0) / (F.col("c1") + F.col("vsz"))).alias("lp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.sum("lp") * 1e6, 0).cast("long").alias("logprob_micro"),
            F.round(F.exp(-F.sum("lp") / F.count("*")) * 1e6, 0)
            .cast("long")
            .alias("ppl_micro"),
        )
        .orderBy("doc_id")
    )


_CLUSTERS_SQL = (
    _CORPUS_SQL
    + r"""
    , grams AS (
      SELECT doc_id AS id, unnest(list_distinct(g.grams)) AS gram
      FROM (
        SELECT doc_id,
               list_transform(
                 range(1, greatest(len(regexp_split_to_array(trim(text), '\s+')) - 1, 1)),
                 i -> regexp_split_to_array(trim(text), '\s+')[i] || ' ' ||
                      regexp_split_to_array(trim(text), '\s+')[i+1] || ' ' ||
                      regexp_split_to_array(trim(text), '\s+')[i+2]
               ) AS grams
        FROM corpus
      ) g(doc_id, grams)
    ), sizes AS (SELECT id, count(*) AS n FROM grams GROUP BY id),
    inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
      FROM grams a JOIN grams b USING (gram) WHERE a.id < b.id
      GROUP BY a.id, b.id
    ), pairs AS (
      SELECT id_a, id_b FROM inter
        JOIN sizes sa ON sa.id = id_a JOIN sizes sb ON sb.id = id_b
      WHERE n_inter / (sa.n + sb.n - n_inter) >= 0.6
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach AS (
      WITH RECURSIVE r(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src
      )
      SELECT * FROM r
    ), clusters AS (
      SELECT src AS id,
             CAST(least(src, min(dst)) AS BIGINT) AS cluster_id
      FROM reach GROUP BY src
    )
"""
)


@query(
    "llm_dedup_cluster_stats",
    oracle=_CLUSTERS_SQL
    + """
    , per AS (
      SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_n
      FROM clusters GROUP BY cluster_id
    )
    SELECT cluster_n,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(cluster_n) AS BIGINT) AS n_docs,
           CAST(sum(cluster_n - 1) AS BIGINT) AS n_removable
    FROM per GROUP BY cluster_n
    ORDER BY cluster_n
    """,
)
def llm_dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup outcome accounting: cluster-size histogram with the
    documents-removable count (cluster size minus its keeper) per size
    class — the number a curation run reports as its dedup rate. One
    aggregate over the connected-components output."""
    from log2sql_spark.operators.dedup import dedup_clusters

    pairs = ngram_jaccard_pairs(_corpus(spark, sf_dir), threshold=0.6)
    clusters = dedup_clusters(pairs)
    per = clusters.groupBy("cluster_id").agg(F.count("*").alias("cluster_n"))
    return (
        per.groupBy("cluster_n")
        .agg(
            F.count("*").alias("n_clusters"),
            F.sum("cluster_n").alias("n_docs"),
            F.sum(F.col("cluster_n") - 1).alias("n_removable"),
        )
        .orderBy("cluster_n")
    )


@query(
    "llm_multimodal_image_ahash",
    oracle="""
    WITH ids AS (
      SELECT doc_id AS aid, doc_id AS base FROM documents WHERE doc_id < 150
      UNION ALL
      SELECT doc_id + 10000 AS aid, doc_id AS base
      FROM documents WHERE doc_id < 30
    ), cells AS (
      SELECT aid, base, 4 + base % 9 AS w, 3 + base % 5 AS h,
             unnest(range(0, 60)) AS k
      FROM ids
    ), coords AS (
      SELECT aid, base, k,
             ((k % 10) * w) // 10 AS sx,
             ((k // 10) * h) // 6 AS sy
      FROM cells
    ), grays AS (
      SELECT aid, k,
             ((1 + (sx * 3 + sy * 5 + base) % 127)
            + (1 + (sx * 7 + sy * 11 + base) % 127)
            + (1 + (sx * 13 + sy * 17 + base) % 127)) // 3 AS gray
      FROM coords
    ), sums AS (SELECT aid, sum(gray) AS total FROM grays GROUP BY aid),
    hashes AS (
      SELECT g.aid AS id,
             CAST(sum(CASE WHEN gray * 60 > total
                      THEN (CAST(1 AS BIGINT) << CAST(k AS INTEGER))
                      ELSE 0 END) AS BIGINT) AS h
      FROM grays g JOIN sums s ON g.aid = s.aid
      GROUP BY g.aid
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
    FROM hashes a JOIN hashes b ON a.id < b.id
    WHERE bit_count(xor(a.h, b.h)) <= 3
    ORDER BY id_a, id_b
    """,
)
def llm_multimodal_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMAGE near-dup detection: perceptual average-hash (60-bit, 10x6
    integer-exact downscale — operators/multimodal.py::image_ahash)
    over gradient images of varying resolutions plus planted exact
    copies, candidate pairs via the same pigeonhole banding as text
    SimHash (hamming <= 3 => one of 4 bands identical, an equi-join —
    never an all-pairs cross). The oracle recomputes every fingerprint
    from the pixel formula, so decode, downscale coordinates, integer
    thresholding, and the final pair set all hash-match. This is the
    image-modality twin of llm_dedup_simhash: dedup by content
    perception, robust to re-encoding, with 8 bytes of state per
    asset at corpus scale."""
    from log2sql_spark.operators.dedup import simhash_near_dup_pairs
    from log2sql_spark.operators.multimodal import image_ahash, synthesize_gradient_images

    ids = (
        load_table(spark, "documents", sf_dir)
        .filter(F.col("doc_id") < 150)
        .select("doc_id")
    )
    media = synthesize_gradient_images(ids)
    # Duplicate the 8-byte HASHES, not the payloads: the copies' bytes
    # are identical to their originals', and aHash is a pure function of
    # content, so re-labeling fingerprints is bit-identical to
    # re-synthesizing + re-decoding the copies — which, spelled as a
    # union of two branches over the synth mapInPandas subtree, ran the
    # Python synth+decode stages TWICE per execution (the branch point
    # sits below any exchange, so nothing reuses it; guide §2.4 /
    # measured in OPTIMIZATION_r14.md §12).
    base_hashes = image_ahash(media)
    hashes = base_hashes.select(
        F.explode(
            F.when(
                F.col("id") < 30, F.array(F.col("id"), F.col("id") + 10000)
            ).otherwise(F.array(F.col("id")))
        ).alias("id"),
        "simhash",
    )
    return simhash_near_dup_pairs(hashes, bits=60, max_hamming=3).orderBy(
        "id_a", "id_b"
    )


@query(
    "llm_multimodal_audio_fingerprint",
    oracle="""
    WITH ids AS (
      SELECT doc_id AS aid, doc_id AS base FROM documents WHERE doc_id < 150
      UNION ALL
      SELECT doc_id + 10000 AS aid, doc_id AS base
      FROM documents WHERE doc_id < 30
    ), clips AS (
      SELECT aid, base, 400 + base % 50 AS n,
             list_transform(range(0, 400 + base % 50),
               i -> ((base * 31 + i * 7) % 201) - 100) AS s
      FROM ids
    ), wins AS (
      SELECT aid, n, s, unnest(range(0, 60)) AS k FROM clips
    ), energies AS (
      SELECT aid, n, k,
             (k * n) // 60 AS lo, ((k + 1) * n) // 60 AS hi,
             list_sum(list_transform(
               range(CAST((k * n) // 60 + 1 AS INTEGER),
                     CAST(((k + 1) * n) // 60 + 1 AS INTEGER)),
               i -> CAST(s[CAST(i AS INTEGER)] AS BIGINT)
                    * CAST(s[CAST(i AS INTEGER)] AS BIGINT))) AS e
      FROM wins
    ), totals AS (
      SELECT aid, sum(coalesce(e, 0)) AS total FROM energies GROUP BY aid
    ), hashes AS (
      SELECT en.aid AS id,
             CAST(sum(CASE WHEN coalesce(e, 0) * n > total * (hi - lo)
                      THEN (CAST(1 AS BIGINT) << CAST(k AS INTEGER))
                      ELSE 0 END) AS BIGINT) AS h
      FROM energies en JOIN totals t ON en.aid = t.aid
      GROUP BY en.aid
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
    FROM hashes a JOIN hashes b ON a.id < b.id
    WHERE bit_count(xor(a.h, b.h)) <= 3
    ORDER BY id_a, id_b
    """,
)
def llm_multimodal_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIO near-dup detection, completing the modality triple (text
    SimHash, image aHash, audio energy fingerprint): each PCM clip
    hashes to 60 bits — windowed mean-square energy vs the clip's,
    integer cross-multiplied so no float ever enters — and candidates
    come from the same pigeonhole band equi-join. The oracle rebuilds
    every waveform arithmetically and re-derives the fingerprints, so
    the WAV walk, window boundaries, energy sums, and the pair set all
    hash-match. Planted exact copies (re-labeled payloads) must land at
    hamming 0."""
    from log2sql_spark.operators.dedup import simhash_near_dup_pairs
    from log2sql_spark.operators.multimodal import audio_fingerprint, synthesize_audio

    ids = (
        load_table(spark, "documents", sf_dir)
        .filter(F.col("doc_id") < 150)
        .select("doc_id")
    )
    media = synthesize_audio(ids)
    # Same hash-level copy duplication as llm_multimodal_image_ahash:
    # the energy fingerprint is a pure function of the payload bytes and
    # the copies are byte-identical, so re-labeling the 8-byte hashes is
    # bit-identical to re-synthesizing + re-decoding the copy branch —
    # and avoids running the Python synth+decode stages twice.
    base_hashes = audio_fingerprint(media)
    hashes = base_hashes.select(
        F.explode(
            F.when(
                F.col("id") < 30, F.array(F.col("id"), F.col("id") + 10000)
            ).otherwise(F.array(F.col("id")))
        ).alias("id"),
        "simhash",
    )
    return simhash_near_dup_pairs(hashes, bits=60, max_hamming=3).orderBy(
        "id_a", "id_b"
    )


@query(
    "llm_pq_quantize_codes",
    oracle=r"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(floor(CAST(x AS DOUBLE) * 64) AS BIGINT)) AS qv
      FROM embeddings
    ),
    subs AS (
      SELECT vec_id, m.m AS sub, qv[m.m * 16 + 1 : m.m * 16 + 16] AS sv
      FROM q, (SELECT unnest(range(4)) AS m) m
    ),
    code AS (SELECT sub, vec_id AS code, sv AS cv FROM subs WHERE vec_id < 16),
    d AS (
      SELECT s.vec_id, s.sub, c.code,
             CAST(list_sum(list_transform(range(1, 17),
                   i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))) AS BIGINT) AS dist
      FROM subs s JOIN code c USING (sub)
    ),
    best AS (
      SELECT vec_id, sub, code, dist,
             row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, code) AS rn
      FROM d
    )
    SELECT vec_id,
           CAST(max(CASE WHEN sub = 0 THEN code END) AS BIGINT) AS c0,
           CAST(max(CASE WHEN sub = 1 THEN code END) AS BIGINT) AS c1,
           CAST(max(CASE WHEN sub = 2 THEN code END) AS BIGINT) AS c2,
           CAST(max(CASE WHEN sub = 3 THEN code END) AS BIGINT) AS c3,
           CAST(sum(dist) AS BIGINT) AS err
    FROM best WHERE rn = 1
    GROUP BY vec_id
    ORDER BY vec_id
    """,
)
def llm_pq_quantize_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (the ANN compression path): 64-dim vectors
    → 4 subspaces × 16-entry codebooks → 4 codes (2 bytes) per vector,
    128x smaller than the raw floats — how an IVF-PQ index holds 1e11
    vectors in cluster RAM. The codebook here is the first 16 vectors'
    subvectors (the deterministic k-means seeding; a trained codebook
    plugs into the same operator via train_kmeans_centroids). Distances
    run in exact integer arithmetic over floor-quantized components and
    ties break to the lowest code, so every assignment and the total
    quantization error hash-match the oracle bit-for-bit. Scale shape
    in operators/similarity.py::pq_codes: broadcast codebook, two
    code-sized shuffles, linear in |V|."""
    from log2sql_spark.operators.similarity import pq_codes

    emb = load_table(spark, "embeddings", sf_dir)
    par = spark.sparkContext.defaultParallelism
    if emb.rdd.getNumPartitions() < par:
        emb = emb.repartition(par)  # single-file input: use all cores
    q = emb.select(
        F.col("vec_id").alias("id"),
        F.expr(
            "transform(embedding, x -> cast(floor(cast(x as double) * 64) as bigint))"
        ).alias("qv"),
    )
    codebook = q.filter(F.col("id") < 16).select(
        F.posexplode(
            F.expr("transform(sequence(0, 3), mm -> slice(qv, mm * 16 + 1, 16))")
        ).alias("sub", "cv"),
        F.col("id").alias("code"),
    )
    return (
        pq_codes(q, codebook, m=4)
        .select(F.col("id").alias("vec_id"), "c0", "c1", "c2", "c3", "err")
        .orderBy("vec_id")
    )


@query(
    "llm_dedup_canonical_text",
    oracle=r"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 500
      UNION ALL
      SELECT doc_id + 30000 AS doc_id, '  ' || upper(text) || '  ' AS text
      FROM documents WHERE doc_id < 80
    ),
    canon AS (
      SELECT doc_id,
             md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS canon_hash
      FROM corpus
    )
    SELECT canon_hash,
           CAST(min(doc_id) AS BIGINT) AS keeper_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM canon
    GROUP BY canon_hash
    HAVING count(*) > 1
    ORDER BY keeper_id
    """,
)
def llm_dedup_canonical_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-form exact dedup: case folding + whitespace collapse +
    trim BEFORE hashing, so copies that differ only in formatting (the
    most common near-dup class in crawled corpora — recased titles,
    re-wrapped whitespace) collapse into one group that byte-exact
    hashing misses. The corpus plants uppercased/padded copies; the
    oracle recomputes the same canonicalization, so a divergent regex
    or case rule breaks the hash. Same shuffle shape as exact dedup:
    16-byte digests only."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 500).unionByName(
        docs.filter(F.col("doc_id") < 80).select(
            (F.col("doc_id") + 30000).alias("doc_id"),
            F.concat(F.lit("  "), F.upper("text"), F.lit("  ")).alias("text"),
        )
    )
    canon = corpus.select(
        "doc_id",
        F.md5(F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ")).alias(
            "canon_hash"
        ),
    )
    return (
        canon.groupBy("canon_hash")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
        .orderBy("keeper_id")
    )


@query(
    "llm_dedup_paragraph_blocks",
    oracle=_CORPUS_SQL
    + r"""
    , toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      FROM corpus
    ),
    blocks AS (
      SELECT doc_id,
             array_to_string(t[m.m * 16 + 1 : m.m * 16 + 16], ' ') AS btext
      FROM toks, (SELECT unnest(range(64)) AS m) m
      WHERE m.m < len(t) // 16
    ),
    shared AS (
      SELECT btext, count(DISTINCT doc_id) AS nd FROM blocks GROUP BY btext
    )
    SELECT b.doc_id,
           CAST(count(*) AS BIGINT) AS n_blocks,
           CAST(sum(CASE WHEN s.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_blocks,
           CAST(sum(CASE WHEN s.nd > 1 THEN 1 ELSE 0 END) * 10000
                // count(*) AS BIGINT) AS dup_bps
    FROM blocks b JOIN shared s USING (btext)
    GROUP BY b.doc_id
    HAVING sum(CASE WHEN s.nd > 1 THEN 1 ELSE 0 END) > 0
    ORDER BY doc_id
    """,
)
def llm_dedup_paragraph_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph/block-level dedup: each document splits into
    NON-overlapping 16-token blocks (the paragraph analog for the
    newline-free synthetic corpus) and a block shared by 2+ distinct
    docs marks duplicated content — per doc the engine reports how much
    of it is copied (basis points, integer-exact). This is the span
    granularity real curation removes boilerplate and cross-doc quotes
    at, between whole-doc dedup (llm_dedup_exact) and sliding-window
    passage mining (llm_repeated_passages, overlapping windows). Scale
    shape: block explode is map-side (~n_tokens/16 rows per doc), the
    share count is one digest-keyed aggregate, and the per-doc rollup
    joins block digests — never raw text — back to docs."""
    docs = _corpus(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("t")
    ).filter(F.size("t") >= 16)  # sequence(0,-1) DESCENDS in Spark
    # hash INSIDE the transform so 8-byte digests explode/shuffle,
    # never the 16-token block text itself
    blocks = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, int(size(t) / 16) - 1), "
                "m -> xxhash64(concat_ws(' ', slice(t, m * 16 + 1, 16))))"
            )
        ).alias("bhash"),
    )
    shared = blocks.groupBy("bhash").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    return (
        blocks.join(shared, "bhash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)).alias("n_dup_blocks"),
        )
        .filter(F.col("n_dup_blocks") > 0)
        .select(
            "doc_id",
            "n_blocks",
            "n_dup_blocks",
            F.expr("n_dup_blocks * 10000 div n_blocks").alias("dup_bps"),
        )
        .orderBy("doc_id")
    )


# Shared oracle CTE body of the IVF+PQ pipeline (quantize, coarse
# assign, PQ codebook/codes, query distance tables, probes, ADC scores)
# — reused by the ADC search and its recall evaluation.
_IVFPQ_CTES = r"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(floor(CAST(x AS DOUBLE) * 64) AS BIGINT)) AS qv
      FROM embeddings
    ),
    coarse AS (SELECT vec_id AS cell, qv AS cv FROM q WHERE vec_id < 8),
    assign AS (
      SELECT vec_id, cell FROM (
        SELECT v.vec_id, c.cell,
               row_number() OVER (PARTITION BY v.vec_id ORDER BY
                 list_sum(list_transform(range(1, 65),
                   i -> (v.qv[i] - c.cv[i]) * (v.qv[i] - c.cv[i]))), c.cell) AS rn
        FROM q v, coarse c
      ) WHERE rn = 1
    ),
    subs AS (
      SELECT vec_id, m.m AS sub, qv[m.m * 16 + 1 : m.m * 16 + 16] AS sv
      FROM q, (SELECT unnest(range(4)) AS m) m
    ),
    cb AS (SELECT sub, vec_id AS code, sv AS cv FROM subs WHERE vec_id < 16),
    codes AS (
      SELECT vec_id, sub, code FROM (
        SELECT s.vec_id, s.sub, c.code,
               row_number() OVER (PARTITION BY s.vec_id, s.sub ORDER BY
                 list_sum(list_transform(range(1, 17),
                   i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))), c.code) AS rn
        FROM subs s JOIN cb c USING (sub)
      ) WHERE rn = 1
    ),
    qsubs AS (SELECT vec_id AS qid, sub, sv FROM subs WHERE vec_id BETWEEN 100 AND 104),
    qd AS (
      SELECT qs.qid, qs.sub, c.code,
             CAST(list_sum(list_transform(range(1, 17),
               i -> (qs.sv[i] - c.cv[i]) * (qs.sv[i] - c.cv[i]))) AS BIGINT) AS d
      FROM qsubs qs JOIN cb c USING (sub)
    ),
    qfull AS (SELECT vec_id AS qid, qv FROM q WHERE vec_id BETWEEN 100 AND 104),
    probe AS (
      SELECT qid, cell FROM (
        SELECT f.qid, c.cell,
               row_number() OVER (PARTITION BY f.qid ORDER BY
                 list_sum(list_transform(range(1, 65),
                   i -> (f.qv[i] - c.cv[i]) * (f.qv[i] - c.cv[i]))), c.cell) AS rn
        FROM qfull f, coarse c
      ) WHERE rn <= 2
    ),
    cands AS (SELECT p.qid, a.vec_id AS vid FROM probe p JOIN assign a USING (cell)),
    scored AS (
      SELECT cd.qid, cd.vid, CAST(sum(qd.d) AS BIGINT) AS adc
      FROM cands cd
      JOIN codes co ON co.vec_id = cd.vid
      JOIN qd ON qd.qid = cd.qid AND qd.sub = co.sub AND qd.code = co.code
      GROUP BY cd.qid, cd.vid
    )
"""


@query(
    "llm_ann_ivfpq_adc",
    oracle=_IVFPQ_CTES
    + """
    SELECT qid, vid, adc, CAST(rk AS BIGINT) AS rk FROM (
      SELECT qid, vid, adc,
             row_number() OVER (PARTITION BY qid ORDER BY adc, vid) AS rk
      FROM scored
    ) WHERE rk <= 10
    ORDER BY qid, rk
    """,
)
def llm_ann_ivfpq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ asymmetric-distance search (Jégou et al., TPAMI 2011) —
    the full billion-scale ANN pipeline in one plan: coarse-quantize
    every vector into an IVF cell (broadcast centroid argmin), PQ-encode
    it to 4 codes (operators/similarity.py:pq_codes subspace argmin),
    probe each query's 2 nearest cells, and score ONLY candidates in
    probed cells via ADC — the query precomputes its |sub|x|codebook|
    distance table (tiny, broadcast) and each candidate's distance is 4
    table lookups summed, never a float multiply against raw vectors.
    All arithmetic is exact integer L2 over floor-quantized components
    with lowest-id tie-breaks, so the assignments, probes, and ranked
    top-10 hash-match the oracle bit-for-bit. At 100 TB: codes are 2
    bytes/vector (128x compression), candidates are manifest-pruned by
    cell (llm_ann_indexed proves that read path), and the per-query
    work is |probed cells| x lookups — independent of corpus size."""
    emb = load_table(spark, "embeddings", sf_dir)
    l2_full = F.expr(
        "aggregate(zip_with(qv, cv, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"
    )
    l2_sub = F.expr(
        "aggregate(zip_with(sv, cv, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"
    )
    q = emb.select(
        F.col("vec_id").alias("id"),
        F.expr(
            "transform(embedding, x -> cast(floor(cast(x as double) * 64) as bigint))"
        ).alias("qv"),
    )
    coarse = q.filter(F.col("id") < 8).select(
        F.col("id").alias("cell"), F.col("qv").alias("cv")
    )
    assign = (
        q.join(F.broadcast(coarse))
        .select("id", "cell", l2_full.alias("d"))
        .groupBy("id")
        .agg(F.min(F.struct("d", "cell")).alias("b"))
        .select("id", F.col("b.cell").alias("cell"))
    )
    subs = q.select(
        "id",
        F.posexplode(
            F.expr("transform(sequence(0, 3), mm -> slice(qv, mm * 16 + 1, 16))")
        ).alias("sub", "sv"),
    )
    cb = subs.filter(F.col("id") < 16).select(
        "sub", F.col("id").alias("code"), F.col("sv").alias("cv")
    )
    codes = (
        subs.join(F.broadcast(cb), "sub")
        .select("id", "sub", "code", l2_sub.alias("d"))
        .groupBy("id", "sub")
        .agg(F.min(F.struct("d", "code")).alias("b"))
        .select(F.col("id").alias("vid"), "sub", F.col("b.code").alias("code"))
    )
    is_q = F.col("id").between(100, 104)
    qd = (
        subs.filter(is_q)
        .withColumnRenamed("id", "qid")
        .join(F.broadcast(cb), "sub")
        .select("qid", "sub", "code", l2_sub.alias("d"))
    )
    wprobe = Window.partitionBy("qid").orderBy("d", "cell")
    probe = (
        q.filter(is_q)
        .withColumnRenamed("id", "qid")
        .join(F.broadcast(coarse))
        .select("qid", "cell", l2_full.alias("d"))
        .withColumn("rn", F.row_number().over(wprobe))
        .filter(F.col("rn") <= 2)
        .select("qid", "cell")
    )
    cands = probe.join(assign, "cell").select("qid", F.col("id").alias("vid"))
    scored = (
        cands.join(codes, "vid")
        .join(F.broadcast(qd), ["qid", "sub", "code"])
        .groupBy("qid", "vid")
        .agg(F.sum("d").alias("adc"))
    )
    wrk = Window.partitionBy("qid").orderBy("adc", "vid")
    return (
        scored.withColumn("rk", F.row_number().over(wrk).cast("bigint"))
        .filter(F.col("rk") <= 10)
        .orderBy("qid", "rk")
    )


@query(
    "llm_ann_ivfpq_recall",
    oracle=_IVFPQ_CTES
    + """,
    adc10 AS (
      SELECT qid, vid FROM (
        SELECT qid, vid,
               row_number() OVER (PARTITION BY qid ORDER BY adc, vid) AS rk
        FROM scored
      ) WHERE rk <= 10
    ),
    exact10 AS (
      SELECT qid, vid FROM (
        SELECT f.qid, v.vec_id AS vid,
               row_number() OVER (PARTITION BY f.qid ORDER BY
                 list_sum(list_transform(range(1, 65),
                   i -> (f.qv[i] - v.qv[i]) * (f.qv[i] - v.qv[i]))), v.vec_id) AS rk
        FROM qfull f, q v
      ) WHERE rk <= 10
    ),
    hits AS (
      SELECT e.qid, CAST(count(*) AS BIGINT) AS n_hit
      FROM exact10 e JOIN adc10 a USING (qid, vid)
      GROUP BY e.qid
    )
    SELECT qq.qid, CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
           coalesce(n_hit, 0) * 1000 // 10 AS recall_milli
    FROM (SELECT DISTINCT qid FROM exact10) qq LEFT JOIN hits USING (qid)
    ORDER BY qid
    """,
)
def llm_ann_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured IVF+PQ quality: recall@10 of the ADC search (2-cell
    probe, 4x16 PQ codebook) against the EXACT integer-L2 top-10 over
    the same quantized vectors — the compression+probe error as an
    oracle-checked number per query, completing the eval pair with
    llm_ann_recall_eval (which measures the IVF probe alone). Both
    rankings share one tie rule (distance, then id), so the
    intersection count is bit-deterministic. The exact side is the
    |Q|x|V| scan the index exists to avoid — fine as an eval harness,
    never the serving path."""
    from pyspark.sql import Window as W

    # ADC side: the registered pipeline, already ranked top-10
    adc = llm_ann_ivfpq_adc(spark, sf_dir).select("qid", "vid")
    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.select(
        F.col("vec_id").alias("id"),
        F.expr(
            "transform(embedding, x -> cast(floor(cast(x as double) * 64) as bigint))"
        ).alias("qv"),
    )
    queries = q.filter(F.col("id").between(100, 104)).select(
        F.col("id").alias("qid"), F.col("qv").alias("qqv")
    )
    l2 = F.expr(
        "aggregate(zip_with(qqv, qv, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"
    )
    wrk = W.partitionBy("qid").orderBy("d", "vid")
    exact = (
        queries.join(F.broadcast(q))
        .select("qid", F.col("id").alias("vid"), l2.alias("d"))
        .withColumn("rk", F.row_number().over(wrk))
        .filter(F.col("rk") <= 10)
        .select("qid", "vid")
    )
    hits = exact.join(adc, ["qid", "vid"]).groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    return (
        exact.select("qid")
        .distinct()
        .join(hits, "qid", "left")
        .select(
            "qid",
            F.coalesce("n_hit", F.lit(0)).cast("bigint").alias("n_hit"),
            F.expr("coalesce(n_hit, 0) * 1000 div 10").alias("recall_milli"),
        )
        .orderBy("qid")
    )


@query(
    "llm_lsh_recall_eval",
    oracle=_CORPUS_SQL
    + _GRAMS_SQL
    + _minhash16_sql()
    + """
    , cands AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM bandrows a JOIN bandrows b USING (band, slice)
      WHERE a.id < b.id
    ), sizes AS (
      SELECT id, count(*) AS n FROM grams GROUP BY id
    ), inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
      FROM grams a JOIN grams b USING (gram)
      WHERE a.id < b.id
      GROUP BY a.id, b.id
    ), exact AS (
      SELECT id_a, id_b FROM inter
        JOIN sizes sa ON sa.id = id_a
        JOIN sizes sb ON sb.id = id_b
      WHERE n_inter / (sa.n + sb.n - n_inter) >= 0.5
    ), hit AS (
      SELECT e.id_a FROM exact e
      JOIN cands c ON e.id_a = c.id_a AND e.id_b = c.id_b
    )
    SELECT CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
           CAST((SELECT count(*) FROM cands) AS BIGINT) AS n_candidates,
           CAST((SELECT count(*) FROM hit) AS BIGINT) AS n_hit,
           (SELECT count(*) FROM hit) * 10000
             // greatest((SELECT count(*) FROM exact), 1) AS recall_bp
    """,
)
def llm_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH recall@τ as an oracle-checked number — the dedup twin of
    llm_ann_recall_eval: how many TRUE near-dup pairs (exact 3-gram
    Jaccard ≥ 0.5, no df cap) does the 8-band × 2-row MinHash candidate
    join actually surface? With these parameters the S-curve gives
    P(candidate | j=0.5) = 1-(1-j²)⁸ ≈ 0.90, so the recorded basis
    points quantify the approximation loss a production dedup accepts —
    measured, not assumed. The oracle re-derives signatures, banding,
    candidates, AND the exact pair set independently in SQL."""
    from log2sql_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
    )

    corpus = _corpus(spark, sf_dir)
    sigs = minhash_signatures(corpus, num_hashes=16)
    cands = lsh_candidate_pairs(sigs, bands=8)
    exact = ngram_jaccard_pairs(corpus, threshold=0.5, max_gram_df=None).select(
        "id_a", "id_b"
    )
    hits = exact.join(cands, ["id_a", "id_b"])
    ne = exact.agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    nc = cands.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    nh = hits.agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    return (
        ne.crossJoin(nc)
        .crossJoin(nh)
        .withColumn(
            "recall_bp",
            F.expr("n_hit * 10000 DIV greatest(n_exact, 1)"),
        )
    )


@query(
    "llm_embedding_gram_matrix",
    oracle="""
    WITH q AS (
      SELECT list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      FROM embeddings
    ), idx AS (
      SELECT CAST(range AS INTEGER) AS i FROM range(64)
    ), pairs AS (
      SELECT a.i AS i, b.i AS j FROM idx a, idx b WHERE a.i <= b.i
    )
    SELECT p.i AS i, p.j AS j,
           CAST(sum(qv[p.i + 1] * qv[p.j + 1]) AS BIGINT) AS g
    FROM q, pairs p
    GROUP BY p.i, p.j
    ORDER BY i, j
    """,
)
def llm_embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gram matrix X^T X of the embedding corpus —
    operators/similarity.py:gram_matrix. The one-pass distributed
    linear-algebra pattern behind covariance/PCA/whitening over a
    100 TB embedding table: Arrow batches fold into per-partition
    numpy int64 partials, partitions ship only d(d+1)/2 = 2080
    triangle cells, one tiny groupBy folds them; the d x d result is
    driver-sized so the eigen step (PCA axes for SemDeDup-style
    clustering or dimensionality reduction) never becomes a cluster
    job. Coordinates are pre-quantized to integer milli-units, making
    cell sums order-free — bit-identical across engines, partition
    counts, and runs; the DuckDB oracle recomputes every cell from the
    raw floats with the same quantization.

    Reference analog: none (LLM-pipeline extension, SURVEY.md §2.2).
    """
    from log2sql_spark.operators.similarity import gram_matrix

    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    par = spark.sparkContext.defaultParallelism
    if emb.rdd.getNumPartitions() < par:
        emb = emb.repartition(par)
    q = emb.select(
        F.col("vec_id").alias("id"),
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * 1000).cast("long"),
        ).alias("qv"),
    )
    return gram_matrix(q, dim=64).orderBy("i", "j")


@query(
    "llm_embedding_power_iteration",
    oracle="""
    WITH idx AS (SELECT CAST(range AS INTEGER) AS j FROM range(64)),
    x AS (
      SELECT vec_id, j,
             CAST(round((CAST(embedding[j + 1] AS DOUBLE)
                         + ((j * 37) % 13 - 6) * 0.06) * 1000) AS BIGINT) AS xq
      FROM embeddings, idx
    ),
    v0 AS (SELECT j, CAST(1000 AS BIGINT) AS v FROM idx),
    s1 AS (SELECT vec_id, sum(xq * v) AS s FROM x JOIN v0 USING (j) GROUP BY vec_id),
    u1 AS (SELECT j, sum(xq * s) AS u FROM x JOIN s1 USING (vec_id) GROUP BY j),
    w1 AS (SELECT j, (u * 1000) // (SELECT max(abs(u)) FROM u1) AS v FROM u1),
    s2 AS (SELECT vec_id, sum(xq * v) AS s FROM x JOIN w1 USING (j) GROUP BY vec_id),
    u2 AS (SELECT j, sum(xq * s) AS u FROM x JOIN s2 USING (vec_id) GROUP BY j),
    w2 AS (SELECT j, (u * 1000) // (SELECT max(abs(u)) FROM u2) AS v FROM u2),
    s3 AS (SELECT vec_id, sum(xq * v) AS s FROM x JOIN w2 USING (j) GROUP BY vec_id),
    u3 AS (SELECT j, sum(xq * s) AS u FROM x JOIN s3 USING (vec_id) GROUP BY j),
    w3 AS (SELECT j, (u * 1000) // (SELECT max(abs(u)) FROM u3) AS v FROM u3)
    SELECT w1.j AS dim,
           CAST(w1.v AS BIGINT) AS v1,
           CAST(w2.v AS BIGINT) AS v2,
           CAST(w3.v AS BIGINT) AS v3
    FROM w1 JOIN w2 ON w1.j = w2.j JOIN w3 ON w1.j = w3.j
    ORDER BY dim
    """,
)
def llm_embedding_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus by THREE fixed
    power-iteration steps v_{k+1} = trunc(X^T(X v_k) * 1000 / max|.|),
    computed entirely in exact integer arithmetic: coordinates are
    round(x*1000) milli-units (the llm_embedding_gram_matrix contract),
    the per-step renormalization is integer trunc-division (Spark
    ``div`` == DuckDB ``//``), so every iterate is bit-identical
    cross-engine — no float summation-order drift anywhere.

    The synthetic corpus is near-isotropic (top eigengap λ2/λ1 ≈ 0.98
    — no start vector converges in few steps), so the query plants a
    deterministic rank-1 spike first: every vector is shifted by
    s_j = ((j*37) % 13 - 6) * 0.06, the same move llm_pii_redact makes
    for PII. With the spike the gap is λ2/λ1 < 0.01 and the iterate
    reaches the true top eigenvector by step 2 — pinned against
    numpy.linalg.eigh in tests/test_llm_ops.py (cosine >= 0.999).

    This is the LARGE-d complement to llm_embedding_gram_matrix: the
    gram route ships d(d+1)/2 cells to the driver and eigen-solves
    locally — perfect for d=64, impossible for d ~ 1e5 (d² cells). The
    power iterate never materializes d²: each step is one broadcast of
    the 64-row v, one per-vector dot (groupBy vec_id, map-side
    partial), one per-dimension fold (groupBy j), and a 1-row max —
    the textbook distributed iterate (same posture as
    graph_pagerank_trade: one keyed pass per iteration, the iteration
    count IS the algorithm). The static plan restates each iterate's
    lineage (the unrolled-loop cost, biggest static exchange count in
    the registry); at runtime exchange reuse + AQE collapse it to a
    handful of stages — measured 4.8k shuffle records / 415 KB at
    sf0.01 — and a deeper-k deployment would checkpoint each iterate
    to truncate lineage. Integer headroom: max|u*1000| measured
    1.6e15 at sf0.01, ~1.6e17 at sf10 — inside int64; corpora past
    ~1e6 vectors drop the quantization scale, documented here as part
    of the contract.

    Reference analog: none (LLM-pipeline extension, SURVEY.md §2.2).
    """
    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    par = spark.sparkContext.defaultParallelism
    if emb.rdd.getNumPartitions() < par:
        emb = emb.repartition(par)
    x = emb.select(
        "vec_id",
        F.posexplode(
            F.transform(
                "embedding",
                lambda c, i: F.round(
                    (c.cast("double") + ((i * 37) % 13 - 6) * 0.06) * 1000
                ).cast("long"),
            )
        ).alias("j", "xq"),
    )
    v = x.select("j").distinct().withColumn("v", F.lit(1000).cast("long"))
    iterates = []
    for _ in range(3):
        s = (
            x.join(F.broadcast(v), "j")
            .groupBy("vec_id")
            .agg(F.sum(F.col("xq") * F.col("v")).alias("s"))
        )
        u = (
            x.join(s, "vec_id")
            .groupBy("j")
            .agg(F.sum(F.col("xq") * F.col("s")).alias("u"))
        )
        m = u.agg(F.max(F.abs(F.col("u"))).alias("m"))
        v = u.crossJoin(F.broadcast(m)).select(
            "j", F.expr("(u * 1000) div m").alias("v")
        )
        iterates.append(v)
    return (
        iterates[0].select("j", F.col("v").alias("v1"))
        .join(iterates[1].select("j", F.col("v").alias("v2")), "j")
        .join(iterates[2].select("j", F.col("v").alias("v3")), "j")
        .select(F.col("j").alias("dim"), "v1", "v2", "v3")
        .orderBy("dim")
    )


@query(
    "llm_dedup_containment",
    oracle=r"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 400
      UNION ALL
      SELECT doc_id + 30000 AS doc_id,
             array_to_string(regexp_split_to_array(trim(text), '\s+')[1:15], ' ')
               AS text
      FROM documents WHERE doc_id < 60
    ), grams AS (
      SELECT doc_id AS id, unnest(list_distinct(g.grams)) AS gram
      FROM (
        SELECT doc_id,
               list_transform(
                 range(1, greatest(len(regexp_split_to_array(trim(text), '\s+')) - 1, 1)),
                 i -> regexp_split_to_array(trim(text), '\s+')[i] || ' ' ||
                      regexp_split_to_array(trim(text), '\s+')[i+1] || ' ' ||
                      regexp_split_to_array(trim(text), '\s+')[i+2]
               ) AS grams
        FROM corpus
      ) g(doc_id, grams)
    ), sizes AS (
      SELECT id, count(*) AS n FROM grams GROUP BY id
    ), inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
      FROM grams a JOIN grams b USING (gram)
      WHERE a.id < b.id
      GROUP BY a.id, b.id
    )
    SELECT id_a, id_b,
           CAST(n_inter AS BIGINT) AS n_inter,
           CAST(n_inter * 10000 // least(sa.n, sb.n) AS BIGINT)
             AS containment_bp,
           CAST(n_inter * 10000 // (sa.n + sb.n - n_inter) AS BIGINT)
             AS jaccard_bp
    FROM inter
      JOIN sizes sa ON sa.id = id_a
      JOIN sizes sb ON sb.id = id_b
    WHERE n_inter * 10000 >= 9000 * least(sa.n, sb.n)
    ORDER BY id_a, id_b
    """,
)
def llm_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric n-gram containment dedup —
    operators/dedup.py:ngram_containment_pairs. The corpus plants
    15-word prefix EXCERPTS of 60 documents (the quote-inclusion
    case): their containment in the source is ~10000 bp while their
    Jaccard sits near |excerpt|/|source| — the output's jaccard_bp
    column shows exactly why the symmetric metric misses every one of
    these pairs at any dedup threshold. Same gram-self-join candidate
    machinery and scale bounds as the Jaccard/MinHash family; scores
    and thresholds are integer basis points end to end."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    base = docs.filter(F.col("doc_id") < 400)
    excerpts = docs.filter(F.col("doc_id") < 60).select(
        (F.col("doc_id") + 30000).alias("doc_id"),
        F.array_join(
            F.slice(F.split(F.trim("text"), r"\s+"), 1, 15), " "
        ).alias("text"),
    )
    corpus = base.unionByName(excerpts)
    par = spark.sparkContext.defaultParallelism
    if corpus.rdd.getNumPartitions() < par:
        corpus = corpus.repartition(par)
    from log2sql_spark.operators.dedup import ngram_containment_pairs

    return ngram_containment_pairs(corpus, threshold_bp=9000).orderBy(
        "id_a", "id_b"
    )


@query(
    "llm_dedup_minhash_oph",
    oracle=_CORPUS_SQL
    + r"""
    , grams AS (
      SELECT doc_id AS id, unnest(list_distinct(g.grams)) AS gram
      FROM (
        SELECT doc_id,
               list_transform(
                 range(1, greatest(len(regexp_split_to_array(trim(text), '\s+')) - 1, 1)),
                 i -> regexp_split_to_array(trim(text), '\s+')[i] || ' ' ||
                      regexp_split_to_array(trim(text), '\s+')[i+1] || ' ' ||
                      regexp_split_to_array(trim(text), '\s+')[i+2]
               ) AS grams
        FROM corpus
      ) g(doc_id, grams)
    ), hashed AS (
      SELECT id,
             (('0x' || substr(md5(gram), 1, 15))::BIGINT % 2147483647) % 64
               AS bin,
             (('0x' || substr(md5(gram), 1, 15))::BIGINT % 2147483647) // 64
               AS val
      FROM grams
    ), slots AS (
      SELECT id, bin, min(val) AS v FROM hashed GROUP BY id, bin
    ), spine AS (
      SELECT d.id, r.range AS bin
      FROM (SELECT DISTINCT id FROM slots) d, range(64) r
    ), arr AS (
      SELECT id, list(v ORDER BY bin) AS lst
      FROM (
        SELECT spine.id, spine.bin, slots.v
        FROM spine LEFT JOIN slots USING (id, bin)
      ) GROUP BY id
    ), sig AS (
      SELECT id,
             list_transform(range(64), j ->
               CASE WHEN lst[j + 1] IS NOT NULL THEN lst[j + 1]
                    ELSE lst[((j + list_filter(range(64),
                           c -> lst[((j + c) % 64) + 1] IS NOT NULL)[1]) % 64) + 1]
                         + 67108864 * list_filter(range(64),
                           c -> lst[((j + c) % 64) + 1] IS NOT NULL)[1]
               END) AS s
      FROM arr
    ), bands AS (
      SELECT id, r.range AS band, s[r.range * 8 + 1 : r.range * 8 + 8] AS slice
      FROM sig, range(8) r
    ), pairs AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.slice = b.slice AND a.id < b.id
    )
    SELECT id_a, id_b,
           CAST(len(list_filter(range(64),
                i -> sa.s[i + 1] = sb.s[i + 1])) AS BIGINT) AS n_agree,
           CAST(len(list_filter(range(64),
                i -> sa.s[i + 1] = sb.s[i + 1])) * 10000 // 64 AS BIGINT)
             AS est_jaccard_bp
    FROM pairs
      JOIN sig sa ON sa.id = id_a
      JOIN sig sb ON sb.id = id_b
    ORDER BY id_a, id_b
    """,
)
def llm_dedup_minhash_oph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-permutation-hashing MinHash dedup candidates — the
    hash-evaluation-lean variant of llm_dedup_minhash_lsh: ONE hash per
    gram (the hash picks the slot) instead of 64 affine hashes per
    gram, at identical banding semantics; rotation densification
    (offset-guarded borrow) keeps sparse docs unbiased. The measured
    end-to-end gain at 50k docs is ~1.05x (BENCH.json
    sf1.oph_vs_classic — the shared md5 gram hash dominates); the
    removed term scales with signature width, so OPH is the right
    default for wide signatures, not a free 64x. 8 bands x 8 rows generate candidates
    as an equi-join on the band slice; slot agreement over the full
    64-slot signature is the unbiased Jaccard estimate, reported in
    truncating basis points. The oracle re-derives every hash, bin
    minimum, densified slot, band collision, and agreement count
    bit-for-bit in SQL — the signature math itself is what's checked.
    Ref: Li, Owen & Zhang (NIPS 2012); Shrivastava & Li (ICML 2014).
    Reference analog: none — LLM-pipeline extension (SURVEY.md §2.2)."""
    from log2sql_spark.operators.dedup import banded_slices, oph_signatures

    sig = oph_signatures(_corpus(spark, sf_dir)).select("id", "sig")
    bands = banded_slices(sig, bands=8)
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.slice") == F.col("b.slice"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sa = sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    n_agree = F.expr(
        "size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))"
    ).cast("long")
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            n_agree.alias("n_agree"),
            F.expr(
                "CAST(size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y),"
                " v -> v)) * 10000 DIV 64 AS BIGINT)"
            ).alias("est_jaccard_bp"),
        )
        .orderBy("id_a", "id_b")
    )


@query(
    "llm_ann_indexed_incremental",
    oracle=_IVF_ORACLE,
)
def llm_ann_indexed_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index freshness: the IVF store is built from HALF the corpus,
    the other half arrives later via ``append_to_index`` — assignment
    against the frozen coarse quantizer, one clustered append commit,
    O(|new|) regardless of index size (operators/ann_index.py). The
    probe is identical to llm_ann_indexed and so is the oracle (the
    full-corpus direct IVF): an append-maintained index must be
    indistinguishable from a fresh build over the union, because the
    quantizer never moved. That is the operational story a serving
    index needs — ingest keeps running, probes never see a rebuild."""
    import os

    from log2sql_spark.operators.ann_index import (
        append_to_index,
        build_ivf_index,
        ivf_topk_indexed,
    )
    from log2sql_spark.scratch import scratch_dir

    emb = load_table(spark, "embeddings", sf_dir)
    centroids = emb.filter(F.col("vec_id") % 25 == 0)
    idx = os.path.join(scratch_dir("log2sql_annincr_"), "ivf")
    build_ivf_index(spark, idx, emb.filter(F.col("vec_id") % 2 == 0), centroids)
    append_to_index(spark, idx, emb.filter(F.col("vec_id") % 2 == 1))
    out = ivf_topk_indexed(spark, idx, emb.filter(F.col("vec_id") < 20), k=5, nprobe=3)
    return out.withColumn("cos_sim", F.round("cos_sim", 6)).orderBy("query_id", "rank")


@query(
    "llm_ann_drift_report",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS centroid_id, embedding AS centv
      FROM embeddings WHERE vec_id % 25 = 0 AND vec_id < 625
    ), base AS (
      SELECT vec_id AS id, embedding AS vec FROM embeddings
      WHERE vec_id % 2 = 0
    ), allv AS (
      SELECT vec_id AS id, embedding AS vec FROM embeddings
    ), ab AS (
      SELECT id, centroid_id,
             row_number() OVER (PARTITION BY id
               ORDER BY {_cos_sql('vec', 'centv')} DESC, centroid_id) AS rn
      FROM base, cent
    ), build_counts AS (
      SELECT centroid_id, count(*) AS build_n FROM ab WHERE rn = 1 GROUP BY 1
    ), al AS (
      SELECT id, centroid_id,
             row_number() OVER (PARTITION BY id
               ORDER BY {_cos_sql('vec', 'centv')} DESC, centroid_id) AS rn
      FROM allv, cent
    ), live_counts AS (
      SELECT centroid_id, count(*) AS live_n FROM al WHERE rn = 1 GROUP BY 1
    ), cells AS (
      SELECT centroid_id,
             coalesce(build_n, 0) AS build_n,
             coalesce(live_n, 0) AS live_n
      FROM build_counts FULL OUTER JOIN live_counts USING (centroid_id)
    ), tot AS (
      SELECT sum(build_n) AS bt, sum(live_n) AS lt FROM cells
    )
    SELECT CAST(centroid_id AS BIGINT) AS centroid_id,
           CAST(build_n AS BIGINT) AS build_n,
           CAST(live_n AS BIGINT) AS live_n,
           CAST(10000 * build_n // bt AS BIGINT) AS build_share_bp,
           CAST(10000 * live_n // lt AS BIGINT) AS live_share_bp,
           CAST(abs(10000 * live_n // lt - 10000 * build_n // bt)
                AS BIGINT) AS drift_bp,
           CAST(abs(10000 * live_n // lt - 10000 * build_n // bt) >= 100
                AS INTEGER) AS rebuild_cell
    FROM cells, tot
    ORDER BY centroid_id
    """,
)
def llm_ann_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell-balance drift monitor (r14, verdict #3): the index is
    built from the even half of the corpus (persisting the build-time
    per-cell histogram beside the centroid store), the odd half arrives
    later via ``append_to_index`` against the frozen quantizer, and
    ``index_drift_report`` compares live vs build per-cell corpus
    shares in exact integer basis points — the rebuild trigger
    ``append_to_index``'s docstring promises. A cell whose share moved
    >= 100 bp flags rebuild_cell = 1. The FIXED 25-centroid codebook
    (vec_id % 25 == 0 AND < 625 — the silhouette-query lesson: model
    parameters, never corpus-derived) keeps the assignment |V| x 25 at
    any scale; the monitor itself is one count aggregate over the index
    + two |cells| joins + a 1-row totals broadcast. The oracle
    re-derives both histograms from scratch assignments in SQL, so
    every count, share, and verdict bit is hash-checked."""
    import os

    from log2sql_spark.operators.ann_index import (
        append_to_index,
        build_ivf_index,
        index_drift_report,
    )
    from log2sql_spark.scratch import scratch_dir

    emb = load_table(spark, "embeddings", sf_dir)
    centroids = emb.filter((F.col("vec_id") % 25 == 0) & (F.col("vec_id") < 625))
    idx = os.path.join(scratch_dir("log2sql_anndrift_"), "ivf")
    build_ivf_index(spark, idx, emb.filter(F.col("vec_id") % 2 == 0), centroids)
    append_to_index(spark, idx, emb.filter(F.col("vec_id") % 2 == 1))
    return index_drift_report(spark, idx, threshold_bp=100).orderBy("centroid_id")


@query(
    "llm_tokenizer_fertility",
    oracle=r"""
    WITH per_doc AS (
      SELECT doc_id, lang,
             CAST(length(regexp_split_to_array(trim(text), '\s+'))
                  AS BIGINT) AS n_words,
             CAST(length(regexp_extract_all(
                    text, '[A-Za-z0-9]+|[^A-Za-z0-9 \t\n\r]')) AS BIGINT)
               AS n_tokens
      FROM documents WHERE length(trim(text)) > 0
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS total_words,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(n_tokens) * 1000 // sum(n_words) AS BIGINT)
             AS fertility_milli
    FROM per_doc
    GROUP BY lang
    ORDER BY lang
    """,
)
def llm_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language — tokens emitted per whitespace
    word (milli-units, integer floor division) under a BPE-ish
    pre-tokenization: a token is an alphanumeric run or a single
    non-alphanumeric non-space character (match-counting, not
    splitting — RE2 on the oracle side has no lookahead). The standard multilingual-tokenizer
    health metric: a language whose fertility is far above the corpus
    median pays proportionally more sequence length per word, which
    directly prices its training cost and flags under-represented
    scripts before a training run. Map-only per-doc counting (both
    counts from ONE regex split each, no explode of token rows) into a
    map-side-combined rollup over |languages| groups — the 100 TB shape
    is a single scan. Both counts are computed from the raw text column
    in one projection; nothing explodes to token rows."""
    docs = load_table(spark, "documents", sf_dir)
    trimmed = F.trim(F.col("text"))
    per_doc = docs.filter(F.length(trimmed) > 0).select(
        "lang",
        F.size(F.split(trimmed, r"\s+")).cast("bigint").alias("n_words"),
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9 \t\n\r]"), F.lit(0)
            )
        ).cast("bigint").alias("n_tokens"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("total_words"),
            F.sum("n_tokens").alias("total_tokens"),
            F.expr("sum(n_tokens) * 1000 div sum(n_words)").alias(
                "fertility_milli"
            ),
        )
        .orderBy("lang")
    )


@query(
    "llm_ppjoin_prefix_filter",
    oracle=_CORPUS_SQL
    + r"""
    , toks AS (
      SELECT doc_id AS id, unnest(list_distinct(g.grams)) AS tok
      FROM (
        SELECT doc_id,
               list_transform(
                 range(1, greatest(len(regexp_split_to_array(trim(text), '\s+')) - 1, 1)),
                 i -> regexp_split_to_array(trim(text), '\s+')[i] || ' ' ||
                      regexp_split_to_array(trim(text), '\s+')[i+1] || ' ' ||
                      regexp_split_to_array(trim(text), '\s+')[i+2]
               ) AS grams
        FROM corpus
      ) g(doc_id, grams)
    ), sizes AS (
      SELECT id, count(*) AS n FROM toks GROUP BY id
    ), inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
      FROM toks a JOIN toks b USING (tok)
      WHERE a.id < b.id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(sa.n AS BIGINT) AS n_a,
           CAST(sb.n AS BIGINT) AS n_b,
           CAST(n_inter AS BIGINT) AS n_inter,
           CAST(n_inter * 10000 // (sa.n + sb.n - n_inter) AS BIGINT) AS jacc_bp
    FROM inter
      JOIN sizes sa ON sa.id = id_a
      JOIN sizes sb ON sb.id = id_b
    WHERE 10 * n_inter >= 7 * (sa.n + sb.n - n_inter)
    ORDER BY id_a, id_b
    """,
)
def llm_ppjoin_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-similarity self-join with PREFIX FILTERING (PPJoin family,
    Xiao et al., WWW'08): exact word-3-gram-set Jaccard ≥ 0.7 pairs, found
    WITHOUT the all-pairs token join the brute oracle runs. Order every
    document's distinct tokens by global rarity (document frequency
    asc, token asc — one broadcastable df table), keep only the first
    p = n − ⌈0.7·n⌉ + 1 tokens as the doc's PREFIX: any pair with
    Jaccard ≥ 0.7 must share a prefix token under a consistent global
    order, so candidates come from a self-join on the tiny prefix
    relation plus the length filter 10·min(n) ≥ 7·max(n) — lossless by
    the prefix-filtering theorem, so the verified output EQUALS the
    exact all-pairs result. The rarity ordering is what makes prefixes
    selective: common tokens (which generate quadratic candidates)
    never appear in a short prefix. Complements MinHash-LSH: this is
    the exact-threshold variant (no recall loss) at the cost of a df
    pass — the right tool when the dedup policy is contractual.
    Verification joins full token sets ONLY for candidates; integer
    basis points and the cross-multiplied threshold avoid float
    boundary drift. Implementation: operators/dedup.py::ppjoin_pairs
    (property-tested lossless vs brute force on random corpora)."""
    from log2sql_spark.operators.dedup import ppjoin_pairs

    return ppjoin_pairs(
        _corpus(spark, sf_dir), threshold=(7, 10), n=3
    ).orderBy("id_a", "id_b")
