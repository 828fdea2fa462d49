"""Oracle-checked training-data pipeline queries: repetition filters,
eval contamination, PII redaction, deterministic splits, boilerplate
removal (SURVEY.md §2.2 north-star family — corpus curation).

Tokenization parity: Spark ``split(trim(text), '\\s+')`` ↔ DuckDB
``regexp_split_to_array(trim(text), '\\s+')``; n-grams are space-joined
in both. Fractions are single divisions of exact integers, so the
doubles are correctly rounded on both engines and hash-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log2sql_spark.operators.pipeline import (
    boilerplate_gram_flags,
    contamination_check,
    pii_redact,
    repetition_metrics,
    split_assign,
)
from log2sql_spark.registry import query
from log2sql_spark.sources.tables import load_table

_W = r"regexp_split_to_array(trim(text), '\s+')"

_G2 = (
    "list_transform(range(1, len(w)), i -> "
    "w[CAST(i AS INTEGER)] || ' ' || w[CAST(i AS INTEGER) + 1])"
)
_G3 = (
    "list_transform(range(1, len(w) - 1), i -> "
    "w[CAST(i AS INTEGER)] || ' ' || w[CAST(i AS INTEGER) + 1]"
    " || ' ' || w[CAST(i AS INTEGER) + 2])"
)


@query(
    "llm_repetition_metrics",
    oracle=rf"""
    WITH base AS (
      SELECT doc_id, {_W} AS w FROM documents WHERE doc_id < 300
    ), g AS (
      SELECT doc_id, w, {_G2} AS g2, {_G3} AS g3 FROM base
    )
    SELECT doc_id AS id,
           CAST(len(w) AS BIGINT) AS n_words,
           CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct_words,
           CAST(len(g2) AS BIGINT) AS n_2grams,
           CAST(len(g2) - len(list_distinct(g2)) AS BIGINT) AS n_dup_2grams,
           CAST(len(g3) AS BIGINT) AS n_3grams,
           CAST(len(g3) - len(list_distinct(g3)) AS BIGINT) AS n_dup_3grams,
           CAST(list_max(list_transform(list_distinct(w),
               x -> len(list_filter(w, y -> y = x)))) AS BIGINT) AS top_word_count,
           list_max(list_transform(list_distinct(w),
               x -> len(list_filter(w, y -> y = x)))) / len(w) AS top_word_frac,
           (len(g2) - len(list_distinct(g2))) / len(g2) AS dup_2gram_frac,
           (len(g3) - len(list_distinct(g3))) / len(g3) AS dup_3gram_frac
    FROM g
    ORDER BY id
    """,
)
def llm_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (top-word fraction, duplicate
    2-/3-gram fractions): in-row array math + a counts-only shuffle for
    the word mode. The oracle's quadratic list_filter scan is
    verification-only; the Spark path is explode+groupBy."""
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 300)
    return repetition_metrics(docs).orderBy("id")


@query(
    "llm_gopher_repetition_chars",
    oracle=r"""
    WITH d AS (
      SELECT doc_id, CAST(length(text) AS BIGINT) AS text_chars,
             list_filter(regexp_split_to_array(text, '\s+'), x -> len(x) > 0) AS w
      FROM documents
    ), u AS (
      SELECT doc_id, 0 AS n,
             unnest(list_filter(list_transform(
               generate_series(0, greatest(CAST(ceil(len(w) / 12.0) AS INT) - 1, 0)),
               i -> array_to_string(list_slice(w, CAST(i AS INT) * 12 + 1,
                                               CAST(i AS INT) * 12 + 12), ' ')),
               x -> len(x) > 0)) AS g
      FROM d
      UNION ALL
      SELECT doc_id, 2, unnest(list_transform(generate_series(1, len(w) - 1),
        i -> array_to_string(list_slice(w, CAST(i AS INT), CAST(i AS INT) + 1), ' '))) FROM d
      UNION ALL
      SELECT doc_id, 3, unnest(list_transform(generate_series(1, len(w) - 2),
        i -> array_to_string(list_slice(w, CAST(i AS INT), CAST(i AS INT) + 2), ' '))) FROM d
      UNION ALL
      SELECT doc_id, 4, unnest(list_transform(generate_series(1, len(w) - 3),
        i -> array_to_string(list_slice(w, CAST(i AS INT), CAST(i AS INT) + 3), ' '))) FROM d
      UNION ALL
      SELECT doc_id, 5, unnest(list_transform(generate_series(1, len(w) - 4),
        i -> array_to_string(list_slice(w, CAST(i AS INT), CAST(i AS INT) + 4), ' '))) FROM d
      UNION ALL
      SELECT doc_id, 10, unnest(list_transform(generate_series(1, len(w) - 9),
        i -> array_to_string(list_slice(w, CAST(i AS INT), CAST(i AS INT) + 9), ' '))) FROM d
    ), cnt AS (
      SELECT doc_id, n, ('0x' || substr(md5(g), 1, 15))::BIGINT AS h,
             CAST(length(g) AS BIGINT) AS glen,
             CAST(count(*) AS BIGINT) AS c
      FROM u GROUP BY doc_id, n, g
    ), per AS (
      SELECT doc_id, n, sum(c) AS total, sum(c - 1) AS dupx,
             sum((c - 1) * glen) AS dupch
      FROM cnt GROUP BY doc_id, n
    ), top AS (
      SELECT doc_id, n, c * glen AS topch
      FROM (SELECT cnt.*, row_number() OVER (
              PARTITION BY doc_id, n ORDER BY c DESC, glen DESC, h DESC) AS rn
            FROM cnt)
      WHERE rn = 1
    ), pv AS (
      SELECT per.doc_id,
             sum(CASE WHEN per.n = 0 THEN total END) AS n_lines,
             sum(CASE WHEN per.n = 0 THEN dupx END) AS dup_lines,
             sum(CASE WHEN per.n = 0 THEN dupch END) AS dup_line_chars,
             sum(CASE WHEN per.n = 2 THEN topch END) AS top2_chars,
             sum(CASE WHEN per.n = 3 THEN topch END) AS top3_chars,
             sum(CASE WHEN per.n = 4 THEN topch END) AS top4_chars,
             sum(CASE WHEN per.n = 5 THEN dupch END) AS dup5_chars,
             sum(CASE WHEN per.n = 10 THEN dupch END) AS dup10_chars
      FROM per LEFT JOIN top ON per.doc_id = top.doc_id AND per.n = top.n
      GROUP BY per.doc_id
    )
    SELECT d.doc_id, text_chars,
           CAST(coalesce(n_lines, 0) AS BIGINT) AS n_lines,
           CAST(coalesce(dup_lines, 0) AS BIGINT) AS dup_lines,
           CAST(coalesce(dup_line_chars, 0) AS BIGINT) AS dup_line_chars,
           CAST(coalesce(top2_chars, 0) AS BIGINT) AS top2_chars,
           CAST(coalesce(top3_chars, 0) AS BIGINT) AS top3_chars,
           CAST(coalesce(top4_chars, 0) AS BIGINT) AS top4_chars,
           CAST(coalesce(dup5_chars, 0) AS BIGINT) AS dup5_chars,
           CAST(coalesce(dup10_chars, 0) AS BIGINT) AS dup10_chars,
           CAST(10 * coalesce(dup_lines, 0) <= 3 * coalesce(n_lines, 0)
            AND 5 * coalesce(dup_line_chars, 0) <= text_chars
            AND 5 * coalesce(top2_chars, 0) <= text_chars
            AND 50 * coalesce(top3_chars, 0) <= 9 * text_chars
            AND 25 * coalesce(top4_chars, 0) <= 4 * text_chars
            AND 20 * coalesce(dup5_chars, 0) <= 3 * text_chars
            AND 10 * coalesce(dup10_chars, 0) <= text_chars AS INTEGER) AS rep_pass
    FROM d LEFT JOIN pv ON d.doc_id = pv.doc_id
    ORDER BY d.doc_id
    """,
)
def llm_gopher_repetition_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition filters in their published character-fraction
    form (Rae et al. 2021 Table A1): duplicate-line count/char
    fractions over the C4-contract 12-word chunks, top 2/3/4-gram char
    coverage (deterministic (count, len, md5) tie-break), duplicated
    5/10-gram beyond-first-occurrence chars, and the integer-exact
    pass verdict — operators/textops.py:repetition_char_stats.

    One explode → one (doc, n, md5) count (map-side partial) → per-doc
    rollup; the shuffle carries digests and small ints, never gram
    text. Complements llm_repetition_metrics (count fractions) and
    llm_gopher_filter (word/line rules)."""
    from log2sql_spark.operators.textops import repetition_char_stats

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)  # single corpus file: use all cores
    return repetition_char_stats(docs).orderBy("doc_id")


@query(
    "llm_contamination_check",
    oracle=rf"""
    WITH w AS (
      SELECT doc_id, {_W} AS w FROM documents
    ), trg AS (
      SELECT doc_id, list_distinct({_G3}) AS g FROM w WHERE doc_id < 300
    ), ev AS (
      SELECT DISTINCT unnest(list_distinct({_G3})) AS gram
      FROM w WHERE doc_id >= 450
    ), sh AS (
      SELECT doc_id, count(*) AS ns
      FROM (SELECT doc_id, unnest(g) AS gram FROM trg) tg
      JOIN ev USING (gram)
      GROUP BY doc_id
    )
    SELECT trg.doc_id AS id,
           CAST(len(g) AS BIGINT) AS n_grams,
           CAST(coalesce(ns, 0) AS BIGINT) AS n_shared_grams,
           CAST(CASE WHEN coalesce(ns, 0) * 20 >= len(g) THEN 1 ELSE 0 END
                AS INTEGER) AS contaminated,
           CAST(coalesce(ns, 0) AS BIGINT) / CAST(len(g) AS BIGINT) AS shared_frac
    FROM trg LEFT JOIN sh ON trg.doc_id = sh.doc_id
    ORDER BY id
    """,
)
def llm_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval word-3-gram contamination with a broadcast eval gram
    set: the standard pre-release decontamination pass."""
    docs = load_table(spark, "documents", sf_dir)
    train = docs.filter(F.col("doc_id") < 300)
    eval_docs = docs.filter(F.col("doc_id") >= 450)
    return contamination_check(train, eval_docs, n=3).orderBy("id")


@query(
    "llm_pii_redact",
    oracle=r"""
    WITH p AS (
      SELECT doc_id,
             text || ' Contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or call 555-'
                  || lpad(CAST((doc_id * 37) % 10000 AS VARCHAR), 4, '0')
                  || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
               AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '555-[0-9]{4}')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(text,
               '10\.[0-9]+\.[0-9]+\.[0-9]+')) AS BIGINT) AS n_ips,
           CAST(length(regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '555-[0-9]{4}', '<PHONE>', 'g'),
               '10\.[0-9]+\.[0-9]+\.[0-9]+', '<IP>', 'g')) AS BIGINT) AS redacted_len,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '555-[0-9]{4}', '<PHONE>', 'g'),
               '10\.[0-9]+\.[0-9]+\.[0-9]+', '<IP>', 'g')) AS redacted_md5
    FROM p
    ORDER BY doc_id
    """,
)
def llm_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over deterministically PII-augmented documents (the
    corpus has none, so each doc gets a synthetic email/phone/IP built
    identically on both engines). Counts + redacted-text md5 verify the
    full JVM regex pipeline."""
    docs = load_table(spark, "documents", sf_dir)
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)  # regex-heavy scan: use all cores
    did = F.col("doc_id")
    augmented = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" Contact user"),
            did.cast("string"),
            F.lit("@example.com or call 555-"),
            F.lpad(((did * 37) % 10000).cast("string"), 4, "0"),
            F.lit(" from 10.0."),
            (did % 256).cast("string"),
            F.lit(".7"),
        ),
    )
    return (
        pii_redact(augmented)
        .select("doc_id", "n_emails", "n_phones", "n_ips", "redacted_len", "redacted_md5")
        .orderBy("doc_id")
    )


@query(
    "llm_split_assign",
    oracle=r"""
    WITH b AS (
      SELECT *,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split-v1'), 1, 15))::BIGINT
               % 100 AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val'
                ELSE 'test' END AS split,
           lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE) / count(*) AS avg_chars,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM b
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def llm_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/val/test split (90/5/5), audited
    per language: assignment is a pure function of doc_id, so it is
    stable across engines, runs, and repartitioning — no RNG state."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.withColumn("split", split_assign(docs))
        .groupBy("split", "lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
            F.min("doc_id").cast("long").alias("min_doc"),
            F.max("doc_id").cast("long").alias("max_doc"),
        )
        .orderBy("split", "lang")
    )


@query(
    "llm_boilerplate_ngrams",
    oracle=rf"""
    WITH w AS (
      SELECT doc_id, {_W} AS w FROM documents
    ), g AS (
      SELECT doc_id, list_distinct({_G2}) AS g FROM w
    ), dfreq AS (
      SELECT gram, count(*) AS df
      FROM (SELECT doc_id, unnest(g) AS gram FROM g)
      GROUP BY gram
    ), boiler AS (
      SELECT gram FROM dfreq WHERE df >= 20
    ), nb AS (
      SELECT doc_id, count(*) AS n_boiler
      FROM (SELECT doc_id, unnest(g) AS gram FROM g) dg
      JOIN boiler USING (gram)
      GROUP BY doc_id
    )
    SELECT g.doc_id AS id,
           CAST(len(g) AS BIGINT) AS n_grams,
           CAST(coalesce(n_boiler, 0) AS BIGINT) AS n_boiler_grams,
           CAST(coalesce(n_boiler, 0) AS BIGINT) / CAST(len(g) AS BIGINT) AS boiler_frac
    FROM g LEFT JOIN nb ON g.doc_id = nb.doc_id
    WHERE g.doc_id < 200
    ORDER BY id
    """,
)
def llm_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-boilerplate flagging: word 2-grams present in ≥20 distinct
    documents, counted per document via a broadcast of the (small, Zipf
    tail) boilerplate set. Document frequency is computed over the FULL
    corpus even though only doc_id<200 rows are returned — the filter
    prunes the output scan, not the df aggregate."""
    docs = load_table(spark, "documents", sf_dir)
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)  # gram explode over the full corpus
    return (
        boilerplate_gram_flags(docs, min_df=20, n=2)
        .filter(F.col("id") < 200)
        .orderBy("id")
    )


@query(
    "llm_embedding_normalize",
    oracle=r"""
    WITH p AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
      FROM embeddings WHERE vec_id < 300
    ), n AS (
      SELECT vec_id, ed, sqrt(list_sum(list_transform(ed, x -> x * x))) AS l2_norm
      FROM p
    )
    SELECT vec_id, l2_norm,
           ed[1] / l2_norm AS c0_normalized,
           list_sum(ed) / l2_norm AS sum_normalized
    FROM n
    ORDER BY vec_id
    """,
)
def llm_embedding_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding L2 normalization audit: norm + normalized components,
    sequential-fold summation on both engines (bit-identical doubles,
    float32 inputs cast exactly to double)."""
    from log2sql_spark.operators.pipeline import embedding_normalize_features

    vecs = load_table(spark, "embeddings", sf_dir).filter(F.col("vec_id") < 300)
    return embedding_normalize_features(vecs).orderBy("vec_id")


@query(
    "llm_embedding_quantize",
    oracle=r"""
    WITH p AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
      FROM embeddings WHERE vec_id < 300
    ), s AS (
      SELECT vec_id, ed,
             list_max(list_transform(ed, x -> abs(x))) / 127.0 AS scale
      FROM p
    ), q AS (
      SELECT vec_id, scale,
             list_transform(ed, x -> CAST(floor(x / scale + 0.5) AS INTEGER)) AS q
      FROM s
    )
    SELECT vec_id, scale,
           q[1] AS q0,
           CAST(list_sum(q) AS BIGINT) AS sum_q,
           CAST(list_min(q) AS INTEGER) AS min_q,
           CAST(list_max(q) AS INTEGER) AS max_q,
           CAST(len(list_filter(q, x -> x = 0)) AS BIGINT) AS n_zero
    FROM q
    ORDER BY vec_id
    """,
)
def llm_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization with integer audit columns; rounding
    is floor(x/scale + 0.5) because round() diverges across engines on
    .5-boundary doubles while floor is bit-deterministic."""
    from log2sql_spark.operators.pipeline import embedding_quantize_features

    vecs = load_table(spark, "embeddings", sf_dir).filter(F.col("vec_id") < 300)
    return embedding_quantize_features(vecs).orderBy("vec_id")


@query(
    "llm_pack_sequences",
    oracle=r"""
    WITH t AS (
      SELECT lang AS part, doc_id AS id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok
      FROM documents
    ), c AS (
      SELECT *, sum(n_tok) OVER (PARTITION BY part ORDER BY id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT part, CAST((cum - n_tok) // 512 AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           CAST(min(id) AS BIGINT) AS first_doc,
           CAST(max(id) AS BIGINT) AS last_doc,
           CAST(CAST(sum(n_tok) AS BIGINT) AS DOUBLE) / 512.0 AS fill_frac
    FROM c
    GROUP BY 1, 2
    ORDER BY part, bin
    """,
)
def llm_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing into 512-token context windows,
    partitioned by language (the shard key at scale): a doc belongs to
    the window its first token lands in."""
    from log2sql_spark.operators.pipeline import pack_sequences

    docs = load_table(spark, "documents", sf_dir)
    return pack_sequences(docs, context_len=512).orderBy("part", "bin")


@query(
    "llm_source_mix",
    oracle=r"""
    WITH t AS (
      SELECT source, lang,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok
      FROM documents
    ), g AS (
      SELECT source, lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS total_tokens
      FROM t GROUP BY 1, 2
    )
    SELECT source, lang, n_docs, total_tokens,
           CAST(total_tokens AS DOUBLE)
             / (SELECT CAST(sum(n_tok) AS BIGINT) FROM t) AS token_share
    FROM g
    ORDER BY source, lang
    """,
)
def llm_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture audit: token counts and corpus share per
    (source, lang) — the numbers a pretraining mixture re-weighter
    consumes. The corpus total rides as a broadcast 1-row aggregate
    (no eager driver-side count), and the share is one division of
    exact integers."""
    from log2sql_spark.operators.dedup import tokens

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "source", "lang", F.size(tokens(F.col("text"))).cast("long").alias("n_tok")
    )
    g = toks.groupBy("source", "lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
    )
    total = toks.agg(F.sum("n_tok").cast("double").alias("_corpus_tok"))
    return (
        g.crossJoin(F.broadcast(total))
        .withColumn("token_share", F.col("total_tokens") / F.col("_corpus_tok"))
        .drop("_corpus_tok")
        .orderBy("source", "lang")
    )


@query(
    "llm_dedup_keep_best",
    oracle=r"""
    WITH corpus AS (
      SELECT doc_id, text, source FROM documents WHERE doc_id < 400
      UNION ALL
      SELECT doc_id + 10000, text, 'mirror' FROM documents WHERE doc_id < 120
    ), ranked AS (
      SELECT doc_id, source, md5(text) AS content_hash,
             row_number() OVER (
               PARTITION BY md5(text)
               ORDER BY CASE WHEN source = 'mirror' THEN 1 ELSE 0 END, doc_id
             ) AS rk,
             count(*) OVER (PARTITION BY md5(text)) AS n_copies
      FROM corpus
    )
    SELECT content_hash, CAST(doc_id AS BIGINT) AS keeper_id, source AS keeper_source,
           CAST(n_copies AS BIGINT) AS n_copies
    FROM ranked
    WHERE rk = 1 AND n_copies > 1
    ORDER BY keeper_id
    """,
)
def llm_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy dedup: duplicate groups keep the copy from the PREFERRED
    source (curated beats mirror; doc_id tie-break), not just the first
    seen — the keeper-selection pass every crawl pipeline runs after
    hashing. One window over (content_hash); the hash bounds the
    shuffle key width regardless of document size."""
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text", "source")
    base = docs.filter(F.col("doc_id") < 400)
    mirror = docs.filter(F.col("doc_id") < 120).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text", F.lit("mirror").alias("source")
    )
    corpus = base.unionByName(mirror).withColumn("content_hash", F.md5("text"))
    w = W.partitionBy("content_hash").orderBy(
        F.when(F.col("source") == "mirror", 1).otherwise(0), "doc_id"
    )
    return (
        corpus.withColumn("rk", F.row_number().over(w))
        .withColumn("n_copies", F.count("*").over(W.partitionBy("content_hash")))
        .filter((F.col("rk") == 1) & (F.col("n_copies") > 1))
        .select(
            "content_hash",
            F.col("doc_id").cast("long").alias("keeper_id"),
            F.col("source").alias("keeper_source"),
            F.col("n_copies").cast("long").alias("n_copies"),
        )
        .orderBy("keeper_id")
    )


@query(
    "llm_stratified_sample",
    oracle=r"""
    WITH s AS (
      SELECT lang,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':strat-v1'), 1, 15))::BIGINT
               % 10 = 0 AS picked
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(*) FILTER (picked) AS BIGINT) AS n_sampled,
           CAST(count(*) FILTER (picked) AS BIGINT)
             / CAST(count(*) AS BIGINT) AS sample_rate
    FROM s
    GROUP BY lang
    ORDER BY lang
    """,
)
def llm_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling audit: a hash-mod-10 pick gives
    every stratum (language) the same expected 10% rate with zero RNG
    state — reproducible across engines, runs, and repartitioning,
    unlike df.sample()."""
    from log2sql_spark.operators.dedup import md5_long

    docs = load_table(spark, "documents", sf_dir)
    picked = (
        md5_long(F.concat(F.col("doc_id").cast("string"), F.lit(":strat-v1"))) % 10 == 0
    )
    return (
        docs.withColumn("picked", picked)
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_total"),
            F.sum(F.col("picked").cast("long")).cast("long").alias("n_sampled"),
            (
                F.sum(F.col("picked").cast("long")).cast("long")
                / F.count("*").cast("long")
            ).alias("sample_rate"),
        )
        .orderBy("lang")
    )


#: DuckDB twin of bpe_train_merges' hash-sample: corpus slice doc_id<200,
#: deterministically thinned to ~1/4 by the 60-bit md5 of "id:bpe-v1".
_BPE_SAMPLE_WHERE = (
    "doc_id < 200 AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR) "
    "|| ':bpe-v1'), 1, 15))::BIGINT % 4 = 0"
)


def _bpe_oracle(n_merges: int, where: str = "doc_id < 50") -> str:
    """Chained-CTE DuckDB twin of the iterative BPE trainer: round k's
    merge is the argmax pair of round k-1's encoding — the same
    left-to-right non-overlapping literal replace as the Spark path."""
    sql = r"""
    WITH w AS (
      SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word
      FROM documents WHERE {where}
    ), r0 AS (
      SELECT regexp_replace(word, '(.)', '|\1|', 'g') AS enc FROM w
    )""".replace("{where}", where)
    selects = []
    for k in range(1, n_merges + 1):
        prev = f"r{k - 1}"
        sql += f""", p{k} AS (
      SELECT unnest(list_transform(range(1, len(s)),
          i -> '|' || s[CAST(i AS INTEGER)] || '||' || s[CAST(i AS INTEGER) + 1] || '|'))
        AS pair
      FROM (SELECT regexp_split_to_array(trim(enc, '|'), '\\|\\|') AS s FROM {prev})
    ), m{k} AS (
      SELECT pair, CAST(count(*) AS BIGINT) AS cnt FROM p{k}
      GROUP BY pair ORDER BY cnt DESC, pair LIMIT 1
    ), r{k} AS (
      SELECT replace(enc, (SELECT pair FROM m{k}),
                     replace((SELECT pair FROM m{k}), '||', '')) AS enc
      FROM {prev}
    )"""
        selects.append(f"SELECT CAST({k} AS INTEGER) AS round, pair, cnt FROM m{k}")
    return sql + "\n" + "\nUNION ALL\n".join(selects) + "\nORDER BY round"


@query("llm_bpe_train", oracle=_bpe_oracle(4, _BPE_SAMPLE_WHERE))
def llm_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training (4 merge rounds) — the canonical ITERATIVE
    algorithm shape: distributed pair counting per round, one argmax
    row collected per round to form the next merge rule (k-means-style
    driver loop). Deterministic via the (count desc, pair asc)
    tie-break, so even the learned merge table is oracle-checked.

    Trains on a hash-deterministic ~1/4 sample of the doc_id<200 slice
    (``sample_mod=4`` — see :func:`bpe_train_merges`' sample contract):
    at corpus scale every merge round re-scans the training set, so the
    trainer must be bounded by sampling, and the oracle proves the
    sampled run is still engine-exact."""
    from log2sql_spark.operators.pipeline import bpe_train_merges

    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 200)
    merges = bpe_train_merges(docs, n_merges=4, sample_mod=4)
    return spark.createDataFrame(merges, schema="round int, pair string, cnt long")


def _bpe_tokenize_oracle(n_merges: int) -> str:
    """The learned-merge APPLY twin: same CTE chain as training but with
    doc_id carried through, ending in per-document BPE token counts."""
    sql = r"""
    WITH w AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS word
      FROM documents WHERE doc_id < 50
    ), r0 AS (
      SELECT doc_id, regexp_replace(word, '(.)', '|\1|', 'g') AS enc FROM w
    )"""
    for k in range(1, n_merges + 1):
        prev = f"r{k - 1}"
        sql += f""", p{k} AS (
      SELECT unnest(list_transform(range(1, len(s)),
          i -> '|' || s[CAST(i AS INTEGER)] || '||' || s[CAST(i AS INTEGER) + 1] || '|'))
        AS pair
      FROM (SELECT regexp_split_to_array(trim(enc, '|'), '\\|\\|') AS s FROM {prev})
    ), m{k} AS (
      SELECT pair FROM p{k}
      GROUP BY pair ORDER BY count(*) DESC, pair LIMIT 1
    ), r{k} AS (
      SELECT doc_id, replace(enc, (SELECT pair FROM m{k}),
                             replace((SELECT pair FROM m{k}), '||', '')) AS enc
      FROM {prev}
    )"""
    return sql + f"""
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(length(trim(enc, '|')) - 2 * (len(regexp_split_to_array(
                trim(enc, '|'), '\\|\\|')) - 1)) AS BIGINT) AS n_chars,
           CAST(sum(len(regexp_split_to_array(trim(enc, '|'), '\\|\\|'))) AS BIGINT)
             AS n_bpe_tokens
    FROM r{n_merges}
    GROUP BY doc_id
    ORDER BY doc_id
    """


@query("llm_bpe_tokenize", oracle=_bpe_tokenize_oracle(4))
def llm_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned BPE merges: per document, word count, character
    count, and post-merge BPE token count (always ≤ chars — each merge
    fuses two symbols). Training collects 4 merge rules; applying them
    is a chain of four literal replaces — pure JVM expressions, no
    Python in the apply path."""
    from log2sql_spark.operators.pipeline import bpe_train_merges

    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 50)
    merges = bpe_train_merges(docs, n_merges=4)
    enc = F.regexp_replace("word", "(.)", r"|$1|")
    for _, pair, _cnt in merges:
        enc = F.replace(enc, F.lit(pair), F.lit(pair.replace("||", "")))
    from log2sql_spark.operators.dedup import tokens

    words = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("word")
    ).withColumn("enc", enc)
    syms = F.split(F.expr("trim(BOTH '|' FROM enc)"), r"\|\|")
    return (
        words.select(
            "doc_id",
            F.size(syms).alias("n_syms"),
            (F.length(F.expr("trim(BOTH '|' FROM enc)")) - 2 * (F.size(syms) - 1)).alias(
                "chars"
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("chars").cast("long").alias("n_chars"),
            F.sum("n_syms").cast("long").alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )


@query(
    "llm_curation_pipeline",
    oracle=r"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 300
      UNION ALL
      SELECT doc_id + 10000, text FROM documents WHERE doc_id < 50
    ), t AS (
      SELECT doc_id, text,
             regexp_split_to_array(trim(text), '\s+') AS toks,
             length(text) AS nc
      FROM corpus
    ), feat AS (
      SELECT doc_id,
             CASE WHEN (nc - length(regexp_replace(text, '[一-鿿]', '', 'g'))) * 10 > nc
                  THEN 'zh'
                  WHEN len(list_filter(toks, x -> lower(x) IN
                       ('el','la','de','los','las','un','una','y','en','que')))
                     > len(list_filter(toks, x -> lower(x) IN
                       ('the','a','of','and','to','in','is','it','for','on')))
                  THEN 'es' ELSE 'en' END AS lang_pred,
             least(1.0, (len(list_distinct(toks)) / len(toks)) * 0.5
                        + least(1.0, len(toks) / 100.0) * 0.5) AS quality,
             list_max(list_transform(list_distinct(toks),
                 x -> len(list_filter(toks, y -> y = x)))) AS topw,
             len(toks) AS ntok
      FROM t
    ), keeper AS (
      SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rk
      FROM corpus
    )
    SELECT f.doc_id,
           CASE WHEN lang_pred <> 'en' THEN 'lang'
                WHEN quality < 0.5 THEN 'quality'
                WHEN topw * 25 > ntok * 3 THEN 'repetition'
                WHEN rk > 1 THEN 'duplicate' END AS reject_reason,
           CAST(CASE WHEN lang_pred <> 'en' OR quality < 0.5
                     OR topw * 25 > ntok * 3 OR rk > 1
                THEN 0 ELSE 1 END AS INTEGER) AS kept
    FROM feat f JOIN keeper k ON f.doc_id = k.doc_id
    ORDER BY f.doc_id
    """,
)
def llm_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END curation pass: language gate → quality-score gate →
    repetition gate → exact-dedup keeper, each doc labeled kept or with
    its FIRST rejection reason — the composed form of the individual
    operators, one scan + one counts-only shuffle + one hash window.
    Thresholds compare exact integers where possible (topw*25 > ntok*3
    ≡ top_word_frac > 0.12) and bit-identical doubles elsewhere."""
    from pyspark.sql import Window as W

    from log2sql_spark.operators.textops import with_lang_id, with_text_stats

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 300).unionByName(
        docs.filter(F.col("doc_id") < 50).select(
            (F.col("doc_id") + 10000).alias("doc_id"), "text"
        )
    )
    feats = (
        with_text_stats(with_lang_id(corpus))
        .select("doc_id", "text", "lang_pred", "quality_score", "n_tokens")
    )
    # topw (max token multiplicity) map-side: the longest equal-run in
    # the SORTED token array — O(n log n) per doc, replacing the
    # explode + two-level aggregate + join (guide §2.4: the old shape
    # re-scanned documents and shuffled every token twice to compute a
    # per-doc scalar). The fold's greatest() mirrors max(count) exactly:
    # split() never yields NULLs, and acc.prev starts NULL so the first
    # token opens a run of 1 (NULL == x is NULL -> otherwise(1)).
    sorted_toks = F.array_sort(F.split(F.trim(F.col("text")), r"\s+"))
    topw_col = F.aggregate(
        sorted_toks,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(acc["prev"] == x, acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(acc["prev"] == x, acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    # The keeper rank applies directly to the fused per-doc relation:
    # row_number over the SAME (md5(text), doc_id) window the old
    # standalone keeper used, so rk is unchanged — doc_id is unique in
    # the corpus, so the old equi-joins were 1:1 row stitching that two
    # broadcast joins paid for. One scan pass, one window exchange.
    fused = feats.select(
        "doc_id",
        "lang_pred",
        "quality_score",
        "n_tokens",
        topw_col.alias("topw"),
        F.row_number()
        .over(W.partitionBy(F.md5(F.col("text"))).orderBy("doc_id"))
        .alias("rk"),
    )
    reason = (
        F.when(F.col("lang_pred") != "en", "lang")
        .when(F.col("quality_score") < 0.5, "quality")
        .when(F.col("topw") * 25 > F.col("n_tokens") * 3, "repetition")
        .when(F.col("rk") > 1, "duplicate")
    )
    return (
        fused.select(
            "doc_id",
            reason.alias("reject_reason"),
            reason.isNull().cast("int").alias("kept"),
        )
        .orderBy("doc_id")
    )


@query(
    "llm_gopher_quality",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0) AS words,
             list_filter(string_split(text, chr(10)), x -> len(x) > 0) AS lines
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             CAST(len(words) AS BIGINT) AS n_words,
             CAST(coalesce(list_sum(list_transform(words, x -> len(x))), 0) AS BIGINT) AS sum_word_chars,
             CAST(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha_words,
             CAST(len(list_intersect(list_distinct(words),
                  ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS n_stop_distinct,
             CAST(len(lines) AS BIGINT) AS n_lines,
             CAST(len(list_filter(lines, l -> starts_with(l, '- ') OR starts_with(l, '* '))) AS BIGINT) AS n_bullet_lines,
             CAST(len(list_filter(lines, l -> ends_with(l, '...'))) AS BIGINT) AS n_ellipsis_lines
      FROM w
    )
    SELECT *,
           CAST(n_words BETWEEN 50 AND 100000
                AND sum_word_chars >= 3 * n_words
                AND sum_word_chars <= 10 * n_words
                AND 10 * n_alpha_words >= 8 * n_words
                AND n_stop_distinct >= 2
                AND 10 * n_bullet_lines <= 9 * n_lines
                AND 10 * n_ellipsis_lines <= 3 * n_lines AS INT) AS gopher_pass
    FROM m
    ORDER BY doc_id
    """,
)
def llm_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021 A1.1) as exact
    integer metrics + verdict — operators/textops.py:with_gopher_rules.
    Thresholds evaluated by integer cross-multiplication so the verdict
    hashes identically cross-engine; one JVM projection, no shuffle, no
    Python. At 100 TB this is the cheapest possible filter shape: a
    map-only scan whose predicate reaches whole-stage codegen."""
    from log2sql_spark.operators.textops import with_gopher_rules

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)  # single corpus file: use all cores
    return (
        with_gopher_rules(docs)
        .drop("text")
        .orderBy("doc_id")
    )


@query(
    "llm_c4_line_filter",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0) AS words
      FROM documents
    ),
    c AS (
      SELECT doc_id,
             list_filter(
               list_transform(
                 generate_series(0, greatest(CAST(ceil(len(words) / 12.0) AS INT) - 1, 0)),
                 i -> array_to_string(list_slice(words, i * 12 + 1, i * 12 + 12), ' ')),
               x -> len(x) > 0) AS chunks
      FROM w
    )
    SELECT doc_id,
           CAST(len(chunks) AS BIGINT) AS n_lines,
           CAST(len(list_filter(chunks, c -> len(string_split(c, ' ')) < 5)) AS BIGINT) AS n_short_lines,
           CAST(len(list_filter(chunks, c -> regexp_matches(c, '[.!?"]$'))) AS BIGINT) AS n_punct_lines,
           CAST(len(list_filter(chunks, c -> contains(c, '{') OR contains(c, 'lorem ipsum')
                                             OR contains(c, 'javascript'))) AS BIGINT) AS n_flagged_lines,
           CAST(len(chunks) - len(list_distinct(chunks)) AS BIGINT) AS n_dup_lines,
           CAST(len(list_filter(chunks, c -> len(string_split(c, ' ')) >= 5
                AND NOT (contains(c, '{') OR contains(c, 'lorem ipsum')
                         OR contains(c, 'javascript')))) AS BIGINT) AS n_kept_lines,
           CAST(len(list_filter(chunks, c -> len(string_split(c, ' ')) >= 5
                AND NOT (contains(c, '{') OR contains(c, 'lorem ipsum')
                         OR contains(c, 'javascript')))) >= 3 AS INT) AS c4_keep_doc
    FROM c
    ORDER BY doc_id
    """,
)
def llm_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line filtering (Raffel et al. 2020 §2.2) over deterministic
    12-word chunks — operators/textops.py:with_c4_line_stats. The
    chunking is part of the cross-engine contract; the rules (>=5
    words, terminal punctuation, blocklist, within-doc duplicate
    lines, drop docs left with <3 lines) are C4's. One JVM array
    projection per doc — the filter never explodes lines into rows, so
    at 100 TB it stays a map-only scan."""
    from log2sql_spark.operators.textops import with_c4_line_stats

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)  # single corpus file: use all cores
    return (
        with_c4_line_stats(docs)
        .drop("text")
        .orderBy("doc_id")
    )


@query(
    "llm_nb_source_classifier",
    oracle=r"""
    WITH base AS (
      SELECT doc_id AS id, source AS label,
             regexp_split_to_array(trim(text), '\s+') AS w
      FROM documents
    ),
    train AS (SELECT * FROM base WHERE id % 5 <> 0),
    test  AS (SELECT * FROM base WHERE id % 5 = 0),
    ttok AS (SELECT label, unnest(w) AS tok FROM train),
    counts AS (SELECT label, tok, count(*) AS c FROM ttok GROUP BY 1, 2),
    ltot AS (SELECT label, count(*) AS t FROM ttok GROUP BY 1),
    prior AS (SELECT label, count(*) AS d FROM train GROUP BY 1),
    v AS (SELECT count(DISTINCT tok) AS v FROM ttok),
    dd AS (SELECT count(*) AS n_train FROM train),
    stok AS (SELECT id, label AS actual, unnest(w) AS tok FROM test),
    scored AS (
      SELECT s.id, s.actual, l.label AS cand,
             sum(ln((coalesce(c.c, 0) + 1.0)
                    / (l.t + (SELECT v FROM v)))) AS tok_ll
      FROM stok s
      CROSS JOIN ltot l
      LEFT JOIN counts c ON c.tok = s.tok AND c.label = l.label
      GROUP BY 1, 2, 3
    ),
    final AS (
      SELECT sc.id, sc.actual, sc.cand,
             round(sc.tok_ll
                   + ln(p.d / (SELECT CAST(n_train AS DOUBLE) FROM dd)),
                   6) AS score
      FROM scored sc JOIN prior p ON p.label = sc.cand
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY id ORDER BY score DESC, cand ASC) AS rn
      FROM final
    )
    SELECT id, actual AS actual_source, cand AS pred_source, score,
           cand = actual AS is_correct
    FROM ranked WHERE rn = 1 ORDER BY id
    """,
)
def llm_nb_source_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based curation filter: a multinomial Naive Bayes classifier
    trained ON the corpus (80% hash-deterministic train split) and
    applied to the held-out 20% — the fastText-classifier stage of
    C4/CCNet-style pipelines restated as pure counting, so "training"
    is one distributed aggregate and scoring is one join + aggregate.
    Scores round to 6 dp before the argmax (ties break on label) so the
    prediction is deterministic cross-engine. Reference analog: none —
    mandated LLM-pipeline extension surface (SURVEY.md §2.2)."""
    from log2sql_spark.operators.textops import nb_source_scores

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "source", "text")
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    return nb_source_scores(docs).orderBy("id")


@query(
    "llm_weighted_sample_topk",
    oracle=r"""
    WITH b AS (
      SELECT doc_id AS id, source, greatest(n_chars, 1) AS w,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':ws-v1'), 1, 15))::BIGINT AS h
      FROM documents
    )
    SELECT id, source, CAST(w AS BIGINT) AS w,
           round(ln((h + 1) / 1152921504606846976.0) / w, 12) AS sample_key
    FROM b ORDER BY sample_key DESC, id LIMIT 200
    """,
)
def llm_weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES): each doc gets key ln(u)/w with u a deterministic
    hash-uniform and w its length; the global top-k by key IS a weighted
    sample without replacement — restated as a plain top-k, so it runs
    as TakeOrdered (per-partition heaps + driver merge of k rows), never
    a global sort. The mixture-sampling primitive for data curation
    ("sample 10M docs proportional to length/quality") with run-, engine-
    and partitioning-stable output; keys quantized to 12 dp with an id
    tie-break so the SELECTION is deterministic cross-engine.
    Reference analog: none — LLM-pipeline extension (SURVEY.md §2.2)."""
    from log2sql_spark.operators.dedup import md5_long

    docs = load_table(spark, "documents", sf_dir)
    h = md5_long(F.concat(F.col("doc_id").cast("string"), F.lit(":ws-v1")))
    w = F.greatest(F.col("n_chars"), F.lit(1))
    key = F.round(
        F.log((h + 1) / F.lit(1152921504606846976.0)) / w, 12
    )
    return (
        docs.select(
            F.col("doc_id").alias("id"),
            "source",
            w.cast("long").alias("w"),
            key.alias("sample_key"),
        )
        .orderBy(F.desc("sample_key"), "id")
        .limit(200)
    )


@query(
    "llm_token_entropy",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id AS id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      FROM documents
    ),
    tf AS (SELECT id, tok, count(*) AS c FROM toks GROUP BY 1, 2)
    SELECT id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct,
           round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS token_entropy
    FROM tf GROUP BY id ORDER BY id
    """,
)
def llm_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon token entropy — the diversity/quality signal
    that separates natural prose from keyword-stuffed or template spam
    (low-entropy docs are near-constant token streams). Restated shuffle-
    efficiently as H = ln(n) - (Σ c·ln c)/n over per-(doc, token) counts:
    two map-side-combined aggregates, no per-doc quadratic list scans.
    Rounded to 6 dp for cross-engine determinism. Reference analog:
    none — LLM-pipeline extension (SURVEY.md §2.2)."""
    from log2sql_spark.operators.dedup import tokens

    docs = load_table(spark, "documents", sf_dir)
    tf = (
        docs.select(
            F.col("doc_id").alias("id"),
            F.explode(tokens(F.col("text"))).alias("tok"),
        )
        .groupBy("id", "tok")
        .agg(F.count("*").alias("c"))
    )
    return (
        tf.groupBy("id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_distinct"),
            F.round(
                F.log(F.sum("c")) - F.sum(F.col("c") * F.log("c")) / F.sum("c"),
                6,
            ).alias("token_entropy"),
        )
        .orderBy("id")
    )


@query(
    "llm_ngram_novelty",
    oracle=rf"""
    WITH w AS (
      SELECT doc_id, {_W} AS w FROM documents
    ), grams AS (
      SELECT doc_id, unnest(list_distinct({_G3})) AS g FROM w
    ), first_seen AS (
      SELECT g, CAST(min(doc_id) AS BIGINT) AS first_doc FROM grams GROUP BY g
    )
    SELECT CAST(gr.doc_id AS BIGINT) AS id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN fs.first_doc = gr.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           sum(CASE WHEN fs.first_doc = gr.doc_id THEN 1 ELSE 0 END) * 10000
             // count(*) AS novelty_bp
    FROM grams gr JOIN first_seen fs ON fs.g = gr.g
    WHERE gr.doc_id % 20 = 0
    GROUP BY gr.doc_id
    ORDER BY id
    """,
)
def llm_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty curve: per document (sampled every 20th id), how
    many of its distinct 3-grams appear for the FIRST time in ingestion
    order — the dataset-diversity signal a corpus build tracks to see
    when new data stops adding new content (novelty decaying toward
    zero means the crawl is saturating). First-occurrence is one gram
    aggregate (min doc id, map-side combined); the join back is on the
    gram — no per-prefix rescans, so the curve costs two shuffles
    regardless of corpus size. Novelty in truncating basis points."""
    from log2sql_spark.operators.dedup import word_ngrams

    docs = load_table(spark, "documents", sf_dir)
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    grams = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(word_ngrams(F.col("text"), 3)).alias("g"),
    )
    first_seen = grams.groupBy("g").agg(
        F.min("doc_id").cast("long").alias("first_doc")
    )
    return (
        grams.filter(F.col("doc_id") % 20 == 0)
        .join(first_seen, "g")
        .groupBy(F.col("doc_id").alias("id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_novel"),
            F.expr(
                "sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)"
                " * 10000 DIV count(*)"
            ).alias("novelty_bp"),
        )
        .orderBy("id")
    )


@query(
    "llm_code_detect",
    oracle=r"""
    WITH fx AS (
      SELECT doc_id AS id,
             CASE WHEN doc_id % 7 = 0
                    THEN replace(text, ' ', '();' || chr(10) || '  ')
                  WHEN doc_id % 7 = 3
                    THEN replace(text, 'value', 'value();')
                  ELSE text END AS t
      FROM documents
    ),
    f AS (
      SELECT id,
             CAST(length(t) AS BIGINT) AS n_chars,
             CAST(len(regexp_extract_all(t, '[;{}()=]')) AS BIGINT) AS n_symbols,
             list_filter(string_split(t, chr(10)), l -> len(l) > 0) AS lines
      FROM fx
    )
    SELECT id, n_chars, n_symbols,
           n_symbols * 10000 // greatest(n_chars, 1) AS symbol_bp,
           CAST(len(lines) AS BIGINT) AS n_lines,
           CAST(len(list_filter(lines, l -> l LIKE '  %' AND len(trim(l)) > 0))
                  AS BIGINT) AS n_indent_lines,
           CAST(200 * n_symbols >= greatest(3 * n_chars, 1)
                OR 10 * len(list_filter(lines, l -> l LIKE '  %' AND len(trim(l)) > 0))
                   >= greatest(3 * len(lines), 1) AS INT) AS is_code
    FROM f ORDER BY id
    """,
)
def llm_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose detection — operators/textops.py:
    with_code_prose_stats. The routing signal a pretraining mix needs
    before dedup/filter rules diverge by modality: code dedups at
    function granularity and must keep its braces; prose gets stopword
    and terminal-punctuation gates that would shred code.

    The synthetic corpus contains no code, so the query deterministically
    renders doc_id%7==0 as heavy code (every space becomes '();\\n  ' —
    symbols + indented lines) and doc_id%7==3 as light code (each
    'value' token gains a call suffix) — both engines apply the same
    rewrite, so the detector sees three real populations: heavy code
    (both rules fire), borderline (the 150 bp symbol-density rule
    splits the class 31/71 at sf0.01), and pure prose. Verdicts are
    integer cross-multiplications — no float compares. Map-only scan;
    reference analog: none (LLM-pipeline extension, SURVEY.md §2.2)."""
    from log2sql_spark.operators.textops import with_code_prose_stats

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)  # single corpus file: use all cores
    fx = docs.select(
        F.col("doc_id").alias("id"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.expr(r"replace(text, ' ', '();\n  ')"),
        )
        .when(
            F.col("doc_id") % 7 == 3,
            F.expr("replace(text, 'value', 'value();')"),
        )
        .otherwise(F.col("text"))
        .alias("t"),
    )
    return (
        with_code_prose_stats(fx, text_col="t")
        .select(
            "id", "n_chars", "n_symbols", "symbol_bp",
            "n_lines", "n_indent_lines", "is_code",
        )
        .orderBy("id")
    )


_GREEDY_VOCAB = [
    "ta", "ble", "win", "dow", "spark", "str", "eam", "ba", "tch", "cus",
    "tom", "er", "qu", "ery", "val", "ue", "lin", "scan", "sort", "hash",
    "mer", "ge", "fil", "ter", "group", "the", "row", "key", "agg", "da",
    "col", "umn", "ord", "join", "part", "big", "small", "fast", "slow",
    "vec", "tor",
]


@query(
    "llm_tokenize_greedy_vocab",
    oracle=rf"""
    WITH RECURSIVE vocab(v) AS (
      SELECT unnest([{", ".join(repr(v) for v in _GREEDY_VOCAB)}])
    ), toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+'))
        AS word
      FROM documents WHERE doc_id < 50
    ), words(w) AS (SELECT DISTINCT word FROM toks),
    enc AS (
      SELECT w, w AS remaining, 0 AS n_tok FROM words
      UNION ALL
      SELECT w,
             substr(remaining, length(coalesce(
               (SELECT v FROM vocab WHERE remaining LIKE v || '%'
                ORDER BY length(v) DESC, v LIMIT 1),
               substr(remaining, 1, 1))) + 1),
             n_tok + 1
      FROM enc WHERE remaining <> ''
    ), dict AS (
      SELECT w AS word, CAST(n_tok AS BIGINT) AS n_tok
      FROM enc WHERE remaining = ''
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(d.n_tok) AS BIGINT) AS n_subwords
    FROM toks t JOIN dict d USING (word)
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
)
def llm_tokenize_greedy_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer ENCODE pass (greedy longest-match subword inference
    against a fixed vocabulary — WordPiece-style), completing the
    tokenizer family's other half (llm_bpe_train learns merges; this
    APPLIES a vocabulary). The at-scale trick is dictionary encoding:
    the sequential match loop (inherently per-word, an Arrow-batched
    pandas iterator — operators/pipeline.py:greedy_tokenize_words)
    runs once per DISTINCT word, then one broadcast join prices every
    occurrence — 100 TB tokenizes at |vocabulary| match cost, not
    |token stream|. Unmatched characters fall back to single-char
    tokens so every word encodes. The DuckDB oracle re-runs the exact
    greedy match as a recursive CTE (longest-prefix-first, same
    tie-break), so the per-word token counts — not just totals — are
    cross-engine-proven. Reference analog: none — LLM-pipeline
    extension (SURVEY.md §2.2)."""
    from log2sql_spark.operators.pipeline import greedy_tokenize_words

    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 50)
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("word"),
    )
    dict_df = greedy_tokenize_words(
        toks.select("word").distinct(), _GREEDY_VOCAB
    )
    return (
        toks.join(F.broadcast(dict_df), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_tok").cast("long").alias("n_subwords"),
        )
        .orderBy("doc_id")
    )


@query(
    "llm_dataset_card_stats",
    oracle=r"""
    WITH docs AS (
      SELECT doc_id, source, lang, text,
             len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
             md5(text) AS digest
      FROM documents
    ), dupes AS (
      SELECT digest, count(*) AS c FROM docs GROUP BY digest
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(d.n_tokens) AS BIGINT) AS total_tokens,
           CAST(count(DISTINCT d.lang) AS BIGINT) AS n_langs,
           min(d.lang) AS first_lang,
           CAST(count(*) FILTER (WHERE dp.c > 1) AS BIGINT) AS exact_dup_docs,
           CAST(count(*) FILTER (WHERE dp.c > 1) * 10000 // count(*)
                AS BIGINT) AS dup_rate_bp,
           CAST(min(d.n_tokens) AS BIGINT) AS min_tokens,
           CAST(max(d.n_tokens) AS BIGINT) AS max_tokens
    FROM docs d JOIN dupes dp USING (digest)
    GROUP BY d.source
    ORDER BY d.source
    """,
)
def llm_dataset_card_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source DATASET CARD — the one-table summary a corpus
    release ships (datasheets-for-datasets practice): document and
    token volumes, language spread, exact-duplicate exposure (docs
    whose content digest collides anywhere in the corpus, rate in
    truncating bp), and token-length extremes. One tokenize-free pass
    (whitespace token COUNT only — no explode), one 16-byte digest
    aggregate for the dup join, one rollup; at 100 TB nothing here
    shuffles documents, only digests and per-source partials. The
    composition is the point: the card pulls the mixture
    (llm_source_mix), dedup (llm_dedup_exact), and length-profile
    signals into the single artifact a consumer reads first."""
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id",
        "source",
        "lang",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
        F.md5("text").alias("digest"),
    )
    dupes = docs.groupBy("digest").agg(F.count(F.lit(1)).alias("c"))
    return (
        docs.join(dupes, "digest")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.min("lang").alias("first_lang"),
            F.count(F.when(F.col("c") > 1, 1)).alias("exact_dup_docs"),
            F.expr(
                "count(CASE WHEN c > 1 THEN 1 END) * 10000 DIV count(*)"
            ).cast("bigint").alias("dup_rate_bp"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .orderBy("source")
    )
