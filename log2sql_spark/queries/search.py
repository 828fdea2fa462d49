r"""Ranked retrieval over the document corpus: BM25 scoring.

The search-side companion of the LLM curation operators: the same
inverted-index statistics (tf, df, doc length) the quality/TF-IDF
queries compute, folded into the BM25 ranking function. Everything is
JVM expressions over two aggregates and a broadcast of the per-term
stats; at 100 TB the term-stats side is tiny (|query terms| rows) and
the per-document side is one pass over the exploded token stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from log2sql_spark.registry import query
from log2sql_spark.sources.tables import load_table

_QUERY_TERMS = ("spark", "hash", "window", "merge")
_K1, _B = 1.2, 0.75


@query(
    "llm_bm25_search",
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
      FROM toks JOIN qterms USING (tok)
      GROUP BY doc_id, tok
    ),
    df AS (
      SELECT tok, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
      FROM toks JOIN qterms USING (tok)
      GROUP BY tok
    )
    SELECT doc_id,
           round(sum(
             ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * ({_K1} + 1)
             / (tf.tf + {_K1} * (1 - {_B} + {_B} * dl / s.avgdl))
           ), 6) AS bm25
    FROM tf
    JOIN df USING (tok)
    JOIN doclen USING (doc_id)
    CROSS JOIN stats s
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT 20
    """,
)
def llm_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 for a fixed term query (k1=1.2, b=0.75).

    The per-document statistics the formula needs — doc length and the
    four per-term tfs — are pure functions of one document's token
    array, so they are computed MAP-SIDE (size + four array filters over
    one materialized split; the token array goes through its own
    projection so the non-cheap split is evaluated once, not once per
    referencing expression). Nothing explodes and no (doc, token) row
    ever shuffles — the r13 shape persisted the full token stream and
    paid a (doc, tok) aggregate + a doclen aggregate + a join to stitch
    them back (guide §2.3/§2.4: the token stream was a proxy relation
    whose only use was counting; count inside the array instead).

    Corpus-level scalars (n_docs, avgdl, the four dfs) fall out of ONE
    single-row aggregate over the per-doc stats, broadcast back via
    crossJoin; scoring is then a map-side expression and top-20 is a
    TakeOrdered, so the whole query is: scan → project → [1-row agg] →
    score → top-k. Per-term scores sum in fixed term order (a term the
    doc lacks contributes exact +0.0, so the double sum is unchanged);
    scores round to 6dp BEFORE the ordering so the ranking is
    cross-engine deterministic (ties broken by doc_id).

    avgdl averages over docs that HAVE a token row in the exploded
    formulation — i.e. docs whose token array is non-empty — replicated
    here by averaging ``when(dl > 0, dl)`` (split of a trimmed string
    never yields an empty array in practice, but exactness is free)."""
    from log2sql_spark.operators.dedup import tokens

    docs = load_table(spark, "documents", sf_dir)
    # own projection: keeps the split from being inlined into every
    # consumer expression below (CollapseProject retains the split —
    # non-cheap, multiply-referenced)
    toked = docs.select("doc_id", tokens(F.col("text")).alias("_toks"))
    tf_cols = [
        F.size(F.filter("_toks", lambda x: x == t)).cast("double").alias(f"_tf{i}")
        for i, t in enumerate(_QUERY_TERMS)
    ]
    # per_doc feeds the 1-row stats aggregate AND the scoring branch;
    # persist (|docs| x 6 numeric columns — tiny) so the corpus
    # tokenizes once, not once per branch.
    per_doc = toked.select(
        "doc_id",
        F.size("_toks").cast("double").alias("dl"),
        *tf_cols,
    ).persist()
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(F.when(F.col("dl") > 0, F.col("dl"))).alias("avgdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("double")).alias(f"_df{i}")
            for i in range(len(_QUERY_TERMS))
        ],
    )

    def term_score(i: int):
        tf, df = F.col(f"_tf{i}"), F.col(f"_df{i}")
        idf = F.log(1 + (F.col("n_docs") - df + 0.5) / (df + 0.5))
        return F.when(
            tf > 0,
            idf * tf * (_K1 + 1)
            / (tf + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl"))),
        ).otherwise(F.lit(0.0))

    score = term_score(0)
    for i in range(1, len(_QUERY_TERMS)):
        score = score + term_score(i)
    any_tf = F.greatest(*[F.col(f"_tf{i}") for i in range(len(_QUERY_TERMS))])
    return (
        per_doc.filter(any_tf > 0)
        .crossJoin(F.broadcast(stats))
        .select("doc_id", F.round(score, 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(20)
    )


@query(
    "collation_group_ci",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN o_orderkey % 2 = 0 THEN upper(o_orderpriority)
                  ELSE lower(o_orderpriority) END AS p
      FROM orders
    )
    SELECT lower(p) AS priority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT p) AS BIGINT) AS n_case_variants
    FROM mixed
    GROUP BY lower(p)
    ORDER BY priority
    """,
)
def collation_group_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collation-aware grouping: a deterministically case-mangled
    priority column groups under UTF8_LCASE so 'URGENT' and 'urgent'
    land in one bucket, while a BINARY countDistinct inside the group
    counts the case variants. The collated comparison runs inside the
    hash aggregate (no lower() materialization on the grouping path);
    the output key is lowercased only for the cross-engine contract —
    DuckDB expresses the same semantics with lower() equivalence."""
    orders = load_table(spark, "orders", sf_dir)
    mixed = orders.select(
        F.when(F.col("o_orderkey") % 2 == 0, F.upper("o_orderpriority"))
        .otherwise(F.lower("o_orderpriority"))
        .alias("p")
    )
    return (
        mixed.groupBy(F.collate(F.col("p"), "UTF8_LCASE").alias("p_ci"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(F.collate(F.col("p"), "UTF8_BINARY")).alias(
                "n_case_variants"
            ),
        )
        .select(
            F.lower(F.col("p_ci")).alias("priority"), "n", "n_case_variants"
        )
        .orderBy("priority")
    )


@query(
    "generator_funcs",
    oracle=r"""
    WITH p AS (
      SELECT p_partkey, regexp_split_to_array(p_name, ' ') AS w, p_brand, p_size
      FROM part WHERE p_partkey < 100
    ),
    words AS (
      SELECT p_partkey, 'word' AS kind,
             CAST(gs.i - 1 AS BIGINT) AS pos, w[CAST(gs.i AS INTEGER)] AS val
      FROM p, LATERAL (SELECT unnest(range(1, len(w) + 1)) AS i) gs
    ),
    attrs AS (
      SELECT p_partkey, 'attr' AS kind,
             CAST(a.i - 1 AS BIGINT) AS pos,
             CASE a.i WHEN 1 THEN p_brand ELSE CAST(p_size AS VARCHAR) END AS val
      FROM p, LATERAL (SELECT unnest([1, 2]) AS i) a
    )
    SELECT * FROM words
    UNION ALL
    SELECT * FROM attrs
    ORDER BY p_partkey, kind, pos
    """,
)
def generator_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator expressions: posexplode (value + ordinal position in
    one generate, no window needed for the index) and stack (N-column
    unpivot without a join). Both run inside Generate operators that
    pipeline with the scan — row expansion never shuffles."""
    part = load_table(spark, "part", sf_dir).filter(F.col("p_partkey") < 100)
    words = part.select(
        "p_partkey",
        F.lit("word").alias("kind"),
        F.posexplode(F.split(F.col("p_name"), " ")),
    ).select(
        "p_partkey", "kind", F.col("pos").cast("bigint").alias("pos"), F.col("col").alias("val")
    )
    attrs = part.select(
        "p_partkey",
        F.lit("attr").alias("kind"),
        F.expr("stack(2, 0L, p_brand, 1L, CAST(p_size AS STRING)) AS (pos, val)"),
    )
    return words.unionByName(attrs).orderBy("p_partkey", "kind", "pos")


@query(
    "sort_global_ranked",
    oracle="""
    SELECT CAST(row_number() OVER (
             ORDER BY l_shipdate, l_orderkey, l_linenumber) AS BIGINT) AS rn,
           l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber
    FROM lineitem
    WHERE l_orderkey < 3000
    ORDER BY rn
    """,
)
def sort_global_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-order global rank (terasort shape) WITHOUT the single-task
    global window: rows range-partition on the sort key, rank locally
    per partition (parallel windows), and a driver-side cumulative sum
    of the 16 partition counts turns local ranks into global ones. The
    result is identical to row_number() over a global ORDER BY — the
    oracle computes exactly that — but every heavy step scales out;
    partition boundaries may vary run to run, the computed rank never
    does (the total order is unique: shipdate, orderkey, linenumber)."""
    from pyspark.sql import Window

    li = (
        load_table(spark, "lineitem", sf_dir)
        .filter(F.col("l_orderkey") < 3000)
        .select(
            "l_shipdate",
            "l_orderkey",
            F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
        )
    )
    ranged = li.repartitionByRange(
        16, "l_shipdate", "l_orderkey", "l_linenumber"
    ).withColumn("pid", F.spark_partition_id())
    w = Window.partitionBy("pid").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    local = ranged.withColumn("lrn", F.row_number().over(w)).persist()
    counts = sorted(
        (r.pid, r.n)
        for r in local.groupBy("pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, acc = {}, 0
    for pid, n in counts:
        offsets[pid] = acc
        acc += n
    from log2sql_spark.localrel import values_df

    off_df = values_df(
        spark, [(pid, off) for pid, off in offsets.items()], "pid int, off bigint"
    )
    return (
        local.join(F.broadcast(off_df), "pid")
        .select(
            (F.col("lrn") + F.col("off")).cast("bigint").alias("rn"),
            "l_orderkey",
            "l_linenumber",
        )
        .orderBy("rn")
    )


@query(
    "search_phrase_adjacent",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0) AS w
      FROM documents
    ),
    hits AS (
      SELECT doc_id,
             CAST(coalesce(list_sum(list_transform(
               generate_series(1, len(w) - 1),
               i -> CASE WHEN w[i] = 'table' AND w[i + 1] = 'part'
                         THEN 1 ELSE 0 END)), 0) AS BIGINT) AS n_hits
      FROM t
      WHERE len(w) >= 2
    )
    SELECT doc_id, n_hits FROM hits WHERE n_hits > 0 ORDER BY doc_id
    """,
)
def search_phrase_adjacent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search ("table part") via positional adjacency.

    A naive positional-index implementation posexplodes tokens and
    self-joins on (doc_id, pos+1) — a shuffle join whose left side is
    the entire token stream. This one folds the adjacency count inside
    the token ARRAY per document so the scan stays map-only: zero
    shuffle, zero explode. The pairing is zip_with over the array and
    its 1-shifted slice (each input evaluated ONCE — indexing the array
    expression per position would re-tokenize the document per element,
    the O(n²) trap; measured 80 s -> ~1 s at sf1), on a token column
    materialized first for the same reason. At 100 TB that is the
    difference between a token-stream shuffle and a plain scan."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    docs = docs.withColumn(
        "_w", F.filter(F.split("text", r"\s+"), lambda x: F.length(x) > 0)
    )
    w = F.col("_w")
    pairs = F.zip_with(
        w,
        F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0))),
        lambda a, b: F.when((a == "table") & (b == "part"), 1).otherwise(0),
    )
    n_hits = F.aggregate(pairs, F.lit(0).cast("long"), lambda acc, x: acc + x)
    return (
        docs.filter(F.size(w) >= 2)
        .select("doc_id", n_hits.alias("n_hits"))
        .filter(F.col("n_hits") > 0)
        .orderBy("doc_id")
    )


@query(
    "search_regex_trigram",
    oracle=r"""
    WITH cand AS (
      SELECT doc_id AS id, text
      FROM documents
      WHERE contains(text, 'slow') AND contains(text, 'table')
    )
    SELECT id,
           CAST(len(regexp_extract_all(text, 'slow (\w+) table')) AS BIGINT)
             AS n_matches
    FROM cand
    WHERE len(regexp_extract_all(text, 'slow (\w+) table')) > 0
    ORDER BY id
    """,
)
def search_regex_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal-prefiltered regex search — the trigram-index pattern
    every production regex scan uses (pg_trgm, Lucene/ES wildcard,
    Google Code Search): factor the pattern's REQUIRED literals out of
    the regex ('slow ... table' must both appear for 'slow (\\w+)
    table' to match), screen with cheap JVM ``contains`` first, and
    run the regex engine only on the survivors. The prefilter is
    whole-stage-codegen substring search (vectorizable, pushes into
    the scan); the regex — orders of magnitude slower per byte — sees
    only candidate documents. At 100 TB this is the difference between
    a regex over every byte and a regex over the contains-selected
    slice; with a real inverted trigram index the screen becomes a
    posting-list intersection, but the two-phase plan is identical.

    The oracle runs the SAME two phases in DuckDB — the screen is a
    correctness-neutral narrowing (contains is implied by the match),
    so both engines' final (id, n_matches) agree exactly; Java and
    DuckDB (RE2) regex semantics coincide on this \\w-and-space
    pattern, and both count non-overlapping matches left-to-right.

    Reference analog: row filtering (log2sql.py:59-61) generalized to
    pattern search; extension surface SURVEY.md §2.2.
    """
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    cand = docs.filter(
        F.col("text").contains("slow") & F.col("text").contains("table")
    )
    n = F.regexp_count(F.col("text"), F.lit(r"slow (\w+) table")).cast("long")
    return (
        cand.select(F.col("doc_id").alias("id"), n.alias("n_matches"))
        .filter(F.col("n_matches") > 0)
        .orderBy("id")
    )


@query(
    "search_inverted_index_phrase",
    oracle=r"""
    WITH tp AS (
      SELECT doc_id,
             CAST(i AS BIGINT) AS pos,
             regexp_split_to_array(trim(text), '\s+')[CAST(i AS INTEGER)] AS tok
      FROM (
        SELECT doc_id, text,
               unnest(range(1, len(regexp_split_to_array(trim(text), '\s+')) + 1))
                 AS i
        FROM documents
      )
    )
    SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM tp a JOIN tp b
      ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    WHERE a.tok = 'merge' AND b.tok = 'batch'
    GROUP BY a.doc_id
    ORDER BY a.doc_id
    """,
)
def search_inverted_index_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase search THROUGH a persisted inverted index — the indexed
    twin of search_phrase_adjacent (which folds the phrase test into a
    full corpus scan): positional postings are built ONCE into a
    token-clustered snapshot store, and the probe reads only the files
    whose [min, max] token range can hold the phrase's terms
    (read_pruned manifest skipping — same index-as-a-table pattern as
    llm_ann_indexed). Postings are SEGMENTED (token × 1000-doc bucket)
    Lucene-style, so no row ever holds a corpus-wide list: segment rows
    stay bounded at any corpus size and the probe's explode+adjacency
    join is proportional to the probed terms' postings, never the
    corpus. The oracle recomputes the phrase match straight from the
    documents — the index round-trip is semantically invisible."""
    from log2sql_spark.scratch import scratch_dir
    from log2sql_spark.store import SnapshotStore

    def build():
        store = SnapshotStore(scratch_dir("log2sql_invidx_"))
        docs = load_table(spark, "documents", sf_dir)
        tp = docs.select(
            "doc_id",
            F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos0", "tok"),
        ).select(
            "doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "tok"
        )
        postings = (
            tp.withColumn("seg", (F.col("doc_id") / 1000).cast("long"))
            .groupBy("tok", "seg")
            .agg(
                F.sort_array(
                    F.collect_list(F.struct("doc_id", "pos"))
                ).alias("posts")
            )
        )
        store.commit(postings, mode="overwrite", cluster_by="tok", target_files=16)
        return store

    from log2sql_spark.queries.table_format import _cached_build

    store = _cached_build("inverted_index", sf_dir, build)
    terms = ["merge", "batch"]
    probe = (
        store.read_pruned(spark, terms)
        .filter(F.col("tok").isin(terms))
        .select("tok", F.explode("posts").alias("p"))
        .select("tok", F.col("p.doc_id").alias("doc_id"), F.col("p.pos").alias("pos"))
    )
    a = probe.filter(F.col("tok") == "merge").alias("a")
    b = probe.filter(F.col("tok") == "batch").alias("b")
    return (
        a.join(
            b,
            (F.col("b.doc_id") == F.col("a.doc_id"))
            & (F.col("b.pos") == F.col("a.pos") + 1),
        )
        .groupBy(F.col("a.doc_id").alias("doc_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .orderBy("doc_id")
    )


_RAKE_STOPS = "'the','a','of','and','to','in','is','it','for','on'"


@query(
    "search_rake_keyphrases",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, i AS pos,
             regexp_split_to_array(lower(trim(text)), '\s+')[CAST(i AS INTEGER)]
               AS tok
      FROM (
        SELECT doc_id, text,
               unnest(range(1,
                 len(regexp_split_to_array(trim(text), '\s+')) + 1)) AS i
        FROM documents WHERE doc_id < 100
      )
    ), marked AS (
      SELECT doc_id, pos, tok, tok IN ({_RAKE_STOPS}) AS stop,
             CAST(sum(CASE WHEN tok IN ({_RAKE_STOPS}) THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS phrase_id
      FROM toks
    ), phrase_toks AS (
      SELECT doc_id, phrase_id, pos, tok FROM marked WHERE NOT stop
    ), phrases AS (
      SELECT doc_id, phrase_id,
             string_agg(tok, ' ' ORDER BY pos) AS phrase,
             CAST(count(*) AS BIGINT) AS plen
      FROM phrase_toks GROUP BY doc_id, phrase_id
    ), wstats AS (
      SELECT pt.doc_id, pt.tok,
             CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(p.plen) AS BIGINT) AS deg
      FROM phrase_toks pt
      JOIN phrases p USING (doc_id, phrase_id)
      GROUP BY pt.doc_id, pt.tok
    ), scored AS (
      SELECT p.doc_id, p.phrase_id, p.phrase,
             CAST(sum(1000 * w.deg // w.freq) AS BIGINT) AS score_milli
      FROM phrase_toks pt
      JOIN phrases p USING (doc_id, phrase_id)
      JOIN wstats w ON w.doc_id = pt.doc_id AND w.tok = pt.tok
      GROUP BY p.doc_id, p.phrase_id, p.phrase
    ), ranked AS (
      SELECT doc_id, phrase, score_milli,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score_milli DESC, phrase) AS rank
      FROM scored
    )
    SELECT doc_id, CAST(rank AS BIGINT) AS rank, phrase, score_milli
    FROM ranked WHERE rank <= 3
    ORDER BY doc_id, rank
    """,
)
def search_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010) — the unsupervised
    keyword stage of document tagging/indexing pipelines: candidate
    phrases are maximal stopword-free token runs (the classic
    gaps-and-islands segmentation — phrase id = running stopword
    count), each word scores degree/frequency over the doc's phrases,
    a phrase scores the sum of its words, top-3 per doc. Integer
    discipline: word scores truncate to milli before summing (a
    documented deviation from float RAKE that makes both engines hash
    the phrase ranking exactly, ties broken lexicographically). Every
    stage is per-doc bounded: one window orders tokens within the doc,
    the stats and scoring joins key on (doc, token)/(doc, phrase) —
    nothing global ever shuffles more than token counts. Reference
    analog: none — text-analysis extension (SURVEY.md §2.2)."""
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 100)
    stops = [s.strip("'") for s in _RAKE_STOPS.split(",")]
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim("text")), r"\s+")).alias(
            "pos0", "tok"
        ),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = toks.select(
        "doc_id",
        "pos",
        "tok",
        F.col("tok").isin(stops).alias("stop"),
        F.sum(F.col("tok").isin(stops).cast("int")).over(w).cast("long").alias(
            "phrase_id"
        ),
    )
    phrase_toks = marked.filter(~F.col("stop")).select(
        "doc_id", "phrase_id", "pos", "tok"
    )
    phrases = phrase_toks.groupBy("doc_id", "phrase_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                lambda r: r.tok,
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).cast("long").alias("plen"),
    )
    wstats = (
        phrase_toks.join(phrases, ["doc_id", "phrase_id"])
        .groupBy("doc_id", "tok")
        .agg(
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum("plen").cast("long").alias("deg"),
        )
    )
    scored = (
        phrase_toks.join(phrases, ["doc_id", "phrase_id"])
        .join(wstats, ["doc_id", "tok"])
        .groupBy("doc_id", "phrase_id", "phrase")
        .agg(
            F.sum(F.expr("1000 * deg DIV freq")).cast("long").alias("score_milli")
        )
    )
    wr = Window.partitionBy("doc_id").orderBy(
        F.desc("score_milli"), F.asc("phrase")
    )
    return (
        scored.withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter("rank <= 3")
        .select("doc_id", "rank", "phrase", "score_milli")
        .orderBy("doc_id", "rank")
    )
