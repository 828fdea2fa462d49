"""Text analysis operators: stats/quality, language-ID, token counting,
document fingerprinting (north-star family, SURVEY.md §2.2).

All pure JVM expressions over the documents table; every formula is
reproducible in ANSI SQL so each operator carries a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from log2sql_spark.operators.dedup import md5_long, tokens

# Tiny built-in stopword lists for the heuristic scorers (public common
# words; deliberately small — the operator shape matters, not the lexicon).
EN_STOP = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]
ES_STOP = ["el", "la", "de", "los", "las", "un", "una", "y", "en", "que"]

_PUNCT = r"[.,!?;:]"


def with_text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / token / punctuation / stopword statistics + a quality
    score in [0,1] (the usual pretraining-filter features)."""
    t = F.col(text_col)
    toks = tokens(t)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    punct = n_chars - F.length(F.regexp_replace(t, _PUNCT, ""))
    stop_hits = F.size(F.filter(toks, lambda x: F.lower(x).isin(*EN_STOP)))
    return (
        docs.withColumn("n_chars_calc", n_chars.cast("long"))
        .withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn("n_distinct_tokens", n_distinct.cast("long"))
        # try_divide: an empty document (0 chars) yields NULL ratios
        # instead of an ANSI DIVIDE_BY_ZERO job abort; DuckDB division
        # by zero is NULL too, so the oracle agrees row-for-row.
        .withColumn("type_token_ratio", F.try_divide(n_distinct, n_tokens))
        .withColumn("punct_ratio", F.try_divide(punct, n_chars))
        .withColumn("stopword_ratio", F.try_divide(stop_hits, n_tokens))
        .withColumn("avg_token_len", F.try_divide(n_chars - (n_tokens - 1), n_tokens))
        .withColumn(
            "quality_score",
            F.least(
                F.lit(1.0),
                (n_distinct / n_tokens) * 0.5
                + F.least(F.lit(1.0), n_tokens / F.lit(100.0)) * 0.5,
            ),
        )
    )


def token_count_bpe_ish(text_col: Column) -> Column:
    """Whitespace tokens + a BPE-ish subword estimate: a word of length L
    costs ceil(L/4) subword tokens (the usual ~4-chars-per-token rule)."""
    toks = tokens(text_col)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("long"),
    )


def with_token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("n_ws_tokens", F.size(tokens(F.col(text_col))).cast("long")).withColumn(
        "n_bpe_tokens", token_count_bpe_ish(F.col(text_col))
    )


def with_lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: CJK character share → zh; else the larger
    of the en/es stopword hit counts (ties → en)."""
    t = F.col(text_col)
    toks = tokens(t)
    cjk = F.length(t) - F.length(F.regexp_replace(t, r"[一-鿿]", ""))
    en_hits = F.size(F.filter(toks, lambda x: F.lower(x).isin(*EN_STOP)))
    es_hits = F.size(F.filter(toks, lambda x: F.lower(x).isin(*ES_STOP)))
    return (
        docs.withColumn("cjk_chars", cjk.cast("long"))
        .withColumn("en_hits", en_hits.cast("long"))
        .withColumn("es_hits", es_hits.cast("long"))
        .withColumn(
            "lang_pred",
            F.when(cjk * 10 > F.length(t), F.lit("zh"))
            .when(es_hits > en_hits, F.lit("es"))
            .otherwise(F.lit("en")),
        )
    )


def unigram_logprob_scores(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus-unigram language-model score per document: mean ln P(w)
    under the corpus's own token distribution — the cheap perplexity
    proxy used to rank text quality at pretraining scale.

    Two aggregates + one broadcast join: the vocabulary (small by Zipf)
    broadcasts to the token stream; nothing quadratic. The corpus token
    total rides along as a broadcast 1-row aggregate cross-joined into
    the plan — a driver-side ``toks.count()`` here would run a separate
    eager job per invocation and break plan laziness."""
    toks = docs.select(F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("tok"))
    total = toks.agg(F.count("*").cast("double").alias("_total_toks"))
    vocab = toks.groupBy("tok").agg(F.count("*").alias("tf"))
    return (
        toks.join(F.broadcast(vocab), "tok")
        .crossJoin(F.broadcast(total))
        .withColumn("logp", F.log(F.col("tf") / F.col("_total_toks")))
        .groupBy("id")
        .agg(
            F.round(F.avg("logp"), 6).alias("mean_logprob"),
            F.count("*").alias("n_tokens"),
        )
    )


def with_fingerprints(
    docs: DataFrame, k: int = 8, window: int = 4, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Winnowing fingerprints: hash every character k-gram, take the min
    hash of each sliding window of ``window`` consecutive gram hashes,
    and keep the distinct mins. Returns (id, n_fingerprints, min_fp).

    The classic local document fingerprint (Schleimer et al., MOSS):
    guarantees any shared substring of length ≥ k+window-1 contributes a
    shared fingerprint."""
    t = F.col(text_col)
    # t is a plain attribute, so substr-per-element is O(1) — safe in a
    # lambda. The window minima below must NOT index `hashes` inside a
    # lambda (Spark re-evaluates the array per element — O(n²) md5s);
    # instead fold pairwise minima over shifted slices (zip_with
    # evaluates each input once, log2(window) levels).
    # Guard: sequence(1, n) with n < 1 generates a DESCENDING sequence
    # (1, 0, …, n) — texts shorter than k must yield no grams instead.
    gram_positions = F.when(
        F.length(t) >= k, F.sequence(F.lit(1), F.length(t) - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(gram_positions, lambda i: t.substr(i, F.lit(k)))
    hashes = F.transform(grams, md5_long)
    assert window == 4, "window sizes other than 4 need a generalized fold"
    n = F.size(hashes)
    pair_min = F.zip_with(
        hashes,
        F.slice(hashes, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.least(a, b),
    )
    quad_min = F.zip_with(
        pair_min,
        F.slice(pair_min, 3, F.greatest(n - 2, F.lit(0))),
        lambda a, b: F.least(a, b),
    )
    fps = F.array_distinct(F.slice(quad_min, 1, F.greatest(n - (window - 1), F.lit(0))))
    return docs.select(
        F.col(id_col).alias("id"),
        F.size(fps).cast("long").alias("n_fingerprints"),
        F.array_min(fps).alias("min_fp"),
    )


# Gopher rules (Rae et al. 2021, "Scaling Language Models: ... Gopher",
# Appendix A1.1): the word-level and line-level document-quality
# heuristics most pretraining pipelines start from. Thresholds are the
# published ones; the STOP list is Gopher's 8-word "must contain >=2"
# set. All pure JVM array expressions — no shuffle, no Python.
GOPHER_STOP = ["the", "be", "to", "of", "and", "that", "have", "with"]


def _words(t: Column) -> Column:
    return F.filter(F.split(t, r"\s+"), lambda w: F.length(w) > 0)


def with_gopher_rules(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append Gopher quality-rule metrics + the pass/fail verdict.

    Integer metrics only (counts, not ratios) so the verdict is exact
    cross-engine: each threshold is evaluated by integer
    cross-multiplication (e.g. mean word length in [3,10] becomes
    ``3*n_words <= sum_word_chars <= 10*n_words``), never by comparing
    floats. Word rules vary on any corpus; the line rules (bullet /
    ellipsis ratios) need multi-line text and are exercised on crafted
    fixtures in tests/test_llm_ops.py as well as here.
    """
    # Materialize the token/line arrays as real columns FIRST: every
    # metric below references them several times, and referencing the
    # raw split/filter EXPRESSION would re-tokenize the document once
    # per metric (and once per lambda element inside aggregates — the
    # O(n²) hazard the fingerprint fold below documents). A plain
    # attribute is evaluated once per row.
    docs = docs.withColumn(
        "_w", _words(F.col(text_col))
    ).withColumn(
        "_ln", F.filter(F.split(F.col(text_col), r"\n"), lambda l: F.length(l) > 0)
    )
    words = F.col("_w")
    lines = F.col("_ln")
    n_words = F.size(words).cast("long")
    sum_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_alpha = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    ).cast("long")
    n_stop = F.size(
        F.array_intersect(F.array_distinct(words), F.array(*[F.lit(s) for s in GOPHER_STOP]))
    ).cast("long")
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(
        F.filter(lines, lambda l: l.startswith("- ") | l.startswith("* "))
    ).cast("long")
    n_ellipsis = F.size(F.filter(lines, lambda l: l.endswith("..."))).cast("long")
    passes = (
        n_words.between(50, 100000)
        & (sum_chars >= 3 * n_words)
        & (sum_chars <= 10 * n_words)
        # >=80% of words contain an alphabetic character
        & (10 * n_alpha >= 8 * n_words)
        & (n_stop >= 2)
        # <=90% of lines start with a bullet, <=30% end with ellipsis
        & (10 * n_bullet <= 9 * n_lines)
        & (10 * n_ellipsis <= 3 * n_lines)
    )
    return docs.select(
        "*",
        n_words.alias("n_words"),
        sum_chars.alias("sum_word_chars"),
        n_alpha.alias("n_alpha_words"),
        n_stop.alias("n_stop_distinct"),
        n_lines.alias("n_lines"),
        n_bullet.alias("n_bullet_lines"),
        n_ellipsis.alias("n_ellipsis_lines"),
        passes.cast("int").alias("gopher_pass"),
    ).drop("_w", "_ln")


def with_c4_line_stats(
    docs: DataFrame, text_col: str = "text", line_words: int = 12
) -> DataFrame:
    """C4-style line filtering (Raffel et al. 2020 §2.2) restated over
    fixed-width word chunks.

    C4 keeps lines that end in terminal punctuation, have >=5 words and
    no blocklisted content ('{', 'lorem ipsum', 'javascript'), then
    drops documents left with <3 lines. Real corpora carry newlines;
    the synthetic corpus is one line per doc, so the operator first
    re-lines the text into ``line_words``-word chunks — the chunking is
    part of the contract (both engines chunk identically), the rules
    are C4's. Per-line dedup (C4 §2.2 'three-sentence spans') is
    approximated as exact duplicate-chunk counting within the doc.
    Blocklist/punctuation rules are constant-false on the synthetic
    corpus; crafted fixtures in tests/test_llm_ops.py vary them.
    Everything is one JVM projection — no explode, no shuffle.
    """
    # Stage the arrays as real columns: slicing the word array inside
    # the chunk lambda must hit a plain attribute (O(1) per access),
    # not the filter(split(...)) expression — which Spark re-evaluates
    # for EVERY chunk index, turning the chunking O(n²/line_words) per
    # document (measured: 42 s at sf1 before staging, ~2 s after).
    docs = docs.withColumn("_w", _words(F.col(text_col)))
    words = F.col("_w")
    n_chunks = F.ceil(F.size(words) / F.lit(line_words)).cast("int")
    docs = docs.withColumn(
        "_chunks",
        F.filter(
            F.transform(
                F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
                lambda i: F.array_join(
                    F.slice(words, i * line_words + 1, line_words), " "
                ),
            ),
            # guard: empty text -> one empty chunk; drop it
            lambda c: F.length(c) > 0,
        ),
    )
    chunks = F.col("_chunks")
    is_short = lambda c: F.size(F.split(c, " ")) < 5  # noqa: E731
    has_punct = lambda c: c.rlike(r'[.!?"]$')  # noqa: E731
    flagged = lambda c: (  # noqa: E731
        c.contains("{") | c.contains("lorem ipsum") | c.contains("javascript")
    )
    kept = F.filter(chunks, lambda c: ~is_short(c) & ~flagged(c))
    n_lines = F.size(chunks).cast("long")
    return docs.select(
        "*",
        n_lines.alias("n_lines"),
        F.size(F.filter(chunks, is_short)).cast("long").alias("n_short_lines"),
        F.size(F.filter(chunks, has_punct)).cast("long").alias("n_punct_lines"),
        F.size(F.filter(chunks, flagged)).cast("long").alias("n_flagged_lines"),
        (n_lines - F.size(F.array_distinct(chunks))).cast("long").alias("n_dup_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        (F.size(kept) >= 3).cast("int").alias("c4_keep_doc"),
    ).drop("_w", "_chunks")


GOPHER_REP_NS = [2, 3, 4, 5, 10]


def repetition_char_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_words: int = 12,
) -> DataFrame:
    """Gopher repetition filters in their published CHARACTER-fraction
    form (Rae et al. 2021, Table A1) — the complement to
    ``repetition_metrics`` (count fractions) and ``with_gopher_rules``
    (word/line rules).

    Per document, as exact integers:

    - ``n_lines`` / ``dup_lines`` / ``dup_line_chars`` — duplicate-line
      count and the characters in beyond-first occurrences, over the
      same deterministic ``line_words``-word chunks as
      ``with_c4_line_stats`` (the synthetic corpus is one line per doc,
      so the chunking is part of the cross-engine contract).
    - ``top{2,3,4}_chars`` — characters covered by the most frequent
      word n-gram (count × joined length). Ties break by
      (count, length, md5) descending in BOTH engines, so the verdict
      is deterministic.
    - ``dup{5,10}_chars`` — characters in beyond-first occurrences of
      duplicated n-grams, i.e. Σ (count−1)·len over grams with
      count ≥ 2. This is the occurrence-sum form (what Dolma/DataTrove
      compute per gram), not Gopher's positional character-coverage —
      overlapping occurrences are counted per occurrence, a documented
      superset that keeps the metric a pure aggregate.
    - ``rep_pass`` — the Table A1 thresholds (dup-line ≤30%, dup-line
      chars ≤20%, top 2/3/4-gram ≤20/18/16%, dup 5/10-gram ≤15/10% of
      ``length(text)``), each evaluated by integer cross-multiplication
      so the verdict hashes identically cross-engine.

    Plan shape: one explode of per-doc (n, md5, len) structs → ONE
    count aggregate keyed (doc, n, hash) (map-side partial) → per-doc
    rollup. The shuffle carries 16-byte digests and small ints, never
    gram text; every key is doc-bounded, so at 100 TB this scales as a
    map-combine word-count, the cheapest distributed shape there is.
    """
    docs = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    base = docs.select("doc_id", F.length("text").cast("long").alias("text_chars"))
    # Stage the word array as a real column — lambdas below must slice a
    # plain attribute, not the split() expression (the with_c4_line_stats
    # O(n²) lesson: the expression re-tokenizes per element otherwise).
    staged = docs.withColumn("_w", _words(F.col("text")))
    words = F.col("_w")

    n_chunks = F.ceil(F.size(words) / F.lit(line_words)).cast("int")
    lines = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
            lambda i: F.array_join(F.slice(words, i * line_words + 1, line_words), " "),
        ),
        lambda c: F.length(c) > 0,
    )

    def grams(n: int) -> Column:
        # Guard: Spark sequence(1, k) with k < 1 DESCENDS instead of
        # returning empty — short docs must yield an empty gram list.
        return F.when(
            F.size(words) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(words) - n + 1),
                lambda i: F.array_join(F.slice(words, i, n), " "),
            ),
        ).otherwise(F.expr("array()").cast("array<string>"))

    def tagged(n: int, arr: Column) -> Column:
        # An 8-byte hash, not the gram text: the exploded relation is
        # |docs| x ~6 x |words| rows, and the 8-byte hash (vs 32+ byte
        # string) halves both the shuffle width and the partial-agg
        # hash-table entry — the difference between a linear and a
        # spill-bent sf10 curve (measured: 122 s -> linear at 500k docs).
        # xxhash64, not md5_long: the hash is only a grouping key and a
        # (count, glen) tie-break of last resort — every output column is
        # built from c and glen, so any 64-bit hash yields the same
        # result (collisions aside) and xxhash64 is pure codegen while
        # md5 pays a hex-string digest + conv() parse per gram
        # (measured: the per-gram compute dominates this operator's sf10
        # cost).
        return F.transform(
            arr,
            lambda g: F.struct(
                F.lit(n).cast("int").alias("n"),
                F.xxhash64(g).alias("h"),
                F.length(g).cast("long").alias("glen"),
            ),
        )

    all_grams = F.concat(tagged(0, lines), *[tagged(n, grams(n)) for n in GOPHER_REP_NS])
    cnt = (
        staged.select("doc_id", F.explode(all_grams).alias("g"))
        .select("doc_id", "g.n", "g.h", "g.glen")
        .groupBy("doc_id", "n", "h")
        # glen is functionally determined by h; max() is just the legal
        # way to carry it through the aggregate.
        .agg(F.count("*").alias("c"), F.max("glen").alias("glen"))
    )
    per_n = cnt.groupBy("doc_id", "n").agg(
        F.sum("c").alias("total"),
        F.sum(F.col("c") - 1).alias("dupx"),
        F.sum((F.col("c") - 1) * F.col("glen")).alias("dupch"),
        F.max(F.struct("c", "glen", "h")).alias("top"),
    )

    def pick(n: int, col: str) -> Column:
        return F.sum(F.when(F.col("n") == n, F.col(col)))

    per_doc = per_n.select(
        "doc_id", "n", "total", "dupx", "dupch",
        (F.col("top.c") * F.col("top.glen")).alias("topch"),
    ).groupBy("doc_id").agg(
        pick(0, "total").alias("n_lines"),
        pick(0, "dupx").alias("dup_lines"),
        pick(0, "dupch").alias("dup_line_chars"),
        pick(2, "topch").alias("top2_chars"),
        pick(3, "topch").alias("top3_chars"),
        pick(4, "topch").alias("top4_chars"),
        pick(5, "dupch").alias("dup5_chars"),
        pick(10, "dupch").alias("dup10_chars"),
    )

    z = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("long")  # noqa: E731
    metrics = [
        "n_lines", "dup_lines", "dup_line_chars", "top2_chars",
        "top3_chars", "top4_chars", "dup5_chars", "dup10_chars",
    ]
    joined = base.join(per_doc, "doc_id", "left").select(
        "doc_id", "text_chars", *[z(m).alias(m) for m in metrics]
    )
    tc = F.col("text_chars")
    passes = (
        (F.lit(10) * F.col("dup_lines") <= F.lit(3) * F.col("n_lines"))
        & (F.lit(5) * F.col("dup_line_chars") <= tc)
        & (F.lit(5) * F.col("top2_chars") <= tc)
        & (F.lit(50) * F.col("top3_chars") <= F.lit(9) * tc)
        & (F.lit(25) * F.col("top4_chars") <= F.lit(4) * tc)
        & (F.lit(20) * F.col("dup5_chars") <= F.lit(3) * tc)
        & (F.lit(10) * F.col("dup10_chars") <= tc)
    )
    return joined.select("*", passes.cast("int").alias("rep_pass"))


def with_code_prose_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append code-vs-prose detection features + the verdict — the
    curation signal a pretraining mix uses to route documents to a
    code pipeline (different dedup granularity, no stopword gates) or
    drop stray markup from a prose corpus.

    Features are punctuation-structural, not lexical: code-symbol
    density (``;{}()=`` per character, in truncating basis points) and
    the indented-line fraction. The verdict is evaluated by integer
    cross-multiplication (``200*n_symbols >= 3*n_chars`` is the exact
    integer form of ``symbol_bp >= 150``; ``10*n_indent >= 3*n_lines``
    of a 30% indent fraction) so it hashes identically cross-engine —
    the same discipline as with_gopher_rules. One JVM projection per
    document: at 100 TB this is a map-only codegen scan, no shuffle,
    no Python.
    """
    t = F.col(text_col)
    # Stage the line array as a real column: each line metric below
    # must reference a plain attribute, not re-split the document
    # (the with_c4_line_stats O(n²) lesson).
    docs = docs.withColumn(
        "_cl", F.filter(F.split(t, r"\n"), lambda l: F.length(l) > 0)
    )
    lines = F.col("_cl")
    n_chars = F.length(t).cast("long")
    n_symbols = F.regexp_count(t, F.lit(r"[;{}()=]")).cast("long")
    n_lines = F.size(lines).cast("long")
    # an indented line must carry content: a run of spaces alone (e.g.
    # a whitespace-only document) is not evidence of code structure
    n_indent = F.size(
        F.filter(lines, lambda l: l.startswith("  ") & (F.length(F.trim(l)) > 0))
    ).cast("long")
    # greatest(..., 1): an empty document satisfies 0 >= 0 for both
    # cross-multiplied rules — it must classify as prose, not code
    is_code = (200 * n_symbols >= F.greatest(3 * n_chars, F.lit(1))) | (
        10 * n_indent >= F.greatest(3 * n_lines, F.lit(1))
    )
    return (
        docs.select(
            "*",
            n_chars.alias("n_chars"),
            n_symbols.alias("n_symbols"),
            n_lines.alias("n_lines"),
            n_indent.alias("n_indent_lines"),
            is_code.cast("int").alias("is_code"),
        )
        # integer DIV on the staged counts — exact, never a truncated
        # double that could round across an integer boundary
        .withColumn(
            "symbol_bp", F.expr("n_symbols * 10000 DIV greatest(n_chars, 1)")
        )
        .drop("_cl")
    )


def nb_source_scores(
    docs: DataFrame,
    label_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    test_mod: int = 5,
) -> DataFrame:
    """Multinomial Naive Bayes text classifier — the model-based quality/
    source filter stage of a pretraining pipeline (the fastText-style
    classifier of C4/CCNet, restated as pure counting so training is ONE
    distributed aggregate and bit-reproducible).

    Train on docs where ``id % test_mod != 0``; score the held-out rest.
    Add-1 smoothing over the training vocabulary; unseen tokens score
    ``1/(T_l+V)``. Scores are rounded to 6 dp BEFORE the argmax (ties
    then break on label asc) so the predicted label is deterministic
    cross-engine despite float log sums.

    Scale shape: training is a (label, tok) count aggregate (map-side
    combined, |vocab|x|labels| output, never documents); scoring
    explodes held-out tokens once, broadcast-crosses the |labels|-row
    stats dim, joins counts on (tok, label), and aggregates per
    (doc, label). No driver loops, no collect — both "train" and
    "predict" are plain Spark plans, so the classifier scales with the
    corpus like any other aggregate.
    """
    from pyspark.sql import Window as W

    base = docs.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("label"),
        tokens(F.col(text_col)).alias("toks"),
    )
    train = base.filter(F.col("id") % test_mod != 0)
    test = base.filter(F.col("id") % test_mod == 0)

    ttok = train.select("label", F.explode("toks").alias("tok"))
    # ONE pass over the exploded training tokens; every other statistic
    # (per-label totals, vocab size) derives from this |vocab|x|labels|
    # table, so the explode+aggregate runs once, not four times.
    counts = ttok.groupBy("label", "tok").agg(F.count("*").alias("c"))
    ltot = counts.groupBy("label").agg(F.sum("c").alias("t"))
    vocab = counts.agg(F.count_distinct("tok").alias("v"))
    prior = train.groupBy("label").agg(F.count("*").alias("d"))
    n_tr = prior.agg(F.sum("d").alias("n_train"))
    labels = (
        ltot.join(prior, "label")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(n_tr))
        .select(F.col("label").alias("cand"), "t", "d", "v", "n_train")
    )

    stok = test.select(
        "id", F.col("label").alias("actual"), F.explode("toks").alias("tok")
    )
    cand = stok.crossJoin(F.broadcast(labels))
    joined = cand.join(
        counts.select(F.col("label").alias("cand"), "tok", "c"),
        ["cand", "tok"],
        "left",
    )
    scored = joined.groupBy("id", "actual", "cand", "t", "d", "v", "n_train").agg(
        F.sum(
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1.0))
                / (F.col("t") + F.col("v"))
            )
        ).alias("tok_ll")
    )
    w = W.partitionBy("id").orderBy(F.desc("score"), F.asc("cand"))
    return (
        scored.withColumn(
            "score",
            F.round(
                F.col("tok_ll")
                + F.log(F.col("d") / F.col("n_train").cast("double")),
                6,
            ),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "id",
            F.col("actual").alias("actual_source"),
            F.col("cand").alias("pred_source"),
            "score",
            (F.col("cand") == F.col("actual")).alias("is_correct"),
        )
    )
