"""Training-data pipeline operators: repetition metrics, contamination
checks, PII redaction, deterministic splits, boilerplate removal
(north-star family, SURVEY.md §2.2 — the corpus-curation stages between
raw crawl and tokenizer).

Scale design (100 TB corpus, 1000 executors):

* per-document metrics are pure JVM array/regex expressions — no
  shuffle, no Python, whole-stage codegen;
* corpus-level structures (gram document frequencies, eval-set grams)
  are explode → groupBy with map-side partial aggregation, keyed on the
  gram value — bounded-width keys, never document payloads;
* small derived sets (eval-set grams, boilerplate grams: tiny by
  construction — eval sets are curated, boilerplate is the df tail) are
  ``broadcast()`` back against the corpus, so the expensive side is one
  scan + one hash probe per gram, shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from log2sql_spark.operators.dedup import md5_long, tokens, word_ngrams


def word_ngrams_all(col: Column, n: int = 2) -> Column:
    """Word n-grams in document order, duplicates preserved (the
    repetition-metric denominator; :func:`word_ngrams` dedups). Same
    zip_with-over-shifted-slices build — never index a computed array
    inside a HOF lambda (O(n²) re-evaluation)."""
    toks = tokens(col)
    grams = toks
    for j in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, j + 1, F.greatest(F.size(toks) - j, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.slice(grams, 1, F.greatest(F.size(toks) - (n - 1), F.lit(0)))


def repetition_metrics(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition filters: fraction of tokens covered by
    the most frequent word, and duplicate 2-/3-gram fractions.

    The n-gram fractions are in-row array expressions (zero shuffle).
    The top-word count is explode → two-level groupBy — both aggregates
    partial map-side, keys are (doc_id, word) then doc_id, so the
    shuffle carries counts, not text."""
    t = F.col(text_col)
    w = tokens(t)
    g2, g3 = word_ngrams_all(t, 2), word_ngrams_all(t, 3)
    per_row = docs.select(
        F.col(id_col).alias("id"),
        F.size(w).cast("long").alias("n_words"),
        F.size(F.array_distinct(w)).cast("long").alias("n_distinct_words"),
        F.size(g2).cast("long").alias("n_2grams"),
        (F.size(g2) - F.size(F.array_distinct(g2))).cast("long").alias("n_dup_2grams"),
        F.size(g3).cast("long").alias("n_3grams"),
        (F.size(g3) - F.size(F.array_distinct(g3))).cast("long").alias("n_dup_3grams"),
    )
    top = (
        docs.select(F.col(id_col).alias("id"), F.explode(tokens(t)).alias("tok"))
        .groupBy("id", "tok")
        .agg(F.count("*").alias("cnt"))
        .groupBy("id")
        .agg(F.max("cnt").cast("long").alias("top_word_count"))
    )
    return (
        # left join: a NULL-text doc explodes to zero token rows and has
        # no `top` entry — it must surface with NULL metrics, not vanish.
        per_row.join(top, "id", "left")
        # try_divide: a doc shorter than n words has zero n-grams, and the
        # fraction is NULL, not an ANSI divide-by-zero error.
        .withColumn("top_word_frac", F.try_divide("top_word_count", "n_words"))
        .withColumn("dup_2gram_frac", F.try_divide("n_dup_2grams", "n_2grams"))
        .withColumn("dup_3gram_frac", F.try_divide("n_dup_3grams", "n_3grams"))
    )


def contamination_check(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train/eval n-gram contamination: per train doc, how many of its
    distinct word n-grams appear anywhere in the eval set.

    The eval gram set is distinct-ed and ``broadcast()`` (eval suites
    are small by construction); the train side is one explode + hash
    probe + per-doc count — no shuffle touches train text beyond the
    gram stream, and the probe prunes it to matches immediately.

    Both inputs are spread across the full parallelism first when they
    arrive under-partitioned (a small compressed corpus file otherwise
    pins the gram explode to 1-2 cores — the sf1 sweep's finding on
    every gram-heavy operator)."""
    par = train.sparkSession.sparkContext.defaultParallelism
    if train.rdd.getNumPartitions() < par:
        train = train.repartition(par)
    if eval_docs.rdd.getNumPartitions() < par:
        eval_docs = eval_docs.repartition(par)
    grams = word_ngrams(F.col(text_col), n)
    eval_grams = (
        eval_docs.select(F.explode(word_ngrams(F.col(text_col), n)).alias("gram"))
        .distinct()
    )
    shared = (
        train.select(F.col(id_col).alias("id"), F.explode(grams).alias("gram"))
        .join(F.broadcast(eval_grams), "gram")
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("n_shared_grams"))
    )
    base = train.select(
        F.col(id_col).alias("id"), F.size(grams).cast("long").alias("n_grams")
    )
    return (
        base.join(shared, "id", "left")
        .withColumn("n_shared_grams", F.coalesce("n_shared_grams", F.lit(0)).cast("long"))
        # integer comparison, no float threshold: contaminated iff ≥5%
        # of the doc's distinct grams appear in the eval set.
        .withColumn(
            "contaminated", (F.col("n_shared_grams") * 20 >= F.col("n_grams")).cast("int")
        )
        .withColumn("shared_frac", F.try_divide("n_shared_grams", "n_grams"))
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"555-[0-9]{4}"
_IP_RE = r"10\.[0-9]+\.[0-9]+\.[0-9]+"


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrub: count and redact emails / phone numbers / IPv4
    addresses. Pure JVM regex expressions (codegen'd, no UDF) — the
    patterns are deliberately RE2-compatible so the oracle runs the
    identical regexes."""
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(_EMAIL_RE), 0))
    n_phones = F.size(F.regexp_extract_all(t, F.lit(_PHONE_RE), 0))
    n_ips = F.size(F.regexp_extract_all(t, F.lit(_IP_RE), 0))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ),
        _IP_RE,
        "<IP>",
    )
    return (
        docs.withColumn("n_emails", n_emails.cast("long"))
        .withColumn("n_phones", n_phones.cast("long"))
        .withColumn("n_ips", n_ips.cast("long"))
        .withColumn("redacted_len", F.length(redacted).cast("long"))
        .withColumn("redacted_md5", F.md5(redacted))
    )


def split_assign(docs: DataFrame, id_col: str = "doc_id", salt: str = "split-v1") -> Column:
    """Deterministic train/val/test assignment: 60-bit md5 of the id +
    salt, bucketed mod 100 → 90/5/5. Hash-based (not random) so the
    assignment is stable across runs, engines, and repartitioning — the
    property a reproducible data pipeline needs."""
    bucket = md5_long(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))) % 100
    return (
        F.when(bucket < 90, F.lit("train"))
        .when(bucket < 95, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def boilerplate_gram_flags(
    docs: DataFrame,
    min_df: int = 10,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-boilerplate detection: word n-grams occurring in ≥min_df
    distinct documents are boilerplate (headers/footers/licenses at
    crawl scale); per doc, count how many of its grams are boilerplate.

    Document frequency is explode(distinct grams) → groupBy(gram) with
    map-side combine; the boilerplate set (the df≥K tail — small by
    Zipf) broadcasts back. Same shape at 100 TB: the only shuffle is
    gram→count, bounded by vocabulary, not corpus size."""
    grams = word_ngrams(F.col(text_col), n)
    exploded = docs.select(F.col(id_col).alias("id"), F.explode(grams).alias("gram"))
    df_counts = exploded.groupBy("gram").agg(F.count("*").alias("df"))
    boiler = df_counts.filter(F.col("df") >= min_df).select("gram")
    n_boiler = (
        exploded.join(F.broadcast(boiler), "gram")
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("n_boiler_grams"))
    )
    base = docs.select(F.col(id_col).alias("id"), F.size(grams).cast("long").alias("n_grams"))
    return (
        base.join(n_boiler, "id", "left")
        .withColumn("n_boiler_grams", F.coalesce("n_boiler_grams", F.lit(0)).cast("long"))
        .withColumn("boiler_frac", F.try_divide("n_boiler_grams", "n_grams"))
    )


def embedding_normalize_features(vecs: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """L2 normalization audit columns: norm plus first/summed normalized
    components. Sequential HOF fold keeps the summation order identical
    to the SQL oracle's list_sum (bit-identical doubles); everything is
    per-row JVM expression — zero shuffle at any scale."""
    ed = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    vecs = vecs.select("vec_id", ed.alias("ed"))
    sumsq = F.aggregate("ed", F.lit(0.0), lambda acc, x: acc + x * x)
    vecs = vecs.withColumn("l2_norm", F.sqrt(sumsq))
    return vecs.select(
        "vec_id",
        "l2_norm",
        (F.element_at("ed", 1) / F.col("l2_norm")).alias("c0_normalized"),
        (F.aggregate("ed", F.lit(0.0), lambda acc, x: acc + x) / F.col("l2_norm")).alias(
            "sum_normalized"
        ),
    )


def embedding_quantize_features(vecs: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Symmetric int8 quantization (scale = max|x|/127) with integer
    audit outputs (sum/min/max/zero-count of the quantized codes — exact
    on any engine). Rounding is ``floor(x/scale + 0.5)``, not round():
    round() is decimal-repr half-up on Spark but binary on DuckDB, while
    floor is bit-deterministic on identical doubles.

    ``scale`` is materialized as a column BEFORE the quantizing lambda:
    referencing a computed expression inside a HOF lambda re-evaluates
    it per element (no CSE in HOFs) — O(d²) per row."""
    ed = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = vecs.select("vec_id", ed.alias("ed")).withColumn(
        "scale", F.array_max(F.transform("ed", F.abs)) / F.lit(127.0)
    )
    q = F.transform("ed", lambda x: F.floor(x / F.col("scale") + F.lit(0.5)).cast("int"))
    base = base.withColumn("q", q)
    return base.select(
        "vec_id",
        "scale",
        F.element_at("q", 1).alias("q0"),
        F.aggregate("q", F.lit(0).cast("long"), lambda acc, x: acc + x).alias("sum_q"),
        F.array_min("q").alias("min_q"),
        F.array_max("q").alias("max_q"),
        F.size(F.filter("q", lambda x: x == 0)).cast("long").alias("n_zero"),
    )


def pack_sequences(
    docs: DataFrame,
    context_len: int = 2048,
    part_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sequence packing for pretraining: documents are laid end-to-end
    in id order within a partition column (here language; in production
    a shard key) and assigned to the context window their first token
    lands in — ``bin = start_offset DIV context_len``.

    The cumulative sum is a PARTITIONED window (one per shard), so
    packing parallelizes across shards instead of serializing the whole
    corpus through a single global ordering — the 100 TB-safe form of
    the greedy packer."""
    from pyspark.sql import Window as W

    tok = F.size(tokens(F.col(text_col))).cast("long")
    w = W.partitionBy("part").orderBy("id").rowsBetween(W.unboundedPreceding, 0)
    laid = docs.select(
        F.col(part_col).alias("part"), F.col(id_col).alias("id"), tok.alias("n_tok")
    ).withColumn("cum", F.sum("n_tok").over(w))
    laid = laid.withColumn("bin", F.expr(f"(cum - n_tok) DIV {context_len}"))
    return (
        laid.groupBy("part", "bin")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.min("id").cast("long").alias("first_doc"),
            F.max("id").cast("long").alias("last_doc"),
            (F.sum("n_tok").cast("double") / F.lit(float(context_len))).alias("fill_frac"),
        )
    )


def bpe_train_merges(
    docs: DataFrame,
    n_merges: int = 4,
    text_col: str = "text",
    sample_mod: int | None = None,
    id_col: str = "doc_id",
    sample_salt: str = "bpe-v1",
) -> list[tuple[int, str, int]]:
    """Byte-pair-encoding tokenizer training, distributed: learn
    ``n_merges`` merge rules over the corpus's word occurrences.

    The iterative shape every BPE trainer has — per round, the PAIR
    COUNTING runs distributed (explode adjacent symbol pairs → groupBy
    with map-side combine), and only the single argmax row is collected
    to the driver to form the next merge rule (exactly how MLlib's
    k-means collects centroids per iteration). Symbols are wrapped as
    ``|sym|`` so the merge is one literal ``replace`` — left-to-right
    non-overlapping on both engines, matching greedy BPE scan order.

    **Sample contract** (the 100 TB knob): each merge round re-scans the
    training encodings, so training cost is O(n_merges × corpus). With
    ``sample_mod=m`` the trainer reads only documents where
    ``md5_60bit(id || ':' || sample_salt) % m == 0`` — a deterministic
    ~1/m hash-sample that is stable across engines, runs, and
    repartitioning (the same primitive as ``sample_hash_deterministic``).
    Pair statistics concentrate fast, so a bounded sample learns the
    same head merges; at corpus scale ALWAYS set ``sample_mod`` — the
    full-corpus default is for small/oracle runs only.

    Returns [(round, encoded_pair, count), ...]; ties break on the
    lexicographically smallest pair, so training is deterministic.
    """
    from pyspark.sql import functions as F

    if sample_mod:
        from log2sql_spark.operators.dedup import md5_long

        docs = docs.filter(
            md5_long(
                F.concat(F.col(id_col).cast("string"), F.lit(":" + sample_salt))
            )
            % sample_mod
            == 0
        )
    enc = docs.select(
        F.explode(tokens(F.col(text_col))).alias("word")
    ).select(F.regexp_replace("word", "(.)", r"|$1|").alias("enc"))
    merges: list[tuple[int, str, int]] = []
    enc.persist()
    try:
        for rnd in range(1, n_merges + 1):
            syms = F.split(F.expr("trim(BOTH '|' FROM enc)"), r"\|\|")
            pairs = enc.select(
                F.explode(
                    F.zip_with(
                        syms,
                        F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
                        lambda a, b: F.concat(F.lit("|"), a, F.lit("||"), b, F.lit("|")),
                    )
                ).alias("pair")
            ).filter(~F.col("pair").contains("|||"))  # drop the null-padded tail
            top = (
                pairs.groupBy("pair")
                .agg(F.count("*").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("pair"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            pair, cnt = top[0]["pair"], int(top[0]["cnt"])
            merges.append((rnd, pair, cnt))
            merged = pair.replace("||", "")
            new_enc = enc.select(F.replace("enc", F.lit(pair), F.lit(merged)).alias("enc"))
            # materialize BEFORE dropping the old cache — persist() is
            # lazy, and unpersisting first would recompute the whole
            # replace chain from the source every round (O(rounds²))
            new_enc.persist().count()
            enc.unpersist()
            enc = new_enc
    finally:
        enc.unpersist()
    return merges


def greedy_tokenize_words(words: DataFrame, vocab: list[str]) -> DataFrame:
    """(word, n_tok): greedy longest-match subword tokenization
    (WordPiece-style inference without the ## continuation marker) of
    each DISTINCT word against a fixed vocabulary — the ENCODE side of
    the tokenizer family (``bpe_train_merges`` is the train side).

    The scale shape is dictionary encoding: real corpora have orders of
    magnitude fewer distinct words than word OCCURRENCES, so the
    sequential per-word match loop runs once per vocabulary entry and
    the result joins back to the token stream — tokenizing 100 TB costs
    |distinct words| matches plus one broadcast join, not |tokens|
    matches. The match itself is an Arrow-batched pandas iterator
    (pure-Python greedy scan, vocab as a closure constant) — the
    honest shape for tokenizer inference, which no built-in expression
    expresses. Characters not in the vocab fall back to one
    single-char token each, so every word tokenizes (no OOV sink)."""
    import pandas as pd

    by_len = sorted(set(vocab), key=lambda v: (-len(v), v))
    max_len = max(len(v) for v in by_len)
    vset = set(by_len)

    def encode(word: str) -> int:
        n = 0
        i = 0
        while i < len(word):
            step = 1
            for ln in range(min(max_len, len(word) - i), 0, -1):
                if word[i : i + ln] in vset:
                    step = ln
                    break
            i += step
            n += 1
        return n

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {"word": pdf["word"], "n_tok": [encode(w) for w in pdf["word"]]}
            )

    return words.mapInPandas(run, "word string, n_tok long")
