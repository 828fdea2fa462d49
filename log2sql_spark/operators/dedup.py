"""Deduplication operators for training-data pipelines (100 TB design).

Not present in the 305-line reference (SURVEY.md §2.2 "LLM-pipeline
ops"); mandated by the project north star. Four tiers:

* **exact** — content-hash groupBy. One shuffle on a 128-bit digest;
  at 100 TB the digest (16 B) shuffles, never the documents.
* **near-dup, MinHash + LSH** — shingle → minhash signature → banded
  bucket join. Candidate generation is a groupBy on (band, band-hash):
  the only all-pairs-ish step touches only bucket-mates, so cost scales
  with collision density, not |corpus|².
* **near-dup, SimHash** — 60-bit fingerprint; hamming-close pairs.
* **exact n-gram Jaccard** — the verification (and oracle) metric.

All hashing is md5-based (``conv(substr(md5(x),1,15),16,10)``) — a
cross-engine-reproducible 60-bit hash (DuckDB: ``('0x'||…)::BIGINT``),
so every operator here is oracle-checkable. Everything is JVM-side
expressions; no Python in the data path.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MERSENNE31 = 2_147_483_647  # 2^31-1; keeps a*x+b inside 63 bits


def md5_long(col: Column) -> Column:
    """Deterministic 60-bit hash of a string, identical in DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tokens(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


def word_ngrams(col: Column, n: int = 3) -> Column:
    """Distinct word n-grams, JVM-side.

    Built by zip_with over shifted slices rather than indexing inside a
    ``transform`` lambda: referencing a computed array in a lambda body
    makes Spark re-evaluate the whole array per element (no common
    subexpression elimination inside higher-order functions) — O(n²).
    zip_with evaluates each input array once."""
    toks = tokens(col)
    grams = toks
    for j in range(1, n):
        # concat_ws skips the nulls zip_with pads with; partial grams at
        # the tail are cut by the final slice.
        grams = F.zip_with(
            grams,
            F.slice(toks, j + 1, F.greatest(F.size(toks) - j, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.array_distinct(
        F.slice(grams, 1, F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    )


def word_ngrams_pos(col: Column, n: int) -> Column:
    """POSITIONAL word n-grams: array element i (0-based after
    posexplode) is the n-gram starting at token i — NOT distinct and
    order-preserving, because substring-dedup span arithmetic needs the
    token offset of every window. Same zip_with construction as
    :func:`word_ngrams` (O(n·len), never the O(len²) lambda-indexing
    shape); the final slice cuts the null-padded partial grams at the
    tail."""
    toks = tokens(col)
    grams = toks
    for j in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, j + 1, F.greatest(F.size(toks) - j, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.slice(grams, 1, F.greatest(F.size(toks) - (n - 1), F.lit(0)))


def duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 15,
) -> DataFrame:
    """Length-agnostic exact-substring dedup (Lee et al. 2022's
    ExactSubstr, distributed): every MAXIMAL duplicated token span of
    length >= ``min_len`` anywhere in the corpus, as (id, span_start,
    span_len) in token offsets. The suffix-array result without a
    suffix array's global sort of every suffix:

    1. one posexplode emits (doc, pos, md5(window)) per token position
       — hashes shuffle, never text;
    2. one window-count over the hash marks duplicated positions (the
       overwhelming unique-window majority dies here); a duplicated
       substring of length m appears as m-min_len+1 CONSECUTIVE
       duplicated window positions;
    3. a per-doc lag/sum window merges consecutive positions into
       maximal runs; run [a, b] is the span [a, b+min_len-1].

    Cost is linear in corpus tokens with two shuffle keys (hash, then
    doc): both partition cleanly at 100 TB, the hot aggregate is a
    count (map-side partial), and there is no candidate pair join to
    blow up on duplicate clusters. Same-doc repeats count as
    duplicates, matching the reference algorithm."""
    pos = positional_window_hashes(docs, text_col, id_col, min_len)
    dup = pos.withColumn(
        "n", F.count("*").over(Window.partitionBy("h"))
    ).filter(F.col("n") >= 2)
    return merge_positions_to_spans(dup, id_col, min_len)


def positional_window_hashes(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 15,
) -> DataFrame:
    """(id, pos, h) — the md5 of the ``min_len``-token window starting
    at each token offset. The positional index exact-substring dedup
    runs on; hashes shuffle, never text."""
    return docs.select(
        F.col(id_col),
        F.posexplode(word_ngrams_pos(F.col(text_col), min_len)).alias(
            "pos", "gram"
        ),
    ).select(id_col, "pos", F.md5("gram").alias("h"))


def merge_positions_to_spans(
    dup_positions: DataFrame, id_col: str = "doc_id", min_len: int = 15
) -> DataFrame:
    """Per-doc run-merge: consecutive duplicated window positions
    [a..b] become the maximal span (a, b - a + min_len). Shared by the
    batch detector and the streaming incremental recompute."""
    w = Window.partitionBy(id_col).orderBy("pos")
    runs = dup_positions.withColumn(
        "brk",
        F.when(F.lag("pos").over(w) == F.col("pos") - 1, F.lit(0)).otherwise(
            F.lit(1)
        ),
    ).withColumn("run_id", F.sum("brk").over(w))
    return (
        runs.groupBy(id_col, "run_id")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            (F.max("pos") - F.min("pos") + min_len)
            .cast("bigint")
            .alias("span_len"),
        )
        .select(id_col, "span_start", "span_len")
    )


def apply_duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 15,
) -> DataFrame:
    """The APPLY step of exact-substring dedup: excise every duplicated
    span :func:`duplicate_spans` found from every document — the
    conservative remove-everywhere policy (a fully-duplicated document
    comes back empty; keep-one-occurrence at the document level is the
    keeper policies' job, see ``dedup_keep_best``). Returns (id,
    kept_tokens, removed_tokens, cleaned_text)."""
    spans = duplicate_spans(docs, text_col, id_col, min_len)
    return excise_spans(docs, spans, text_col=text_col, id_col=id_col)


def excise_spans(
    docs: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Excise the given (id, span_start, span_len) token spans from
    ``docs`` — the shared excision kernel of the batch apply above and
    the streaming incremental apply (streaming/substr_stream.py).

    Shape: the spans collect per doc (a FEW structs each — maximal
    runs, not positions) and join back to the corpus; the excision is
    one JVM ``filter`` lambda with the token index probed against the
    span array — no token-level explode, no per-doc re-sort, so the
    apply pass adds one broadcast-small join + a map-only projection
    on top of the detection cost."""
    span_arr = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_len")).alias("_spans")
    )
    toks_sql = f"split(trim(`{text_col}`), '\\\\s+')"
    kept_sql = (
        f"filter({toks_sql}, (x, i) -> NOT coalesce("
        f"exists(_spans, s -> i >= s.span_start AND "
        f"i < s.span_start + s.span_len), false))"
    )
    return (
        docs.join(span_arr, id_col, "left")
        .withColumn("_kept", F.expr(kept_sql))
        .select(
            F.col(id_col),
            F.size("_kept").cast("bigint").alias("kept_tokens"),
            (F.expr(f"size({toks_sql})") - F.size("_kept"))
            .cast("bigint")
            .alias("removed_tokens"),
            F.concat_ws(" ", "_kept").alias("cleaned_text"),
        )
    )


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group by content hash; keep the smallest id as the canonical doc.

    Returns (content_hash, keeper_id, n_copies). The shuffle key is the
    hash, so data volume per reducer is bounded by duplicate-group size
    regardless of corpus size."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_copies"))
    )


def exploded_grams(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, gram) rows — the shared input of signatures and verification."""
    return docs.select(
        F.col(id_col).alias("id"), F.explode(word_ngrams(F.col(text_col), n)).alias("gram")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    grams: DataFrame | None = None,
    max_gram_df: int | None = 1024,
) -> DataFrame:
    """All-pairs n-gram Jaccard ≥ threshold (a < b), df-capped.

    Candidate pairs meet through a self-join on the gram, so cost is
    Σ_g df(g)² over shared grams — quadratic in how many documents share
    a gram. Two document-frequency prunes bound it:

    * df == 1 grams are dropped (exact: a singleton gram can never join
      two documents).
    * df > ``max_gram_df`` grams are dropped from CANDIDATE GENERATION
      only — the standard stopword-gram cap. Join cost is then at most
      ``max_gram_df`` × |gram occurrences|, i.e. linear in corpus size
      with a constant knob, instead of |corpus|² on stopword grams.

    The Jaccard itself is computed on the FULL gram sets (array_intersect
    on per-doc sets, the same verify shape as minhash_dedup_pairs), so a
    surviving pair's score is exact. The only approximation is recall: a
    qualifying pair is missed iff EVERY gram it shares occurs in more
    than ``max_gram_df`` documents. A pair at Jaccard ≥ τ shares at
    least τ/(1+τ)·(|A|+|B|) grams; for near-duplicate thresholds that is
    dozens of grams, all of which would have to be corpus-stopwords — at
    which point the pair is boilerplate, not duplication. Pass
    ``max_gram_df=None`` for the exact verifier/oracle behavior."""
    if grams is None:
        # grams feeds up to four consumers (sizes / df table / both
        # sides of the candidate self-join / verify gram sets); persist
        # so the explode runs once, not once per consumer — a BROADCAST
        # candidate join shares no exchange between its sides, so
        # ReuseExchange alone does not dedupe the upstream.
        grams = exploded_grams(docs, n, text_col, id_col).persist()
    sizes = grams.groupBy("id").agg(F.count("*").alias("n_grams"))
    join_grams = grams
    if max_gram_df is not None:
        gram_df = grams.groupBy("gram").agg(F.count("*").alias("df"))
        join_grams = (
            grams.join(
                gram_df.filter((F.col("df") >= 2) & (F.col("df") <= max_gram_df)),
                "gram",
            ).select("id", "gram")
            # referenced by both sides of the self-join below
            .persist()
        )
        cands = (
            join_grams.alias("a")
            .join(join_grams.alias("b"), "gram")
            .filter(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct()
        )
        gram_sets = (
            grams.groupBy("id")
            .agg(F.collect_list("gram").alias("gset"))
            .persist()  # joined on both the id_a and id_b side
        )
        return (
            cands.join(gram_sets.withColumnsRenamed({"id": "id_a", "gset": "ga"}), "id_a")
            .join(gram_sets.withColumnsRenamed({"id": "id_b", "gset": "gb"}), "id_b")
            .withColumn("n_inter", F.size(F.array_intersect("ga", "gb")))
            .withColumn(
                "jaccard",
                F.col("n_inter") / (F.size("ga") + F.size("gb") - F.col("n_inter")),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
    inter = (
        grams.alias("a")
        .join(grams.alias("b"), "gram")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "n_grams": "na"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_grams": "nb"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def gram_df_stats(grams: DataFrame, max_gram_df: int = 1024) -> DataFrame:
    """Recall accounting for the df-prune in ``ngram_jaccard_pairs``:
    one row per gram class — 'singleton' (df=1, exact prune),
    'joinable' (2 ≤ df ≤ cap), 'capped' (df > cap, the recall
    trade-off) — with how many distinct grams and gram occurrences fall
    in each. Makes the ``max_gram_df`` knob observable: a qualifying
    pair is missed only if every shared gram is 'capped', and this
    reports exactly how much of the corpus that class covers."""
    df_tbl = grams.groupBy("gram").agg(F.count("*").alias("df"))
    return (
        df_tbl.withColumn(
            "gram_class",
            F.when(F.col("df") == 1, "singleton")
            .when(F.col("df") <= max_gram_df, "joinable")
            .otherwise("capped"),
        )
        .groupBy("gram_class")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum("df").alias("n_occurrences"),
        )
    )


def _hash_params(num_hashes: int, seed: int = 42) -> tuple[list[int], list[int]]:
    rng = random.Random(seed)
    a = [rng.randrange(1, MERSENNE31) for _ in range(num_hashes)]
    b = [rng.randrange(0, MERSENNE31) for _ in range(num_hashes)]
    return a, b


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 64,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    grams: DataFrame | None = None,
) -> DataFrame:
    """(id, sig array<long>): per-document MinHash signature.

    h_i(g) = (a_i·x + b_i) mod p over the 60-bit gram hash x, folded
    with one min-aggregate per signature position (all partial-aggregated
    map-side before the shuffle)."""
    a, b = _hash_params(num_hashes, seed)
    if grams is None:
        grams = exploded_grams(docs, n, text_col, id_col)
    # Materialize the gram hash x through its OWN projection before the
    # num_hashes permutation expressions reference it: spelled inline,
    # each h_i carries a private md5+conv subtree and neither Catalyst
    # nor codegen subexpression elimination deduplicates them — the
    # digest ran num_hashes times per gram (measured: 64 hashes over
    # 40k sf0.1 gram rows, 1.85 s inline vs 0.60 s hoisted, identical
    # signatures bit-for-bit; guide §1.2 "per-task work"). CollapseProject
    # keeps the split because x is non-cheap and multiply-referenced.
    gx = grams.select(
        "id", F.pmod(md5_long(F.col("gram")), F.lit(MERSENNE31)).alias("x")
    )
    hashed = gx.select(
        "id",
        *[
            F.pmod(a[i] * F.col("x") + b[i], F.lit(MERSENNE31)).alias(f"h{i}")
            for i in range(num_hashes)
        ],
    )
    agg = hashed.groupBy("id").agg(*[F.min(f"h{i}").alias(f"h{i}") for i in range(num_hashes)])
    return agg.select("id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def banded_slices(signatures: DataFrame, bands: int = 32) -> DataFrame:
    """(id, band, slice) rows — one row per LSH band per signature."""
    return signatures.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bi: F.struct(
                    bi.alias("band"),
                    F.slice(
                        F.col("sig"),
                        (bi * (F.size("sig") / bands).cast("int") + 1).cast("int"),
                        (F.size("sig") / bands).cast("int"),
                    ).alias("slice"),
                ),
            )
        ).alias("bs"),
    ).select("id", F.col("bs.band").alias("band"), F.col("bs.slice").alias("slice"))


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 32, max_bucket_size: int | None = None
) -> DataFrame:
    """Banded LSH: equal band-slice ⇒ candidate pair (id_a < id_b).

    One explode (×bands) + one groupBy on the band value: the classic
    shuffle-bounded candidate join. rows-per-band r = |sig|/bands tunes
    the S-curve: P(candidate) = 1-(1-j^r)^bands.

    ``max_bucket_size`` is the hot-bucket guard: a bucket of k
    signatures emits k·(k-1)/2 pairs, so one pathological bucket (near-
    identical boilerplate — every member has the same signature, hence
    collides in EVERY band) turns the join quadratic. Buckets larger
    than the cap switch from all-pairs to STAR pairing — every member
    pairs with the bucket's minimum id only, O(k) pairs — which keeps
    the duplicate group connected (one component in dedup_clusters)
    while bounding per-bucket fan-out. Off (None) by default so the
    exact-oracle queries keep full pair enumeration;
    ``lsh_bucket_stats`` makes the trade-off observable."""
    # Persist the band relation before the self-join (same reuse
    # argument as simhash_near_dup_pairs): a small signature set gets a
    # BROADCAST band join whose build side shares no exchange with the
    # stream side, so the whole signature pipeline would otherwise run
    # once per join side (sf0.1 A/B: candidate stage 0.79 s -> 0.25 s).
    # State is |ids| x bands slice rows, freed by clearCache/GC.
    exploded = banded_slices(signatures, bands).persist()
    if max_bucket_size is None:
        return (
            exploded.alias("a")
            .join(exploded.alias("b"), ["band", "slice"])
            .filter(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct()
        )
    # One shuffle on (band, slice) computes both bucket size and the
    # star center; unbounded frames need no sort within the bucket.
    w = Window.partitionBy("band", "slice")
    # sized feeds three consumers (both sides of the small-bucket
    # self-join + the star branch); persist so the bucket-stats window
    # runs once rather than once per consumer.
    sized = (
        exploded.withColumn("bucket_n", F.count("*").over(w))
        .withColumn("bucket_min", F.min("id").over(w))
        .persist()
    )
    small = sized.filter(F.col("bucket_n") <= max_bucket_size).select(
        "band", "slice", "id"
    )
    all_pairs = (
        small.alias("a")
        .join(small.alias("b"), ["band", "slice"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    star_pairs = sized.filter(
        (F.col("bucket_n") > max_bucket_size) & (F.col("id") != F.col("bucket_min"))
    ).select(F.col("bucket_min").alias("id_a"), F.col("id").alias("id_b"))
    return all_pairs.unionByName(star_pairs).distinct()


def lsh_bucket_stats(signatures: DataFrame, bands: int = 32) -> DataFrame:
    """Histogram of LSH bucket sizes: (bucket_n, n_buckets).

    The observability companion of ``max_bucket_size``: run it before
    choosing a cap, or alongside a capped run to see exactly how many
    buckets (and how much quadratic fan-out) the cap removed — the
    recall trade-off is measured, never silent."""
    return (
        banded_slices(signatures, bands)
        .groupBy("band", "slice")
        .agg(F.count("*").alias("bucket_n"))
        .groupBy("bucket_n")
        .agg(F.count("*").alias("n_buckets"))
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 32,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH candidates verified by exact Jaccard ≥ threshold.

    With r=2, b=32 the miss probability at j=0.5 is (1-0.25)^32 ≈ 1e-4
    and falls super-exponentially above it, so verified output matches
    the exact all-pairs result (the oracle) with overwhelming margin
    while never scoring non-colliding pairs.

    Verification touches ONLY candidate pairs: each candidate joins its
    two (already-distinct) gram sets and scores size(intersect) /
    size(union) with array_intersect — integers, so the division is
    bit-identical to the oracle's. The all-pairs gram self-join
    (ngram_jaccard_pairs) is never built; at scale the verify cost is
    O(|candidates|), not O(|gram-sharing pairs|).

    ``max_bucket_size`` enables the hot-bucket guard (see
    lsh_candidate_pairs): on boilerplate-heavy corpora pass e.g. 256 so
    one pathological bucket can't go quadratic; verified star pairs
    still connect the duplicate group for clustering."""
    # The gram explode + 64 signature hashes are the compute-dominant
    # stage, and their parallelism is inherited from the INPUT's
    # partitioning — a corpus read from a few large parquet files would
    # run them on a few cores while the rest idle. Spread the (narrow,
    # pre-explode) doc rows across the full parallelism first; the
    # round-robin shuffle moves only raw documents, never grams.
    par = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    grams = exploded_grams(docs, n, text_col, id_col).persist()
    sigs = minhash_signatures(docs, num_hashes, n, text_col, id_col, grams=grams)
    cands = lsh_candidate_pairs(sigs, bands, max_bucket_size=max_bucket_size)
    # Verify on 8-byte gram hashes, not gram text: per-doc grams are
    # already distinct, so |intersect| and |union| — hence the Jaccard —
    # are unchanged (collisions aside), while the collect_list shuffle
    # and the two per-candidate arrays shrink from ~20-30 B of text per
    # gram to 8 B (guide §2.3 "shuffle keys and metadata instead of
    # payloads").
    # gram_sets is joined twice (id_a and id_b side); persist so the
    # collect_list aggregate over the cached grams runs once, not once
    # per join side (sf0.1 A/B: full pipeline 0.63 s -> 0.39 s on top of
    # the band-relation persist).
    gram_sets = grams.groupBy("id").agg(
        F.collect_list(F.xxhash64("gram")).alias("gset")
    ).persist()
    return (
        cands.join(gram_sets.withColumnsRenamed({"id": "id_a", "gset": "ga"}), "id_a")
        .join(gram_sets.withColumnsRenamed({"id": "id_b", "gset": "gb"}), "id_b")
        .withColumn("n_inter", F.size(F.array_intersect("ga", "gb")))
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.size("ga") + F.size("gb") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def dedup_clusters(pairs: DataFrame, max_iter: int = 10) -> DataFrame:
    """Connected components over near-dup pairs → (id, cluster_id).

    cluster_id is the minimum doc id in the component (the canonical
    keeper). Iterative label propagation: each round every node adopts
    the smallest label among itself and its neighbors; converges in
    O(component diameter) rounds — dedup graphs are star/clique-shaped,
    so usually 1-2. Each round is one join + one aggregate (shuffle on
    id); the driver only checks the convergence flag, never data."""
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        # materialize once: every iteration re-reads the edge set, and
        # without this the (expensive) pair-finding lineage re-executes
        # per round
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("cluster_id", F.col("id"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("cluster_id"), F.coalesce("nbr_min", F.col("cluster_id"))
                ).alias("cluster_id"),
            )
        )
        # truncate lineage per round — iterative plans otherwise grow
        # exponentially and re-execute all prior rounds
        new_labels = new_labels.localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def simhash(docs: DataFrame, bits: int = 60, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash): bit k of the fingerprint is the sign of the sum of
    (±1) votes from every token's hash bit k. Near-duplicate documents
    land within small hamming distance.

    One explode (tokens) → ONE groupBy(id) carrying `bits` vote-sum
    aggregate columns, exactly like minhash_signatures. The earlier
    design exploded a sequence(0, bits-1) per token — a bits× row blowup
    before the aggregate; this shape evaluates the same arithmetic per
    token row but materializes nothing, and map-side partial aggregation
    shrinks the shuffle to one (id, bits longs) row per id per
    partition."""
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("tok")
    ).withColumn("h", md5_long(F.col("tok")))
    votes = toks.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), k).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{k}")
            for k in range(bits)
        ]
    )
    fingerprint = None
    for k in range(bits):
        term = F.when(F.col(f"v{k}") > 0, F.lit(1 << k).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fingerprint = term if fingerprint is None else fingerprint + term
    return votes.select("id", fingerprint.alias("simhash"))


def simhash_near_dup_pairs(
    fingerprints: DataFrame, bits: int = 60, max_hamming: int = 4
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with hamming(simhash) <= max_hamming,
    via pigeonhole banding — NEVER an all-pairs self-join.

    Split the `bits`-bit fingerprint into max_hamming+1 equal bands: two
    fingerprints within hamming distance max_hamming differ in at most
    max_hamming bits, so by pigeonhole at least one band is bit-identical.
    Candidate generation is therefore an EQUI-join on (band_idx,
    band_bits) — a shuffle-hash/sort-merge join whose cost is
    O(Σ bucket²) over genuinely colliding buckets, not O(n²) — and the
    exact hamming check runs on collisions only. distinct() collapses
    pairs that collide in several bands."""
    bands = max_hamming + 1
    width = bits // bands
    rem = bits - width * bands  # last band absorbs any remainder bits
    offs = [i * width for i in range(bands)]
    widths = [width] * (bands - 1) + [width + rem]
    exploded = fingerprints.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftright(F.col("simhash"), offs[i])
                        .bitwiseAND(F.lit((1 << widths[i]) - 1))
                        .alias("band_bits"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("b"),
    ).select("id", "simhash", F.col("b.band_idx"), F.col("b.band_bits"))
    # Persist the band relation before the self-join: with a small
    # fingerprint set the planner picks a BROADCAST join, whose build
    # side shares no exchange with the stream side — so without this the
    # entire upstream (e.g. the token-vote aggregate, or the multimodal
    # synth+decode Python stages) executes once PER JOIN SIDE. A
    # sort-merge join would dedupe via ReuseExchange; the cache makes
    # the reuse explicit for every join strategy. 16 bytes x bands per
    # asset, dropped with the session's clearCache between bench runs.
    exploded = exploded.persist()
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(b, ["band_idx", "band_bits"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
            .cast("long")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def cdc_chunk_hashes(
    docs: DataFrame,
    mod: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Content-defined chunking (rolling-hash Rabin-style boundaries at
    token granularity): a chunk boundary falls after token i wherever
    the 4-gram hash ending at i ≡ 0 (mod ``mod``), so boundaries are a
    function of CONTENT, not position — an insertion early in a
    document shifts every fixed-window fingerprint but leaves all
    later CDC chunks identical. Mean chunk length ≈ ``mod`` tokens.

    Returns (id, chunk_idx, chunk_hash) — one row per chunk. The whole
    boundary/segmentation computation is per-row JVM array arithmetic
    (no explode until the final chunk list, no shuffle at all), so it
    scales with corpus bytes like any map-only projection.
    """
    toks = tokens(F.col(text_col))
    d = docs.select(
        F.col(id_col).alias("id"), toks.alias("w"), F.size(toks).alias("n")
    )
    # 0-based gram-end positions i in [3, n-2]; slice() is 1-based. The
    # final token is never a boundary — a cut after it would emit a
    # spurious empty trailing chunk.
    d = d.withColumn(
        "idx",
        F.when(F.col("n") >= 5, F.sequence(F.lit(3), F.col("n") - 2)).otherwise(
            F.array().cast("array<int>")
        ),
    )
    d = d.withColumn(
        "bpos",
        F.filter(
            F.col("idx"),
            lambda i: (md5_long(F.array_join(F.slice(F.col("w"), i - 2, 4), " ")) % mod)
            == 0,
        ),
    )
    d = d.withColumn(
        "starts",
        F.concat(F.array(F.lit(0)), F.transform(F.col("bpos"), lambda p: p + 1)),
    ).withColumn("ends", F.concat(F.col("bpos"), F.array(F.col("n") - 1)))
    chunks = F.transform(
        F.col("starts"),
        lambda s, k: F.array_join(
            F.slice(F.col("w"), s + 1, F.element_at(F.col("ends"), k + 1) - s + 1),
            " ",
        ),
    )
    return d.select(
        "id", F.posexplode(chunks).alias("chunk_idx", "chunk_text")
    ).select("id", "chunk_idx", F.md5(F.col("chunk_text")).alias("chunk_hash"))


def ngram_containment_pairs(
    docs: DataFrame,
    threshold_bp: int = 9000,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_gram_df: int | None = 1024,
) -> DataFrame:
    """All-pairs n-gram CONTAINMENT ≥ threshold (a < b) — the
    asymmetric near-dup measure C = |A∩B| / min(|A|,|B|) that catches
    what Jaccard structurally cannot: a short document quoted inside a
    long one has containment ≈ 1 but Jaccard ≈ |small|/|large|, far
    below any dedup threshold. This is the Broder "containment" twin
    of resemblance — the right metric for excerpt/quote/subset
    duplication in a pretraining corpus.

    Same candidate machinery as ngram_jaccard_pairs (pairs meet
    through a gram self-join, df==1 grams never generate, the
    ``max_gram_df`` stopword-gram cap bounds join cost linearly at
    scale), so the scale shape is identical; only the verification
    arithmetic differs. Scores emit as truncating integer basis points
    and the threshold evaluates by integer cross-multiplication —
    no float compare crosses an engine boundary.
    """
    # word_ngrams is already per-doc distinct — (id, gram) needs no
    # dedup shuffle here. Persisted: grams feeds sizes, the df table
    # and both sides of the candidate self-join (same multi-consumer
    # reuse as ngram_jaccard_pairs).
    grams = exploded_grams(docs, n, text_col, id_col).persist()
    sizes = grams.groupBy("id").agg(F.count("*").alias("n_grams"))
    join_grams = grams
    if max_gram_df is not None:
        gram_df = grams.groupBy("gram").agg(F.count("*").alias("df"))
        join_grams = grams.join(
            gram_df.filter((F.col("df") >= 2) & (F.col("df") <= max_gram_df)),
            "gram",
        ).select("id", "gram").persist()
    inter = (
        join_grams.alias("a")
        .join(join_grams.alias("b"), "gram")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    scored = (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "n_grams": "na"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_grams": "nb"}), "id_b")
    )
    small = F.least("na", "nb")
    return (
        scored.filter(
            F.col("n_inter") * 10000 >= F.lit(threshold_bp) * small
        )
        .select(
            "id_a",
            "id_b",
            F.col("n_inter").cast("long").alias("n_inter"),
            F.expr("n_inter * 10000 DIV least(na, nb)")
            .cast("long")
            .alias("containment_bp"),
            F.expr("n_inter * 10000 DIV (na + nb - n_inter)")
            .cast("long")
            .alias("jaccard_bp"),
        )
    )


def oph_signatures(
    docs: DataFrame,
    num_bins: int = 64,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    grams: DataFrame | None = None,
) -> DataFrame:
    """(id, sig array<long>, filled_bins): one-permutation-hashing
    MinHash (Li, Owen & Zhang, NIPS 2012) with rotation densification
    (Shrivastava & Li, ICML 2014).

    Classic ``minhash_signatures`` evaluates ``num_hashes`` affine
    hashes per gram — 64 multiplications per token shuffled into 64
    min-aggregates. OPH computes ONE hash per gram and lets the hash
    itself pick the signature slot: ``bin = x mod k`` partitions the
    gram space into k bins, ``min(x div k)`` within each bin is an
    independent minimum. Same signature semantics (slot agreement is an
    unbiased Jaccard estimator) with 1/64th the HASH EVALUATIONS per
    gram. Measured honestly (BENCH.json sf1.oph_vs_classic): ~1.05x
    end-to-end at 50k docs, because the shared md5 gram hash and the
    scan dominate and Spark JIT makes the 64 affine mods cheap — the
    term OPH removes grows linearly with signature WIDTH, so the gap
    widens at 256+ hashes or when the signature pass is CPU-bound
    against cheaper input hashing, not at this corpus.
    Empty bins (short docs) borrow the nearest filled bin to the right
    (circular), offset by ``c * 2^26`` so a borrowed slot can never
    spuriously equal a directly-filled one but two docs borrowing the
    same value at the same distance still agree — the rotation
    densification that keeps the estimator unbiased for sparse docs.

    The whole signature is ONE map-side-combined aggregate (k
    conditional mins folded into an array) + a constant-size transform:
    no per-(id, bin) shuffle, no 64-hash fan-out."""
    if grams is None:
        grams = exploded_grams(docs, n, text_col, id_col)
    # Hoist x through its own projection so bin and val share ONE
    # md5+conv evaluation (same inline-duplication trap as
    # minhash_signatures above; values unchanged).
    gx = grams.select(
        "id", F.pmod(md5_long(F.col("gram")), F.lit(MERSENNE31)).alias("x")
    )
    hashed = gx.select(
        "id",
        (F.col("x") % num_bins).cast("int").alias("bin"),
        (F.col("x") / num_bins).cast("long").alias("val"),
    )
    slots = hashed.groupBy("id").agg(
        *[
            F.min(F.when(F.col("bin") == i, F.col("val"))).alias(f"s{i}")
            for i in range(num_bins)
        ]
    )
    arr = slots.select(
        "id", F.array(*[f"s{i}" for i in range(num_bins)]).alias("slots")
    )
    k = num_bins
    dens = f"""
    transform(sequence(0, {k - 1}), j ->
      CASE WHEN slots[j] IS NOT NULL THEN slots[j]
           ELSE slots[(j + filter(sequence(0, {k - 1}),
                                  c -> slots[(j + c) % {k}] IS NOT NULL)[0]) % {k}]
                + 67108864L * filter(sequence(0, {k - 1}),
                                     c -> slots[(j + c) % {k}] IS NOT NULL)[0]
      END)
    """
    return arr.select(
        "id",
        F.expr(dens).alias("sig"),
        F.expr("size(filter(slots, s -> s IS NOT NULL))")
        .cast("long")
        .alias("filled_bins"),
    )


def ppjoin_pairs(
    docs: DataFrame,
    threshold: tuple[int, int] = (7, 10),
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-threshold set-similarity self-join via PREFIX FILTERING
    (PPJoin family, Xiao et al., WWW'08): all pairs with word-n-gram-set
    Jaccard ≥ num/den, found WITHOUT the all-pairs token join — and with
    NO recall loss, unlike MinHash-LSH.

    The filter: order every document's distinct grams by global rarity
    (document frequency asc, gram asc — one broadcastable df table) and
    keep only the first ``p = |x| − ⌈t·|x|⌉ + 1`` as the doc's PREFIX.
    Under a consistent global order, any pair with Jaccard ≥ t must
    share a prefix token (if two sets disagree on all of both prefixes,
    their overlap is too small to reach t) — so candidates come from a
    self-join on the small prefix relation plus the length filter
    ``den·min(|x|,|y|) ≥ num·max(|x|,|y|)``, both lossless. The rarity
    ordering is what makes prefixes selective: stopword grams (which
    generate quadratic candidates) never appear in a short prefix.
    Verification joins full gram sets ONLY for candidates. The
    threshold is an integer fraction and every comparison is
    cross-multiplied, so boundary pairs (Jaccard == t exactly) are
    decided identically everywhere — no float drift.

    Returns (id_a, id_b, n_a, n_b, n_inter, jacc_bp) with id_a < id_b,
    jacc_bp the truncated basis-point Jaccard. Scale: the df pass and
    the verify are linear in corpus grams; the candidate join is
    bounded by Σ_g df_prefix(g)², with the rarity order pushing
    df_prefix far below raw df."""
    num, den = threshold
    # toks feeds sizes, the df table, the prefix ranking, and the
    # verify gram sets; persist so the gram explode runs once.
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("tok"),
    ).persist()
    sizes = toks.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    df_tbl = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    from pyspark.sql import Window

    ranked = (
        toks.join(df_tbl, "tok")
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("id").orderBy(F.asc("df"), F.asc("tok"))
            ),
        )
        .join(sizes, "id")
        # p = n - ceil(t*n) + 1, all-integer ceil
        .filter(
            F.col("rnk")
            <= F.col("n") - F.expr(f"({num} * n + {den - 1}) DIV {den}") + 1
        )
        .select("id", "tok", "n")
        # both sides of the prefix self-join read this
        .persist()
    )
    cand = (
        ranked.alias("a")
        .join(ranked.alias("b"), "tok")
        .filter(F.col("a.id") < F.col("b.id"))
        .filter(
            F.lit(den) * F.least("a.n", "b.n")
            >= F.lit(num) * F.greatest("a.n", "b.n")
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
        .distinct()
    )
    # Verify on COLLECTED gram sets (array_intersect per candidate),
    # the same shape minhash_dedup_pairs uses: the (pair x gram)
    # explode-join alternative re-shuffles every gram occurrence per
    # candidate and measured 5x slower on a duplicate-heavy corpus
    # where candidates (rightly) number in the hundreds of thousands.
    gram_sets = toks.groupBy("id").agg(F.collect_list("tok").alias("gset")).persist()
    return (
        cand.join(
            gram_sets.select(F.col("id").alias("id_a"), F.col("gset").alias("ga")),
            "id_a",
        )
        .join(
            gram_sets.select(F.col("id").alias("id_b"), F.col("gset").alias("gb")),
            "id_b",
        )
        .withColumn("n_inter", F.size(F.array_intersect("ga", "gb")))
        .filter(
            F.lit(den) * F.col("n_inter")
            >= F.lit(num) * (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        )
        .select(
            "id_a", "id_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("n_inter").cast("long").alias("n_inter"),
            F.expr("n_inter * 10000 DIV (n_a + n_b - n_inter)")
            .cast("long")
            .alias("jacc_bp"),
        )
    )
