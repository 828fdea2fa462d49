r"""Sketch-based approximate analytics: count-min sketch heavy hitters.

The curation primitive the rest of the LLM pipeline lacked: estimating
per-key frequencies over a stream/corpus WITHOUT a full groupBy shuffle.
``F.count_min_sketch`` partial-aggregates a fixed-size sketch per
partition map-side and merges the (eps, confidence)-sized summaries —
at 100 TB that is a constant ~MBs of state per executor instead of a
key-space-wide shuffle, which is the entire point of the sketch.

Probing is driver-side by design: the merged sketch is a single small
binary and the candidate set is small; the distributed work (one pass
over the corpus) is where the data size shows up. Estimates
overcount only on full-depth hash collisions; with the chosen widths
vs the key cardinalities here the estimates are exact, so each query
carries an exact-count DuckDB oracle (same contract the reference's
aggregate tests use — SURVEY.md §5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log2sql_spark.registry import query
from log2sql_spark.sources.tables import load_table


def _read_cms(spark: SparkSession, sketch_bytes: bytes):
    """Deserialize a merged count-min sketch for driver-side probing."""
    return spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(sketch_bytes)
    )


@query(
    "sketch_countmin_event_types",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS est_count
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def sketch_countmin_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type event counts via count-min sketch: one distributed pass
    builds the sketch (map-side partials, tiny merge), then the distinct
    types (bounded, dimension-like) are probed against it. Width 2/eps =
    20k cells vs a handful of keys -> collision-free, estimates exact."""
    events = load_table(spark, "events", sf_dir)
    sk_row = events.agg(
        F.count_min_sketch("event_type", F.lit(1e-4), F.lit(0.999), F.lit(42)).alias("sk")
    ).head()
    sk = _read_cms(spark, sk_row.sk)
    types = sorted(
        r.event_type for r in events.select("event_type").distinct().collect()
    )
    rows = [(t, sk.estimateCount(t)) for t in types]
    return spark.createDataFrame(rows, "event_type string, est_count bigint")


@query(
    "sketch_countmin_token_heavy_hitters",
    oracle=r"""
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
      FROM documents
    ),
    probe AS (
      SELECT DISTINCT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
      FROM documents WHERE doc_id < 20
    )
    SELECT t.token, CAST(count(*) AS BIGINT) AS est_tf
    FROM toks t JOIN probe p USING (token)
    GROUP BY t.token
    HAVING count(*) >= 100
    ORDER BY token
    """,
)
def sketch_countmin_token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter tokens: sketch the full corpus term stream (explode
    stays in whole-stage codegen; the aggregate ships fixed-size sketch
    partials, not tokens), then probe a candidate set drawn from a
    document sample — the classic two-pass heavy-hitter scheme where
    pass 1 is O(sketch) memory regardless of vocabulary size."""
    from log2sql_spark.operators.dedup import tokens

    docs = load_table(spark, "documents", sf_dir)
    term_stream = docs.select(F.explode(tokens(F.col("text"))).alias("token"))
    sk_row = term_stream.agg(
        F.count_min_sketch("token", F.lit(2e-5), F.lit(0.999), F.lit(42)).alias("sk")
    ).head()
    sk = _read_cms(spark, sk_row.sk)
    candidates = sorted(
        r.token
        for r in docs.filter(F.col("doc_id") < 20)
        .select(F.explode(F.array_distinct(tokens(F.col("text")))).alias("token"))
        .distinct()
        .collect()
    )
    rows = [
        (t, est) for t in candidates if (est := sk.estimateCount(t)) >= 100
    ]
    return spark.createDataFrame(rows, "token string, est_tf bigint")


@query(
    "sketch_hll_distinct_users",
    oracle="""
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS est_users
    FROM events
    GROUP BY event_type
    UNION ALL
    SELECT 'ALL' AS event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS est_users
    FROM events
    ORDER BY event_type
    """,
)
def sketch_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count rollup: per-type DataSketches HLL
    sketches of user_id (``hll_sketch_agg``), with the global count
    derived by UNIONING THE SKETCHES (``hll_union_agg``) — never
    re-scanning the data. That re-aggregability is what makes
    pre-computed rollups work at 100 TB: daily sketches merge into
    monthly counts for free, which a plain COUNT(DISTINCT) can never
    do. At these cardinalities the sketch is in exact (sparse) mode, so
    the estimates equal the exact-oracle counts."""
    events = load_table(spark, "events", sf_dir)
    # lgConfigK=20: the sketch stays in exact coupon mode up to
    # ~2^(lgK-3) ≈ 131k distinct keys (covers sf1's 15k users; the
    # default lgK=12 promotes to approximate HLL mode at sf0.1 already).
    per_type = events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(20)).alias("sk")
    )
    per_type = per_type.persist()  # tiny: one sketch row per type
    out = per_type.select(
        "event_type", F.hll_sketch_estimate("sk").alias("est_users")
    ).unionByName(
        per_type.agg(
            F.lit("ALL").alias("event_type"),
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
        )
    )
    return out.orderBy("event_type")


@query(
    "sketch_kll_revenue_quantiles",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM orders GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           quantile_disc(rev_cents, 0.25) AS q25_cents,
           quantile_disc(rev_cents, 0.50) AS q50_cents,
           quantile_disc(rev_cents, 0.75) AS q75_cents,
           quantile_disc(rev_cents, 0.90) AS q90_cents
    FROM daily
    """,
)
def sketch_kll_revenue_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantiles: daily-revenue KLL sketches built PER MONTH
    (``kll_sketch_agg_bigint``), merged into the global distribution with
    ``kll_merge_agg_bigint`` — the rank-sketch analog of the HLL rollup
    above. At 100 TB the per-shard/per-day sketches are a few KB each and
    re-aggregate into any coarser rollup without re-reading the data,
    which an exact percentile (global sort) cannot do. Item count here is
    the number of distinct days (~2.4k, SF-independent), far below k=8192,
    so the sketch holds every item and quantiles are exact — matching
    DuckDB's ``quantile_disc`` (both use the inclusive rank rule)."""
    orders = load_table(spark, "orders", sf_dir)
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_cents")
    )
    monthly_partials = daily.groupBy(F.trunc("d", "month").alias("m")).agg(
        F.kll_sketch_agg_bigint("rev_cents", 8192).alias("sk")
    )
    merged = monthly_partials.agg(F.kll_merge_agg_bigint("sk", 8192).alias("sk"))
    return merged.select(
        F.kll_sketch_get_n_bigint("sk").alias("n_days"),
        F.kll_sketch_get_quantile_bigint("sk", F.lit(0.25)).alias("q25_cents"),
        F.kll_sketch_get_quantile_bigint("sk", F.lit(0.50)).alias("q50_cents"),
        F.kll_sketch_get_quantile_bigint("sk", F.lit(0.75)).alias("q75_cents"),
        F.kll_sketch_get_quantile_bigint("sk", F.lit(0.90)).alias("q90_cents"),
    )


@query(
    "sketch_theta_customer_overlap",
    oracle="""
    WITH urgent AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    ),
    other AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM urgent) AS urgent_custs,
           (SELECT CAST(count(*) AS BIGINT) FROM other) AS other_custs,
           (SELECT CAST(count(*) AS BIGINT)
              FROM (SELECT * FROM urgent UNION SELECT * FROM other)) AS union_custs,
           (SELECT CAST(count(*) AS BIGINT)
              FROM (SELECT * FROM urgent INTERSECT SELECT * FROM other)) AS overlap_custs,
           (SELECT CAST(count(*) AS BIGINT)
              FROM (SELECT * FROM urgent EXCEPT SELECT * FROM other)) AS urgent_only_custs
    """,
)
def sketch_theta_customer_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-set algebra on sketches: theta sketches of the customer
    sets behind urgent vs normal orders, then UNION / INTERSECTION /
    DIFFERENCE computed on the sketches alone (``theta_union`` etc.) —
    the one thing HLL cannot do (HLL unions but never intersects). At
    100 TB this answers audience-overlap questions from per-segment
    sketches without ever co-shuffling the raw keys. lgNomEntries=20
    (1M nominal) keeps the sketches in exact mode at every test SF, so
    every estimate equals the exact-distinct oracle."""
    orders = load_table(spark, "orders", sf_dir)
    grp = orders.withColumn(
        "is_urgent",
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int"),
    )
    sks = grp.groupBy("is_urgent").agg(
        F.theta_sketch_agg("o_custkey", 20).alias("sk")
    )
    pair = (
        sks.agg(
            F.max(F.when(F.col("is_urgent") == 1, F.col("sk"))).alias("a"),
            F.max(F.when(F.col("is_urgent") == 0, F.col("sk"))).alias("b"),
        )
    )
    return pair.select(
        F.round(F.theta_sketch_estimate("a")).cast("long").alias("urgent_custs"),
        F.round(F.theta_sketch_estimate("b")).cast("long").alias("other_custs"),
        # lgNomEntries on the union op too: theta_union defaults to
        # lgK=12 and would DOWNSAMPLE the (exact) inputs to ~4k entries.
        F.round(F.theta_sketch_estimate(F.theta_union("a", "b", 20)))
        .cast("long")
        .alias("union_custs"),
        F.round(F.theta_sketch_estimate(F.theta_intersection("a", "b")))
        .cast("long")
        .alias("overlap_custs"),
        F.round(F.theta_sketch_estimate(F.theta_difference("a", "b")))
        .cast("long")
        .alias("urgent_only_custs"),
    )
