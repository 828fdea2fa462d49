"""Data-quality and profiling analytics: the observability queries a
curation pipeline runs before trusting a 100 TB corpus.

All single-pass, JVM-expression-only plans: the column profile is one
aggregate over the table (no per-column re-scan), outlier detection is
one window over the per-type stats, the histogram is a fixed-width
bucket groupBy. Float thresholds never reach the output — rows are
selected by conditions both engines evaluate identically and outputs
are integer/bigint columns only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from log2sql_spark.registry import query
from log2sql_spark.sources.tables import load_table


@query(
    "quality_profile_orders",
    oracle="""
    SELECT 'o_orderkey' AS col,
           CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_null,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(min(o_orderkey) AS BIGINT) AS min_key,
           CAST(max(o_orderkey) AS BIGINT) AS max_key
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           CAST(count(*) - count(o_custkey) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT),
           CAST(min(o_custkey) AS BIGINT),
           CAST(max(o_custkey) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice_cents',
           CAST(count(*) - count(o_totalprice) AS BIGINT),
           CAST(count(DISTINCT CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT),
           CAST(min(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT),
           CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
    FROM orders
    ORDER BY col
    """,
)
def quality_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (null count / distinct / min / max per column)
    in ONE aggregate pass: every per-column statistic is an expression
    in a single groupBy().agg(), then the wide row unpivots to the
    long (col, stats) report. One scan of the table no matter how many
    columns are profiled — the per-column-loop alternative reads the
    table N times. Money profiles in integer cents (cross-engine exact)."""
    orders = load_table(spark, "orders", sf_dir)
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    wide = orders.agg(
        (F.count(F.lit(1)) - F.count("o_orderkey")).alias("o_orderkey__n_null"),
        F.countDistinct("o_orderkey").alias("o_orderkey__n_distinct"),
        F.min("o_orderkey").alias("o_orderkey__min_key"),
        F.max("o_orderkey").alias("o_orderkey__max_key"),
        (F.count(F.lit(1)) - F.count("o_custkey")).alias("o_custkey__n_null"),
        F.countDistinct("o_custkey").alias("o_custkey__n_distinct"),
        F.min("o_custkey").alias("o_custkey__min_key"),
        F.max("o_custkey").alias("o_custkey__max_key"),
        (F.count(F.lit(1)) - F.count("o_totalprice")).alias("o_totalprice_cents__n_null"),
        F.countDistinct(cents).alias("o_totalprice_cents__n_distinct"),
        F.min(cents).alias("o_totalprice_cents__min_key"),
        F.max(cents).alias("o_totalprice_cents__max_key"),
    )
    rows = []
    for col in ("o_custkey", "o_orderkey", "o_totalprice_cents"):
        rows.append(
            F.struct(
                F.lit(col).alias("col"),
                F.col(f"{col}__n_null").alias("n_null"),
                F.col(f"{col}__n_distinct").alias("n_distinct"),
                F.col(f"{col}__min_key").alias("min_key"),
                F.col(f"{col}__max_key").alias("max_key"),
            )
        )
    return (
        wide.select(F.explode(F.array(*rows)).alias("p"))
        .select("p.col", "p.n_null", "p.n_distinct", "p.min_key", "p.max_key")
        .orderBy("col")
    )


@query(
    "quality_zscore_outliers",
    oracle="""
    WITH stats AS (
      SELECT event_id, event_type, value,
             avg(value) OVER (PARTITION BY event_type) AS mu,
             stddev_samp(value) OVER (PARTITION BY event_type) AS sigma
      FROM events
    )
    SELECT event_id, event_type
    FROM stats
    WHERE value > mu + 3 * sigma
    ORDER BY event_id
    """,
)
def quality_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type 3-sigma outlier detection over the event value stream
    (the synthetic values are heavy-tailed: max ~10x the mean). One
    window computes mu/sigma per type; at cluster scale the same plan
    is a broadcast join of a 5-row stats aggregate instead — Catalyst
    picks that automatically if written as groupBy+join, but the window
    form keeps it one shuffle here. Only integer ids reach the output;
    the float threshold is evaluated identically by both engines (no
    value sits within 1e-9 of the 3-sigma boundary — verified at every
    SF)."""
    events = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("event_type")
    return (
        events.select(
            "event_id",
            "event_type",
            "value",
            F.avg("value").over(w).alias("mu"),
            F.stddev_samp("value").over(w).alias("sigma"),
        )
        .filter(F.col("value") > F.col("mu") + 3 * F.col("sigma"))
        .select("event_id", "event_type")
        .orderBy("event_id")
    )


@query(
    "quality_value_histogram",
    oracle="""
    SELECT CAST(floor(value / 25) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events
    GROUP BY 1
    ORDER BY bucket
    """,
)
def quality_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of the event value distribution: bucket =
    floor(value/25). Fixed edges (not data-derived quantiles) keep the
    bucketing embarrassingly parallel and deterministic across engines;
    the per-bucket mass is summed in integer cents. Map-side partial
    aggregation means the shuffle carries one row per bucket per task."""
    events = load_table(spark, "events", sf_dir)
    return (
        events.groupBy(
            F.floor(F.col("value") / 25).cast("bigint").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sum_cents"),
        )
        .orderBy("bucket")
    )


@query(
    "quality_expectations_orders",
    oracle="""
    WITH n AS (SELECT CAST(count(*) AS BIGINT) AS rows_checked FROM orders),
    rep AS (
      SELECT 'orders_custkey_not_null' AS rule,
             CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS violations,
             (SELECT rows_checked FROM n) AS rows_checked
      FROM orders
      UNION ALL
      SELECT 'orders_status_domain',
             CAST(count(*) FILTER (WHERE o_orderstatus IS NULL
                                      OR o_orderstatus NOT IN ('O','F')) AS BIGINT),
             (SELECT rows_checked FROM n)
      FROM orders
      UNION ALL
      SELECT 'orders_price_range',
             CAST(count(*) FILTER (WHERE o_totalprice IS NULL
                                      OR o_totalprice < 1000
                                      OR o_totalprice > 400000) AS BIGINT),
             (SELECT rows_checked FROM n)
      FROM orders
      UNION ALL
      SELECT 'orders_priority_shape',
             CAST(count(*) FILTER (WHERE o_orderpriority IS NULL
                                      OR NOT regexp_matches(o_orderpriority, '^[1-5]-')) AS BIGINT),
             (SELECT rows_checked FROM n)
      FROM orders
      UNION ALL
      SELECT 'orders_orderkey_unique',
             CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT),
             (SELECT rows_checked FROM n)
      FROM orders
      UNION ALL
      SELECT 'orders_custkey_fk_customer',
             (SELECT CAST(count(*) AS BIGINT) FROM orders o
              LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
                ON o.o_custkey = c.c_custkey
              WHERE c.c_custkey IS NULL),
             (SELECT rows_checked FROM n)
    )
    SELECT rule, violations, rows_checked,
           CAST(violations = 0 AS INT) AS passed
    FROM rep
    ORDER BY rule
    """,
)
def quality_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectations over ``orders``: six rules (NOT NULL,
    domain, range, regex shape, key uniqueness, FK to customer) compiled
    by ``operators/expectations.py`` into one conditional-sum aggregate
    for all four row-level rules + one keyed aggregate (unique) + one
    broadcast anti-join (FK). The report is one row per rule whatever
    the table size — the pre-flight gate a 100 TB load runs before
    publishing a snapshot. The domain/range rules are deliberately
    strict enough to FAIL on real data ('P' status, sub-$1000 orders),
    so the violation counts are live numbers, not zeros."""
    from log2sql_spark.operators import expectations as X

    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    rules = [
        X.not_null("orders_custkey_not_null", "o_custkey"),
        X.in_set("orders_status_domain", "o_orderstatus", ["O", "F"]),
        X.between("orders_price_range", "o_totalprice", 1000.0, 400000.0),
        X.matches("orders_priority_shape", "o_orderpriority", "^[1-5]-"),
        X.unique("orders_orderkey_unique", "o_orderkey"),
        X.foreign_key("orders_custkey_fk_customer", "o_custkey", customer, "c_custkey"),
    ]
    return X.check_expectations(orders, rules)


@query(
    "quality_benford_first_digit",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit
      FROM orders WHERE o_totalprice > 0
    ),
    c AS (
      SELECT digit, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(count(*)) OVER () AS BIGINT) AS total
      FROM d GROUP BY digit
    )
    SELECT digit, n,
           n * 10000 // total AS share_bp,
           CAST(floor(log10(1.0 + 1.0 / digit) * 10000) AS BIGINT) AS benford_bp
    FROM c
    ORDER BY digit
    """,
)
def quality_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit — the fraud/corruption screen on monetary
    columns: observed first-digit shares (basis points, integer
    division) against the Benford expectation floor(log10(1+1/d)·1e4).
    One map-side-combined aggregate over 9 groups + a 9-row window; the
    scan is the only data-sized cost at any scale. (The synthetic
    uniform-ish totals will NOT follow Benford — the point is the
    measurement, and the expectation column is a constant table both
    engines derive identically.)"""
    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_totalprice") > 0)
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"), 1, 1
    ).cast("bigint")
    c = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    total = F.sum("n").over(Window.partitionBy())
    return (
        c.withColumn("total", total)
        .select(
            "digit",
            "n",
            F.expr("n * 10000 div total").alias("share_bp"),
            F.floor(F.log10(1.0 + 1.0 / F.col("digit")) * 10000)
            .cast("bigint")
            .alias("benford_bp"),
        )
        .orderBy("digit")
    )


@query(
    "quality_schema_drift",
    oracle="""
    WITH monthly AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
             CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
      FROM orders GROUP BY 1
    )
    , m2 AS (
      SELECT *, sum_cents // n_rows AS mean_cents FROM monthly
    )
    SELECT month, n_rows, sum_cents, n_statuses, n_customers, mean_cents,
           mean_cents * 10000 // lag(mean_cents) OVER w - 10000 AS mean_drift_bp,
           n_rows * 10000 // lag(n_rows) OVER w - 10000 AS volume_drift_bp
    FROM m2
    WINDOW w AS (ORDER BY month)
    ORDER BY month
    """,
)
def quality_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month data-drift monitor on the orders feed: row
    volume, value mass, status-domain cardinality, and distinct-customer
    coverage per month, with basis-point drift of mean order value and
    volume vs the previous month — the train/serving-skew check a
    pipeline runs before trusting a new data drop. Drift is computed on
    the truncated integer means (both engines truncate identically, and
    the operands stay < 2^48 at any scale — cross-multiplying raw sums
    overflows bigint at sf1+), so the basis points hash exactly
    cross-engine; the window
    runs over |months| rows, never orders."""
    orders = load_table(spark, "orders", sf_dir)
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("long")
        .alias("sum_cents"),
        F.count_distinct("o_orderstatus").cast("long").alias("n_statuses"),
        F.count_distinct("o_custkey").cast("long").alias("n_customers"),
    )
    w = Window.orderBy("month")
    return (
        monthly.withColumn(
            "mean_cents", F.expr("sum_cents DIV n_rows")
        )
        .withColumn("_prev_n", F.lag("n_rows").over(w))
        .withColumn("_prev_mean", F.lag("mean_cents").over(w))
        .withColumn(
            "mean_drift_bp",
            F.expr("mean_cents * 10000 DIV _prev_mean - 10000"),
        )
        .withColumn(
            "volume_drift_bp", F.expr("n_rows * 10000 DIV _prev_n - 10000")
        )
        .drop("_prev_n", "_prev_mean")
        .orderBy("month")
    )


@query(
    "quality_pareto_abc",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey AS cust,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_cust,
             CAST(sum(cents) AS BIGINT) AS total_cents
      FROM per_cust
    ), ranked AS (
      SELECT cust, cents,
             row_number() OVER (ORDER BY cents DESC, cust) AS rnk,
             sum(cents) OVER (ORDER BY cents DESC, cust
                              ROWS UNBOUNDED PRECEDING) AS cum_cents
      FROM per_cust
    )
    SELECT CASE WHEN rnk * 100 <= (SELECT n_cust FROM tot) * 20 THEN 'A'
                WHEN rnk * 100 <= (SELECT n_cust FROM tot) * 50 THEN 'B'
                ELSE 'C' END AS abc_class,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(cents) AS BIGINT) AS cents,
           CAST(max(cum_cents) * 10000 // (SELECT total_cents FROM tot)
                AS BIGINT) AS cum_share_bp
    FROM ranked
    GROUP BY 1 ORDER BY abc_class
    """,
)
def quality_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC concentration analysis: customers ranked by revenue,
    classed A (top 20%), B (next 30%), C (rest), with each class's
    cumulative revenue share in basis points — the 80/20 readout every
    revenue dashboard carries. The global sort touches |customers|
    (never orders); class cuts and shares are truncating integer
    cross-multiplication with a (cents desc, cust) total order, so the
    classing is deterministic cross-engine."""
    from pyspark.sql import Window as W

    orders = load_table(spark, "orders", sf_dir)
    per_cust = orders.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("long")
        .alias("cents")
    )
    tot = per_cust.agg(
        F.count(F.lit(1)).cast("long").alias("n_cust"),
        F.sum("cents").cast("long").alias("total_cents"),
    )
    w = W.orderBy(F.desc("cents"), F.asc("cust"))
    ranked = per_cust.withColumn("rnk", F.row_number().over(w)).withColumn(
        "cum_cents", F.sum("cents").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .withColumn(
            "abc_class",
            F.when(F.col("rnk") * 100 <= F.col("n_cust") * 20, "A")
            .when(F.col("rnk") * 100 <= F.col("n_cust") * 50, "B")
            .otherwise("C"),
        )
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("cents").cast("long").alias("cents"),
            F.expr("max(cum_cents) * 10000 DIV any_value(total_cents)")
            .cast("long")
            .alias("cum_share_bp"),
        )
        .orderBy("abc_class")
    )


@query(
    "quality_key_skew_gini",
    oracle="""
    WITH per_key AS (
      SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ), ranked AS (
      SELECT x, row_number() OVER (ORDER BY x, k) AS i FROM per_key
    ), s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(i * x) AS BIGINT) AS six,
             CAST(max(x) AS BIGINT) AS max_x
      FROM ranked
    )
    SELECT n AS n_keys, sx AS n_rows, max_x AS max_per_key,
           max_x * 10000 // (sx // n) AS max_over_mean_bp,
           (2 * six * 10000 // (n * sx)) - ((n + 1) * 10000 // n) AS gini_bp
    FROM s
    """,
)
def quality_key_skew_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew report: the Gini coefficient of the per-key row
    distribution (0 = uniform, →10000 bp = one hot key) plus the
    max/mean ratio — the number that predicts whether a shuffle on
    this key needs salting or AQE skew handling BEFORE the job runs.
    Gini via the rank formula G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n over the
    (x, k)-sorted keys, all truncating integer cross-multiplication;
    the global sort touches |keys|, never rows."""
    from pyspark.sql import Window as W

    orders = load_table(spark, "orders", sf_dir)
    per_key = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    ranked = per_key.withColumn(
        "i", F.row_number().over(W.orderBy(F.asc("x"), F.asc("k")))
    )
    s = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("i") * F.col("x")).cast("long").alias("six"),
        F.max("x").cast("long").alias("max_x"),
    )
    return s.select(
        F.col("n").alias("n_keys"),
        F.col("sx").alias("n_rows"),
        F.col("max_x").alias("max_per_key"),
        F.expr("max_x * 10000 DIV (sx DIV n)").alias("max_over_mean_bp"),
        F.expr("(2 * six * 10000 DIV (n * sx)) - ((n + 1) * 10000 DIV n)").alias(
            "gini_bp"
        ),
    )


@query(
    "quality_ks_drift",
    oracle="""
    WITH labeled AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
             CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 0 ELSE 1 END AS g
      FROM orders
    ), n AS (
      SELECT CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
      FROM labeled
    ), per_v AS (
      SELECT v,
             CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
             CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
      FROM labeled GROUP BY v
    ), cdf AS (
      SELECT v,
             sum(c0) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS f0,
             sum(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS f1
      FROM per_v
    )
    SELECT (SELECT n0 FROM n) AS n_before,
           (SELECT n1 FROM n) AS n_after,
           CAST(max(abs(f0 * (SELECT n1 FROM n) - f1 * (SELECT n0 FROM n)))
                * 10000
                // ((SELECT n0 FROM n) * (SELECT n1 FROM n)) AS BIGINT)
             AS ks_bp
    FROM cdf
    """,
)
def quality_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov–Smirnov drift statistic between the order-value
    distributions before/after 1998 — the CONTINUOUS-distribution
    drift test beside the categorical chi-square screen: KS = max
    |CDF_a − CDF_b| over the merged support, computed exactly as
    integer cross-multiplication (|F0·n1 − F1·n0| over n0·n1, reported
    in basis points — no float CDFs to diverge). One aggregate per
    distinct value, one value-ordered window over the |distinct values|
    rollup (never the raw rows), one max."""
    from pyspark.sql import Window as W

    orders = load_table(spark, "orders", sf_dir)
    labeled = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
        F.when(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"), 0)
        .otherwise(1)
        .alias("g"),
    )
    n = labeled.agg(
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).cast("long").alias("n0"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).cast("long").alias("n1"),
    )
    per_v = labeled.groupBy("v").agg(
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).cast("long").alias("c0"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).cast("long").alias("c1"),
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    cdf = per_v.select(
        F.sum("c0").over(w).alias("f0"), F.sum("c1").over(w).alias("f1")
    )
    return (
        cdf.crossJoin(F.broadcast(n))
        .agg(
            F.first("n0").alias("n_before"),
            F.first("n1").alias("n_after"),
            F.expr(
                "CAST(max(abs(f0 * n1 - f1 * n0)) * 10000"
                " DIV (first(n0) * first(n1)) AS BIGINT)"
            ).alias("ks_bp"),
        )
    )


@query(
    "quality_k_anonymity",
    oracle="""
    WITH grp AS (
      SELECT c_mktsegment AS segment, CAST(c_nationkey AS BIGINT) AS nation,
             CAST(count(*) AS BIGINT) AS n
      FROM customer GROUP BY 1, 2
    ), stats AS (
      SELECT CAST(min(n) AS BIGINT) AS k_anonymity,
             CAST(count(*) AS BIGINT) AS n_groups,
             CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS groups_under_5,
             CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
               AS rows_at_risk
      FROM grp
    )
    SELECT * FROM stats
    """,
)
def quality_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier pair (market
    segment, nation): the dataset's k is the SMALLEST equivalence
    class — any release is only as anonymous as its rarest
    combination — plus how many classes and rows fall under k=5 (the
    re-identifiable tail a privacy review must suppress or generalize
    before sharing). The privacy-measurement companion to the PII
    scrubber (llm_pii_redact removes direct identifiers; quasi-
    identifier combinations re-identify AROUND redaction, which is
    what k-anonymity quantifies). One aggregate over the quasi-ID
    rollup — row count never matters."""
    customer = load_table(spark, "customer", sf_dir)
    grp = customer.groupBy(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").cast("long").alias("nation"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    return grp.agg(
        F.min("n").cast("long").alias("k_anonymity"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(F.col("n") < 5, 1).otherwise(0))
        .cast("long")
        .alias("groups_under_5"),
        F.sum(F.when(F.col("n") < 5, F.col("n")).otherwise(0))
        .cast("long")
        .alias("rows_at_risk"),
    )


@query(
    "quality_reconciliation_tieout",
    oracle="""
    WITH li AS (
      SELECT l_orderkey AS k,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS li_cents
      FROM lineitem GROUP BY 1
    ), o AS (
      SELECT o_orderkey AS k,
             CAST(round(o_totalprice * 100) AS BIGINT) AS o_cents
      FROM orders
    ), joined AS (
      SELECT o.k, o.o_cents, li.li_cents FROM o LEFT JOIN li USING (k)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN li_cents IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_headers_without_lines,
           (SELECT CAST(count(*) AS BIGINT) FROM li
             WHERE k NOT IN (SELECT k FROM o)) AS n_orphan_line_groups,
           CAST(sum(CASE WHEN li_cents IS NOT NULL
                          AND abs(o_cents - li_cents) <= 100
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_tied,
           CAST(sum(CASE WHEN li_cents IS NOT NULL
                          AND abs(o_cents - li_cents) > 100
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatched,
           CAST(sum(CASE WHEN li_cents IS NOT NULL
                    THEN abs(o_cents - li_cents) ELSE 0 END) AS BIGINT)
             AS total_abs_drift_cents
    FROM joined
    """,
)
def quality_reconciliation_tieout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Finance-style reconciliation: do order headers tie out against
    their line-item rollup? Reports headers without lines, orphan line
    groups, orders tied within a 1.00 tolerance, mismatches, and the
    total absolute drift — all integer cents, one rollup + one join on
    the order key. On THIS dataset the answer is 'the feed does not
    tie out' (the generator never enforces header = Σ lines), which is
    precisely what a reconciliation control exists to detect — the
    report is the finding, and both engines agree on it to the cent."""
    li = load_table(spark, "lineitem", sf_dir).groupBy(
        F.col("l_orderkey").alias("k")
    ).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            .cast("bigint")
        )
        .cast("long")
        .alias("li_cents")
    )
    o = load_table(spark, "orders", sf_dir).select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("o_cents"),
    )
    joined = o.join(li, "k", "left")
    orphans = li.join(o, "k", "left_anti").agg(
        F.count(F.lit(1)).cast("long").alias("n_orphan_line_groups")
    )
    drift = F.when(
        F.col("li_cents").isNotNull(), F.abs(F.col("o_cents") - F.col("li_cents"))
    )
    return (
        joined.agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.when(F.col("li_cents").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_headers_without_lines"),
            F.sum(F.when(drift <= 100, 1).otherwise(0))
            .cast("long")
            .alias("n_tied"),
            F.sum(F.when(drift > 100, 1).otherwise(0))
            .cast("long")
            .alias("n_mismatched"),
            F.sum(F.coalesce(drift, F.lit(0))).cast("long").alias(
                "total_abs_drift_cents"
            ),
        )
        .crossJoin(F.broadcast(orphans))
        .select(
            "n_orders",
            "n_headers_without_lines",
            "n_orphan_line_groups",
            "n_tied",
            "n_mismatched",
            "total_abs_drift_cents",
        )
    )


@query(
    "quality_referential_orphans",
    oracle="""
    WITH dim AS (
      SELECT c_custkey FROM customer WHERE c_custkey % 97 <> 0
    ),
    e1 AS (
      SELECT 'lineitem.l_orderkey->orders' AS fk_edge,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_orphans,
             CAST(count(DISTINCT CASE WHEN o.o_orderkey IS NULL
                                      THEN l.l_orderkey END)
                  AS BIGINT) AS n_orphan_keys
      FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    e2 AS (
      SELECT 'orders.o_custkey->customer(partial)',
             CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN d.c_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT),
             CAST(count(DISTINCT CASE WHEN d.c_custkey IS NULL
                                      THEN o.o_custkey END)
                  AS BIGINT)
      FROM orders o LEFT JOIN dim d ON o.o_custkey = d.c_custkey
    ),
    e3 AS (
      SELECT 'lineitem.l_suppkey->supplier',
             CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT),
             CAST(count(DISTINCT CASE WHEN s.s_suppkey IS NULL
                                      THEN l.l_suppkey END)
                  AS BIGINT)
      FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
    ),
    e4 AS (
      SELECT 'customer.c_nationkey->nation',
             CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT),
             CAST(count(DISTINCT CASE WHEN n.n_nationkey IS NULL
                                      THEN c.c_nationkey END)
                  AS BIGINT)
      FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    SELECT * FROM e1 UNION ALL SELECT * FROM e2
    UNION ALL SELECT * FROM e3 UNION ALL SELECT * FROM e4
    ORDER BY fk_edge
    """,
)
def quality_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for four FK edges in
    one report — the control a warehouse load runs before publishing
    (and a CDC apply runs after, to prove the replayed child rows all
    land under replayed parents). One edge audits against a
    deliberately PARTIAL dimension (customers with c_custkey % 97
    dropped — the simulated mid-load dim) so the control demonstrably
    fires: orphan counts there are nonzero and deterministic, the
    intact edges prove the zero case.

    Each edge is ONE left join + aggregate — total rows, orphan rows,
    and distinct orphan keys come out of the same pass (no anti-join
    second scan). The joins shuffle on the FK at scale with the small
    dims broadcast; the four audits are independent branches unioned
    at the 4-row report level, so they run as parallel stages, not a
    sequential driver loop.

    Reference analog: the unique-key fallback (log2sql.py:29-46)
    trusts the catalog; this is the downstream audit of that trust.
    """
    lineitem = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    supplier = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)

    def audit(fact, fk, dim, pk, label, small_dim=False):
        # broadcast is an explicit per-edge decision: nation/supplier
        # stay dim-sized at any SF, but orders/customer grow with the
        # facts — those edges must shuffle on the FK (AQE picks
        # broadcast anyway when the runtime size allows).
        d = dim.select(F.col(pk).alias("_pk"))
        if small_dim:
            d = F.broadcast(d)
        j = fact.select(F.col(fk).alias("_fk")).join(
            d, F.col("_fk") == F.col("_pk"), "left"
        )
        orphan = F.col("_pk").isNull()
        return j.agg(
            F.lit(label).alias("fk_edge"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(orphan.cast("int")).cast("long").alias("n_orphans"),
            F.countDistinct(F.when(orphan, F.col("_fk")))
            .cast("long")
            .alias("n_orphan_keys"),
        )

    partial_dim = customer.filter(F.col("c_custkey") % 97 != 0)
    report = (
        audit(lineitem, "l_orderkey", orders, "o_orderkey",
              "lineitem.l_orderkey->orders")
        .unionByName(audit(orders, "o_custkey", partial_dim, "c_custkey",
                           "orders.o_custkey->customer(partial)"))
        .unionByName(audit(lineitem, "l_suppkey", supplier, "s_suppkey",
                           "lineitem.l_suppkey->supplier", small_dim=True))
        .unionByName(audit(customer, "c_nationkey", nation, "n_nationkey",
                           "customer.c_nationkey->nation", small_dim=True))
    )
    return report.orderBy("fk_edge")


@query(
    "quality_json_schema_validate",
    oracle="""
    WITH fx AS (
      SELECT event_type,
             '{"role":"user","content":"c' || (event_id % 100)
               || '","turns":' || (event_id % 100) || '}' AS base,
             event_id % 5 AS defect
      FROM events
    ), payload AS (
      SELECT event_type,
             CASE defect
               WHEN 0 THEN left(base, length(base) - 1)
               WHEN 1 THEN replace(base, '"role":"user",', '')
               WHEN 2 THEN regexp_replace(base, '"turns":[0-9]+', '"turns":"x"')
               ELSE base END AS j
      FROM fx
    ), checked AS (
      SELECT event_type,
             json_valid(j) AS ok,
             CASE WHEN json_valid(j)
                  THEN json_extract_string(j, '$.role') END AS role,
             CASE WHEN json_valid(j)
                  THEN try_cast(json_extract_string(j, '$.turns') AS BIGINT)
             END AS turns
      FROM payload
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN NOT ok THEN 1 ELSE 0 END) AS BIGINT)
             AS n_parse_fail,
           CAST(sum(CASE WHEN ok AND role IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_missing_role,
           CAST(sum(CASE WHEN ok AND role IS NOT NULL AND turns IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_turns,
           CAST(sum(CASE WHEN ok AND role IS NOT NULL AND turns IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_valid
    FROM checked
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def quality_json_schema_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema validation over a JSON payload column — the gate an SFT/
    chat-format ingest runs before training (role present, turn count
    an integer, document parseable at all), reported as per-source
    counts. The corpus's props are trivially clean, so the query
    plants the three real defect classes deterministically (truncated
    document, missing required key, wrong-typed field) on event_id
    buckets — both engines build the identical payloads, so every
    counter is exercised and cross-checked rather than asserting
    zeros on an unexercised branch.

    Validation is pure JVM JSON path extraction (get_json_object +
    try_cast — invalid documents extract NULL rather than erroring,
    Spark's PERMISSIVE discipline) folded into one map-side-combined
    aggregate: at 100 TB this is a codegen scan emitting 5 groups, no
    shuffle of payloads, no Python, no schema inference pass.

    Reference analog: none (extension surface, SURVEY.md §2.2);
    complements source_json_corrupt_recovery (file-level corrupt
    records) with field-level schema conformance.
    """
    events = load_table(spark, "events", sf_dir).select("event_id", "event_type")
    k = (F.col("event_id") % 100).cast("string")
    base = F.concat(
        F.lit('{"role":"user","content":"c'), k,
        F.lit('","turns":'), k, F.lit("}"),
    )
    defect = F.col("event_id") % 5
    staged = events.select("event_type", defect.alias("defect"), base.alias("base"))
    j = (
        F.when(F.col("defect") == 0, F.expr("left(base, length(base) - 1)"))
        .when(F.col("defect") == 1, F.regexp_replace("base", r'"role":"user",', ""))
        .when(
            F.col("defect") == 2,
            F.regexp_replace("base", r'"turns":[0-9]+', '"turns":"x"'),
        )
        .otherwise(F.col("base"))
    )
    checked = staged.select("event_type", j.alias("j")).select(
        "event_type",
        F.get_json_object("j", "$").isNotNull().alias("ok"),
        F.get_json_object("j", "$.role").alias("role"),
        F.expr("try_cast(get_json_object(j, '$.turns') AS BIGINT)").alias("turns"),
    )
    return (
        checked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum((~F.col("ok")).cast("int")).cast("long").alias("n_parse_fail"),
            F.sum((F.col("ok") & F.col("role").isNull()).cast("int"))
            .cast("long")
            .alias("n_missing_role"),
            F.sum(
                (F.col("ok") & F.col("role").isNotNull() & F.col("turns").isNull())
                .cast("int")
            ).cast("long").alias("n_bad_turns"),
            F.sum(
                (
                    F.col("ok")
                    & F.col("role").isNotNull()
                    & F.col("turns").isNotNull()
                ).cast("int")
            ).cast("long").alias("n_valid"),
        )
        .orderBy("event_type")
    )


@query(
    "quality_psi_drift",
    oracle="""
    WITH binned AS (
      SELECT least(CAST(floor(o_totalprice / 50000) AS BIGINT), 5) AS bin,
             CASE WHEN year(o_orderdate) < 1998 THEN 'a' ELSE 'b' END AS pop
      FROM orders
    ), bins AS (
      SELECT unnest(generate_series(0, 5)) AS bin
    ), counts AS (
      SELECT bins.bin,
             CAST(coalesce(sum(CASE WHEN pop = 'a' THEN 1 END), 0) AS BIGINT)
               AS n_a,
             CAST(coalesce(sum(CASE WHEN pop = 'b' THEN 1 END), 0) AS BIGINT)
               AS n_b
      FROM bins LEFT JOIN binned ON binned.bin = bins.bin
      GROUP BY bins.bin
    ), tot AS (
      SELECT sum(n_a) AS t_a, sum(n_b) AS t_b, count(*) AS k FROM counts
    ), contrib AS (
      SELECT bin, n_a, n_b,
             (CAST(n_a + 1 AS DOUBLE) / (t_a + k)
              - CAST(n_b + 1 AS DOUBLE) / (t_b + k))
             * ln((CAST(n_a + 1 AS DOUBLE) / (t_a + k))
                  / (CAST(n_b + 1 AS DOUBLE) / (t_b + k))) AS c
      FROM counts, tot
    )
    SELECT bin, n_a, n_b, round(c, 6) AS psi_contrib,
           round(sum(c) OVER (), 6) AS psi_total
    FROM contrib ORDER BY bin
    """,
)
def quality_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the pre-1998 and 1998+ order
    populations over fixed 50k-wide total-price bins — THE standard ML
    feature-drift monitor (PSI < 0.1 stable, > 0.25 retrain). Laplace
    +1 smoothing keeps empty bins finite and the spine join keeps every
    bin present in both populations, so the per-bin contribution
    (p−q)·ln(p/q) is defined everywhere; doubles are IEEE-identical
    cross-engine from exact integer counts (the llm_token_entropy
    precedent) and rounded to 6 dp. One scan, one 6-row aggregate —
    the bin histogram is the only thing shuffled, never orders rows.
    Complements quality_ks_drift (continuous CDF shift) with the binned
    production-monitoring variant. Reference analog: none — quality
    extension (SURVEY.md §2.2)."""
    orders = load_table(spark, "orders", sf_dir)
    binned = orders.select(
        F.least(F.floor(F.col("o_totalprice") / 50000), F.lit(5))
        .cast("long")
        .alias("bin"),
        F.when(F.year("o_orderdate") < 1998, "a").otherwise("b").alias("pop"),
    )
    bins = spark.range(0, 6).select(F.col("id").cast("long").alias("bin"))
    counts = (
        bins.join(binned, "bin", "left")
        .groupBy("bin")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("pop") == "a", 1)), F.lit(0)
            ).cast("long").alias("n_a"),
            F.coalesce(
                F.sum(F.when(F.col("pop") == "b", 1)), F.lit(0)
            ).cast("long").alias("n_b"),
        )
    )
    tot = counts.agg(
        F.sum("n_a").alias("t_a"),
        F.sum("n_b").alias("t_b"),
        F.count(F.lit(1)).alias("k"),
    )
    p = (F.col("n_a") + 1).cast("double") / (F.col("t_a") + F.col("k"))
    q = (F.col("n_b") + 1).cast("double") / (F.col("t_b") + F.col("k"))
    contrib = counts.crossJoin(F.broadcast(tot)).select(
        "bin", "n_a", "n_b", ((p - q) * F.log(p / q)).alias("c")
    )
    return contrib.select(
        "bin",
        "n_a",
        "n_b",
        F.round("c", 6).alias("psi_contrib"),
        F.round(F.sum("c").over(Window.partitionBy()), 6).alias("psi_total"),
    ).orderBy("bin")


@query(
    "quality_l_diversity",
    oracle="""
    WITH sens AS (
      SELECT c_mktsegment AS segment, CAST(c_nationkey AS BIGINT) AS nation,
             CAST(floor(round(c_acctbal * 100) / 200000) AS BIGINT) AS bal_band
      FROM customer
    ), grp AS (
      SELECT segment, nation,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT bal_band) AS BIGINT) AS l
      FROM sens GROUP BY 1, 2
    )
    SELECT CAST(min(l) AS BIGINT) AS l_diversity,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS groups_under_3,
           CAST(sum(CASE WHEN l < 3 THEN n ELSE 0 END) AS BIGINT)
             AS rows_exposed
    FROM grp
    """,
)
def quality_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l-diversity audit — the attack k-anonymity misses: a
    class can be large (k-anonymous) yet have every member share ONE
    sensitive value, so membership alone discloses it (homogeneity
    attack; Machanavajjhala et al., ICDE 2006). Over the same quasi-ID
    classes as quality_k_anonymity (segment, nation) with the account
    balance banded to 2000-unit integers as the sensitive attribute:
    the dataset's l is the smallest per-class count of distinct
    sensitive values, plus the classes and rows below l=3 a release
    would need to generalize. Banding goes through integer cents so
    the band edges are engine-exact. Same one-aggregate shape as the
    k-anonymity screen — the quasi-ID rollup is all that shuffles."""
    customer = load_table(spark, "customer", sf_dir)
    sens = customer.select(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").cast("long").alias("nation"),
        F.floor(
            F.round(F.col("c_acctbal") * 100) / 200000
        ).cast("long").alias("bal_band"),
    )
    grp = sens.groupBy("segment", "nation").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_distinct("bal_band").cast("long").alias("l"),
    )
    return grp.agg(
        F.min("l").cast("long").alias("l_diversity"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(F.col("l") < 3, 1).otherwise(0))
        .cast("long")
        .alias("groups_under_3"),
        F.sum(F.when(F.col("l") < 3, F.col("n")).otherwise(0))
        .cast("long")
        .alias("rows_exposed"),
    )


@query(
    "quality_fd_violations",
    oracle="""
    WITH checks AS (
      SELECT 'lineitem: partkey->suppkey' AS fd, l_partkey AS x,
             CAST(count(DISTINCT l_suppkey) AS BIGINT) AS variants,
             CAST(count(*) AS BIGINT) AS n FROM lineitem GROUP BY 1, 2
      UNION ALL
      SELECT 'orders: custkey->priority' AS fd, o_custkey AS x,
             CAST(count(DISTINCT o_orderpriority) AS BIGINT),
             CAST(count(*) AS BIGINT) FROM orders GROUP BY 1, 2
      UNION ALL
      SELECT 'customer: custkey->nationkey' AS fd, c_custkey AS x,
             CAST(count(DISTINCT c_nationkey) AS BIGINT),
             CAST(count(*) AS BIGINT) FROM customer GROUP BY 1, 2
    )
    SELECT fd,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(CASE WHEN variants > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS violating_keys,
           CAST(sum(CASE WHEN variants > 1 THEN n ELSE 0 END) AS BIGINT)
             AS violating_rows,
           CAST(max(variants) AS BIGINT) AS max_variants
    FROM checks
    GROUP BY fd
    ORDER BY fd
    """,
)
def quality_fd_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit — the data-profiling control that
    catches denormalization drift before a join fans out: for each
    CLAIMED dependency X→Y, how many X keys map to more than one Y
    (and how many rows sit in those groups). Three probes: two that
    genuinely fail on this data (a part ships from many suppliers; a
    customer orders at many priorities — the measured fan-out a naive
    'join on partkey, take the supplier' pipeline would silently
    multiply rows by) and the key→attribute control that must report
    ZERO violations (customer→nation). One map-side-combined rollup
    per dependency, shuffling |distinct X| partials — the raw tables
    are each read once. Companion to quality_referential_orphans
    (which audits edges that must EXIST; this audits edges that must
    be UNIQUE). Reference analog: none — quality extension
    (SURVEY.md §2.2)."""
    lineitem = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)

    def probe(df: DataFrame, fd: str, x: str, y: str) -> DataFrame:
        # per-group COUNT DISTINCT restated as two map-side-combined
        # aggregates ((x,y) rollup, then x) — no expand/two-phase
        # distinct plan, and the first shuffle already carries only
        # |distinct (x,y)| partials (1.6x faster at sf1)
        xy = df.groupBy(F.col(x).alias("x"), F.col(y).alias("y")).agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        return xy.groupBy("x").agg(
            F.count(F.lit(1)).cast("long").alias("variants"),
            F.sum("n").cast("long").alias("n"),
        ).select(F.lit(fd).alias("fd"), "x", "variants", "n")

    checks = (
        probe(lineitem, "lineitem: partkey->suppkey", "l_partkey", "l_suppkey")
        .unionByName(
            probe(orders, "orders: custkey->priority", "o_custkey", "o_orderpriority")
        )
        .unionByName(
            probe(customer, "customer: custkey->nationkey", "c_custkey", "c_nationkey")
        )
    )
    return (
        checks.groupBy("fd")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum(F.when(F.col("variants") > 1, 1).otherwise(0))
            .cast("long")
            .alias("violating_keys"),
            F.sum(F.when(F.col("variants") > 1, F.col("n")).otherwise(0))
            .cast("long")
            .alias("violating_rows"),
            F.max("variants").cast("long").alias("max_variants"),
        )
        .orderBy("fd")
    )


@query(
    "quality_histogram_equidepth",
    oracle="""
    WITH vals AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(count(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1
    ), cum AS (
      SELECT cents, cnt,
             sum(cnt) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS c,
             sum(cnt) OVER () AS n
      FROM vals
    )
    SELECT CAST((c - cnt) * 10 // n + 1 AS BIGINT) AS bin,
           CAST(min(cents) AS BIGINT) AS lo_cents,
           CAST(max(cents) AS BIGINT) AS hi_cents,
           CAST(sum(cnt) AS BIGINT) AS n_rows
    FROM cum
    GROUP BY 1
    ORDER BY bin
    """,
)
def quality_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram of order totals — the pair-completion of
    quality_value_histogram's fixed-width bins and the statistic a
    cost-based optimizer (and repartitionByRange's sampler) actually
    wants: 10 bins holding ~equal row counts, with data-derived edges.
    Each distinct value lands in the bin of its FIRST rank —
    bin = (cum − cnt)·10 DIV n + 1, pure integer arithmetic over exact
    cumulative counts, so a heavy value never splits and both engines
    hash identically (the KS-drift precedent). Aggregate-then-sort
    discipline: the global window orders |distinct values|, never raw
    rows — the raw table only feeds one map-side-combined count
    aggregate."""
    orders = load_table(spark, "orders", sf_dir)
    from pyspark.sql import Window as W

    vals = orders.groupBy(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w = W.orderBy("cents").rowsBetween(W.unboundedPreceding, 0)
    cum = vals.select(
        "cents",
        "cnt",
        F.sum("cnt").over(w).alias("c"),
        F.sum("cnt").over(W.partitionBy()).alias("n"),
    )
    return (
        cum.groupBy(
            F.expr("(c - cnt) * 10 DIV n").cast("bigint").alias("bin")
        )
        .agg(
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
            F.sum("cnt").alias("n_rows"),
        )
        .withColumn("bin", F.col("bin") + 1)
        .select("bin", "lo_cents", "hi_cents", "n_rows")
        .orderBy("bin")
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH vals AS (
      SELECT l_returnflag AS flag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2
    ), cum AS (
      SELECT flag, cents, w,
             sum(w) OVER (PARTITION BY flag ORDER BY cents
                          ROWS UNBOUNDED PRECEDING) AS c,
             sum(w) OVER (PARTITION BY flag) AS n
      FROM vals
    )
    SELECT flag,
           CAST(min(cents) FILTER (WHERE 2 * c >= n) AS BIGINT)
             AS weighted_median_cents,
           CAST(max(n) AS BIGINT) AS total_weight
    FROM cum
    GROUP BY flag
    ORDER BY flag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT weighted median (lower convention: the smallest value whose
    cumulative weight reaches half the total) of line-item price
    weighted by quantity, per return flag — the weighted order
    statistic the exact-quantile family lacked (unweighted exact kth:
    events_funnel_latency_quantiles; interpolated: agg_percentiles;
    sketched: KLL). Pure integer rank arithmetic (2·cum >= total avoids
    the n/2 division entirely), so both engines pick the identical
    value. Aggregate-then-sort discipline: the raw table feeds ONE
    map-side-combined (flag, cents) weight aggregate; the cumulative
    window orders |distinct prices| per flag, never raw rows."""
    li = load_table(spark, "lineitem", sf_dir)
    from pyspark.sql import Window as W

    vals = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).alias("w"))
    wc = W.partitionBy("flag").orderBy("cents").rowsBetween(W.unboundedPreceding, 0)
    cum = vals.select(
        "flag",
        "cents",
        F.sum("w").over(wc).alias("c"),
        F.sum("w").over(W.partitionBy("flag")).alias("n"),
    )
    return (
        cum.groupBy("flag")
        .agg(
            F.min(F.when(2 * F.col("c") >= F.col("n"), F.col("cents"))).alias(
                "weighted_median_cents"
            ),
            F.max("n").alias("total_weight"),
        )
        .orderBy("flag")
    )


@query(
    "quality_impute_report",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k, o_orderpriority AS pri,
             CASE WHEN o_orderkey % 13 = 0 THEN NULL
                  ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS cents
      FROM orders
    ), vals AS (
      SELECT pri, cents, CAST(count(*) AS BIGINT) AS w
      FROM base WHERE cents IS NOT NULL GROUP BY 1, 2
    ), cum AS (
      SELECT pri, cents,
             sum(w) OVER (PARTITION BY pri ORDER BY cents
                          ROWS UNBOUNDED PRECEDING) AS c,
             sum(w) OVER (PARTITION BY pri) AS n
      FROM vals
    ), med AS (
      SELECT pri, CAST(min(cents) FILTER (WHERE 2 * c >= n) AS BIGINT)
               AS impute_cents
      FROM cum GROUP BY pri
    )
    SELECT b.pri,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) FILTER (WHERE b.cents IS NULL) AS BIGINT) AS n_imputed,
           CAST(max(m.impute_cents) AS BIGINT) AS impute_cents,
           CAST(sum(coalesce(b.cents, m.impute_cents)) AS BIGINT)
             AS sum_cents_after
    FROM base b JOIN med m ON m.pri = b.pri
    GROUP BY b.pri
    ORDER BY b.pri
    """,
)
def quality_impute_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-value imputation — the ML-prep step between the quality
    screens and the training set: NULLs (carved deterministically on an
    id bucket, the json-defects precedent, so the counters provably
    fire) are filled with the EXACT per-group lower median via the same
    2·cum ≥ n integer rank arithmetic as agg_weighted_median — no
    percentile interpolation for the engines to disagree on, and the
    impute VALUE itself is reported and hash-checked, not just the
    post-impute sums. Median-impute beats mean-impute on the heavy
    tail this price column has, and the report (rows touched, fill
    value, post-fill mass) is what makes the imputation auditable.
    One aggregate over distinct (group, value) pairs builds the
    medians; one broadcast join applies them — raw rows shuffle only
    for the final per-group rollup."""
    from pyspark.sql import Window as W

    base = load_table(spark, "orders", sf_dir).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("pri"),
        F.when(
            F.col("o_orderkey") % 13 == 0, F.lit(None).cast("long")
        ).otherwise(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "cents"
        ),
    )
    vals = (
        base.filter(F.col("cents").isNotNull())
        .groupBy("pri", "cents")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    wc = W.partitionBy("pri").orderBy("cents").rowsBetween(W.unboundedPreceding, 0)
    med = (
        vals.select(
            "pri",
            "cents",
            F.sum("w").over(wc).alias("c"),
            F.sum("w").over(W.partitionBy("pri")).alias("n"),
        )
        .groupBy("pri")
        .agg(
            F.min(F.when(2 * F.col("c") >= F.col("n"), F.col("cents"))).alias(
                "impute_cents"
            )
        )
    )
    return (
        base.join(F.broadcast(med), "pri")
        .groupBy("pri")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col("cents").isNull(), 1)).alias("n_imputed"),
            F.max("impute_cents").alias("impute_cents"),
            F.sum(F.coalesce("cents", "impute_cents")).alias("sum_cents_after"),
        )
        .orderBy("pri")
    )


@query(
    "quality_classifier_auc",
    oracle=r"""
    WITH scored AS (
      SELECT source,
             CASE WHEN text LIKE '%spark%' THEN 1 ELSE 0 END AS label,
             len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS s
      FROM documents
    ), ranked AS (
      SELECT source, label,
             2 * rank() OVER (PARTITION BY source ORDER BY s)
               + count(*) OVER (PARTITION BY source, s) - 1 AS r2
      FROM scored
    ), agg AS (
      SELECT source,
             sum(CASE WHEN label = 1 THEN r2 ELSE 0 END) AS sum_r2,
             sum(label) AS n_pos,
             sum(1 - label) AS n_neg
      FROM ranked GROUP BY source
    )
    SELECT source,
           CAST(n_pos AS BIGINT) AS n_pos,
           CAST(n_neg AS BIGINT) AS n_neg,
           CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
                ELSE round((sum_r2 - n_pos * (n_pos + 1))
                           / (2.0 * n_pos * n_neg), 6) END AS auc
    FROM agg ORDER BY source
    """,
)
def quality_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source ROC-AUC of a ranking score against a binary label via
    the Mann-Whitney U statistic — the quality-classifier eval a
    curation pipeline runs before trusting a score to gate a 100 TB
    corpus (does lexical diversity actually rank the target docs
    higher, per source?). Tie-corrected with AVERAGE ranks kept exact:
    2*avg_rank = 2*rank() + tie_count - 1 is an integer, so the AUC
    numerator (sum_r2 - n_pos*(n_pos+1)) and denominator
    (2*n_pos*n_neg) are integers and both engines divide the same
    numbers — no float rank accumulation. One pass: score + label in
    the scan projection, two window functions sharing one (source,
    score) sort, one groupBy(source). Sources lacking either class
    yield NULL (AUC undefined), never a division error.

    Reference analog: none (305-LoC CDC parser); LLM-pipeline eval
    surface alongside the lang-ID confusion matrix and LSH recall
    evals. Degenerate-class behavior pinned in tests/test_eval_metrics.py.
    """
    docs = load_table(spark, "documents", sf_dir)
    scored = docs.select(
        "source",
        F.when(F.col("text").like("%spark%"), 1).otherwise(0).alias("label"),
        F.size(F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))).alias("s"),
    )
    w_rank = Window.partitionBy("source").orderBy("s")
    w_tie = Window.partitionBy("source", "s")
    ranked = scored.select(
        "source",
        "label",
        (2 * F.rank().over(w_rank) + F.count(F.lit(1)).over(w_tie) - 1).alias("r2"),
    )
    agg = ranked.groupBy("source").agg(
        F.sum(F.when(F.col("label") == 1, F.col("r2")).otherwise(0)).alias("sum_r2"),
        F.sum("label").cast("long").alias("n_pos"),
        F.sum(1 - F.col("label")).cast("long").alias("n_neg"),
    )
    return agg.select(
        "source",
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") == 0) | (F.col("n_neg") == 0), F.lit(None)
        )
        .otherwise(
            F.round(
                (F.col("sum_r2") - F.col("n_pos") * (F.col("n_pos") + 1))
                / (2.0 * F.col("n_pos") * F.col("n_neg")),
                6,
            )
        )
        .alias("auc"),
    ).orderBy("source")


@query(
    "quality_cohens_kappa",
    oracle="""
    WITH labeled AS (
      SELECT source,
             CASE WHEN text LIKE '%spark%' THEN 1 ELSE 0 END AS a,
             CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END AS b
      FROM documents
    ), counts AS (
      SELECT source,
             count(*) AS n,
             sum(a * b) AS n11,
             sum(a * (1 - b)) AS n10,
             sum((1 - a) * b) AS n01,
             sum((1 - a) * (1 - b)) AS n00
      FROM labeled GROUP BY source
    )
    SELECT source,
           CAST(n AS BIGINT) AS n,
           CAST(n11 AS BIGINT) AS n11,
           CAST(n00 AS BIGINT) AS n00,
           CASE WHEN n * n - ((n11 + n10) * (n11 + n01)
                              + (n01 + n00) * (n10 + n00)) = 0 THEN NULL
                ELSE round(
                  CAST(n * (n11 + n00) - ((n11 + n10) * (n11 + n01)
                       + (n01 + n00) * (n10 + n00)) AS DOUBLE)
                  / (n * n - ((n11 + n10) * (n11 + n01)
                       + (n01 + n00) * (n10 + n00))), 6) END AS kappa
    FROM counts ORDER BY source
    """,
)
def quality_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two deterministic annotators per source —
    the inter-annotator-agreement statistic a labeling pipeline reports
    before trusting rule-based labels at corpus scale (agreement ABOVE
    CHANCE: two rules that both fire on 90% of docs agree 81% by luck
    alone). Kept exact end-to-end: kappa = (po - pe) / (1 - pe)
    algebraically rearranged to the all-integer form
    (n*(n11+n00) - S) / (n^2 - S) with S the chance-agreement cross
    product, so the single rounded division is over identical integers
    in both engines. One aggregate over one scan; the 2x2 confusion
    cells are sum-of-products expressions, never a re-scan per cell.

    Reference analog: none; eval surface beside quality_classifier_auc.
    """
    docs = load_table(spark, "documents", sf_dir)
    labeled = docs.select(
        "source",
        F.when(F.col("text").like("%spark%"), 1).otherwise(0).alias("a"),
        F.when(F.col("n_chars") >= 250, 1).otherwise(0).alias("b"),
    )
    c = labeled.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("a") * F.col("b")).cast("long").alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("long").alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("long").alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).cast("long").alias("n00"),
    )
    s_chance = (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01")) + (
        F.col("n01") + F.col("n00")
    ) * (F.col("n10") + F.col("n00"))
    denom = F.col("n") * F.col("n") - s_chance
    num = F.col("n") * (F.col("n11") + F.col("n00")) - s_chance
    return c.select(
        "source",
        "n",
        "n11",
        "n00",
        F.when(denom == 0, F.lit(None))
        .otherwise(F.round(num.cast("double") / denom, 6))
        .alias("kappa"),
    ).orderBy("source")


@query(
    "quality_classifier_pr_curve",
    oracle=r"""
    WITH scored AS (
      SELECT CASE WHEN text LIKE '%spark%' THEN 1 ELSE 0 END AS label,
             len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS s
      FROM documents
    ), thresholds AS (
      SELECT unnest(generate_series(10, 60, 10)) AS thr
    ), cells AS (
      SELECT thr,
             sum(CASE WHEN s >= thr THEN label ELSE 0 END) AS tp,
             sum(CASE WHEN s >= thr THEN 1 - label ELSE 0 END) AS fp,
             sum(CASE WHEN s < thr THEN label ELSE 0 END) AS fn
      FROM scored CROSS JOIN thresholds GROUP BY thr
    )
    SELECT CAST(thr AS BIGINT) AS thr,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn,
           CASE WHEN tp + fp = 0 THEN NULL
                ELSE round(CAST(tp AS DOUBLE) / (tp + fp), 6) END AS precision,
           CASE WHEN tp + fn = 0 THEN NULL
                ELSE round(CAST(tp AS DOUBLE) / (tp + fn), 6) END AS recall,
           CASE WHEN 2 * tp + fp + fn = 0 THEN NULL
                ELSE round(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn), 6) END AS f1
    FROM cells ORDER BY thr
    """,
)
def quality_classifier_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1 across an operating-threshold sweep — the
    decision-side companion to quality_classifier_auc (AUC ranks; a
    deployed gate needs ONE threshold, and this table is how it gets
    picked). Exact end-to-end: every confusion cell is an integer
    conditional sum, and each metric is one rounded division of
    identical integers in both engines. F1 uses the algebraic
    2tp/(2tp+fp+fn) form — no precision*recall float product.

    Shape note: the 6 thresholds are 18 conditional-sum expressions in
    ONE map-side-combined aggregate over a single scan, unpivoted to
    rows afterwards — NOT a threshold crossJoin, which would re-
    evaluate the tokenize-and-distinct scoring expression once per
    (doc, threshold) pair (measured 4.9 s vs 1.6 s at sf1: the
    broadcast nested-loop join evaluates unmaterialized projections
    above the join)."""
    docs = load_table(spark, "documents", sf_dir)
    scored = docs.select(
        F.when(F.col("text").like("%spark%"), 1).otherwise(0).alias("label"),
        F.size(F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))).alias("s"),
    )
    thrs = [10, 20, 30, 40, 50, 60]
    aggs = []
    for t in thrs:
        aggs += [
            F.sum(F.when(F.col("s") >= t, F.col("label")).otherwise(0))
            .cast("long").alias(f"tp_{t}"),
            F.sum(F.when(F.col("s") >= t, 1 - F.col("label")).otherwise(0))
            .cast("long").alias(f"fp_{t}"),
            F.sum(F.when(F.col("s") < t, F.col("label")).otherwise(0))
            .cast("long").alias(f"fn_{t}"),
        ]
    wide = scored.agg(*aggs)
    stack = ", ".join(
        f"{t}L, tp_{t}, fp_{t}, fn_{t}" for t in thrs
    )
    cells = wide.selectExpr(
        f"stack({len(thrs)}, {stack}) as (thr, tp, fp, fn)"
    )
    return cells.select(
        "thr", "tp", "fp", "fn",
        F.when(F.col("tp") + F.col("fp") == 0, F.lit(None))
        .otherwise(F.round(F.col("tp") / (F.col("tp") + F.col("fp")), 6))
        .alias("precision"),
        F.when(F.col("tp") + F.col("fn") == 0, F.lit(None))
        .otherwise(F.round(F.col("tp") / (F.col("tp") + F.col("fn")), 6))
        .alias("recall"),
        F.when(2 * F.col("tp") + F.col("fp") + F.col("fn") == 0, F.lit(None))
        .otherwise(
            F.round((2 * F.col("tp")) / (2 * F.col("tp") + F.col("fp") + F.col("fn")), 6)
        )
        .alias("f1"),
    ).orderBy("thr")


@query(
    "quality_classifier_gains_deciles",
    oracle=r"""
    WITH scored AS (
      SELECT doc_id,
             CASE WHEN text LIKE '%spark%' THEN 1 ELSE 0 END AS label,
             len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS s
      FROM documents
    ), ranked AS (
      SELECT label,
             ntile(10) OVER (ORDER BY s DESC, doc_id) AS decile
      FROM scored
    ), per AS (
      SELECT decile, count(*) AS n, sum(label) AS pos FROM ranked GROUP BY decile
    ), tot AS (SELECT sum(pos) AS total_pos FROM per)
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(n AS BIGINT) AS n, CAST(pos AS BIGINT) AS pos,
           CAST(sum(pos) OVER (ORDER BY decile) AS BIGINT) AS cum_pos,
           round(CAST(sum(pos) OVER (ORDER BY decile) AS DOUBLE)
                 / (SELECT total_pos FROM tot), 6) AS cum_capture
    FROM per ORDER BY decile
    """,
)
def quality_classifier_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gains / lift table: rank the corpus by score descending, cut
    into deciles, report each decile's positive capture and the
    cumulative capture curve — the 'how much of the good data does the
    top-k% hold' read that decides how aggressively a quality gate can
    cut a 100 TB corpus. Determinism hinges on the tie-break:
    (score DESC, doc_id) is a TOTAL order, so both engines assign
    identical deciles — ntile over a non-unique order would be a
    cross-engine coin flip on every tie.

    Scale shape: the oracle's single global ntile window would pull
    the whole corpus onto ONE partition. The Spark side derives the
    identical decile assignment distributed: the global rank under
    (s DESC, doc_id) decomposes into a per-score-group row_number
    (partitioned window — scales with the group, not the corpus) plus
    that group's base rank from a cumulative count over |distinct
    scores| rows (a tiny window), and ntile's bucket-boundary
    arithmetic ((N mod 10) leading buckets get one extra row) is then
    a closed-form integer CASE on the rank. Same result, no
    single-partition stage anywhere."""
    docs = load_table(spark, "documents", sf_dir)
    scored = docs.select(
        "doc_id",
        F.when(F.col("text").like("%spark%"), 1).otherwise(0).alias("label"),
        F.size(F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))).alias("s"),
    )
    # base rank per score group: cumulative count over distinct scores
    grp = scored.groupBy("s").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = Window.orderBy(F.desc("s")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    base = grp.select(
        "s", F.coalesce(F.sum("cnt").over(w_cum), F.lit(0)).alias("base_rank")
    )
    w_in = Window.partitionBy("s").orderBy("doc_id")
    ranked_rows = (
        scored.withColumn("rn", F.row_number().over(w_in))
        .join(F.broadcast(base), "s")
        .select("label", (F.col("base_rank") + F.col("rn")).alias("rank"))
    )
    n_total = scored.agg(F.count(F.lit(1)).alias("n_total"))
    # ntile(10): with N = q*10 + r, the first r buckets hold q+1 rows
    q = (F.col("n_total") / 10).cast("long")
    r = F.col("n_total") % 10
    cut = (q + 1) * r  # last rank served by the oversized buckets
    decile = F.when(
        F.col("rank") <= cut, F.ceil(F.col("rank") / (q + 1))
    ).otherwise(r + F.ceil((F.col("rank") - cut) / q))
    per = (
        ranked_rows.crossJoin(F.broadcast(n_total))
        .select("label", decile.cast("long").alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("label").cast("long").alias("pos"))
    )
    total = per.agg(F.sum("pos").alias("total_pos"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "decile", "n", "pos",
            F.sum("pos").over(w).cast("long").alias("cum_pos"),
            F.round(F.sum("pos").over(w) / F.col("total_pos"), 6).alias("cum_capture"),
        )
        .orderBy("decile")
    )


@query(
    "quality_classifier_brier_calibration",
    oracle=r"""
    WITH scored AS (
      SELECT CASE WHEN text LIKE '%spark%' THEN 1 ELSE 0 END AS y,
             least(100, len(list_distinct(regexp_split_to_array(trim(text), '\s+')))) AS p
      FROM documents
    )
    SELECT CAST(least(9, p // 10) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST((100 * sum(p)) // count(*) AS BIGINT) AS mean_p_bp,
           CAST((10000 * sum(y)) // count(*) AS BIGINT) AS pos_rate_bp,
           CAST(sum((p - 100 * y) * (p - 100 * y)) AS BIGINT) AS brier_num
    FROM scored
    GROUP BY least(9, p // 10)
    ORDER BY bin
    """,
)
def quality_classifier_brier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration (reliability) curve + per-bin Brier numerators for
    the quality classifier — the eval that says whether a score is an
    honest PROBABILITY, which AUC (pure ranking) cannot: a perfectly
    ranked but systematically over-confident score gates a 100 TB
    corpus at the wrong threshold. The capped score is read as a
    percent; per predicted-probability decile bin the output carries
    mean predicted (bp), observed positive rate (bp), and the exact
    integer Brier numerator sum((p - 100y)^2) — comparing mean_p_bp vs
    pos_rate_bp per bin IS the reliability diagram, and
    sum(brier_num)/(n*100^2) is the Brier score. All-integer
    arithmetic (integer cross-multiplied rates, integer squared
    residuals) so both engines hash identically; ONE map-side-combined
    groupBy over <=10 bins — nothing here shuffles documents.

    Reference analog: none; completes the classifier-eval family
    (AUC ranking, PR trade-off, gains capture, kappa agreement,
    calibration honesty)."""
    docs = load_table(spark, "documents", sf_dir)
    scored = docs.select(
        F.when(F.col("text").like("%spark%"), 1).otherwise(0).alias("y"),
        F.least(
            F.lit(100),
            F.size(F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))),
        ).alias("p"),
    )
    return (
        scored.groupBy(
            F.least(F.lit(9), F.expr("p div 10")).cast("long").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").alias("sy"),
            F.sum("p").alias("sp"),
            F.sum(
                (F.col("p") - 100 * F.col("y")) * (F.col("p") - 100 * F.col("y"))
            ).alias("brier_num"),
        )
        .select(
            "bin",
            F.col("n").cast("long").alias("n"),
            F.expr("(100 * sp) div n").cast("long").alias("mean_p_bp"),
            F.expr("(10000 * sy) div n").cast("long").alias("pos_rate_bp"),
            F.col("brier_num").cast("long").alias("brier_num"),
        )
        .orderBy("bin")
    )
