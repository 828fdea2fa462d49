"""Relational operator suite (SURVEY.md §2.2 M1).

Each query exercises one operator family on the star schema, expressed
with the DataFrame API so Catalyst plans it (predicate pushdown, column
pruning, broadcast-join selection are automatic). The paired DuckDB
oracle SQL computes the same result for the driver's hash compare.

Cross-engine determinism rules applied throughout:

* every aggregate / computed column is aliased identically on both sides;
* floating aggregates are rounded (sum→2dp, ratios→4dp) to absorb
  summation-order differences;
* integer sums are cast to BIGINT on the DuckDB side (DuckDB widens to
  HUGEINT, Spark stays LONG);
* every LIMIT / top-k carries a total order (unique key as tie-break),
  otherwise the two engines may legally pick different rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from log2sql_spark.registry import query
from log2sql_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


def _revenue_exact() -> F.Column:
    """sum(l_extendedprice * (1 - l_discount)) via exact scaled decimals.

    Both inputs are 2-decimal-exact doubles; per-row scaled products are
    exact integers, so the sum is bit-identical in any engine and any
    summation order — required for the cross-engine hash compare.

    The per-row product multiplies LONGs (pure codegen): per-row values
    do not grow with data size (cents ~1e7 for TPC-H prices; even 1e9
    x 100 is far under 2^63), while decimal multiplication materializes
    a BigDecimal per row (measured ~45% of q1's runtime). Only the SUM
    grows with scale, so only the accumulator is DECIMAL — the long
    product is cast once and summed as decimal(20,0) (sum result
    decimal(30,0), exact past sf100k); values and output type (double
    after /1e4) are identical to the old all-decimal form."""
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    disc_pct = F.round((1 - F.col("l_discount")) * 100, 0).cast("long")
    return F.sum((cents * disc_pct).cast("decimal(20,0)")) / 10000.0


# ---------------------------------------------------------------------------
# M0 flagship: TPC-H Q1-style pricing summary (scan → filter → hash agg → sort)
# ---------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS count_order,
           sum(l_quantity) AS sum_qty,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
           sum(CAST(round(l_extendedprice * 100) AS DECIMAL(20,0))
               * CAST(round((1 - l_discount) * 100) AS DECIMAL(5,0))) / 10000.0 AS sum_disc_price,
           sum(CAST(round(l_extendedprice * 100) AS DECIMAL(20,0))
               * CAST(round((1 - l_discount) * 100) AS DECIMAL(5,0))
               * CAST(round((1 + l_tax) * 100) AS DECIMAL(5,0))) / 1000000.0 AS sum_charge,
           sum(l_quantity) / count(*) AS avg_qty,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 / count(*) AS avg_price,
           sum(CAST(round(l_discount * 100) AS BIGINT)) / 100.0 / count(*) AS avg_disc
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + grouped aggregation; the filter reaches the parquet scan
    (PushedFilters) and the agg is a partial+final hash aggregate, so no
    row leaves an executor before being pre-aggregated (map-side combine).

    Money columns are 2-decimal-exact, so sums are computed over exact
    scaled integers: bit-identical across engines and summation orders
    (the oracle hash compare requires cross-engine determinism that raw
    double summation cannot give). Multi-factor products accumulate in
    DECIMAL — int64 would overflow around sf0.5 for the 3-factor charge
    (term ≤ 2e13 × 6e6 rows > 2^63); decimal(38) survives sf100+.
    """
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    # long per-row products + decimal accumulators — see _revenue_exact
    disc_pct = F.round((1 - F.col("l_discount")) * 100, 0).cast("long")
    tax_pct = F.round((1 + F.col("l_tax")) * 100, 0).cast("long")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("count_order"),
            F.sum("l_quantity").alias("sum_qty"),
            (F.sum(cents) / 100.0).alias("sum_base_price"),
            (F.sum((cents * disc_pct).cast("decimal(20,0)")) / 10000.0).alias(
                "sum_disc_price"
            ),
            (
                F.sum((cents * disc_pct * tax_pct).cast("decimal(20,0)"))
                / 1000000.0
            ).alias("sum_charge"),
            (F.sum("l_quantity") / F.count("*")).alias("avg_qty"),
            (F.sum(cents) / 100.0 / F.count("*")).alias("avg_price"),
            (F.sum(F.round(F.col("l_discount") * 100, 0).cast("long")) / 100.0 / F.count("*")).alias(
                "avg_disc"
            ),
        )
        .select(
            "l_returnflag", "l_linestatus", "count_order", "sum_qty",
            "sum_base_price", "sum_disc_price", "sum_charge", "avg_qty",
            "avg_price", "avg_disc",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           sum(CAST(round(l_extendedprice * 100) AS DECIMAL(20,0))
               * CAST(round((1 - l_discount) * 100) AS DECIMAL(5,0))) / 10000.0 AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + total-ordered top-k. customer is a dimension →
    broadcast; orders⋈lineitem shuffles on the order key (the natural
    co-partitioning key for both tables at 100 TB).
    """
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_revenue_exact().alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           sum(CAST(round(l_extendedprice * 100) AS DECIMAL(20,0))
               * CAST(round((1 - l_discount) * 100) AS DECIMAL(5,0))) / 10000.0 AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-table star join. All dimensions broadcast; only the
    orders⋈lineitem edge shuffles. Catalyst reorders the dim filters
    ahead of the joins (the reference applies filters *after* its
    catalog lookups — log2sql.py:59-61 vs 29-46 — a missed optimization
    we get for free)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_revenue_exact().alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@query(
    "q13_customer_order_counts",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join with an extra join-side predicate, double agg."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey) & (orders.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "join_semi",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_parts_shipped,
           round(sum(p_retailprice), 2) AS total_price
    FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem
                        WHERE l_quantity > 45)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): parts with any high-quantity shipment."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_semi")
        .agg(
            F.count("*").alias("n_parts_shipped"),
            F.round(F.sum("p_retailprice"), 2).alias("total_price"),
        )
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers_no_orders
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 250000)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no large order."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers_no_orders"))
        .orderBy("c_mktsegment")
    )


@query(
    "join_full_outer",
    oracle="""
    WITH o AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             round(sum(o_totalprice), 2) AS order_value
      FROM orders GROUP BY 1
    ), s AS (
      SELECT date_trunc('month', l_shipdate) AS month,
             round(sum(l_extendedprice), 2) AS shipped_value
      FROM lineitem GROUP BY 1
    )
    SELECT coalesce(o.month, s.month) AS month, order_value, shipped_value
    FROM o FULL OUTER JOIN s ON o.month = s.month
    ORDER BY month
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates on a sparse shared key."""
    orders = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("order_value"))
    )
    shipped = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.date_trunc("month", "l_shipdate").alias("month"))
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("shipped_value"))
    )
    return (
        orders.join(shipped, "month", "full_outer")
        .select(
            F.col("month"),
            F.col("order_value"),
            F.col("shipped_value"),
        )
        .orderBy("month")
    )


@query(
    "join_range",
    oracle="""
    SELECT a.p_brand, CAST(count(*) AS BIGINT) AS n_near_size_pairs
    FROM (SELECT * FROM part WHERE p_partkey < 20000) a
    JOIN (SELECT * FROM part WHERE p_partkey < 20000) b
      ON a.p_brand = b.p_brand
     AND a.p_partkey < b.p_partkey
     AND b.p_size BETWEEN a.p_size - 1 AND a.p_size + 1
    GROUP BY a.p_brand
    ORDER BY a.p_brand
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band (range) join, NAIVE form: equi key (brand) prunes the cross
    space, BETWEEN filters post-match — but within one brand the match
    loop is quadratic, so this shape is QUADRATIC-BY-CONTRACT and kept
    on a fixed-size corpus (p_partkey < 20000, the full table at
    sf<=0.1) as the semantic spec. The scale path is
    ``join_range_banded`` (queries/extra3.py): the band folds into the
    equi key by exploding each row into its size bands, which the sf1
    sweep shows stays flat while this twin grows with the square of the
    per-brand group."""
    a = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 20000).alias("a")
    b = _t(spark, sf_dir, "part").filter(F.col("p_partkey") < 20000).alias("b")
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey"))
            & F.col("b.p_size").between(F.col("a.p_size") - 1, F.col("a.p_size") + 1),
        )
        .groupBy(F.col("a.p_brand").alias("p_brand"))
        .agg(F.count("*").alias("n_near_size_pairs"))
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------

@query(
    "agg_distinct_counts",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities,
           round(sum(o_totalprice), 2) AS total_value
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — expands to a two-phase aggregate under Catalyst."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.round(F.sum("o_totalprice"), 2).alias("total_value"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS orders_within_bound,
           TRUE AS parts_within_bound
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB path where an
    exact distinct shuffle is too expensive.

    The HLL estimate itself is engine-specific and can never hash-match
    another engine, so the query exposes the EXACT countDistinct twins
    (oracle-checked) plus error-bound booleans: the estimate at rsd=0.01
    must land within 5% (5 sigma) of exact. The oracle asserts TRUE, so
    a drifting sketch fails the correctness gate rather than a softer
    pytest-only check."""
    est_ok = lambda approx, exact: (  # noqa: E731
        F.abs(F.col(approx) - F.col(exact)) <= 0.05 * F.col(exact)
    )
    # Exact-distinct and HLL aggregates run as SEPARATE aggregations
    # joined on the (tiny) group key. Mixing countDistinct with
    # approx_count_distinct in one agg makes Catalyst route the HLL
    # buffers through the multi-distinct Expand + sort-based aggregate
    # fallback — each of the 3x-expanded rows drags a serialized
    # rsd=0.01 HLL sketch through the sort (measured 170s at sf1 vs
    # ~5s for the two plans separately; found by the sf1 sweep).
    li = _t(spark, sf_dir, "lineitem")
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.01).alias("_approx_orders"),
        F.approx_count_distinct("l_partkey", 0.01).alias("_approx_parts"),
    )
    return (
        exact.join(approx, "l_returnflag")
        .select(
            "l_returnflag",
            "exact_orders",
            "exact_parts",
            est_ok("_approx_orders", "exact_orders").alias("orders_within_bound"),
            est_ok("_approx_parts", "exact_parts").alias("parts_within_bound"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals + grand total."""
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n_rows"))
        .orderBy(F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus"))
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           round(sum(o_totalprice), 2) AS total_value,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations."""
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_value"), F.count("*").alias("n_orders"))
        .orderBy(F.asc_nulls_first("o_orderstatus"), F.asc_nulls_first("o_orderpriority"))
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT c_mktsegment, c_nationkey,
           round(sum(c_acctbal), 2) AS total_balance,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
    ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL API (same Catalyst Expand node)."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey,
               round(sum(c_acctbal), 2) AS total_balance,
               count(*) AS n_customers
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST
        """
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(stddev_samp(l_extendedprice), 4) AS sd_price,
           round(var_samp(l_extendedprice), 2) AS var_price,
           round(min(l_extendedprice), 2) AS min_price,
           round(max(l_extendedprice), 2) AS max_price,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (single-pass, numerically stable in both engines)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
            F.round(F.var_samp("l_extendedprice"), 2).alias("var_price"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "pivot_status_by_flag",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 2) AS qty_open,
           round(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 2) AS qty_filled
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def pivot_status_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (wide aggregation); DuckDB oracle uses FILTER clauses."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnsRenamed({"O": "qty_open", "F": "qty_filled"})
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

@query(
    "window_topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice, rn
    FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             CAST(row_number() OVER (PARTITION BY p_brand
                     ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS rn
      FROM part
    )
    WHERE rn <= 3
    ORDER BY p_brand, rn
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: row_number window + filter. One shuffle on the
    partition key; Spark 3.5+ inserts a WindowGroupLimit so only k rows
    per group survive the sort — no full materialization per group."""
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        _t(spark, sf_dir, "part")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rn")
        .orderBy("p_brand", "rn")
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders
    WHERE o_custkey <= 100
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative frame (running total per customer)."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 100)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


@query(
    "window_lag_lead",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             round(sum(o_totalprice), 2) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT day, revenue,
           round(revenue - lag(revenue, 1) OVER (ORDER BY day), 2) AS delta_prev,
           round(lead(revenue, 1) OVER (ORDER BY day) - revenue, 2) AS delta_next
    FROM daily
    ORDER BY day
    LIMIT 100
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over an aggregated series (day-over-day deltas).

    The unpartitioned window runs on one task — fine here because the
    input is already reduced to ~one row per day; never apply an
    unpartitioned window to a fact table."""
    w = W.orderBy("day")
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    return (
        daily.select(
            "day",
            "revenue",
            F.round(F.col("revenue") - F.lag("revenue", 1).over(w), 2).alias("delta_prev"),
            F.round(F.lead("revenue", 1).over(w) - F.col("revenue"), 2).alias("delta_next"),
        )
        .orderBy("day")
        .limit(100)
    )


@query(
    "window_moving_avg",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', l_shipdate) AS day,
             round(sum(l_quantity), 2) AS qty
      FROM lineitem GROUP BY 1
    )
    SELECT day, qty,
           round(avg(qty) OVER (ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS qty_ma7
    FROM daily
    ORDER BY day
    LIMIT 200
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding ROWS frame: 7-day moving average."""
    daily = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.date_trunc("day", "l_shipdate").alias("day"))
        .agg(F.round(F.sum("l_quantity"), 2).alias("qty"))
    )
    w = W.orderBy("day").rowsBetween(-6, W.currentRow)
    return (
        daily.select("day", "qty", F.round(F.avg("qty").over(w), 4).alias("qty_ma7"))
        .orderBy("day")
        .limit(200)
    )


@query(
    "window_rank_ntile",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal,
           CAST(rank()       OVER w AS BIGINT) AS bal_rank,
           CAST(dense_rank() OVER w AS BIGINT) AS bal_dense_rank,
           CAST(ntile(4)     OVER w AS BIGINT) AS bal_quartile,
           round(percent_rank() OVER w, 6) AS bal_pct_rank
    FROM customer
    WHERE c_custkey <= 300
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY c_mktsegment, bal_rank, c_custkey
    """,
)
def window_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile / percent_rank in one window pass."""
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 300)
        .select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.rank().over(w).cast("long").alias("bal_rank"),
            F.dense_rank().over(w).cast("long").alias("bal_dense_rank"),
            F.ntile(4).over(w).cast("long").alias("bal_quartile"),
            F.round(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
        )
        .orderBy("c_mktsegment", "bal_rank", "c_custkey")
    )


# ---------------------------------------------------------------------------
# Sorts / limits / set operations
# ---------------------------------------------------------------------------

@query(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — each partition
    keeps k rows, the driver merges; no full sort of the fact table."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


@query(
    "setops_union_except_intersect",
    oracle="""
    WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         big_spenders AS (SELECT o_custkey AS c_custkey FROM orders
                          WHERE o_totalprice > 400000)
    SELECT 'union' AS op, CAST(count(*) AS BIGINT) AS n
      FROM (SELECT c_custkey FROM building UNION SELECT c_custkey FROM big_spenders)
    UNION ALL
    SELECT 'intersect' AS op, CAST(count(*) AS BIGINT) AS n
      FROM (SELECT c_custkey FROM building INTERSECT SELECT c_custkey FROM big_spenders)
    UNION ALL
    SELECT 'except' AS op, CAST(count(*) AS BIGINT) AS n
      FROM (SELECT c_custkey FROM building EXCEPT SELECT c_custkey FROM big_spenders)
    ORDER BY op
    """,
)
def setops_union_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct), INTERSECT, EXCEPT over two key sets."""
    building = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    spenders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    u = building.union(spenders).distinct().agg(F.count("*").alias("n")).select(F.lit("union").alias("op"), "n")
    i = building.intersect(spenders).agg(F.count("*").alias("n")).select(F.lit("intersect").alias("op"), "n")
    e = building.subtract(spenders).agg(F.count("*").alias("n")).select(F.lit("except").alias("op"), "n")
    return u.union(i).union(e).orderBy("op")


@query(
    "distinct_dropdup",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_distinct_pairs
    FROM (SELECT DISTINCT l_returnflag, l_linestatus, l_suppkey FROM lineitem)
    """,
)
def distinct_dropdup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates → partial+final hash aggregate (map-side combine)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .dropDuplicates(["l_returnflag", "l_linestatus", "l_suppkey"])
        .agg(F.count("*").alias("n_distinct_pairs"))
    )


# ---------------------------------------------------------------------------
# Scalar function surface (string / date / math / array / JSON / conditional)
# ---------------------------------------------------------------------------

@query(
    "string_funcs",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           upper(p_brand) AS brand_upper,
           CAST(length(p_name) AS BIGINT) AS name_len,
           substr(p_name, 1, 8) AS name_prefix,
           concat(p_brand, ':', p_type) AS brand_type,
           trim(p_name) AS name_trimmed,
           regexp_extract(p_type, '([A-Z]+)', 1) AS type_first_word,
           replace(p_name, ' ', '_') AS name_snake,
           CAST(strpos(p_name, 'a') AS BIGINT) AS first_a
    FROM part
    WHERE p_partkey <= 500
    ORDER BY p_partkey
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function surface (reference analogue: token split/strip/
    lower/join at log2sql.py:18-24,48,96)."""
    return (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 500)
        .select(
            "p_partkey",
            F.lower("p_name").alias("name_lower"),
            F.upper("p_brand").alias("brand_upper"),
            F.length("p_name").cast("long").alias("name_len"),
            F.substring("p_name", 1, 8).alias("name_prefix"),
            F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
            F.trim("p_name").alias("name_trimmed"),
            F.regexp_extract("p_type", r"([A-Z]+)", 1).alias("type_first_word"),
            F.regexp_replace("p_name", " ", "_").alias("name_snake"),
            F.instr(F.col("p_name"), "a").cast("long").alias("first_a"),
        )
        .orderBy("p_partkey")
    )


@query(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           CAST(date_part('day', o_orderdate) AS INTEGER) AS order_day,
           date_trunc('quarter', o_orderdate) AS order_quarter,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS INTEGER) AS days_to_y2k,
           o_orderdate + INTERVAL 90 DAY AS due_date,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date_str,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
    FROM orders
    WHERE o_orderkey <= 1000
    ORDER BY o_orderkey
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function surface (reference analogue: strptime
    validation at main.py:9-14)."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 1000)
        .select(
            "o_orderkey",
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.dayofmonth("o_orderdate").alias("order_day"),
            F.date_trunc("quarter", "o_orderdate").alias("order_quarter"),
            F.datediff(F.lit("2000-01-01").cast("timestamp"), F.col("o_orderdate")).alias(
                "days_to_y2k"
            ),
            (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
            F.unix_timestamp("o_orderdate").alias("epoch_s"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_extendedprice * 100) AS BIGINT)
             * CAST(round((1 - l_discount) * 100) AS BIGINT) / 10000.0 AS net_price,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
           round(sqrt(l_extendedprice), 4) AS price_sqrt,
           round(ln(l_extendedprice + 1), 6) AS price_ln,
           round(pow(1 + l_tax, 2), 6) AS tax_compound,
           CAST(l_quantity AS BIGINT) % 7 AS qty_mod7,
           greatest(l_discount, l_tax) AS max_rate,
           least(l_discount, l_tax) AS min_rate
    FROM lineitem
    WHERE l_orderkey <= 400
    ORDER BY l_orderkey, l_linenumber
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function surface."""
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 400)
        .select(
            "l_orderkey",
            "l_linenumber",
            (
                F.round(F.col("l_extendedprice") * 100, 0).cast("long")
                * F.round((1 - F.col("l_discount")) * 100, 0).cast("long")
                / 10000.0
            ).alias("net_price"),
            F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
            F.floor("l_quantity").alias("qty_floor"),
            F.ceil(F.col("l_extendedprice") / 1000).alias("price_k_ceil"),
            F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
            F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
            F.round(F.pow(1 + F.col("l_tax"), 2), 6).alias("tax_compound"),
            (F.col("l_quantity").cast("long") % 7).alias("qty_mod7"),
            F.greatest("l_discount", "l_tax").alias("max_rate"),
            F.least("l_discount", "l_tax").alias("min_rate"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "array_funcs",
    oracle="""
    SELECT p_partkey,
           array_to_string(string_split(p_name, ' '), '|') AS name_tokens,
           CAST(len(string_split(p_name, ' ')) AS INTEGER) AS n_tokens,
           array_to_string(list_sort(string_split(p_name, ' ')), '|') AS tokens_sorted,
           array_to_string(list_sort(string_split(p_name, ' ')), '|') AS tokens_joined,
           string_split(p_name, ' ')[1] AS first_token,
           list_contains(string_split(p_name, ' '), 'red') AS has_red
    FROM part
    WHERE p_partkey <= 300
    ORDER BY p_partkey
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function surface (reference analogue: set→CSV flattening at
    log2sql.py:117-118 ↔ array_join).

    Array-typed columns are serialized to delimited strings at the query
    boundary: the driver's canonicalizer sorts rows via pandas and cannot
    hash python lists (the `array_funcs2` round-1 failure mode)."""
    toks = F.split(F.col("p_name"), " ")
    return (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 300)
        .select(
            "p_partkey",
            F.array_join(toks, "|").alias("name_tokens"),
            F.size(toks).alias("n_tokens"),
            F.array_join(F.sort_array(toks), "|").alias("tokens_sorted"),
            F.array_join(F.sort_array(toks), "|").alias("tokens_joined"),
            F.element_at(toks, 1).alias("first_token"),
            F.array_contains(toks, "red").alias("has_red"),
        )
        .orderBy("p_partkey")
    )


@query(
    "json_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS prop_k,
           CAST(json_extract(props, '$.k') AS BIGINT) * 2 AS prop_k_doubled,
           json_extract_string(props, '$.missing') AS prop_missing
    FROM events
    WHERE event_id < 500
    ORDER BY event_id
    """,
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over the events.props payload column."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") < 500)
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
            (F.get_json_object("props", "$.k").cast("long") * 2).alias("prop_k_doubled"),
            F.get_json_object("props", "$.missing").alias("prop_missing"),
        )
        .orderBy("event_id")
    )


@query(
    "conditional_null_funcs",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'overdrawn'
                WHEN c_acctbal < 1000 THEN 'low'
                ELSE 'healthy' END AS bal_bucket,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_or_other,
           (c_acctbal IS NOT DISTINCT FROM NULL) AS bal_is_null,
           ifnull(NULL, c_custkey) AS key_or_default
    FROM customer
    WHERE c_custkey <= 500
    ORDER BY c_custkey
    """,
)
def conditional_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/WHEN, coalesce/nullif, null-safe equality (reference
    analogue: the literal-'NULL' → IS NULL rendering at log2sql.py:127-132)."""
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 500)
        .select(
            "c_custkey",
            F.when(F.col("c_acctbal") < 0, "overdrawn")
            .when(F.col("c_acctbal") < 1000, "low")
            .otherwise("healthy")
            .alias("bal_bucket"),
            F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
                "segment_or_other"
            ),
            F.col("c_acctbal").eqNullSafe(F.lit(None).cast("double")).alias("bal_is_null"),
            F.coalesce(F.lit(None).cast("long"), F.col("c_custkey")).alias("key_or_default"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Subqueries
# ---------------------------------------------------------------------------

@query(
    "subquery_above_avg",
    oracle="""
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_above_avg
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (broadcast of a 1-row aggregate)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, count(*) AS n_above_avg
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
        """
    )


@query(
    "subquery_correlated",
    oracle="""
    SELECT p_brand, CAST(count(*) AS BIGINT) AS n_small_qty_parts
    FROM part
    WHERE p_partkey IN (
      SELECT l_partkey FROM lineitem GROUP BY l_partkey
      HAVING avg(l_quantity) < 24
    )
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery over a grouped HAVING (decorrelated to a semi-join)."""
    part = _t(spark, sf_dir, "part")
    small = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.avg("l_quantity").alias("avg_qty"))
        .filter(F.col("avg_qty") < 24)
        .select("l_partkey")
    )
    return (
        part.join(small, part.p_partkey == small.l_partkey, "left_semi")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_small_qty_parts"))
        .orderBy("p_brand")
    )


@query(
    "agg_hhi_concentration",
    oracle="""
    WITH rev AS (
      SELECT n.n_name AS nation, c.c_custkey AS cust,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT nation, CAST(sum(cents) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n_customers
      FROM rev GROUP BY 1
    )
    SELECT r.nation,
           t.n_customers,
           CAST(sum((r.cents * 10000 // t.total)
                  * (r.cents * 10000 // t.total)) AS BIGINT) AS hhi,
           CAST(max(r.cents * 10000 // t.total) AS BIGINT) AS top_share_bp
    FROM rev r JOIN tot t ON r.nation = t.nation
    GROUP BY r.nation, t.n_customers
    ORDER BY r.nation
    """,
)
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman market-concentration index per nation over
    customer order revenue: each customer's revenue share in basis
    points (integer floor division — all terms positive, so Spark's
    ``div`` and DuckDB's ``//`` agree), HHI = Σ share_bp² (10^8 = pure
    monopoly). The antitrust-screening rollup, and a useful data-skew
    diagnostic: a nation whose HHI is high concentrates its key range
    on few customers. Two shuffles (customer rollup, nation rollup) +
    a broadcast of the 25-row per-nation totals back onto the
    customer-level shares — the total never funnels through a single
    task, so the shape holds at any customer count."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev = (
        orders.join(customer, customer.c_custkey == orders.o_custkey)
        .join(F.broadcast(nation), nation.n_nationkey == customer.c_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("c_custkey").alias("cust"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"))
    )
    tot = rev.groupBy("nation").agg(
        F.sum("cents").alias("total"), F.count(F.lit(1)).alias("n_customers")
    )
    share = rev.join(F.broadcast(tot), "nation").withColumn(
        "share_bp", F.expr("cents * 10000 div total")
    )
    return (
        share.groupBy("nation", "n_customers")
        .agg(
            F.sum(F.col("share_bp") * F.col("share_bp")).alias("hhi"),
            F.max("share_bp").alias("top_share_bp"),
        )
        .orderBy("nation")
    )


@query(
    "join_relational_division",
    oracle="""
    WITH divisor AS (
      SELECT DISTINCT o_orderpriority AS pri FROM orders
    ),
    needed AS (SELECT CAST(count(*) AS BIGINT) AS n_needed FROM divisor),
    cover AS (
      SELECT o_custkey AS cust,
             CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_covered,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders
      GROUP BY o_custkey
    )
    SELECT c.c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n_full_coverage_customers,
           CAST(sum(v.n_orders) AS BIGINT) AS n_orders
    FROM cover v
    JOIN needed n ON v.n_covered = n.n_needed
    JOIN customer c ON c.c_custkey = v.cust
    GROUP BY c.c_mktsegment
    ORDER BY segment
    """,
)
def join_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational DIVISION (Codd's eighth operator — 'customers who
    have placed orders at EVERY priority level'), the for-all query
    SQL lacks a keyword for. Expressed as the count-cover reduction:
    per-customer distinct-priority count equals the divisor's size —
    one aggregate instead of the textbook double NOT EXISTS, which
    Catalyst would plan as a correlated anti-join re-scanning orders
    per candidate. The divisor size arrives as a broadcast single-row
    join, never a collect; the divisor itself is a 5-row distinct off
    the same scan. Scales: orders shuffles once on custkey, segment
    rollup map-side combines."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    needed = orders.select("o_orderpriority").distinct().agg(
        F.count(F.lit(1)).alias("n_needed")
    )
    cover = orders.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.countDistinct("o_orderpriority").alias("n_covered"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        cover.join(F.broadcast(needed), cover.n_covered == needed.n_needed)
        .join(customer, customer.c_custkey == cover.cust)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_full_coverage_customers"),
            F.sum("n_orders").alias("n_orders"),
        )
        .orderBy("segment")
    )


@query(
    "window_percent_rank_bp",
    oracle="""
    WITH acct AS (
      SELECT c_nationkey AS nation, c_custkey AS cust,
             CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      FROM customer
    ),
    ranked AS (
      SELECT nation, cust, cents,
             rank() OVER (PARTITION BY nation ORDER BY cents, cust) AS r,
             count(*) OVER (PARTITION BY nation) AS n,
             row_number() OVER (
               PARTITION BY nation ORDER BY cents, cust
             ) AS n_le
      FROM acct
    )
    SELECT nation,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum((r - 1) * 10000 // (n - 1)) AS BIGINT) AS sum_pr_bp,
           CAST(sum(n_le * 10000 // n) AS BIGINT) AS sum_cd_bp,
           CAST(max((r - 1) * 10000 // (n - 1)) AS BIGINT) AS max_pr_bp
    FROM ranked
    GROUP BY nation
    ORDER BY nation
    """,
)
def window_percent_rank_bp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank and cume_dist restated as EXACT basis points —
    (rank-1)·10000/(n-1) and |rows ≤ current|·10000/n (row_number ==
    the peer-inclusive count because the (cents, cust) tie-break makes
    the ordering unique) via integer
    floor division (all terms non-negative, so Spark ``div`` ==
    DuckDB ``//``) — instead of the built-ins' doubles, whose
    rank/n division is IEEE-identical cross-engine but whose hash
    stability we refuse to gamble on. The (cents, cust) tie-break
    makes ranks unique, so both engines' window picks agree. ONE
    shuffle on nation feeds all three window statistics (same
    partition key, same ordering → one window stage), then the
    rollup is map-side combined."""
    customer = _t(spark, sf_dir, "customer")
    acct = customer.select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_custkey").alias("cust"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cents"),
    )
    wo = W.partitionBy("nation").orderBy("cents", "cust")
    wp = W.partitionBy("nation")
    ranked = acct.select(
        "nation",
        F.rank().over(wo).alias("r"),
        F.count(F.lit(1)).over(wp).alias("n"),
        F.row_number().over(wo).alias("n_le"),
    )
    return (
        ranked.groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.expr("(r - 1) * 10000 div (n - 1)")).alias("sum_pr_bp"),
            F.sum(F.expr("n_le * 10000 div n")).alias("sum_cd_bp"),
            F.max(F.expr("(r - 1) * 10000 div (n - 1)")).alias("max_pr_bp"),
        )
        .orderBy("nation")
    )


@query(
    "window_topk_with_ties",
    oracle="""
    WITH ranked AS (
      SELECT c_nationkey AS nation,
             CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
             rank() OVER (
               PARTITION BY c_nationkey
               ORDER BY CAST(round(c_acctbal * 100) AS BIGINT) DESC
             ) AS r
      FROM customer
    )
    SELECT nation,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           CAST(min(cents) AS BIGINT) AS kth_cents
    FROM ranked WHERE r <= 3
    GROUP BY nation
    ORDER BY nation
    """,
)
def window_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k WITH TIES per group (SQL's FETCH FIRST k WITH TIES /
    rank()<=k), the semantics row_number-based top-k silently breaks:
    every row tied with the k-th survives, so n_kept can exceed k and
    the result needs NO tie-break column to be deterministic — tie
    inclusion itself is what makes both engines agree. The complement
    of window_topk_per_group (row_number, tie-broken). One shuffle on
    the group key; rank's state is a counter, and the k-filter prunes
    before the rollup, so the post-window width is O(k·|groups|)."""
    customer = _t(spark, sf_dir, "customer")
    wr = W.partitionBy("c_nationkey").orderBy(
        F.round(F.col("c_acctbal") * 100).cast("bigint").desc()
    )
    ranked = customer.select(
        F.col("c_nationkey").alias("nation"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cents"),
        F.rank().over(wr).alias("r"),
    )
    return (
        ranked.filter(F.col("r") <= 3)
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("cents").alias("sum_cents"),
            F.min("cents").alias("kth_cents"),
        )
        .orderBy("nation")
    )
