"""TPC-H-shaped queries + time-series gap filling.

With relational.py (Q1/Q3/Q5/Q13), all 22 TPC-H query shapes are
covered. The driver schema lacks partsupp, l_commitdate/l_receiptdate
and c_phone, so Q2/Q9/Q11/Q16/Q20/Q21/Q22 are adapted: same plan shape
(correlated subqueries, semi/anti pairs, share-of-total HAVING),
re-expressed over the available columns."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from log2sql_spark.registry import query
from log2sql_spark.sources.tables import load_table


def _rev_cents() -> F.Column:
    """Exact scaled-decimal sum of extendedprice*(1-discount); divide by
    1e4 after aggregation (see relational._revenue_exact for rationale)."""
    return F.sum(
        (
            F.round(F.col("l_extendedprice") * 100, 0).cast("long")
            * F.round((1 - F.col("l_discount")) * 100, 0).cast("long")
        ).cast("decimal(20,0)")
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT sum(CAST(round(l_extendedprice * 100) AS DECIMAL(20,0))
               * CAST(round(l_discount * 100) AS DECIMAL(5,0))) / 10000.0 AS revenue,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan + conjunctive filter + single aggregate — the
    pushdown showcase (every predicate reaches the parquet scan)."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        (
            F.sum(
                (
                    F.round(F.col("l_extendedprice") * 100, 0).cast("long")
                    * F.round(F.col("l_discount") * 100, 0).cast("long")
                ).cast("decimal(20,0)")
            )
            / 10000.0
        ).alias("revenue"),
        F.count("*").alias("n_rows"),
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS with a correlated date condition (late
    shipments), decorrelated to a semi-join."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders")
    load_table(spark, "lineitem", sf_dir).createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 60 DAYS)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@query(
    "q12_priority_shipping",
    oracle="""
    SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 'high' ELSE 'low' END AS priority_class,
           CAST(count_if(l_shipdate > o_orderdate + INTERVAL 90 DAY) AS BIGINT) AS late_count,
           CAST(count(*) AS BIGINT) AS line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    ORDER BY priority_class
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional aggregation by priority class."""
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .withColumn(
            "priority_class",
            F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high").otherwise("low"),
        )
        .groupBy("priority_class")
        .agg(
            F.count_if(
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
            ).alias("late_count"),
            F.count("*").alias("line_count"),
        )
        .orderBy("priority_class")
    )


@query(
    "q14_promo_share",
    oracle="""
    SELECT 100.0 * sum(CASE WHEN p_type = 'STANDARD' THEN
             CAST(round(l_extendedprice * 100) AS DECIMAL(20,0))
             * CAST(round((1 - l_discount) * 100) AS DECIMAL(5,0)) ELSE 0 END)
           / sum(CAST(round(l_extendedprice * 100) AS DECIMAL(20,0))
             * CAST(round((1 - l_discount) * 100) AS DECIMAL(5,0))) AS standard_share_pct,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: revenue share of one part type (exact-cents
    ratio — both numerator and denominator are exact integers, so the
    division is bit-identical cross-engine)."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    part = load_table(spark, "part", sf_dir)
    rev = (
        F.round(F.col("l_extendedprice") * 100, 0).cast("long")
        * F.round((1 - F.col("l_discount")) * 100, 0).cast("long")
    ).cast("decimal(20,0)")
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        (
            100.0
            * F.sum(F.when(F.col("p_type") == "STANDARD", rev).otherwise(F.lit(0)))
            / F.sum(rev)
        ).alias("standard_share_pct"),
        F.count("*").alias("n_lines"),
    )


@query(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT sum(CAST(round(l_extendedprice * 100) AS DECIMAL(20,0))
               * CAST(round((1 - l_discount) * 100) AS DECIMAL(5,0))) / 10000.0 AS revenue,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across join sides — exercises
    predicate normalization / partial pushdown of the common subterms."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    j = li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 40))
    )
    rev = (
        F.round(F.col("l_extendedprice") * 100, 0).cast("long")
        * F.round((1 - F.col("l_discount")) * 100, 0).cast("long")
    ).cast("decimal(20,0)")
    return j.filter(cond).agg(
        (F.sum(rev) / 10000.0).alias("revenue"), F.count("*").alias("n")
    )


@query(
    "q2_top_supplier_per_region",
    oracle="""
    SELECT r_name, n_name, s_suppkey, s_name, s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE s_acctbal = (SELECT max(s2.s_acctbal)
                       FROM supplier s2 JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
                       WHERE n2.n_regionkey = r.r_regionkey)
    ORDER BY r_name, s_suppkey
    """,
)
def q2_top_supplier_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (no partsupp in this schema): per-region argmax via a
    correlated scalar subquery, expressed Spark-first as a window max over
    the region key — one shuffle on regionkey instead of a self-join, and
    nation/region broadcast so the supplier scan never shuffles for the
    dimension joins."""
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    j = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    w = W.partitionBy("r_regionkey")
    return (
        j.withColumn("max_bal", F.max("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("max_bal"))
        .select("r_name", "n_name", "s_suppkey", "s_name", "s_acctbal")
        .orderBy("r_name", "s_suppkey")
    )


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           sum(CAST(round(l_extendedprice * 100) AS DECIMAL(20,0))
               * CAST(round((1 - l_discount) * 100) AS DECIMAL(5,0))) / 10000.0 AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by year.
    Both nation dims broadcast with their name filter applied BEFORE the
    join, so the fact rows for other nations are dropped at the first
    (broadcast) join — the disjunctive pair condition is checked after
    both nations are attached."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    supp = load_table(spark, "supplier", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir).filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg((_rev_cents() / 10000.0).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    oracle="""
    WITH all_rev AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(round(l_extendedprice * 100) AS DECIMAL(20,0))
               * CAST(round((1 - l_discount) * 100) AS DECIMAL(5,0)) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'STANDARD'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM all_rev GROUP BY o_year ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of a part type's revenue inside a
    region, by year. Every dimension broadcasts; the share is a ratio of
    two exact-decimal sums, so it is bit-identical cross-engine. The two
    nation roles (customer-side region filter, supplier-side share flag)
    reuse one scan."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(F.col("p_type") == "STANDARD")
    supp = load_table(spark, "supplier", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "EUROPE")
    n1 = nation.select("n_nationkey", "n_regionkey")
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    volume = (
        F.round(F.col("l_extendedprice") * 100, 0).cast("long")
        * F.round((1 - F.col("l_discount")) * 100, 0).cast("long")
    ).cast("decimal(20,0)")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .withColumn("volume", volume)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(F.lit(0))
                ).cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(round(l_extendedprice * 100) AS DECIMAL(20,0))
                 * CAST(round((1 - l_discount) * 100) AS DECIMAL(5,0))) / 10000.0
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the quarter's max revenue. The
    revenue CTE (TPC-H's CREATE VIEW) is computed once and reused for
    both the max and the equality filter via an unpartitioned window max
    over the per-supplier aggregate — tiny input, one extra exchange
    instead of a second scan. Exact-decimal revenue makes the equality
    safe cross-engine."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        (_rev_cents() / 10000.0).alias("total_revenue")
    )
    top = revenue.withColumn(
        "max_rev", F.max("total_revenue").over(W.partitionBy())
    ).filter(F.col("total_revenue") == F.col("max_rev"))
    supp = load_table(spark, "supplier", sf_dir)
    return (
        supp.join(top, supp.s_suppkey == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           sum(CAST(round(l_extendedprice * 100) AS DECIMAL(20,0))
               * CAST(round((1 - l_discount) * 100) AS DECIMAL(5,0))) / 10000.0 AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue ranking. Fact-side filters are
    pushed to the scans; nation is broadcast; the single shuffle is the
    groupBy on custkey. Revenue is exact-cents so the DESC sort plus the
    c_custkey tie-break gives a total order for the LIMIT."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, "nation", sf_dir)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg((_rev_cents() / 10000.0).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS total_price,
           CAST(count(*) AS BIGINT) AS n_small
    FROM lineitem l JOIN part p ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < 0.5 * (SELECT avg(l_quantity) FROM lineitem l2
                              WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: below-half-average-quantity lines. The correlated
    avg subquery is decorrelated by hand into a partial agg on partkey
    joined back to the fact — the plan Catalyst would produce, but with
    the agg computed BEFORE the part filter so it sees every line (TPC-H
    semantics). Quantities are integer-valued doubles, so avg is exact
    and the comparison is engine-independent."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(F.col("p_brand") == "Brand#1")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")) / 100.0).alias(
                "total_price"
            ),
            F.count("*").alias("n_small"),
        )
    )


@query(
    "q18_large_volume_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           sum(l_quantity) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume orders via IN-subquery with HAVING,
    expressed as an aggregate → semi-join. The qualifying-order set is
    tiny (sum(qty) > 250 is a steep cut), so it broadcasts into the
    semi-join and the only big shuffle is the final per-order groupBy."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 250)
        .select(F.col("l_orderkey").alias("big_okey"))
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == F.col("big_okey"), "leftsemi")
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(50)
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 25
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (late-ship in place of receipt/commit dates, which
    this schema lacks): the sole-blamed-supplier pattern — EXISTS another
    supplier on the order, NOT EXISTS another LATE supplier. Expressed in
    SQL so Catalyst decorrelates both subqueries to a semi- and an
    anti-join on l_orderkey; all three lineitem reads reuse one scan."""
    load_table(spark, "supplier", sf_dir).createOrReplaceTempView("supplier")
    load_table(spark, "lineitem", sf_dir).createOrReplaceTempView("lineitem")
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT s_name, count(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAYS
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAYS)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 25
        """
    )


@query(
    "q22_idle_customers",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS numcust,
           sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (mktsegment for the missing phone country code):
    above-average-balance customers with no recent orders — uncorrelated
    scalar subquery (broadcast as a literal-like 1-row join) plus an
    anti-join against the date-filtered orders scan.

    Determinism note: avg(c_acctbal) is a double whose summation order
    differs across engines, but acctbals are 2dp-exact and the threshold
    only partitions customers whose balances differ from it by >>1ulp,
    so the predicate is stable cross-engine."""
    load_table(spark, "customer", sf_dir).createOrReplaceTempView("customer")
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_mktsegment,
               count(*) AS numcust,
               -- 100.0D: in Spark SQL an unsuffixed 100.0 is a DECIMAL literal,
               -- which would make this column DECIMAL while DuckDB returns DOUBLE
               sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0D AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )


@query(
    "timeseries_gapfill",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders WHERE o_custkey = 7 GROUP BY 1
    ), bounds AS (
      SELECT min(day) AS lo, max(day) AS hi FROM daily
    ), spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds
    )
    SELECT s.day,
           d.cents AS cents_raw,
           last_value(d.cents IGNORE NULLS) OVER (ORDER BY s.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cents_filled
    FROM spine s LEFT JOIN daily d USING (day)
    ORDER BY s.day
    """,
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling / resampling: build a daily date spine with
    sequence+explode, left-join the sparse series, forward-fill with
    last(ignorenulls) — the time-series densify operator (one window;
    at scale partition the spine by series key)."""
    daily = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_custkey") == 7)
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("cents"))
    )
    spine = (
        daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
        )
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        spine.join(daily, "day", "left")
        .select(
            "day",
            F.col("cents").alias("cents_raw"),
            F.last("cents", ignorenulls=True).over(w).alias("cents_filled"),
        )
        .orderBy("day")
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           sum(CAST(round(l_extendedprice * 100) AS DECIMAL(20,0))
                 * CAST(round((1 - l_discount) * 100) AS DECIMAL(5,0))
               - CAST(round(p_retailprice * 100) AS DECIMAL(20,0))
                 * CAST(l_quantity AS DECIMAL(5,0)) * 60) / 10000.0 AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, o_year
    ORDER BY n_name, o_year DESC
    """,
)
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape (no partsupp: unit cost modeled as 60% of
    p_retailprice). Profit per supplier-nation per year over parts
    matching a name pattern; both factors of each term are exact scaled
    integers so the sum is engine-independent. part/supplier/nation
    broadcast; the orders join is the one real shuffle."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(F.col("p_name").like("%gear%"))
    supp = load_table(spark, "supplier", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    # long per-row arithmetic + decimal accumulator (see
    # relational._revenue_exact): every factor is per-row bounded
    # (cents ~1e7, pct <= 200, qty <= 50, x60), so the signed term fits
    # long with ~7 orders of magnitude of headroom at any scale.
    profit_term = (
        F.round(F.col("l_extendedprice") * 100, 0).cast("long")
        * F.round((1 - F.col("l_discount")) * 100, 0).cast("long")
        - F.round(F.col("p_retailprice") * 100, 0).cast("long")
        * F.col("l_quantity").cast("long")
        * 60
    ).cast("decimal(20,0)")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg((F.sum(profit_term) / 10000.0).alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "q11_important_volume_nations",
    oracle="""
    WITH nat AS (
      SELECT n_name, sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      GROUP BY n_name
    )
    SELECT n_name, cents / 100.0 AS value
    FROM nat
    WHERE cents > 0.05 * (SELECT sum(cents) FROM nat)
    ORDER BY value DESC, n_name
    """,
)
def q11_important_volume_nations(spark, sf_dir):
    """TPC-H Q11 shape (supplier-nation volume for the missing partsupp
    stock value): groups whose share exceeds a fraction of the global
    total — the HAVING-against-scalar-subquery pattern. The global total
    is a 1-row aggregate of the already-aggregated per-nation frame
    (re-aggregation, not a rescan) cross-joined back as a broadcast."""
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    nat = (
        li.join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias("cents"))
    )
    total = nat.agg(F.sum("cents").alias("total_cents"))
    return (
        nat.join(F.broadcast(total))
        .filter(F.col("cents") > 0.05 * F.col("total_cents"))
        .select("n_name", (F.col("cents") / 100.0).alias("value"))
        .orderBy(F.desc("value"), "n_name")
    )


@query(
    "q16_supplier_counts_by_part",
    oracle="""
    SELECT p_brand, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_type <> 'PROMO'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    LIMIT 20
    """,
)
def q16_supplier_counts_by_part(spark, sf_dir):
    """TPC-H Q16 shape: distinct-supplier counts per part attribute with
    a NOT IN exclusion subquery — planned as a broadcast null-aware
    anti-join (the excluded-supplier set is tiny) feeding a
    distinct-aggregate."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(F.col("p_type") != "PROMO")
    bad = (
        load_table(spark, "supplier", sf_dir)
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("bad_key"))
    )
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("bad_key"), "left_anti")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
        .limit(20)
    )


@query(
    "q20_dominant_part_suppliers",
    oracle="""
    WITH pairs AS (
      SELECT l_suppkey, l_partkey, sum(l_quantity) AS q
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey, l_partkey
    ), tot AS (
      SELECT l_partkey, sum(q) AS tq FROM pairs GROUP BY l_partkey
    )
    SELECT DISTINCT s_suppkey, s_name
    FROM supplier
    JOIN pairs ON s_suppkey = l_suppkey
    JOIN tot USING (l_partkey)
    WHERE q > 0.3 * tq
    ORDER BY s_suppkey
    """,
)
def q20_dominant_part_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (shipped-share for the missing availqty): suppliers
    providing >30% of any part's yearly volume. The per-part total is a
    re-aggregation of the (suppkey, partkey) partial — the correlated
    HAVING decorrelated into agg → agg → join, with the second agg and
    join keyed on partkey so no row ever revisits the fact table."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    pairs = li.groupBy("l_suppkey", "l_partkey").agg(F.sum("l_quantity").alias("q"))
    tot = pairs.groupBy("l_partkey").agg(F.sum("q").alias("tq"))
    supp = load_table(spark, "supplier", sf_dir)
    return (
        pairs.join(tot, "l_partkey")
        .filter(F.col("q") > 0.3 * F.col("tq"))
        .select("l_suppkey")
        .distinct()
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )
