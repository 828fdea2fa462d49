"""More TPC-H-shaped queries (Q4/Q6/Q12/Q14/Q19 adapted to the driver
schema) + time-series gap filling."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from log2sql_spark.registry import query
from log2sql_spark.sources.tables import load_table


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
                F.round(F.col("l_extendedprice") * 100, 0).cast("decimal(20,0)")
                * F.round(F.col("l_discount") * 100, 0).cast("decimal(5,0)")
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
    rev = F.round(F.col("l_extendedprice") * 100, 0).cast("decimal(20,0)") * F.round(
        (1 - F.col("l_discount")) * 100, 0
    ).cast("decimal(5,0)")
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
    rev = F.round(F.col("l_extendedprice") * 100, 0).cast("decimal(20,0)") * F.round(
        (1 - F.col("l_discount")) * 100, 0
    ).cast("decimal(5,0)")
    return j.filter(cond).agg(
        (F.sum(rev) / 10000.0).alias("revenue"), F.count("*").alias("n")
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
