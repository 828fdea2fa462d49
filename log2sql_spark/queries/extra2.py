"""Third-wave scalar/aggregate/window coverage + interval self-join."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from log2sql_spark.registry import query
from log2sql_spark.sources.tables import load_table


@query(
    "string_funcs2",
    oracle="""
    SELECT c_custkey,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
           rpad(c_mktsegment, 12, '.') AS seg_padded,
           reverse(c_name) AS name_rev,
           repeat(left(c_mktsegment, 1), 3) AS initials,
           right(c_name, 4) AS name_tail,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_lowvowel,
           CAST(levenshtein(c_mktsegment, 'BUILDING') AS INTEGER) AS dist_to_building
    FROM customer
    WHERE c_custkey <= 400
    ORDER BY c_custkey
    """,
)
def string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string-function wave: padding, reverse/repeat, slicing,
    translate, edit distance (levenshtein doubles as a fuzzy-dedup
    primitive)."""
    return (
        load_table(spark, "customer", sf_dir)
        .filter(F.col("c_custkey") <= 400)
        .select(
            "c_custkey",
            F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
            F.rpad("c_mktsegment", 12, ".").alias("seg_padded"),
            F.reverse("c_name").alias("name_rev"),
            F.repeat(F.substring("c_mktsegment", 1, 1), 3).alias("initials"),
            F.substring("c_name", -4, 4).alias("name_tail"),
            F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_lowvowel"),
            F.levenshtein("c_mktsegment", F.lit("BUILDING")).alias("dist_to_building"),
        )
        .orderBy("c_custkey")
    )


@query(
    "date_funcs2",
    oracle="""
    SELECT o_orderkey,
           CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
           CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow_sun1,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           o_orderdate + INTERVAL 3 MONTH AS plus_3_months,
           CAST(make_date(CAST(year(o_orderdate) AS INTEGER), 1, 1) AS TIMESTAMP) AS year_start,
           CAST(date_diff('month', CAST(make_date(CAST(year(o_orderdate) AS INTEGER), 1, 1) AS TIMESTAMP), o_orderdate) AS INTEGER) AS months_into_year
    FROM orders
    WHERE o_orderkey <= 600
    ORDER BY o_orderkey
    """,
)
def date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second date wave: last_day, ISO week, day-of-week (normalized:
    Spark is 1=Sunday, DuckDB 0=Sunday), quarter, month arithmetic."""
    ys = F.make_date(F.year("o_orderdate"), F.lit(1), F.lit(1)).cast("timestamp")
    return (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderkey") <= 600)
        .select(
            "o_orderkey",
            F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
            F.weekofyear("o_orderdate").alias("iso_week"),
            F.dayofweek("o_orderdate").alias("dow_sun1"),
            F.quarter("o_orderdate").alias("qtr"),
            (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTHS")).alias("plus_3_months"),
            ys.alias("year_start"),
            (F.months_between(F.date_trunc("month", "o_orderdate"), ys))
            .cast("int")
            .alias("months_into_year"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "agg_conditional",
    oracle="""
    SELECT o_orderstatus,
           CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
           CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent,
           bool_or(o_totalprice > 400000) AS any_huge,
           bool_and(o_totalprice > 0) AS all_positive,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT) AS low_prio_cents
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: count_if, filtered count/sum, bool_or/and."""
    return (
        load_table(spark, "orders", sf_dir)
        .groupBy("o_orderstatus")
        .agg(
            F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
            F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias("n_urgent"),
            F.bool_or(F.col("o_totalprice") > 400000).alias("any_huge"),
            F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
            F.sum(
                F.when(
                    F.col("o_orderpriority") == "5-LOW",
                    F.round(F.col("o_totalprice") * 100, 0).cast("long"),
                )
            ).alias("low_prio_cents"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "agg_correlation",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
           round(covar_pop(l_discount, l_tax), 8) AS disc_tax_covar
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate aggregates: Pearson correlation, sample/population
    covariance (single-pass co-moments)."""
    return (
        load_table(spark, "lineitem", sf_dir)
        .groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qty_price_covar"),
            F.round(F.covar_pop("l_discount", "l_tax"), 8).alias("disc_tax_covar"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_grouping_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
           CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY g_flag, g_status, l_returnflag, l_linestatus
    """,
)
def agg_grouping_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grouping() indicator columns distinguish subtotal rows from real
    NULL group keys in rollups."""
    return (
        load_table(spark, "lineitem", sf_dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("long").alias("g_flag"),
            F.grouping("l_linestatus").cast("long").alias("g_status"),
            F.count("*").alias("n"),
        )
        .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus")
    )


@query(
    "window_value_funcs",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey) OVER w AS latest_order,
           nth_value(o_orderkey, 2) OVER w AS second_order,
           CAST(count(*) OVER w AS BIGINT) AS n_orders
    FROM orders
    WHERE o_custkey <= 60
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_value_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value over an unbounded frame (deterministic order
    incl. unique tie-break)."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_custkey") <= 60)
        .select(
            "o_custkey",
            "o_orderkey",
            F.first("o_orderkey").over(w).alias("first_order"),
            F.last("o_orderkey").over(w).alias("latest_order"),
            F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
            F.count("*").over(w).alias("n_orders"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "bitwise_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_orderkey & 255 AS low_byte,
           l_orderkey | 4096 AS with_flag,
           xor(l_orderkey, CAST(l_linenumber AS BIGINT)) AS key_xor_line,
           CAST(bit_count(l_orderkey) AS INTEGER) AS key_bits,
           l_orderkey << 2 AS shifted_l,
           l_orderkey >> 3 AS shifted_r
    FROM lineitem
    WHERE l_orderkey <= 300
    ORDER BY l_orderkey, l_linenumber
    """,
)
def bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator surface (DuckDB: ^ is power, so the oracle uses
    xor())."""
    return (
        load_table(spark, "lineitem", sf_dir)
        .filter(F.col("l_orderkey") <= 300)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_orderkey").bitwiseAND(F.lit(255)).alias("low_byte"),
            F.col("l_orderkey").bitwiseOR(F.lit(4096)).alias("with_flag"),
            F.col("l_orderkey").bitwiseXOR(F.col("l_linenumber").cast("long")).alias("key_xor_line"),
            F.bit_count("l_orderkey").alias("key_bits"),
            F.expr("shiftleft(l_orderkey, 2)").alias("shifted_l"),
            F.expr("shiftright(l_orderkey, 3)").alias("shifted_r"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "subquery_scalar_correlated",
    oracle="""
    SELECT p_type, p_partkey, p_retailprice
    FROM part p
    WHERE p_retailprice = (SELECT min(p2.p_retailprice) FROM part p2
                           WHERE p2.p_type = p.p_type)
    ORDER BY p_type, p_partkey
    """,
)
def subquery_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q2 shape): cheapest part per
    type. Catalyst decorrelates it into an aggregate + join."""
    load_table(spark, "part", sf_dir).createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p_type, p_partkey, p_retailprice
        FROM part p
        WHERE p_retailprice = (SELECT min(p2.p_retailprice) FROM part p2
                               WHERE p2.p_type = p.p_type)
        ORDER BY p_type, p_partkey
        """
    )


@query(
    "subquery_exists",
    oracle="""
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_with_big_order
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 350000)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (planned as a left-semi join)."""
    load_table(spark, "customer", sf_dir).createOrReplaceTempView("customer")
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_mktsegment, count(*) AS n_with_big_order
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 350000)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )


@query(
    "unpivot_metrics",
    oracle="""
    WITH agg AS (
      SELECT l_returnflag,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'total_qty' AS metric, total_qty AS value FROM agg
    UNION ALL
    SELECT l_returnflag, 'total_cents' AS metric, total_cents AS value FROM agg
    ORDER BY l_returnflag, metric
    """,
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unpivot/melt: wide per-flag aggregates → long (flag, metric,
    value) rows."""
    agg = (
        load_table(spark, "lineitem", sf_dir)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias("total_cents"),
        )
    )
    return agg.unpivot(
        ids=["l_returnflag"],
        values=["total_qty", "total_cents"],
        variableColumnName="metric",
        valueColumnName="value",
    ).orderBy("l_returnflag", "metric")


@query(
    "skew_salted_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents,
           CAST(count(*) AS BIGINT) AS n,
           min(l_shipdate) AS first_ship,
           max(l_shipdate) AS last_ship
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation: only 3 distinct returnflags, so
    a plain groupBy concentrates 600k rows on 3 reducers; salting into
    (key, salt-of-16) spreads each hot key across 16, then re-merges.
    Result must equal the plain aggregation (the oracle)."""
    from log2sql_spark.operators.skew import salted_aggregate

    li = load_table(spark, "lineitem", sf_dir).withColumn(
        "cents_in", F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    )
    return salted_aggregate(
        li,
        keys=["l_returnflag"],
        aggs={
            "cents": ("sum", "cents_in"),
            "n": ("count", "l_orderkey"),
            "first_ship": ("min", "l_shipdate"),
            "last_ship": ("max", "l_shipdate"),
        },
        buckets=16,
        salt_cols=["l_orderkey", "l_linenumber"],
    ).orderBy("l_returnflag")


@query(
    "skew_salted_join",
    oracle="""
    WITH dim(l_returnflag, flag_name) AS (
      VALUES ('A', 'returned-accepted'), ('N', 'not-returned'), ('R', 'returned')
    )
    SELECT flag_name, CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM lineitem JOIN dim USING (l_returnflag)
    GROUP BY flag_name
    ORDER BY flag_name
    """,
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe join: the fact side's 3-value key is maximally skewed;
    salting spreads it over 16 buckets while the 3-row dim is replicated
    ×16. Same result as the plain join (the oracle)."""
    from log2sql_spark.operators.skew import salted_join

    li = load_table(spark, "lineitem", sf_dir)
    from log2sql_spark.localrel import values_df

    dim = values_df(
        spark,
        [("A", "returned-accepted"), ("N", "not-returned"), ("R", "returned")],
        "l_returnflag string, flag_name string",
    )
    return (
        salted_join(li, dim, keys=["l_returnflag"], buckets=16, salt_cols=["l_orderkey"])
        .groupBy("flag_name")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias("cents"),
        )
        .orderBy("flag_name")
    )


@query(
    "array_funcs2",
    oracle="""
    WITH t AS (
      SELECT p_partkey, p_name,
             string_split(p_name, ' ') AS toks,
             string_split(p_type, ' ') AS type_toks
      FROM part WHERE p_partkey <= 300
    )
    SELECT p_partkey,
           array_to_string(flatten([toks, type_toks]), '|') AS all_toks,
           coalesce(array_to_string(list_sort(list_intersect(toks, type_toks)), '|'), '')
             AS common,
           list_has_any(toks, type_toks) AS overlaps,
           array_to_string(range(1, CAST(len(toks) AS INTEGER) + 1), ',') AS idx,
           split_part(toks[1], 'a', 1) AS first_before_a,
           coalesce(array_to_string(regexp_extract_all(p_name, '[a-z]+'), '|'), '')
             AS lower_runs
    FROM t
    ORDER BY p_partkey
    """,
)
def array_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second array wave: flatten, intersect/overlap, sequence,
    split_part, regexp_extract_all.

    Array columns are serialized (array_join / sorted join) at the query
    boundary: the driver's canonicalizer sorts rows via pandas, which
    cannot hash python lists — this was the one red row in round 1.
    Intersection output order is engine-specific, so `common` is sorted
    before joining on BOTH engines."""
    toks = F.split(F.col("p_name"), " ")
    type_toks = F.split(F.col("p_type"), " ")
    return (
        load_table(spark, "part", sf_dir)
        .filter(F.col("p_partkey") <= 300)
        .select(
            "p_partkey",
            F.array_join(F.flatten(F.array(toks, type_toks)), "|").alias("all_toks"),
            F.array_join(F.sort_array(F.array_intersect(toks, type_toks)), "|").alias("common"),
            F.arrays_overlap(toks, type_toks).alias("overlaps"),
            F.array_join(
                F.transform(F.sequence(F.lit(1), F.size(toks)), lambda x: x.cast("string")), ","
            ).alias("idx"),
            F.split_part(F.element_at(toks, 1), F.lit("a"), F.lit(1)).alias("first_before_a"),
            F.array_join(F.regexp_extract_all("p_name", F.lit("[a-z]+"), 0), "|").alias(
                "lower_runs"
            ),
        )
        .orderBy("p_partkey")
    )


@query(
    "try_safe_funcs",
    oracle="""
    SELECT o_orderkey,
           TRY_CAST(o_orderpriority AS INTEGER) AS prio_as_int,
           TRY_CAST(split_part(o_orderpriority, '-', 1) AS INTEGER) AS prio_rank,
           CASE WHEN o_orderkey % 10 = 0 THEN NULL
                ELSE CAST(o_totalprice / (o_orderkey % 10) AS DOUBLE) END AS safe_div
    FROM orders
    WHERE o_orderkey <= 500
    ORDER BY o_orderkey
    """,
)
def try_safe_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe casts/division: try_cast and try_divide return NULL
    instead of failing the job — the ingest-hygiene functions."""
    return (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderkey") <= 500)
        .select(
            "o_orderkey",
            F.expr("TRY_CAST(o_orderpriority AS INT)").alias("prio_as_int"),
            F.expr("TRY_CAST(split_part(o_orderpriority, '-', 1) AS INT)").alias("prio_rank"),
            F.try_divide("o_totalprice", F.col("o_orderkey") % 10).alias("safe_div"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "profile_columns",
    oracle="""
    WITH w AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count_if(o_custkey IS NULL) AS BIGINT) AS ck_nulls,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS ck_distinct,
             CAST(min(o_custkey) AS VARCHAR) AS ck_min, CAST(max(o_custkey) AS VARCHAR) AS ck_max,
             CAST(count_if(o_orderstatus IS NULL) AS BIGINT) AS st_nulls,
             CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS st_distinct,
             min(o_orderstatus) AS st_min, max(o_orderstatus) AS st_max,
             CAST(count_if(o_totalprice IS NULL) AS BIGINT) AS tp_nulls,
             CAST(count(DISTINCT o_totalprice) AS BIGINT) AS tp_distinct,
             CAST(min(o_totalprice) AS VARCHAR) AS tp_min, CAST(max(o_totalprice) AS VARCHAR) AS tp_max
      FROM orders
    )
    SELECT 'o_custkey' AS col_name, n_rows, ck_nulls AS n_nulls, ck_distinct AS n_distinct,
           ck_min AS min_str, ck_max AS max_str FROM w
    UNION ALL
    SELECT 'o_orderstatus', n_rows, st_nulls, st_distinct, st_min, st_max FROM w
    UNION ALL
    SELECT 'o_totalprice', n_rows, tp_nulls, tp_distinct, tp_min, tp_max FROM w
    ORDER BY col_name
    """,
)
def profile_columns_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass multi-column profile (nulls/distinct/min/max)."""
    from log2sql_spark.operators.profile import profile_columns

    return profile_columns(
        load_table(spark, "orders", sf_dir),
        ["o_custkey", "o_orderstatus", "o_totalprice"],
    ).withColumnRenamed("column", "col_name").orderBy("col_name")


@query(
    "sample_hash_deterministic",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_sampled,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
           CAST(min(o_orderkey) AS BIGINT) AS first_key
    FROM orders
    WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 100 < 10
    """,
)
def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% hash sample: the same rows selected in every engine and run
    (unlike rand()/TABLESAMPLE) — reproducible experiment splits."""
    from log2sql_spark.operators.profile import hash_sample

    return hash_sample(load_table(spark, "orders", sf_dir), "o_orderkey", 10).agg(
        F.count("*").alias("n_sampled"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("cents"),
        F.min("o_orderkey").alias("first_key"),
    )


@query(
    "histogram_value_buckets",
    oracle="""
    WITH b AS (
      SELECT CAST(least(floor(value / 2.0), 9) AS BIGINT) AS bucket FROM events
    )
    SELECT bucket, CAST(count(*) AS BIGINT) AS n
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def histogram_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram over events.value (bucket = floor(v/2),
    capped): the shuffle moves only (bucket, partial count)."""
    return (
        load_table(spark, "events", sf_dir)
        .select(F.least(F.floor(F.col("value") / 2.0), F.lit(9)).cast("long").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )


def _vectorized_topk_oracle() -> str:
    from log2sql_spark.queries.llm import _cos_sql

    return f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 20),
         c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
         scored AS (
           SELECT query_id, neighbor_id, {_cos_sql('qv', 'cv')} AS cos_sim
           FROM q, c WHERE query_id <> neighbor_id
         ),
         ranked AS (
           SELECT query_id, neighbor_id, cos_sim,
                  CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
           FROM scored
         )
    SELECT query_id, neighbor_id, round(cos_sim, 6) AS cos_sim, rank
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank
    """


@query("llm_sim_topk_vectorized", oracle=_vectorized_topk_oracle())
def llm_sim_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow/numpy fast path of llm_sim_topk_bruteforce (one float64
    matmul per candidate batch). BLAS and the sequential fold agree to
    ~1e-15 relative, so rounding cos_sim to 6 dp makes the scores — and
    therefore the ranks — oracle-comparable against the exact fold
    computed in SQL; pytest separately asserts neighbor-set equality
    with the exact variant."""
    from log2sql_spark.operators.similarity import brute_force_topk_vectorized

    emb = load_table(spark, "embeddings", sf_dir)
    return (
        brute_force_topk_vectorized(emb.filter(F.col("vec_id") < 20), emb, k=5)
        .withColumn("cos_sim", F.round("cos_sim", 6))
        .orderBy("query_id", "rank")
    )


@query(
    "join_interval_self",
    oracle="""
    SELECT a.user_id, CAST(count(*) AS BIGINT) AS n_close_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND b.ts BETWEEN a.ts AND a.ts + INTERVAL 2 MINUTE
    WHERE a.event_id < 4000 AND b.event_id < 4000
    GROUP BY a.user_id
    ORDER BY a.user_id
    """,
)
def join_interval_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (temporal band) self-join: same-user event pairs within
    2 minutes. The equi key (user_id) bounds the quadratic term to
    per-user group sizes — the scalable shape for temporal joins."""
    ev = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("event_id") < 4000)
        .select("event_id", "user_id", "ts")
    )
    a, b = ev.alias("a"), ev.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_id") < F.col("b.event_id"))
            & F.col("b.ts").between(
                F.col("a.ts"), F.col("a.ts") + F.expr("INTERVAL 2 MINUTES")
            ),
        )
        .groupBy(F.col("a.user_id").alias("user_id"))
        .agg(F.count("*").alias("n_close_pairs"))
        .orderBy("user_id")
    )


@query(
    "window_range_interval",
    oracle="""
    SELECT event_id, event_type, ts,
           sum(CAST(round(value * 100) AS BIGINT))
             OVER (PARTITION BY event_type ORDER BY ts
                   RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING AND CURRENT ROW)
             / 100.0 AS rolling_10m_value,
           CAST(count(*) OVER (PARTITION BY event_type ORDER BY ts
                   RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING AND CURRENT ROW)
             AS BIGINT) AS rolling_10m_events
    FROM events
    WHERE event_id < 2000
    ORDER BY event_id
    """,
)
def window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window over event time (vs the ROWS frames elsewhere):
    a true time-interval frame — peers are selected by timestamp
    distance, not row count. Money as integer cents inside the frame
    sum so the rolling total is order-independent."""
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir).filter(F.col("event_id") < 2000)
    # RANGE frames need a numeric sort key in Spark: seconds since epoch.
    # microsecond sort key: unix_timestamp() truncates to seconds, which
    # would shift frame boundaries vs the oracle's full-precision INTERVAL
    w = (
        W.partitionBy("event_type")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-600_000_000, 0)
    )
    return (
        ev.select(
            "event_id",
            "event_type",
            "ts",
            (F.sum(F.round(F.col("value") * 100, 0).cast("long")).over(w) / 100.0).alias(
                "rolling_10m_value"
            ),
            F.count("*").over(w).cast("long").alias("rolling_10m_events"),
        )
        .orderBy("event_id")
    )


@query(
    "sql_multi_cte",
    oracle="""
    WITH seg AS (
      SELECT c_mktsegment, c_custkey FROM customer
    ), per_cust AS (
      SELECT o_custkey,
             CAST(count(*) AS BIGINT) AS n_orders,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT seg.c_mktsegment, per_cust.n_orders, per_cust.cents,
             row_number() OVER (PARTITION BY seg.c_mktsegment
                                ORDER BY per_cust.cents DESC, per_cust.o_custkey) AS rk
      FROM per_cust JOIN seg ON per_cust.o_custkey = seg.c_custkey
    )
    SELECT c_mktsegment, rk, n_orders, cents / 100.0 AS total_spend
    FROM ranked WHERE rk <= 3
    ORDER BY c_mktsegment, rk
    """,
)
def sql_multi_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front-end end-to-end: temp views + a multi-CTE
    ``spark.sql`` query (join, window, top-k per group) — proving a
    reference user can drive the engine with plain SQL, not just the
    DataFrame API. Tie-break on o_custkey makes the per-segment top-3
    deterministic; money stays integer cents until the final scale."""
    load_table(spark, "customer", sf_dir).createOrReplaceTempView("customer_v")
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        WITH seg AS (
          SELECT c_mktsegment, c_custkey FROM customer_v
        ), per_cust AS (
          SELECT o_custkey,
                 CAST(count(*) AS BIGINT) AS n_orders,
                 sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
          FROM orders_v GROUP BY o_custkey
        ), ranked AS (
          SELECT seg.c_mktsegment, per_cust.n_orders, per_cust.cents,
                 row_number() OVER (PARTITION BY seg.c_mktsegment
                                    ORDER BY per_cust.cents DESC, per_cust.o_custkey) AS rk
          FROM per_cust JOIN seg ON per_cust.o_custkey = seg.c_custkey
        )
        -- CAST to DOUBLE: in SQL text 100.0 is a DECIMAL literal (unlike
        -- F.lit(100.0)), and BIGINT/DECIMAL would yield DECIMAL output
        SELECT c_mktsegment, rk, n_orders, CAST(cents AS DOUBLE) / 100.0D AS total_spend
        FROM ranked WHERE rk <= 3
        ORDER BY c_mktsegment, rk
        """
    )


_BUCKETED_READY: set[str] = set()


@query(
    "bucketed_join_colocated",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_spend
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1
    ORDER BY 1
    """,
)
def bucketed_join_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located join via bucketing — the 100 TB fact⋈fact
    pattern when neither side broadcasts: both tables are written
    ``bucketBy(8, key)`` (same count, same key), so the sort-merge join
    consumes bucket layout directly and the ONLY exchange in the query
    is the final small groupBy. ``hint('merge')`` pins SMJ so the
    broadcast planner can't hide the property being demonstrated
    (tests/test_plans.py asserts zero Exchange under the join)."""
    import hashlib

    from log2sql_spark.scratch import scratch_dir

    db = "bkt_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    if db not in _BUCKETED_READY or not spark.catalog.tableExists(f"{db}.orders_b"):
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
        base = scratch_dir("log2sql_bucketed_")
        (
            load_table(spark, "orders", sf_dir)
            .select("o_custkey", "o_totalprice")
            .write.bucketBy(8, "o_custkey")
            .sortBy("o_custkey")
            .option("path", f"{base}/orders_b")
            .mode("overwrite")
            .saveAsTable(f"{db}.orders_b")
        )
        (
            load_table(spark, "customer", sf_dir)
            .select("c_custkey", "c_mktsegment")
            .write.bucketBy(8, "c_custkey")
            .sortBy("c_custkey")
            .option("path", f"{base}/customer_b")
            .mode("overwrite")
            .saveAsTable(f"{db}.customer_b")
        )
        _BUCKETED_READY.add(db)
    o = spark.table(f"{db}.orders_b")
    c = spark.table(f"{db}.customer_b")
    return (
        o.hint("merge")
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            (F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")) / 100.0).alias(
                "total_spend"
            ),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "timeseries_rollup_hierarchy",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mon,
           CAST(count(*) AS BIGINT) AS n_orders,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_value
    FROM orders
    GROUP BY ROLLUP (1, 2)
    ORDER BY yr NULLS FIRST, mon NULLS FIRST
    """,
)
def timeseries_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-hierarchy rollup (the hypertable/continuous-aggregate shape):
    year → month subtotals + grand total in one pass — Spark computes
    all grouping sets in a single shuffle with partial aggregation."""
    o = load_table(spark, "orders", sf_dir)
    return (
        o.select(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mon"),
            "o_totalprice",
        )
        .rollup("yr", "mon")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            (F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")) / 100.0).alias(
                "total_value"
            ),
        )
        .orderBy(F.asc_nulls_first("yr"), F.asc_nulls_first("mon"))
    )


@query(
    "join_fuzzy_blocked",
    oracle="""
    WITH names AS (
      SELECT DISTINCT p_name FROM part
    ), typos AS (
      SELECT p_name AS orig,
             substr(p_name, 1, 2) || substr(p_name, 4) AS typo
      FROM names WHERE length(p_name) >= 4
    )
    SELECT t.typo, n.p_name AS matched,
           CAST(levenshtein(t.typo, n.p_name) AS INTEGER) AS dist
    FROM typos t JOIN names n
      ON substr(t.typo, 1, 2) = substr(n.p_name, 1, 2)
     AND abs(length(t.typo) - length(n.p_name)) <= 2
     AND levenshtein(t.typo, n.p_name) <= 2
    ORDER BY t.typo, n.p_name
    """,
)
def join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (edit-distance) join with blocking: deterministic typos
    (3rd char dropped) matched back to the name dictionary on
    levenshtein ≤ 2 — but only within a (2-char prefix, ±2 length)
    block, so the quadratic distance computation runs per block, never
    all-pairs. The equi prefix key is what Spark shuffles on; the
    distance predicate filters inside the block — the standard entity-
    resolution shape at scale."""
    names = load_table(spark, "part", sf_dir).select("p_name").distinct()
    typos = names.filter(F.length("p_name") >= 4).select(
        F.col("p_name").alias("orig"),
        F.concat(
            F.col("p_name").substr(1, 2), F.expr("substr(p_name, 4)")
        ).alias("typo"),
    )
    n = names.alias("n")
    t = typos.alias("t")
    return (
        t.join(
            n,
            (F.col("t.typo").substr(1, 2) == F.col("n.p_name").substr(1, 2))
            & (
                F.abs(F.length("t.typo") - F.length("n.p_name")) <= 2
            )
            & (F.levenshtein(F.col("t.typo"), F.col("n.p_name")) <= 2),
        )
        .select(
            "t.typo",
            F.col("n.p_name").alias("matched"),
            F.levenshtein(F.col("t.typo"), F.col("n.p_name")).cast("int").alias("dist"),
        )
        .orderBy("typo", "matched")
    )


@query(
    "join_asof_forward",
    oracle="""
    WITH ship AS (
      SELECT l_orderkey, l_shipdate, l_linenumber, l_quantity FROM (
        SELECT l_orderkey, l_shipdate, l_linenumber, l_quantity,
               row_number() OVER (PARTITION BY l_orderkey, l_shipdate
                                  ORDER BY l_linenumber) AS rn
        FROM lineitem
      ) WHERE rn = 1
    ), o AS (
      SELECT o_orderkey, o_orderdate, o_totalprice FROM orders WHERE o_orderkey < 4000
    )
    SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CASE WHEN s.l_shipdate - o.o_orderdate <= INTERVAL 75 DAY
                THEN s.l_shipdate END AS first_ship,
           CASE WHEN s.l_shipdate - o.o_orderdate <= INTERVAL 75 DAY
                THEN s.l_quantity END AS first_ship_qty
    FROM o ASOF LEFT JOIN ship s
      ON o.o_orderkey = s.l_orderkey AND s.l_shipdate >= o.o_orderdate
    ORDER BY o.o_orderkey
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with tolerance: each order picks its EARLIEST
    shipment at-or-after the order date, nulled when it ships more than
    75 days out (merge_asof tolerance semantics — the left row
    survives). Same union+window kernel as the backward join, one
    shuffle; only the window's time order flips."""
    from pyspark.sql import Window as W

    from log2sql_spark.operators.asof import asof_join

    # Shared key bound: the left filter and the right-side prefilter
    # below MUST agree or the mirror silently drops valid matches.
    key_bound = 4000
    left = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderkey") < key_bound)
        .select(
            F.col("o_orderkey").alias("key"),
            F.col("o_orderdate").alias("ts"),
            "o_totalprice",
        )
    )
    right = (
        load_table(spark, "lineitem", sf_dir)
        # Mirror the left side's key bound (guide §3.2 / §6): the as-of
        # kernel equi-joins on the key, so lineitem rows with
        # l_orderkey >= key_bound can never match any left row — the
        # literal predicate pushes to the parquet scan (PushedFilters),
        # dropping them before the dedup window instead of shuffling
        # them all. Whole (l_orderkey, l_shipdate) window groups are
        # kept or dropped, so rn is unchanged.
        .filter(F.col("l_orderkey") < key_bound)
        .select("l_orderkey", "l_shipdate", "l_linenumber", "l_quantity")
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("l_orderkey", "l_shipdate").orderBy("l_linenumber")
            ),
        )
        .filter("rn = 1")
        .select(
            F.col("l_orderkey").alias("key"),
            F.col("l_shipdate").alias("ts"),
            F.col("l_shipdate").alias("ship_ts"),
            "l_quantity",
        )
    )
    return (
        asof_join(
            left,
            right,
            on="ts",
            by="key",
            right_cols=["ship_ts", "l_quantity"],
            direction="forward",
            tolerance_seconds=75 * 86400,
        )
        .select(
            F.col("key").alias("o_orderkey"),
            F.col("ts").alias("o_orderdate"),
            "o_totalprice",
            F.col("ship_ts").alias("first_ship"),
            F.col("l_quantity").alias("first_ship_qty"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "string_funcs3",
    oracle="""
    SELECT p_partkey,
           split_part(p_name, ' ', 1) AS first_word,
           translate(p_name, 'aeiou', '12345') AS translated,
           repeat(left(p_name, 2), 3) AS repeated,
           reverse(p_name) AS reversed_name,
           CAST(ascii(p_name) AS INTEGER) AS first_code,
           left(p_name, 3) AS l3,
           right(p_name, 3) AS r3,
           CAST(instr(p_name, 'a') AS BIGINT) AS a_pos,
           to_hex(p_partkey) AS key_hex,
           bin(p_partkey) AS key_bin
    FROM part
    WHERE p_partkey < 800
    ORDER BY p_partkey
    """,
)
def string_funcs3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third string-function batch: split_part / translate / repeat /
    reverse / ascii / left / right / instr / hex / bin — all JVM
    expressions, all reproducible in the oracle dialect."""
    p = load_table(spark, "part", sf_dir).filter(F.col("p_partkey") < 800)
    name = F.col("p_name")
    return p.select(
        "p_partkey",
        F.split_part(name, F.lit(" "), F.lit(1)).alias("first_word"),
        F.translate(name, "aeiou", "12345").alias("translated"),
        F.repeat(F.substring(name, 1, 2), 3).alias("repeated"),
        F.reverse(name).alias("reversed_name"),
        F.ascii(name).cast("int").alias("first_code"),
        F.expr("left(p_name, 3)").alias("l3"),
        F.expr("right(p_name, 3)").alias("r3"),
        F.instr(name, "a").cast("long").alias("a_pos"),
        F.hex(F.col("p_partkey")).alias("key_hex"),
        F.bin(F.col("p_partkey")).alias("key_bin"),
    ).orderBy("p_partkey")


@query(
    "date_funcs3",
    oracle="""
    SELECT o_orderkey,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
           CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
           CAST(make_date(CAST(year(o_orderdate) AS INTEGER),
                     CAST(month(o_orderdate) AS INTEGER), 1) AS TIMESTAMP) AS month_start,
           CAST(date_add(CAST(o_orderdate AS DATE), INTERVAL 2 MONTH) AS TIMESTAMP)
             AS plus_two_months,
           strftime(o_orderdate, '%Y/%m') AS ym
    FROM orders
    WHERE o_orderkey < 2000
    ORDER BY o_orderkey
    """,
)
def date_funcs3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third date-function batch: last_day / quarter / ISO week /
    day-of-year / make_date / add_months (end-of-month clamped the same
    way on both engines) / date_format."""
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderkey") < 2000)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.quarter(d).cast("int").alias("qtr"),
        F.weekofyear(d).cast("int").alias("iso_week"),
        F.dayofyear(d).cast("int").alias("doy"),
        F.make_date(F.year(d), F.month(d), F.lit(1)).cast("timestamp").alias("month_start"),
        F.add_months(d.cast("date"), 2).cast("timestamp").alias("plus_two_months"),
        F.date_format(d, "yyyy/MM").alias("ym"),
    ).orderBy("o_orderkey")


@query(
    "udtf_word_positions",
    oracle=r"""
    WITH t AS (
      -- list_filter: Python str.split() yields NO tokens for empty or
      -- whitespace-only text, while regexp_split_to_array('') is ['']
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\s+'),
                         x -> x <> '') AS w
      FROM documents WHERE doc_id < 100
    ), i AS (
      SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i FROM t
    )
    SELECT doc_id,
           CAST(i - 1 AS INTEGER) AS pos,
           w[CAST(i AS INTEGER)] AS word,
           CAST(length(w[CAST(i AS INTEGER)]) AS INTEGER) AS wlen
    FROM i
    ORDER BY doc_id, pos
    """,
)
def udtf_word_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    r"""A REAL Python UDTF (Spark 4 ``@udtf``, Arrow-optimized) in a
    LATERAL join: one input row expands to one row per word with its
    position. Completes the UDF/UDAF/UDTF triple — scalar pandas UDFs
    (multimodal), grouped-agg pandas UDF (udaf_weighted_mean), and now a
    table function. Python ``str.split()`` matches the oracle's
    ``\s+`` tokenization for ASCII whitespace."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, word string, wlen int", useArrow=True)
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate((text or "").split()):
                yield i, w, len(w)

    spark.udtf.register("log2sql_split_words", SplitWords)
    load_table(spark, "documents", sf_dir).filter(
        F.col("doc_id") < 100
    ).createOrReplaceTempView("udtf_docs_v")
    return spark.sql(
        """
        SELECT doc_id, s.pos, s.word, s.wlen
        FROM udtf_docs_v, LATERAL log2sql_split_words(text) s
        ORDER BY doc_id, pos
        """
    )


@query(
    "map_funcs2",
    oracle="""
    SELECT o_orderkey,
           o_custkey * 2 AS qty_doubled,
           'PRICE,QTY' AS upper_keys,
           CAST(round(o_totalprice * 100) AS BIGINT) * 2 AS price_self_sum,
           'price=' || CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)
             || ',qty=' || CAST(o_custkey AS VARCHAR) AS entries_sorted,
           '2' AS from_str_map
    FROM orders
    WHERE o_orderkey <= 500
    ORDER BY o_orderkey
    """,
)
def map_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order map functions (transform_keys / transform_values /
    map_zip_with / map_entries / str_to_map). Outputs are extracted
    scalars or sorted joined entries — DuckDB's map surface differs, so
    the oracle states expected values computed from the same columns."""
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderkey") <= 500)
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    m = F.create_map(
        F.lit("qty"), F.col("o_custkey").cast("long"), F.lit("price"), cents
    )
    doubled = F.transform_values(m, lambda _k, v: v * 2)
    upper = F.transform_keys(m, lambda k, _v: F.upper(k))
    zipped = F.map_zip_with(m, m, lambda _k, a, b: a + b)
    entries = F.array_join(
        F.sort_array(
            F.transform(
                F.map_entries(m),
                lambda e: F.concat(e["key"], F.lit("="), e["value"].cast("string")),
            )
        ),
        ",",
    )
    sm = F.str_to_map(F.lit("a:1,b:2"), F.lit(","), F.lit(":"))
    return o.select(
        "o_orderkey",
        F.element_at(doubled, "qty").alias("qty_doubled"),
        F.array_join(F.sort_array(F.map_keys(upper)), ",").alias("upper_keys"),
        F.element_at(zipped, "price").alias("price_self_sum"),
        entries.alias("entries_sorted"),
        F.element_at(sm, "b").alias("from_str_map"),
    ).orderBy("o_orderkey")


@query(
    "array_funcs3",
    oracle="""
    WITH t AS (
      SELECT p_partkey, string_split(p_name, ' ') AS toks
      FROM part WHERE p_partkey <= 300
    )
    SELECT p_partkey,
           array_to_string(list_sort(toks, 'DESC'), '|') AS sorted_desc,
           CAST(coalesce(list_position(toks, 'blue'), 0) AS BIGINT) AS blue_pos,
           array_to_string(list_filter(toks, x -> x <> 'blue'), '|') AS without_blue,
           array_to_string(list_transform(range(1, len(toks) + 1),
               i -> toks[CAST(i AS INTEGER)] || '~'
                    || toks[CAST(len(toks) - i + 1 AS INTEGER)]), '|') AS zip_rev,
           array_to_string(list_transform(range(0, 3),
               i -> toks[1]), '|') AS first_x3,
           array_to_string(list_sort(list_distinct(list_concat(toks, ['blue', 'ring']))),
               '|') AS union_sorted,
           coalesce(array_to_string(list_sort(list_filter(list_distinct(toks),
               x -> NOT list_contains(['blue', 'ring'], x))), '|'), '') AS except_sorted
    FROM t
    ORDER BY p_partkey
    """,
)
def array_funcs3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third array-function batch: descending sort, array_position (0
    when absent on BOTH engines — DuckDB list_position yields NULL,
    coalesced), array_remove, zip_with against the reversed array,
    array_repeat, array_union/except — all serialized with array_join at
    the query boundary (raw arrays break the driver's row canonicalizer).
    """
    p = load_table(spark, "part", sf_dir).filter(F.col("p_partkey") <= 300)
    toks = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.array_join(F.sort_array(toks, asc=False), "|").alias("sorted_desc"),
        F.array_position(toks, "blue").cast("long").alias("blue_pos"),
        F.array_join(F.array_remove(toks, "blue"), "|").alias("without_blue"),
        F.array_join(
            F.zip_with(toks, F.reverse(toks), lambda a, b: F.concat(a, F.lit("~"), b)),
            "|",
        ).alias("zip_rev"),
        F.array_join(F.array_repeat(F.element_at(toks, 1), 3), "|").alias("first_x3"),
        F.array_join(
            F.sort_array(F.array_union(toks, F.array(F.lit("blue"), F.lit("ring")))), "|"
        ).alias("union_sorted"),
        F.array_join(
            F.sort_array(F.array_except(toks, F.array(F.lit("blue"), F.lit("ring")))), "|"
        ).alias("except_sorted"),
    ).orderBy("p_partkey")


@query(
    "json_funcs2",
    oracle="""
    SELECT event_id,
           to_json(struct_pack(event_id := event_id, event_type := event_type))
             AS built_json,
           array_to_string(json_keys(props), ',') AS prop_keys,
           CAST(json_array_length('[1,2,3]') AS INTEGER) AS arr_len,
           CAST(json_extract(props, '$.k') AS BIGINT) AS parsed_k
    FROM events
    WHERE event_id < 500
    ORDER BY event_id
    """,
)
def json_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON construction + introspection batch: to_json over a struct of
    columns (serialization format matches across engines), object key
    listing, array length, and from_json into a typed struct."""
    ev = load_table(spark, "events", sf_dir).filter(F.col("event_id") < 500)
    return ev.select(
        "event_id",
        F.to_json(F.struct("event_id", "event_type")).alias("built_json"),
        F.array_join(F.json_object_keys("props"), ",").alias("prop_keys"),
        F.json_array_length(F.lit("[1,2,3]")).cast("int").alias("arr_len"),
        F.from_json("props", "k BIGINT")["k"].alias("parsed_k"),
    ).orderBy("event_id")


@query(
    "join_asof_nearest",
    oracle="""
    WITH l AS (
      SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase' AND user_id < 40
    ),
    r AS (
      SELECT user_id, ts, cents FROM (
        SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents,
               row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id) AS rn
        FROM events WHERE event_type = 'view'
      ) WHERE rn = 1
    ),
    cand AS (
      SELECT l.event_id, l.user_id, l.ts, r.ts AS view_ts, r.cents AS view_cents,
             abs(epoch_us(l.ts) - epoch_us(r.ts)) AS d,
             CASE WHEN r.ts <= l.ts THEN 0 ELSE 1 END AS pref
      FROM l LEFT JOIN r USING (user_id)
    ),
    best AS (
      SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY d, pref) AS rn
      FROM cand
    )
    SELECT event_id, user_id, ts, view_ts, view_cents
    FROM best WHERE rn = 1
    ORDER BY event_id
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join (pandas merge_asof direction='nearest'
    parity, completing the backward/forward/nearest triple): each
    purchase takes the closest view by ABSOLUTE time distance, ties to
    the earlier row. operators/asof.py:asof_join_nearest keeps it ONE
    shuffle: both sides union into a single per-user (ts, side) sort
    and the backward/forward candidates come from two frame scans
    (last-preceding / first-following) of the SAME sorted partition —
    the naive argmin the oracle runs is a |L|x|R| per-user cross join.
    The right side is deduped to unique (user, ts) first, which is what
    makes the winner well-defined in both engines."""
    from pyspark.sql import Window as W

    from log2sql_spark.operators.asof import asof_join_nearest

    events = load_table(spark, "events", sf_dir)
    cents = F.round(F.col("value") * 100).cast("bigint")
    # Shared key bound: the left filter and the right-side prefilter
    # below MUST agree or the mirror silently drops valid matches.
    user_bound = 40
    left = events.filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") < user_bound)
    ).select("event_id", "user_id", "ts")
    right = (
        # Mirror the left side's key bound (guide §3.2 / §6): views for
        # user_id >= user_bound can never match a left purchase, so the
        # literal predicate pushes to the parquet scan and the dedup
        # window + union shuffle see only those users' views. Whole
        # (user_id, ts) window groups are kept or dropped, so rn is
        # unchanged.
        events.filter((F.col("event_type") == "view") & (F.col("user_id") < user_bound))
        .select("event_id", "user_id", "ts", cents.alias("view_cents"))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("user_id", "ts").orderBy("event_id")
            ),
        )
        .filter("rn = 1")
        .withColumn("view_ts", F.col("ts"))
        .select("user_id", "ts", "view_ts", "view_cents")
    )
    return (
        asof_join_nearest(
            left, right, on="ts", by="user_id",
            right_cols=["view_ts", "view_cents"],
        )
        .select("event_id", "user_id", "ts", "view_ts", "view_cents")
        .orderBy("event_id")
    )


@query(
    "er_customer_survivorship",
    oracle="""
    WITH base AS (
      SELECT CAST(c_custkey AS BIGINT) AS id, lower(c_name) AS name,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
      FROM customer WHERE c_custkey < 2000
    ), dirty AS (
      SELECT id + 100000 AS id,
             name[:len(name)-1] || 'x' AS name,
             bal_cents + 5 AS bal_cents
      FROM base WHERE id % 7 = 0
    ), recs AS (
      SELECT * FROM base UNION ALL SELECT * FROM dirty
    ), pairs AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM recs a JOIN recs b
        ON substr(a.name, 10, 8) = substr(b.name, 10, 8)
       AND a.id < b.id
      WHERE levenshtein(a.name, b.name) <= 2
        AND abs(a.bal_cents - b.bal_cents) <= 10
    ), labeled AS (
      SELECT r.id, coalesce(min(p.id_a), r.id) AS cluster_id
      FROM recs r LEFT JOIN pairs p ON p.id_b = r.id
      GROUP BY r.id
    )
    SELECT l.cluster_id AS entity_id,
           CAST(count(*) AS BIGINT) AS n_records,
           CAST(max(r.bal_cents) AS BIGINT) AS bal_cents,
           min(r.name) AS name
    FROM labeled l JOIN recs r ON r.id = l.id
    GROUP BY l.cluster_id
    HAVING count(*) > 1
    ORDER BY entity_id
    """,
)
def er_customer_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end: a dirty import (typo in the name,
    drifted balance, new surrogate key) lands next to the master
    records; blocking on a 12-char name prefix bounds the candidate
    join, Levenshtein <= 2 confirms matches, records label to the
    cluster minimum (one hop suffices: dirty copies pair with exactly
    one master here), and SURVIVORSHIP picks per entity the max
    balance and lexicographic-min name — the block→match→cluster→merge
    pipeline every MDM/dedupe system runs, with each rule integer- or
    string-exact so the merged golden records hash cross-engine.
    Scale: the only join is within blocks, never |records|² — the
    first blocked formulation used the shared 12-char name prefix and
    degenerated into ONE giant block (5M Levenshtein evals, 17 s at
    sf0.01); block-key choice IS the scale knob of ER."""
    customer = load_table(spark, "customer", sf_dir)
    base = customer.filter(F.col("c_custkey") < 2000).select(
        F.col("c_custkey").cast("long").alias("id"),
        F.lower("c_name").alias("name"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
    )
    dirty = base.filter(F.col("id") % 7 == 0).select(
        (F.col("id") + 100000).alias("id"),
        F.concat(
            F.expr("substring(name, 1, length(name) - 1)"), F.lit("x")
        ).alias("name"),
        (F.col("bal_cents") + 5).alias("bal_cents"),
    )
    recs = base.unionByName(dirty)
    a, b = recs.alias("a"), recs.alias("b")
    pairs = (
        a.join(
            b,
            (F.expr("substring(a.name, 10, 8)") == F.expr("substring(b.name, 10, 8)"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .filter(
            F.expr("levenshtein(a.name, b.name) <= 2")
            & (F.abs(F.col("a.bal_cents") - F.col("b.bal_cents")) <= 10)
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    labeled = (
        recs.join(pairs, recs.id == pairs.id_b, "left")
        .groupBy(recs.id)
        .agg(F.coalesce(F.min("id_a"), F.first("id")).alias("cluster_id"))
    )
    return (
        labeled.join(recs, "id")
        .groupBy(F.col("cluster_id").alias("entity_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_records"),
            F.max("bal_cents").cast("long").alias("bal_cents"),
            F.min("name").alias("name"),
        )
        .filter(F.col("n_records") > 1)
        .orderBy("entity_id")
    )


@query(
    "er_blocking_quality_eval",
    oracle="""
    WITH base AS (
      SELECT CAST(c_custkey AS BIGINT) AS id, lower(c_name) AS name
      FROM customer WHERE c_custkey < 2000
    ), dirty AS (
      SELECT id + 100000 AS id, name[:len(name)-1] || 'x' AS name
      FROM base WHERE id % 7 = 0
    ), recs AS (
      SELECT * FROM base UNION ALL SELECT * FROM dirty
    ), cand AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM recs a JOIN recs b
        ON substr(a.name, 10, 8) = substr(b.name, 10, 8)
       AND a.id < b.id
    ), counts AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM recs) AS n_records,
             (SELECT CAST(count(*) AS BIGINT) FROM dirty) AS n_true,
             (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
             (SELECT CAST(count(*) AS BIGINT) FROM cand
               WHERE id_b = id_a + 100000) AS n_found
    )
    SELECT n_records, n_true, n_candidates,
           CAST(n_found * 10000 // n_true AS BIGINT) AS pair_completeness_bp,
           CAST((n_records * (n_records - 1) // 2 - n_candidates) * 10000
                // (n_records * (n_records - 1) // 2) AS BIGINT)
             AS reduction_ratio_bp
    FROM counts
    """,
)
def er_blocking_quality_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality evaluation for the entity-resolution pipeline —
    the two numbers every blocking scheme is judged by (Christen,
    TKDE 2012), measured exactly on er_customer_survivorship's corpus
    and block key: PAIR COMPLETENESS (what fraction of the planted
    dirty↔master matches share a block — recall lost to blocking can
    never be recovered by matching) and REDUCTION RATIO (what fraction
    of the |n|·(n−1)/2 naive pairs the blocks avoid — the entire point
    of blocking). Both in truncating basis points from exact integer
    counts. This is the ER twin of llm_lsh_recall_eval: candidate
    generation cost/recall as an oracle-checked number, so a block-key
    change that silently drops matches (or degenerates into one giant
    block — the 5M-Levenshtein failure the survivorship docstring
    records) shows up as a hash break, not an anecdote."""
    customer = load_table(spark, "customer", sf_dir)
    base = customer.filter(F.col("c_custkey") < 2000).select(
        F.col("c_custkey").cast("long").alias("id"),
        F.lower("c_name").alias("name"),
    )
    dirty = base.filter(F.col("id") % 7 == 0).select(
        (F.col("id") + 100000).alias("id"),
        F.concat(
            F.expr("substring(name, 1, length(name) - 1)"), F.lit("x")
        ).alias("name"),
    )
    recs = base.unionByName(dirty)
    a, b = recs.alias("a"), recs.alias("b")
    cand = a.join(
        b,
        (F.expr("substring(a.name, 10, 8)") == F.expr("substring(b.name, 10, 8)"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    counts = (
        recs.agg(F.count(F.lit(1)).cast("long").alias("n_records"))
        .crossJoin(dirty.agg(F.count(F.lit(1)).cast("long").alias("n_true")))
        .crossJoin(
            cand.agg(
                F.count(F.lit(1)).cast("long").alias("n_candidates"),
                F.sum(
                    (F.col("id_b") == F.col("id_a") + 100000).cast("int")
                ).cast("long").alias("n_found"),
            )
        )
    )
    return counts.select(
        "n_records",
        "n_true",
        "n_candidates",
        F.expr("CAST(n_found * 10000 DIV n_true AS BIGINT)").alias(
            "pair_completeness_bp"
        ),
        F.expr(
            "CAST((n_records * (n_records - 1) DIV 2 - n_candidates) * 10000"
            " DIV (n_records * (n_records - 1) DIV 2) AS BIGINT)"
        ).alias("reduction_ratio_bp"),
    )


@query(
    "er_fellegi_sunter_weights",
    oracle="""
    WITH base AS (
      SELECT CAST(c_custkey AS BIGINT) AS id, lower(c_name) AS name,
             c_acctbal AS bal, CAST(c_nationkey AS INTEGER) AS nat,
             c_mktsegment AS seg
      FROM customer WHERE c_custkey < 2000
    ), dirty AS (
      SELECT id + 100000 AS id,
             name[:len(name)-1] || 'x' AS name,
             CASE WHEN id % 2 = 0 THEN bal + 1 ELSE bal END AS bal,
             nat,
             CASE WHEN id % 3 = 0 THEN reverse(seg) ELSE seg END AS seg
      FROM base WHERE id % 7 = 0
    ), recs AS (
      SELECT * FROM base UNION ALL SELECT * FROM dirty
    ), cand AS (
      SELECT CAST(b.id = a.id + 100000 AS INT) AS is_true,
             CAST(a.name = b.name AS INT) AS ag_name,
             CAST(a.bal = b.bal AS INT) AS ag_bal,
             CAST(a.nat = b.nat AS INT) AS ag_nat,
             CAST(a.seg = b.seg AS INT) AS ag_seg
      FROM recs a JOIN recs b
        ON substr(a.name, 10, 8) = substr(b.name, 10, 8)
       AND a.id < b.id
    ), tot AS (
      SELECT CAST(sum(is_true) AS BIGINT) AS n_true,
             CAST(sum(1 - is_true) AS BIGINT) AS n_false,
             CAST(sum(is_true * ag_name) AS BIGINT) AS t_name,
             CAST(sum((1 - is_true) * ag_name) AS BIGINT) AS f_name,
             CAST(sum(is_true * ag_bal) AS BIGINT) AS t_bal,
             CAST(sum((1 - is_true) * ag_bal) AS BIGINT) AS f_bal,
             CAST(sum(is_true * ag_nat) AS BIGINT) AS t_nat,
             CAST(sum((1 - is_true) * ag_nat) AS BIGINT) AS f_nat,
             CAST(sum(is_true * ag_seg) AS BIGINT) AS t_seg,
             CAST(sum((1 - is_true) * ag_seg) AS BIGINT) AS f_seg
      FROM cand
    )
    SELECT u.field, tot.n_true, tot.n_false,
           u.agree_true, u.agree_false,
           CAST(u.agree_true * 10000 // tot.n_true AS BIGINT) AS m_bp,
           CAST(u.agree_false * 10000 // tot.n_false AS BIGINT) AS u_bp
    FROM tot, (
      SELECT 'acctbal' AS field, t_bal AS agree_true, f_bal AS agree_false FROM tot
      UNION ALL SELECT 'name_exact', t_name, f_name FROM tot
      UNION ALL SELECT 'nation', t_nat, f_nat FROM tot
      UNION ALL SELECT 'segment', t_seg, f_seg FROM tot
    ) u
    ORDER BY field
    """,
)
def er_fellegi_sunter_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter (JASA 1969) parameter estimation — the
    probabilistic-record-linkage step between er_blocking_quality_eval
    (candidate generation) and er_customer_survivorship (merge): the
    per-field m-probability (agreement rate among TRUE matched pairs)
    and u-probability (among false candidate pairs), in truncating
    basis points from exact integer counts. log2(m/u) per field is the
    classic match weight; the logs stay OUT of the query (cross-engine
    libm drift) — consumers derive them from the exact m_bp/u_bp.

    The corpus is er_blocking's: customers + planted dirty twins
    behind the substr(10,8) block key, with a deterministic per-field
    perturbation model (name always perturbed -> m=0 shows a
    fully-broken field; acctbal perturbed for even ids -> m~5000;
    nation copied -> m=10000 with a data-dependent u from the real
    25-nation distribution; segment perturbed for id%3=0). The u side
    is measured from real non-match field collisions, not synthesized.

    Plan: the blocked self-join (bounded by block sizes — the point of
    blocking), one aggregate folding all per-field agreement counts in
    a single pass (no per-field re-scan), a 4-row stack. At 100 TB the
    cost is the candidate join er_blocking_quality_eval already
    bounds; everything downstream is one map-side-combined aggregate.

    Reference analog: none (LLM-pipeline extension, SURVEY.md §2.2).
    """
    customer = load_table(spark, "customer", sf_dir)
    base = customer.filter(F.col("c_custkey") < 2000).select(
        F.col("c_custkey").cast("long").alias("id"),
        F.lower("c_name").alias("name"),
        F.col("c_acctbal").alias("bal"),
        F.col("c_nationkey").cast("int").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
    )
    dirty = base.filter(F.col("id") % 7 == 0).select(
        (F.col("id") + 100000).alias("id"),
        F.concat(
            F.expr("substring(name, 1, length(name) - 1)"), F.lit("x")
        ).alias("name"),
        F.when(F.col("id") % 2 == 0, F.col("bal") + 1).otherwise(F.col("bal")).alias("bal"),
        F.col("nat"),
        F.when(F.col("id") % 3 == 0, F.reverse(F.col("seg"))).otherwise(F.col("seg")).alias("seg"),
    )
    recs = base.unionByName(dirty)
    a, b = recs.alias("a"), recs.alias("b")
    cand = a.join(
        b,
        (F.expr("substring(a.name, 10, 8)") == F.expr("substring(b.name, 10, 8)"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(
        (F.col("b.id") == F.col("a.id") + 100000).cast("int").alias("is_true"),
        (F.col("a.name") == F.col("b.name")).cast("int").alias("ag_name"),
        (F.col("a.bal") == F.col("b.bal")).cast("int").alias("ag_bal"),
        (F.col("a.nat") == F.col("b.nat")).cast("int").alias("ag_nat"),
        (F.col("a.seg") == F.col("b.seg")).cast("int").alias("ag_seg"),
    )
    one = F.lit(1)
    tot = cand.agg(
        F.sum("is_true").cast("long").alias("n_true"),
        F.sum(one - F.col("is_true")).cast("long").alias("n_false"),
        *[
            x
            for f in ("name", "bal", "nat", "seg")
            for x in (
                F.sum(F.col("is_true") * F.col(f"ag_{f}")).cast("long").alias(f"t_{f}"),
                F.sum((one - F.col("is_true")) * F.col(f"ag_{f}")).cast("long").alias(f"f_{f}"),
            )
        ],
    )
    return tot.select(
        F.expr(
            "stack(4, 'acctbal', t_bal, f_bal, 'name_exact', t_name, f_name,"
            " 'nation', t_nat, f_nat, 'segment', t_seg, f_seg)"
        ).alias("field", "agree_true", "agree_false"),
        "n_true",
        "n_false",
    ).select(
        "field",
        "n_true",
        "n_false",
        "agree_true",
        "agree_false",
        F.expr("CAST(agree_true * 10000 DIV n_true AS BIGINT)").alias("m_bp"),
        F.expr("CAST(agree_false * 10000 DIV n_false AS BIGINT)").alias("u_bp"),
    ).orderBy("field")


@query(
    "er_fellegi_sunter_classify",
    oracle="""
    WITH base AS (
      SELECT CAST(c_custkey AS BIGINT) AS id, lower(c_name) AS name,
             c_acctbal AS bal, CAST(c_nationkey AS INTEGER) AS nat,
             c_mktsegment AS seg
      FROM customer WHERE c_custkey < 2000
    ), dirty AS (
      SELECT id + 100000 AS id,
             name[:len(name)-1] || 'x' AS name,
             CASE WHEN id % 2 = 0 THEN bal + 1 ELSE bal END AS bal,
             nat,
             CASE WHEN id % 3 = 0 THEN reverse(seg) ELSE seg END AS seg
      FROM base WHERE id % 7 = 0
    ), recs AS (
      SELECT * FROM base UNION ALL SELECT * FROM dirty
    ), scored AS (
      SELECT CAST(b.id = a.id + 100000 AS INT) AS is_true,
             CAST(CASE WHEN a.name = b.name THEN 3000 ELSE -500 END
                + CASE WHEN a.bal = b.bal THEN 2500 ELSE -800 END
                + CASE WHEN a.nat = b.nat THEN 1200 ELSE -3000 END
                + CASE WHEN a.seg = b.seg THEN 800 ELSE -1500 END AS BIGINT)
               AS score
      FROM recs a JOIN recs b
        ON substr(a.name, 10, 8) = substr(b.name, 10, 8)
       AND a.id < b.id
    ), verdicts AS (
      SELECT is_true,
             CASE WHEN score >= 4000 THEN 'match'
                  WHEN score >= 0 THEN 'possible'
                  ELSE 'non_match' END AS verdict,
             score
      FROM scored
    )
    SELECT verdict, is_true,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(min(score) AS BIGINT) AS min_score,
           CAST(max(score) AS BIGINT) AS max_score
    FROM verdicts
    GROUP BY verdict, is_true
    ORDER BY verdict, is_true
    """,
)
def er_fellegi_sunter_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Fellegi–Sunter DECISION rule over the same blocked corpus as
    er_fellegi_sunter_weights: each candidate pair's agreement vector
    folds into an integer match score (fixed milli-weights per field —
    model parameters, the production values come from the weights
    query's m/u estimates), two thresholds carve match / possible
    (clerical review) / non-match, and the output is the confusion
    matrix against the planted truth with per-cell score ranges. The
    deliberately imperfect weights leave true pairs in the possible
    and non-match cells — FS's three-way decision zone, hash-checked
    rather than idealized.

    Plan: one blocked self-join (bounded by block sizes) + one
    map-side-combined aggregate over (verdict, is_true) — nothing
    downstream of the join exceeds six rows.

    Reference analog: none (LLM-pipeline extension, SURVEY.md §2.2).
    """
    customer = load_table(spark, "customer", sf_dir)
    base = customer.filter(F.col("c_custkey") < 2000).select(
        F.col("c_custkey").cast("long").alias("id"),
        F.lower("c_name").alias("name"),
        F.col("c_acctbal").alias("bal"),
        F.col("c_nationkey").cast("int").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
    )
    dirty = base.filter(F.col("id") % 7 == 0).select(
        (F.col("id") + 100000).alias("id"),
        F.concat(
            F.expr("substring(name, 1, length(name) - 1)"), F.lit("x")
        ).alias("name"),
        F.when(F.col("id") % 2 == 0, F.col("bal") + 1).otherwise(F.col("bal")).alias("bal"),
        F.col("nat"),
        F.when(F.col("id") % 3 == 0, F.reverse(F.col("seg"))).otherwise(F.col("seg")).alias("seg"),
    )
    recs = base.unionByName(dirty)
    a, b = recs.alias("a"), recs.alias("b")

    def w(cond: Column, agree: int, disagree: int) -> Column:
        return F.when(cond, F.lit(agree)).otherwise(F.lit(disagree))

    scored = a.join(
        b,
        (F.expr("substring(a.name, 10, 8)") == F.expr("substring(b.name, 10, 8)"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(
        (F.col("b.id") == F.col("a.id") + 100000).cast("int").alias("is_true"),
        (
            w(F.col("a.name") == F.col("b.name"), 3000, -500)
            + w(F.col("a.bal") == F.col("b.bal"), 2500, -800)
            + w(F.col("a.nat") == F.col("b.nat"), 1200, -3000)
            + w(F.col("a.seg") == F.col("b.seg"), 800, -1500)
        ).cast("long").alias("score"),
    )
    verdicts = scored.select(
        "is_true",
        "score",
        F.when(F.col("score") >= 4000, F.lit("match"))
        .when(F.col("score") >= 0, F.lit("possible"))
        .otherwise(F.lit("non_match"))
        .alias("verdict"),
    )
    return (
        verdicts.groupBy("verdict", "is_true")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.min("score").cast("long").alias("min_score"),
            F.max("score").cast("long").alias("max_score"),
        )
        .orderBy("verdict", "is_true")
    )


@query(
    "udtf_table_argument_sessions",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s
      FROM events WHERE user_id < 200
    ), marked AS (
      SELECT user_id, s,
             CASE WHEN lag(s) OVER w IS NULL OR s - lag(s) OVER w > 43200
                  THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY s)
    ), islands AS (
      SELECT user_id, s,
             CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY s
                                 ROWS UNBOUNDED PRECEDING) AS INTEGER)
               AS session_idx
      FROM marked
    )
    SELECT user_id, session_idx,
           CAST(count(*) AS INTEGER) AS n_events,
           CAST(min(s) AS BIGINT) AS start_s,
           CAST(max(s) AS BIGINT) AS end_s
    FROM islands
    GROUP BY user_id, session_idx
    ORDER BY user_id, session_idx
    """,
)
def udtf_table_argument_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 UDTF with a TABLE argument: the function consumes WHOLE
    PARTITIONS (``TABLE(v) PARTITION BY user_id ORDER BY s``) instead
    of scalar rows — the missing member of the UDTF family next to the
    LATERAL row-expander (udtf_word_positions) and the polymorphic
    analyze-time schema (udtf_dynamic_schema). The engine guarantees
    per-partition ordered delivery, so the class is a plain sequential
    state machine (12 h gap sessionizer) with no window functions in
    Python — the same per-user stream shape as
    applyInPandasWithState, but batch and in pure SQL syntax. Scale:
    partitions are per-user and shuffle once on user_id; state is one
    (idx, count, start, last) tuple per instance. Epochs are FLOORED on
    both engines (the LTTB lesson: DuckDB epoch() keeps the fractional
    second, Spark unix_timestamp truncates). The oracle recomputes the
    sessions as classic gaps-and-islands SQL."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="user_id bigint, session_idx int, n_events int, "
        "start_s bigint, end_s bigint",
        useArrow=True,
    )
    class Sessionize:
        def __init__(self):
            self.user = None
            self.idx = 0
            self.n = 0
            self.start = None
            self.last = None

        def eval(self, row):
            u, s = row.user_id, row.s
            if self.user is None:
                self.user, self.idx = u, 1
                self.n, self.start, self.last = 1, s, s
                return
            if s - self.last > 43200:
                yield self.user, self.idx, self.n, self.start, self.last
                self.idx += 1
                self.n, self.start = 1, s
            else:
                self.n += 1
            self.last = s

        def terminate(self):
            if self.user is not None:
                yield self.user, self.idx, self.n, self.start, self.last

    spark.udtf.register("log2sql_sessionize", Sessionize)
    (
        load_table(spark, "events", sf_dir)
        .filter(F.col("user_id") < 200)
        .select("user_id", F.unix_timestamp("ts").alias("s"))
        .createOrReplaceTempView("udtf_sess_v")
    )
    return spark.sql(
        """
        SELECT * FROM log2sql_sessionize(
          TABLE(udtf_sess_v) PARTITION BY user_id ORDER BY s
        )
        ORDER BY user_id, session_idx
        """
    )
