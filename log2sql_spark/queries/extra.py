"""Second-wave operator coverage: as-of join, map functions, exact
percentiles, collect_list, grouped-agg pandas UDAF, explode/lateral,
csv/json source round-trips, partitioned parquet sink."""

from __future__ import annotations

import os
from log2sql_spark.scratch import scratch_dir

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log2sql_spark.operators.asof import asof_join
from log2sql_spark.registry import query
from log2sql_spark.sources.tables import load_table


@query(
    "join_asof",
    oracle="""
    WITH right_dedup AS (
      SELECT user_id, ts, o_orderkey, o_totalprice FROM (
        SELECT o_custkey AS user_id, o_orderdate AS ts, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                  ORDER BY o_orderkey DESC) AS rn
        FROM orders
      ) WHERE rn = 1
    ), ev AS (
      SELECT event_id, ts, user_id, value FROM events WHERE event_id < 2000
    )
    SELECT e.event_id, e.ts, e.user_id, e.value,
           r.o_orderkey, r.o_totalprice
    FROM ev e ASOF LEFT JOIN right_dedup r
      ON e.user_id = r.user_id AND r.ts <= e.ts
    ORDER BY e.event_id
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via union+window (one shuffle on the key): each event
    picks the user's latest order at-or-before the event time. The right
    side is deduped to one row per (key, ts) first — both engines then
    have a deterministic match. DuckDB oracle uses its native ASOF JOIN.
    """
    events = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("event_id") < 2000)
        .select("event_id", "ts", "user_id", "value")
    )
    from pyspark.sql import Window as W

    # Semi-join prefilter (guide §3.2): the left side is bounded (<2000
    # events) while the right side is EVERY order — orders for users
    # absent from the left can never surface in the output (their
    # carried rows die at the _side=1 filter), so dropping them BELOW
    # the dedup window shrinks both the window shuffle and the union
    # shuffle by the users-not-in-events fraction. Whole (user_id, ts)
    # window groups are kept or dropped, so rn is unchanged. Only valid
    # because the left key set is small enough to broadcast — which the
    # query's own event_id bound guarantees at any scale. No .distinct():
    # left_semi tolerates duplicate build rows (<=2000 here), and the
    # dedup aggregate would cost its own exchange.
    event_users = events.select("user_id")
    orders = (
        load_table(spark, "orders", sf_dir)
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("ts"),
            "o_orderkey",
            "o_totalprice",
        )
        .join(F.broadcast(event_users), "user_id", "left_semi")
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("user_id", "ts").orderBy(F.desc("o_orderkey"))
            ),
        )
        .filter("rn = 1")
        .drop("rn")
    )
    return asof_join(
        events, orders, on="ts", by="user_id", right_cols=["o_orderkey", "o_totalprice"]
    ).orderBy("event_id")


@query(
    "map_funcs",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS status_val,
           2 AS n_entries,
           'priority,status' AS keys_sorted,
           o_orderpriority AS via_concat,
           (o_orderstatus = 'F') AS has_f_status
    FROM orders
    WHERE o_orderkey <= 500
    ORDER BY o_orderkey
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map functions (create_map/element_at/map_keys/map_concat/
    map_contains_key — the engine's CDC images are maps, reference
    analogue log2sql.py:25-58). The oracle states the expected values
    directly since DuckDB's map surface differs."""
    m = F.create_map(F.lit("status"), F.col("o_orderstatus"))
    m2 = F.map_concat(m, F.create_map(F.lit("priority"), F.col("o_orderpriority")))
    return (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderkey") <= 500)
        .select(
            "o_orderkey",
            F.element_at(m2, "status").alias("status_val"),
            F.size(m2).alias("n_entries"),
            F.array_join(F.sort_array(F.map_keys(m2)), ",").alias("keys_sorted"),
            F.element_at(F.map_values(F.map_filter(m2, lambda k, _: k == "priority")), 1).alias(
                "via_concat"
            ),
            F.map_contains_key(F.map_from_entries(F.array(F.struct(F.col("o_orderstatus"), F.lit(1)))), "F").alias(
                "has_f_status"
            ),
        )
        .orderBy("o_orderkey")
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS median_price,
           quantile_cont(l_extendedprice, 0.9) AS p90_price,
           -- deterministic tie-break mirroring the Spark side:
           -- max(l_orderkey) among max-price rows, not tie-arbitrary max_by
           max(CASE WHEN l_extendedprice = mx THEN l_orderkey END) AS top_order,
           min(l_extendedprice) AS min_price
    FROM (SELECT l_returnflag, l_extendedprice, l_orderkey,
                 max(l_extendedprice) OVER (PARTITION BY l_returnflag) AS mx
          FROM lineitem)
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles via integer rank arithmetic — NOT
    Spark's ``Percentile`` aggregate, whose per-group value→count map
    buffers unboundedly on the final reducers (with only 3 return-flag
    groups, those 3 reducers become the job at 100× scale).

    Same aggregate-then-sort discipline as agg_weighted_median /
    quality_histogram_equidepth: the raw table feeds ONE
    map-side-combined (flag, price) count aggregate; the cumulative
    window orders |distinct prices| per flag, never raw rows; a final
    hash aggregate picks the bracketing order statistics by exact
    integer rank (h = q·(n−1), lo = ⌊h⌋, hi = ⌈h⌉ — computed as
    integer DIV/mod so the pick is deterministic) and interpolates
    v_lo + frac·(v_hi − v_lo), the same linear-interpolation
    convention as SQL quantile_cont / Spark percentile. max_by is
    recovered for free: the max-price row is the one where cum == n.
    """
    from pyspark.sql import Window as W

    li = load_table(spark, "lineitem", sf_dir)
    vals = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("v"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.max("l_orderkey").alias("max_ok"),
    )
    wc = W.partitionBy("flag").orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    cum = vals.select(
        "flag",
        "v",
        "max_ok",
        F.sum("cnt").over(wc).alias("c"),
        F.sum("cnt").over(W.partitionBy("flag")).alias("n"),
    )
    # 0-indexed bracketing ranks; value at rank r = min(v where c > r).
    lo50 = F.expr("(n - 1) DIV 2")
    hi50 = F.expr("n DIV 2")
    lo90 = F.expr("(9 * (n - 1)) DIV 10")
    hi90 = F.expr("(9 * (n - 1) + 9) DIV 10")
    picked = cum.groupBy("flag").agg(
        F.min(F.when(F.col("c") > lo50, F.col("v"))).alias("v_lo50"),
        F.min(F.when(F.col("c") > hi50, F.col("v"))).alias("v_hi50"),
        F.min(F.when(F.col("c") > lo90, F.col("v"))).alias("v_lo90"),
        F.min(F.when(F.col("c") > hi90, F.col("v"))).alias("v_hi90"),
        F.max(F.when(F.col("c") == F.col("n"), F.col("max_ok"))).alias("top_order"),
        F.min("v").alias("min_price"),
        F.max("n").alias("n"),
    )
    frac50 = F.expr("((n - 1) % 2) / 2.0")
    frac90 = F.expr("((9 * (n - 1)) % 10) / 10.0")
    return picked.select(
        F.col("flag").alias("l_returnflag"),
        (F.col("v_lo50") + frac50 * (F.col("v_hi50") - F.col("v_lo50"))).alias(
            "median_price"
        ),
        (F.col("v_lo90") + frac90 * (F.col("v_hi90") - F.col("v_lo90"))).alias(
            "p90_price"
        ),
        "top_order",
        "min_price",
    ).orderBy("l_returnflag")


@query(
    "agg_collect_list",
    oracle="""
    SELECT n_nationkey,
           array_to_string(list_sort(list(c_custkey::VARCHAR)), ',') AS custkeys,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_custkey <= 200
    GROUP BY n_nationkey
    ORDER BY n_nationkey
    """,
)
def agg_collect_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list → sorted CSV string (stringified so the compare is
    representation-stable across engines)."""
    cust = load_table(spark, "customer", sf_dir).filter(F.col("c_custkey") <= 200)
    nation = load_table(spark, "nation", sf_dir)
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_nationkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list(F.col("c_custkey").cast("string"))), ",").alias(
                "custkeys"
            ),
            F.count("*").alias("n_customers"),
        )
        .orderBy("n_nationkey")
    )


@query(
    "udaf_weighted_mean",
    oracle="""
    SELECT l_returnflag,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(l_quantity AS BIGINT))
             / 100.0 / sum(CAST(l_quantity AS BIGINT)) AS weighted_avg_price,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def udaf_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDAF (Arrow-vectorized): quantity-weighted
    mean price, computed in exact integer cents inside the UDF so the
    result is bit-identical to the SQL oracle."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def weighted_avg(cents: pd.Series, qty: pd.Series) -> float:
        q = qty.astype("int64")
        return float((cents.astype("int64") * q).sum() / 100.0 / q.sum())

    @pandas_udf("long")
    def n_rows(cents: pd.Series) -> int:
        # Spark disallows mixing pandas UDAFs with builtin aggregates in
        # one agg, so the row count is a pandas UDAF too.
        return len(cents)

    li = load_table(spark, "lineitem", sf_dir).withColumn(
        "cents", F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            weighted_avg(F.col("cents"), F.col("l_quantity")).alias("weighted_avg_price"),
            n_rows(F.col("cents")).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "explode_lateral",
    oracle="""
    SELECT p_brand, tok AS token, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT p_brand, unnest(string_split(p_name, ' ')) AS tok
      FROM part WHERE p_partkey <= 400
    )
    GROUP BY p_brand, tok
    ORDER BY p_brand, tok
    """,
)
def explode_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode (lateral view): token frequencies per brand."""
    return (
        load_table(spark, "part", sf_dir)
        .filter(F.col("p_partkey") <= 400)
        .select("p_brand", F.explode(F.split("p_name", " ")).alias("token"))
        .groupBy("p_brand", "token")
        .agg(F.count("*").alias("n"))
        .orderBy("p_brand", "token")
    )


@query(
    "source_csv_json_roundtrip",
    oracle="""
    SELECT fmt, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses
    FROM (
      SELECT 'csv' AS fmt, * FROM orders WHERE o_orderkey <= 3000
      UNION ALL
      SELECT 'json' AS fmt, * FROM orders WHERE o_orderkey <= 3000
    )
    GROUP BY fmt
    ORDER BY fmt
    """,
)
def source_csv_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV and JSON sources: write an orders subset in both formats,
    read each back with an explicit schema (no inference scan), verify
    values survive against the parquet-derived oracle. Doubles round-trip
    exactly: Spark writes shortest-repr decimal."""
    sub = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderkey") <= 3000)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )
    d = scratch_dir("log2sql_src_")
    csv_p, json_p = os.path.join(d, "csv"), os.path.join(d, "json")
    sub.write.mode("overwrite").option("header", True).csv(csv_p)
    sub.write.mode("overwrite").json(json_p)
    schema = "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double"
    csv_df = spark.read.schema(schema).option("header", True).csv(csv_p).withColumn(
        "fmt", F.lit("csv")
    )
    json_df = spark.read.schema(schema).json(json_p).withColumn("fmt", F.lit("json"))
    return (
        csv_df.unionByName(json_df)
        .groupBy("fmt")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("total_cents"),
            F.countDistinct("o_orderstatus").alias("n_statuses"),
        )
        .orderBy("fmt")
    )


@query(
    "source_orc_roundtrip",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
           CAST(min(o_orderkey) AS BIGINT) AS min_key,
           CAST(max(o_orderkey) AS BIGINT) AS max_key
    FROM orders
    WHERE o_orderkey <= 3000
    """,
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink: write an orders subset as ORC, read it back,
    verify against the parquet-derived oracle (DuckDB can't read ORC, so
    the oracle recomputes from the original table — the round trip must
    be lossless for the hash to match)."""
    sub = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderkey") <= 3000)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    d = os.path.join(scratch_dir("log2sql_orc_"), "orders_orc")
    sub.write.mode("overwrite").orc(d)
    back = spark.read.orc(d)
    return back.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("total_cents"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


@query(
    "sink_partitioned_parquet",
    oracle="""
    SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM lineitem
    WHERE l_orderkey <= 2000
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def sink_partitioned_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet sink + partition-pruned read-back: writes
    hive-style l_returnflag=X/l_linestatus=Y directories (at scale, the
    layout that makes per-partition reads/pruning free), then aggregates
    the read-back — verified against the original table."""
    sub = load_table(spark, "lineitem", sf_dir).filter(F.col("l_orderkey") <= 2000)
    d = scratch_dir("log2sql_sink_")
    sub.write.mode("overwrite").partitionBy("l_returnflag", "l_linestatus").parquet(d)
    back = spark.read.parquet(d)
    return (
        back.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias("cents"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "events_attribution_last_touch",
    oracle="""
    WITH p AS (
      SELECT event_id, ts, user_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT user_id, ts,
             max(json_extract_string(props, '$.k')::BIGINT) AS campaign
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ), att AS (
      SELECT p.event_id, p.cents, arg_max(c.campaign, c.ts) AS campaign
      FROM p LEFT JOIN c
        ON c.user_id = p.user_id AND c.ts <= p.ts
       AND c.ts >= p.ts - INTERVAL 7 DAY
      GROUP BY p.event_id, p.cents
    )
    SELECT coalesce(campaign, -1) AS campaign,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(cents) AS BIGINT) AS attributed_cents
    FROM att GROUP BY 1 ORDER BY campaign
    """,
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every purchase credits the
    user's most recent click within a 7-day lookback (no click in the
    window → campaign -1, the organic bucket), then revenue rolls up
    per campaign. The attribution step IS the as-of-with-tolerance
    join (operators/asof.py — one shuffle on user_id, union+window, no
    range cross-join); clicks are deduped to one row per (user, ts)
    so the credited row is deterministic in both engines. Money stays
    integer cents end-to-end."""
    events = load_table(spark, "events", sf_dir)
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "ts",
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            "ts",
            F.get_json_object("props", "$.k").cast("long").alias("campaign"),
        )
        .groupBy("user_id", "ts")
        .agg(F.max("campaign").alias("campaign"))
    )
    att = asof_join(
        purchases,
        clicks,
        on="ts",
        by="user_id",
        right_cols=["campaign"],
        tolerance_seconds=7 * 86400,
    )
    return (
        att.groupBy(F.coalesce(F.col("campaign"), F.lit(-1)).alias("campaign"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum("cents").cast("long").alias("attributed_cents"),
        )
        .orderBy("campaign")
    )


@query(
    "events_attribution_linear",
    oracle="""
    WITH p AS (
      SELECT event_id, ts, user_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT user_id, ts,
             max(json_extract_string(props, '$.k')::BIGINT) AS campaign
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ), touch AS (
      SELECT p.event_id, p.cents, c.campaign,
             count(*) OVER (PARTITION BY p.event_id) AS k
      FROM p JOIN c
        ON c.user_id = p.user_id AND c.ts <= p.ts
       AND c.ts >= p.ts - INTERVAL 7 DAY
    )
    SELECT campaign,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(sum(1000000 // k) AS BIGINT) AS credit_ppm,
           CAST(sum(cents // k) AS BIGINT) AS credited_cents
    FROM touch GROUP BY campaign ORDER BY campaign
    """,
)
def events_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch LINEAR attribution — the companion to last-touch:
    every click in the 7-day lookback shares a purchase's credit
    equally (1/k, truncating integer ppm and cents so the split hashes
    cross-engine; the dropped remainder is the standard fixed-point
    trade). The lookback is a plain equi-join on user_id with a time
    band — per-user event lists are bounded, so no range-join blowup —
    plus one per-purchase count window. Purchases with no touch have
    no row here by definition (the organic bucket lives in the
    last-touch query)."""
    events = load_table(spark, "events", sf_dir)
    p = events.filter(F.col("event_type") == "purchase").select(
        "event_id",
        F.col("ts").alias("pts"),
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("ts").alias("cts"),
            F.get_json_object("props", "$.k").cast("long").alias("campaign"),
        )
        .groupBy("user_id", "cts")
        .agg(F.max("campaign").alias("campaign"))
    )
    from pyspark.sql import Window as W

    touch = (
        p.join(c, "user_id")
        .filter(
            (F.col("cts") <= F.col("pts"))
            & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 7 DAYS"))
        )
        .withColumn("k", F.count(F.lit(1)).over(W.partitionBy("event_id")))
    )
    return (
        touch.groupBy("campaign")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.sum(F.expr("1000000 DIV k")).cast("long").alias("credit_ppm"),
            F.sum(F.expr("cents DIV k")).cast("long").alias("credited_cents"),
        )
        .orderBy("campaign")
    )


@query(
    "events_longest_streak",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ), isl AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                        AS INTEGER) AS island
      FROM active
    ), streaks AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS len,
             min(day) AS streak_start
      FROM isl GROUP BY user_id, island
    ), best AS (
      SELECT user_id, len, streak_start,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY len DESC, streak_start) AS rn
      FROM streaks
    )
    SELECT user_id, len AS longest_streak_days,
           CAST(streak_start AS TIMESTAMP) AS streak_start
    FROM best WHERE rn = 1 AND len >= 3
    ORDER BY longest_streak_days DESC, user_id
    LIMIT 100
    """,
)
def events_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's longest run of CONSECUTIVE active
    days (the engagement-streak metric), via the classic day−row_number
    island key — consecutive days share a constant difference, so one
    window + one aggregate finds every streak without self-joins or
    recursion. Both windows partition by user, so the whole query is
    one shuffle on user_id; top-100 is TakeOrdered with a full
    tie-break (len desc, start, user)."""
    from pyspark.sql import Window as W

    events = load_table(spark, "events", sf_dir)
    active = events.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    isl = active.withColumn(
        "island",
        F.date_sub(
            "day",
            F.row_number().over(W.partitionBy("user_id").orderBy("day")),
        ),
    )
    streaks = isl.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).cast("long").alias("len"),
        F.min("day").alias("streak_start"),
    )
    best = streaks.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("user_id").orderBy(
                F.desc("len"), F.asc("streak_start")
            )
        ),
    )
    return (
        best.filter((F.col("rn") == 1) & (F.col("len") >= 3))
        .select(
            "user_id",
            F.col("len").alias("longest_streak_days"),
            F.col("streak_start").cast("timestamp").alias("streak_start"),
        )
        .orderBy(F.desc("longest_streak_days"), "user_id")
        .limit(100)
    )


@query(
    "ts_dow_chisquare",
    oracle="""
    WITH dow AS (
      SELECT CAST(dayofweek(ts) AS BIGINT) AS dw,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1
    ), tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM dow)
    SELECT dw, o,
           (SELECT n FROM tot) // 7 AS expected,
           (o - (SELECT n FROM tot) // 7)
             * (o - (SELECT n FROM tot) // 7) * 1000
             // ((SELECT n FROM tot) // 7) AS chi2_term_milli
    FROM dow ORDER BY dw
    """,
)
def ts_dow_chisquare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality screen: per-weekday event counts vs the
    uniform expectation with each chi-square term in truncating integer
    milli-units — the goodness-of-fit companion to the Benford screen
    (quality_benford_first_digit). One 7-row aggregate; the scaled
    integer terms hash cross-engine (sum them and compare to the
    chi-square critical value off-line). DuckDB dayofweek is 0=Sunday
    ..6; Spark's dayofweek is 1..7 — shifted to match."""
    events = load_table(spark, "events", sf_dir)
    dow = events.groupBy(
        (F.dayofweek("ts") - 1).cast("long").alias("dw")
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    tot = dow.agg(F.sum("o").cast("long").alias("n"))
    return (
        dow.crossJoin(F.broadcast(tot))
        .select(
            "dw",
            "o",
            F.expr("n DIV 7").alias("expected"),
            F.expr("(o - n DIV 7) * (o - n DIV 7) * 1000 DIV (n DIV 7)").alias(
                "chi2_term_milli"
            ),
        )
        .orderBy("dw")
    )


@query(
    "events_bot_burstiness",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), gaps AS (
      SELECT user_id,
             CAST(date_diff('second', prev_ts, ts) AS BIGINT) AS gap_s
      FROM ordered WHERE prev_ts IS NOT NULL
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_gaps,
           round(median(gap_s), 1) AS median_gap_s,
           CAST(sum(CASE WHEN gap_s < 14400 THEN 1 ELSE 0 END) * 10000
                // count(*) AS BIGINT) AS burst_bp
    FROM gaps
    GROUP BY user_id
    HAVING count(*) >= 20
       AND sum(CASE WHEN gap_s < 14400 THEN 1 ELSE 0 END) * 10000
           // count(*) >= 3000
    ORDER BY burst_bp DESC, user_id
    LIMIT 50
    """,
)
def events_bot_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral bot screen: users whose inter-event gaps are
    implausibly bursty — fraction of short gaps (under 4 h, ~5x
    faster than this corpus's median cadence) in basis points
    plus the median gap — the rate-anomaly heuristic fraud/abuse
    pipelines run before any model. One lag window and one aggregate,
    both partitioned by user_id (a single shuffle); the burst fraction
    is truncating integer arithmetic and the top-50 carries a
    (burst_bp desc, user) total order. Both engines define median of
    an even set as the midpoint, so the .5 medians hash after a 1 dp
    round."""
    from pyspark.sql import Window as W

    events = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        events.withColumn("prev_ts", F.lag("ts").over(w))
        .filter(F.col("prev_ts").isNotNull())
        .select(
            "user_id",
            (
                F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")
            ).cast("long").alias("gap_s"),
        )
    )
    agg = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.round(F.median("gap_s"), 1).alias("median_gap_s"),
        F.expr(
            "CAST(sum(CASE WHEN gap_s < 14400 THEN 1 ELSE 0 END) * 10000"
            " DIV count(*) AS BIGINT)"
        ).alias("burst_bp"),
    )
    return (
        agg.filter((F.col("n_gaps") >= 20) & (F.col("burst_bp") >= 3000))
        .orderBy(F.desc("burst_bp"), "user_id")
        .limit(50)
    )


@query(
    "sink_dynamic_partition_overwrite",
    oracle="""
    WITH full_load AS (
      SELECT o_orderkey AS k, o_orderpriority AS pri,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey <= 4000
    ), backfill AS (
      -- the corrected re-load of ONE partition (1-URGENT): +1 cent
      SELECT k, pri, cents + 1 AS cents FROM full_load WHERE pri = '1-URGENT'
    ), final AS (
      SELECT * FROM full_load WHERE pri <> '1-URGENT'
      UNION ALL SELECT * FROM backfill
    )
    SELECT pri, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM final GROUP BY pri ORDER BY pri
    """,
)
def sink_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite (``partitionOverwriteMode=dynamic``)
    — the production backfill pattern sink_partitioned_parquet stops
    short of: a full hive-partitioned load, then a CORRECTION batch
    containing only one partition's rows overwrites exactly the
    partitions it carries — every other partition's files are
    untouched (in static mode the same write would TRUNCATE the whole
    table first; at 100 TB that is the difference between re-loading a
    day and re-loading history). The read-back aggregates per
    partition; the oracle recomputes the expected final state — the
    corrected partition shows the +1-cent batch, the rest the original
    load."""
    out = scratch_dir("log2sql_dynsink_")
    base = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderkey") <= 4000)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderpriority").alias("pri"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    base.write.mode("overwrite").partitionBy("pri").parquet(out)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            base.filter(F.col("pri") == "1-URGENT")
            .withColumn("cents", F.col("cents") + 1)
            .write.mode("overwrite")
            .partitionBy("pri")
            .parquet(out)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    back = spark.read.parquet(out)
    return (
        back.groupBy("pri")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cents").alias("sum_cents"),
        )
        .orderBy("pri")
    )


_DPP_CACHE: dict[tuple, str] = {}


@query(
    "join_dynamic_partition_pruning",
    oracle="""
    WITH pri_rank AS (
      SELECT '1-URGENT' AS pri, 1 AS sla_hours
      UNION ALL SELECT '2-HIGH', 4
      UNION ALL SELECT '3-MEDIUM', 24
      UNION ALL SELECT '4-NOT SPECIFIED', 72
      UNION ALL SELECT '5-LOW', 168
    )
    SELECT o.pri, r.sla_hours,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM (
      SELECT o_orderpriority AS pri,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ) o
    JOIN pri_rank r ON r.pri = o.pri
    WHERE r.sla_hours <= 4
    GROUP BY o.pri, r.sla_hours
    ORDER BY o.pri
    """,
)
def join_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning — the Catalyst runtime optimization
    the static demos can't show: the fact table lives hive-PARTITIONED
    by priority, the dimension's selective filter (sla_hours <= 4) is
    only known at PLAN time on the dim side, and Spark injects a
    ``dynamicpruning`` subquery into the fact scan so only the 2
    matching partition directories are ever read — at 100 TB, the
    difference between scanning two days and scanning history when the
    filter arrives through a join instead of a literal predicate.
    The broadcast exchange is REUSED as the pruning subquery (one dim
    evaluation, not two). Plan-asserted in tests/test_plans.py; the
    oracle computes the same join relationally on the unpartitioned
    table."""
    # one-time partitioned materialization, cached per (process, sf_dir)
    # like the table_format fixture stores — repeat runs measure the
    # pruned JOIN, not the build
    key = ("dpp_fact", sf_dir)
    if key not in _DPP_CACHE:
        fact_dir = scratch_dir("log2sql_dpp_")
        (
            load_table(spark, "orders", sf_dir)
            .select(
                F.col("o_orderpriority").alias("pri"),
                F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            )
            .write.mode("overwrite")
            .partitionBy("pri")
            .parquet(fact_dir)
        )
        _DPP_CACHE[key] = fact_dir
    fact = spark.read.parquet(_DPP_CACHE[key])
    # The dim must stay a FILE SCAN with a Filter node above it: DPP's
    # PartitionPruning rule only injects the pruning subquery when the
    # build side carries a selective predicate, and a VALUES literal
    # (values_df) gets its filter constant-folded into the
    # LocalRelation by ConvertToLocalRelation — killing DPP entirely.
    # A 5-row parquet fixture keeps the Filter, is still JVM-only (no
    # Python worker), and the broadcast exchange is reused as the
    # pruning subquery exactly as documented above.
    dim_key = ("dpp_dim", sf_dir)
    if dim_key not in _DPP_CACHE:
        from log2sql_spark.localrel import values_df

        dim_dir = scratch_dir("log2sql_dpp_dim_")
        values_df(
            spark,
            [
                ("1-URGENT", 1),
                ("2-HIGH", 4),
                ("3-MEDIUM", 24),
                ("4-NOT SPECIFIED", 72),
                ("5-LOW", 168),
            ],
            "pri string, sla_hours int",
        ).write.mode("overwrite").parquet(dim_dir)
        _DPP_CACHE[dim_key] = dim_dir
    dim = spark.read.parquet(_DPP_CACHE[dim_key]).filter(F.col("sla_hours") <= 4)
    return (
        fact.join(F.broadcast(dim), "pri")
        .groupBy("pri", "sla_hours")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("sum_cents"),
        )
        .orderBy("pri")
    )
