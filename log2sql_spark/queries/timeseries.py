"""Time-series analytics: hypertable-style rollups, gap-filling, and
cohort retention over the event stream.

The rollup query is the batch twin of a continuous aggregate: it
materializes re-aggregable hourly partials (sum/count, never avg) and
derives the daily report FROM THE PARTIALS — the pattern that lets a
100 TB event store answer month queries from hour summaries without
re-scanning raw events. Gap-filling densifies sparse per-key series
with sequence+explode (rows generated executor-side, proportional to
the key's span) and carries values forward with an IGNORE NULLS window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from log2sql_spark.registry import query
from log2sql_spark.sources.tables import load_table

_CENTS = lambda c: F.round(F.col(c) * 100).cast("bigint")  # noqa: E731


@query(
    "ts_rollup_reaggregate",
    oracle="""
    SELECT date_trunc('day', ts) AS day,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events
    GROUP BY 1, 2
    ORDER BY day, event_type
    """,
)
def ts_rollup_reaggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level continuous-aggregate rollup: hourly partials (count +
    integer-cent sum — mergeable statistics only) re-aggregate into the
    daily report. The oracle computes daily DIRECTLY from raw events,
    so the hash match proves partial re-aggregation is lossless — the
    correctness property a hypertable's month-from-hour queries rely
    on. Both aggregations are map-side combined; the second one runs
    over 24x fewer rows than raw."""
    events = load_table(spark, "events", sf_dir)
    hourly = events.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_CENTS("value")).alias("sum_cents"),
    )
    return (
        hourly.groupBy(
            F.date_trunc("day", "hour").alias("day"), "event_type"
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_cents").alias("sum_cents"),
        )
        .orderBy("day", "event_type")
    )


@query(
    "ts_gapfill_locf",
    oracle="""
    WITH purchases AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events
      WHERE event_type = 'purchase' AND user_id < 20
      GROUP BY 1, 2
    ),
    spans AS (
      SELECT user_id, min(day) AS d0, max(day) AS d1 FROM purchases GROUP BY 1
    ),
    dense AS (
      SELECT s.user_id, gs.day AS day
      FROM spans s, LATERAL (
        SELECT unnest(generate_series(s.d0, s.d1, INTERVAL 1 DAY)) AS day
      ) gs
    )
    SELECT d.user_id, d.day,
           coalesce(p.n, 0) AS n,
           last_value(p.cents IGNORE NULLS) OVER (
             PARTITION BY d.user_id ORDER BY d.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cents_locf
    FROM dense d LEFT JOIN purchases p USING (user_id, day)
    ORDER BY user_id, day
    """,
)
def ts_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling with last-observation-carried-forward: densify each
    user's daily purchase series over [first, last] purchase day
    (sequence+explode — generated executor-side, sized by the user's
    own span, never a global calendar cross join), left-join the
    actuals, fill counts with 0 and carry the cent value forward with
    an IGNORE NULLS last() window. One shuffle for the daily agg, one
    for the window; the join key (user_id, day) is co-partitioned with
    the window's partition key."""
    events = load_table(spark, "events", sf_dir)
    purchases = (
        events.filter((F.col("event_type") == "purchase") & (F.col("user_id") < 20))
        .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(_CENTS("value")).alias("cents"))
    )
    dense = (
        purchases.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        dense.join(purchases, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.last("cents", ignorenulls=True).over(w).alias("cents_locf"),
        )
        .orderBy("user_id", "day")
    )


@query(
    "ts_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
      FROM events GROUP BY 1
    ),
    activity AS (
      SELECT DISTINCT e.user_id,
             CAST(floor(date_diff('day', f.cohort_day,
                                  date_trunc('day', e.ts)) / 7)
                  AS BIGINT) AS week_offset,
             date_trunc('week', f.cohort_day) AS cohort_week
      FROM events e JOIN firsts f USING (user_id)
    )
    SELECT cohort_week, week_offset,
           CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
    FROM activity
    GROUP BY 1, 2
    ORDER BY cohort_week, week_offset
    """,
)
def ts_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week,
    counted distinct per week-offset of later activity. The firsts
    aggregate is tiny (one row per user) and broadcast back onto the
    event stream, so the only wide operation over raw events is the
    final distinct-count — no event-to-event self-join."""
    events = load_table(spark, "events", sf_dir)
    days = events.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    firsts = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(F.broadcast(firsts), "user_id")
        .select(
            F.date_trunc("week", "cohort_day").alias("cohort_week"),
            F.floor(F.datediff(F.col("day"), F.col("cohort_day")) / 7)
            .cast("bigint")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "ts_sessionize_events",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, ts, event_type,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    flagged AS (
      SELECT *,
             CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 12 HOUR
                  THEN 1 ELSE 0 END AS new_session
      FROM ordered
    ),
    sessions AS (
      SELECT *,
             CAST(sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_seq
      FROM flagged
    )
    SELECT user_id,
           session_seq,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS session_start,
           CAST(date_diff('microsecond', min(ts), max(ts)) // 1000000 AS BIGINT)
             AS duration_secs,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
    FROM sessions
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
    """,
)
def ts_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: per-user event streams split into
    sessions wherever the inter-event gap exceeds 12 hours (lag +
    running sum of break flags — the standard batch twin of a streaming
    ``session_window``). One shuffle on user_id serves BOTH windows
    (lag and the running session counter share partitioning+ordering);
    the per-session rollup then partial-aggregates map-side. Scale: the
    state per key is one window frame, never the whole user history in
    memory, and users are independent — the plan is embarrassingly
    parallel across the user hash space at any corpus size."""
    events = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.withColumn(
        "new_session",
        # timestampdiff in MICROSECOND: exact integer arithmetic on the
        # NTZ timestamps, matching DuckDB's interval comparison to the
        # microsecond (no truncation at the gap boundary).
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.expr("timestampdiff(MICROSECOND, lag(ts) OVER "
                       "(PARTITION BY user_id ORDER BY ts, event_id), ts)")
                > F.lit(12 * 3600 * 1_000_000)
            ),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.expr(
                "timestampdiff(MICROSECOND, min(ts), max(ts)) DIV 1000000"
            ).cast("long").alias("duration_secs"),
            F.countDistinct("event_type").alias("n_types"),
        )
        .orderBy("user_id", "session_seq")
    )


@query(
    "ts_anomaly_mad",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), med AS (
      SELECT event_type, median(n) AS med_n FROM daily GROUP BY event_type
    ), mad AS (
      SELECT d.event_type, median(abs(d.n - m.med_n)) AS mad_n
      FROM daily d JOIN med m USING (event_type)
      GROUP BY d.event_type
    )
    SELECT d.event_type, d.day, d.n,
           round(m.med_n, 6) AS med_n, round(a.mad_n, 6) AS mad_n
    FROM daily d
    JOIN med m ON d.event_type = m.event_type
    JOIN mad a ON d.event_type = a.event_type
    WHERE abs(d.n - m.med_n) > 3 * a.mad_n AND a.mad_n > 0
    ORDER BY d.event_type, d.day
    """,
)
def ts_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust time-series anomaly detection: a day is anomalous for an
    event type when its event count sits more than 3 median-absolute-
    deviations from that type's median day. Median/MAD (not mean/σ) so
    the detector isn't poisoned by the very outliers it hunts. Shape:
    one map-side-combined daily rollup, then two aggregates over the
    tiny (type × day) series joined back — the raw events are read
    once. Counts are integers and both engines define median of an
    even set as the midpoint, so the flag decisions are exact."""
    events = load_table(spark, "events", sf_dir)
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    # daily feeds three consumers (median, MAD, final flags): persist so
    # the raw events scan+rollup runs once, not three times.
    daily = daily.persist()
    med = daily.groupBy("event_type").agg(F.median("n").alias("med_n"))
    withmed = daily.join(F.broadcast(med), "event_type")
    mad = withmed.groupBy("event_type").agg(
        F.median(F.abs(F.col("n") - F.col("med_n"))).alias("mad_n")
    )
    return (
        withmed.join(F.broadcast(mad), "event_type")
        .filter(
            (F.abs(F.col("n") - F.col("med_n")) > 3 * F.col("mad_n"))
            & (F.col("mad_n") > 0)
        )
        .select(
            "event_type",
            "day",
            "n",
            F.round("med_n", 6).alias("med_n"),
            F.round("mad_n", 6).alias("mad_n"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "ts_ewma_smooth",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ), series AS (
      SELECT event_type,
             list(CAST(cents AS DOUBLE) ORDER BY day) AS s,
             list(day ORDER BY day) AS days
      FROM daily GROUP BY event_type
    ), e AS (
      SELECT event_type, s, days, unnest(range(1, len(s) + 1)) AS i FROM series
    )
    SELECT event_type,
           days[CAST(i AS INTEGER)] AS day,
           CAST(s[CAST(i AS INTEGER)] AS BIGINT) AS cents,
           round(list_reduce(s[1:CAST(i AS INTEGER)],
                             (acc, x) -> acc * 0.7 + x * 0.3), 6) AS ewma
    FROM e
    ORDER BY event_type, day
    """,
)
def ts_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (alpha=0.3) of daily
    revenue per event type — the smoothing pass dashboards and
    anomaly baselines run. EWMA is an ORDER-SENSITIVE sequential fold,
    which distributed engines must make deterministic explicitly: the
    per-type series is sort_array-ed once (collect_list alone has no
    order guarantee under shuffle), then each day's value is a left
    fold over its prefix with identical IEEE arithmetic in both
    engines — so even the running state hash-matches, not just the
    final smoothed point. Per-type series are day-bounded, so the
    quadratic prefix fold is a few thousand multiplies per group."""
    events = load_table(spark, "events", sf_dir)
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(_CENTS("value")).cast("long").alias("cents"))
    series = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "cents"))).alias("rows")
    )
    s = F.transform("rows", lambda r: r.cents.cast("double"))
    exploded = series.select(
        "event_type",
        s.alias("s"),
        F.transform("rows", lambda r: r.day).alias("days"),
        F.posexplode(F.sequence(F.lit(1), F.size("rows"))).alias("_p", "i"),
    )
    prefix = F.slice("s", 1, F.col("i"))
    ewma = F.aggregate(
        F.slice(prefix, 2, F.col("i") - 1),
        F.element_at(prefix, 1),
        lambda acc, x: acc * 0.7 + x * 0.3,
    )
    return (
        exploded.select(
            "event_type",
            F.element_at("days", F.col("i")).alias("day"),
            F.element_at("s", F.col("i")).cast("long").alias("cents"),
            F.round(ewma, 6).alias("ewma"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "ts_ohlc_resample",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour,
           event_type,
           arg_min(CAST(round(value * 100) AS BIGINT), event_id) AS open_cents,
           max(CAST(round(value * 100) AS BIGINT)) AS high_cents,
           min(CAST(round(value * 100) AS BIGINT)) AS low_cents,
           arg_max(CAST(round(value * 100) AS BIGINT), event_id) AS close_cents,
           CAST(count(*) AS BIGINT) AS volume,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events
    GROUP BY 1, 2
    ORDER BY hour, event_type
    """,
)
def ts_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar resampling — the financial-downsampling shape every
    time-series engine ships (open/high/low/close per bucket). Open and
    close are selected by min_by/max_by over the unique, monotonically
    assigned event_id (the ingest sequence), never by a sort: the whole
    query is ONE hash aggregate with map-side combine — at 100 TB it
    shuffles |buckets|x|types| partial rows, not events. Money stays in
    integer cents so open/close hash identically cross-engine."""
    events = load_table(spark, "events", sf_dir)
    cents = _CENTS("value")
    return (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(
            F.min_by(cents, "event_id").alias("open_cents"),
            F.max(cents).alias("high_cents"),
            F.min(cents).alias("low_cents"),
            F.max_by(cents, "event_id").alias("close_cents"),
            F.count(F.lit(1)).alias("volume"),
            F.sum(cents).alias("sum_cents"),
        )
        .orderBy("hour", "event_type")
    )


@query(
    "events_user_path_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events
    )
    SELECT src, dst, CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE dst IS NOT NULL
    GROUP BY src, dst
    ORDER BY src, dst
    """,
)
def events_user_path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov path analysis (product-analytics "user flows"): count
    src→dst transitions between consecutive events per user. ONE
    shuffle partitioned by user_id feeds the lead() window (event_id
    breaks timestamp ties deterministically), then the transition count
    map-side combines — at 100 TB the heavy shuffle is per-user
    sequencing, and it is shared with every other per-user window in a
    real pipeline. Complements events_funnel_steps (fixed pattern) and
    events_sequence_pattern (regex): this is the unordered-exploration
    shape."""
    events = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    )
    return (
        seq.filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("src", "dst")
    )


@query(
    "agg_mode_deterministic",
    oracle="""
    WITH c AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) % 10 AS bucket,
             CAST(count(*) AS BIGINT) AS n
      FROM events
      GROUP BY 1, 2
    ),
    r AS (
      SELECT event_type, bucket, n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY n DESC, bucket ASC) AS rk
      FROM c
    )
    SELECT event_type, bucket AS mode_bucket, n AS mode_count
    FROM r WHERE rk = 1
    ORDER BY event_type
    """,
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE: Spark 4's built-in ``mode()`` (and DuckDB's)
    picks an ARBITRARY value among tied modes, so the engines can
    legally disagree — this restates mode as count + ranked pick with
    an explicit smallest-value tie-break, making the answer a function
    of the data. Two map-side-combined aggregates; the ranking window
    runs over |groups|x|distinct values| rows, not events."""
    events = load_table(spark, "events", sf_dir)
    c = events.groupBy(
        "event_type",
        (F.round(F.col("value") * 100).cast("bigint") % 10).alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy(F.desc("n"), F.asc("bucket"))
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("bucket").alias("mode_bucket"),
            F.col("n").alias("mode_count"),
        )
        .orderBy("event_type")
    )


@query(
    "events_rfm_segmentation",
    oracle="""
    WITH rfm AS (
      SELECT user_id,
             max(ts) AS last_ts,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS monetary
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    )
    SELECT user_id, frequency, monetary,
           CAST(ntile(4) OVER (ORDER BY last_ts, user_id) AS BIGINT) AS r_q,
           CAST(ntile(4) OVER (ORDER BY frequency, user_id) AS BIGINT) AS f_q,
           CAST(ntile(4) OVER (ORDER BY monetary, user_id) AS BIGINT) AS m_q
    FROM rfm
    ORDER BY user_id
    """,
)
def events_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary
    quartiles) — the classic marketing-analytics rollup. One hash
    aggregate builds the per-user profile; each quartile is an exact
    ntile over the |users| profile rows with a user_id tie-break so
    bucket edges are deterministic cross-engine.

    Scale shape (r14): the oracle's three global ntile windows would
    each pull every profile row onto ONE partition. The Spark side
    derives the identical quartile assignment distributed via
    ``distributed_global_rank`` (the gains-deciles decomposition):
    per-group row_number + cumulative base rank over the distinct
    coarse keys — recency coarsened to the DAY (calendar-bounded),
    frequency grouped on itself (small-integer counts), monetary on
    10-dollar buckets (value-range-bounded) — then ntile's bucket
    arithmetic closed-form from the rank. Bit-identical to the
    single-window oracle, no single-partition stage over row data."""
    from log2sql_spark.operators.ranks import distributed_global_rank, ntile_from_rank

    events = load_table(spark, "events", sf_dir)
    rfm = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(_CENTS("value")).alias("monetary"),
        )
    )
    ranked = distributed_global_rank(
        rfm, "last_ts", ["user_id"], coarse=F.to_date("last_ts"), out="r_rank"
    )
    ranked = distributed_global_rank(ranked, "frequency", ["user_id"], out="f_rank")
    ranked = distributed_global_rank(
        ranked,
        "monetary",
        ["user_id"],
        coarse=F.floor(F.col("monetary") / 1000),
        out="m_rank",
    )
    n_total = rfm.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        ranked.crossJoin(F.broadcast(n_total))
        .select(
            "user_id",
            "frequency",
            "monetary",
            ntile_from_rank(F.col("r_rank"), F.col("n_total"), 4).alias("r_q"),
            ntile_from_rank(F.col("f_rank"), F.col("n_total"), 4).alias("f_q"),
            ntile_from_rank(F.col("m_rank"), F.col("n_total"), 4).alias("m_q"),
        )
        .orderBy("user_id")
    )


@query(
    "ts_seasonal_decompose",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hour,
             CAST(count(*) AS BIGINT) AS n
      FROM events
      GROUP BY 1
    ),
    trend AS (
      SELECT hour, n,
             CAST(sum(n) OVER w * 1000 AS BIGINT)
               // CAST(count(*) OVER w AS BIGINT) AS trend_milli,
             CAST(count(*) OVER w AS BIGINT) AS trend_n
      FROM hourly
      WINDOW w AS (ORDER BY hour ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
    ),
    seasonal AS (
      SELECT hour, n, trend_milli, trend_n,
             CAST(sum(n * 1000 - trend_milli)
                    OVER (PARTITION BY extract(hour FROM hour)) AS BIGINT)
               AS seasonal_sum_milli,
             CAST(count(*) OVER (PARTITION BY extract(hour FROM hour)) AS BIGINT)
               AS seasonal_cnt
      FROM trend
    )
    SELECT hour, n, trend_milli, trend_n, seasonal_sum_milli, seasonal_cnt,
           (n * 1000 - trend_milli) * seasonal_cnt - seasonal_sum_milli
             AS residual_scaled
    FROM seasonal
    ORDER BY hour
    """,
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the hourly event
    count: trend = centered 25-hour moving average, seasonal =
    per-hour-of-day mean deviation from trend, residual = the rest.
    All-integer arithmetic: the trend is an integer-division milli-mean
    (float avg would diverge in the last ulp under different summation
    orders), and the seasonal component stays as an exact (sum, count)
    pair — the residual is emitted scaled by the seasonal count instead
    of dividing a possibly-negative sum, whose truncation direction
    differs across engines. Plan shape: one aggregate to hourly
    (|hours| rows), one unpartitioned window over hours, one
    hour-of-day window — all post-aggregate, so events are touched
    exactly once at any scale."""
    events = load_table(spark, "events", sf_dir)
    hourly = events.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy("hour").rowsBetween(-12, 12)
    # integer division, not double: expr-level `div`
    trend = hourly.withColumn("_sum", F.sum("n").over(w)).withColumn(
        "_cnt", F.count(F.lit(1)).over(w)
    ).select(
        "hour",
        "n",
        F.expr("(_sum * 1000) div _cnt").alias("trend_milli"),
        F.col("_cnt").alias("trend_n"),
    )
    ws = Window.partitionBy(F.hour("hour"))
    seasonal = trend.withColumn(
        "seasonal_sum_milli",
        F.sum(F.col("n") * 1000 - F.col("trend_milli")).over(ws),
    ).withColumn("seasonal_cnt", F.count(F.lit(1)).over(ws))
    return seasonal.select(
        "hour",
        "n",
        "trend_milli",
        "trend_n",
        "seasonal_sum_milli",
        "seasonal_cnt",
        (
            (F.col("n") * 1000 - F.col("trend_milli")) * F.col("seasonal_cnt")
            - F.col("seasonal_sum_milli")
        ).alias("residual_scaled"),
    ).orderBy("hour")


@query(
    "events_ab_conversion",
    oracle="""
    WITH assign AS (
      SELECT DISTINCT user_id, user_id % 2 AS variant FROM events
    ),
    conv AS (
      SELECT a.variant,
             CAST(count(*) AS BIGINT) AS users,
             CAST(count(*) FILTER (WHERE c.user_id IS NOT NULL) AS BIGINT)
               AS converted,
             CAST(coalesce(sum(c.cents), 0) AS BIGINT) AS revenue_cents
      FROM assign a
      LEFT JOIN (
        SELECT user_id,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
      ) c USING (user_id)
      GROUP BY a.variant
    )
    SELECT variant, users, converted,
           converted * 10000 // users AS conv_bp,
           revenue_cents
    FROM conv
    ORDER BY variant
    """,
)
def events_ab_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: deterministic hash assignment (user_id
    parity stands in for the murmur-bucket split a real platform uses —
    `llm_split_assign` shows the salted-hash variant), per-variant
    conversion in basis points and revenue. Two aggregates over
    per-user rows + one broadcast-sized variant join; events are
    scanned once per leg. Everything integer, so the readout hashes
    exactly."""
    events = load_table(spark, "events", sf_dir)
    assign = events.select("user_id").distinct().withColumn(
        "variant", F.col("user_id") % 2
    )
    conv = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(_CENTS("value")).alias("cents"))
    )
    j = assign.join(conv, "user_id", "left")
    return (
        j.groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("users"),
            F.count("cents").alias("converted"),
            F.coalesce(F.sum("cents"), F.lit(0)).cast("bigint").alias("revenue_cents"),
        )
        .select(
            "variant",
            "users",
            "converted",
            F.expr("converted * 10000 div users").alias("conv_bp"),
            "revenue_cents",
        )
        .orderBy("variant")
    )


@query(
    "ts_forecast_snaive_eval",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT a.event_type,
           CAST(count(*) AS BIGINT) AS n_days_eval,
           round(avg(abs(a.n - f.n) / a.n), 6) AS mape,
           round(sqrt(avg((a.n - f.n) * (a.n - f.n) * 1.0)), 6) AS rmse
    FROM daily a
    JOIN daily f
      ON f.event_type = a.event_type AND f.day = a.day - INTERVAL 7 DAY
    GROUP BY a.event_type
    ORDER BY a.event_type
    """,
)
def ts_forecast_snaive_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast evaluation: predict each day's event
    count with the count from 7 days earlier and score MAPE/RMSE per
    type — the baseline every real forecaster must beat, and the
    backtest shape (as-of self-join on the series) used to evaluate
    them. The raw events are read once into a (type x day) rollup; the
    7-day-lag join and both error aggregates run on that tiny series.
    Counts are positive integers so MAPE has no zero-division edge;
    sqrt is IEEE-correctly-rounded so 6 dp rounding agrees
    cross-engine."""
    events = load_table(spark, "events", sf_dir)
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    a, f = daily.alias("a"), daily.alias("f")
    joined = a.join(
        f,
        (F.col("f.event_type") == F.col("a.event_type"))
        & (F.col("f.day") == F.col("a.day") - F.expr("INTERVAL 7 DAYS")),
    )
    return (
        joined.groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days_eval"),
            F.round(
                F.avg(F.abs(F.col("a.n") - F.col("f.n")) / F.col("a.n")), 6
            ).alias("mape"),
            F.round(
                F.sqrt(
                    F.avg(
                        (F.col("a.n") - F.col("f.n"))
                        * (F.col("a.n") - F.col("f.n"))
                        * F.lit(1.0)
                    )
                ),
                6,
            ).alias("rmse"),
        )
        .orderBy("event_type")
    )


@query(
    "ts_downsample_lttb",
    oracle="""
    WITH pts AS (
      SELECT event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS xa,  -- floor: match unix_timestamp's truncation
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events WHERE event_type = 'view' AND value IS NOT NULL
    ), bounds AS (
      SELECT min(xa) AS xmin, max(xa) AS xmax FROM pts
    ), px AS (
      SELECT event_id, xa - (SELECT xmin FROM bounds) AS x, y,
             least(59, (xa - (SELECT xmin FROM bounds)) * 60
                   // ((SELECT xmax - xmin + 1 FROM bounds))) AS b
      FROM pts
    ), stats AS (
      SELECT b, count(*) AS cnt,
             CAST(sum(x) AS DOUBLE) / count(*) AS mx,
             CAST(sum(y) AS DOUBLE) / count(*) AS my
      FROM px GROUP BY b
    ), scored AS (
      SELECT p.b, p.event_id, p.x, p.y,
             round(abs( (sp.mx - p.x) * (sn.my - p.y)
                      - (sn.mx - p.x) * (sp.my - p.y) ), 6) AS area2
      FROM px p
      JOIN stats sp ON sp.b = p.b - 1
      JOIN stats sn ON sn.b = p.b + 1
    ), picked AS (
      SELECT b, event_id, x, y,
             row_number() OVER (PARTITION BY b
                                ORDER BY area2 DESC, x ASC, event_id ASC) AS rn
      FROM scored
    ), ends AS (
      SELECT b, event_id, x, y,
             row_number() OVER (PARTITION BY b
                                ORDER BY CASE WHEN b = 0 THEN x ELSE -x END ASC,
                                         event_id ASC) AS rn
      FROM px WHERE b IN (0, 59)
    )
    SELECT CAST(b AS BIGINT) AS bucket, CAST(event_id AS BIGINT) AS event_id,
           CAST(x AS BIGINT) AS x, y
    FROM picked WHERE rn = 1 AND b NOT IN (0, 59)
    UNION ALL
    SELECT CAST(b AS BIGINT), CAST(event_id AS BIGINT), CAST(x AS BIGINT), y
    FROM ends WHERE rn = 1
    ORDER BY bucket, x
    """,
)
def ts_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB downsampling (Largest-Triangle-Three-Buckets, Steinarsson
    2013) in its PARALLEL bucket-mean-anchor variant: classic LTTB
    chains each pick to the previous selection (inherently sequential);
    anchoring every triangle to the NEIGHBOR BUCKETS' mean points
    instead makes every bucket independent — one stats aggregate, two
    broadcastable self-joins on bucket±1, one per-bucket argmax — while
    keeping the visual property (keep the point sweeping the largest
    triangle against its neighborhood). First/last buckets pin the
    series endpoints, LTTB's convention. All inputs are exact integers
    and the area is pure IEEE *,-,abs (no libm), so the doubles are
    bit-identical cross-engine; ties (collinear runs, area 0) break on
    (x, event_id). The 60-point sketch of a 100 TB series costs one
    shuffle on a 60-row stats dim."""
    events = load_table(spark, "events", sf_dir)
    pts = events.filter(
        (F.col("event_type") == "view") & F.col("value").isNotNull()
    ).select(
        "event_id",
        F.unix_timestamp("ts").alias("xa"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    bounds = pts.agg(F.min("xa").alias("xmin"), F.max("xa").alias("xmax"))
    px = pts.crossJoin(F.broadcast(bounds)).select(
        "event_id",
        (F.col("xa") - F.col("xmin")).alias("x"),
        "y",
        F.least(
            F.lit(59),
            F.expr("(xa - xmin) * 60 DIV (xmax - xmin + 1)"),
        ).alias("b"),
    )
    stats = px.groupBy("b").agg(
        F.count("*").alias("cnt"),
        (F.sum("x").cast("double") / F.count("*")).alias("mx"),
        (F.sum("y").cast("double") / F.count("*")).alias("my"),
    )
    sp = stats.select((F.col("b") + 1).alias("b"), F.col("mx").alias("pmx"), F.col("my").alias("pmy"))
    sn = stats.select((F.col("b") - 1).alias("b"), F.col("mx").alias("nmx"), F.col("my").alias("nmy"))
    scored = (
        px.join(F.broadcast(sp), "b")
        .join(F.broadcast(sn), "b")
        .withColumn(
            "area2",
            F.round(
                F.abs(
                    (F.col("pmx") - F.col("x")) * (F.col("nmy") - F.col("y"))
                    - (F.col("nmx") - F.col("x")) * (F.col("pmy") - F.col("y"))
                ),
                6,
            ),
        )
    )
    from pyspark.sql import Window as W

    wpick = W.partitionBy("b").orderBy(F.desc("area2"), F.asc("x"), F.asc("event_id"))
    interior = (
        scored.withColumn("rn", F.row_number().over(wpick))
        .filter((F.col("rn") == 1) & (~F.col("b").isin(0, 59)))
        .select("b", "event_id", "x", "y")
    )
    wend = W.partitionBy("b").orderBy(
        F.when(F.col("b") == 0, F.col("x")).otherwise(-F.col("x")).asc(),
        F.asc("event_id"),
    )
    ends = (
        px.filter(F.col("b").isin(0, 59))
        .withColumn("rn", F.row_number().over(wend))
        .filter(F.col("rn") == 1)
        .select("b", "event_id", "x", "y")
    )
    return (
        interior.unionByName(ends)
        .select(
            F.col("b").cast("long").alias("bucket"),
            F.col("event_id").cast("long").alias("event_id"),
            F.col("x").cast("long").alias("x"),
            "y",
        )
        .orderBy("bucket", "x")
    )


@query(
    "ts_downsample_m4",
    oracle="""
    WITH pts AS (
      SELECT event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS xa,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events WHERE event_type = 'view' AND value IS NOT NULL
    ), bounds AS (
      SELECT min(xa) AS xmin, max(xa) AS xmax FROM pts
    ), px AS (
      SELECT event_id, xa - (SELECT xmin FROM bounds) AS x, y,
             least(59, (xa - (SELECT xmin FROM bounds)) * 60
                   // ((SELECT xmax - xmin + 1 FROM bounds))) AS b
      FROM pts
    )
    SELECT CAST(b AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(x) AS BIGINT) AS x_first,
           CAST(max(x) AS BIGINT) AS x_last,
           min_by(y, x ORDER BY x ASC, event_id ASC) AS y_first,
           max_by(y, x ORDER BY x ASC, event_id ASC) AS y_last,
           CAST(min(y) AS BIGINT) AS y_min,
           CAST(max(y) AS BIGINT) AS y_max
    FROM px GROUP BY b ORDER BY bucket
    """,
)
def ts_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 aggregation (Jugel et al., VLDB 2014): per pixel-column bucket
    keep min/max/first/last — the downsampling that renders a line
    chart EXACTLY at a given pixel width, and the cheap companion to
    LTTB (one hash aggregate, no windows, no joins: min/max/min_by/
    max_by all partial-aggregate map-side, so a 100 TB series reduces
    to 60 rows in one pass). first/last tie-break on event_id via the
    ordered min_by so duplicate-timestamp points pick identically in
    both engines."""
    events = load_table(spark, "events", sf_dir)
    pts = events.filter(
        (F.col("event_type") == "view") & F.col("value").isNotNull()
    ).select(
        "event_id",
        F.unix_timestamp("ts").alias("xa"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    bounds = pts.agg(F.min("xa").alias("xmin"), F.max("xa").alias("xmax"))
    px = pts.crossJoin(F.broadcast(bounds)).select(
        "event_id",
        (F.col("xa") - F.col("xmin")).alias("x"),
        "y",
        F.least(
            F.lit(59), F.expr("(xa - xmin) * 60 DIV (xmax - xmin + 1)")
        ).alias("b"),
    )
    return (
        px.groupBy("b")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("x").cast("long").alias("x_first"),
            F.max("x").cast("long").alias("x_last"),
            F.min_by("y", F.struct("x", "event_id")).alias("y_first"),
            F.max_by("y", F.struct("x", "event_id")).alias("y_last"),
            F.min("y").cast("long").alias("y_min"),
            F.max("y").cast("long").alias("y_max"),
        )
        .select(
            F.col("b").cast("long").alias("bucket"),
            "n", "x_first", "x_last", "y_first", "y_last", "y_min", "y_max",
        )
        .orderBy("bucket")
    )


@query(
    "ts_changepoint_cusum",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), series AS (
      SELECT event_type,
             list(n ORDER BY day) AS ns,
             list(day ORDER BY day) AS days,
             CAST(len(list(n)) AS BIGINT) AS d,
             CAST(sum(n) AS BIGINT) AS total
      FROM daily GROUP BY event_type
    ), shifted AS (
      SELECT event_type, days, d, total,
             -- x'_i = n_i*D - mu' - k'  (mu' = mean*D = total, k' = 5% slack)
             list_transform(ns, n -> n * d - total - total * 5 // 100) AS xs
      FROM series
    ), e AS (
      SELECT event_type, days, d, total, xs,
             unnest(range(1, len(xs) + 1)) AS i
      FROM shifted
    )
    SELECT event_type,
           days[CAST(i AS INTEGER)] AS day,
           CAST((xs[CAST(i AS INTEGER)] + total + total * 5 // 100) // d
                AS BIGINT) AS n,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                                         xs[1:CAST(i AS INTEGER)]),
                            (acc, x) -> greatest(CAST(0 AS BIGINT), acc + x))
                AS BIGINT) AS cusum_scaled,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
                                    xs[1:CAST(i AS INTEGER)]),
                       (acc, x) -> greatest(CAST(0 AS BIGINT), acc + x))
             > 2 * total AS alarm
    FROM e
    ORDER BY event_type, day
    """,
)
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection on daily event rates: the running
    statistic s_i = max(0, s_{i-1} + x_i - mean - slack) accumulates
    only sustained upward drift (one noisy spike decays; a level shift
    ramps) and alarms past a threshold — the classic sequential
    detector (Page 1954), complementing the point-wise MAD detector
    (ts_anomaly_mad) which cannot see gradual shifts. Everything is
    INTEGER-exact: values are scaled by the series length D so the mean
    needs no division (mu' = sum), the 5% slack and 2x-mean threshold
    are integer arithmetic, and the order-sensitive fold follows the
    ts_ewma_smooth discipline (sorted per-type series, prefix fold,
    day-bounded quadratic). Even the running CUSUM state hash-matches
    cross-engine."""
    events = load_table(spark, "events", sf_dir)
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    series = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "n"))).alias("rows"),
        F.count(F.lit(1)).cast("long").alias("d"),
        F.sum("n").cast("long").alias("total"),
    )
    xs = F.transform(
        "rows",
        lambda r: r.n * F.col("d") - F.col("total")
        - F.expr("total * 5 DIV 100"),
    )
    exploded = series.select(
        "event_type",
        F.transform("rows", lambda r: r.day).alias("days"),
        "d",
        "total",
        xs.alias("xs"),
        F.explode(F.sequence(F.lit(1), F.size(xs))).alias("i"),
    )
    run = F.aggregate(
        F.slice("xs", 1, F.col("i")),
        F.lit(0).cast("long"),
        lambda acc, x: F.greatest(F.lit(0).cast("long"), acc + x),
    )
    return (
        exploded.select(
            "event_type",
            F.element_at("days", F.col("i")).alias("day"),
            F.expr(
                "(element_at(xs, i) + total + total * 5 DIV 100) DIV d"
            )
            .cast("long")
            .alias("n"),
            run.cast("long").alias("cusum_scaled"),
            (run > 2 * F.col("total")).alias("alarm"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "ts_rolling_wau_hll",
    oracle="""
    WITH days AS (
      SELECT DISTINCT date_trunc('day', ts) AS day FROM events
    ), dau AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(count(DISTINCT user_id) AS BIGINT) AS dau
      FROM events GROUP BY 1
    ), wau AS (
      SELECT d.day,
             CAST(count(DISTINCT e.user_id) AS BIGINT) AS wau
      FROM days d
      JOIN events e
        ON date_trunc('day', e.ts) BETWEEN d.day - INTERVAL 6 DAY AND d.day
      GROUP BY d.day
    )
    SELECT dau.day AS day, dau.dau, wau.wau,
           dau.dau * 10000 // wau.wau AS stickiness_bp
    FROM dau JOIN wau ON dau.day = wau.day
    ORDER BY dau.day
    """,
)
def ts_rolling_wau_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / rolling 7-day WAU / stickiness — the engagement triple.
    The rolling DISTINCT is the scale trap: exact sliding distincts
    re-scan every event per window. Here each day aggregates ONCE into
    a DataSketches HLL (lgK=20), and the 7-day window UNIONS the
    per-day sketches (``hll_union_agg`` over a ROWS window on the
    |days|-row rollup) — re-aggregation cost is |days| x sketch size,
    the events are read once, and the same partials would roll into
    MAU/QAU for free. At these cardinalities lgK=20 holds every user
    as a coupon, so the estimate is EXACT and the oracle checks it
    against true windowed distincts (the same exactness contract as
    sketch_hll_distinct_users). Stickiness is truncating integer basis
    points."""
    from pyspark.sql import Window as W

    events = load_table(spark, "events", sf_dir)
    daily = events.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count_distinct("user_id").cast("long").alias("dau"),
        F.hll_sketch_agg("user_id", F.lit(20)).alias("sk"),
    )
    w = W.orderBy("day").rowsBetween(-6, 0)
    # days are contiguous in this dataset, so ROWS -6..0 == the 7-day
    # RANGE; a gappy calendar would use a RANGE frame on unix_date.
    return (
        daily.withColumn(
            "wau", F.hll_sketch_estimate(F.hll_union_agg("sk").over(w))
        )
        .select(
            "day",
            "dau",
            F.col("wau").cast("long").alias("wau"),
            F.expr("dau * 10000 DIV wau").alias("stickiness_bp"),
        )
        .orderBy("day")
    )


@query(
    "ts_trend_mann_kendall",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT a.event_type,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN b.n > a.n THEN 1
                         WHEN b.n < a.n THEN -1 ELSE 0 END) AS BIGINT) AS s,
           CAST(sum(CASE WHEN b.n > a.n THEN 1
                         WHEN b.n < a.n THEN -1 ELSE 0 END) * 10000
                // count(*) AS BIGINT) AS tau_bp
    FROM daily a JOIN daily b
      ON a.event_type = b.event_type AND a.day < b.day
    GROUP BY a.event_type
    ORDER BY a.event_type
    """,
)
def ts_trend_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test per event type: S = Σ sign(x_j − x_i)
    over all day pairs i<j, with Kendall's tau (S over pair count) in
    truncating basis points — the NON-PARAMETRIC monotone-trend screen
    (no distribution assumed, robust to outliers) completing the
    statistical family: chi-square (categorical), KS (distribution
    shift), CUSUM (level change), MAD (point outliers), Benford
    (digits), and now monotone trend. The pairwise join runs on the
    (type × day) rollup — tens of rows per type — so the O(days²)
    pair count is a few thousand integer signs, never touching raw
    events twice."""
    events = load_table(spark, "events", sf_dir)
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    a, b = daily.alias("a"), daily.alias("b")
    sign = (
        F.when(F.col("b.n") > F.col("a.n"), 1)
        .when(F.col("b.n") < F.col("a.n"), -1)
        .otherwise(0)
    )
    return (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(sign).cast("long").alias("s"),
            F.expr(
                "CAST(sum(CASE WHEN b.n > a.n THEN 1 WHEN b.n < a.n THEN -1"
                " ELSE 0 END) * 10000 DIV count(*) AS BIGINT)"
            ).alias("tau_bp"),
        )
        .orderBy("event_type")
    )


@query(
    "ts_max_concurrency",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), flagged AS (
      SELECT *, CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 12 HOUR
                     THEN 1 ELSE 0 END AS new_session
      FROM ordered
    ), numbered AS (
      SELECT *, CAST(sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_seq
      FROM flagged
    ), sessions AS (
      SELECT user_id, session_seq, min(ts) AS s, max(ts) AS e
      FROM numbered GROUP BY user_id, session_seq
    ), bounds AS (
      SELECT user_id, session_seq, s AS ts, 1 AS delta FROM sessions
      UNION ALL
      SELECT user_id, session_seq, e AS ts, -1 AS delta FROM sessions
    ), swept AS (
      SELECT CAST(ts AS DATE) AS day, ts, delta, user_id, session_seq,
             sum(delta) OVER (
               PARTITION BY CAST(ts AS DATE)
               ORDER BY ts, delta DESC, user_id, session_seq
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS local_run
      FROM bounds
    ), day_local AS (
      SELECT day, CAST(count(*) AS BIGINT) AS n_boundaries,
             CAST(max(local_run) AS BIGINT) AS max_local,
             CAST(sum(delta) AS BIGINT) AS day_total
      FROM swept GROUP BY day
    ), carried AS (
      SELECT day, n_boundaries,
             CAST(coalesce(sum(day_total) OVER (
               ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS BIGINT) AS carry_in,
             max_local
      FROM day_local
    )
    SELECT CAST(day AS TIMESTAMP) AS day, n_boundaries,
           carry_in, CAST(carry_in + max_local AS BIGINT) AS max_concurrent
    FROM carried ORDER BY day
    """,
)
def ts_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the interval-overlap sweep
    (room-scheduling / peak-load problem) in its DISTRIBUTED form. The
    naive sweep is one global running sum over every +1/-1 boundary —
    a single-task sort at scale. This plan does the textbook two-phase
    split: boundaries partition by DAY (per-day windows run in
    parallel), then a tiny per-day aggregate (30 rows here, one row
    per day at any scale) computes each day's carry-in occupancy as a
    prefix sum of previous days' net deltas, and peak(day) = carry_in
    + max(local running sum). Sessions spanning midnight are exactly
    what the carry-in accounts for. The global window that remains
    touches |days| rows, never |events|.

    Ties are fully ordered ((ts, delta desc, user, session) — starts
    before ends at the same instant, then a unique key) so the peak is
    deterministic on both engines even when boundaries collide.

    Sessions are the same 12 h-gap islands as ts_sessionize_events;
    reference analog: none (extension surface, SURVEY.md §2.2).
    """
    events = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select("user_id", "event_id", "ts").withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.expr(
                    "timestampdiff(MICROSECOND, lag(ts) OVER "
                    "(PARTITION BY user_id ORDER BY ts, event_id), ts)"
                )
                > 12 * 3600 * 1_000_000
            ),
            1,
        ).otherwise(0),
    )
    sessions = (
        flagged.withColumn(
            "session_seq", F.sum("new_session").over(w).cast("long")
        )
        .groupBy("user_id", "session_seq")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    )
    bounds = sessions.select(
        "user_id", "session_seq", F.col("s").alias("ts"), F.lit(1).alias("delta")
    ).unionByName(
        sessions.select(
            "user_id", "session_seq", F.col("e").alias("ts"),
            F.lit(-1).alias("delta"),
        )
    )
    day = F.to_date("ts")
    sweep_w = (
        Window.partitionBy("day")
        .orderBy(F.col("ts"), F.col("delta").desc(), F.col("user_id"),
                 F.col("session_seq"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = bounds.withColumn("day", day).withColumn(
        "local_run", F.sum("delta").over(sweep_w)
    )
    day_local = swept.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_boundaries"),
        F.max("local_run").cast("long").alias("max_local"),
        F.sum("delta").cast("long").alias("day_total"),
    )
    carry_w = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        day_local.withColumn(
            "carry_in",
            F.coalesce(F.sum("day_total").over(carry_w), F.lit(0)).cast("long"),
        )
        .select(
            F.col("day").cast("timestamp").alias("day"),
            "n_boundaries",
            "carry_in",
            (F.col("carry_in") + F.col("max_local")).cast("long").alias(
                "max_concurrent"
            ),
        )
        .orderBy("day")
    )


@query(
    "ts_acf_daily",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ), idx AS (
      SELECT row_number() OVER (ORDER BY day) AS i, x FROM daily
    ), stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s
      FROM idx
    ), dev AS (
      SELECT i, CAST(n * x - s AS BIGINT) AS d FROM idx, stats
    ), var AS (
      SELECT sum(CAST(d AS HUGEINT) * d) AS v FROM dev
    ), lags AS (
      SELECT unnest(generate_series(1, 7)) AS lag
    ), cov AS (
      SELECT lag,
             CAST(count(*) AS BIGINT) AS n_pairs,
             sum(CAST(a.d AS HUGEINT) * b.d) AS c
      FROM lags, dev a JOIN dev b ON b.i = a.i + lag
      GROUP BY lag
    )
    SELECT lag, n_pairs,
           CAST((10000 * c) // v AS BIGINT) AS r_bp
    FROM cov, var
    ORDER BY lag
    """,
)
def ts_acf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily event-count series at lags
    1..7 — the seasonality screen that tells a pipeline WHICH lag the
    seasonal-naive forecaster (ts_forecast_snaive_eval) should use and
    whether the weekday effect ts_dow_chisquare tests is autocorrelated
    structure or noise. Integer-exact by the CUSUM trick: deviations are
    scaled by the series length (d_i = n·x_i − Σx, no mean division),
    so covariance and variance are exact integer sums and
    r_k = 10000·Σ d_i·d_{i+k} DIV Σ d_i² is a truncating integer ratio
    both engines compute identically (products folded in DECIMAL(38,0)
    / HUGEINT — at 1e5-row days and 60-day spans the sums need ~2e19,
    past bigint). The only global window orders |days| rows — the
    events are read once into the daily rollup, the O(days·lags) pair
    join never touches raw events. Reference analog: none — time-series
    extension (SURVEY.md §2.2)."""
    events = load_table(spark, "events", sf_dir)
    daily = events.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    idx = daily.select(
        F.row_number().over(Window.orderBy("day")).alias("i"), "x"
    )
    stats = idx.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    dev = idx.crossJoin(F.broadcast(stats)).select(
        "i", (F.col("n") * F.col("x") - F.col("s")).cast("long").alias("d")
    ).localCheckpoint(eager=True)  # |days| rows; var + both cov arms share it
    var = dev.agg(
        F.sum(F.col("d").cast("decimal(38,0)") * F.col("d")).alias("v")
    )
    lags = spark.range(1, 8).select(F.col("id").cast("bigint").alias("lag"))
    a, b = dev.alias("a"), dev.alias("b")
    cov = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("b.i") == F.col("a.i") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("a.d").cast("decimal(38,0)") * F.col("b.d")).alias("c"),
        )
    )
    return (
        cov.crossJoin(F.broadcast(var))
        .select(
            "lag",
            "n_pairs",
            F.expr("CAST((10000 * c) DIV v AS BIGINT)").alias("r_bp"),
        )
        .orderBy("lag")
    )


@query(
    "ts_holt_linear",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ), series AS (
      SELECT event_type,
             list(CAST(cents AS DOUBLE) ORDER BY day) AS s,
             list(day ORDER BY day) AS days
      FROM daily GROUP BY event_type
      HAVING count(*) >= 2
    ), st AS (
      SELECT event_type, s, days, CAST(2 AS BIGINT) AS i,
             CAST(0.3 AS DOUBLE) * s[2]
               + CAST(0.7 AS DOUBLE) * (s[1] + (s[2] - s[1])) AS l,
             CAST(0.2 AS DOUBLE)
               * (CAST(0.3 AS DOUBLE) * s[2]
                  + CAST(0.7 AS DOUBLE) * (s[1] + (s[2] - s[1])) - s[1])
               + CAST(0.8 AS DOUBLE) * (s[2] - s[1]) AS b
      FROM series
      UNION ALL
      SELECT event_type, s, days, i + 1,
             CAST(0.3 AS DOUBLE) * s[CAST(i + 1 AS INTEGER)]
               + CAST(0.7 AS DOUBLE) * (l + b),
             CAST(0.2 AS DOUBLE)
               * (CAST(0.3 AS DOUBLE) * s[CAST(i + 1 AS INTEGER)]
                  + CAST(0.7 AS DOUBLE) * (l + b) - l)
               + CAST(0.8 AS DOUBLE) * b
      FROM st WHERE i < len(s)
    )
    SELECT event_type, days[CAST(i AS INTEGER)] AS day,
           CAST(s[CAST(i AS INTEGER)] AS BIGINT) AS cents,
           round(l, 6) AS level,
           round(b, 6) AS trend,
           round(l + b, 6) AS forecast_next
    FROM st
    ORDER BY event_type, day
    """,
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (double-exponential) smoothing of daily revenue per
    event type — the trend-aware upgrade of ts_ewma_smooth: level and
    trend evolve as the coupled fold l_t = αx_t + (1−α)(l_{t−1}+b_{t−1}),
    b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1} (α=0.3, β=0.2, init l₁=x₁,
    b₁=x₂−x₁), and l_t+b_t is the one-step-ahead forecast the snaive
    baseline (ts_forecast_snaive_eval) is judged against. Like the EWMA
    precedent, the fold is ORDER-SENSITIVE: the series is sort_array-ed
    once per type and each day folds its prefix with the IDENTICAL IEEE
    expression shape the oracle's recursive CTE iterates (DuckDB's
    list_reduce rebinds struct fields SEQUENTIALLY mid-lambda, so the
    coupled recurrence needs true snapshot semantics there) — the
    running (level, trend) STATE itself hash-matches at 6 dp, not just
    the final point. Per-type
    series are day-bounded so the quadratic prefix fold is a few
    thousand flops per group; the events are read once into the daily
    rollup. Reference analog: none — time-series extension (SURVEY.md
    §2.2)."""
    events = load_table(spark, "events", sf_dir)
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(_CENTS("value")).cast("long").alias("cents"))
    series = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "cents"))).alias("rows")
    ).filter(F.size("rows") >= 2)
    exploded = series.select(
        "event_type",
        F.transform("rows", lambda r: r.cents.cast("double")).alias("s"),
        F.transform("rows", lambda r: r.day).alias("days"),
        F.posexplode(F.sequence(F.lit(2), F.size("rows"))).alias("_p", "i"),
    )
    st = F.aggregate(
        F.slice("s", 2, F.col("i") - 1),
        F.struct(
            F.element_at("s", 1).alias("l"),
            (F.element_at("s", 2) - F.element_at("s", 1)).alias("b"),
        ),
        lambda acc, x: F.struct(
            (F.lit(0.3) * x + F.lit(0.7) * (acc.l + acc.b)).alias("l"),
            (
                F.lit(0.2)
                * (F.lit(0.3) * x + F.lit(0.7) * (acc.l + acc.b) - acc.l)
                + F.lit(0.8) * acc.b
            ).alias("b"),
        ),
    )
    return (
        exploded.select(
            "event_type",
            F.element_at("days", F.col("i")).alias("day"),
            F.element_at("s", F.col("i")).cast("bigint").alias("cents"),
            st.alias("st"),
        )
        .select(
            "event_type",
            "day",
            "cents",
            F.round(F.col("st.l"), 6).alias("level"),
            F.round(F.col("st.b"), 6).alias("trend"),
            F.round(F.col("st.l") + F.col("st.b"), 6).alias("forecast_next"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "ts_cross_correlation",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM events GROUP BY 1
    ), idx AS (
      SELECT row_number() OVER (ORDER BY day) AS i, x, y FROM daily
    ), stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy
      FROM idx
    ), dev AS (
      SELECT i, CAST(n * x - sx AS BIGINT) AS dx,
             CAST(n * y - sy AS BIGINT) AS dy
      FROM idx, stats
    ), var AS (
      SELECT sum(CAST(dx AS HUGEINT) * dx) AS vx,
             sum(CAST(dy AS HUGEINT) * dy) AS vy
      FROM dev
    ), lags AS (
      SELECT unnest(generate_series(0, 7)) AS lag
    ), cov AS (
      SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
             sum(CAST(a.dx AS HUGEINT) * b.dy) AS c
      FROM lags, dev a JOIN dev b ON b.i = a.i + lag
      GROUP BY lag
    )
    SELECT lag, n_pairs,
           CAST((10000 * c * c // (vx * vy))
                * (CASE WHEN c < 0 THEN -1 ELSE 1 END) AS BIGINT) AS r2_bp
    FROM cov, var
    ORDER BY lag
    """,
)
def ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation between the daily click and purchase series at
    lags 0..7 — the lead/lag discovery companion of ts_acf_daily: a
    peak at lag k says clicks lead purchases by k days, which is what
    sets the attribution lookback (events_attribution_last_touch's
    7-day window) and the funnel latency expectation on data instead
    of convention. Same integer-exact CUSUM scaling as the ACF
    (deviations n·x−Σx, HUGEINT/DECIMAL(38,0) products); the signed
    SQUARED correlation in basis points (sign(c)·10000·c²/(vx·vy))
    keeps the ratio a pure integer division — no square root — while
    preserving order and sign. Events are read once into one daily
    rollup carrying both series; the pair join is O(days·lags).
    Reference analog: none — time-series extension (SURVEY.md §2.2)."""
    events = load_table(spark, "events", sf_dir)
    daily = events.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("y"),
    )
    idx = daily.select(
        F.row_number().over(Window.orderBy("day")).alias("i"), "x", "y"
    )
    stats = idx.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
    )
    dev = idx.crossJoin(F.broadcast(stats)).select(
        "i",
        (F.col("n") * F.col("x") - F.col("sx")).cast("long").alias("dx"),
        (F.col("n") * F.col("y") - F.col("sy")).cast("long").alias("dy"),
    ).localCheckpoint(eager=True)  # |days| rows; shared by var + cov arms
    var = dev.agg(
        F.sum(F.col("dx").cast("decimal(38,0)") * F.col("dx")).alias("vx"),
        F.sum(F.col("dy").cast("decimal(38,0)") * F.col("dy")).alias("vy"),
    )
    lags = spark.range(0, 8).select(F.col("id").cast("bigint").alias("lag"))
    a, b = dev.alias("a"), dev.alias("b")
    cov = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("b.i") == F.col("a.i") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("a.dx").cast("decimal(38,0)") * F.col("b.dy")).alias("c"),
        )
    )
    return (
        cov.crossJoin(F.broadcast(var))
        .select(
            "lag",
            "n_pairs",
            F.expr(
                "CAST((10000 * c * c DIV (vx * vy))"
                " * (CASE WHEN c < 0 THEN -1 ELSE 1 END) AS BIGINT)"
            ).alias("r2_bp"),
        )
        .orderBy("lag")
    )


@query(
    "ts_survival_kaplan_meier",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec
      FROM events
    ), bounds AS (
      SELECT max(sec) AS obs_end FROM ev
    ), users AS (
      SELECT user_id, min(sec) AS first_sec,
             min(CASE WHEN event_type = 'purchase' THEN sec END) AS purch_sec
      FROM ev GROUP BY user_id
    ), durations AS (
      SELECT user_id,
             CASE WHEN purch_sec IS NOT NULL
                  THEN (purch_sec - first_sec) // 86400
                  ELSE (obs_end - first_sec) // 86400 END AS t,
             CASE WHEN purch_sec IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM users, bounds
    ), total AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM durations),
    daily AS (
      SELECT t, CAST(sum(ev) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS leave_t
      FROM durations GROUP BY t
    ), risk AS (
      SELECT t, d,
             n_users - CAST(coalesce(sum(leave_t) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS n_risk
      FROM daily, total
    ), series AS (
      SELECT list(CAST(n_risk - d AS DOUBLE) / n_risk ORDER BY t) AS f,
             list(t ORDER BY t) AS ts_list,
             list(d ORDER BY t) AS d_list,
             list(n_risk ORDER BY t) AS n_list
      FROM risk
    ), e AS (
      SELECT unnest(range(1, len(f) + 1)) AS i, f, ts_list, d_list, n_list
      FROM series
    )
    SELECT CAST(ts_list[CAST(i AS INTEGER)] AS BIGINT) AS t_days,
           CAST(d_list[CAST(i AS INTEGER)] AS BIGINT) AS d_events,
           CAST(n_list[CAST(i AS INTEGER)] AS BIGINT) AS n_at_risk,
           round(list_reduce(f[1:CAST(i AS INTEGER)], (a, x) -> a * x), 6)
             AS km_survival
    FROM e
    ORDER BY t_days
    """,
)
def ts_survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival estimate of time-to-first-purchase with
    RIGHT-CENSORING — the churn/conversion statistic a naive
    'average days to purchase over converters' gets wrong, because
    users who never purchased carry information (they survived at
    least their observation window) and dropping them biases the curve
    optimistic. Each user contributes a duration from first activity
    to first purchase (event) or to the observation end (censored);
    S(t) = Π_{s≤t} (n_s − d_s)/n_s over event days. The product is an
    ORDER-SENSITIVE IEEE fold, handled like the EWMA/Holt precedent:
    per-day factors are assembled once (|days| rows — the only window
    orders days, users shuffle once into durations), then each day
    folds its prefix with identical scalar arithmetic in both engines,
    6 dp. Reference analog: none — time-series extension (SURVEY.md
    §2.2)."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id",
        "event_type",
        F.unix_timestamp("ts").cast("bigint").alias("sec"),
    )
    obs_end = ev.agg(F.max("sec").alias("obs_end"))
    users = ev.groupBy("user_id").agg(
        F.min("sec").alias("first_sec"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("sec"))).alias(
            "purch_sec"
        ),
    )
    durations = users.crossJoin(F.broadcast(obs_end)).select(
        "user_id",
        F.when(
            F.col("purch_sec").isNotNull(),
            F.expr("(purch_sec - first_sec) DIV 86400"),
        )
        .otherwise(F.expr("(obs_end - first_sec) DIV 86400"))
        .alias("t"),
        F.when(F.col("purch_sec").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    total = durations.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    daily = durations.groupBy("t").agg(
        F.sum("ev").cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("leave_t"),
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = daily.crossJoin(F.broadcast(total)).select(
        "t",
        "d",
        (
            F.col("n_users")
            - F.coalesce(F.sum("leave_t").over(w), F.lit(0))
        ).cast("long").alias("n_risk"),
    ).localCheckpoint(eager=True)  # |days| rows, read once downstream
    series = risk.groupBy().agg(
        F.sort_array(F.collect_list(F.struct("t", "d", "n_risk"))).alias("rows")
    )
    exploded = series.select(
        F.transform(
            "rows", lambda r: (r.n_risk - r.d).cast("double") / r.n_risk
        ).alias("f"),
        F.transform("rows", lambda r: r.t).alias("ts_list"),
        F.transform("rows", lambda r: r.d).alias("d_list"),
        F.transform("rows", lambda r: r.n_risk).alias("n_list"),
        F.posexplode(F.sequence(F.lit(1), F.size("rows"))).alias("_p", "i"),
    )
    km = F.aggregate(
        F.slice("f", 1, F.col("i")), F.lit(1.0), lambda a, x: a * x
    )
    return (
        exploded.select(
            F.element_at("ts_list", F.col("i")).cast("bigint").alias("t_days"),
            F.element_at("d_list", F.col("i")).cast("bigint").alias("d_events"),
            F.element_at("n_list", F.col("i")).cast("bigint").alias("n_at_risk"),
            F.round(km, 6).alias("km_survival"),
        )
        .orderBy("t_days")
    )


@query(
    "events_ab_cuped_adjustment",
    oracle="""
    WITH u AS (
      SELECT user_id, user_id % 2 AS variant,
             CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                       AND day(ts) <= 15
                       THEN CAST(round(value * 100) AS BIGINT) // 100 END), 0)
                  AS BIGINT) AS x,
             CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                       AND day(ts) > 15
                       THEN CAST(round(value * 100) AS BIGINT) // 100 END), 0)
                  AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ), g AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(x AS HUGEINT) * y) AS sxy
      FROM u
    ), arm AS (
      SELECT variant, CAST(count(*) AS BIGINT) AS n_a,
             CAST(sum(x) AS BIGINT) AS sx_a, CAST(sum(y) AS BIGINT) AS sy_a
      FROM u GROUP BY variant
    )
    SELECT variant, n_a,
           CAST(1000 * sy_a // n_a AS BIGINT) AS raw_mean_milli,
           CAST((1000 * (sy_a * n * (n * sxx - sx * sx)
                         - (n * sxy - sx * sy) * (n * sx_a - n_a * sx)))
                // (n_a * n * (n * sxx - sx * sx)) AS BIGINT)
             AS cuped_mean_milli,
           CAST(10000 * (n * sxy - sx * sy) // (n * sxx - sx * sx) AS BIGINT)
             AS theta_bp
    FROM arm, g
    ORDER BY variant
    """,
)
def events_ab_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for the A/B readout (Deng et al., WSDM
    2013 — the adjustment every large experimentation platform applies
    before calling a winner): each arm's experiment-period revenue mean
    is debiased by the pooled regression on PRE-period revenue,
    adj = Ȳ_a − θ(X̄_a − X̄), θ = cov(X,Y)/var(X) — pre-period
    imbalance between arms (which pure randomization leaves behind at
    finite n) stops masquerading as treatment effect, typically cutting
    readout variance ~40-50%. Exactness discipline: θ is never
    materialized as a float — every mean and θ fold into ONE integer
    rational with common denominator n_a·n·D (D = n·Sxx−Sx², sums in
    HUGEINT/DECIMAL(38,0), revenue coarsened to whole units for
    headroom), truncated to milli-units, so both engines hash the
    adjusted means exactly. One pass builds per-user (x, y); one tiny
    global and one per-arm aggregate follow — events are read once.
    Pairs with events_ab_conversion (the unadjusted readout) and
    quality_key_skew_gini (the pre-flight). Reference analog: none —
    analytics extension (SURVEY.md §2.2)."""
    events = load_table(spark, "events", sf_dir)
    units = (F.round(F.col("value") * 100).cast("bigint") / 100).cast("bigint")
    is_p = F.col("event_type") == "purchase"
    u = events.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.when(is_p & (F.dayofmonth("ts") <= 15), units)), F.lit(0)
        ).cast("long").alias("x"),
        F.coalesce(
            F.sum(F.when(is_p & (F.dayofmonth("ts") > 15), units)), F.lit(0)
        ).cast("long").alias("y"),
    ).withColumn("variant", F.col("user_id") % 2)
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    g = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(dec("x") * F.col("x")).alias("sxx"),
        F.sum(dec("x") * F.col("y")).alias("sxy"),
    )
    arm = u.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n_a"),
        F.sum("x").cast("long").alias("sx_a"),
        F.sum("y").cast("long").alias("sy_a"),
    )
    return (
        arm.crossJoin(F.broadcast(g))
        .select(
            "variant",
            "n_a",
            F.expr("CAST(1000 * sy_a DIV n_a AS BIGINT)").alias("raw_mean_milli"),
            F.expr(
                "CAST((1000 * (sy_a * n * (n * sxx - sx * sx)"
                " - (n * sxy - sx * sy) * (n * sx_a - n_a * sx)))"
                " DIV (n_a * n * (n * sxx - sx * sx)) AS BIGINT)"
            ).alias("cuped_mean_milli"),
            F.expr(
                "CAST(10000 * (n * sxy - sx * sy)"
                " DIV (n * sxx - sx * sx) AS BIGINT)"
            ).alias("theta_bp"),
        )
        .orderBy("variant")
    )


@query(
    "events_markov_prediction_eval",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst,
             day(ts) <= 20 AS train
      FROM events
    ), pairs AS (
      SELECT src, dst, train FROM seq WHERE dst IS NOT NULL
    ), model AS (
      SELECT src, dst, CAST(count(*) AS BIGINT) AS n
      FROM pairs WHERE train GROUP BY src, dst
    ), pred AS (
      SELECT src, dst AS predicted
      FROM (SELECT src, dst,
                   row_number() OVER (PARTITION BY src
                                      ORDER BY n DESC, dst) AS rn
            FROM model)
      WHERE rn = 1
    )
    SELECT p.src,
           max(pr.predicted) AS predicted,
           CAST(count(*) AS BIGINT) AS n_eval,
           CAST(sum(CASE WHEN p.dst = pr.predicted THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(sum(CASE WHEN p.dst = pr.predicted THEN 1 ELSE 0 END)
                * 10000 // count(*) AS BIGINT) AS accuracy_bp
    FROM pairs p JOIN pred pr ON pr.src = p.src
    WHERE NOT p.train
    GROUP BY p.src
    ORDER BY p.src
    """,
)
def events_markov_prediction_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-event prediction backtest: the first-order Markov model the
    path-transition query implies (argmax next event per source,
    trained on days ≤ 20) scored on the HELD-OUT tail — top-1 accuracy
    per source state in basis points, against the majority-class
    baseline each row implicitly carries (n_correct/n_eval of the
    argmax IS the baseline any sequence model must beat, the
    sequence-modeling sibling of ts_forecast_snaive_eval). Temporal
    split, not random: evaluating a sequence model on interleaved
    history leaks the future. One per-user window shuffle shared by
    train and eval legs (the split is a projection off the same lead()
    pass), one tiny model aggregate, broadcast argmax join — events
    read once. Ties in the argmax break lexicographically so both
    engines pick the same prediction. Reference analog: none —
    analytics extension (SURVEY.md §2.2)."""
    events = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
        (F.dayofmonth("ts") <= 20).alias("train"),
    ).filter(F.col("dst").isNotNull())
    model = (
        seq.filter("train")
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wr = Window.partitionBy("src").orderBy(F.desc("n"), F.asc("dst"))
    pred = (
        model.withColumn("rn", F.row_number().over(wr))
        .filter("rn = 1")
        .select("src", F.col("dst").alias("predicted"))
    )
    return (
        seq.filter(~F.col("train"))
        .join(F.broadcast(pred), "src")
        .groupBy("src")
        .agg(
            F.max("predicted").alias("predicted"),
            F.count(F.lit(1)).cast("long").alias("n_eval"),
            F.sum((F.col("dst") == F.col("predicted")).cast("int"))
            .cast("long")
            .alias("n_correct"),
            F.expr(
                "CAST(sum(CASE WHEN dst = predicted THEN 1 ELSE 0 END)"
                " * 10000 DIV count(*) AS BIGINT)"
            ).alias("accuracy_bp"),
        )
        .orderBy("src")
    )


_HW_L0 = "(list_reduce(s[1:7], (a,b) -> a + b) / 7.0)"
_HW_B0 = (
    "((list_reduce(s[8:14], (a,b) -> a + b)"
    " - list_reduce(s[1:7], (a,b) -> a + b)) / 49.0)"
)
# inlined recursive step (DuckDB cannot reference a computed alias in the
# same SELECT, the Holt-linear precedent): LNEW appears verbatim inside
# bnew and snew so both engines run the IDENTICAL IEEE expression tree.
_HW_LNEW = (
    "(0.3 * (s[CAST(i + 1 AS INTEGER)] - sv[CAST((i % 7) + 1 AS INTEGER)])"
    " + 0.7 * (l + b))"
)


@query(
    "ts_holt_winters_additive",
    oracle=f"""
    WITH RECURSIVE daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ), series AS (
      SELECT event_type,
             list(CAST(cents AS DOUBLE) ORDER BY day) AS s,
             list(day ORDER BY day) AS days
      FROM daily GROUP BY event_type
      HAVING count(*) >= 15
    ), st AS (
      SELECT event_type, s, days, CAST(7 AS BIGINT) AS i,
             {_HW_L0} AS l, {_HW_B0} AS b,
             list_transform(range(1, 8), j -> s[j] - {_HW_L0}) AS sv
      FROM series
      UNION ALL
      SELECT event_type, s, days, i + 1,
             {_HW_LNEW} AS l,
             0.2 * ({_HW_LNEW} - l) + 0.8 * b AS b,
             list_transform(range(1, 8), j -> CASE
               WHEN j = (i % 7) + 1
               THEN 0.4 * (s[CAST(i + 1 AS INTEGER)] - {_HW_LNEW})
                    + 0.6 * sv[CAST((i % 7) + 1 AS INTEGER)]
               ELSE sv[j] END) AS sv
      FROM st WHERE i < len(s)
    )
    SELECT event_type, days[CAST(i AS INTEGER)] AS day,
           CAST(s[CAST(i AS INTEGER)] AS BIGINT) AS cents,
           round(l, 6) AS level,
           round(b, 6) AS trend,
           round(sv[CAST(((i - 1) % 7) + 1 AS INTEGER)], 6) AS seasonal,
           round(l + b + sv[CAST((i % 7) + 1 AS INTEGER)], 6)
             AS forecast_next
    FROM st WHERE i >= 8
    ORDER BY event_type, day
    """,
)
def ts_holt_winters_additive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters ADDITIVE (triple-exponential) smoothing of daily
    revenue per event type — the seasonal member that completes the
    classical smoothing family (EWMA -> Holt linear -> Holt-Winters,
    judged against ts_forecast_snaive_eval's baseline): level, trend,
    and a 7-slot positional seasonal vector evolve as the coupled fold
    l_t = alpha(x_t - s_prev) + (1-alpha)(l+b), b_t = beta(l_t - l) +
    (1-beta)b, s_t = gamma(x_t - l_t) + (1-gamma)s_prev (alpha=.3,
    beta=.2, gamma=.4; textbook init l=mean of week 1, b=(week2-week1)
    mean difference / 49, s_i = x_i - l over the first week). Seasonal
    slots are POSITIONAL (index mod 7, the textbook series treatment),
    so gaps never make the two engines disagree about a slot. Like the
    EWMA/Holt precedents the fold is order-sensitive: each day folds
    its prefix with the IDENTICAL inlined IEEE expression tree the
    oracle's recursive CTE iterates (l_new inlined into b_new and
    s_new — neither engine can reference a computed alias mid-SELECT),
    so the whole running (level, trend, seasonal) STATE hash-matches
    at 6 dp. The only shuffle is the daily rollup; the quadratic
    prefix fold is a few thousand flops over |days| per type."""
    events = load_table(spark, "events", sf_dir)
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(_CENTS("value")).cast("long").alias("cents"))
    series = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "cents"))).alias("rows")
    ).filter(F.size("rows") >= 15)
    exploded = series.select(
        "event_type",
        F.transform("rows", lambda r: r.cents.cast("double")).alias("s"),
        F.transform("rows", lambda r: r.day).alias("days"),
        F.posexplode(F.sequence(F.lit(8), F.size("rows"))).alias("_p", "i"),
    )
    # pairs[t-7] = (x_t, seasonal slot of t) for t in 8..n; row i folds
    # the prefix pairs[1 .. i-7] from the week-1 initial state
    lnew = (
        "(0.3 * (p.x - element_at(acc.sv, p.slot))"
        " + 0.7 * (acc.l + acc.b))"
    )
    st = F.expr(
        f"""
        aggregate(
          slice(
            transform(sequence(8, size(s)),
                      t -> struct(element_at(s, t) AS x,
                                  CAST((t - 1) % 7 + 1 AS INT) AS slot)),
            1, i - 7),
          struct(
            CAST(aggregate(slice(s, 1, 7), cast(0 as double),
                           (a, v) -> a + v) / 7.0 AS DOUBLE) AS l,
            CAST((aggregate(slice(s, 8, 7), cast(0 as double), (a, v) -> a + v)
                  - aggregate(slice(s, 1, 7), cast(0 as double), (a, v) -> a + v))
                 / 49.0 AS DOUBLE) AS b,
            transform(sequence(1, 7),
                      j -> element_at(s, j)
                           - aggregate(slice(s, 1, 7), cast(0 as double),
                                       (a, v) -> a + v) / 7.0) AS sv),
          (acc, p) -> struct(
            CAST({lnew} AS DOUBLE) AS l,
            CAST(0.2 * ({lnew} - acc.l) + 0.8 * acc.b AS DOUBLE) AS b,
            transform(sequence(1, 7),
                      j -> IF(j = p.slot,
                              0.4 * (p.x - {lnew})
                              + 0.6 * element_at(acc.sv, p.slot),
                              element_at(acc.sv, j))) AS sv))
        """
    )
    return (
        exploded.select(
            "event_type",
            F.element_at("days", F.col("i")).alias("day"),
            F.element_at("s", F.col("i")).cast("bigint").alias("cents"),
            st.alias("st"),
            F.col("i"),
        )
        .select(
            "event_type",
            "day",
            "cents",
            F.round(F.col("st.l"), 6).alias("level"),
            F.round(F.col("st.b"), 6).alias("trend"),
            F.round(
                F.element_at(F.col("st.sv"), ((F.col("i") - 1) % 7 + 1).cast("int")),
                6,
            ).alias("seasonal"),
            F.round(
                F.col("st.l")
                + F.col("st.b")
                + F.element_at(F.col("st.sv"), (F.col("i") % 7 + 1).cast("int")),
                6,
            ).alias("forecast_next"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "events_uplift_by_decile",
    oracle="""
    WITH users AS (
      SELECT user_id, user_id % 2 AS variant,
             CAST(count(*) FILTER (WHERE event_type IN ('view', 'click'))
                  AS BIGINT) AS score,
             CAST(count(*) FILTER (WHERE event_type = 'purchase') > 0
                  AS INTEGER) AS converted
      FROM events GROUP BY user_id
    ), ranked AS (
      SELECT *, ntile(10) OVER (ORDER BY score DESC, user_id) AS decile
      FROM users
    ), per AS (
      SELECT decile,
             CAST(count(*) FILTER (WHERE variant = 1) AS BIGINT) AS t_n,
             CAST(sum(converted) FILTER (WHERE variant = 1) AS BIGINT) AS t_conv,
             CAST(count(*) FILTER (WHERE variant = 0) AS BIGINT) AS c_n,
             CAST(sum(converted) FILTER (WHERE variant = 0) AS BIGINT) AS c_conv
      FROM ranked GROUP BY decile
    ), cum AS (
      SELECT decile, t_n, t_conv, c_n, c_conv,
             sum(t_n) OVER w AS ct_n, sum(t_conv) OVER w AS ct_conv,
             sum(c_n) OVER w AS cc_n, sum(c_conv) OVER w AS cc_conv
      FROM per WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING)
    )
    SELECT decile, t_n, t_conv, c_n, c_conv,
           CAST(10000 * (t_conv * c_n - c_conv * t_n) // (t_n * c_n)
                AS BIGINT) AS uplift_bp,
           CAST(10000 * (ct_conv * cc_n - cc_conv * ct_n) // (ct_n * cc_n)
                AS BIGINT) AS cum_uplift_bp
    FROM cum
    ORDER BY decile
    """,
)
def events_uplift_by_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uplift-by-decile (Qini-style targeting readout) — what the A/B
    family reports when the question moves from "did the treatment
    win overall" (events_ab_conversion, CUPED) to "WHOM should we
    treat": users rank into deciles by a PRE-treatment engagement
    score (view/click volume — never the purchase outcome, the
    leakage discipline of events_feature_asof_training), and each
    decile compares treated vs control conversion as an exact integer
    cross-multiplication in basis points, plus the cumulative curve
    the targeting cutoff is read from. ntile is deterministic under
    its total order (score desc, user_id — the RFM precedent); both
    engines truncate the signed uplift toward zero (the Mann-Kendall
    division verification). One per-user aggregate, one 10-row window
    — events shuffle once, and the decile assignment is the
    distributed gains-deciles decomposition (r14: per-score-group
    row_number + cumulative base rank over |distinct scores| — scores
    are small-integer engagement counts — + closed-form ntile), not a
    single-partition |users|-row sort."""
    from pyspark.sql import Window as W

    from log2sql_spark.operators.ranks import distributed_global_rank, ntile_from_rank

    events = load_table(spark, "events", sf_dir)
    users = events.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type").isin("view", "click"), 1))
        .cast("long")
        .alias("score"),
        (F.count(F.when(F.col("event_type") == "purchase", 1)) > 0)
        .cast("int")
        .alias("converted"),
    ).withColumn("variant", F.col("user_id") % 2)
    n_total = users.agg(F.count(F.lit(1)).alias("n_total"))
    ranked = (
        distributed_global_rank(
            users, "score", ["user_id"], descending=True, out="rank"
        )
        .crossJoin(F.broadcast(n_total))
        .withColumn("decile", ntile_from_rank(F.col("rank"), F.col("n_total"), 10))
    )
    per = ranked.groupBy("decile").agg(
        F.count(F.when(F.col("variant") == 1, 1)).cast("long").alias("t_n"),
        F.sum(F.when(F.col("variant") == 1, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("t_conv"),
        F.count(F.when(F.col("variant") == 0, 1)).cast("long").alias("c_n"),
        F.sum(F.when(F.col("variant") == 0, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("c_conv"),
    )
    wc = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    cum = per.select(
        "decile", "t_n", "t_conv", "c_n", "c_conv",
        F.sum("t_n").over(wc).alias("ct_n"),
        F.sum("t_conv").over(wc).alias("ct_conv"),
        F.sum("c_n").over(wc).alias("cc_n"),
        F.sum("c_conv").over(wc).alias("cc_conv"),
    )
    return cum.select(
        "decile", "t_n", "t_conv", "c_n", "c_conv",
        F.expr("10000 * (t_conv * c_n - c_conv * t_n) DIV (t_n * c_n)")
        .cast("bigint")
        .alias("uplift_bp"),
        F.expr("10000 * (ct_conv * cc_n - cc_conv * ct_n) DIV (ct_n * cc_n)")
        .cast("bigint")
        .alias("cum_uplift_bp"),
    ).orderBy("decile")


@query(
    "ts_window_tvf_hourly",
    oracle="""
    SELECT event_type,
           date_trunc('hour', ts) AS win_start,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events
    WHERE user_id < 500
    GROUP BY 1, 2
    ORDER BY event_type, win_start
    """,
)
def ts_window_tvf_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``window()`` time-bucketing TVF in BATCH mode — the same
    construct the streaming queries aggregate on (stream_tumbling_window
    etc.), applied to a static frame: one API for both executions is
    the Structured Streaming premise (batch ≡ streaming), and using it
    here proves the tumbling bucket assignment itself is
    engine-deterministic (the window START equals date_trunc for
    aligned 1-hour tumbles, which is exactly what the oracle checks).
    Plain map-side-combined hash aggregate; the TVF adds no shuffle."""
    events = load_table(spark, "events", sf_dir).filter(F.col("user_id") < 500)
    return (
        events.groupBy(
            "event_type", F.window("ts", "1 hour").alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_CENTS("value")).cast("bigint").alias("cents"),
        )
        .select(
            "event_type",
            F.col("w.start").alias("win_start"),
            "n",
            "cents",
        )
        .orderBy("event_type", "win_start")
    )


@query(
    "ts_twap_time_weighted",
    oracle="""
    WITH pts AS (
      SELECT user_id, event_type, epoch_ms(ts) AS t_ms,
             CAST(round(value * 100) AS BIGINT) AS cents, event_id
      FROM events WHERE user_id < 200
    ),
    seg AS (
      SELECT user_id, event_type, cents,
             lead(t_ms) OVER (
               PARTITION BY user_id, event_type ORDER BY t_ms, event_id
             ) - t_ms AS dt_ms
      FROM pts
    ),
    per_user AS (
      SELECT user_id, event_type,
             CAST(sum(cents * dt_ms) // sum(dt_ms) AS BIGINT) AS twap_cents
      FROM seg WHERE dt_ms IS NOT NULL AND dt_ms > 0
      GROUP BY user_id, event_type
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(twap_cents) AS BIGINT) AS sum_twap_cents,
           CAST(min(twap_cents) AS BIGINT) AS min_twap_cents,
           CAST(max(twap_cents) AS BIGINT) AS max_twap_cents
    FROM per_user
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def ts_twap_time_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TimescaleDB ``time_weight('LOCF', ...)``
    analog): each observation's value holds until the key's next
    observation, so the average weights every value by how long it was
    current — the correct mean for irregularly-sampled signals, where a
    plain avg() overweights chatty periods. Exact integer arithmetic
    end-to-end (epoch-millisecond deltas x integer cents; floor
    division — all terms non-negative so Spark's ``div`` and DuckDB's
    ``//`` agree), so the hash matches cross-engine. ONE shuffle on the
    (user, type) key feeds both the lead() window and the per-user
    aggregate; keys are narrow, so the windows parallelize across the
    key space at any scale — nothing accumulates per-partition state
    beyond a single lookahead row."""
    events = load_table(spark, "events", sf_dir).filter(F.col("user_id") < 200)
    w = Window.partitionBy("user_id", "event_type").orderBy("t_ms", "event_id")
    seg = events.select(
        "user_id",
        "event_type",
        # ts is TIMESTAMP_NTZ; session TZ is pinned UTC (load_table), so
        # the cast is a lossless reinterpretation for unix_millis
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms"),
        _CENTS("value").alias("cents"),
        "event_id",
    ).withColumn("dt_ms", F.lead("t_ms").over(w) - F.col("t_ms"))
    per_user = (
        seg.filter(F.col("dt_ms").isNotNull() & (F.col("dt_ms") > 0))
        .groupBy("user_id", "event_type")
        .agg(
            F.expr("sum(cents * dt_ms) div sum(dt_ms)")
            .cast("bigint")
            .alias("twap_cents")
        )
    )
    return (
        per_user.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("twap_cents").alias("sum_twap_cents"),
            F.min("twap_cents").alias("min_twap_cents"),
            F.max("twap_cents").alias("max_twap_cents"),
        )
        .orderBy("event_type")
    )


@query(
    "ts_ols_trend_by_type",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '1992-01-01', CAST(date_trunc('day', ts) AS DATE))
               AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM events
      GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT) AS slope_num,
           CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT) AS slope_den,
           CAST(sum(y) * sum(x * x) - sum(x) * sum(x * y) AS BIGINT)
             AS intercept_num
    FROM daily
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def ts_ols_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares trend over the daily event
    series, as EXACT integer rationals: slope = slope_num/slope_den and
    intercept = intercept_num/slope_den from the closed-form normal
    equations (n·Σxy − Σx·Σy over n·Σx² − (Σx)²). Emitting numerator
    and denominator instead of regr_slope()'s double keeps the result
    hash-identical cross-engine AND avoids the negative-slope
    floor-vs-truncate divergence between the engines' integer
    divisions. Two map-side-combined aggregates (day rollup, then the
    five OLS sums per group) — the same one-pass sufficient-statistics
    shape regr_slope uses internally, so it scales like any count(*)
    rollup."""
    events = load_table(spark, "events", sf_dir)
    daily = events.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", "ts").cast("date"), F.lit("1992-01-01").cast("date")
        ).alias("x"),
    ).agg(F.count(F.lit(1)).alias("y"))
    n, sx, sy = F.count(F.lit(1)), F.sum("x"), F.sum("y")
    sxy, sxx = F.sum(F.col("x") * F.col("y")), F.sum(F.col("x") * F.col("x"))
    return (
        daily.groupBy("event_type")
        .agg(
            n.alias("n_days"),
            (n * sxy - sx * sy).cast("bigint").alias("slope_num"),
            (n * sxx - sx * sx).cast("bigint").alias("slope_den"),
            (sy * sxx - sx * sxy).cast("bigint").alias("intercept_num"),
        )
        .orderBy("event_type")
    )


@query(
    "events_threshold_crossing",
    oracle="""
    WITH cum AS (
      SELECT user_id, ts, event_id,
             sum(CAST(round(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS cum_cents
      FROM events WHERE event_type = 'purchase'
    ),
    first_cross AS (
      SELECT user_id, ts, cum_cents,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS rn
      FROM cum WHERE cum_cents >= 50000
    )
    SELECT date_trunc('day', ts) AS cross_day,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(cum_cents) AS BIGINT) AS sum_cents_at_cross
    FROM first_cross WHERE rn = 1
    GROUP BY 1
    ORDER BY cross_day
    """,
)
def events_threshold_crossing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-crossing analysis: the first moment each user's
    cumulative purchase value crosses $500, rolled up by crossing day —
    the LTV-milestone / paywall-trigger query. A running-sum window and
    a row_number pick over the SAME (user_id, ts, event_id) ordering,
    so Catalyst evaluates both in one window stage after ONE shuffle on
    user_id; the event_id tie-break makes the first-crossing row unique
    under same-timestamp purchases, keeping both engines' pick
    identical. Integer cents keep the running sum exact. Per-user
    window state is a single accumulator — nothing grows with history
    length, so the shape holds on years of events."""
    events = load_table(spark, "events", sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = events.select(
        "user_id", "ts", "event_id",
        F.sum(_CENTS("value")).over(w).alias("cum_cents"),
    )
    first_cross = (
        cum.filter(F.col("cum_cents") >= 50000)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return (
        first_cross.groupBy(
            F.date_trunc("day", "ts").alias("cross_day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("cum_cents").alias("sum_cents_at_cross"),
        )
        .orderBy("cross_day")
    )


@query(
    "ts_interval_union_coverage",
    oracle="""
    WITH iv AS (
      SELECT user_id, epoch_ms(ts) AS s, epoch_ms(ts) + 600000 AS e, event_id
      FROM events WHERE user_id < 100
    ),
    swept AS (
      SELECT user_id, s, e,
             max(e) OVER (
               PARTITION BY user_id ORDER BY s, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_max_e
      FROM iv
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(greatest(0, e - greatest(s, coalesce(prev_max_e, s))))
                AS BIGINT) AS covered_ms
    FROM swept
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def ts_interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union length per user (total ACTIVE time, overlaps
    counted once): every event opens a 10-minute activity interval;
    the union's measure is computed by the sweep-line identity —
    contribution = max(0, end − max(start, latest end seen so far)) —
    with 'seen so far' as a running-max window, NOT a self-join (the
    textbook overlap join is O(n²) per user). ONE shuffle on user_id
    feeds the sweep and the rollup; per-row state is a single running
    maximum, so the shape is as scalable as a cumulative sum. Exact
    epoch-millisecond integers end-to-end."""
    events = load_table(spark, "events", sf_dir).filter(F.col("user_id") < 100)
    iv = events.select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("s"),
        (F.unix_millis(F.col("ts").cast("timestamp")) + 600000).alias("e"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    swept = iv.withColumn("prev_max_e", F.max("e").over(w))
    return (
        swept.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum(
                F.greatest(
                    F.lit(0).cast("long"),
                    F.col("e") - F.greatest(
                        F.col("s"), F.coalesce(F.col("prev_max_e"), F.col("s"))
                    ),
                )
            ).alias("covered_ms"),
        )
        .orderBy("user_id")
    )


@query(
    "ts_gapfill_interpolate_linear",
    oracle="""
    WITH purchases AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events
      WHERE event_type = 'purchase' AND user_id < 20
      GROUP BY 1, 2
    ),
    spans AS (
      SELECT user_id, min(day) AS d0, max(day) AS d1 FROM purchases GROUP BY 1
    ),
    dense AS (
      SELECT s.user_id, gs.day AS day
      FROM spans s, LATERAL (
        SELECT unnest(generate_series(s.d0, s.d1, INTERVAL 1 DAY)) AS day
      ) gs
    ),
    anchored AS (
      SELECT d.user_id, d.day, p.cents,
             last_value(p.cents IGNORE NULLS) OVER wback AS prev_c,
             last_value(CASE WHEN p.cents IS NOT NULL THEN d.day END
                        IGNORE NULLS) OVER wback AS prev_d,
             first_value(p.cents IGNORE NULLS) OVER wfwd AS next_c,
             first_value(CASE WHEN p.cents IS NOT NULL THEN d.day END
                         IGNORE NULLS) OVER wfwd AS next_d
      FROM dense d LEFT JOIN purchases p USING (user_id, day)
      WINDOW
        wback AS (PARTITION BY d.user_id ORDER BY d.day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wfwd AS (PARTITION BY d.user_id ORDER BY d.day
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, day,
           CAST(CASE WHEN cents IS NOT NULL THEN cents
                ELSE prev_c + (
                  (next_c - prev_c) * date_diff('day', prev_d, day)
                  - ((((next_c - prev_c) * date_diff('day', prev_d, day))
                      % date_diff('day', prev_d, next_d)
                      + date_diff('day', prev_d, next_d))
                     % date_diff('day', prev_d, next_d))
                ) / date_diff('day', prev_d, next_d)
           END AS BIGINT) AS cents_interp
    FROM anchored
    ORDER BY user_id, day
    """,
)
def ts_gapfill_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling with LINEAR interpolation (TimescaleDB
    ``interpolate()``, the pair of ts_gapfill_locf): densify each
    user's daily purchase series, then fill each gap day from its two
    anchor observations — prev + (next−prev)·Δdays/gap. The division
    is an explicit FLOOR division built from the shared truncating %
    ((a%b+b)%b, b>0), because the numerator goes negative on downward
    slopes and Spark's ``div`` truncates where DuckDB's ``//`` floors —
    the one integer-arithmetic divergence between the engines, papered
    over once here so every value hashes identically. Same scalable
    shape as LOCF: per-user sequence+explode (no global calendar cross
    join), one shuffle for the agg, one window stage computing all four
    anchors (two frame directions over the same ordering)."""
    events = load_table(spark, "events", sf_dir)
    purchases = (
        events.filter((F.col("event_type") == "purchase") & (F.col("user_id") < 20))
        .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(F.sum(_CENTS("value")).alias("cents"))
    )
    dense = (
        purchases.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
        )
    )
    wback = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wfwd = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("cents").isNotNull(), F.col("day"))
    anchored = (
        dense.join(purchases, ["user_id", "day"], "left")
        .select(
            "user_id", "day", "cents",
            F.last("cents", ignorenulls=True).over(wback).alias("prev_c"),
            F.last(obs_day, ignorenulls=True).over(wback).alias("prev_d"),
            F.first("cents", ignorenulls=True).over(wfwd).alias("next_c"),
            F.first(obs_day, ignorenulls=True).over(wfwd).alias("next_d"),
        )
    )
    num = (F.col("next_c") - F.col("prev_c")) * F.expr("datediff(day, prev_d)")
    den = F.expr("datediff(next_d, prev_d)")
    floor_div = (num - ((num % den + den) % den)) / den
    return anchored.select(
        "user_id",
        "day",
        F.when(F.col("cents").isNotNull(), F.col("cents"))
        .otherwise(F.col("prev_c") + floor_div)
        .cast("bigint")
        .alias("cents_interp"),
    ).orderBy("user_id", "day")


@query(
    "ts_max_drawdown",
    oracle="""
    WITH flows AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100) AS BIGINT)
                  ELSE -CAST(round(value * 100) AS BIGINT) END AS cents
      FROM events WHERE event_type IN ('purchase', 'error')
    ), curve AS (
      SELECT user_id, ts, event_id,
             sum(cents) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS cum
      FROM flows
    ), dd AS (
      SELECT user_id, cum,
             max(cum) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) - cum AS drawdown
      FROM curve
    )
    SELECT user_id,
           CAST(max(drawdown) AS BIGINT) AS max_drawdown_cents,
           CAST(max(cum) AS BIGINT) AS peak_cents,
           CAST(count(*) AS BIGINT) AS n_flows
    FROM dd
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def ts_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user over a signed cash-flow curve
    (purchases credit, errors debit — the refund/chargeback model):
    the classic peak-to-trough risk metric. Two stacked window
    functions — running sum, then running max — share the SAME
    (user_id, ts, event_id) window spec, so Catalyst plans ONE shuffle
    on user_id and evaluates both in a single window stage; the final
    per-user aggregate reuses that partitioning. Integer cents
    throughout (drawdowns subtract exactly). Scale shape: per-user
    window state is two accumulators regardless of history length, and
    users partition freely across executors — no global ordering
    anywhere."""
    events = load_table(spark, "events", sf_dir).filter(
        F.col("event_type").isin("purchase", "error")
    )
    flows = events.select(
        "user_id", "ts", "event_id",
        F.when(F.col("event_type") == "purchase", _CENTS("value"))
        .otherwise(-_CENTS("value"))
        .alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    curve = flows.select(
        "user_id", "ts", "event_id", F.sum("cents").over(w).alias("cum")
    )
    dd = curve.select(
        "user_id", "cum", (F.max("cum").over(w) - F.col("cum")).alias("drawdown")
    )
    return (
        dd.groupBy("user_id")
        .agg(
            F.max("drawdown").alias("max_drawdown_cents"),
            F.max("cum").alias("peak_cents"),
            F.count(F.lit(1)).alias("n_flows"),
        )
        .orderBy("user_id")
    )


@query(
    "events_did_estimator",
    oracle="""
    WITH cells AS (
      SELECT CAST(user_id % 2 = 0 AS INT) AS treated,
             CAST(ts >= TIMESTAMP '2024-01-16' AS INT) AS post,
             CAST(count(*) AS BIGINT) AS n_purchases,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2
    ), means AS (
      SELECT treated, post, n_purchases, sum_cents,
             sum_cents * 10000 // n_purchases AS mean_cents_e4
      FROM cells
    )
    SELECT treated, post, n_purchases, sum_cents, mean_cents_e4,
           CAST(sum(
             CASE WHEN treated = post THEN mean_cents_e4
                  ELSE -mean_cents_e4 END
           ) OVER () AS BIGINT) AS did_cents_e4
    FROM means
    ORDER BY treated, post
    """,
)
def events_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimator over the purchase stream:
    treatment = even user_id, post = second half of the month; the DiD
    effect on mean purchase value is (T_post − T_pre) − (C_post −
    C_pre), which is exactly sum(sign · mean) with sign = +1 when
    treated == post. Per-cell means are integer 1e-4-cents via
    truncating division (both engines truncate identically on positive
    operands), so the estimator is an exact integer — no float means,
    no cross-engine rounding drift. One aggregate over 4 groups plus a
    4-row window: the heavy work is a single map-side-combinable
    groupBy; the window runs on 4 rows. The 2×2 cell layout (not one
    collapsed row) keeps each cell's n/sum auditable."""
    events = load_table(spark, "events", sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    cells = (
        events.groupBy(
            (F.col("user_id") % 2 == 0).cast("int").alias("treated"),
            (F.col("ts") >= F.lit("2024-01-16").cast("timestamp"))
            .cast("int")
            .alias("post"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(_CENTS("value")).alias("sum_cents"),
        )
        .withColumn(
            "mean_cents_e4",
            F.expr("sum_cents * 10000 DIV n_purchases"),
        )
    )
    sign = F.when(F.col("treated") == F.col("post"), F.col("mean_cents_e4")).otherwise(
        -F.col("mean_cents_e4")
    )
    return (
        cells.withColumn(
            "did_cents_e4",
            F.sum(sign).over(Window.partitionBy(F.lit(1))).cast("long"),
        )
        .select(
            "treated", "post", "n_purchases", "sum_cents",
            "mean_cents_e4", "did_cents_e4",
        )
        .orderBy("treated", "post")
    )


@query(
    "events_ab_bootstrap_ci",
    oracle="""
    WITH weighted AS (
      SELECT b.b,
             CAST(user_id % 2 = 0 AS INT) AS treated,
             ((event_id * 2654435761 + b.b * 1013904223) % 4294967296) % 3
               AS w,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events, (SELECT unnest(range(64)) AS b) b
      WHERE event_type = 'purchase'
    ), cells AS (
      SELECT b, treated,
             CAST(sum(w) AS BIGINT) AS n_eff,
             CAST(sum(w * cents) AS BIGINT) AS sum_cents
      FROM weighted GROUP BY b, treated
    ), diffs AS (
      SELECT t.b,
             t.n_eff AS n_t, c.n_eff AS n_c,
             (t.sum_cents * 1000000 // t.n_eff)
               - (c.sum_cents * 1000000 // c.n_eff) AS diff_micro
      FROM cells t JOIN cells c ON t.b = c.b
      WHERE t.treated = 1 AND c.treated = 0
    ), ranked AS (
      SELECT b, n_t, n_c, diff_micro,
             row_number() OVER (ORDER BY diff_micro, b) AS rnk
      FROM diffs
    )
    SELECT b, n_t, n_c, diff_micro,
           CAST(max(CASE WHEN rnk = 2 THEN diff_micro END) OVER ()
                AS BIGINT) AS ci_lo_micro,
           CAST(max(CASE WHEN rnk = 63 THEN diff_micro END) OVER ()
                AS BIGINT) AS ci_hi_micro
    FROM ranked
    ORDER BY b
    """,
)
def events_ab_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for a treatment effect, the
    MapReduce way (Poisson/multiplier bootstrap): instead of B physical
    resamples, every purchase gets B=64 deterministic integer weights
    in {0,1,2} (mean 1) from a mixed-congruential hash of
    (event_id, replicate) — so all 64 'resamples' aggregate in ONE
    map-side-combinable groupBy whose shuffle carries 128 cell rows,
    never events, and the same pipeline runs unchanged on 100 TB. The
    effect per replicate is the treated-minus-control mean difference
    in integer micro-cents (truncating division); the 95% CI is a rank
    pick (2nd / 63rd order statistic) over the 64 replicate effects
    with a (diff, b) tie-break. Every value integer-exact cross-engine;
    the hash constants are chosen coprime to the modulus AND to 3 so
    the replicate term actually permutes the weight residues. True
    Poisson(1) weights differ only in tail probabilities; uniform{0,1,2}
    is the standard multiplier-bootstrap variant and keeps the weights
    derivable in pure SQL on both engines."""
    events = load_table(spark, "events", sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    b = spark.range(64).select(F.col("id").alias("b"))
    weighted = events.crossJoin(F.broadcast(b)).select(
        "b",
        (F.col("user_id") % 2 == 0).cast("int").alias("treated"),
        (
            (F.col("event_id") * F.lit(2654435761) + F.col("b") * F.lit(1013904223))
            % F.lit(4294967296)
            % F.lit(3)
        ).alias("w"),
        _CENTS("value").alias("cents"),
    )
    cells = weighted.groupBy("b", "treated").agg(
        F.sum("w").alias("n_eff"),
        F.sum(F.col("w") * F.col("cents")).alias("sum_cents"),
    )
    t = cells.filter(F.col("treated") == 1).select(
        "b", F.col("n_eff").alias("n_t"), F.col("sum_cents").alias("s_t")
    )
    c = cells.filter(F.col("treated") == 0).select(
        "b", F.col("n_eff").alias("n_c"), F.col("sum_cents").alias("s_c")
    )
    diffs = t.join(c, "b").select(
        "b", "n_t", "n_c",
        (
            F.expr("s_t * 1000000 DIV n_t") - F.expr("s_c * 1000000 DIV n_c")
        ).alias("diff_micro"),
    )
    ranked = diffs.withColumn(
        "rnk", F.row_number().over(Window.orderBy("diff_micro", "b"))
    )
    all_w = Window.partitionBy(F.lit(1))
    return (
        ranked.select(
            "b", "n_t", "n_c", "diff_micro",
            F.max(F.when(F.col("rnk") == 2, F.col("diff_micro")))
            .over(all_w)
            .cast("long")
            .alias("ci_lo_micro"),
            F.max(F.when(F.col("rnk") == 63, F.col("diff_micro")))
            .over(all_w)
            .cast("long")
            .alias("ci_hi_micro"),
        )
        .orderBy("b")
    )


@query(
    "ts_sax_symbolic",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events
      GROUP BY 1, 2
    ), paa AS (
      SELECT event_type,
             (day(d) - 1) // 5 AS seg,
             CAST(sum(cents) AS BIGINT) AS paa_cents
      FROM daily
      GROUP BY 1, 2
    ), tiled AS (
      SELECT event_type, seg, paa_cents,
             ntile(4) OVER (ORDER BY paa_cents, event_type, seg) AS tile
      FROM paa
    )
    SELECT event_type, seg, paa_cents,
           chr(CAST(96 + tile AS INT)) AS symbol,
           string_agg(chr(CAST(96 + tile AS INT)), '')
             OVER (PARTITION BY event_type ORDER BY seg
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND UNBOUNDED FOLLOWING) AS sax_word
    FROM tiled
    ORDER BY event_type, seg
    """,
)
def ts_sax_symbolic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization (Lin et al.'s Symbolic Aggregate approXimation,
    the equi-depth variant): each event type's 30-day revenue series is
    PAA-compressed into six 5-day segments (integer sums — no float
    means), then every segment value maps to a 4-letter alphabet by
    GLOBAL equi-depth binning (ntile over all segments with a
    (value, type, seg) tie-break, making tile assignment unique), and
    the per-type symbols concatenate in segment order into the SAX word
    — the index key for motif discovery / similarity search over
    time-series at scale (words are tiny; series never pairwise-join).
    Classic SAX derives breakpoints from the Gaussian over z-normalized
    values (floats); the equi-depth variant keeps the whole pipeline
    integer-exact cross-engine and adapts to the actual distribution.
    Shape: two map-side-combinable aggregates + one 30-row window.

    Unpartitioned-window disposition (r14 audit): the global ntile's
    input is the PAA relation — at most |event_types| x 6 month
    segments (calendar-bounded, ~30 rows at any data scale), so the
    single-partition stage is over a fixed-size post-aggregate
    relation, not row data; the RFM/uplift/funnel family, whose ntile
    inputs grow with |users|, uses distributed_global_rank instead."""
    events = load_table(spark, "events", sf_dir)
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.sum(_CENTS("value")).alias("cents"))
    paa = daily.groupBy(
        "event_type",
        F.expr("(day(d) - 1) DIV 5").alias("seg"),
    ).agg(F.sum("cents").alias("paa_cents"))
    tiled = paa.withColumn(
        "tile",
        F.ntile(4).over(Window.orderBy("paa_cents", "event_type", "seg")),
    )
    wtype = (
        Window.partitionBy("event_type")
        .orderBy("seg")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    sym = F.char(F.lit(96) + F.col("tile"))
    return (
        tiled.select(
            "event_type", "seg", "paa_cents",
            sym.alias("symbol"),
            F.concat_ws("", F.collect_list(sym).over(wtype)).alias("sax_word"),
        )
        .orderBy("event_type", "seg")
    )


@query(
    "ts_allen_interval_relations",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_ms(ts) AS s,
             epoch_ms(ts) + CAST(round(value * 100) AS BIGINT) * 1000 AS e
      FROM events
    ), pairs AS (
      SELECT a.s AS s1, a.e AS e1, b.s AS s2, b.e AS e2
      FROM iv a JOIN iv b
        ON a.user_id = b.user_id
       AND (a.s, a.e, a.event_id) < (b.s, b.e, b.event_id)
       AND b.s - a.s < 3600000
    )
    SELECT CASE
             WHEN s1 = s2 AND e1 = e2 THEN 'equals'
             WHEN s1 = s2 AND e1 < e2 THEN 'starts'
             WHEN s1 = s2 THEN 'started_by'
             WHEN e1 < s2 THEN 'before'
             WHEN e1 = s2 THEN 'meets'
             WHEN e1 < e2 THEN 'overlaps'
             WHEN e1 = e2 THEN 'finished_by'
             ELSE 'contains'
           END AS relation,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM pairs
    GROUP BY 1
    ORDER BY relation
    """,
)
def ts_allen_interval_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allen's interval algebra over event intervals (start = event
    time, duration proportional to value): classify every same-user
    pair within a 1-hour start band into the thirteen Allen relations
    — under the canonical (s, e, id) lexicographic pair ordering only
    eight can appear; the other five are the excluded inverses. This is
    the temporal-reasoning primitive behind conflict detection,
    scheduling, and overlap semantics that a plain 'do they overlap'
    join (join_interval_self) flattens away. Scale shape: the pair join
    is DOUBLY bounded — equi-key on user_id plus the start band — so
    cost is per-user-window pairs, never |events|²; the classification
    itself is a branch-free CASE over four integer comparisons in
    whole-stage codegen. Integer epoch-ms endpoints keep every boundary
    case (meets vs overlaps, finished_by vs contains — equality tests!)
    exact on both engines. The endpoint-equality relations (equals/
    meets/starts/...) are structurally absent here — microsecond
    timestamps never coincide in the fixture — but the classifier is
    total, and the CASE order makes each pair's label unique."""
    iv = load_table(spark, "events", sf_dir).select(
        "user_id",
        "event_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("s"),
        (
            F.unix_millis(F.col("ts").cast("timestamp"))
            + _CENTS("value") * 1000
        ).alias("e"),
    )
    a, b = iv.alias("a"), iv.alias("b")
    pairs = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (
            F.struct("a.s", "a.e", "a.event_id")
            < F.struct("b.s", "b.e", "b.event_id")
        )
        & (F.col("b.s") - F.col("a.s") < 3600000),
    ).select(
        F.col("a.s").alias("s1"), F.col("a.e").alias("e1"),
        F.col("b.s").alias("s2"), F.col("b.e").alias("e2"),
    )
    relation = (
        F.when((F.col("s1") == F.col("s2")) & (F.col("e1") == F.col("e2")), "equals")
        .when((F.col("s1") == F.col("s2")) & (F.col("e1") < F.col("e2")), "starts")
        .when(F.col("s1") == F.col("s2"), "started_by")
        .when(F.col("e1") < F.col("s2"), "before")
        .when(F.col("e1") == F.col("s2"), "meets")
        .when(F.col("e1") < F.col("e2"), "overlaps")
        .when(F.col("e1") == F.col("e2"), "finished_by")
        .otherwise("contains")
    )
    return (
        pairs.groupBy(relation.alias("relation"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("relation")
    )


@query(
    "ts_cumulative_unique_users",
    oracle="""
    WITH first_seen AS (
      SELECT user_id,
             min(date_trunc('hour', ts)) AS first_day
      FROM events
      GROUP BY user_id
    ), per_day AS (
      SELECT first_day AS d, CAST(count(*) AS BIGINT) AS new_users
      FROM first_seen GROUP BY first_day
    )
    SELECT d, new_users,
           CAST(sum(new_users) OVER (
             ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cumulative_unique
    FROM per_day
    ORDER BY d
    """,
)
def ts_cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by hour — the growth-curve query. The
    naive form (count(DISTINCT user) over an expanding window) re-scans
    the prefix per bucket and holds per-bucket distinct state; the
    first-seen reduction computes min(hour) per user ONCE (one
    map-side-combinable aggregate over |users|), turning the running
    distinct into a plain running SUM over |buckets| rows — the only
    shape that survives years of history, since the window runs over
    the tiny per-bucket relation, never the events. Exact, no
    sketches; complements the sketched ts_rolling_wau_hll."""
    events = load_table(spark, "events", sf_dir)
    first_seen = events.groupBy("user_id").agg(
        F.min(F.date_trunc("hour", "ts")).alias("first_day")
    )
    per_day = first_seen.groupBy(F.col("first_day").alias("d")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return per_day.select(
        "d", "new_users",
        F.sum("new_users").over(w).cast("long").alias("cumulative_unique"),
    ).orderBy("d")


@query(
    "events_cohort_ltv_curve",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
      FROM events GROUP BY user_id
    ), rev AS (
      SELECT f.cohort_day,
             datediff('day', f.cohort_day, date_trunc('day', e.ts)) AS age_days,
             CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events e JOIN first_seen f USING (user_id)
      WHERE e.event_type = 'purchase'
      GROUP BY 1, 2
    ), sized AS (
      SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_users
      FROM first_seen GROUP BY cohort_day
    )
    SELECT r.cohort_day, r.age_days, s.cohort_users, r.cents,
           CAST(sum(r.cents) OVER (
             PARTITION BY r.cohort_day ORDER BY r.age_days
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_cents,
           CAST(sum(r.cents) OVER (
             PARTITION BY r.cohort_day ORDER BY r.age_days
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) * 100 // s.cohort_users AS BIGINT) AS ltv_per_user_e2
    FROM rev r JOIN sized s USING (cohort_day)
    WHERE r.age_days < 14
    ORDER BY r.cohort_day, r.age_days
    """,
)
def events_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves — cumulative revenue per acquisition cohort by
    account age, normalized per cohort user (integer 1e-2 cents) — the
    payback-period query marketing actually runs. Same first-seen
    reduction as the retention triangle, but revenue-weighted with a
    running-sum window per cohort; the window runs over |cohorts × age
    days| rows, never events, and the per-user normalization divides
    AFTER the cumulative sum so truncation composes identically on
    both engines. The 14-day age cut keeps curves comparable across
    cohorts of different observation lengths (right-censoring)."""
    events = load_table(spark, "events", sf_dir)
    first_seen = events.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("cohort_day")
    )
    rev = (
        events.filter(F.col("event_type") == "purchase")
        .join(first_seen, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.date_trunc("day", "ts"), F.col("cohort_day")).alias(
                "age_days"
            ),
        )
        .agg(F.sum(_CENTS("value")).alias("cents"))
    )
    sized = first_seen.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("age_days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("cents").over(w)
    return (
        rev.join(sized, "cohort_day")
        .filter(F.col("age_days") < 14)
        .select(
            "cohort_day", "age_days", "cohort_users", "cents",
            cum.cast("long").alias("cum_cents"),
            F.expr(
                "sum(cents) OVER (PARTITION BY cohort_day ORDER BY age_days "
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
                "* 100 DIV cohort_users"
            )
            .cast("long")
            .alias("ltv_per_user_e2"),
        )
        .orderBy("cohort_day", "age_days")
    )


@query(
    "ts_yoy_growth_bp",
    oracle="""
    WITH monthly AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
             CAST(month(o_orderdate) AS BIGINT) AS m,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders
      GROUP BY 1, 2
    ), shifted AS (
      SELECT y, m, cents,
             lag(cents, 12) OVER (ORDER BY y, m) AS prior_year
      FROM monthly
    )
    SELECT y, m, cents, prior_year,
           CAST((cents - prior_year) * 10000 // prior_year AS BIGINT)
             AS yoy_growth_bp
    FROM shifted
    WHERE prior_year IS NOT NULL
    ORDER BY y, m
    """,
)
def ts_yoy_growth_bp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth per month in exact basis points — the BI
    staple. lag(12) over the dense monthly rollup beats a self-join on
    (y-1, m): one window over |months| rows instead of a second scan +
    shuffle, and it is immune to the join's silent row loss when a
    month is missing (lag over the ordered frame makes the gap
    explicit as NULL). Growth lands in integer bp
    via the engines' SHARED truncating integer division (DuckDB's
    integer `//` and Spark's DIV both truncate a negative quotient
    toward zero — the round-6 verified semantics), which matters here
    because YoY growth is routinely negative; float division + floor
    was the observed trap (one ULP below an exact quotient floors to
    a different bp)."""
    orders = load_table(spark, "orders", sf_dir)
    monthly = orders.groupBy(
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents")
    )
    w = Window.orderBy("y", "m")
    shifted = monthly.select(
        "y", "m", "cents", F.lag("cents", 12).over(w).alias("prior_year")
    )
    return (
        shifted.filter(F.col("prior_year").isNotNull())
        .select(
            "y", "m", "cents", "prior_year",
            F.expr("(cents - prior_year) * 10000 DIV prior_year")
            .cast("long")
            .alias("yoy_growth_bp"),
        )
        .orderBy("y", "m")
    )


@query(
    "events_amount_tranches",
    oracle="""
    WITH RECURSIVE p AS (
      SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
             CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS BIGINT) AS rn
      FROM events WHERE event_type = 'purchase'
    ), walk(user_id, rn, acc, tranche) AS (
      SELECT user_id, rn, cents, CAST(0 AS BIGINT)
      FROM p WHERE rn = 1
      UNION ALL
      SELECT p.user_id, p.rn,
             CASE WHEN w.acc >= 50000 THEN p.cents
                  ELSE w.acc + p.cents END,
             CASE WHEN w.acc >= 50000 THEN w.tranche + 1
                  ELSE w.tranche END
      FROM walk w JOIN p ON p.user_id = w.user_id AND p.rn = w.rn + 1
    )
    SELECT user_id, tranche AS tranche_idx,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(max(acc) AS BIGINT) AS tranche_cents
    FROM walk
    GROUP BY user_id, tranche
    ORDER BY user_id, tranche_idx
    """,
)
def events_amount_tranches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-reset accumulator: split each user's purchase stream into
    $500 tranches — accumulate cents in order, close the tranche when
    the running total reaches the cap, reset, continue (billing
    cycles-by-amount, loyalty tiers, settlement batching). This is the
    canonical NON-windowable sequential pattern: each row's reset
    depends on the ACCUMULATED value, a data-dependent carry no fixed
    window frame or gaps-and-islands key can express (contrast
    events_longest_streak, where the island key is row-local). The
    honest distributed shape is one shuffle on user_id + a per-
    partition sorted Arrow stream (mapInPandas with a cross-chunk
    carry), O(rows) per partition, all partitions in parallel, no
    global order anywhere — while the DuckDB oracle walks
    the same recurrence as a recursive CTE stepping (user, rn) → (user,
    rn+1). Integer cents end-to-end; tranche_cents is max(acc), exact
    because acc is monotone within a tranche."""
    import pandas as pd

    events = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id", _CENTS("value").alias("cents"))
    )

    # Physical shape: shuffle once on user_id, sort WITHIN partitions,
    # then ONE Arrow stream per partition (mapInPandas) with a carry
    # across chunk boundaries — NOT applyInPandas, whose per-group
    # invocation overhead (one Python call + frame per key) measured
    # 38 s on 15k tiny groups at sf1 vs ~2 s for this form. The carry
    # makes chunking invisible: Arrow may split a partition into
    # 10k-row batches mid-user, so the walker keeps (user, acc,
    # tranche, stats) open until the user changes — O(batch) memory,
    # works at any group size.
    def walk_partition(batches):
        out = {"user_id": [], "tranche_idx": [], "n_purchases": [],
               "tranche_cents": []}
        cur_uid = None
        acc = 0
        tranche = 0
        per: dict[int, list[int]] = {}

        def flush(uid, stats):
            for t, (n, total) in sorted(stats.items()):
                out["user_id"].append(uid)
                out["tranche_idx"].append(t)
                out["n_purchases"].append(n)
                out["tranche_cents"].append(total)

        for pdf in batches:
            for uid, cents in zip(
                pdf["user_id"].to_numpy(), pdf["cents"].to_numpy()
            ):
                if uid != cur_uid:
                    if cur_uid is not None:
                        flush(int(cur_uid), per)
                    cur_uid, acc, tranche, per = uid, 0, 0, {}
                if acc >= 50000:
                    acc = 0
                    tranche += 1
                acc += int(cents)
                st = per.setdefault(tranche, [0, 0])
                st[0] += 1
                st[1] = acc  # monotone within the tranche: last == max
        if cur_uid is not None:
            flush(int(cur_uid), per)
        yield pd.DataFrame(out)

    walked = (
        events.repartition("user_id")
        .sortWithinPartitions("user_id", "ts", "event_id")
        .mapInPandas(
            walk_partition,
            "user_id long, tranche_idx long, n_purchases long, tranche_cents long",
        )
    )
    return walked.orderBy("user_id", "tranche_idx")


@query(
    "ts_bollinger_breach",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS d,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ), rolled AS (
      SELECT event_type, d, cents,
             CAST(count(*) OVER w AS BIGINT) AS n,
             CAST(sum(cents) OVER w AS BIGINT) AS s,
             CAST(sum(cents * cents) OVER w AS BIGINT) AS ss
      FROM daily
      WINDOW w AS (
        PARTITION BY event_type ORDER BY d
        ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING
      )
    )
    SELECT event_type, d, cents, n, s,
           CAST(n * ss - s * s AS BIGINT) AS var_n2,
           CAST(
             (cents * n - s) * (cents * n - s) > 4 * (n * ss - s * s)
             AS BIGINT
           ) AS breach
    FROM rolled
    WHERE n = 7
      AND (cents * n - s) * (cents * n - s) > 4 * (n * ss - s * s)
    ORDER BY event_type, d
    """,
)
def ts_bollinger_breach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band breaches over a trailing 7-day window — the
    rolling twin of the Poisson c-chart screen. The classic test
    |x − μ| > 2σ is irrational; multiplying through by n² turns it into
    EXACT INTEGERS: (x·n − Σ)² > 4·(n·Σx² − Σ²) — the right side is n²
    times the biased variance, the left n² times the squared deviation
    — so the breach decision is bit-identical across engines with no
    sqrt, no float variance (n·Σx² − Σ² is also how agg_stats keeps
    exact moments). The window is strictly TRAILING (7 PRECEDING to 1
    PRECEDING): today never contaminates its own band, the look-ahead
    bug most rolling-band implementations ship with. Partial windows
    (n < 7) are excluded explicitly. Σx² of integer cents stays well
    inside int64 at these magnitudes; at larger scales the same shape
    runs on DECIMAL(38,0)."""
    events = load_table(spark, "events", sf_dir)
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.sum(_CENTS("value")).alias("cents"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-7, -1)
    )
    rolled = daily.select(
        "event_type", "d", "cents",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("cents").over(w).alias("s"),
        F.sum(F.col("cents") * F.col("cents")).over(w).alias("ss"),
    )
    dev = F.col("cents") * F.col("n") - F.col("s")
    var_n2 = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    breach = (dev * dev) > F.lit(4) * var_n2
    return (
        rolled.filter((F.col("n") == 7) & breach)
        .select(
            "event_type", "d", "cents",
            F.col("n").cast("long").alias("n"),
            F.col("s").cast("long").alias("s"),
            var_n2.cast("long").alias("var_n2"),
            breach.cast("long").alias("breach"),
        )
        .orderBy("event_type", "d")
    )
