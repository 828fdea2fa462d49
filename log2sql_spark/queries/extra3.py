"""Round-4 surface widening: XML source, regex/URL function waves,
event-sequence (funnel) analytics, and TF-IDF text analysis.

All extension surface beyond the 305-line reference (SURVEY.md §2.2);
every query carries a DuckDB oracle. Determinism notes per query —
floats only ever reach the output as integer-quantized values.
"""

from __future__ import annotations

import os
from log2sql_spark.scratch import scratch_dir

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from log2sql_spark.registry import query
from log2sql_spark.sources.tables import load_table


@query(
    "source_xml_roundtrip",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
           CAST(min(o_orderkey) AS BIGINT) AS min_key,
           CAST(max(o_orderkey) AS BIGINT) AS max_key,
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses
    FROM orders
    WHERE o_orderkey <= 2000
    """,
)
def source_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source/sink (built into Spark 4): write an orders subset as
    row-tagged XML, read it back with an explicit schema (no inference
    scan), verify against the parquet-derived oracle — DuckDB can't read
    XML, so the round trip must be lossless for the hash to match."""
    sub = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderkey") <= 2000)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )
    d = os.path.join(scratch_dir("log2sql_xml_"), "orders_xml")
    sub.write.mode("overwrite").format("xml").option("rowTag", "order").save(d)
    back = (
        spark.read.schema(
            "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double"
        )
        .format("xml")
        .option("rowTag", "order")
        .load(d)
    )
    return back.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("total_cents"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
    )


@query(
    "regex_funcs",
    oracle=r"""
    SELECT doc_id,
           regexp_extract(text, '([A-Za-z]+)', 1) AS first_word,
           regexp_extract(text, '(\w+)\s+(\w+)', 2) AS second_word,
           CAST(len(regexp_extract_all(text, '[aeiou]')) AS BIGINT) AS n_vowels,
           CAST(len(regexp_extract_all(text, '\b[A-Za-z]{4}\b')) AS BIGINT) AS n_four_letter,
           regexp_matches(text, 'data') AS has_data,
           regexp_replace(text, '\s+', '_', 'g') AS squished,
           CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_split
    FROM documents
    WHERE doc_id < 120
    ORDER BY doc_id
    """,
)
def regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex function wave: extract / extract-all / count / like /
    replace / split — the pattern-matching surface of the engine
    (reference's only regexes are its parser line-classifiers,
    log2sql.py:97-99)."""
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 120)
    return docs.select(
        "doc_id",
        F.regexp_extract("text", r"([A-Za-z]+)", 1).alias("first_word"),
        F.regexp_extract("text", r"(\w+)\s+(\w+)", 2).alias("second_word"),
        F.regexp_count("text", F.lit(r"[aeiou]")).alias("n_vowels"),
        F.regexp_count("text", F.lit(r"\b[A-Za-z]{4}\b")).alias("n_four_letter"),
        F.col("text").rlike("data").alias("has_data"),
        F.regexp_replace("text", r"\s+", "_").alias("squished"),
        F.size(F.split("text", r"\s+")).cast("long").alias("n_split"),
    ).orderBy("doc_id")


@query(
    "url_funcs",
    oracle=r"""
    SELECT doc_id, url,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '\?([^#]*)', 1) AS query,
           regexp_extract(url, '\?.*?lang=([^&#]*)', 1) AS lang_param,
           regexp_extract(url, '^([a-z]+)://', 1) AS protocol
    FROM (
      SELECT doc_id,
             'https://corpus.example.com/' || source || '/doc-' || doc_id ||
             '?lang=' || lang || '&v=2' AS url
      FROM documents WHERE doc_id < 150
    )
    ORDER BY doc_id
    """,
)
def url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing wave (parse_url HOST/PATH/QUERY/param/PROTOCOL) over
    synthesized per-document URLs; the oracle re-derives each part with
    regexes, so Spark's parse_url semantics are pinned exactly."""
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 150)
    with_url = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://corpus.example.com/"),
            F.col("source"),
            F.lit("/doc-"),
            F.col("doc_id"),
            F.lit("?lang="),
            F.col("lang"),
            F.lit("&v=2"),
        ).alias("url"),
    )
    return with_url.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
    ).orderBy("doc_id")


@query(
    "events_funnel_steps",
    oracle="""
    WITH ev AS (SELECT user_id, event_type, ts FROM events),
    v AS (
      SELECT user_id, min(ts) AS view_ts FROM ev WHERE event_type = 'view'
      GROUP BY user_id
    ),
    c AS (
      SELECT ev.user_id, min(ts) AS click_ts
      FROM ev JOIN v USING (user_id)
      WHERE event_type = 'click' AND ts > view_ts
      GROUP BY ev.user_id
    ),
    p AS (
      SELECT ev.user_id, min(ts) AS purchase_ts
      FROM ev JOIN c USING (user_id)
      WHERE event_type = 'purchase' AND ts > click_ts
      GROUP BY ev.user_id
    )
    SELECT v.user_id AS user_id, view_ts, click_ts, purchase_ts,
           (purchase_ts IS NOT NULL) AS completed,
           CAST(CASE WHEN purchase_ts IS NOT NULL
                THEN date_diff('second', view_ts, purchase_ts) END AS BIGINT)
             AS seconds_to_convert
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    ORDER BY user_id
    """,
)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence (funnel) detection: first view, first click
    AFTER that view, first purchase AFTER that click, per user — the
    MATCH_RECOGNIZE-shaped analytic expressed as chained conditional
    window-mins over ONE user_id partitioning: view_ts is a
    per-partition constant, so the next step's condition (ts > view_ts)
    references a plain column and the whole funnel costs a single
    shuffle + one same-key aggregate (no exchange), however many steps
    the funnel has — vs one shuffle per step the naive
    aggregate-and-join shape pays."""
    ev = load_table(spark, "events", sf_dir).select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    stepped = (
        ev.withColumn(
            "view_ts", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
        )
        .withColumn(
            "click_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("view_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "purchase_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("click_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    return (
        stepped.filter(F.col("view_ts").isNotNull())
        .groupBy("user_id")
        .agg(
            F.min("view_ts").alias("view_ts"),
            F.min("click_ts").alias("click_ts"),
            F.min("purchase_ts").alias("purchase_ts"),
        )
        .select(
            "user_id",
            "view_ts",
            "click_ts",
            "purchase_ts",
            F.col("purchase_ts").isNotNull().alias("completed"),
            F.when(
                F.col("purchase_ts").isNotNull(),
                (
                    F.unix_timestamp("purchase_ts") - F.unix_timestamp("view_ts")
                ).cast("long"),
            ).alias("seconds_to_convert"),
        )
        .orderBy("user_id")
    )


@query(
    "llm_tfidf_topterms",
    oracle=r"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 300
    ), toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
      FROM corpus
    ), tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM toks WHERE len(term) >= 4 GROUP BY doc_id, term
    ), df AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
    ), n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM corpus),
    scored AS (
      SELECT doc_id, term, tf, df,
             CAST(round(tf * ln(n_docs / df) * 1000000) AS BIGINT) AS score_micro
      FROM tf JOIN df USING (term), n
    )
    SELECT doc_id, term, tf, df, score_micro
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY score_micro DESC, term
      ) AS rn FROM scored
    )
    WHERE rn <= 3
    ORDER BY doc_id, score_micro DESC, term
    """,
)
def llm_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (terms ≥ 4 chars). df is one
    aggregate over the already-grouped tf table, N is a broadcast
    scalar; the score is emitted integer-quantized (micro-units) so the
    cross-engine double ln() agrees bit-for-bit after rounding — floats
    never reach the output raw."""
    docs = (
        load_table(spark, "documents", sf_dir)
        .filter(F.col("doc_id") < 300)
        .select("doc_id", "text")
    )
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("term")
    ).filter(F.length("term") >= 4)
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # df as a window count over the already-grouped tf table: one
    # shuffle on term replaces the aggregate-then-join shape's two.
    df = F.count("*").over(Window.partitionBy("term"))
    n = docs.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.withColumn("df", df.cast("long"))
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")) * 1e6, 0)
            .cast("long")
            .alias("score_micro"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_micro"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
        .orderBy("doc_id", F.desc("score_micro"), "term")
    )


@query(
    "encoding_funcs",
    oracle="""
    SELECT doc_id,
           to_base64(encode(substr(text, 1, 24))) AS b64,
           substr(text, 1, 24) = from_base64(to_base64(encode(substr(text, 1, 24))))::VARCHAR
             AS b64_roundtrip,
           hex(encode(substr(text, 1, 8))) AS hex8,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(levenshtein(lang, source) AS BIGINT) AS lev_lang_source,
           sha256(text) AS sha256_hex,
           md5(text) AS md5_hex
    FROM documents
    WHERE doc_id < 200
    ORDER BY doc_id
    """,
)
def encoding_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding/hash wave: base64 (+roundtrip through binary), hex,
    byte length, levenshtein edit distance, sha256/md5 digests — the
    binary↔text surface. Inputs capped at 24 chars so neither engine's
    base64 line-chunking threshold (76 chars) is reachable."""
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 200)
    pre = F.substring("text", 1, 24)
    return docs.select(
        "doc_id",
        F.base64(F.encode(pre, "UTF-8")).alias("b64"),
        (pre == F.decode(F.unbase64(F.base64(F.encode(pre, "UTF-8"))), "UTF-8")).alias(
            "b64_roundtrip"
        ),
        F.hex(F.encode(F.substring("text", 1, 8), "UTF-8")).alias("hex8"),
        F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
        F.levenshtein("lang", "source").cast("long").alias("lev_lang_source"),
        F.sha2("text", 256).alias("sha256_hex"),
        F.md5("text").alias("md5_hex"),
    ).orderBy("doc_id")


@query(
    "llm_shard_balance_report",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shard'), 1, 15))::BIGINT % 8
               AS shard,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
      FROM documents
    ), per AS (
      SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS total_tokens
      FROM toks GROUP BY shard
    )
    SELECT shard, n_docs, total_tokens,
           CAST(round(total_tokens * 10000.0 /
                (SELECT sum(total_tokens) FROM per)) AS BIGINT) AS share_bp
    FROM per
    ORDER BY shard
    """,
)
def llm_shard_balance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output-shard balance report for hash sharding: per-shard doc and
    token totals plus each shard's share in basis points. Hash sharding
    is the ONLY assignment that needs no global order (a global
    row_number/ntile is a single-partition bottleneck at 100 TB); this
    report is how you verify the expected balance actually holds on a
    real corpus. DuckDB's hash() differs from Spark's, so the shard key
    is a cross-engine md5-derived hash, same trick as the dedup family."""
    from log2sql_spark.operators.dedup import md5_long

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        F.pmod(
            md5_long(F.concat(F.col("doc_id").cast("string"), F.lit(":shard"))), F.lit(8)
        ).alias("shard"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
    )
    per = toks.groupBy("shard").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("total_tokens")
    )
    total = per.agg(F.sum("total_tokens").alias("grand")).select("grand")
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "shard",
            "n_docs",
            "total_tokens",
            F.round(F.col("total_tokens") * 10000.0 / F.col("grand"), 0)
            .cast("long")
            .alias("share_bp"),
        )
        .orderBy("shard")
    )


@query(
    "agg_median",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           median(CAST(round(o_totalprice * 100) AS BIGINT)) AS median_cents,
           CAST(min(o_orderkey) AS BIGINT) AS min_key
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median per group over integer cents: an even-count group
    averages the two middles — (x+y)/2 on integers is dyadic, so the
    double is bit-identical across engines."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.median(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "median_cents"
            ),
            F.min("o_orderkey").alias("min_key"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "sql_recursive_cte",
    oracle="""
    WITH RECURSIVE months(m) AS (
      SELECT TIMESTAMP '1995-01-01'
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months WHERE m < TIMESTAMP '1995-12-01'
    )
    SELECT strftime(m, '%Y-%m-%d') AS month_start,
           CAST(count(o_orderkey) AS BIGINT) AS n_orders,
           CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT)), 0) AS BIGINT)
             AS cents
    FROM months LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
    GROUP BY m
    ORDER BY month_start
    """,
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): a generated 1995 month
    spine LEFT-joined to monthly order totals — the gap-proof calendar
    rollup shape. The recursion materializes 12 driver-light rows; the
    heavy side stays a single scan+aggregate."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders_rcte_v")
    return spark.sql(
        """
        WITH RECURSIVE months(m) AS (
          SELECT TIMESTAMP '1995-01-01 00:00:00'
          UNION ALL
          SELECT m + INTERVAL '1' MONTH FROM months
          WHERE m < TIMESTAMP '1995-12-01 00:00:00'
        ),
        agg AS (
          -- pre-aggregate BEFORE joining the spine: the join then moves
          -- |months| rows, not |orders| (joining raw orders to a 12-row
          -- spine shuffled the fact table into 12 skewed partitions)
          SELECT date_trunc('MONTH', o_orderdate) AS m,
                 CAST(count(*) AS BIGINT) AS n_orders,
                 sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
          FROM orders_rcte_v
          GROUP BY 1
        )
        SELECT date_format(m, 'yyyy-MM-dd') AS month_start,
               coalesce(n_orders, 0L) AS n_orders,
               coalesce(cents, 0L) AS cents
        FROM months LEFT JOIN agg USING (m)
        ORDER BY month_start
        """
    )


@query(
    "json_variant_funcs",
    oracle="""
    WITH safe AS (
      SELECT event_id,
             CASE WHEN props IS NOT NULL AND json_valid(props)
                  THEN CAST(props->>'$.k' AS BIGINT) END AS k
      FROM events WHERE event_id < 300
    )
    SELECT event_id, k AS k_val, k * 2 AS k_doubled, k % 10 = 0 AS k_round
    FROM safe
    ORDER BY event_id
    """,
)
def json_variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT (Spark 4 semi-structured type): try_parse_json → variant_get
    typed extraction pinned against DuckDB's JSON operators (DuckDB's
    JSON cast preserves raw spacing while Spark's to_json minifies, so
    the serialized form itself is not cross-engine comparable). Variant is the schema-on-read
    path for ragged metadata columns at scale — extraction happens
    columnar-side, no Python."""
    ev = load_table(spark, "events", sf_dir).filter(F.col("event_id") < 300)
    # try_parse_json: malformed/NULL metadata yields a NULL variant
    # instead of a FAILFAST job abort — one bad record in 100 TB of
    # ragged metadata must not kill the scan (oracle twin: json_valid
    # guard).
    k = F.expr("variant_get(try_parse_json(props), '$.k', 'bigint')")
    return ev.select(
        "event_id",
        k.alias("k_val"),
        (k * 2).alias("k_doubled"),
        (k % 10 == 0).alias("k_round"),
    ).orderBy("event_id")


@query(
    "json_variant_polymorphic",
    oracle="""
    WITH raw AS (
      SELECT event_id,
             '{"device":{"os":"o' || CAST(event_id % 4 AS VARCHAR)
             || '","ver":' || CAST(event_id % 7 AS VARCHAR) || '}'
             || CASE WHEN event_id % 3 = 0
                     THEN ',"tags":["t' || CAST(event_id % 5 AS VARCHAR) || '","x"]'
                     ELSE '' END
             || ',"score":'
             || CASE WHEN event_id % 2 = 0 THEN CAST(event_id % 100 AS VARCHAR)
                     ELSE '"s' || CAST(event_id % 10 AS VARCHAR) || '"' END
             || '}' AS p
      FROM events WHERE event_id < 400
    )
    SELECT event_id,
           json_extract_string(p, '$.device.os') AS os,
           CAST(json_extract(p, '$.device.ver') AS BIGINT) AS ver,
           json_extract_string(p, '$.tags[0]') AS tag0,
           CAST(json_array_length(p, '$.tags') AS INTEGER) AS n_tags,
           CASE json_type(p, '$.score')
                WHEN 'UBIGINT' THEN 'BIGINT'
                WHEN 'VARCHAR' THEN 'STRING' END AS score_type,
           TRY_CAST(json_extract(p, '$.score') AS BIGINT) AS score_num,
           CASE WHEN json_type(p, '$.score') = 'VARCHAR'
                THEN json_extract_string(p, '$.score') END AS score_str
    FROM raw
    ORDER BY event_id
    """,
)
def json_variant_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT over genuinely POLYMORPHIC payloads — the part of the
    Spark 4 semi-structured surface the flat ``json_variant_funcs``
    probe cannot reach: nested-path extraction, array indexing into an
    OPTIONAL field (absent 2/3 of the time), and a type-drifting field
    (``score`` is int on even ids, string on odd) routed with
    ``schema_of_variant`` + ``try_variant_get`` instead of a fragile
    cast. Payloads synthesize deterministically from event_id (the
    fixture's real props column is shape-constant ``{"k":N}``), so
    every extraction is value-hash-checked against DuckDB's JSON
    operators. At scale this is the schema-on-read path for ragged
    metadata: parse_json once into the binary variant encoding, typed
    extraction stays columnar JVM-side, and a type change in one
    producer degrades that field to NULL instead of killing the scan."""
    ev = load_table(spark, "events", sf_dir).filter(F.col("event_id") < 400)
    i = F.col("event_id")
    payload = F.concat(
        F.lit('{"device":{"os":"o'), (i % 4).cast("string"),
        F.lit('","ver":'), (i % 7).cast("string"), F.lit("}"),
        F.when(
            i % 3 == 0,
            F.concat(F.lit(',"tags":["t'), (i % 5).cast("string"), F.lit('","x"]')),
        ).otherwise(F.lit("")),
        F.lit(',"score":'),
        F.when(i % 2 == 0, (i % 100).cast("string")).otherwise(
            F.concat(F.lit('"s'), (i % 10).cast("string"), F.lit('"'))
        ),
        F.lit("}"),
    )
    v = ev.select("event_id", F.parse_json(payload).alias("v"))
    tags = F.expr("try_variant_get(v, '$.tags', 'array<string>')")
    stype = F.expr("schema_of_variant(variant_get(v, '$.score'))")
    return v.select(
        "event_id",
        F.expr("variant_get(v, '$.device.os', 'string')").alias("os"),
        F.expr("variant_get(v, '$.device.ver', 'bigint')").alias("ver"),
        F.expr("try_variant_get(v, '$.tags[0]', 'string')").alias("tag0"),
        F.when(tags.isNull(), F.lit(None).cast("int"))
        .otherwise(F.size(tags))
        .alias("n_tags"),
        stype.alias("score_type"),
        F.expr("try_variant_get(v, '$.score', 'bigint')").alias("score_num"),
        F.when(
            stype == "STRING",
            F.expr("try_variant_get(v, '$.score', 'string')"),
        ).alias("score_str"),
    ).orderBy("event_id")


@query(
    "sql_lateral_subquery",
    oracle="""
    SELECT o.o_orderkey AS o_orderkey,
           CAST(l.n_items AS BIGINT) AS n_items,
           CAST(l.max_qty AS BIGINT) AS max_qty,
           CAST(l.cents AS BIGINT) AS cents
    FROM orders o, LATERAL (
      SELECT count(*) AS n_items,
             coalesce(max(CAST(round(l_quantity) AS BIGINT)), 0) AS max_qty,
             coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT)), 0) AS cents
      FROM lineitem WHERE l_orderkey = o.o_orderkey
    ) l
    WHERE o.o_orderkey <= 1000
    ORDER BY o_orderkey
    """,
)
def sql_lateral_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL LATERAL correlated subquery (per-order lineitem aggregate):
    the parser/planner surface for correlated table expressions —
    Catalyst decorrelates it into a join + aggregate, so the executed
    plan is the same shuffle-bounded shape as the hand-written
    DataFrame version, not a nested loop."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders_lat_v")
    load_table(spark, "lineitem", sf_dir).createOrReplaceTempView("lineitem_lat_v")
    return spark.sql(
        """
        SELECT o.o_orderkey AS o_orderkey,
               l.n_items, l.max_qty, l.cents
        FROM orders_lat_v o,
        LATERAL (
          SELECT count(*) AS n_items,
                 coalesce(max(CAST(round(l_quantity, 0) AS BIGINT)), 0L) AS max_qty,
                 coalesce(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)), 0L) AS cents
          FROM lineitem_lat_v WHERE l_orderkey = o.o_orderkey
        ) l
        WHERE o.o_orderkey <= 1000
        ORDER BY o_orderkey
        """
    )


@query(
    "sql_ctas_insert",
    oracle="""
    WITH base AS (
      SELECT o_orderstatus,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey <= 4000 GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, n, cents FROM base
    UNION ALL
    SELECT 'ZZ_TOTAL' AS o_orderstatus,
           CAST(sum(n) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS cents
    FROM base
    ORDER BY o_orderstatus
    """,
)
def sql_ctas_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog/table management surface: CREATE TABLE AS SELECT into the
    session warehouse (parquet), then INSERT INTO appending a computed
    total row, then read the managed table back. The oracle recomputes
    the same content from the source, so the managed-table write/append/
    read cycle must be lossless."""
    import shutil

    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders_ctas_v")
    spark.sql("DROP TABLE IF EXISTS order_status_summary")
    # A fresh session's in-memory catalog doesn't know the table, so the
    # DROP is a no-op while the managed location survives on disk —
    # remove it explicitly or the CTAS fails with LOCATION_ALREADY_EXISTS.
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(os.path.join(warehouse, "order_status_summary"), ignore_errors=True)
    spark.sql(
        """
        CREATE TABLE order_status_summary USING parquet AS
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT) AS n,
               sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
        FROM orders_ctas_v WHERE o_orderkey <= 4000 GROUP BY o_orderstatus
        """
    )
    spark.sql(
        """
        INSERT INTO order_status_summary
        SELECT 'ZZ_TOTAL', CAST(sum(n) AS BIGINT), CAST(sum(cents) AS BIGINT)
        FROM order_status_summary
        """
    )
    return spark.table("order_status_summary").orderBy("o_orderstatus")


@query(
    "source_json_corrupt_recovery",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_good,
           CAST(2 AS BIGINT) AS n_corrupt,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS good_cents
    FROM orders
    WHERE o_orderkey <= 1500
    """,
)
def source_json_corrupt_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE-mode corrupt-record recovery: a JSON input containing
    two malformed lines (written deterministically alongside rows
    derived from orders) is read with a _corrupt_record column; good
    rows aggregate to the oracle's orders-derived numbers and the bad
    lines are counted, not dropped silently — the quarantine pattern
    every large-scale ingest needs. (The reference would crash or
    mis-parse: its parser has no error path, log2sql.py:75.)"""
    sub = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderkey") <= 1500)
        .select("o_orderkey", "o_totalprice")
    )
    d = os.path.join(scratch_dir("log2sql_cor_"), "j")
    sub.coalesce(1).write.mode("overwrite").json(d)
    # a separate file, not an append: Spark wrote .crc sidecars for its
    # own part files and a modified part file fails the checksum read
    with open(os.path.join(d, "part-99999-malformed.json"), "w") as f:
        f.write('{"o_orderkey": 99999, "o_totalprice": BROKEN}\n')
        f.write("not json at all\n")
    back = spark.read.schema(
        "o_orderkey bigint, o_totalprice double, _corrupt_record string"
    ).json(d)
    return back.agg(
        F.count(F.when(F.col("_corrupt_record").isNull(), 1)).alias("n_good"),
        F.count(F.col("_corrupt_record")).alias("n_corrupt"),
        F.sum(
            F.when(
                F.col("_corrupt_record").isNull(),
                F.round(F.col("o_totalprice") * 100, 0).cast("long"),
            )
        ).alias("good_cents"),
    )


@query(
    "agg_argminmax_listagg",
    oracle="""
    WITH t AS (
      SELECT o_orderstatus, o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey AS u
      FROM orders WHERE o_orderkey <= 500
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(arg_min(o_orderkey, u) AS BIGINT) AS cheapest_key,
           CAST(arg_max(o_orderkey, u) AS BIGINT) AS priciest_key,
           bool_and(cents > 0) AS all_positive,
           string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY u) AS keys_by_price
    FROM t GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def agg_argminmax_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate wave 3: min_by/max_by (arg-extremes), bool_and, and
    ordered LISTAGG. The by-value is cents*1e7+orderkey — unique, so
    arg-extremes and the listagg order are total and both engines pick
    identical rows (min_by on a tied key is engine-arbitrary
    otherwise)."""
    t = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderkey") <= 500)
        .select(
            "o_orderstatus",
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
            (
                F.round(F.col("o_totalprice") * 100, 0).cast("long") * 10_000_000
                + F.col("o_orderkey")
            ).alias("u"),
        )
    )
    t.createOrReplaceTempView("argmm_t")
    return spark.sql(
        """
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT) AS n,
               min_by(o_orderkey, u) AS cheapest_key,
               max_by(o_orderkey, u) AS priciest_key,
               bool_and(cents > 0) AS all_positive,
               listagg(CAST(o_orderkey AS STRING), ',')
                 WITHIN GROUP (ORDER BY u) AS keys_by_price
        FROM argmm_t GROUP BY o_orderstatus
        ORDER BY o_orderstatus
        """
    )


@query(
    "events_sequence_pattern",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS s
      FROM events GROUP BY user_id
    )
    SELECT user_id, s AS sequence,
           CAST(length(s) AS BIGINT) AS n_events,
           regexp_matches(s, 'v.*c.*p') AS has_funnel,
           regexp_matches(s, 'ee') AS has_error_burst,
           CAST(length(s) - length(regexp_replace(s, 'p', '', 'g')) AS BIGINT)
             AS n_purchases
    FROM seq
    ORDER BY user_id
    """,
)
def events_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence pattern matching: each user's ordered history is
    collapsed to an initials string (one LISTAGG over a total order)
    and patterns become plain regexes — 'v.*c.*p' is the funnel,
    'ee' a repeated-error burst. The regex-on-sequence trick gives
    MATCH_RECOGNIZE-class expressiveness with one shuffle, and its
    has_funnel column cross-checks events_funnel_steps from an
    independent formulation."""
    ev = load_table(spark, "events", sf_dir)
    ev.select("user_id", "event_type", "ts", "event_id").createOrReplaceTempView(
        "events_seq_v"
    )
    return spark.sql(
        """
        WITH seq AS (
          SELECT user_id,
                 listagg(substring(event_type, 1, 1), '')
                   WITHIN GROUP (ORDER BY ts, event_id) AS s
          FROM events_seq_v GROUP BY user_id
        )
        SELECT user_id, s AS sequence,
               CAST(length(s) AS BIGINT) AS n_events,
               s RLIKE 'v.*c.*p' AS has_funnel,
               s RLIKE 'ee' AS has_error_burst,
               CAST(length(s) - length(regexp_replace(s, 'p', '')) AS BIGINT)
                 AS n_purchases
        FROM seq
        ORDER BY user_id
        """
    )


@query(
    "join_range_banded",
    oracle="""
    SELECT a.event_type AS event_type, CAST(count(*) AS BIGINT) AS n_pairs
    FROM events a JOIN events b
      ON b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 2 MINUTE
     AND a.event_id <> b.event_id
    WHERE a.event_id < 1200 AND b.event_id < 1200
    GROUP BY a.event_type
    ORDER BY a.event_type
    """,
)
def join_range_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (NO equi key) made shuffle-bounded: the left side
    explodes to its 2-minute band and the next one (any b within
    [a.ts, a.ts+2min] lands in one of those two), the right side keeps
    its single band, and the join becomes an EQUI-join on the band with
    the exact range verified on collisions — each (a, b) meets in
    exactly b's band, so no dedup is needed. Replaces the
    BroadcastNestedLoopJoin a naive theta range join costs (the oracle
    runs exactly that shape) with cost O(rows per 2-minute band)."""
    ev = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("event_id") < 1200)
        .select("event_id", "event_type", "ts")
    )
    band = lambda c: F.floor(F.unix_timestamp(c) / 120)  # noqa: E731
    a = ev.select(
        F.col("event_id").alias("a_id"),
        F.col("event_type").alias("event_type"),
        F.col("ts").alias("a_ts"),
        F.explode(F.array(band(F.col("ts")), band(F.col("ts")) + 1)).alias("band"),
    )
    b = ev.select(
        F.col("event_id").alias("b_id"),
        F.col("ts").alias("b_ts"),
        band(F.col("ts")).alias("band"),
    )
    return (
        a.join(b, "band")
        .filter(
            (F.col("b_ts") >= F.col("a_ts"))
            & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 2 MINUTES"))
            & (F.col("a_id") != F.col("b_id"))
        )
        .groupBy("event_type")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("event_type")
    )


@query(
    "struct_funcs",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             {'status': o_orderstatus,
              'cents': CAST(round(o_totalprice * 100) AS BIGINT),
              'cust': o_custkey} AS s
      FROM orders WHERE o_orderkey <= 800
    )
    SELECT o_orderkey,
           s.status AS status,
           s.cents AS cents,
           s.cents > 10000000 AS is_large,
           s.status || '#' || CAST(s.cust AS VARCHAR) AS status_cust
    FROM t
    ORDER BY o_orderkey
    """,
)
def struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct (nested record) wave: named-struct construction, dotted
    field access, and expressions over fields — the nested-type surface
    flattened back to plain columns so both engines' outputs compare
    exactly."""
    t = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderkey") <= 800)
        .select(
            "o_orderkey",
            F.struct(
                F.col("o_orderstatus").alias("status"),
                F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
                F.col("o_custkey").alias("cust"),
            ).alias("s"),
        )
    )
    return t.select(
        "o_orderkey",
        F.col("s.status").alias("status"),
        F.col("s.cents").alias("cents"),
        (F.col("s.cents") > 10_000_000).alias("is_large"),
        F.concat(
            F.col("s.status"), F.lit("#"), F.col("s.cust").cast("string")
        ).alias("status_cust"),
    ).orderBy("o_orderkey")


@query(
    "sql_group_order_by_all",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders
    WHERE o_orderkey <= 3000
    GROUP BY ALL
    ORDER BY o_orderstatus, o_orderpriority
    """,
)
def sql_group_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (both engines support it): the analyst-ergonomics
    SQL surface — every non-aggregate select column becomes a grouping
    key without restating the list."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders_gba_v")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
        FROM orders_gba_v
        WHERE o_orderkey <= 3000
        GROUP BY ALL
        ORDER BY o_orderstatus, o_orderpriority
        """
    )


@query(
    "source_binaryfile_scan",
    oracle="""
    WITH ids AS (SELECT unnest(range(0, 12)) AS img_id),
    built AS (
      SELECT img_id,
             'P2' || chr(10) || '4 3' || chr(10) || '255' || chr(10) ||
             array_to_string(list_transform(range(0, 12),
               i -> CAST((img_id * 31 + i * 7) % 256 AS VARCHAR)), ' ') || chr(10)
               AS content
      FROM ids
    )
    SELECT CAST(img_id AS BIGINT) AS img_id,
           CAST(length(content) AS BIGINT) AS n_bytes,
           4 AS width, 3 AS height,
           md5(content) AS content_md5
    FROM built
    ORDER BY img_id
    """,
)
def source_binaryfile_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in ``binaryFile`` source — the ingest path for
    opaque multimodal payloads (operators/multimodal.py consumes the
    same (path, content) shape). Twelve ASCII PGM (P2) images are
    generated deterministically, scanned back as (path, length,
    content) rows, and the header dims are parsed from the decoded
    bytes. ASCII-only payloads make the files reconstructible in SQL,
    so the oracle rebuilds every byte and the md5 proves the source
    delivered content exactly — length metadata, bytes, and filename
    mapping all checked. At scale binaryFile parallelizes per file and
    prunes on pathGlobFilter/modifiedAfter before any byte is read."""
    out_dir = os.path.join(scratch_dir("log2sql_binsrc_"), "pgm")
    os.makedirs(out_dir, exist_ok=True)
    for img_id in range(12):
        pixels = " ".join(str((img_id * 31 + i * 7) % 256) for i in range(12))
        with open(os.path.join(out_dir, f"img_{img_id:02d}.pgm"), "w") as fh:
            fh.write(f"P2\n4 3\n255\n{pixels}\n")

    scan = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pgm")
        .load(out_dir)
    )
    text = F.decode(F.col("content"), "UTF-8")
    return (
        scan.select(
            F.regexp_extract(F.col("path"), r"img_(\d+)\.pgm$", 1)
            .cast("long")
            .alias("img_id"),
            F.col("length").alias("n_bytes"),
            F.regexp_extract(text, r"^P2\n(\d+) (\d+)\n", 1)
            .cast("int")
            .alias("width"),
            F.regexp_extract(text, r"^P2\n(\d+) (\d+)\n", 2)
            .cast("int")
            .alias("height"),
            F.md5("content").alias("content_md5"),
        )
        .orderBy("img_id")
    )


@query(
    "udtf_dynamic_schema",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS BIGINT) AS k,
           CAST(NULL AS BIGINT) AS missing
    FROM events
    WHERE event_id < 200
    ORDER BY event_id
    """,
)
def udtf_dynamic_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 polymorphic UDTF: the ``analyze`` static method decides
    the OUTPUT SCHEMA at plan time from a constant argument (one BIGINT
    column per requested JSON field), the runtime ``eval`` fills it —
    the API for table functions whose shape depends on their call site
    (the engine-side analog of schema-on-read). An absent field yields
    a typed NULL column, not an error; the oracle pins both the
    extracted and the missing column."""
    import json as _json

    from pyspark.sql.functions import udtf
    from pyspark.sql.types import LongType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf(useArrow=True)
    class ExtractFields:
        @staticmethod
        def analyze(props: AnalyzeArgument, fields: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType()
            for name in str(fields.value).split(","):
                schema = schema.add(name.strip(), LongType())
            return AnalyzeResult(schema=schema)

        def __init__(self, analyze_result=None):
            self._names = None

        def eval(self, props: str, fields: str):
            names = [n.strip() for n in fields.split(",")]
            try:
                obj = _json.loads(props or "{}")
            except ValueError:
                obj = {}
            yield tuple(
                int(obj[n]) if isinstance(obj.get(n), (int, float)) else None
                for n in names
            )

    spark.udtf.register("log2sql_extract_fields", ExtractFields)
    load_table(spark, "events", sf_dir).filter(
        F.col("event_id") < 200
    ).createOrReplaceTempView("udtf_events_v")
    return spark.sql(
        """
        SELECT event_id, s.k, s.missing
        FROM udtf_events_v,
             LATERAL log2sql_extract_fields(props, 'k,missing') s
        ORDER BY event_id
        """
    )


@query(
    "sql_parameterized",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders
    WHERE o_orderkey < 2000 AND o_orderstatus <> 'X'
    GROUP BY o_orderstatus
    ORDER BY status
    """,
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 4 named-marker binding): values bind as
    TYPED PARAMETERS, not string-spliced text — the injection-safe API
    a SQL front end should expose (the reference renders statements by
    string formatting, log2sql.py:135-185; this is the engine-side
    answer). The plan under the markers is ordinary Catalyst — the
    literal folds in at analysis, so pushdown and pruning see the
    bound value."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders_param_v")
    return spark.sql(
        """
        SELECT o_orderstatus AS status,
               CAST(count(*) AS BIGINT) AS n,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders_param_v
        WHERE o_orderkey < :max_key AND o_orderstatus <> :excluded
        GROUP BY o_orderstatus
        ORDER BY status
        """,
        args={"max_key": 2000, "excluded": "X"},
    )


@query(
    "array_higher_order_funcs",
    oracle="""
    WITH t AS (
      SELECT p_partkey, string_split(p_name, ' ') AS toks
      FROM part WHERE p_partkey <= 300
    )
    SELECT p_partkey,
           len(list_filter(toks, x -> contains(x, 'a'))) > 0 AS any_a,
           len(list_filter(toks, x -> NOT len(x) >= 3)) = 0 AS all_len3,
           coalesce(array_to_string(list_filter(toks, x -> len(x) > 5), '|'), '')
             AS long_toks,
           CAST(coalesce(list_sum(list_transform(toks, x -> len(x))), 0) * 2
                AS BIGINT) AS double_chars,
           array_to_string(
             list_transform(generate_series(1, len(toks)),
                            i -> toks[i] || '~' || toks[len(toks) + 1 - i]),
             ',') AS zipped
    FROM t
    ORDER BY p_partkey
    """,
)
def array_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions as first-class surface: exists,
    forall, filter, transform+aggregate (with a finish lambda), and
    zip_with — the lambda family that keeps array logic JVM-side
    instead of exploding rows or dropping to Python. The token array is
    materialized once (plain-attribute rule: lambdas over a re-evaluated
    expression go quadratic — see operators/textops.py)."""
    docs = (
        load_table(spark, "part", sf_dir)
        .filter(F.col("p_partkey") <= 300)
        .withColumn("toks", F.split(F.col("p_name"), " "))
    )
    toks = F.col("toks")
    return docs.select(
        "p_partkey",
        F.exists(toks, lambda x: x.contains("a")).alias("any_a"),
        F.forall(toks, lambda x: F.length(x) >= 3).alias("all_len3"),
        F.array_join(
            F.filter(toks, lambda x: F.length(x) > 5), "|"
        ).alias("long_toks"),
        F.aggregate(
            toks,
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.length(x),
            lambda acc: acc * 2,
        ).alias("double_chars"),
        F.array_join(
            F.zip_with(toks, F.reverse(toks), lambda a, b: F.concat(a, F.lit("~"), b)),
            ",",
        ).alias("zipped"),
    ).orderBy("p_partkey")


@query(
    "join_null_safe",
    oracle="""
    WITH l AS (
      SELECT o_orderkey AS k, nullif(o_orderstatus, 'O') AS grp
      FROM orders WHERE o_orderkey < 5000
    ),
    dim AS (
      SELECT grp, 'seg_' || coalesce(grp, 'open') AS label
      FROM (SELECT DISTINCT nullif(o_orderstatus, 'O') AS grp
            FROM orders WHERE o_orderkey < 5000)
    )
    SELECT d.label, CAST(count(*) AS BIGINT) AS n
    FROM l JOIN dim d ON l.grp IS NOT DISTINCT FROM d.grp
    GROUP BY d.label
    ORDER BY d.label
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of silently dropping — the semantics a CDC
    key join needs when the unique key is nullable (reference analog:
    the NULL-aware WHERE predicate, log2sql.py:127-132, lifted into a
    join). Spark plans eqNullSafe as an ordinary hash join key (NULLs
    hash to one bucket) — still broadcastable, no BNLJ."""
    orders = load_table(spark, "orders", sf_dir).filter(F.col("o_orderkey") < 5000)
    l = orders.select(
        F.col("o_orderkey").alias("k"),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("grp"),
    )
    dim = (
        l.select("grp")
        .distinct()
        .withColumn("label", F.concat(F.lit("seg_"), F.coalesce("grp", F.lit("open"))))
        .withColumnRenamed("grp", "dgrp")
    )
    return (
        l.join(F.broadcast(dim), l["grp"].eqNullSafe(dim["dgrp"]))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("label")
    )


@query(
    "sql_pipe_syntax",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders
    WHERE o_orderkey < 5000
    GROUP BY o_orderstatus
    HAVING count(*) > 10
    ORDER BY status
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL pipe syntax (|>): the same relational pipeline a
    nested SELECT expresses, written as sequential |> stages — the
    readability surface SQL:2023-era engines converge on. Catalyst
    lowers the pipeline to the identical logical plan (filter pushdown
    and partial aggregation unchanged), so this is a front-end feature
    with zero plan cost; the oracle is the classic formulation of the
    same query."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders_pipe_v")
    return spark.sql(
        """
        FROM orders_pipe_v
        |> WHERE o_orderkey < 5000
        |> EXTEND CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |> AGGREGATE count(*) AS n_orders,
                     CAST(sum(cents) AS BIGINT) AS cents,
                     CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
           GROUP BY o_orderstatus AS status
        |> WHERE n_orders > 10
        |> ORDER BY status
        |> SELECT status, n_orders, cents, n_customers
        """
    )


@query(
    "market_basket_pairs",
    oracle="""
    WITH op AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), n_orders AS (
      SELECT CAST(count(DISTINCT o) AS BIGINT) AS n FROM op
    ), item AS (
      SELECT p, CAST(count(*) AS BIGINT) AS c FROM op GROUP BY p
    ), pair AS (
      SELECT a.p AS pa, b.p AS pb, CAST(count(*) AS BIGINT) AS c
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p
    )
    SELECT pa, pb, pair.c AS n_both,
           ia.c AS n_a, ib.c AS n_b,
           pair.c * 10000 // (SELECT n FROM n_orders) AS support_bp,
           pair.c * 10000 // ia.c AS confidence_a_to_b_bp,
           pair.c * (SELECT n FROM n_orders) * 1000 // (ia.c * ib.c) AS lift_milli
    FROM pair
    JOIN item ia ON ia.p = pa
    JOIN item ib ON ib.p = pb
    WHERE pair.c >= 3
    ORDER BY n_both DESC, pa, pb
    LIMIT 100
    """,
)
def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules at the pair level: for parts
    bought together, exact support / confidence / lift in integer
    basis points and milli-units (truncating cross-multiplication, so
    every rule metric hashes cross-engine). The candidate join is
    per-order and baskets are small (~7 lines), so pair generation is
    C(basket,2) per order — linear in orders with a small constant,
    never |parts|²; counts partial-aggregate map-side and the top-100
    runs as TakeOrdered with a full tie-break. The a-priori first
    level of recommendation/affinity mining, a family the registry
    lacked."""
    li = load_table(spark, "lineitem", sf_dir)
    # ONE shuffle builds the per-order basket: collect_set dedups
    # (order, part) inside the aggregate, so the former standalone
    # DISTINCT exchange over |lineitem| wide rows is gone, and order
    # count + per-part counts both derive from the persisted baskets
    # (count of rows, explode of the already-distinct arrays) instead
    # of re-shuffling the (o, p) relation (guide §2.4: two operations
    # keyed the same way share one exchange).
    baskets = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .groupBy("o")
        .agg(F.sort_array(F.collect_set("p")).alias("ps"))
        .persist()
    )
    n_orders = baskets.agg(F.count(F.lit(1)).cast("long").alias("n"))
    item = (
        baskets.select(F.explode("ps").alias("p"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    # Pair generation per BASKET, not a self-join: C(basket,2) pairs
    # fall out of per-row array combinatorics (flatten of suffix
    # slices) — the self-join formulation shuffles the (order, part)
    # rows twice and sort-merges them; this shape halves the sf1 wall.
    pairs_arr = F.flatten(
        F.transform(
            "ps",
            lambda x, i: F.transform(
                F.slice(F.col("ps"), i + 2, F.size("ps") - i - 1),
                lambda y: F.struct(x.alias("pa"), y.alias("pb")),
            ),
        )
    )
    pair = (
        baskets.select(F.explode(pairs_arr).alias("pr"))
        .groupBy(F.col("pr.pa").alias("pa"), F.col("pr.pb").alias("pb"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
        .filter(F.col("n_both") >= 3)
    )
    ia = item.select(F.col("p").alias("pa"), F.col("c").alias("n_a"))
    ib = item.select(F.col("p").alias("pb"), F.col("c").alias("n_b"))
    return (
        pair.join(ia, "pa")
        .join(ib, "pb")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "pa",
            "pb",
            "n_both",
            "n_a",
            "n_b",
            F.expr("n_both * 10000 DIV n").alias("support_bp"),
            F.expr("n_both * 10000 DIV n_a").alias("confidence_a_to_b_bp"),
            F.expr("n_both * n * 1000 DIV (n_a * n_b)").alias("lift_milli"),
        )
        .orderBy(F.desc("n_both"), "pa", "pb")
        .limit(100)
    )


@query(
    "sql_scalar_udf",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)
                    + CAST(round(o_totalprice * 100) AS BIGINT) * 850 // 10000)
                AS BIGINT) AS taxed_cents
    FROM orders
    WHERE o_orderkey < 5000
    GROUP BY o_orderstatus
    ORDER BY status
    """,
)
def sql_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL scalar UDFs (CREATE TEMPORARY FUNCTION ... RETURN
    expr): business logic named ONCE in SQL and reused across queries —
    and because the body is a SQL expression, Catalyst INLINES it
    (no Python, no serialization boundary, full codegen/pushdown —
    the plan is identical to writing the expression by hand, which is
    exactly what the oracle does). Here: integer-cents conversion and
    an 8.5% integer-bp tax composed through two functions."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION cents(x DOUBLE) RETURNS BIGINT "
        "RETURN CAST(round(x * 100) AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION taxed(c BIGINT, bp BIGINT) "
        "RETURNS BIGINT RETURN c + c * bp DIV 10000"
    )
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders_udf_v")
    return spark.sql(
        """
        SELECT o_orderstatus AS status,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(taxed(cents(o_totalprice), 850)) AS BIGINT) AS taxed_cents
        FROM orders_udf_v
        WHERE o_orderkey < 5000
        GROUP BY o_orderstatus
        ORDER BY status
        """
    )


@query(
    "join_spatial_grid_radius",
    oracle="""
    WITH p AS (
      SELECT CAST(100 * ceil(sqrt(count(*))) AS BIGINT) AS side FROM customer
    ), c AS (
      SELECT c_custkey AS ck,
             (c_custkey * 7919) % side AS x,
             (c_custkey * 104729) % side AS y
      FROM customer, p
    ), s AS (
      SELECT s_suppkey AS sk,
             (s_suppkey * 7919) % side AS x,
             (s_suppkey * 104729) % side AS y
      FROM supplier, p
    )
    SELECT c.ck AS custkey,
           CAST(count(*) AS BIGINT) AS n_nearby,
           CAST(min((c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y))
                AS BIGINT) AS min_dist2
    FROM c JOIN s
      ON (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) <= 250000
    GROUP BY c.ck
    ORDER BY custkey
    """,
)
def join_spatial_grid_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius join via grid bucketing — the geohash/S2-cell
    pattern that turns an all-pairs distance predicate into an
    equi-join. Points get deterministic integer coordinates on a
    square plane whose side scales as 100·⌈√n⌉ (hash-derived from
    their keys), so point DENSITY is constant across scale factors —
    the way real geographic data scales (more points cover more area,
    not the same city packed 100x denser). Each supplier is replicated
    into its 3x3 neighborhood of radius-sized (500) grid cells,
    customers land in exactly one cell, and the cell equi-join plus an
    exact integer distance filter finds every pair within the radius —
    cell size = radius guarantees the neighborhood covers all
    candidates, and the single-cell side means no pair is produced
    twice, so no dedup pass. The plane side is a 1-row aggregate
    broadcast to both sides (the bounded-stats-crossJoin precedent),
    never a driver collect.

    The ORACLE is the naive theta-join (fine at sf0.01); the engine
    side is the plan that survives scale: a hash shuffle on cell id
    with constant 9x replication of the smaller side, per-cell
    candidate counts bounded by the constant point density — at a
    billion points per side the naive plan is 10^18 pairs while this
    one touches only neighbor-cell candidates (sf10/sf1 wall ratio
    measured in BENCH sf10_linearity; the fixed-plane variant measured
    31.7x there, the density-constant one is linear). Skewed cells
    (hot spots) fall to AQE skew-join like any other equi-join, which
    no theta-join gets.

    Reference analog: none (extension join family, SURVEY.md §2.2).
    """
    customer = load_table(spark, "customer", sf_dir)
    supplier = load_table(spark, "supplier", sf_dir)

    p = customer.agg(
        (F.ceil(F.sqrt(F.count(F.lit(1)))) * 100).cast("long").alias("side")
    )
    c = customer.crossJoin(F.broadcast(p)).select(
        F.col("c_custkey").alias("ck"),
        (F.col("c_custkey") * 7919 % F.col("side")).alias("cx"),
        (F.col("c_custkey") * 104729 % F.col("side")).alias("cy"),
    ).withColumns(
        {
            "gx": F.expr("cx DIV 500"),
            "gy": F.expr("cy DIV 500"),
        }
    )
    s = supplier.crossJoin(F.broadcast(p)).select(
        F.col("s_suppkey").alias("sk"),
        (F.col("s_suppkey") * 7919 % F.col("side")).alias("sx"),
        (F.col("s_suppkey") * 104729 % F.col("side")).alias("sy"),
    ).withColumn(
        "off",
        F.explode(
            F.expr(
                "flatten(transform(sequence(-1, 1), dx ->"
                " transform(sequence(-1, 1), dy -> struct(dx, dy))))"
            )
        ),
    ).select(
        "sk", "sx", "sy",
        F.expr("sx DIV 500 + off.dx").alias("gx"),
        F.expr("sy DIV 500 + off.dy").alias("gy"),
    )
    d2 = (F.col("cx") - F.col("sx")) * (F.col("cx") - F.col("sx")) + (
        F.col("cy") - F.col("sy")
    ) * (F.col("cy") - F.col("sy"))
    return (
        c.join(s, ["gx", "gy"])
        .filter(d2 <= 250000)
        .groupBy(F.col("ck").alias("custkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nearby"),
            F.min(d2).cast("long").alias("min_dist2"),
        )
        .orderBy("custkey")
    )


@query(
    "events_funnel_latency_quantiles",
    oracle="""
    WITH ev AS (SELECT user_id, event_type, ts FROM events),
    v AS (
      SELECT user_id, min(ts) AS view_ts FROM ev WHERE event_type = 'view'
      GROUP BY user_id
    ),
    c AS (
      SELECT ev.user_id, min(ts) AS click_ts
      FROM ev JOIN v USING (user_id)
      WHERE event_type = 'click' AND ts > view_ts
      GROUP BY ev.user_id
    ),
    p AS (
      SELECT ev.user_id, min(ts) AS purchase_ts
      FROM ev JOIN c USING (user_id)
      WHERE event_type = 'purchase' AND ts > click_ts
      GROUP BY ev.user_id
    ),
    lat AS (
      SELECT v.user_id,
             CAST(date_diff('microsecond', view_ts, purchase_ts) // 1000000
                  AS BIGINT) AS s
      FROM v JOIN c ON v.user_id = c.user_id
             JOIN p ON v.user_id = p.user_id
    ),
    ranked AS (
      SELECT s, row_number() OVER (ORDER BY s, user_id) AS rn,
             count(*) OVER () AS n
      FROM lat
    )
    SELECT CAST(n AS BIGINT) AS n_converted,
           CAST(min(s) AS BIGINT) AS min_s,
           CAST(max(CASE WHEN rn = (n + 1) // 2 THEN s END) AS BIGINT) AS p50_s,
           CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN s END) AS BIGINT)
             AS p90_s,
           CAST(max(s) AS BIGINT) AS max_s
    FROM ranked GROUP BY n
    """,
)
def events_funnel_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel latency distribution (view→click→purchase completion
    time): exact order statistics via the kth-element pick — p50 is
    THE ((n+1) DIV 2)-th smallest latency, p90 the ceil(0.9n)-th
    (integer form (9n+9) DIV 10), with a user_id tie-break so both
    engines select the same row even among equal latencies. No
    percentile_cont interpolation (float, engine-specific) and no
    approx sketch — the ranked set is PER-CONVERTED-USER (one row per
    user after the funnel windows collapse the event stream), and the
    global rank is computed DISTRIBUTED (r14): per-latency-group
    row_number + cumulative base rank over |distinct integer
    latencies| (time-range-bounded, never |users|) via
    ``distributed_global_rank``, and the total count as a 1-row
    broadcast aggregate — no Exchange SinglePartition over row data,
    unlike the oracle's global window, with bit-identical kth picks.

    Reference analog: none (extension surface, SURVEY.md §2.2).
    """
    events = load_table(spark, "events", sf_dir).select(
        "user_id", "event_type", "ts"
    )
    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    c = (
        events.join(v, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("view_ts")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        events.join(c, "user_id")
        .filter(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("click_ts"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    lat = (
        v.join(c, "user_id")
        .join(p, "user_id")
        .select(
            "user_id",
            F.expr(
                "timestampdiff(MICROSECOND, view_ts, purchase_ts) DIV 1000000"
            ).cast("long").alias("s"),
        )
    )
    from log2sql_spark.operators.ranks import distributed_global_rank

    n_total = lat.agg(F.count(F.lit(1)).alias("n"))
    ranked = (
        distributed_global_rank(lat, "s", ["user_id"], out="rn")
        .crossJoin(F.broadcast(n_total))
        .select("s", "rn", "n")
    )
    return ranked.groupBy(F.col("n").cast("long").alias("n_converted")).agg(
        F.min("s").cast("long").alias("min_s"),
        F.max(F.when(F.expr("rn = (n + 1) DIV 2"), F.col("s")))
        .cast("long")
        .alias("p50_s"),
        F.max(F.when(F.expr("rn = (9 * n + 9) DIV 10"), F.col("s")))
        .cast("long")
        .alias("p90_s"),
        F.max("s").cast("long").alias("max_s"),
    )


_BLOOMJ_BITS = 1 << 16  # 64 Kbit = 8 KiB bitmap, k=2 md5 slices


@query(
    "join_bloom_prefilter",
    oracle="""
    WITH flagged AS (
      SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderkey % 97 = 0
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem JOIN flagged ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom semi-join reduction — the classic distributed-join
    optimization (a hand-built runtime row-level filter, the technique
    behind Spark's runtime.bloomFilter AQE rule, made explicit and
    portable): the small side's join keys fold into an 8 KiB bitmap (2
    md5-slice hashes), which rides into the FACT SCAN as an array<long>
    literal — a map-only membership test that drops ~99% of lineitem
    rows BEFORE they reach the join exchange. False positives pass the
    bloom but die in the exact (broadcast) join, so the result is
    bit-identical to the plain join the oracle runs; what changes is
    WHERE rows die — at 100 TB the shuffle the bloom avoids is the
    dominant cost of a selective fact-dim join, and unlike a broadcast
    semi-join of the exact key set, the bitmap stays 8 KiB however
    many keys qualify. Plan-asserted in tests/test_plans.py: the bit
    test sits in the scan-side Filter, under the join."""
    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    flagged = orders.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey", "o_orderpriority"
    )

    def positions(expr: str, start: int) -> str:
        return (
            f"pmod(cast(conv(substr(md5({expr}), {start}, 15), 16, 10)"
            f" as bigint), {_BLOOMJ_BITS})"
        )

    pos = (
        flagged.select(
            F.explode(
                F.array(
                    F.expr(positions("cast(o_orderkey as string)", 1)),
                    F.expr(positions("cast(o_orderkey as string)", 9)),
                )
            ).alias("p")
        )
        .distinct()
    )
    words = [0] * (_BLOOMJ_BITS // 64)
    for (p,) in pos.collect():  # bounded by m/64 = 1024 longs, 8 KiB
        words[p // 64] |= 1 << (p % 64)
    bitmap = F.lit([w - (1 << 64) if w >= (1 << 63) else w for w in words])

    def bit_test(start: int) -> str:
        p = positions("cast(l_orderkey as string)", start)
        return (
            f"(shiftright(element_at(_bm, cast({p} div 64 as int) + 1),"
            f" cast({p} % 64 as int)) & 1) = 1"
        )

    prefiltered = (
        lineitem.withColumn("_bm", bitmap)
        .filter(F.expr(f"{bit_test(1)} AND {bit_test(9)}"))
        .drop("_bm")
    )
    return (
        prefiltered.join(
            F.broadcast(flagged), F.col("l_orderkey") == F.col("o_orderkey")
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("bigint")
            ).cast("long").alias("revenue_cents"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "events_feature_asof_training",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec
      FROM events
    ), feat AS (
      SELECT *,
             CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN 1 END)
               OVER (PARTITION BY user_id ORDER BY sec
                     RANGE BETWEEN 604800 PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS clicks_7d,
             last_value(CASE WHEN event_type = 'view' THEN cents END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY sec, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_view_cents,
             CAST(min(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS first_sec
      FROM ev
    )
    SELECT user_id, event_id AS label_event_id, cents AS label_cents,
           clicks_7d, last_view_cents,
           CAST((sec - first_sec) // 86400 AS BIGINT) AS days_since_first
    FROM feat
    WHERE event_type = 'purchase'
    ORDER BY user_id, label_event_id
    """,
)
def events_feature_asof_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct feature assembly — the feature-store /
    training-set backfill pattern: every purchase becomes a labeled
    example whose features are computed STRICTLY from its past (a
    trailing 7-day click count via a time-RANGE frame ending 1 second
    before the label, the last pre-label view amount via an
    IGNORE NULLS value carry ending 1 row before, and account age from
    a running min) — the leakage discipline that separates a valid
    training set from one that quietly reads the future. All three
    features ride ONE per-user window partitioning: the events shuffle
    once on user_id, labels and features never join (the classic
    as-of-join formulation would shuffle twice). Epochs are floored to
    seconds on both engines (DuckDB's epoch() CAST rounds — the LTTB
    lesson). Reference analog: none — LLM/training-pipeline extension
    (SURVEY.md §2.2)."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        F.unix_timestamp("ts").cast("bigint").alias("sec"),
    )
    w_range = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-604800, -1)
    )
    w_rows = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    feat = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "cents",
        "sec",
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "click", 1)).over(w_range),
            F.lit(0),
        ).cast("long").alias("clicks_7d"),
        F.last(
            F.when(F.col("event_type") == "view", F.col("cents")), ignorenulls=True
        ).over(w_rows).alias("last_view_cents"),
        F.min("sec").over(w_run).cast("long").alias("first_sec"),
    )
    return (
        feat.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("label_event_id"),
            F.col("cents").alias("label_cents"),
            "clicks_7d",
            "last_view_cents",
            F.expr("CAST((sec - first_sec) DIV 86400 AS BIGINT)").alias(
                "days_since_first"
            ),
        )
        .orderBy("user_id", "label_event_id")
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_distinct_orders,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 bitmap aggregate family (bitmap_bucket_number /
    bitmap_bit_position / bitmap_construct_agg / bitmap_count): EXACT
    distinct counting as re-aggregable state — the exact twin of the
    HLL sketch rollup (sketch_hll_distinct_users): each (group, 32k-id
    bucket) folds its ids into one bitmap map-side, buckets re-aggregate
    into per-group totals, and — unlike count(DISTINCT) — the partial
    bitmaps can be STORED and merged later (bitmap_or_agg), which is
    what makes exact distinct rollups incremental at warehouse scale.
    The oracle checks plain COUNT(DISTINCT); the bitmap path must agree
    exactly, being a set representation rather than an estimate."""
    li = load_table(spark, "lineitem", sf_dir)
    buckets = (
        li.groupBy(
            "l_returnflag",
            F.expr("bitmap_bucket_number(l_orderkey)").alias("bucket"),
        )
        .agg(
            F.expr(
                "bitmap_construct_agg(bitmap_bit_position(l_orderkey))"
            ).alias("bm"),
            F.count(F.lit(1)).alias("rows_in_bucket"),
        )
    )
    return (
        buckets.groupBy("l_returnflag")
        .agg(
            F.sum(F.expr("bitmap_count(bm)")).alias("n_distinct_orders"),
            F.sum("rows_in_bucket").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_within_group_ordered_set",
    oracle="""
    WITH counts AS (
      SELECT o_orderpriority, o_orderstatus, count(*) AS c
      FROM orders GROUP BY 1, 2
    ), mx AS (
      SELECT o_orderpriority, max(c) AS top FROM counts GROUP BY 1
    ), best AS (
      SELECT counts.o_orderpriority,
             min(o_orderstatus) FILTER (WHERE c = top) AS mode_status
      FROM counts JOIN mx USING (o_orderpriority)
      GROUP BY counts.o_orderpriority
    )
    SELECT o.o_orderpriority,
           CAST(percentile_disc(0.5) WITHIN GROUP
                (ORDER BY round(o_totalprice * 100)) AS BIGINT)
             AS median_cents_disc,
           CAST(percentile_disc(0.9) WITHIN GROUP
                (ORDER BY round(o_totalprice * 100)) AS BIGINT)
             AS p90_cents_disc,
           max(b.mode_status) AS mode_status,
           CAST(count(*) AS BIGINT) AS n
    FROM orders o JOIN best b ON b.o_orderpriority = o.o_orderpriority
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def agg_within_group_ordered_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI ordered-set aggregates via SQL ``WITHIN GROUP`` syntax —
    the standard's spelling of order-dependent aggregation, parsed by
    Spark 4's SQL front end (PERCENTILE_DISC / MODE). PERCENTILE_DISC
    picks an ACTUAL value (the discrete order statistic), so unlike the
    interpolated percentile_cont there is no float blend to disagree
    on — integer cents in, integer cents out. MODE is restated
    deterministically on the Spark side the same way
    agg_mode_deterministic does (count + ranked pick with a value
    tie-break), because built-in mode() is legally nondeterministic on
    tied groups; the oracle restates it identically as
    min-of-most-frequent. Both engines run the SAME ANSI WITHIN GROUP
    spelling for the discrete percentiles."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("wg_orders_v")
    return spark.sql(
        """
        WITH ranked_mode AS (
          SELECT o_orderpriority, o_orderstatus, count(*) AS c
          FROM wg_orders_v GROUP BY o_orderpriority, o_orderstatus
        ), best AS (
          SELECT o_orderpriority,
                 min_by(o_orderstatus,
                        struct(-c, o_orderstatus)) AS mode_status
          FROM ranked_mode GROUP BY o_orderpriority
        )
        SELECT w.o_orderpriority,
               CAST(percentile_disc(0.5) WITHIN GROUP
                    (ORDER BY round(o_totalprice * 100)) AS BIGINT)
                 AS median_cents_disc,
               CAST(percentile_disc(0.9) WITHIN GROUP
                    (ORDER BY round(o_totalprice * 100)) AS BIGINT)
                 AS p90_cents_disc,
               max(b.mode_status) AS mode_status,
               count(*) AS n
        FROM wg_orders_v w JOIN best b ON b.o_orderpriority = w.o_orderpriority
        GROUP BY w.o_orderpriority
        ORDER BY w.o_orderpriority
        """
    )


@query(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    ),
    pairs AS (
      SELECT prev_type AS from_type, event_type AS to_type,
             count(*) AS n_transitions
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT from_type, CAST(sum(n_transitions) AS BIGINT) AS from_total
      FROM pairs GROUP BY 1
    )
    SELECT p.from_type AS from_type, p.to_type AS to_type,
           n_transitions, from_total,
           CAST(n_transitions * 10000 // from_total AS BIGINT) AS prob_bp
    FROM pairs p JOIN tot USING (from_type)
    ORDER BY from_type, to_type
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey transition matrix (first-order Markov chain over
    event types): per user, each event's predecessor via ONE lag window
    keyed (user_id, ts, event_id), then (from, to) counts and the
    per-source transition probability in integer basis points
    (truncating: Spark ``DIV`` == DuckDB ``//`` on positives, the
    cross-engine-safe division).

    Scale shape: the lag shuffle is the only |events|-sized exchange
    (same key a sessionize/funnel pipeline already partitions by, so it
    co-schedules with them); everything after operates on at most
    |event_types|^2 rows. The from-side totals come from a window over
    the tiny pair table — no second pass over events, no join back.
    At 100 TB this is one shuffle plus arithmetic on a ~dozens-row
    matrix. Product-analytics parity: the journey/flow graph behind
    Sankey views (Amplitude Pathfinder / GA4 path exploration)."""
    ev = load_table(spark, "events", sf_dir).select("user_id", "event_type", "ts", "event_id")
    seq = ev.withColumn(
        "prev_type",
        F.lag("event_type").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ),
    )
    pairs = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    w_from = Window.partitionBy("from_type")
    return (
        pairs.withColumn(
            "from_total", F.sum("n_transitions").over(w_from).cast("long")
        )
        .withColumn(
            "prob_bp", F.expr("n_transitions * 10000 DIV from_total").cast("long")
        )
        .select("from_type", "to_type", "n_transitions", "from_total", "prob_bp")
        .orderBy("from_type", "to_type")
    )


@query(
    "agg_apportionment_largest_remainder",
    oracle="""
    WITH counts AS (
      SELECT n.n_name AS nation,
             CAST(count(*) AS BIGINT) AS n_customers
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1
    ), quotas AS (
      SELECT nation, n_customers,
             (n_customers * 100) // sum(n_customers) OVER () AS floor_seats,
             (n_customers * 100) % sum(n_customers) OVER () AS remainder_units
      FROM counts
    ), ranked AS (
      SELECT nation, n_customers, floor_seats, remainder_units,
             rank() OVER (ORDER BY remainder_units DESC, nation) AS rem_rank,
             100 - sum(floor_seats) OVER () AS seats_left
      FROM quotas
    )
    SELECT nation, n_customers,
           CAST(floor_seats AS BIGINT) AS floor_seats,
           CAST(rem_rank <= seats_left AS BIGINT) AS extra_seat,
           CAST(floor_seats + CAST(rem_rank <= seats_left AS BIGINT) AS BIGINT)
             AS seats
    FROM ranked
    ORDER BY nation
    """,
)
def agg_apportionment_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment: allocate 100 seats
    to nations proportionally to customer count — the shard/budget/
    quota allocation primitive (same math assigns executor slots to
    tenants or sampling budgets to sources). Exact integer arithmetic:
    floor quotas via truncating division, leftover seats to the largest
    remainders with a (remainder DESC, nation) tie-break that makes the
    allocation unique, so both engines pick identical winners. Shape:
    one groupBy to 25 rows, then windows over those 25 — the unbounded
    windows never see raw rows, so the pattern holds at any fact-table
    scale."""
    customer = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    counts = (
        customer.join(
            F.broadcast(nation),
            customer.c_nationkey == nation.n_nationkey,
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    all_w = Window.partitionBy(F.lit(1))
    quotas = counts.select(
        "nation",
        "n_customers",
        F.expr("n_customers * 100").alias("units"),
        F.sum("n_customers").over(all_w).alias("total"),
    ).select(
        "nation",
        "n_customers",
        F.expr("units DIV total").alias("floor_seats"),
        (F.col("units") % F.col("total")).alias("remainder_units"),
    )
    ranked = quotas.select(
        "nation",
        "n_customers",
        "floor_seats",
        F.rank()
        .over(Window.orderBy(F.col("remainder_units").desc(), F.col("nation")))
        .alias("rem_rank"),
        (F.lit(100) - F.sum("floor_seats").over(all_w)).alias("seats_left"),
    )
    return ranked.select(
        "nation",
        "n_customers",
        F.col("floor_seats").cast("long").alias("floor_seats"),
        (F.col("rem_rank") <= F.col("seats_left")).cast("long").alias("extra_seat"),
        (
            F.col("floor_seats")
            + (F.col("rem_rank") <= F.col("seats_left")).cast("long")
        )
        .cast("long")
        .alias("seats"),
    ).orderBy("nation")


def _morton_interleave(tx, ty, bits: int):
    """Morton (Z-order) code as a column expression: interleave the low
    ``bits`` of tx (even positions) and ty (odd positions) — pure
    shifts and masks, runs entirely in whole-stage codegen."""
    code = F.lit(0)
    for i in range(bits):
        code = (
            code
            + F.shiftleft(F.shiftright(tx, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(ty, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return code


@query(
    "geo_morton_tile_agg",
    oracle="""
    WITH pts AS (
      SELECT (o_orderkey % 251) // 16 AS tx,
             (o_custkey % 241) // 16 AS ty,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), coded AS (
      SELECT tx, ty,
             ((tx >> 0) & 1) * 1 + ((ty >> 0) & 1) * 2
             + ((tx >> 1) & 1) * 4 + ((ty >> 1) & 1) * 8
             + ((tx >> 2) & 1) * 16 + ((ty >> 2) & 1) * 32
             + ((tx >> 3) & 1) * 64 + ((ty >> 3) & 1) * 128 AS morton,
             cents
      FROM pts
    )
    SELECT CAST(morton AS BIGINT) AS morton,
           CAST(min(tx) AS BIGINT) AS tile_x,
           CAST(min(ty) AS BIGINT) AS tile_y,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM coded
    GROUP BY morton
    ORDER BY morton
    """,
)
def geo_morton_tile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) tile aggregation — the locality-preserving geo
    partitioning key (GeoMesa/Uber-H3 family): interleaving the tile
    coordinates' bits makes lexicographically-adjacent keys spatially
    adjacent, so range scans over the code touch contiguous tiles and
    a 100 TB point table clustered by it prunes 2-D box queries with a
    1-D key (same property the store's zorder layout exploits,
    store/zorder.py). Coordinates derive deterministically from order
    keys (no geo columns in the fixture); the interleave is 8 bits of
    shifts/masks — all whole-stage codegen, one groupBy on the code.
    min(tx)=tx per group (the code determines the tile), kept so the
    oracle proves the decode round-trips."""
    orders = load_table(spark, "orders", sf_dir)
    pts = orders.select(
        F.expr("(o_orderkey % 251) DIV 16").cast("int").alias("tx"),
        F.expr("(o_custkey % 241) DIV 16").cast("int").alias("ty"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    coded = pts.select(
        _morton_interleave(F.col("tx"), F.col("ty"), 4).alias("morton"),
        "tx", "ty", "cents",
    )
    return (
        coded.groupBy("morton")
        .agg(
            F.min("tx").cast("long").alias("tile_x"),
            F.min("ty").cast("long").alias("tile_y"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("total_cents"),
        )
        .select(
            F.col("morton").cast("long").alias("morton"),
            "tile_x", "tile_y", "n_orders", "total_cents",
        )
        .orderBy("morton")
    )


@query(
    "date_business_days_lead_time",
    oracle="""
    WITH first_ship AS (
      SELECT l_orderkey, min(l_shipdate) AS ship
      FROM lineitem GROUP BY l_orderkey
    ), lead_times AS (
      SELECT o.o_orderpriority AS priority,
             -- business days in [orderdate, ship): f(b) - f(a) with
             -- f(x) = 5*(x//7) + least(x%7, 5), x = days since a
             -- Monday anchor BEFORE every date (divisions stay on
             -- non-negative operands, so // and DIV agree)
             (5 * (datediff('day', DATE '1994-12-26', s.ship) // 7)
              + least(datediff('day', DATE '1994-12-26', s.ship) % 7, 5))
             - (5 * (datediff('day', DATE '1994-12-26', o.o_orderdate) // 7)
                + least(datediff('day', DATE '1994-12-26', o.o_orderdate) % 7, 5))
               AS bdays
      FROM orders o JOIN first_ship s ON o.o_orderkey = s.l_orderkey
    )
    SELECT priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(min(bdays) AS BIGINT) AS min_bdays,
           CAST(max(bdays) AS BIGINT) AS max_bdays,
           CAST(sum(bdays) * 100 // count(*) AS BIGINT) AS avg_bdays_e2
    FROM lead_times
    GROUP BY priority
    ORDER BY priority
    """,
)
def date_business_days_lead_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-day (Mon–Fri) lead time from order to first shipment,
    by priority — calendar arithmetic no engine builds in. The
    closed form counts business days from a fixed MONDAY anchor:
    f(x) = 5·(x div 7) + min(x mod 7, 5), so bdays[a, b) = f(b) − f(a)
    — pure integer ops on the datediff, no per-day explode, no
    calendar table join, O(1) per row in whole-stage codegen (the
    naive sequence-explode form materializes |span| rows per order and
    dies at scale). The anchor predates every date in the data, so
    div/mod run on non-negative operands where Spark's truncating DIV
    and DuckDB's flooring // agree — the same cross-engine division
    trap the gapfill family documents. Weekday-convention-free by
    construction: both engines only compute day differences."""
    lineitem = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    first_ship = lineitem.groupBy("l_orderkey").agg(
        F.min("l_shipdate").alias("ship")
    )

    def bd(col):
        x = F.datediff(F.col(col).cast("date"), F.lit("1994-12-26").cast("date"))
        return F.lit(5) * F.floor(x / 7).cast("long") + F.least(
            x % 7, F.lit(5)
        ).cast("long")

    lead = orders.join(
        first_ship, orders.o_orderkey == first_ship.l_orderkey
    ).select(
        F.col("o_orderpriority").alias("priority"),
        (bd("ship") - bd("o_orderdate")).alias("bdays"),
    )
    return (
        lead.groupBy("priority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("bdays").alias("min_bdays"),
            F.max("bdays").alias("max_bdays"),
            F.expr("sum(bdays) * 100 DIV count(*)").cast("long").alias("avg_bdays_e2"),
        )
        .orderBy("priority")
    )


@query(
    "ts_peak_detection_prominence",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS d,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ), nbr AS (
      SELECT event_type, d, cents,
             lag(cents) OVER (PARTITION BY event_type ORDER BY d) AS prev,
             lead(cents) OVER (PARTITION BY event_type ORDER BY d) AS nxt
      FROM daily
    )
    SELECT event_type, d, cents,
           CAST(cents - greatest(prev, nxt) AS BIGINT) AS prominence_cents
    FROM nbr
    WHERE prev IS NOT NULL AND nxt IS NOT NULL
      AND cents > prev AND cents > nxt
    ORDER BY event_type, d
    """,
)
def ts_peak_detection_prominence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-maximum (peak) detection with neighbor prominence over
    each event type's daily revenue — the alerting/spike-triage shape.
    A peak is STRICTLY above both neighbors (ties are not peaks, so
    the predicate is deterministic without a tie-break); prominence is
    the height over the taller neighbor. One lag + one lead over the
    same (type, day) window spec = a single window stage after one
    shuffle on event_type; series boundaries are excluded explicitly
    (NULL neighbors), not silently treated as -inf. Runs on the tiny
    per-day rollup, never raw events."""
    events = load_table(spark, "events", sf_dir)
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"))
    w = Window.partitionBy("event_type").orderBy("d")
    nbr = daily.select(
        "event_type", "d", "cents",
        F.lag("cents").over(w).alias("prev"),
        F.lead("cents").over(w).alias("nxt"),
    )
    return (
        nbr.filter(
            F.col("prev").isNotNull()
            & F.col("nxt").isNotNull()
            & (F.col("cents") > F.col("prev"))
            & (F.col("cents") > F.col("nxt"))
        )
        .select(
            "event_type", "d", "cents",
            (F.col("cents") - F.greatest("prev", "nxt"))
            .cast("long")
            .alias("prominence_cents"),
        )
        .orderBy("event_type", "d")
    )


@query(
    "events_rate_anomaly_poisson",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS d,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ), rates AS (
      SELECT event_type, d, x,
             CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS total,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS days
      FROM hourly
    )
    SELECT event_type, d, x, total, days,
           CAST((x * days - total) * (x * days - total)
                > 9 * total * days AS BIGINT) AS is_anomaly
    FROM rates
    WHERE (x * days - total) * (x * days - total) > 9 * total * days
    ORDER BY event_type, d
    """,
)
def events_rate_anomaly_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson rate anomalies (statistical process control): flag hours
    where a type's event count leaves the 3-sigma band around its mean
    hourly rate λ = total/hours (hourly buckets: enough variance for
    the band to bite — daily counts in this fixture never breach 3σ). The test |x − λ| > 3·√λ is irrational as
    written; cross-multiplying by days² makes it EXACT INTEGER:
    (x·days − total)² > 9·total·days — no square roots, no float CDFs,
    bit-identical across engines (the same trick as the KS and
    chi-square screens). One aggregate to |type × day| rows, one
    unbounded window per type for (total, days) — the scan never feeds
    the window. The λ here is in events/day, so the band is the
    classic c-chart control limit."""
    events = load_table(spark, "events", sf_dir)
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("x"))
    wt = Window.partitionBy("event_type")
    rates = hourly.select(
        "event_type", "d", "x",
        F.sum("x").over(wt).alias("total"),
        F.count(F.lit(1)).over(wt).alias("days"),
    )
    dev = F.col("x") * F.col("days") - F.col("total")
    breach = (dev * dev) > F.lit(9) * F.col("total") * F.col("days")
    return (
        rates.filter(breach)
        .select(
            "event_type", "d", "x", "total", "days",
            breach.cast("long").alias("is_anomaly"),
        )
        .orderBy("event_type", "d")
    )


@query(
    "quality_candidate_key_discovery",
    oracle="""
    WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM orders)
    SELECT 'o_orderkey' AS column_combo,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           n.n_rows,
           CAST(count(DISTINCT o_orderkey) = n.n_rows AS BIGINT)
             AS is_candidate_key
    FROM orders, n GROUP BY n.n_rows
    UNION ALL
    SELECT 'o_custkey', CAST(count(DISTINCT o_custkey) AS BIGINT), n.n_rows,
           CAST(count(DISTINCT o_custkey) = n.n_rows AS BIGINT)
    FROM orders, n GROUP BY n.n_rows
    UNION ALL
    SELECT 'o_custkey+o_orderdate',
           CAST(count(DISTINCT o_custkey || '|' || CAST(o_orderdate AS VARCHAR))
                AS BIGINT),
           n.n_rows,
           CAST(count(DISTINCT o_custkey || '|' || CAST(o_orderdate AS VARCHAR))
                = n.n_rows AS BIGINT)
    FROM orders, n GROUP BY n.n_rows
    UNION ALL
    SELECT 'o_orderstatus', CAST(count(DISTINCT o_orderstatus) AS BIGINT),
           n.n_rows,
           CAST(count(DISTINCT o_orderstatus) = n.n_rows AS BIGINT)
    FROM orders, n GROUP BY n.n_rows
    ORDER BY column_combo
    """,
)
def quality_candidate_key_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key discovery (profiling's PK suggester, the
    uniqueness side of the FD screen quality_fd_violations): for each
    proposed column combo, exact distinct count vs row count — a combo
    is a candidate key iff they match. Every distinct-count is one
    map-side-combinable aggregate over the projected columns; the
    composite combo hashes a canonical string encoding (delimiter
    chosen outside both columns' alphabets) so both engines count the
    same value space. At 100 TB the same report runs per-partition
    first (partial distincts) and the combos are a config list, not a
    combinatorial sweep — the 2^n lattice search is the OFFLINE
    profiler's job; the engine's job is exact verification of proposed
    keys."""
    orders = load_table(spark, "orders", sf_dir)
    n_rows = orders.count()

    def probe(combo_name: str, expr):
        return (
            orders.agg(F.countDistinct(expr).alias("n_distinct"))
            .select(
                F.lit(combo_name).alias("column_combo"),
                F.col("n_distinct").cast("long"),
                F.lit(n_rows).cast("long").alias("n_rows"),
                (F.col("n_distinct") == n_rows).cast("long").alias(
                    "is_candidate_key"
                ),
            )
        )

    out = (
        probe("o_orderkey", F.col("o_orderkey"))
        .unionByName(probe("o_custkey", F.col("o_custkey")))
        .unionByName(
            probe(
                "o_custkey+o_orderdate",
                F.concat_ws(
                    "|",
                    F.col("o_custkey"),
                    F.col("o_orderdate").cast("string"),
                ),
            )
        )
        .unionByName(probe("o_orderstatus", F.col("o_orderstatus")))
    )
    return out.orderBy("column_combo")
