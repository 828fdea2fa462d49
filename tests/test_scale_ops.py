"""Scale-technique tests: bucketed co-located joins (no shuffle), skew
salting equivalence, no_pk codegen."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from log2sql_spark.plans.explain import explain_str, shuffle_count
from log2sql_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Pre-bucketing both sides on the join key makes the join
    shuffle-free — the 100 TB answer to repeated fact⋈fact joins.
    (saveAsTable writes to the session warehouse; bucketed scans carry
    the hash-partitioning guarantee Catalyst then reuses.)"""
    orders = load_table(spark, "orders", SF)
    li = load_table(spark, "lineitem", SF)
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_b")
    )
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
    )
    joined = spark.table("lineitem_b").join(
        spark.table("orders_b"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    agg = joined.groupBy("o_orderstatus").agg(F.count("*").alias("n"))
    # bucketed join: no Exchange below the join; the only shuffle allowed
    # is the one for the final aggregation.
    assert shuffle_count(agg) <= 1, explain_str(agg)
    plain = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).groupBy(
        "o_orderstatus"
    ).agg(F.count("*").alias("n"))
    assert sorted(map(tuple, agg.collect())) == sorted(map(tuple, plain.collect()))
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_salted_agg_equals_plain(spark):
    from log2sql_spark.operators.skew import salted_aggregate

    li = load_table(spark, "lineitem", SF)
    salted = salted_aggregate(
        li,
        keys=["l_returnflag"],
        aggs={"qty": ("sum", "l_quantity"), "n": ("count", "l_orderkey")},
        buckets=8,
        salt_cols=["l_orderkey", "l_linenumber"],
    )
    plain = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("qty"), F.count("l_orderkey").alias("n")
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_agg_rejects_non_algebraic(spark):
    from log2sql_spark.operators.skew import salted_aggregate

    li = load_table(spark, "lineitem", SF)
    with pytest.raises(ValueError, match="algebraic"):
        salted_aggregate(li, ["l_returnflag"], {"x": ("avg", "l_quantity")})


def test_salted_join_equals_plain(spark):
    from log2sql_spark.operators.skew import salted_join

    li = load_table(spark, "lineitem", SF).select("l_orderkey", "l_returnflag")
    dim = spark.createDataFrame([("A", 1), ("N", 2), ("R", 3)], ["l_returnflag", "code"])
    salted = salted_join(li, dim, keys=["l_returnflag"], buckets=8, salt_cols=["l_orderkey"])
    plain = li.join(dim, "l_returnflag")
    assert salted.count() == plain.count()
    s = salted.groupBy("code").count().collect()
    p = plain.groupBy("code").count().collect()
    assert sorted(map(tuple, s)) == sorted(map(tuple, p))


def test_no_pk_insert_strips_key_columns(spark, tmp_path):
    from log2sql_spark.operators.cdc_codegen import with_sql_text
    from log2sql_spark.sources.binlog import read_binlog
    from log2sql_spark.sources.binlog_fixture import render_binlog
    from log2sql_spark.sources.catalog import catalog_from_dict, resolve_columns

    TS = datetime(2024, 5, 1, 12, 0, 7)
    events = [
        {
            "op": "insert",
            "db": "shop",
            "table": "orders",
            "ts": TS,
            "values": [(1, "42"), (2, "'x'")],
        },
        {
            "op": "delete",
            "db": "shop",
            "table": "orders",
            "ts": TS,
            "values": [(1, "42"), (2, "'x'")],
        },
    ]
    p = tmp_path / "d.txt"
    p.write_text(render_binlog(events))
    cat = catalog_from_dict(
        spark, {"shop.orders": {"columns": ["id", "status"], "key_columns": ["id"]}}
    )
    resolved = resolve_columns(read_binlog(spark, str(p)), cat)
    rows = {r["op"]: r["sql_text"] for r in with_sql_text(resolved, no_pk=True).collect()}
    # INSERT loses the key column; DELETE still uses it in WHERE
    assert rows["insert"] == "INSERT INTO `shop`.`orders`(`status`) VALUES ('x');"
    assert rows["delete"] == "DELETE FROM `shop`.`orders` WHERE `id`=42 LIMIT 1;"
    with pytest.raises(ValueError, match="flashback or no_pk"):
        with_sql_text(resolved, flashback=True, no_pk=True)


def test_salted_join_rejects_outer_small_side():
    """Replicating the small side x buckets would emit unmatched
    small-side rows once per replica under right/full outer joins."""
    import pytest

    from log2sql_spark.operators.skew import salted_join

    with pytest.raises(ValueError, match="unsupported"):
        salted_join(None, None, keys=["k"], how="full_outer")


def test_asof_join_carries_whole_right_row(spark):
    """A NULL field in the latest right row must stay NULL — not be
    stitched from an older right row (merge_asof/ASOF JOIN semantics)."""
    from log2sql_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 10)], ["key", "ts"])
    right = spark.createDataFrame(
        [("k", 1, "old_price", "old_note"), ("k", 5, "new_price", None)],
        ["key", "ts", "price", "note"],
    )
    (row,) = asof_join(left, right, on="ts", by="key").collect()
    assert row["price"] == "new_price"
    assert row["note"] is None  # round-1 shape resurrected "old_note"


def test_asof_forward_and_tolerance(spark):
    """direction='forward' picks the earliest following right row; the
    tolerance nulls far matches but keeps the left row; equal timestamps
    match in both directions."""
    from datetime import datetime

    from log2sql_spark.operators.asof import asof_join

    L = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10)), (1, datetime(2024, 1, 1, 12)),
         (1, datetime(2024, 1, 1, 23)), (2, datetime(2024, 1, 1, 10))],
        ["key", "ts"],
    )
    R = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 12), "noon"), (1, datetime(2024, 1, 1, 13), "later")],
        ["key", "ts", "v"],
    )
    fwd = {
        (r["key"], r["ts"].hour): r["v"]
        for r in asof_join(L, R, on="ts", by="key", direction="forward").collect()
    }
    assert fwd == {(1, 10): "noon", (1, 12): "noon", (1, 23): None, (2, 10): None}

    tol = {
        (r["key"], r["ts"].hour): r["v"]
        for r in asof_join(
            L, R, on="ts", by="key", direction="forward", tolerance_seconds=3600
        ).collect()
    }
    # 10:00 -> nearest forward is 12:00, 2h away: nulled by 1h tolerance
    assert tol == {(1, 10): None, (1, 12): "noon", (1, 23): None, (2, 10): None}


def test_lsh_hot_bucket_guard_bounds_fanout(spark):
    """200 identical docs = one max-size bucket in every band. Uncapped
    LSH enumerates ~200²/2 pairs; the guard's star pairing emits exactly
    n-1, and the duplicate group still collapses to ONE cluster."""
    from log2sql_spark.operators.dedup import (
        dedup_clusters,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    text = "identical boilerplate navigation header repeated on every page of the site"
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"), F.lit(text).alias("text")
    )
    sigs = minhash_signatures(docs, num_hashes=16)

    capped = lsh_candidate_pairs(sigs, bands=8, max_bucket_size=8)
    pairs = capped.collect()
    assert len(pairs) == 199  # star around id 0, not 19900 all-pairs
    assert all(r.id_a == 0 for r in pairs)

    clusters = dedup_clusters(capped)
    assert clusters.select("cluster_id").distinct().count() == 1
    assert clusters.count() == 200


def test_lsh_guard_keeps_small_buckets_exact(spark):
    """Buckets at or under the cap keep full pair enumeration: capped
    output equals uncapped output when nothing exceeds the cap."""
    from log2sql_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures

    texts = [
        "the quick brown fox jumps over the lazy dog near the river bank today",
        "the quick brown fox jumps over the lazy dog near the river bend today",
        "an entirely different document about spark shuffle partitioning internals",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    sigs = minhash_signatures(docs, num_hashes=16).persist()
    uncapped = {(r.id_a, r.id_b) for r in lsh_candidate_pairs(sigs, bands=8).collect()}
    capped = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(sigs, bands=8, max_bucket_size=8).collect()
    }
    sigs.unpersist()
    assert capped == uncapped and (0, 1) in capped


def test_funnel_agrees_with_sequence_regex(spark, sf_dir):
    """Two independent funnel formulations — chained window-mins vs
    regex over the collapsed event string — must flag the same users."""
    from log2sql_spark import registry

    qs = registry.all_queries()
    funnel = {
        r.user_id
        for r in qs["events_funnel_steps"](spark, sf_dir).collect()
        if r.completed
    }
    regexed = {
        r.user_id
        for r in qs["events_sequence_pattern"](spark, sf_dir).collect()
        if r.has_funnel
    }
    assert funnel == regexed and funnel


def test_asof_nearest_ties_tolerance_and_missing(spark):
    """direction='nearest': smallest absolute distance wins; exact ties
    go BACKWARD (merge_asof rule); tolerance nulls far winners; a key
    with no right rows keeps its left row with NULLs."""
    from datetime import datetime

    from log2sql_spark.operators.asof import asof_join_nearest

    L = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10)), (1, datetime(2024, 1, 1, 12)),
         (1, datetime(2024, 1, 1, 18)), (2, datetime(2024, 1, 1, 10))],
        ["key", "ts"],
    )
    R = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 8), "early"),
         (1, datetime(2024, 1, 1, 12), "noon"),
         (1, datetime(2024, 1, 1, 16), "late")],
        ["key", "ts", "v"],
    )
    got = {
        (r["key"], r["ts"].hour): r["v"]
        for r in asof_join_nearest(L, R, on="ts", by="key").collect()
    }
    # 10:00 is 2h from both 08:00 and 12:00 -> tie -> backward ("early")
    assert got == {(1, 10): "early", (1, 12): "noon", (1, 18): "late", (2, 10): None}

    tol = {
        (r["key"], r["ts"].hour): r["v"]
        for r in asof_join_nearest(
            L, R, on="ts", by="key", tolerance_seconds=3600
        ).collect()
    }
    assert tol == {(1, 10): None, (1, 12): "noon", (1, 18): None, (2, 10): None}


def test_pathological_giant_document_stays_linear(spark):
    """One 200k-token document through the gram/chunk/quality operators:
    per-document array work must be linear (a quadratic lambda — e.g.
    re-evaluating split() per element — turns a single crawl outlier
    into a straggler task at 100 TB). Budget: the whole batch in well
    under a minute on local[32]; the round-6 Gopher/C4 O(n²) regression
    took minutes for far smaller docs."""
    import time

    from pyspark.sql import functions as F

    from log2sql_spark.operators.dedup import cdc_chunk_hashes, word_ngrams
    from log2sql_spark.operators.textops import with_c4_line_stats, with_gopher_rules

    giant = " ".join(f"w{i % 997}" for i in range(200_000))
    docs = spark.createDataFrame(
        [(1, giant), (2, "small doc here")], "doc_id long, text string"
    )
    t0 = time.time()
    n_grams = docs.select(
        F.size(word_ngrams(F.col("text"), 3)).alias("n")
    ).collect()
    n_chunks = cdc_chunk_hashes(docs, mod=16).count()
    gopher = with_gopher_rules(docs).select("doc_id", "n_words").collect()
    c4 = with_c4_line_stats(docs).select("doc_id", "n_kept_lines").collect()
    dt = time.time() - t0
    # the giant doc's token stream is periodic (period 997), so its
    # DISTINCT trigram count is exactly 997; the small doc has 1
    assert sorted(r.n for r in n_grams) == [1, 997]
    assert n_chunks > 1_000  # the giant actually segmented
    assert len(gopher) == 2 and len(c4) == 2
    assert dt < 60, f"pathological doc took {dt:.1f}s — quadratic per-doc work?"
