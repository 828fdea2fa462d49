"""Plan-quality assertions (the 100 TB contract): filters must reach the
parquet scan, dimension joins must broadcast, shuffle counts must stay
at the operator's theoretical minimum. A regression here is a
performance bug even when results stay correct."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log2sql_spark import registry
from log2sql_spark.plans import (
    broadcast_join_count,
    explain_str,
    pushed_filters,
    shuffle_count,
    whole_stage_codegen_ids,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return registry.all_queries()


def test_q1_filter_pushed_to_scan(spark, qs):
    df = qs["q1_pricing_summary"](spark, SF)
    pushed = " ".join(pushed_filters(df))
    assert "l_shipdate" in pushed, f"shipdate filter not pushed: {pushed!r}"


def test_q1_single_shuffle(spark, qs):
    # scan → partial agg → exchange → final agg (+1 for the orderBy
    # range exchange): anything more means lost map-side combine.
    assert shuffle_count(qs["q1_pricing_summary"](spark, SF)) <= 2


def test_q3_broadcasts_dimension(spark, qs):
    df = qs["q3_shipping_priority"](spark, SF)
    assert broadcast_join_count(df) >= 1
    pushed = " ".join(pushed_filters(df))
    assert "c_mktsegment" in pushed and "o_orderdate" in pushed


def test_q5_star_join_broadcasts_all_dims(spark, qs):
    df = qs["q5_local_supplier_volume"](spark, SF)
    # customer, supplier, nation, region all broadcast; only
    # lineitem⋈orders may shuffle.
    assert broadcast_join_count(df) >= 4


def test_scan_prunes_columns(spark):
    from log2sql_spark.sources.tables import load_table

    df = load_table(spark, "lineitem", SF).select("l_orderkey", "l_quantity")
    plan = explain_str(df)
    assert "l_extendedprice" not in plan  # ReadSchema must not include it


def test_window_topk_single_shuffle(spark, qs):
    df = qs["window_topk_per_group"](spark, SF)
    # one hash partition on p_brand (+ final orderBy range exchange)
    assert shuffle_count(df) <= 2


def test_topk_global_uses_take_ordered(spark, qs):
    plan = explain_str(qs["topk_global"](spark, SF))
    assert "TakeOrderedAndProject" in plan  # never a full sort


def test_asof_join_single_shuffle(spark, qs):
    # union + window: must cost ONE shuffle on the key, like a
    # co-partitioned join (plus the right-side dedup window's shuffle
    # and the final sort) — not a per-row probe join.
    df = qs["join_asof"](spark, SF)
    assert shuffle_count(df) <= 3


def test_whole_stage_codegen_present(spark, qs):
    df = qs["q1_pricing_summary"](spark, SF)
    df.collect()  # AQE shows codegen markers only in the finalized plan
    assert len(whole_stage_codegen_ids(df)) >= 1


def test_cdc_codegen_stays_jvm_side(spark, qs):
    # the replay render must be pure expressions: no BatchEvalPython /
    # row-at-a-time Python in the plan (the parse itself is Arrow
    # applyInPandas, which appears as FlatMapGroupsInPandas — allowed).
    plan = explain_str(qs["cdc_insert_replay"](spark, SF))
    assert "BatchEvalPython" not in plan


def test_cdc_store_partition_pruning(spark, tmp_path):
    """db/table/op filters on the envelope store must become partition
    pruning (PartitionFilters), not data filters."""
    from datetime import datetime

    from log2sql_spark.sources.binlog import read_binlog
    from log2sql_spark.sources.binlog_fixture import render_binlog
    from log2sql_spark.sources.cdc_store import read_envelope_store, write_envelope_store

    TS = datetime(2024, 5, 1, 12, 0, 7)
    events = [
        {"op": "insert", "db": "shop", "table": "orders", "ts": TS, "values": [(1, "1")]},
        {"op": "delete", "db": "shop", "table": "other", "ts": TS, "values": [(1, "2")]},
    ]
    dump = tmp_path / "d.txt"
    dump.write_text(render_binlog(events))
    store = str(tmp_path / "store")
    write_envelope_store(read_binlog(spark, str(dump)), store, mode="overwrite")
    pruned = read_envelope_store(spark, store, sql_types=["insert"], tables=["orders"])
    plan = explain_str(pruned)
    assert "PartitionFilters" in plan
    m = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("op" in ln and "table" in ln for ln in m), m
    assert pruned.count() == 1


def test_broadcast_threshold_config(spark):
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "64MB"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_q10_pushdown_and_broadcast(spark, qs):
    df = qs["q10_returned_items"](spark, SF)
    pushed = " ".join(pushed_filters(df))
    assert "o_orderdate" in pushed and "l_returnflag" in pushed
    assert broadcast_join_count(df) >= 1  # nation must broadcast
    # one true shuffle (the groupBy); joins resolve broadcast at sf0.001
    assert shuffle_count(df) <= 3


def test_q18_semi_join_on_qualifying_orders(spark, qs):
    df = qs["q18_large_volume_orders"](spark, SF)
    plan = explain_str(df)
    assert "LeftSemi" in plan  # IN-subquery must decorrelate, not materialize
    assert shuffle_count(df) <= 4


def test_q21_exists_pair_becomes_semi_plus_anti(spark, qs):
    df = qs["q21_waiting_suppliers"](spark, SF)
    plan = explain_str(df)
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "BatchEvalPython" not in plan


def test_q2_region_argmax_single_window_shuffle(spark, qs):
    df = qs["q2_top_supplier_per_region"](spark, SF)
    # window max over regionkey + final sort; dims broadcast
    assert broadcast_join_count(df) >= 2
    assert shuffle_count(df) <= 3


def test_q8_all_dims_broadcast(spark, qs):
    df = qs["q8_market_share"](spark, SF)
    # part, supplier, both nation roles, region all broadcast
    assert broadcast_join_count(df) >= 5
    assert shuffle_count(df) <= 3


def test_q9_name_filter_pushed(spark, qs):
    df = qs["q9_product_profit"](spark, SF)
    pushed = " ".join(pushed_filters(df))
    assert "p_name" in pushed
    assert broadcast_join_count(df) >= 3


def test_q20_fact_shuffles_once(spark, qs):
    df = qs["q20_dominant_part_suppliers"](spark, SF)
    plan = explain_str(df)
    # lineitem appears once: pairs/tot re-aggregate the grouped frame
    assert plan.count("lineitem.parquet") <= 2  # scan may appear in reused subtree
    assert "BatchEvalPython" not in plan


def test_simhash_single_explode_single_shuffle(spark):
    """The simhash kernel must not inflate the token stream: exactly one
    Generate (the token explode) and one aggregate exchange. The round-1
    shape exploded sequence(0, bits-1) per token — a 60x row blowup
    visible as a second Generate in the plan."""
    from log2sql_spark.operators.dedup import simhash

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d")], ["doc_id", "text"]
    )
    df = simhash(docs, bits=16)
    plan = explain_str(df, "simple")
    assert plan.count("Generate") == 1, plan
    assert shuffle_count(df) <= 1
    # semantics unchanged by the rewrite: identical docs collide
    same = spark.createDataFrame([(1, "x y z"), (2, "x y z")], ["doc_id", "text"])
    vals = [r["simhash"] for r in simhash(same, bits=16).collect()]
    assert vals[0] == vals[1]


def test_bucketed_join_has_no_join_exchange(spark, sf_dir):
    """Both sides bucketed by the join key: the sort-merge join must
    consume bucket layout directly — the whole query's only shuffle is
    the final groupBy."""
    from log2sql_spark.plans.explain import explain_str, shuffle_count
    from log2sql_spark.queries.extra2 import bucketed_join_colocated

    import hashlib

    df = bucketed_join_colocated(spark, sf_dir)  # also materializes tables
    plan = explain_str(df)
    assert "SortMergeJoin" in plan
    # full query: exactly the groupBy + orderBy exchanges, none for the join
    assert shuffle_count(df) == 2, plan
    db = "bkt_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    o, c = spark.table(f"{db}.orders_b"), spark.table(f"{db}.customer_b")
    bare = o.hint("merge").join(c, o["o_custkey"] == c["c_custkey"])
    assert shuffle_count(bare) == 0, explain_str(bare)


def test_funnel_single_partitioning(spark, qs):
    """The funnel's chained window-mins share one user_id partitioning:
    1 data shuffle + the output sort, never one shuffle per step."""
    assert shuffle_count(qs["events_funnel_steps"](spark, SF)) <= 2


def test_tfidf_bounded_shuffles(spark, qs):
    """df-as-window over the grouped tf table keeps TF-IDF at the
    tf-group, term-window, doc-window, sort budget."""
    assert shuffle_count(qs["llm_tfidf_topterms"](spark, SF)) <= 5


def test_repeated_passages_single_aggregate(spark, qs):
    """Passage-level dedup is one explode + one groupBy on the window
    text (+ output sort) — no self-join anywhere in the plan."""
    df = qs["llm_repeated_passages"](spark, SF)
    assert shuffle_count(df) <= 3
    assert "Join" not in explain_str(df)


def test_simhash_capped_no_nested_loop(spark, qs):
    """The banded/capped CANDIDATE paths never fall back to a
    BroadcastNestedLoopJoin (the O(n^2) shape the banding replaces).
    The simhash query is checked end-to-end; the capped path is checked
    on the operator directly because the query's corpus synthesis uses
    a deliberate 1x12 crossJoin to manufacture the hot bucket."""
    assert "BroadcastNestedLoopJoin" not in explain_str(qs["llm_dedup_simhash"](spark, SF))

    from log2sql_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures
    from log2sql_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF).select("doc_id", "text").limit(50)
    sigs = minhash_signatures(docs, num_hashes=16)
    plan = explain_str(lsh_candidate_pairs(sigs, bands=8, max_bucket_size=4))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


# ---- round-5 curation/indexing wave ---------------------------------------


def test_chunking_plan_has_no_wide_shuffle(spark, qs):
    """Chunking is map-only: at most the input-spread round-robin and
    the presentation sort may exchange; no aggregate, no join."""
    df = qs["llm_chunk_sliding_window"](spark, SF)
    plan = explain_str(df)
    assert shuffle_count(df) <= 2
    assert "Join" not in plan and "HashAggregate" not in plan


def test_bloom_probe_never_joins_eval_side(spark, qs):
    """The bloom bitmap rides as a literal: the probe plan must contain
    NO join at all — that is the whole point vs the broadcast-set
    contamination check."""
    df = qs["llm_decontaminate_bloom"](spark, SF)
    plan = explain_str(df)
    assert "Join" not in plan, "bloom probe should not join the eval side"
    assert shuffle_count(df) <= 2  # input spread + presentation sort


def test_semdedup_broadcasts_centroids(spark, qs):
    df = qs["llm_semdedup"](spark, SF)
    assert broadcast_join_count(df) >= 1


def test_pagerank_iterations_reuse_materialized_edges(spark, qs):
    """After the lineage barrier, three iterations cost <= 6 statically
    visible exchanges (per round: one broadcast of the 25-row rank
    table, one integer aggregate) — NOT 3x the edge-build plan."""
    df = qs["graph_pagerank_trade"](spark, SF)
    assert shuffle_count(df) <= 6
    assert broadcast_join_count(df) >= 3  # ranks broadcast every round


def test_zorder_scan_keeps_predicates_pushed(spark, qs):
    df = qs["store_zorder_clustered_scan"](spark, SF)
    pushed = " ".join(pushed_filters(df))
    assert "user_id" in pushed and "cents" in pushed


def test_image_ahash_bands_equijoin_not_bnlj(spark, qs):
    plan = explain_str(qs["llm_multimodal_image_ahash"](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_spatial_grid_join_is_equijoin_not_bnlj(spark, qs):
    """The grid-bucketed radius join must plan as a hash equi-join on
    the cell key (broadcast here; shuffled-hash/SMJ at scale) — a
    BroadcastNestedLoopJoin means the distance predicate leaked out of
    the equi-join keys and the plan is the O(n*m) theta-join the
    bucketing exists to avoid."""
    df = qs["join_spatial_grid_radius"](spark, SF)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    # the two 1-row plane-side broadcasts (density-constant scaling)
    # legally plan as Cross BNLJs — the bounded stats-crossJoin
    # precedent; anything beyond those two means the distance
    # predicate leaked out of the equi-join keys
    import re

    bnlj_nodes = re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)
    assert len(bnlj_nodes) <= 2, plan[:1500]
    assert broadcast_join_count(df) >= 1 or "SortMergeJoin" in plan


def test_regex_trigram_screen_stays_jvm(spark, qs):
    """The contains() screen must compile into the scan/filter stage —
    no Python evaluation anywhere in the two-phase regex plan."""
    df = qs["search_regex_trigram"](spark, SF)
    plan = explain_str(df)
    assert "BatchEvalPython" not in plan
    assert "Contains" in plan or "contains" in plan


def test_triangle_count_reuses_checkpointed_edges(spark, qs):
    """The 4-table edge derivation must appear ONCE (eager checkpoint),
    not once per self-join arm: with three arms over a re-derived edge
    list the static plan carried 29 exchanges; checkpointed it needs
    only the wedge-join + aggregate exchanges."""
    df = qs["graph_triangle_count"](spark, SF)
    assert shuffle_count(df) <= 4


def test_gram_matrix_shuffles_cells_not_vectors(spark, qs):
    """X^T X must shuffle only (i, j, partial) cells: one exchange for
    the cell fold (+1 for the output ordering) — an exchange count
    that scales with anything else means vectors crossed the wire."""
    df = qs["llm_embedding_gram_matrix"](spark, SF)
    assert shuffle_count(df) <= 3


def test_bloom_prefilter_sits_under_the_join(spark, qs):
    """The bloom membership test must evaluate in the fact-scan Filter
    (JVM bit arithmetic, no Python), and the exact join must be the
    broadcast hash join that kills false positives — if the md5 bit
    test floated above the join, the prefilter saved nothing."""
    df = qs["join_bloom_prefilter"](spark, SF)
    plan = explain_str(df)
    assert "BatchEvalPython" not in plan
    assert "shiftright" in plan and "md5" in plan
    assert broadcast_join_count(df) >= 1
    # the bit test lives in a Filter detail block (scan side), and the
    # join condition itself is the plain key equality — the bloom never
    # leaks into the join keys
    assert "Filter" in plan
    assert "NestedLoop" not in plan


def test_dynamic_partition_pruning_injected(spark, qs):
    """join_dynamic_partition_pruning must show a dynamicpruning
    subquery on the partitioned fact scan — the runtime filter that
    keeps a 100 TB partitioned fact from being scanned whole when the
    selective predicate arrives through a join."""
    df = qs["join_dynamic_partition_pruning"](spark, SF)
    plan = explain_str(df)
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_agg_percentiles_has_no_percentile_buffer(spark, qs):
    """agg_percentiles must compute exact quantiles via hash aggregates
    over (flag, price) counts + a per-flag cumulative window — NOT
    Spark's Percentile/ObjectHashAggregate, whose per-group value map
    buffers every distinct price on the 3 final reducers and becomes
    the job at 100x scale."""
    df = qs["agg_percentiles"](spark, SF)
    plan = explain_str(df)
    assert "percentile" not in plan.lower(), plan[:2000]
    assert "ObjectHashAggregate" not in plan, plan[:2000]
    assert "HashAggregate" in plan


# ---- r14: unpartitioned-window audit flag (verdict #1) --------------------


def test_unpartitioned_raw_window_flag_fires_and_stays_quiet(spark):
    """Liveness for plan_audit's gwin flag: a global-ORDER-BY window
    over raw rows must count; a partitioned window, a post-aggregate
    global window, and a limit-bounded top-k rank window must not."""
    from pyspark.sql import Window

    from log2sql_spark.plans.explain import unpartitioned_raw_window_count

    df = spark.read.parquet(f"{SF}/orders.parquet")

    raw_global = df.withColumn(
        "rn", F.row_number().over(Window.orderBy("o_orderkey"))
    )
    assert unpartitioned_raw_window_count(raw_global) == 1

    partitioned = df.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("o_custkey").orderBy("o_orderkey")
        ),
    )
    assert unpartitioned_raw_window_count(partitioned) == 0

    post_agg = (
        df.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("cum", F.sum("n").over(Window.orderBy("o_orderpriority")))
    )
    assert unpartitioned_raw_window_count(post_agg) == 0

    topk = df.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")))
    ).filter(F.col("rn") <= 10)
    assert unpartitioned_raw_window_count(topk) == 0


def test_migrated_rank_queries_have_no_single_partition_row_stage(spark, qs):
    """The r14 global-ntile/rank migrations (RFM, uplift deciles, funnel
    quantiles, both flashback ranks) carry no unpartitioned window over
    non-aggregated input, and the replacement partitioned row_number is
    present (the closed-form ntile replaced F.ntile entirely)."""
    from log2sql_spark.plans.explain import unpartitioned_raw_window_count

    for name in (
        "events_rfm_segmentation",
        "events_uplift_by_decile",
        "events_funnel_latency_quantiles",
        "cdc_update_flashback",
        "cdc_flashback_point_in_time",
    ):
        df = qs[name](spark, SF)
        assert unpartitioned_raw_window_count(df) == 0, name
        plan = explain_str(df)
        assert "row_number" in plan, name
        assert "ntile" not in plan, name
