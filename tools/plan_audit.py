"""Plan audit: physical-plan quality report over every registered query.

For each query at the given sf_dir, reports shuffle (Exchange) count,
broadcast-join count, pushed-filter presence, and row-at-a-time Python
(BatchEvalPython — the slow path that should never appear). The
wall-of-text version of the plan-quality assertions in
tests/test_plans.py, for eyeballing the whole suite at once.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from log2sql_spark import get_spark, registry  # noqa: E402
from log2sql_spark.plans.explain import (  # noqa: E402
    broadcast_join_count,
    explain_str,
    pushed_filters,
    shuffle_count,
    unpartitioned_raw_window_count,
)


# One-line adjudication per flagged plan (>=6 static exchanges or
# row-at-a-time Python). "runtime N" figures are measured distinct
# ShuffleQueryStage counts from the EXECUTED adaptive plan at sf0.001 —
# where static exchange copies of a shared subtree collapse via exchange
# reuse, the runtime number shows it. A flagged query with no entry here
# fails the audit: every future flag must be adjudicated or fixed.
DISPOSITIONS = {
    "events_cohort_ltv_curve": "cohort LTV = first-seen agg + revenue join + (cohort, age) rollup + cohort-size agg + running window: the 6 static exchanges are those stages, and the first_seen subtree (referenced by both the revenue join and the size agg) reuses at runtime; every post-join stage runs over |cohorts x ages|, never events (sf1 1.47 s).",
    "events_funnel_latency_quantiles": "3-stage funnel (one min-agg per stage by definition) + the r14 distributed exact-rank decomposition (distributed_global_rank: latency-group counts, cum offsets over |distinct integer latencies|, per-group row_number, broadcast base join, 1-row total broadcast) replacing the old single-partition window; the static 20 is the funnel subtree restated by the rank's three consumers — exchange reuse collapses it at runtime, every stage keyed over |users| or |distinct latencies|, raw events scanned once (sf1 2.26 s).",
    "events_rfm_segmentation": "three exact quartiles via distributed_global_rank chained on one per-user profile aggregate — each rank contributes a group-count agg + a partitioned row_number + a broadcast base join (x3 = the static 24; the profile subtree is restated per rank and reuses at runtime); every exchange carries per-user PROFILE rows or tiny distinct-group relations (day buckets / small-int frequencies / 10-dollar monetary buckets), never events, and no Exchange SinglePartition over row data — the single-window alternative is 4 exchanges with |users| rows on one task (sf1 2.29 s).",
    "events_uplift_by_decile": "uplift harness: per-user aggregate + distributed gains-deciles decile assignment (group counts over |distinct small-int scores|, partitioned row_number, broadcast base + 1-row total) + per-decile rollup + 10-row cum window; static 9 = those stages, all over per-user rows or tinier (sf1 1.42 s).",
    "events_markov_prediction_eval": "train/eval harness: transition counts, per-state argmax, next-event join, accuracy rollup — each stage over |state pairs| << events (runtime 6).",
    "graph_pagerank_trade": "unrolled rank iterations: one exchange per iteration over 16-byte (node, rank) pairs; the iteration count is the algorithm, not a data re-read (runtime 6).",
    "join_relational_division": "count-cover division: per-customer count(DISTINCT priority) expands to Spark's two-phase distinct aggregate, plus the 5-row divisor distinct and its 1-row broadcast count — static 8 is those expansions, all keyed on custkey or broadcast; the alternative double-NOT-EXISTS plan re-scans orders per candidate.",
    "llm_ann_drift_report": "drift monitor = one count aggregate over the index + full-outer join of two |cells| histograms + 1-row totals broadcast; the static 6 includes the hist-store and index scans' exchanges, all over |cells| (25) rows — runtime_metrics: 81 shuffle records at sf0.01; sf10 probe 7.2 s warm, ratio 1.61x vs sf1.",
    "llm_ann_ivfpq_adc": "eval harness re-deriving exact top-k to grade the ADC approximation; the production op is the manifest-pruned probe at 2-3 exchanges; stages carry k-bounded candidates (static 9 -> runtime 5).",
    "store_catalog_cdf_batch": "union of TWO member tables' keyed CDF feeds (read_changes_all): each feed is the store diff's full-outer classify (~4 exchanges) over batch-sized rewritten footprints, never the tables — the static 9 is 2 feeds + the final sort; per-table cost tracks that table's change footprint (runtime_metrics: 1.5k shuffle records at sf0.01).",
    "llm_ann_ivfpq_recall": "recall eval computes exact AND approximate top-k plus their join — the exact baseline exists only to grade the index (static 14 -> runtime 7 via reuse).",
    "llm_ann_recall_eval": "same eval family: brute-force baseline vs IVF candidates; stages carry (query, id, dist) triples bounded by k*|queries| (runtime 9).",
    "llm_bigram_logprob": "bigram LM: unigram agg + bigram agg + smoothing join + per-doc fold, each map-side combined over |distinct grams| (runtime 6).",
    "llm_bm25_search": "BM25 = df agg + doclen agg + postings join + score fold + top-k — the Lucene stage count; each stage over the 3 query terms' manifest-pruned postings (runtime 8).",
    "llm_embedding_power_iteration": "unrolled 3-step power iterate: the static plan restates each iterate's lineage (exponential static count, the unrolled-loop cost); runtime exchange reuse + AQE broadcast of the per-vector dot relation collapse it — measured 4.8k shuffle records / 415 KB total at sf0.01; iteration count is the algorithm (pagerank posture), deeper k would checkpoint per iterate.",
    "llm_gopher_repetition_chars": "Gopher char-fraction repetition: one explode -> (doc,n,hash) count -> (doc,n) rollup -> doc rollup + broadcast base join; 6 static exchanges are the word-count ladder, every key doc-bounded, shuffles carry md5 digests and small ints, never gram text.",
    "llm_boilerplate_ngrams": "df-capped n-gram mining: gram hash agg -> df filter -> per-doc containment fold; shuffles 16 B gram digests, never text (runtime 6).",
    "llm_contamination_check": "eval-vs-train gram overlap: two gram aggregates + semi-join + per-doc rollup; the eval side is broadcast-small (runtime 6).",
    "llm_curation_e2e": "the whole curation funnel in ONE plan (quality gates -> exact dedup -> decontaminate -> split): 7 exchanges is the sum of the 4 stage minimums, each keyed on 16 B digests (runtime 7).",
    "llm_dedup_containment": "CDC-chunk containment: chunk hashing, per-chunk dedup, bidirectional containment folds, verdict join — stages carry 16 B chunk hashes (static 12 -> runtime 8).",
    "llm_dedup_lsh_capped": "base LSH pipeline + hot-bucket count + star-cap window — the cap is what bounds a 24.7M-pair blowup to 1.4M measured (runtime 7).",
    "llm_dedup_minhash_lsh": "signatures -> 32 band keys -> bucket join -> Jaccard verify: inherently 4 keyed stages over digests; static 9 collapses to 6 runtime stages via exchange reuse (13 stage refs, 6 distinct).",
    "llm_dedup_ngram_jaccard": "exact Jaccard verify: gram sets both sides + pair join + intersection fold — already the stage minimum (runtime 5).",
    "llm_ppjoin_prefix_filter": "PPJoin architecture = one df pass + rarity-ranked prefix window + prefix self-join + gram-set collect + array_intersect verify: 9 static exchanges ARE those stages, each keyed on gram/doc ids; the prefix relation the self-join shuffles is p-per-doc (p ≈ 0.3·n) and the verify join carries candidates x collected sets (the explode-join alternative measured 3x slower on duplicate-heavy corpora) — lossless exact-threshold dedup; BENCH ppjoin_linearity: 7.8x s at 10x docs with 401x output pairs, throughput RISING 1718 -> 2211 docs/s.",
    "llm_lsh_recall_eval": "eval harness re-deriving true-pair set AND candidate set independently to measure recall; the production pipeline is llm_dedup_minhash_lsh at 6 runtime stages (runtime 10).",
    "llm_nb_source_classifier": "NB train+score in ONE plan: (label,token) counts, priors, vocab, smoothing, per-doc score fold, argmax — each statistic its own map-side-combined aggregate over (token,count) pairs, never documents; stages are the statistics, not re-reads (runtime 16; sf1 warm well under budget).",
    "llm_semdedup": "broadcast-centroid argmax + within-cluster-only prune; runtime collapses to 3 stages — the assignment subtree is fully reused (static 8 -> runtime 3).",
    "store_cdf_keyed_commits": "keyed CDF over a 2-commit range: per commit step, diff()'s two exceptAll legs + one full-outer classification join — every exchange carries only the REWRITTEN file footprint of that commit (carried files cancel before any shuffle), so cost tracks churn, never table size; 2 steps x ~4 = 9 static, union-only between steps.",
    "llm_corpus_release_diff": "release notes over the keyed CDF: one commit step (two exceptAll legs + the classification join, all bounded by the curation pass's churn) + the per-source rollup; 6 static exchanges carry changed docs only, never the corpus.",
    "market_basket_pairs": "pair combinatorics after ONE basket groupBy + broadcast 1-row denominator; basket subtree reused at runtime (14 refs -> 7 distinct). CLOSED r10, measured as a DISTRIBUTION on an idle box (calib 0.117-0.118): the sf10 single-shot is STABLE at 55.8-56.5s (warm same-session repeats 34.1-37.1s), while the sf1 denominator swings 3.9-8.5s cold/warm -- so the recorded RATIO ranged 6.65 (first r10 run) to 11.01 (committed BENCH.json), entirely denominator noise, all under the 12x gate; bench.py now takes best-of-2 on the sf1 side to damp it. Warm-over-warm the ratio is 6.2-8.8x at 10x rows = linear. Every prior superlinear reading (r8 14.91x, r9 8.64x vs 10.62x disagreement, the old 10.4x note) was co-tenant contention; plan unchanged throughout.",
    "mv_incremental_distinct": "distinct-count IVM: delta dedup + re-count of touched groups + merge; exchanges over |delta| + |dirty groups| only (runtime 6).",
    "mv_incremental_minmax": "the non-distributive IVM case: monotone insert fold UNION delete-touched-extremum recompute UNION dirty-flag audit — three branch plans each 2-4 exchanges over |delta|/|dirty groups|; 35 static collapse to 14 runtime stages; at scale the cost is the semi-join-pruned base read, not stage count.",
    "quality_candidate_key_discovery": "one exact two-phase distinct aggregate per proposed key combo (4 combos) unioned into the report, same family as quality_fd_violations' 8; each runs over the projected columns of the shared scan (sf1 1.37 s).",
    "quality_expectations_orders": "one aggregate per expectation rule unioned into the report: exchange count scales with #rules (fixed), each over the shared scan (runtime 6).",
    "quality_fd_violations": "one count-distinct check per candidate functional dependency (4 FDs) unioned; per-FD input is (lhs, rhs) pairs (runtime 8).",
    "quality_referential_orphans": "one anti-join per FK edge (4 edges) unioned into the orphan report; each anti-join shuffles keys only (runtime 8).",
    "search_hybrid_rrf": "two rankers (BM25 + embedding) + rank windows + RRF merge — the stage count IS the hybrid-retrieval architecture; both rankers cut to top-k before the merge (runtime 8).",
    "setops_union_except_intersect": "EXCEPT and INTERSECT are each a distinct+join pair by SQL semantics; three set operators over pre-projected key columns (runtime 6).",
    "ts_anomaly_mad": "median + MAD need two exact rank passes (cum windows over |distinct values| per series) + the z-score join; value-count subtree reused at runtime (12 refs -> 5 distinct).",
    "quality_classifier_gains_deciles": "the price of ntile WITHOUT a single-partition global window: score-group counts, a cumulative over |distinct scores| rows, per-group row_number, the broadcast base-rank join, decile rollup, 1-row total broadcast, final capture window — each exchange carries (label, rank/decile) pairs or tiny distinct-score relations, never documents; the single-window alternative is 3 exchanges and one partition holding the corpus (runtime collapses via reuse).",
    "store_catalog_release_notes": "two member tables x the keyed-CDF stage family (diff's exceptAll legs + classification join, bounded by each table's txn churn) + per-table rollup + union — same per-commit shape as store_cdf_keyed_commits (9) applied across the catalog's two stores; exchanges carry changed rows only.",
    "ts_downsample_lttb": "bucket stats agg + two broadcast neighbor joins + 60-row argmax window; exchanges over |buckets|, never raw points (runtime 6).",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, fn in registry.all_queries().items():
        try:
            df = fn(spark, sf_dir)
            plan = explain_str(df)
            rows.append(
                (
                    name,
                    shuffle_count(df),
                    broadcast_join_count(df),
                    len(pushed_filters(df)),
                    "PY!" if "BatchEvalPython" in plan else "",
                    "pandas" if ("InPandas" in plan or "ArrowEvalPython" in plan) else "",
                    unpartitioned_raw_window_count(df),
                )
            )
        except Exception as exc:  # noqa: BLE001
            rows.append((name, -1, -1, -1, f"ERR {str(exc)[:40]}", "", 0))
    print(f"{'query':38} {'xchg':>4} {'bcast':>5} {'push':>4} {'gwin':>4}  flags")
    for name, xchg, bcast, push, py, pandas, gwin in sorted(rows):
        flags = " ".join(x for x in (py, pandas) if x)
        print(f"{name:38} {xchg:>4} {bcast:>5} {push:>4} {gwin:>4}  {flags}")
    worst = [r for r in rows if r[1] >= 6 or r[4] == "PY!" or r[6] > 0]
    print(
        f"\n{len(rows)} queries; {len(worst)} flagged "
        "(>=6 shuffles, row-Python, or an unpartitioned window over "
        "non-aggregated input)"
    )
    print("\n## Flagged-plan dispositions\n")
    missing = []
    for name, xchg, *_ in sorted(worst):
        d = DISPOSITIONS.get(name)
        if d is None:
            missing.append(name)
            print(f"- {name} ({xchg} static exchanges): NO DISPOSITION — fix or adjudicate")
        else:
            print(f"- {name} ({xchg} static exchanges): {d}")
    stale = sorted(set(DISPOSITIONS) - {r[0] for r in worst})
    if stale:
        print(f"\nstale dispositions (no longer flagged): {', '.join(stale)}")
    if missing:
        print(f"\nAUDIT FAIL: {len(missing)} flagged plans without a disposition")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
