"""Driver-sample coverage report.

The driver's CORRECTNESS_r{N}.json checks a ~50-query sample of the
registry per round; queries outside the union of all samples have never
been driver-verified and rely on the in-repo full-oracle gate
(tests/test_full_oracles.py → tools/check_oracles.py, ALL registered
queries every pytest run). This report makes that split explicit:
which queries any driver round has sampled, which only the full gate
covers — so "driver green" is never mistaken for "registry covered".

Usage: python tools/sample_coverage.py   (writes tools/sample_coverage.json)
"""

from __future__ import annotations

import glob
import json
import os
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


# Hand-written vacuity audit: disposition of every query whose oracle
# returns <= 2 rows at sf0.01. SOURCE OF TRUTH — lives in the tool (not
# the generated JSON) so regeneration can never lose it; enforced by
# tests/test_oracle_vacuity.py, which fails any new <=2-row oracle
# without an entry here and any entry naming an unregistered query.
VACUITY_AUDIT = {
    "method": (
        "tools/check_oracles.py FAILS any 0-row/0-row oracle match "
        "(vacuous) unless the query opts into EXPECTED_EMPTY; every "
        "query returning <=2 rows at sf0.01 is hand-audited below "
        "(r9 audit, extended r10; enforced by tests/test_oracle_vacuity.py)."
    ),
    "fixed": {
        "llm_dedup_url_canonical": "was vacuous (0 rows: canonical-key period lcm(20,50,5,7)=700 > 500 docs); synthesis moduli shrunk to lcm(10,25,5,7)=350 -> 150 duplicate groups at sf0.01, values hash-checked",
    },
    "one_row_by_design": {
        "distinct_dropdup": "scalar distinct-count aggregate; value data-dependent and hash-checked",
        "er_blocking_quality_eval": "dataset-level eval metric (pair completeness/reduction ratio), scalar by design",
        "events_funnel_latency_quantiles": "corpus-level latency quantiles, scalar by design",
        "join_semi": "count+sum over the semi join; 6k+ input rows fold into hash-checked aggregates",
        "llm_lsh_recall_eval": "recall-vs-bruteforce eval metric, scalar by design",
        "q14_promo_share": "TPC-H Q14 is a single scalar by spec",
        "q15_top_supplier": "Q15 returns the max-revenue supplier; 1 row unless revenue ties",
        "q17_small_quantity_revenue": "TPC-H Q17 scalar by spec",
        "q19_disjunctive_predicates": "TPC-H Q19 scalar revenue by spec",
        "q22_idle_customers": "grouped by c_mktsegment; at sf0.01 one segment qualifies - values (numcust, totacctbal) are data-dependent",
        "q6_forecast_revenue": "TPC-H Q6 scalar by spec",
        "quality_k_anonymity": "dataset-level k-anonymity metric, scalar by design",
        "quality_key_skew_gini": "dataset-level Gini coefficient, scalar by design",
        "quality_ks_drift": "two-sample KS statistic, scalar by design",
        "quality_l_diversity": "dataset-level l-diversity metric, scalar by design",
        "quality_reconciliation_tieout": "source-vs-derived tie-out totals, scalar by design",
        "sample_hash_deterministic": "count+cents+first_key over the 10% hash sample; ~150 sampled rows fold in",
        "sketch_kll_revenue_quantiles": "sketch estimate row, scalar by design",
        "sketch_theta_customer_overlap": "set-overlap estimate row, scalar by design",
        "source_json_corrupt_recovery": "recovery counters (parsed/corrupt), scalar by design",
        "source_orc_roundtrip": "roundtrip checksum row, scalar by design",
        "source_xml_roundtrip": "roundtrip checksum row, scalar by design",
        "stream_dedup": "n_after_dedup vs n_original counters over a doubled 10k-event stream, scalar by design",
    },
    "two_rows_by_design": {
        "cdc_integrity_audit": "audit verdict rows (received vs applied), 2 by construction",
        "cdc_store_pruned_read": "pruned point lookup - returning ONLY the 2 matching rows is the assertion",
        # r10 additions: the remaining <=2-row oracles, each structural
        "events_ab_conversion": "one row per A/B variant (2 variants assigned by hash parity); conversion/revenue values hash-checked",
        "events_ab_cuped_adjustment": "one row per A/B variant (2); raw vs CUPED-adjusted means hash-checked",
        "join_dynamic_partition_pruning": "grouped by the 2 priority classes surviving the pruned dim filter - 2 groups by construction, totals hash-checked",
        "llm_jaccard_df_stats": "gram-class rollup (rare vs common document frequency), 2 classes by design",
        "q12_priority_shipping": "TPC-H Q12 shape: URGENT+HIGH vs other priority class - 2 rows by spec",
        "q8_market_share": "TPC-H Q8: one row per o_year in the 2-year window - 2 by spec",
        "source_csv_json_roundtrip": "one checksum row per round-tripped format (csv, json), 2 by design",
        "store_pruned_merge_narrow": "per-segment totals over the 2 segments the narrow merge touches by construction",
        "graph_degree_assortativity": "one scalar row of exact Pearson sufficient statistics (m2/sum_xy/sum_x/sum_x2) over the whole sparsified graph, 1 by design; all four moments hash-checked",
        "store_branch_wap_merge": "one summary row per WAP stage (tagged pre-merge state, merged branch head), 2 by design; n_rows/sum_cents/n_updated hash-checked",
        "store_snapshot_time_travel": "one summary row per time-travelled version (2 versions committed), 2 by design",
        "ts_anomaly_mad": "rows exceeding the MAD threshold: the 2 synthetic spikes planted in the series; day+magnitude hash-checked",
        "store_catalog_release_notes": "one release-notes row per member table of the 2-table catalog txn (cur, hist), 2 by design; per-table change_type/n_rows/sum_cents hash-checked",
    },
}


def main() -> int:
    from log2sql_spark import registry

    registered = sorted(registry.all_queries())
    sampled: dict[str, list[str]] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(path).replace("CORRECTNESS_", "").replace(".json", "")
        try:
            data = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        for name in data:
            sampled.setdefault(name, []).append(rnd)

    driver_sampled = sorted(set(sampled) & set(registered))
    never_sampled = sorted(set(registered) - set(sampled))
    stale = sorted(set(sampled) - set(registered))  # renamed/removed queries
    report = {
        "registered": len(registered),
        "driver_sampled": len(driver_sampled),
        "full_gate_only": len(never_sampled),
        "note": (
            "every registered query is checked against its DuckDB oracle "
            "by tests/test_full_oracles.py on every pytest run; the driver "
            "additionally re-checks a ~50-query rotating sample per round"
        ),
        "sampled_rounds": {n: sampled[n] for n in driver_sampled},
        "never_driver_sampled": never_sampled,
        "sampled_but_no_longer_registered": stale,
    }
    out = os.path.join(_REPO, "tools", "sample_coverage.json")
    report["vacuity_audit"] = VACUITY_AUDIT
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(
        f"{report['registered']} registered; {report['driver_sampled']} "
        f"driver-sampled across rounds; {report['full_gate_only']} covered "
        f"only by the full oracle gate -> {out}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
