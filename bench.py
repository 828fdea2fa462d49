"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query executes fully via the noop sink (whole plan runs, nothing
collected to the driver). Session startup is excluded; per-query times
are end-to-end plan execution including scan.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from log2sql_spark import get_spark, registry  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Representative operator mix: scan+agg, joins of every stripe, windows,
# sessionization, full CDC pipeline, dedup/similarity/text ops.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q13_customer_order_counts",
    "agg_rollup",
    "window_topk_per_group",
    "topk_global",
    "stream_tumbling_window",
    "stream_session_window",
    "cdc_insert_replay",
    "cdc_update_flashback",
    "llm_dedup_exact",
    "llm_dedup_minhash_lsh",
    "llm_sim_topk_bruteforce",
    "llm_sim_topk_vectorized",
    "llm_text_stats",
    "llm_multimodal_features",
    "cdc_scd2_history",
    "join_asof",
]


def main() -> None:
    spark = get_spark("log2sql_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()

    # Warm the session (JVM/codegen/FS) outside the measured window.
    qs["q1_pricing_summary"](spark, SF_DIR).write.mode("overwrite").format("noop").save()

    # Per-query timing is decomposed: `build` is driver-side plan
    # construction (for CDC queries this includes one-time fixture
    # synthesis, cached after the first call), `queries` is plan
    # EXECUTION via the noop sink — the number that scales with data.
    times: dict[str, float] = {}
    build_times: dict[str, float] = {}
    for name in HEADLINE:
        best = best_build = float("inf")
        for _ in range(2):  # best-of-2: damp co-tenant noise on the host
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            t1 = time.time()
            df.write.mode("overwrite").format("noop").save()
            best_build = min(best_build, t1 - t0)
            best = min(best, time.time() - t1)
        times[name] = round(best, 3)
        build_times[name] = round(best_build, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "build": build_times,
                "build_total": round(sum(build_times.values()), 3),
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
