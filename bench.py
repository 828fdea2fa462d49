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
    # end-to-end curation: quality gates + exact dedup + contamination +
    # split assignment in one plan — the closest proxy for the real
    # 100 TB training-data workload
    "llm_curation_pipeline",
    # round-4 additions: single-shuffle funnel, passage-level dedup
    "events_funnel_steps",
    "llm_repeated_passages",
]


def cdc_parse_throughput(spark) -> dict:
    """Multi-file binlog parse throughput: the same 100k-event dump as
    1 file vs 8 files. Unit of parallelism is the file (one mapInPandas
    task each, no shuffle), so 8 files should scale near-linearly on
    local[32] — the measured evidence for the per-file-parallel design
    claim in sources/binlog.py."""
    import shutil
    import tempfile
    from datetime import datetime, timedelta

    from log2sql_spark.sources.binlog import read_binlog
    from log2sql_spark.sources.binlog_fixture import render_binlog

    n_events, n_files = 100_000, 8
    t0 = datetime(2024, 3, 1, 12, 0, 0)
    events = [
        {
            "op": "insert",
            "db": "shop",
            "table": "orders",
            "ts": t0 + timedelta(seconds=i % 86_400),
            "values": [
                (1, str(i)),
                (2, str(i % 1000)),
                (3, "'O'"),
                (4, str(100_00 + i % 9_000_00)),
                (5, f"'2024-03-{(i % 28) + 1:02d}'"),
            ],
        }
        for i in range(n_events)
    ]
    tmp = tempfile.mkdtemp(prefix="bench_cdc_")
    try:
        one = os.path.join(tmp, "one")
        many = os.path.join(tmp, "many")
        os.makedirs(one), os.makedirs(many)
        with open(os.path.join(one, "mysql-bin.000001.txt"), "w") as f:
            f.write(render_binlog(events))
        chunk = n_events // n_files
        for i in range(n_files):
            with open(os.path.join(many, f"mysql-bin.{i:06d}.txt"), "w") as f:
                f.write(render_binlog(events[i * chunk : (i + 1) * chunk]))

        def run(path: str) -> float:
            t = time.time()
            assert read_binlog(spark, f"{path}/*.txt").count() == n_events
            return time.time() - t

        run(many)  # warm the Arrow/pandas path outside the measurement
        t_one, t_many = run(one), run(many)

        # Intra-file parallelism: the SAME single 100k-event file through
        # the chunked reader — a giant dump no longer serializes on one
        # core (sources/binlog.py read_binlog_split).
        from log2sql_spark.sources.binlog import read_binlog_split

        one_file = os.path.join(one, "mysql-bin.000001.txt")
        size = os.path.getsize(one_file)
        t_split = float("inf")
        for _ in range(2):  # best-of-2: first run pays Python-worker spawn
            t = time.time()
            assert (
                read_binlog_split(spark, one_file, chunk_bytes=size // 16 + 1).count()
                == n_events
            )
            t_split = min(t_split, time.time() - t)
        return {
            "events": n_events,
            "files_1_sec": round(t_one, 3),
            "files_8_sec": round(t_many, 3),
            "file_1_split16_sec": round(t_split, 3),
            "events_per_sec_8files": round(n_events / t_many),
            "speedup_8files": round(t_one / t_many, 2),
            "speedup_split16": round(t_one / t_split, 2),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def dedup_scale(spark) -> dict:
    """Full-corpus MinHash+LSH dedup throughput at $SF_DIR (no oracle
    cap): every document plus exact copies of every 10th one, hot-bucket
    guard on — the flagship LLM op measured at the scale factor rather
    than the oracle-bounded 750-doc corpus."""
    from pyspark.sql import functions as F

    from log2sql_spark.operators.dedup import minhash_dedup_pairs
    from log2sql_spark.sources.tables import load_table

    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
    ).persist()
    n_docs = corpus.count()
    t0 = time.time()
    n_pairs = minhash_dedup_pairs(
        corpus, threshold=0.6, num_hashes=64, bands=32, max_bucket_size=256
    ).count()
    dt = time.time() - t0
    corpus.unpersist()
    return {
        "docs": n_docs,
        "pairs": n_pairs,
        "sec": round(dt, 3),
        "docs_per_sec": round(n_docs / dt),
    }


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

    cdc_parse = cdc_parse_throughput(spark)
    dedup = dedup_scale(spark)

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
                "cdc_parse": cdc_parse,
                "dedup_scale": dedup,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
