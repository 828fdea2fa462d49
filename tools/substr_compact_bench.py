"""Substr-stream compaction read-cost anchor (r14, verdict #2).

A long-running incremental substring-dedup stream accumulates one
``batch=<id>`` directory per micro-batch in every store table, so
``current_spans`` reads grow with BATCH COUNT, not state size. This
one-time run drives ~50 micro-batches through ``process_substr_batch``,
measures the spans/index file counts and the ``current_spans`` read
wall time, compacts with ``compact_substr_store``, re-measures, and
verifies the span set is byte-identical before/after. The JSON lands
at tools/substr_compact.json and rides into every BENCH.json via
``bench._substr_compact_anchor`` (the recorded-not-rerun pattern of
tools/substr_100x.py — re-run this when the substr store layout
changes).

Usage: python tools/substr_compact_bench.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import pandas as pd  # noqa: E402

from log2sql_spark import get_spark  # noqa: E402
from log2sql_spark.streaming.substr_stream import (  # noqa: E402
    _index_root,
    _spans_root,
    compact_substr_store,
    current_spans,
    parquet_file_count,
    process_substr_batch,
)

N_BATCHES = 50
BASE = " ".join(f"w{i}" for i in range(40))  # 40-token body, copied often


def _spanset(df):
    return {(r.doc_id, r.span_start, r.span_len) for r in df.collect()}


def main() -> int:
    spark = get_spark("substr_compact_bench")
    spark.sparkContext.setLogLevel("ERROR")
    store = tempfile.mkdtemp(prefix="substr_compact_")
    try:
        t0 = time.time()
        for bid in range(N_BATCHES):
            # every 5th doc is a (prefixed) copy — spans exist and keep
            # retroactively extending, the worst case for latest-wins reads
            text = (
                f"prefix{bid} unique lead tokens then " + BASE
                if bid % 5 == 0
                else " ".join(f"b{bid}_{i}" for i in range(25))
            )
            df = spark.createDataFrame(
                pd.DataFrame({"doc_id": [10_000 + bid], "text": [text]})
            )
            process_substr_batch(df, store, bid)
        t_ingest = time.time() - t0

        spans_root, index_root = _spans_root(store), _index_root(store)
        files_before = {
            "spans": parquet_file_count(spans_root),
            "index": parquet_file_count(index_root),
        }
        dirs_before = len(os.listdir(spans_root))
        t0 = time.time()
        before = _spanset(current_spans(spark, store))
        t_read_before = time.time() - t0

        t0 = time.time()
        stats = compact_substr_store(spark, store)
        t_compact = time.time() - t0

        files_after = {
            "spans": parquet_file_count(spans_root),
            "index": parquet_file_count(index_root),
        }
        t0 = time.time()
        after = _spanset(current_spans(spark, store))
        t_read_after = time.time() - t0
        assert after == before, "compaction changed the span set"

        out = {
            "batches": N_BATCHES,
            "ingest_sec": round(t_ingest, 2),
            "spans_dirs_before": dirs_before,
            "files_before": files_before,
            "files_after": files_after,
            "current_spans_read_sec_before": round(t_read_before, 3),
            "current_spans_read_sec_after": round(t_read_after, 3),
            "compact_sec": round(t_compact, 2),
            "span_set_identical": True,
            "compact_stats": stats,
        }
        path = os.path.join(_REPO, "tools", "substr_compact.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out, indent=1))
        print(f"-> {path}")
        return 0
    finally:
        shutil.rmtree(store, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
