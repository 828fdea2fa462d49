"""One-time 100x exact-substring-dedup anchor (round 13, companion to
tools/dedup_100x.py).

`substr_dedup_linearity` in the per-round bench proves ONE decade of
duplicate_spans scaling (5.5k -> 55k docs, 10x docs -> ~9x seconds);
the 100 TB story extrapolates two more. This tool runs the SAME recipe
on the 100x corpus (550k docs: every base doc replicated into a
~100-copy near-dup cluster by tools/gen_sf.py) and records the
two-decade anchor to ``tools/substr_100x.json``, which bench.py embeds
into every BENCH.json.

Why this operator stays linear where pair enumerators explode: the
detection is a window-COUNT over window hashes plus a per-doc
run-merge — a 100-copy cluster makes each shared window hash group
~100x larger, but the aggregate over it is still a count (map-side
combined), and the OUTPUT is spans per document (linear in docs), not
pairs per cluster (quadratic). The positional explode shuffles
md5 digests, never text.

Usage: python tools/substr_100x.py   (~10-15 min; writes tools/substr_100x.json)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

OUT = _REPO / "tools" / "substr_100x.json"


def run() -> dict:
    import importlib.util

    from pyspark.sql import functions as F

    from log2sql_spark import get_spark
    from log2sql_spark.operators.dedup import duplicate_spans

    spark = get_spark("substr_100x")
    spark.sparkContext.setLogLevel("ERROR")

    corpus100 = os.path.join(_REPO, ".bench_data", "sf10docs")
    if not os.path.exists(os.path.join(corpus100, "documents.parquet")):
        spec = importlib.util.spec_from_file_location(
            "gen_sf", os.path.join(_REPO, "tools", "gen_sf.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.generate(corpus100, 100, tables=("documents",))

    def measure(df, best_of: int = 2) -> dict:
        # same corpus recipe as bench.substr_dedup_scale: every doc plus
        # an exact copy of every 10th behind a 3-token prefix
        docs = df.select("doc_id", "text")
        corpus = docs.unionByName(
            docs.filter(F.col("doc_id") % 10 == 0).select(
                (F.col("doc_id") + 10_000_000).alias("doc_id"),
                F.concat(F.lit("dup copy marker "), F.col("text")).alias("text"),
            )
        ).persist()
        n = corpus.count()
        best, spans = float("inf"), 0
        for _ in range(best_of):
            t0 = time.time()
            spans = duplicate_spans(corpus, min_len=15).count()
            best = min(best, time.time() - t0)
        corpus.unpersist()
        return {
            "docs": n,
            "spans": spans,
            "sec": round(best, 3),
            "docs_per_sec": round(n / best),
        }

    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = measure(spark.read.parquet(os.path.join(base_dir, "documents.parquet")))
    big = measure(spark.read.parquet(os.path.join(corpus100, "documents.parquet")))

    docs_ratio = big["docs"] / max(base["docs"], 1)
    sec_ratio = big["sec"] / max(base["sec"], 1e-9)
    return {
        "recipe": (
            "duplicate_spans min_len=15 on docs + every-10th exact copy "
            "behind a 3-token prefix, best-of-2 both ends"
        ),
        "base": base,
        "at_100x_docs": big,
        "docs_ratio": round(docs_ratio, 1),
        "sec_ratio": round(sec_ratio, 2),
        "linear": sec_ratio <= 1.5 * docs_ratio,
    }


if __name__ == "__main__":
    result = run()
    OUT.write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result, indent=1))
