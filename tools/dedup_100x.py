"""One-time 100x dedup anchor (VERDICT r11 #5).

`dedup_linearity` in the per-round bench proves ONE decade of MinHash+
LSH scaling (5.5k -> 55k docs); the 100 TB story extrapolates two more.
This tool re-runs the r5-era 500k-doc corpus (documents at 100x: every
base doc replicated into a ~100-copy near-dup cluster) under the
CURRENT operators and records the two-decade anchor to
``tools/dedup_100x.json``, which bench.py embeds into every BENCH.json.

Both ends run the SAME recipe — the capped LSH variant
(max_bucket_size=64): on the 100x corpus every 100-copy cluster trips
the hot-bucket star-pairing guard, which is exactly the production
posture (bound pair OUTPUT while keeping clusters connected for the
downstream connected-components keeper pass).

PPJoin is measured at 10x only (the per-round `ppjoin_linearity`
section) and DOCUMENTED here for 100x rather than run: PPJoin is the
EXACT-threshold enumerator, so its output on the 100x corpus is owed
by spec — each ~100-copy cluster owes C(100,2) = 4,950 pairs vs
C(11,2) = 55 at 10x, i.e. ~90x more pairs per cluster on 10x the
clusters: ~900x the output rows of the 10x run (~247M pairs). At that
point wall-clock measures pair MATERIALIZATION, not join scaling — the
candidate-generation stages stay linear (prefix-filter relations grow
with docs), which the 10x run already demonstrates with throughput
RISING while emitting 401x the pairs. Enumerating 247M duplicate pairs
to re-prove that is the wrong target; the capped LSH path above is the
operator you run at that duplication density.

Usage: python tools/dedup_100x.py    (~5 min; writes tools/dedup_100x.json)
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

OUT = _REPO / "tools" / "dedup_100x.json"


def run() -> dict:
    import importlib.util

    from pyspark.sql import functions as F

    from log2sql_spark import get_spark
    from log2sql_spark.operators.dedup import minhash_dedup_pairs

    spark = get_spark("dedup_100x")
    spark.sparkContext.setLogLevel("ERROR")

    corpus100 = os.path.join(_REPO, ".bench_data", "sf10docs")
    if not os.path.exists(os.path.join(corpus100, "documents.parquet")):
        spec = importlib.util.spec_from_file_location(
            "gen_sf", os.path.join(_REPO, "tools", "gen_sf.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.generate(corpus100, 100, tables=("documents",))

    def measure(df) -> dict:
        docs = df.select("doc_id", "text").persist()
        n = docs.count()
        best, pairs = float("inf"), 0
        for _ in range(2):  # best-of-2, symmetric protocol
            t0 = time.time()
            pairs = minhash_dedup_pairs(
                docs, threshold=0.6, num_hashes=64, bands=32, max_bucket_size=64
            ).count()
            best = min(best, time.time() - t0)
        docs.unpersist()
        return {
            "docs": n,
            "pairs": pairs,
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
            "minhash_dedup_pairs threshold=0.6 num_hashes=64 bands=32 "
            "max_bucket_size=64 (capped variant), best-of-2 both ends"
        ),
        "base": base,
        "at_100x_docs": big,
        "docs_ratio": round(docs_ratio, 1),
        "sec_ratio": round(sec_ratio, 2),
        "linear": sec_ratio <= 1.5 * docs_ratio,
        "ppjoin_100x_note": (
            "not run by design: PPJoin is the exact-threshold enumerator, so "
            "the 100x corpus owes C(100,2)=4950 pairs per ~100-copy cluster "
            "(~900x the 10x run's output, ~247M pairs) — wall-clock there "
            "measures pair materialization, not join scaling; the 10x "
            "ppjoin_linearity section already shows throughput rising while "
            "emitting 401x the pairs, and the capped LSH path above is the "
            "operator for that duplication density"
        ),
    }


if __name__ == "__main__":
    result = run()
    OUT.write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result, indent=1))
