"""One-time 100x as-of-join anchor (round 14, companion to
tools/dedup_100x.py and tools/substr_100x.py).

The per-round bench times `join_asof` on a 2k-event slice; the 100 TB
claim for the union+window as-of kernel (operators/asof.py:asof_join —
ONE shuffle on the key, struct-carried right row) deserves a measured
two-decade anchor like the dedup family has. This tool runs the FULL
events-x-orders backward as-of join (no event_id slice) at the base
scale (sf0.1) and at 100x rows (.bench_data/sf10, built by
tools/gen_sf.py), and records the ratio to ``tools/asof_100x.json``,
which bench.py embeds into every BENCH.json.

Why this operator stays linear where a per-row probe join explodes:
both sides union into one (key, ts)-sorted shuffle, the match is a
last(ignoreNulls) carry inside each key partition, and the output is
one row per left row — there is no candidate-pair blowup to cap. Key
count grows with the data (gen_sf remaps user_id spans per copy), so
the 100x run is 100x MORE keys of the same per-key depth — the shape a
1000-executor cluster actually sees.

Usage: python tools/asof_100x.py   (run on an idle box; ~5-10 min;
writes tools/asof_100x.json)
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

OUT = _REPO / "tools" / "asof_100x.json"


def run() -> dict:
    import importlib.util

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from log2sql_spark import get_spark
    from log2sql_spark.operators.asof import asof_join

    spark = get_spark("asof_100x")
    spark.sparkContext.setLogLevel("ERROR")

    corpus100 = os.path.join(_REPO, ".bench_data", "sf10")
    if not os.path.exists(os.path.join(corpus100, "events.parquet")):
        spec = importlib.util.spec_from_file_location(
            "gen_sf", os.path.join(_REPO, "tools", "gen_sf.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.generate(corpus100, 100, tables=("events", "orders"))

    def measure(sf_dir: str, best_of: int = 2) -> dict:
        # identical prep to queries/extra.py:join_asof, minus the bench
        # slice: full events left side, orders deduped to one row per
        # (user_id, ts) so the match is deterministic.
        events = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
            "event_id", "ts", "user_id", "value"
        )
        orders = (
            spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
            .select(
                F.col("o_custkey").alias("user_id"),
                F.col("o_orderdate").alias("ts"),
                "o_orderkey",
                "o_totalprice",
            )
            .withColumn(
                "rn",
                F.row_number().over(
                    W.partitionBy("user_id", "ts").orderBy(F.desc("o_orderkey"))
                ),
            )
            .filter("rn = 1")
            .drop("rn")
        )
        n_left = events.count()
        n_right = orders.count()
        best, matched = float("inf"), 0
        for _ in range(best_of):
            t0 = time.time()
            out = asof_join(
                events, orders, on="ts", by="user_id",
                right_cols=["o_orderkey", "o_totalprice"],
            )
            matched = out.filter(F.col("o_orderkey").isNotNull()).count()
            best = min(best, time.time() - t0)
        return {
            "left_rows": n_left,
            "right_rows": n_right,
            "matched": matched,
            "sec": round(best, 3),
            "rows_per_sec": round(n_left / best),
        }

    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = measure(base_dir)
    big = measure(corpus100)

    rows_ratio = big["left_rows"] / max(base["left_rows"], 1)
    sec_ratio = big["sec"] / max(base["sec"], 1e-9)
    return {
        "recipe": (
            "asof_join(events, orders dedup per (user_id, ts), backward) "
            "full tables, count of matched rows, best-of-2 both ends"
        ),
        "base": base,
        "at_100x_rows": big,
        "rows_ratio": round(rows_ratio, 1),
        "sec_ratio": round(sec_ratio, 2),
        "linear": sec_ratio <= 1.5 * rows_ratio,
    }


if __name__ == "__main__":
    result = run()
    OUT.write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result, indent=1))
