"""Quick per-query headline timing — the bench's measured loop only.

Same methodology as bench.py (best-of-3 noop-sink execution at
$SPARK_GRAFT_SF_DIR, build separated), without the linearity probes and
admission machinery — for fast optimize/re-measure iteration inside a
round. The committed BENCH.json still comes from the full bench.py.

    python tools/headline_times.py [query ...]   # default: all HEADLINE
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from bench import HEADLINE, SF_DIR  # noqa: E402
from log2sql_spark import get_spark, registry  # noqa: E402


def main() -> None:
    names = sys.argv[1:] or HEADLINE
    spark = get_spark("log2sql_spark_headline_times")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()
    qs["q1_pricing_summary"](spark, SF_DIR).write.mode("overwrite").format(
        "noop"
    ).save()
    times: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(3):
            df = qs[name](spark, SF_DIR)
            t1 = time.time()
            spark.sparkContext.setJobDescription(f"headline:{name}")
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t1)
        times[name] = round(best, 3)
        spark.catalog.clearCache()
        print(f"{name}: {times[name]}", flush=True)
    print(json.dumps({"total": round(sum(times.values()), 3), "queries": times}))


if __name__ == "__main__":
    main()
