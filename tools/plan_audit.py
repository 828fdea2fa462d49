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
)


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
                )
            )
        except Exception as exc:  # noqa: BLE001
            rows.append((name, -1, -1, -1, f"ERR {str(exc)[:40]}", ""))
    print(f"{'query':38} {'xchg':>4} {'bcast':>5} {'push':>4}  flags")
    for name, xchg, bcast, push, py, pandas in sorted(rows):
        flags = " ".join(x for x in (py, pandas) if x)
        print(f"{name:38} {xchg:>4} {bcast:>5} {push:>4}  {flags}")
    worst = [r for r in rows if r[1] >= 6 or r[4] == "PY!"]
    print(f"\n{len(rows)} queries; {len(worst)} flagged (>=6 shuffles or row-Python)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
