"""Run any registered query from the command line.

The user-facing entry point for ad-hoc use (the driver goes through
``__spark_entry__.py`` instead)::

    python tools/run_query.py q1_pricing_summary
    python tools/run_query.py llm_dedup_minhash_lsh --sf /root/testdata/sf0.1
    python tools/run_query.py q3_shipping_priority --explain
    python tools/run_query.py --list

``--explain`` prints the formatted physical plan instead of rows;
``--limit`` bounds the rows printed (default 20).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("query", nargs="?", help="registered query name")
    ap.add_argument("--sf", default="/root/testdata/sf0.01", help="table directory")
    ap.add_argument("--limit", type=int, default=20, help="max rows to print")
    ap.add_argument("--explain", action="store_true", help="print the physical plan")
    ap.add_argument("--list", action="store_true", help="list registered queries")
    args = ap.parse_args()

    from log2sql_spark import get_spark, registry

    qs = registry.all_queries()
    if args.list or not args.query:
        for name in sorted(qs):
            print(name)
        return 0
    if args.query not in qs:
        import difflib

        near = difflib.get_close_matches(args.query, qs, n=3)
        hint = f" (did you mean: {', '.join(near)}?)" if near else ""
        print(f"unknown query {args.query!r}{hint}", file=sys.stderr)
        return 2

    spark = get_spark("log2sql_spark_cli")
    spark.sparkContext.setLogLevel("ERROR")
    df = qs[args.query](spark, args.sf)
    if args.explain:
        df.explain("formatted")
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
