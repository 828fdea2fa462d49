"""Plan-fingerprint regression gate: freeze the STATIC plan shape of
every registered query and machine-diff it per round.

Rounds 7-11 each burned a session adjudicating wall-clock noise while
the thing that actually predicts 100x behavior — exchange count,
broadcast-join count, pushed-filter count, row-at-a-time Python — is
deterministic and cheap to compute. This tool freezes those four
numbers per query into ``tools/plan_fingerprint.json``; the pytest gate
(tests/test_plan_fingerprint.py) recomputes them and FAILS any query
whose plan got structurally worse:

* exchange count GREW          (a new shuffle appeared)
* broadcast-join count SHRANK  (a broadcast degraded to SMJ)
* pushed-filter count SHRANK   (a pushdown stopped reaching the scan)
* row-Python APPEARED          (BatchEvalPython in the hot path)

A plan may legitimately change (new operator revision, Spark upgrade);
the workflow then is to re-run ``python tools/plan_fingerprint.py
--update`` and let the diff show up in git review — the gate forces the
change to be LOOKED AT, never silently absorbed. Improvements (fewer
exchanges, more broadcasts/pushdowns) are auto-accepted by the gate but
still only land in the committed fingerprint via --update.

Usage:
    python tools/plan_fingerprint.py            # check (exit 1 on regressions)
    python tools/plan_fingerprint.py --update   # rewrite the committed file
    python tools/plan_fingerprint.py --update q1_pricing_summary ...  # subset

Fingerprints are computed at sf0.001 (plan SHAPE is data-independent
for these queries at fixed schema; the smallest SF keeps the eager
iterative operators — kcore, pagerank, IVM folds — cheap to build).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

FINGERPRINT_PATH = _REPO / "tools" / "plan_fingerprint.json"
DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def fingerprint_df(df) -> dict:
    """The four static-plan numbers that predict 100 TB behavior."""
    from log2sql_spark.plans.explain import (
        broadcast_join_count,
        explain_str,
        pushed_filters,
        shuffle_count,
    )

    return {
        "exchanges": shuffle_count(df),
        "broadcasts": broadcast_join_count(df),
        "pushed_filters": len(pushed_filters(df)),
        "row_python": "BatchEvalPython" in explain_str(df),
    }


def compute_all(spark, sf_dir: str, names: list[str] | None = None) -> dict:
    from log2sql_spark import registry

    out: dict[str, dict] = {}
    queries = registry.all_queries()
    for name, fn in sorted(queries.items()):
        if names and name not in names:
            continue
        try:
            out[name] = fingerprint_df(fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": str(exc)[:200]}
        # Operators persist() shared subtrees as they build; a persisted
        # relation registers in the CacheManager immediately, so WITHOUT
        # clearing, a LATER query whose plan contains the same subtree
        # fingerprints with an InMemoryRelation swapped in — making
        # fingerprints depend on registry iteration order. Clear per
        # query (same hygiene as runtime_metrics/bench) so each
        # fingerprint sees only its own caches.
        spark.catalog.clearCache()
    return out


def load_committed() -> dict:
    if not FINGERPRINT_PATH.exists():
        return {}
    return json.loads(FINGERPRINT_PATH.read_text())


def diff_fingerprints(old: dict, new: dict) -> tuple[list[str], list[str]]:
    """Compare committed vs recomputed fingerprints.

    Returns (regressions, notices). Regressions fail the gate:
    structural degradation or an error building a previously-clean
    plan. Notices are informational: improvements, new queries not yet
    committed, or queries that vanished from the registry — these want
    a --update, not a red build.
    """
    regressions: list[str] = []
    notices: list[str] = []
    for name, nf in sorted(new.items()):
        of = old.get(name)
        if of is None:
            notices.append(f"{name}: NEW query — run --update to commit its fingerprint")
            continue
        if "error" in nf:
            if "error" in of:
                continue
            regressions.append(f"{name}: plan build now errors: {nf['error']}")
            continue
        if "error" in of:
            notices.append(f"{name}: previously errored, now builds — run --update")
            continue
        if nf["exchanges"] > of["exchanges"]:
            regressions.append(
                f"{name}: exchanges grew {of['exchanges']} -> {nf['exchanges']} "
                "(a new shuffle appeared)"
            )
        elif nf["exchanges"] < of["exchanges"]:
            notices.append(
                f"{name}: exchanges improved {of['exchanges']} -> {nf['exchanges']}"
            )
        if nf["broadcasts"] < of["broadcasts"]:
            regressions.append(
                f"{name}: broadcast joins shrank {of['broadcasts']} -> "
                f"{nf['broadcasts']} (broadcast degraded to SMJ?)"
            )
        elif nf["broadcasts"] > of["broadcasts"]:
            notices.append(
                f"{name}: broadcasts improved {of['broadcasts']} -> {nf['broadcasts']}"
            )
        if nf["pushed_filters"] < of["pushed_filters"]:
            regressions.append(
                f"{name}: pushed filters shrank {of['pushed_filters']} -> "
                f"{nf['pushed_filters']} (a pushdown stopped reaching the scan)"
            )
        if nf["row_python"] and not of["row_python"]:
            regressions.append(f"{name}: row-at-a-time Python appeared (BatchEvalPython)")
    for name in sorted(set(old) - set(new)):
        notices.append(f"{name}: no longer registered — run --update to drop it")
    return regressions, notices


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    update = "--update" in sys.argv
    sf_dir = DEFAULT_SF_DIR
    names = args or None

    from log2sql_spark import get_spark

    spark = get_spark("plan_fingerprint")
    spark.sparkContext.setLogLevel("ERROR")
    new = compute_all(spark, sf_dir, names)

    if update:
        committed = load_committed()
        committed.update(new)
        if names is None:  # full recompute: drop unregistered queries
            committed = {k: v for k, v in committed.items() if k in new}
        FINGERPRINT_PATH.write_text(
            json.dumps(committed, indent=1, sort_keys=True) + "\n"
        )
        errs = [k for k, v in committed.items() if "error" in v]
        print(f"wrote {FINGERPRINT_PATH} ({len(committed)} queries, {len(errs)} errors)")
        for k in errs:
            print(f"  ERROR {k}: {committed[k]['error']}")
        return 1 if errs else 0

    old = load_committed()
    if not old:
        print("no committed fingerprint — run with --update first")
        return 1
    regressions, notices = diff_fingerprints(old, new)
    for n in notices:
        print(f"NOTE  {n}")
    for r in regressions:
        print(f"REGRESSION  {r}")
    print(f"\n{len(new)} checked: {len(regressions)} regressions, {len(notices)} notices")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
