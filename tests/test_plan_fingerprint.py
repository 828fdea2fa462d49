"""Plan-fingerprint regression gate (VERDICT r11 #1).

The static plan shape — exchanges, broadcast joins, pushed filters,
row-Python — is what predicts 100x behavior, it is deterministic, and
it is already frozen per query in tools/plan_fingerprint.json. These
tests make a silent plan-shape regression impossible:

* the diff logic itself is proven to FIRE on an intentionally
  de-optimized query (an injected repartition / a dropped broadcast
  hint) — the gate is demonstrably live, not vacuous;
* a rotating deterministic sample of committed queries is re-planned
  and diffed on every fast-suite run;
* the FULL 361-query sweep runs under the slow marker (same tier as
  the full oracle gate) and per-round via tools/plan_fingerprint.py.

Legitimate plan changes land by re-running
``python tools/plan_fingerprint.py --update`` so the diff shows up in
git review — looked at, never silently absorbed.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from tools.plan_fingerprint import (  # noqa: E402
    DEFAULT_SF_DIR,
    compute_all,
    diff_fingerprints,
    fingerprint_df,
    load_committed,
)


def test_committed_fingerprint_covers_registry():
    """Every registered query has a committed fingerprint and none is
    an error entry; stale entries (unregistered queries) are absent."""
    from log2sql_spark import registry

    committed = load_committed()
    assert committed, "tools/plan_fingerprint.json missing — run --update"
    registered = set(registry.all_queries())
    missing = registered - set(committed)
    stale = set(committed) - registered
    errs = {k for k, v in committed.items() if "error" in v}
    assert not missing, f"queries without a committed fingerprint: {sorted(missing)}"
    assert not stale, f"stale fingerprints for unregistered queries: {sorted(stale)}"
    assert not errs, f"committed fingerprints with errors: {sorted(errs)}"


def test_gate_fires_on_deoptimized_plan(spark):
    """The diff must detect each regression class on a real plan pair:
    grown exchanges (injected repartition), shrunk broadcasts (hint
    stripped), shrunk pushdown (filter moved behind a barrier), and
    row-Python appearing."""
    import pyspark.sql.functions as F

    from log2sql_spark.sources.tables import load_table

    nation = load_table(spark, "nation", DEFAULT_SF_DIR)
    region = load_table(spark, "region", DEFAULT_SF_DIR)

    good = nation.filter(F.col("n_regionkey") >= 1).join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    old = {"q": fingerprint_df(good)}

    # 1) exchange growth: gratuitous repartition
    worse = good.repartition(64)
    regs, _ = diff_fingerprints(old, {"q": fingerprint_df(worse)})
    assert any("exchanges grew" in r for r in regs), regs

    # 2) broadcast degraded: SMJ-hinted join instead
    smj = nation.filter(F.col("n_regionkey") >= 1).join(
        region.hint("merge"), nation.n_regionkey == region.r_regionkey
    )
    regs, _ = diff_fingerprints(old, {"q": fingerprint_df(smj)})
    assert any("broadcast joins shrank" in r for r in regs), regs

    # 3) pushdown lost: the same predicate stuck behind a limit barrier
    #    (Catalyst cannot push a filter through LIMIT, so the scan no
    #    longer sees it — grouping-column filters DO push through
    #    aggregates, which is why an agg barrier wouldn't demonstrate
    #    this class)
    lost = (
        nation.limit(1_000)
        .filter(F.col("n_regionkey") >= 1)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
    )
    new_fp = fingerprint_df(lost)
    assert new_fp["pushed_filters"] < old["q"]["pushed_filters"]
    regs, _ = diff_fingerprints(old, {"q": new_fp})
    assert any("pushed filters shrank" in r for r in regs), regs

    # 4) row-Python appears: a row-at-a-time Python UDF in the plan
    from pyspark.sql.types import LongType

    slow_udf = F.udf(lambda x: x + 1, LongType(), useArrow=False)
    pyrow = good.withColumn("bad", slow_udf(F.col("n_nationkey")))
    new_fp = fingerprint_df(pyrow)
    assert new_fp["row_python"] is True
    regs, _ = diff_fingerprints(old, {"q": new_fp})
    assert any("row-at-a-time Python appeared" in r for r in regs), regs

    # improvements and new queries are notices, never regressions
    regs, notes = diff_fingerprints({"q": fingerprint_df(worse)}, old)
    assert not regs and any("improved" in n for n in notes)
    regs, notes = diff_fingerprints({}, old)
    assert not regs and any("NEW query" in n for n in notes)


def _sample_names(k: int = 18) -> list[str]:
    """Deterministic rotating sample: day-independent ordering by md5
    of the name, sliced by the committed fingerprint length so every
    fast-suite run checks the same k for a given committed file, and
    the sample rotates whenever the registry changes."""
    import hashlib

    committed = load_committed()
    names = sorted(
        committed,
        key=lambda n: hashlib.md5(f"{len(committed)}:{n}".encode()).hexdigest(),
    )
    return names[:k]


def test_sampled_fingerprints_match_committed(spark):
    committed = load_committed()
    sample = _sample_names()
    new = compute_all(spark, DEFAULT_SF_DIR, sample)
    regressions, _ = diff_fingerprints(
        {k: committed[k] for k in sample if k in committed}, new
    )
    assert not regressions, "\n".join(regressions)


@pytest.mark.slow
def test_full_fingerprint_sweep_matches_committed(spark):
    committed = load_committed()
    new = compute_all(spark, DEFAULT_SF_DIR)
    regressions, notices = diff_fingerprints(committed, new)
    # NEW/vanished queries are hard failures here: the slow sweep is
    # the per-round completeness check (the fast test only asserts
    # registry == committed keys)
    drift = [n for n in notices if "NEW query" in n or "no longer registered" in n]
    assert not regressions and not drift, "\n".join(regressions + drift)
