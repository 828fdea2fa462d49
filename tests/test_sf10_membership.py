"""Self-selecting sf10 linearity membership (VERDICT r11 #4).

bench.py derives the sf10 suite from tools/sf1_budgets.json each run
instead of a hand-curated list, so a heavy new operator cannot ship
without a scale ratio. These pins make the derivation trustworthy:

* every ELIGIBLE query whose sf1 budget exceeds SF10_BUDGET_PIN is a
  member — the gate the verdict asked for;
* every eligible query with NO committed budget (new this round) is a
  member;
* exclusions are all reasoned (non-empty reason strings) and point at
  real queries — a stale exclusion would silently shrink coverage;
* membership is deterministic (stable across repeated computation).

No Spark session needed: membership is pure metadata (budgets JSON +
oracle table references).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

import bench  # noqa: E402
from log2sql_spark import registry  # noqa: E402


def _eligible_names() -> set[str]:
    import re

    oracles = registry.all_oracles()
    pat = re.compile(r"\b(" + "|".join(bench._SF10_SCALING_TABLES) + r")\b")
    return {
        n
        for n in registry.all_queries()
        if n not in bench.SF10_EXCLUDED
        and not n.startswith(bench.SF10_EXCLUDED_PREFIXES)
        and oracles.get(n)
        and pat.search(oracles[n])
    }


def test_heavy_budgets_cannot_dodge_sf10():
    budgets = json.load(open(_REPO / "tools" / "sf1_budgets.json"))
    members = set(bench.sf10_membership()["members"])
    heavy = {
        n for n in _eligible_names() if budgets.get(n, 0.0) >= bench.SF10_BUDGET_PIN
    }
    missing = heavy - members
    assert not missing, (
        f"eligible queries with sf1 budget >= {bench.SF10_BUDGET_PIN}s missing "
        f"from the sf10 suite: {sorted(missing)} — raise SF10_TOP_N or fix"
    )
    # the pin must not be vacuous: the top-N window actually covers it
    assert heavy, "no eligible budget reaches the pin — lower SF10_BUDGET_PIN"


def test_new_queries_are_members_by_default():
    budgets = json.load(open(_REPO / "tools" / "sf1_budgets.json"))
    m = bench.sf10_membership()
    new = [n for n in _eligible_names() if n not in budgets]
    assert sorted(m["new_this_round"]) == sorted(new)
    assert set(new) <= set(m["members"])


def test_exclusions_are_reasoned_and_live():
    queries = set(registry.all_queries())
    for name, reason in bench.SF10_EXCLUDED.items():
        assert name in queries, f"stale sf10 exclusion: {name}"
        assert reason and len(reason) > 10, f"exclusion {name} needs a real reason"
    # prefix exclusions must match at least one query each (else stale)
    for pfx in bench.SF10_EXCLUDED_PREFIXES:
        assert any(q.startswith(pfx) for q in queries), f"stale prefix {pfx}"


def test_membership_is_deterministic():
    a = bench.sf10_membership()
    b = bench.sf10_membership()
    assert a == b
    assert a["members"] == sorted(a["members"])
    assert len(a["members"]) >= bench.SF10_TOP_N
