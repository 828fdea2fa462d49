"""Runtime-metrics regression gate (VERDICT r12 #2): the static plan
fingerprint pins plan SHAPE; it cannot see data-volume regressions — a
filter that stops pruning rows, a broadcast table that grew 10x. This
gate freezes per-query shuffle records (tools/runtime_metrics.json,
measured by executing every registered query at sf0.01) and fails any
query whose recomputed shuffle volume grew beyond 2x committed (above
an absolute floor) without an in-file disposition.

Liveness is proven the same way as the fingerprint gate: the diff is
shown to FIRE on an intentionally de-pruned real plan, measured through
the real capture path (AppStatusStore stage deltas), not synthetic
dicts alone.
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import pytest

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from tools.runtime_metrics import (  # noqa: E402
    DEFAULT_SF_DIR,
    GROWTH_FLOOR,
    compute_all,
    diff_metrics,
    load_committed,
    measure_df,
)


def test_committed_metrics_cover_registry():
    from log2sql_spark import registry

    committed = load_committed()
    assert committed, "tools/runtime_metrics.json missing — run --update"
    registered = set(registry.all_queries())
    missing = registered - set(committed)
    stale = set(committed) - registered
    errs = {k for k, v in committed.items() if "error" in v}
    assert not missing, f"queries without committed metrics: {sorted(missing)}"
    assert not stale, f"stale metrics for unregistered queries: {sorted(stale)}"
    assert not errs, f"committed metrics with errors: {sorted(errs)}"


def test_diff_logic():
    old = {"q": {"shuffle_records": 100_000, "shuffle_bytes": 1, "rows_out": 5}}
    # >2x AND above the absolute floor -> regression
    new = {"q": {"shuffle_records": 250_000, "shuffle_bytes": 1, "rows_out": 5}}
    regs, _ = diff_metrics(old, new)
    assert any("shuffle records grew" in r for r in regs)
    # >2x but tiny absolute growth -> never a regression (AQE jitter on
    # small queries)
    old_small = {"q": {"shuffle_records": 100, "shuffle_bytes": 1, "rows_out": 5}}
    new_small = {"q": {"shuffle_records": 900, "shuffle_bytes": 1, "rows_out": 5}}
    regs, _ = diff_metrics(old_small, new_small)
    assert not regs
    # big growth on a DISPOSITIONED query -> notice, not regression
    import tools.runtime_metrics as rm

    old_d = {"graph_connected_components": {"shuffle_records": 100_000, "shuffle_bytes": 1, "rows_out": 5}}
    new_d = {"graph_connected_components": {"shuffle_records": 900_000, "shuffle_bytes": 1, "rows_out": 5}}
    assert "graph_connected_components" in rm.DISPOSITIONS
    regs, notes = diff_metrics(old_d, new_d)
    assert not regs and any("disposition" in n for n in notes)
    # a query that starts erroring is a regression; rows_out change is
    # a notice (the oracle gate owns correctness)
    regs, _ = diff_metrics(old, {"q": {"error": "boom"}})
    assert any("now errors" in r for r in regs)
    _, notes = diff_metrics(
        old, {"q": {"shuffle_records": 100_000, "shuffle_bytes": 1, "rows_out": 7}}
    )
    assert any("rows_out changed" in n for n in notes)


def _bushy(spark, prune: bool):
    """A real plan pair: the pruned side filters before a
    high-cardinality groupBy; the de-pruned side ships every row to the
    shuffle — the filter-stopped-pruning regression class."""
    import pyspark.sql.functions as F

    from log2sql_spark.sources.tables import load_table

    li = load_table(spark, "lineitem", DEFAULT_SF_DIR)
    if prune:
        li = li.filter(F.col("l_quantity") < 2)
    return li.groupBy("l_orderkey", "l_linenumber").agg(
        F.sum("l_quantity").alias("q")
    )


def test_gate_fires_on_depruned_plan(spark):
    """End-to-end liveness through the REAL capture path: measure the
    pruned plan, de-prune it, re-measure, and the diff must flag the
    shuffle-records growth."""
    good = measure_df(spark, _bushy(spark, prune=True))
    bad = measure_df(spark, _bushy(spark, prune=False))
    assert bad["shuffle_records"] > 2 * max(good["shuffle_records"], 1)
    assert bad["shuffle_records"] - good["shuffle_records"] > GROWTH_FLOOR
    regs, _ = diff_metrics({"q": good}, {"q": bad})
    assert any("shuffle records grew" in r for r in regs), regs
    # improvements are notices, never regressions
    regs, notes = diff_metrics({"q": bad}, {"q": good})
    assert not regs and any("improved" in n for n in notes)


def test_capture_is_deterministic_and_isolated(spark):
    """Same plan measured twice -> identical shuffle records (the gate
    would be noise otherwise), and rows_out matches a direct count
    (the ride-along observe sees the same execution)."""
    a = measure_df(spark, _bushy(spark, prune=True))
    b = measure_df(spark, _bushy(spark, prune=True))
    assert a["shuffle_records"] == b["shuffle_records"]
    assert a["rows_out"] == b["rows_out"] == _bushy(spark, prune=True).count()
    assert a["shuffle_records"] > 0  # a groupBy genuinely shuffles


def _sample_names(k: int = 8) -> list[str]:
    """Deterministic rotating sample, disjoint ordering from the
    fingerprint gate's (different salt) so the two fast samples cover
    different queries each round."""
    committed = load_committed()
    names = sorted(
        committed,
        key=lambda n: hashlib.md5(f"rtm:{n}".encode()).hexdigest(),
    )
    if not names:
        return []
    start = len(names) % max(len(names), 1)
    picked = [names[(start + i * 7) % len(names)] for i in range(k)]
    return sorted(set(picked))


def test_sampled_queries_match_committed_metrics(spark):
    committed = load_committed()
    names = _sample_names()
    assert names, "no committed metrics to sample"
    new = compute_all(spark, DEFAULT_SF_DIR, names)
    regs, _ = diff_metrics({n: committed[n] for n in names if n in committed}, new)
    assert not regs, regs


@pytest.mark.slow
def test_full_registry_matches_committed_metrics(spark):
    committed = load_committed()
    new = compute_all(spark, DEFAULT_SF_DIR)
    regs, _ = diff_metrics(committed, new)
    assert not regs, regs
