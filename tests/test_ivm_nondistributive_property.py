"""Property tests for the NON-distributive IVM operators
(operators/ivm.py: minmax_apply, distinct_apply): arbitrary base tables
and CDC batches must leave the maintained view equal to a full
recompute of the post-change state — the same recompute-equivalence the
oracle queries check once, here over hypothesis-generated histories
that hit the edges the fixtures can't enumerate (delete-the-only-row,
group drain and rebirth within one batch, update that lands on the same
value, multiplicity going 2->1->0)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from log2sql_spark.operators.ivm import (
    distinct_apply,
    distinct_mv,
    minmax_apply,
    minmax_mv,
)

GROUPS = st.sampled_from(["g1", "g2", "g3"])
VALS = st.integers(min_value=-5, max_value=5)

# base: list of (group, val); keys are implicit row ids
BASE = st.lists(st.tuples(GROUPS, VALS), min_size=0, max_size=8)
# ops against base rows / new rows
N_DELS = st.integers(min_value=0, max_value=8)
N_UPDS = st.integers(min_value=0, max_value=8)
INSERTS = st.lists(st.tuples(GROUPS, VALS), min_size=0, max_size=4)


def _split_changes(base, n_dels, n_upds, inserts):
    """Deterministically carve deletes/updates out of the base rows:
    the first n_dels rows delete, the next n_upds update (value+1,
    cyclically shifted group), the rest stay; inserts add new rows."""
    groups = ["g1", "g2", "g3"]
    dels = base[:n_dels]
    upds = [
        (g, v, groups[(groups.index(g) + 1) % 3], v + 1)
        for g, v in base[n_dels : n_dels + n_upds]
    ]
    kept = base[n_dels + n_upds :]
    return dels, upds, kept


def _changes_df(spark, dels, upds, inserts):
    rows = (
        [("delete", None, None, g, v) for g, v in dels]
        + [("update", g2, v2, g, v) for g, v, g2, v2 in upds]
        + [("insert", g, v, None, None) for g, v in inserts]
    )
    return spark.createDataFrame(
        rows, "op string, grp string, val long, before_grp string, before_val long"
    )


def _post_state(dels, upds, kept, inserts):
    return kept + [(g2, v2) for _, _, g2, v2 in upds] + list(inserts)


@pytest.mark.slow
@pytest.mark.filterwarnings("ignore::hypothesis.errors.HypothesisWarning")
@given(base=BASE, n_dels=N_DELS, n_upds=N_UPDS, inserts=INSERTS)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_minmax_apply_equals_recompute(spark, base, n_dels, n_upds, inserts):
    dels, upds, kept = _split_changes(base, n_dels, n_upds, inserts)
    base_df = spark.createDataFrame(base or [], "grp string, val long")
    mv = minmax_mv(base_df, ["grp"], "val")
    changes = _changes_df(spark, dels, upds, inserts)
    post = _post_state(dels, upds, kept, inserts)
    base_new = spark.createDataFrame(post or [], "grp string, val long")

    got = {
        r["grp"]: (r["n"], r["min_v"], r["max_v"])
        for r in minmax_apply(mv, changes, base_new, ["grp"], "val").collect()
    }
    want = {
        r["grp"]: (r["n"], r["min_v"], r["max_v"])
        for r in base_new.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("val").alias("min_v"),
            F.max("val").alias("max_v"),
        )
        .collect()
    }
    assert got == want


@pytest.mark.slow
@pytest.mark.filterwarnings("ignore::hypothesis.errors.HypothesisWarning")
@given(base=BASE, n_dels=N_DELS, n_upds=N_UPDS, inserts=INSERTS)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_distinct_apply_equals_recompute(spark, base, n_dels, n_upds, inserts):
    dels, upds, kept = _split_changes(base, n_dels, n_upds, inserts)
    base_df = spark.createDataFrame(base or [], "grp string, val long")
    view, support = distinct_mv(base_df, ["grp"], "val")
    changes = _changes_df(spark, dels, upds, inserts)
    post = _post_state(dels, upds, kept, inserts)
    post_df = spark.createDataFrame(post or [], "grp string, val long")

    got = {
        r["grp"]: r["n_distinct"]
        for r in distinct_apply(view, support, changes, ["grp"], "val").collect()
    }
    want = {
        r["grp"]: r["nd"]
        for r in post_df.groupBy("grp")
        .agg(F.count_distinct("val").cast("long").alias("nd"))
        .collect()
    }
    assert got == want
