"""Model-based property test: SnapshotStore.merge versus a dict model.

Random CDC histories (insert/update/delete per key, arbitrary version
order, split into arbitrary micro-batches, clustered or not) must leave
the store equal to the obvious sequential model: per key, the change
with the highest version wins; delete removes; store rows only survive
untouched keys. Catches ordering bugs, pruning bugs (clustered path),
and batch-boundary bugs in one property.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from log2sql_spark.store import SnapshotStore

KEYS = st.integers(min_value=0, max_value=9)
VALS = st.text(alphabet="abcxyz", min_size=1, max_size=3)
OPS = st.sampled_from(["insert", "update", "delete"])

# a history: list of (key, val, op); version = position in the list
HISTORY = st.lists(st.tuples(KEYS, VALS, OPS), min_size=1, max_size=12)
# batch split points: how many leading changes the first merge takes
SPLITS = st.integers(min_value=0, max_value=12)


def _model(base: dict[int, str], history):
    """Sequential reference semantics: last change per key wins."""
    final = dict(base)
    latest: dict[int, tuple[int, str, str]] = {}
    for seq, (k, v, op) in enumerate(history):
        latest[k] = (seq, v, op)
    for k, (_, v, op) in latest.items():
        if op == "delete":
            final.pop(k, None)
        else:
            final[k] = v
    return final


@pytest.mark.slow
# hypothesis notices Spark's py4j threads fiddling the recursion limit;
# harmless here, and not something the test controls
@pytest.mark.filterwarnings("ignore::hypothesis.errors.HypothesisWarning")
@given(history=HISTORY, split=SPLITS, layout=st.sampled_from(["none", "range", "hash"]))
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_merge_matches_model(spark, tmp_path_factory, history, split, layout):
    base = {0: "base0", 5: "base5"}
    store = SnapshotStore(str(tmp_path_factory.mktemp("prop") / "s"))
    store.commit(
        spark.createDataFrame(
            [(k, v) for k, v in base.items()], "k bigint, val string"
        ),
        mode="overwrite",
        cluster_by=None if layout == "none" else "k",
        layout="range" if layout == "none" else layout,
        target_files=3,
    )

    def to_df(changes_with_seq):
        return spark.createDataFrame(
            [(k, v, op, seq) for seq, (k, v, op) in changes_with_seq],
            "k bigint, val string, op string, seq int",
        )

    indexed = list(enumerate(history))
    split = min(split, len(indexed))
    for batch in (indexed[:split], indexed[split:]):
        if batch:
            store.merge(spark, to_df(batch), key_cols="k", version_cols="seq")

    got = {r.k: r.val for r in store.read(spark).collect()}
    assert got == _model(base, history)


@pytest.mark.slow
@pytest.mark.filterwarnings("ignore::hypothesis.errors.HypothesisWarning")
@given(history=HISTORY, split=SPLITS, layout=st.sampled_from(["none", "range"]))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_branch_merge_matches_direct_apply(
    spark, tmp_path_factory, history, split, layout
):
    """Refs property: staging an arbitrary CDC history on a BRANCH
    (split into arbitrary micro-batches) and fast-forward-merging must
    leave main byte-equal to applying the same history directly — i.e.
    merge_branch is transparent: fork + stage + publish composes to the
    identity on table state, whatever the history. Catches borrowed-
    entry rewrite bugs, hard-link path bugs, and manifest-inheritance
    drift under every layout."""
    base = {0: "base0", 5: "base5"}
    root = tmp_path_factory.mktemp("refprop")
    schema = "k bigint, val string"
    base_df = spark.createDataFrame(list(base.items()), schema)

    def to_df(changes_with_seq):
        return spark.createDataFrame(
            [(k, v, op, seq) for seq, (k, v, op) in changes_with_seq],
            "k bigint, val string, op string, seq int",
        )

    def apply_history(store):
        indexed = list(enumerate(history))
        cut = min(split, len(indexed))
        for batch in (indexed[:cut], indexed[cut:]):
            if batch:
                store.merge(spark, to_df(batch), key_cols="k", version_cols="seq")

    kw = dict(
        mode="overwrite",
        cluster_by=None if layout == "none" else "k",
        target_files=3,
    )
    direct = SnapshotStore(str(root / "direct"))
    direct.commit(base_df, **kw)
    apply_history(direct)

    staged = SnapshotStore(str(root / "staged"))
    staged.commit(base_df, **kw)
    br = staged.create_branch("wap")
    apply_history(br)
    v = staged.merge_branch(spark, "wap", drop=True)

    got_direct = {r.k: r.val for r in direct.read(spark).collect()}
    got_staged = {r.k: r.val for r in staged.read(spark, v).collect()}
    assert got_staged == got_direct == _model(base, history)
    assert staged.fsck(v) == []  # every merged entry physically present
