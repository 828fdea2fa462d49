"""Store schema evolution (Delta mergeSchema analog): enforcement by
default, additive widening with merge_schema=True, NULL back-fill for
pre-evolution files, evolved manifest contract — on commit-append,
merge, and the pruned-merge file-carry path.

Property test (model-based, alongside tests/test_store_property.py):
random histories where a widening happens mid-stream must read back
exactly like the sequential dict model with None for rows never
assigned the new column.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from log2sql_spark.operators.merge import merge_into
from log2sql_spark.store import SnapshotStore


def _base_store(spark, path, cluster=True, n=20):
    store = SnapshotStore(str(path))
    df = spark.createDataFrame(
        [(k, f"v{k}") for k in range(n)], "k bigint, val string"
    )
    store.commit(
        df,
        mode="overwrite",
        cluster_by="k" if cluster else None,
        target_files=4,
    )
    return store


def test_append_with_new_column_raises_without_merge_schema(spark, tmp_path):
    store = _base_store(spark, tmp_path / "s", cluster=False)
    widened = spark.createDataFrame(
        [(100, "x", "web")], "k bigint, val string, channel string"
    )
    with pytest.raises(ValueError, match="merge_schema=True"):
        store.commit(widened, mode="append")
    # the failed append must leave no new version and no orphan entries
    assert store.versions() == [1]


def test_append_merge_schema_widens_and_backfills_null(spark, tmp_path):
    store = _base_store(spark, tmp_path / "s", cluster=False)
    widened = spark.createDataFrame(
        [(100, "x", "web")], "k bigint, val string, channel string"
    )
    v2 = store.commit(widened, mode="append", merge_schema=True)
    got = {r.k: (r.val, r.channel) for r in store.read(spark).collect()}
    assert got[100] == ("x", "web")
    assert got[0] == ("v0", None)  # pre-evolution file reads NULL
    # manifest records the evolved union schema, store columns first
    names = [
        f["name"]
        for f in json.loads(store.snapshot(v2).schema_json)["fields"]
    ]
    assert names == ["k", "val", "channel"]


def test_subset_append_keeps_full_contract(spark, tmp_path):
    """An append missing a column is allowed (reads NULL, like Delta);
    the manifest schema must NOT shrink to the subset."""
    store = _base_store(spark, tmp_path / "s", cluster=False)
    v2 = store.commit(
        spark.createDataFrame([(200,)], "k bigint"), mode="append"
    )
    names = [
        f["name"]
        for f in json.loads(store.snapshot(v2).schema_json)["fields"]
    ]
    assert names == ["k", "val"]
    got = {r.k: r.val for r in store.read(spark).collect()}
    assert got[200] is None and got[3] == "v3"


def test_merge_into_rejects_unknown_columns(spark):
    store = spark.createDataFrame([(1, "a")], "k bigint, val string")
    changes = spark.createDataFrame(
        [(1, "b", "web", "update", 1)],
        "k bigint, val string, channel string, op string, seq int",
    )
    with pytest.raises(ValueError, match="channel"):
        merge_into(store, changes, key_cols="k", version_cols="seq")


@pytest.mark.parametrize("layout", ["none", "range", "hash"])
def test_widening_merge_all_layouts(spark, tmp_path, layout):
    store = _base_store(spark, tmp_path / layout, cluster=layout != "none")
    if layout == "hash":
        # rebuild hash-bucketed
        store = SnapshotStore(str(tmp_path / "h"))
        store.commit(
            spark.createDataFrame(
                [(k, f"v{k}") for k in range(20)], "k bigint, val string"
            ),
            mode="overwrite",
            cluster_by="k",
            layout="hash",
            target_files=4,
        )
    changes = spark.createDataFrame(
        [(3, "u3", "web", "update", 1), (25, "n25", "app", "insert", 1)],
        "k bigint, val string, channel string, op string, seq int",
    )
    with pytest.raises(ValueError, match="merge_schema=True"):
        store.merge(spark, changes, key_cols="k", version_cols="seq")
    store.merge(
        spark, changes, key_cols="k", version_cols="seq", merge_schema=True
    )
    got = {r.k: (r.val, r.channel) for r in store.read(spark).collect()}
    assert got[3] == ("u3", "web")
    assert got[25] == ("n25", "app")
    assert got[7] == ("v7", None)
    assert len(got) == 21


def test_pruned_widening_merge_carries_old_schema_files(spark, tmp_path):
    """The evolution must not force a full rewrite: a narrow widening
    merge on a range-clustered store still carries non-overlapping
    files by reference (in their OLD schema), and the head read merges
    both vintages."""
    store = SnapshotStore(str(tmp_path / "s"))
    store.commit(
        spark.createDataFrame(
            [(k, f"v{k}") for k in range(100)], "k bigint, val string"
        ),
        mode="overwrite",
        cluster_by="k",
        target_files=8,
    )
    changes = spark.createDataFrame(
        [(2, "u2", "web", "update", 1)],
        "k bigint, val string, channel string, op string, seq int",
    )
    v2 = store.merge(
        spark, changes, key_cols="k", version_cols="seq", merge_schema=True
    )
    head, parent = store.snapshot(v2), store.snapshot(1)
    carried = {e["path"] for e in head.entries} & {
        e["path"] for e in parent.entries
    }
    assert len(carried) >= 6  # most files untouched by the k=2 change
    got = {r.k: (r.val, r.channel) for r in store.read(spark).collect()}
    assert got[2] == ("u2", "web") and got[50] == ("v50", None)
    # a follow-up merge WITHOUT the new column must fail loudly when its
    # touched files already carry the evolved schema (changes must supply
    # every data column — Delta updateAll semantics)
    plain = spark.createDataFrame(
        [(2, "u2b", "update", 2)], "k bigint, val string, op string, seq int"
    )
    with pytest.raises(Exception):
        store.merge(spark, plain, key_cols="k", version_cols="seq")
        store.read(spark).collect()


@pytest.mark.slow
@pytest.mark.filterwarnings("ignore::hypothesis.errors.HypothesisWarning")
@given(
    history=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.text(alphabet="abcxyz", min_size=1, max_size=3),
            st.sampled_from(["insert", "update", "delete"]),
        ),
        min_size=1,
        max_size=10,
    ),
    split=st.integers(min_value=0, max_value=10),
    layout=st.sampled_from(["none", "range", "hash"]),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_widening_merge_matches_model(
    spark, tmp_path_factory, history, split, layout
):
    """First batch merges pre-evolution (no channel column); second
    batch widens with channel=val. Model: last change per key wins;
    keys whose final change came in batch 1 (or never changed) read
    channel None; batch-2 survivors read channel == their val."""
    base = {0: "base0", 5: "base5"}
    store = SnapshotStore(str(tmp_path_factory.mktemp("evo") / "s"))
    store.commit(
        spark.createDataFrame(
            [(k, v) for k, v in base.items()], "k bigint, val string"
        ),
        mode="overwrite",
        cluster_by=None if layout == "none" else "k",
        layout="range" if layout == "none" else layout,
        target_files=3,
    )
    indexed = list(enumerate(history))
    split = min(split, len(indexed))
    b1, b2 = indexed[:split], indexed[split:]
    if b1:
        store.merge(
            spark,
            spark.createDataFrame(
                [(k, v, op, seq) for seq, (k, v, op) in b1],
                "k bigint, val string, op string, seq int",
            ),
            key_cols="k",
            version_cols="seq",
        )
    if b2:
        store.merge(
            spark,
            spark.createDataFrame(
                [(k, v, v, op, seq) for seq, (k, v, op) in b2],
                "k bigint, val string, channel string, op string, seq int",
            ),
            key_cols="k",
            version_cols="seq",
            merge_schema=True,
        )

    # sequential model
    final: dict[int, tuple[str, str | None]] = {
        k: (v, None) for k, v in base.items()
    }
    latest: dict[int, tuple[int, str, str, bool]] = {}
    for seq, (k, v, op) in b1:
        latest[k] = (seq, v, op, False)
    for seq, (k, v, op) in b2:
        latest[k] = (seq, v, op, True)
    for k, (_, v, op, widened) in latest.items():
        if op == "delete":
            final.pop(k, None)
        else:
            final[k] = (v, v if widened else None)

    df = store.read(spark)
    if "channel" not in df.columns:  # b2 empty: schema never evolved
        df = df.withColumn("channel", F.lit(None).cast("string"))
    got = {r.k: (r.val, r.channel) for r in df.collect()}
    assert got == final
