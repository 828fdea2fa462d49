"""Unit tests for the declarative expectations operator.

Edge cases the oracle query can't hit on clean TPC-H data: NULLs in
every rule position, duplicate keys, FK orphans (including a NULL FK),
and the all-rules-pass path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from log2sql_spark.operators import expectations as X


def _report(df, rules):
    return {
        r.rule: (r.violations, r.rows_checked, r.passed)
        for r in X.check_expectations(df, rules).collect()
    }


def test_row_level_rules_count_nulls_and_violations(spark):
    df = spark.createDataFrame(
        [
            (1, "O", 10.0, "1-URGENT"),
            (2, None, -5.0, "9-BOGUS"),
            (None, "X", None, None),
        ],
        "k bigint, status string, price double, prio string",
    )
    rep = _report(
        df,
        [
            X.not_null("k_nn", "k"),
            X.in_set("status_dom", "status", ["O", "F"]),
            X.between("price_rng", "price", 0.0, 100.0),
            X.matches("prio_re", "prio", "^[1-5]-"),
            X.condition("price_pos", F.col("price") > 0),
        ],
    )
    assert rep["k_nn"] == (1, 3, 0)
    # NULL and 'X' both out of domain
    assert rep["status_dom"] == (2, 3, 0)
    # -5.0 below range; NULL counts as violation
    assert rep["price_rng"] == (2, 3, 0)
    assert rep["prio_re"] == (2, 3, 0)
    assert rep["price_pos"] == (2, 3, 0)


def test_unique_counts_excess_rows_only(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "d"), (3, "e")], "k bigint, v string"
    )
    rep = _report(df, [X.unique("k_uniq", "k")])
    # three rows share k=1 -> two excess rows
    assert rep["k_uniq"] == (2, 5, 0)
    rep2 = _report(df, [X.unique("kv_uniq", "k", "v")])
    assert rep2["kv_uniq"] == (0, 5, 1)


def test_foreign_key_orphans_include_null_keys(spark):
    fact = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id bigint, fk bigint"
    )
    dim = spark.createDataFrame([(10,), (20,)], "pk bigint")
    rep = _report(fact, [X.foreign_key("fk_dim", "fk", dim, "pk")])
    # 99 is an orphan; NULL never equi-joins -> also a violation
    assert rep["fk_dim"] == (2, 4, 0)


def test_all_pass_and_empty_table(spark):
    df = spark.createDataFrame([(1, "O")], "k bigint, status string")
    rep = _report(
        df, [X.not_null("nn", "k"), X.in_set("dom", "status", ["O"]), X.unique("u", "k")]
    )
    assert rep == {"nn": (0, 1, 1), "dom": (0, 1, 1), "u": (0, 1, 1)}

    empty = df.filter(F.lit(False))
    rep0 = _report(empty, [X.not_null("nn", "k"), X.unique("u", "k")])
    # zero rows -> zero violations, vacuously passing
    assert rep0["nn"] == (0, 0, 1)
    assert rep0["u"] == (0, 0, 1)


def test_commit_audit_write_audit_publish(spark, tmp_path):
    """commit(audit=True) = Iceberg WAP: the checks run against the
    WRITTEN FILES, not the input plan — a non-deterministic input that
    would slip past the pre-write check cannot slip past the audit.
    Failure publishes nothing and removes the attempt directory."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from log2sql_spark.operators.expectations import condition
    from log2sql_spark.store import SnapshotStore

    store = SnapshotStore(str(tmp_path / "wapstore"))
    good = spark.range(10).select(F.col("id").alias("k"), (F.col("id") + 1).alias("v"))
    v = store.commit(good, expect=[condition("v > 0", F.expr("v > 0"))], audit=True)
    assert v == 1 and store.read(spark).count() == 10

    bad = spark.range(5).select(F.col("id").alias("k"), (F.col("id") - 3).alias("v"))
    with pytest.raises(Exception, match="v > 0"):
        store.commit(
            bad, mode="append", expect=[condition("v > 0", F.expr("v > 0"))], audit=True
        )
    assert store.head_version() == 1  # nothing published
    assert store.read(spark).count() == 10
    assert store.fsck() == []  # and no orphaned attempt dir poisons fsck
    # the failed attempt directory was cleaned up
    data_root = os.path.join(store.path, "data")
    assert len(os.listdir(data_root)) == 1


def test_commit_audit_enforces_constraints_post_write(spark, tmp_path):
    from pyspark.sql import functions as F

    import pytest

    from log2sql_spark.store import SnapshotStore

    store = SnapshotStore(str(tmp_path / "wapc"))
    store.commit(
        spark.range(3).select(F.col("id").alias("k"), (F.col("id") + 1).alias("v"))
    )
    store.add_constraint(spark, "v_pos", "v > 0")
    bad = spark.range(2).select(F.col("id").alias("k"), F.lit(-1).alias("v"))
    with pytest.raises(Exception, match="v_pos"):
        store.commit(bad, mode="append", audit=True)
    assert store.head_version() == 2
    assert store.read(spark).count() == 3
