"""Incremental view maintenance delta algebra
(log2sql_spark/operators/ivm.py): the signed join delta must equal the
recomputed join for every change combination, including rows changed on
BOTH sides (the bilinear cross term)."""

from __future__ import annotations

from pyspark.sql import functions as F

from log2sql_spark.operators.ivm import (
    apply_delta,
    join_delta,
    signed_aggregate,
)


def _signed(df, s):
    return df.withColumn("_sign", F.lit(s).cast("long"))


def test_join_delta_equals_recompute(spark):
    # old state: facts (k, g, v) against dims (k, grp)
    a_old = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 40), (5, 50)], "k int, v long"
    )
    b_old = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y"), (4, "y"), (5, "z")], "k int, grp string"
    )
    # changes: delete fact 1; re-price fact 3 (+5); insert fact 6 under
    # an existing dim; move dim of 3 (y->z): fact 3 changes on BOTH
    # sides -> the cross term must fire exactly once.
    da = (
        _signed(spark.createDataFrame([(1, 10), (3, 30)], "k int, v long"), -1)
        .unionByName(
            _signed(
                spark.createDataFrame([(3, 35), (6, 60)], "k int, v long"), 1
            )
        )
    )
    db = _signed(
        spark.createDataFrame([(3, "y")], "k int, grp string"), -1
    ).unionByName(
        _signed(spark.createDataFrame([(3, "z"), (6, "x")], "k int, grp string"), 1)
    )
    a_new = spark.createDataFrame(
        [(2, 20), (3, 35), (4, 40), (5, 50), (6, 60)], "k int, v long"
    )
    b_new = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "z"), (4, "y"), (5, "z"), (6, "x")],
        "k int, grp string",
    )

    mv_old = (
        a_old.join(b_old, "k")
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v"))
    )
    dagg = signed_aggregate(
        join_delta(a_old, da, b_old, db, "k"), ["grp"], {"sum_v": "v"}
    )
    got = {
        r.grp: (r.n, r.sum_v)
        for r in apply_delta(mv_old, dagg, ["grp"]).collect()
    }
    want = {
        r.grp: (r.n, r.sum_v)
        for r in a_new.join(b_new, "k")
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v"))
        .collect()
    }
    assert got == want
    # group 'y' lost its only remaining fact-3 row to the move but kept
    # fact 4; 'z' gained the re-priced fact 3 — spot-check the cross term
    assert want["z"] == (2, 85)


def test_join_delta_group_drops_to_zero(spark):
    a_old = spark.createDataFrame([(1, 10)], "k int, v long")
    b_old = spark.createDataFrame([(1, "only")], "k int, grp string")
    da = _signed(spark.createDataFrame([(1, 10)], "k int, v long"), -1)
    db = spark.createDataFrame([], "k int, grp string, _sign long")
    mv_old = (
        a_old.join(b_old, "k")
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v"))
    )
    dagg = signed_aggregate(
        join_delta(a_old, da, b_old, db, "k"), ["grp"], {"sum_v": "v"}
    )
    assert apply_delta(mv_old, dagg, ["grp"]).count() == 0


def test_join_delta_random_change_batches(spark):
    """Randomized (seeded) change batches over both sides must always
    reproduce the recomputed join aggregate — inserts, deletes,
    updates, dim moves, and double-changed keys in one run."""
    import random

    rnd = random.Random(42)
    for trial in range(3):
        keys = list(range(1, 15))
        a_old_rows = [(k, rnd.randint(1, 100)) for k in keys if rnd.random() < 0.8]
        b_old_rows = [(k, rnd.choice("xyz")) for k in keys]
        a_map = dict(a_old_rows)
        b_map = dict(b_old_rows)
        a_new, b_new = dict(a_map), dict(b_map)
        da_rows, db_rows = [], []
        for k in list(a_map):
            r = rnd.random()
            if r < 0.2:  # delete fact
                da_rows.append((k, a_map[k], -1))
                del a_new[k]
            elif r < 0.4:  # re-price
                nv = rnd.randint(1, 100)
                da_rows.append((k, a_map[k], -1))
                da_rows.append((k, nv, 1))
                a_new[k] = nv
        for k in range(15, 18):  # inserts
            nv = rnd.randint(1, 100)
            da_rows.append((k, nv, 1))
            a_new[k] = nv
            b_new[k] = rnd.choice("xyz")
            db_rows.append((k, b_new[k], 1))
        for k in list(b_map):
            if rnd.random() < 0.3:  # dim move (may overlap a fact change)
                ng = rnd.choice("xyz")
                if ng != b_map[k]:
                    db_rows.append((k, b_map[k], -1))
                    db_rows.append((k, ng, 1))
                    b_new[k] = ng

        mk = lambda rows, sch: spark.createDataFrame(rows, sch)  # noqa: E731
        a_old = mk(a_old_rows, "k int, v long")
        b_old = mk(b_old_rows, "k int, grp string")
        da = mk(da_rows or [(0, 0, 0)], "k int, v long, _sign long").filter("_sign != 0")
        db = mk(db_rows or [(0, "x", 0)], "k int, grp string, _sign long").filter("_sign != 0")
        mv_old = (
            a_old.join(b_old, "k").groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v"))
        )
        dagg = signed_aggregate(
            join_delta(a_old, da, b_old, db, "k"), ["grp"], {"sum_v": "v"}
        )
        got = {
            r.grp: (r.n, r.sum_v)
            for r in apply_delta(mv_old, dagg, ["grp"]).collect()
        }
        a_new_df = mk(list(a_new.items()), "k int, v long")
        b_new_df = mk(list(b_new.items()), "k int, grp string")
        want = {
            r.grp: (r.n, r.sum_v)
            for r in a_new_df.join(b_new_df, "k").groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v"))
            .collect()
        }
        assert got == want, f"trial {trial}"
