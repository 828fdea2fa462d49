"""distributed_global_rank / ntile_from_rank (operators/ranks.py):
the r14 replacement for single-partition global windows must be
BIT-IDENTICAL to the windows it replaced, for every ordering shape the
suite uses (asc/desc, identity/coarse grouping, column tie-breaks) —
checked here against the plain Window reference on adversarial data
(heavy ties, negatives, a group that is one giant tie)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from log2sql_spark.operators.ranks import distributed_global_rank, ntile_from_rank


def _df(spark, rows):
    return spark.createDataFrame(rows, "uid long, score long")


@pytest.fixture(scope="module")
def data(spark):
    rng = random.Random(14)
    rows = [(uid, rng.choice([-7, -1, 0, 3, 3, 3, 9, 42])) for uid in range(257)]
    rows += [(1000 + i, 5) for i in range(64)]  # one giant tie group
    return _df(spark, rows)


def _reference(df, descending):
    order = [F.desc("score") if descending else F.asc("score"), F.asc("uid")]
    return {
        r.uid: r.rk
        for r in df.withColumn(
            "rk", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }


@pytest.mark.parametrize("descending", [False, True])
def test_rank_matches_global_window(spark, data, descending):
    got = {
        r.uid: r.rank
        for r in distributed_global_rank(
            data, "score", ["uid"], descending=descending
        ).collect()
    }
    assert got == _reference(data, descending)


@pytest.mark.parametrize("descending", [False, True])
def test_rank_with_monotone_coarse_grouping(spark, data, descending):
    """A coarse order-embedding (here score DIV 4 — monotone, merges
    several scores per group) must not change a single rank."""
    got = {
        r.uid: r.rank
        for r in distributed_global_rank(
            data,
            "score",
            ["uid"],
            descending=descending,
            coarse=F.floor(F.col("score") / 4),
        ).collect()
    }
    assert got == _reference(data, descending)


def test_rank_with_column_tiebreak_desc(spark, data):
    """Explicit Column tie-breaks (the flashback shape: group asc/desc
    by one key, ties DESC by another)."""
    ref = {
        r.uid: r.rk
        for r in data.withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.desc("score"), F.desc("uid"))
            ),
        ).collect()
    }
    got = {
        r.uid: r.rank
        for r in distributed_global_rank(
            data, "score", [F.desc("uid")], descending=True
        ).collect()
    }
    assert got == ref


@pytest.mark.parametrize("n", [2, 3, 4, 7, 10])
def test_ntile_from_rank_matches_f_ntile(spark, data, n):
    """The closed-form bucket arithmetic equals F.ntile for every n,
    including N not divisible by n and N < n."""
    for df in (data, data.limit(3)):  # N=321 and N=3 (< most n)
        ref = {
            r.uid: r.t
            for r in df.withColumn(
                "t",
                F.ntile(n).over(Window.orderBy("score", "uid")).cast("long"),
            ).collect()
        }
        n_total = df.agg(F.count(F.lit(1)).alias("n_total"))
        got = {
            r.uid: r.t
            for r in distributed_global_rank(df, "score", ["uid"])
            .crossJoin(F.broadcast(n_total))
            .withColumn("t", ntile_from_rank(F.col("rank"), F.col("n_total"), n))
            .collect()
        }
        assert got == ref, (n, df.count())


def test_no_single_partition_stage_over_rows(spark, data):
    """The whole point: the physical plan must not hold an Exchange
    SinglePartition anywhere below the partitioned row_number (the
    only global window allowed is the cumulative over distinct coarse
    groups, which sits above an Aggregate)."""
    from log2sql_spark.plans.explain import unpartitioned_raw_window_count

    out = distributed_global_rank(data, "score", ["uid"])
    assert unpartitioned_raw_window_count(out) == 0
