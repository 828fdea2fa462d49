"""Hilbert-curve clustering (operators/zorder.py::hilbert_key):
exactness vs the canonical xy2d transform, the defining unit-step
locality property, and the measured box-pruning win over Z-order."""

from __future__ import annotations

import pytest


def _xy2d(n: int, x: int, y: int) -> int:
    """Canonical Hilbert xy->d (Wikipedia's C version, verbatim)."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        # rot
        if ry == 0:
            if rx == 1:
                x = s - 1 - (x % s)
                y = s - 1 - (y % s)
            x, y = y, x
        s //= 2
    return d


def test_hilbert_key_matches_reference_exactly(spark):
    from log2sql_spark.operators.zorder import hilbert_key

    n = 16  # bits=4; x,y already span [0, 15] so normalization is identity
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.h
        for r in df.withColumn("h", hilbert_key(df, ["x", "y"], bits=4)).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _xy2d(n, x, y), (x, y)


def test_hilbert_is_bijective_and_unit_step(spark):
    """The defining properties: d is a bijection onto [0, n^2) and
    consecutive d values are GRID NEIGHBORS (Manhattan distance 1) —
    the locality Morton order gives up at quadrant boundaries. Checked
    on the Spark-computed keys, not the reference."""
    from log2sql_spark.operators.zorder import hilbert_key

    n = 32  # bits=5
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = [
        (r.h, r.x, r.y)
        for r in df.withColumn("h", hilbert_key(df, ["x", "y"], bits=5)).collect()
    ]
    assert sorted(h for h, _, _ in got) == list(range(n * n))  # bijection
    got.sort()
    for (_, x0, y0), (_, x1, y1) in zip(got, got[1:]):
        assert abs(x0 - x1) + abs(y0 - y1) == 1  # unit steps, no jumps


def test_hilbert_rejects_wrong_arity(spark):
    from log2sql_spark.operators.zorder import hilbert_key

    df = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
    with pytest.raises(ValueError, match="exactly 2"):
        hilbert_key(df, ["a", "b", "c"])


def _files_overlapping_box(spark, path, x_lo, x_hi, y_lo, y_hi):
    """Per-file (min,max) of both dims from one scan; count files whose
    stats box overlaps the predicate box — exactly the skipping
    decision parquet row-group stats / store manifests make."""
    from pyspark.sql import functions as F

    stats = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("x").alias("x_min"), F.max("x").alias("x_max"),
            F.min("y").alias("y_min"), F.max("y").alias("y_max"),
        )
        .collect()
    )
    n_total = len(stats)
    n_hit = sum(
        1
        for r in stats
        if not (r.x_max < x_lo or r.x_min > x_hi or r.y_max < y_lo or r.y_min > y_hi)
    )
    return n_hit, n_total


def test_hilbert_box_pruning_beats_zorder(spark, tmp_path):
    """The measured claim behind the operator: at equal file count on a
    uniform grid, a square box predicate overlaps FEWER Hilbert-
    clustered files than Z-ordered ones (Morton's quadrant jumps give
    files L-shaped key ranges; Hilbert ranges stay square-ish). Both
    layouts must also beat the unclustered baseline by a wide margin."""
    import pyspark.sql.functions as F

    from log2sql_spark.operators.zorder import hilbert_key, zorder_key

    n = 256
    grid = (
        spark.range(n * n)
        .select(
            (F.col("id") % n).alias("x"),
            (F.col("id") / n).cast("long").alias("y"),
            F.col("id").alias("payload"),
        )
    )
    n_files = 64

    def layout(key_col, name):
        path = str(tmp_path / name)
        (
            grid.withColumn("_k", key_col)
            .repartitionByRange(n_files, "_k")
            .sortWithinPartitions("_k")
            .drop("_k")
            .write.mode("overwrite")
            .parquet(path)
        )
        return path

    hp = layout(hilbert_key(grid, ["x", "y"], bits=8), "hilbert")
    zp = layout(zorder_key(grid, ["x", "y"], bits=8), "zorder")

    boxes = [(60, 100, 60, 100), (10, 40, 180, 220), (120, 250, 0, 60)]
    h_total = z_total = 0
    for box in boxes:
        h_hit, h_n = _files_overlapping_box(spark, hp, *box)
        z_hit, z_n = _files_overlapping_box(spark, zp, *box)
        assert h_n == n_files and z_n == n_files
        assert h_hit < n_files / 3  # clustering works at all
        h_total += h_hit
        z_total += z_hit
    assert h_total <= z_total, (h_total, z_total)
