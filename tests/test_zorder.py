"""Z-order layout: round-trip exactness + multi-dimensional skipping.

The point of z-ordering is measurable in the parquet footers: after the
rewrite, per-file min/max ranges must be narrow in EVERY clustered
dimension, where a plain single-key sort leaves the second dimension's
per-file range spanning the whole domain (no skipping possible).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest


def _file_ranges(path: str, col: str) -> list[tuple]:
    import pyarrow.parquet as pq

    ranges = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet") or f.startswith("."):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    lo = c.statistics.min if lo is None else min(lo, c.statistics.min)
                    hi = c.statistics.max if hi is None else max(hi, c.statistics.max)
        if lo is not None:
            ranges.append((lo, hi))
    return ranges


@pytest.fixture()
def grid_dir(spark, tmp_path) -> str:
    """10k rows over two independent 0..99 keys (x=id%100, y=id//100%100):
    a full grid — the worst case for single-key sorting."""
    path = str(tmp_path / "grid")
    df = spark.range(10_000).select(
        (F.col("id") % 100).alias("x"),
        ((F.col("id") / 100).cast("long") % 100).alias("y"),
        F.col("id").alias("payload"),
    )
    df.repartition(1).write.parquet(path)
    return path


def test_zorder_roundtrip_exact(spark, grid_dir):
    from log2sql_spark.operators.zorder import zorder_parquet

    before = {(r.x, r.y, r.payload) for r in spark.read.parquet(grid_dir).collect()}
    n = zorder_parquet(spark, grid_dir, ["x", "y"], target_file_mb=1)
    after = {(r.x, r.y, r.payload) for r in spark.read.parquet(grid_dir).collect()}
    assert after == before
    assert n >= 1


def test_zorder_clusters_both_dims(spark, tmp_path):
    """With 16 files over a 100×100 independent grid: sort-by-x leaves
    every file's y-range ≈ the full domain; z-order must shrink the
    mean y-range by at least 2× while keeping x clustered too."""
    from log2sql_spark.operators.zorder import zorder_key

    df = spark.range(20_000).select(
        (F.col("id") % 100).alias("x"),
        ((F.col("id") / 100).cast("long") % 100).alias("y"),
    )

    sorted_dir = str(tmp_path / "byx")
    df.repartitionByRange(16, "x").write.parquet(sorted_dir)

    z_dir = str(tmp_path / "byz")
    z = zorder_key(df, ["x", "y"])
    (
        df.withColumn("_z", z)
        .repartitionByRange(16, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.parquet(z_dir)
    )

    def mean_width(path, col):
        rs = _file_ranges(path, col)
        assert rs, f"no stats for {col} in {path}"
        return sum(hi - lo for lo, hi in rs) / len(rs)

    y_sorted = mean_width(sorted_dir, "y")
    y_z = mean_width(z_dir, "y")
    x_z = mean_width(z_dir, "x")
    # sort-by-x cannot skip on y (full 0..99 span per file);
    # z-order must be selective on BOTH dimensions.
    assert y_sorted > 90
    assert y_z < y_sorted / 2
    assert x_z < 60


def test_zorder_key_rejects_bad_arity(spark):
    from log2sql_spark.operators.zorder import zorder_key

    df = spark.range(10).select(F.col("id").alias("a"))
    with pytest.raises(ValueError):
        zorder_key(df, [])
    with pytest.raises(ValueError):
        zorder_key(df, ["a"] * 5)


# ---- zorder as a SnapshotStore layout ------------------------------------


def _zstore(spark, tmp_path, n_files=16):
    from log2sql_spark.store import SnapshotStore

    store = SnapshotStore(str(tmp_path / "zstore"))
    df = spark.range(20_000).select(
        (F.col("id") % 100).alias("x"),
        ((F.col("id") / 100).cast("long") % 100).alias("y"),
        F.col("id").alias("payload"),
    )
    store.commit(
        df, mode="overwrite", cluster_by=["x", "y"], layout="zorder",
        target_files=n_files,
    )
    return store, df


def test_zorder_store_roundtrip_and_box_prune(spark, tmp_path):
    store, df = _zstore(spark, tmp_path)
    assert store.read(spark).count() == 20_000

    snap = store.snapshot(store.head_version())
    assert snap.zorder_cols == ["x", "y"]
    assert snap.has_dim_stats("x") and snap.has_dim_stats("y")
    n_files = len(snap.entries)

    # A 2-D box must skip most files AND return exactly the right rows.
    got = (
        store.read_pruned_box(spark, {"x": (10, 19), "y": (30, 39)})
        .filter(F.col("x").between(10, 19) & F.col("y").between(30, 39))
        .count()
    )
    want = df.filter(F.col("x").between(10, 19) & F.col("y").between(30, 39)).count()
    assert got == want

    def kept(preds):
        s = store.snapshot(store.head_version())
        n = 0
        for e in s.entries:
            ok = True
            for c, (lo, hi) in preds.items():
                elo, ehi = e["stats"][c]
                if elo > hi or ehi < lo:
                    ok = False
            n += ok
        return n

    # Each single dimension prunes on its own — impossible for a
    # single-key range sort on x (y-ranges would span the domain).
    assert kept({"x": (10, 19)}) < n_files
    assert kept({"y": (30, 39)}) < n_files
    assert kept({"x": (10, 19), "y": (30, 39)}) <= min(
        kept({"x": (10, 19)}), kept({"y": (30, 39)})
    )


def test_zorder_store_pruned_merge_on_leading_dim(spark, tmp_path):
    from log2sql_spark.store import SnapshotStore

    store = SnapshotStore(str(tmp_path / "zmerge"))
    df = spark.range(20_000).select(
        F.col("id").alias("k"),  # unique leading dim = the merge key
        ((F.col("id") / 100).cast("long") % 100).alias("y"),
        F.col("id").alias("payload"),
    )
    store.commit(
        df, mode="overwrite", cluster_by=["k", "y"], layout="zorder",
        target_files=16,
    )
    v1 = store.head_version()
    parent_paths = {e["path"] for e in store.snapshot(v1).entries}

    changes = (
        df.filter(F.col("k").between(500, 799))
        .select("k", "y", (F.col("payload") + 1_000_000).alias("payload"))
        .withColumn("op", F.lit("update"))
        .withColumn("seq", F.lit(1))
    )
    v2 = store.merge(spark, changes, key_cols=["k"], version_cols="seq")
    snap2 = store.snapshot(v2)
    carried = {e["path"] for e in snap2.entries} & parent_paths
    assert len(carried) > 0, "narrow merge rewrote every file"
    assert snap2.layout == "zorder"
    got = store.read(spark, v2)
    assert got.count() == 20_000
    assert (
        got.filter(F.col("k").between(500, 799))
        .filter(F.col("payload") < 1_000_000)
        .count()
        == 0
    ), "merge missed an updated row"
    assert store.read(spark, v1).count() == 20_000  # time travel intact


def test_zorder_store_rejects_single_column(spark, tmp_path):
    from log2sql_spark.store import SnapshotStore

    store = SnapshotStore(str(tmp_path / "zbad"))
    df = spark.range(10).select(F.col("id").alias("x"))
    with pytest.raises(ValueError):
        store.commit(df, cluster_by="x", layout="zorder")


def test_zorder_key_is_injective_on_grid(spark):
    """Distinct (x, y) cells must map to distinct z-values when the
    domain fits the per-dimension bit budget — a collision would merge
    unrelated cells and silently blunt the file-skipping stats."""
    from log2sql_spark.operators.zorder import zorder_key

    df = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    z = df.withColumn("_z", zorder_key(df, ["x", "y"]))
    n_distinct = z.select("_z").distinct().count()
    assert n_distinct == 64 * 64


def test_zorder_key_locality_beats_concatenation(spark):
    """The Morton curve's point: neighbors in EITHER dimension stay
    close in z-order: for adjacent cells the mean |Δz| must be a small
    fraction of the used z-range (a concatenated key would pay a full
    x-stride on every y-step)."""
    from log2sql_spark.operators.zorder import zorder_key

    df = spark.range(32 * 32).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
    )
    rows = df.withColumn("_z", zorder_key(df, ["x", "y"])).collect()
    zmap = {(r.x, r.y): r._z for r in rows}
    z_deltas = []
    for (x, y), z in zmap.items():
        if (x + 1, y) in zmap:
            z_deltas.append(abs(zmap[(x + 1, y)] - z))
        if (x, y + 1) in zmap:
            z_deltas.append(abs(zmap[(x, y + 1)] - z))
    # mean z-gap for adjacent cells, normalized by the z-range actually
    # used, must be tighter than a uniform scatter would give
    zrange = max(zmap.values()) - min(zmap.values())
    mean_gap = sum(z_deltas) / len(z_deltas)
    assert mean_gap < zrange / 8, (mean_gap, zrange)


def test_layout_rewrite_swap_recovers_after_crash(spark, grid_dir):
    """A crash between the two swap renames leaves the dataset at
    <path>.zorder.old; the next rewrite invocation restores it before
    proceeding, so the data is never lost (r12 ADVICE)."""
    import os

    from log2sql_spark.operators.zorder import zorder_parquet

    before = {(r.x, r.y, r.payload) for r in spark.read.parquet(grid_dir).collect()}
    # simulate the crash window: path renamed aside, new dir never moved in
    os.rename(grid_dir, grid_dir + ".zorder.old")
    assert not os.path.exists(grid_dir)

    n = zorder_parquet(spark, grid_dir, ["x", "y"], target_file_mb=1)
    after = {(r.x, r.y, r.payload) for r in spark.read.parquet(grid_dir).collect()}
    assert after == before
    assert n >= 1
    assert not os.path.exists(grid_dir + ".zorder.old")
