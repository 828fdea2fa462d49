"""Bloom sidecar index: pruning power + zero false negatives, on both
range and hash store layouts."""

from __future__ import annotations

import pyspark.sql.functions as F


def _mkstore(tmp_path, name):
    from log2sql_spark.store import SnapshotStore

    return SnapshotStore(str(tmp_path / name))


def _base(spark):
    # key 0..999 clustered into ranges; attr changes every 100 keys so
    # each range file holds only 1-2 of the 10 attr values.
    return spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") / 100).cast("long").alias("attr"),
        (F.col("id") * 3).alias("payload"),
    )


def test_bloom_lookup_prunes_and_is_exact(spark, tmp_path):
    from log2sql_spark.store.bloom_index import (
        bloom_kept_entries,
        build_bloom_index,
        read_bloom_pruned,
    )

    store = _mkstore(tmp_path, "rangestore")
    store.commit(_base(spark), mode="overwrite", cluster_by="k", target_files=10)
    build_bloom_index(spark, store, "attr")

    kept = bloom_kept_entries(spark, store, "attr", [3])
    n_files = len(store.snapshot(store.head_version()).entries)
    assert n_files >= 8
    assert 1 <= len(kept) <= max(2, n_files // 3), (
        f"bloom pruned nothing: kept {len(kept)}/{n_files}"
    )

    got = (
        read_bloom_pruned(spark, store, "attr", [3])
        .filter(F.col("attr") == 3)
        .orderBy("k")
        .collect()
    )
    assert [r.k for r in got] == list(range(300, 400))


def test_bloom_no_false_negatives_any_value(spark, tmp_path):
    from log2sql_spark.store.bloom_index import build_bloom_index, read_bloom_pruned

    store = _mkstore(tmp_path, "fnstore")
    store.commit(_base(spark), mode="overwrite", cluster_by="k", target_files=10)
    build_bloom_index(spark, store, "attr")
    for v in range(10):
        n = (
            read_bloom_pruned(spark, store, "attr", [v])
            .filter(F.col("attr") == v)
            .count()
        )
        assert n == 100, f"attr={v}: bloom lost rows ({n}/100)"


def test_bloom_miss_reads_nothing(spark, tmp_path):
    from log2sql_spark.store.bloom_index import bloom_kept_entries, build_bloom_index, read_bloom_pruned

    store = _mkstore(tmp_path, "missstore")
    store.commit(_base(spark), mode="overwrite", cluster_by="k", target_files=10)
    build_bloom_index(spark, store, "attr")
    # An absent value may false-positive a file or two, never most.
    kept = bloom_kept_entries(spark, store, "attr", [424242])
    assert len(kept) <= 2
    assert read_bloom_pruned(spark, store, "attr", []).count() == 0


def test_bloom_on_hash_layout_dirs(spark, tmp_path):
    from log2sql_spark.store.bloom_index import build_bloom_index, read_bloom_pruned

    store = _mkstore(tmp_path, "hashstore")
    df = _base(spark).withColumn("k", F.col("k").cast("string"))
    store.commit(df, mode="overwrite", cluster_by="k", target_files=8, layout="hash")
    build_bloom_index(spark, store, "attr")
    got = (
        read_bloom_pruned(spark, store, "attr", [7])
        .filter(F.col("attr") == 7)
        .count()
    )
    assert got == 100


def test_bloom_requires_build(spark, tmp_path):
    import pytest

    from log2sql_spark.store.bloom_index import read_bloom_pruned

    store = _mkstore(tmp_path, "nostore")
    store.commit(_base(spark), mode="overwrite")
    with pytest.raises(FileNotFoundError):
        read_bloom_pruned(spark, store, "attr", [1])
