"""File-level bloom-filter index for the snapshot store.

The store's range/hash layouts prune reads on the CLUSTER key only; a
point lookup on any other column still scans every file. This sidecar
index stores one small bloom bitmap per data file over a chosen
column, so a secondary-key lookup reads only the files whose filter
might contain the value — Delta/Iceberg ship the same idea as
per-file bloom metadata. False positives cost a superset read (the
caller's exact filter still applies); false negatives cannot happen
because each bitmap is built from the file's actual values.

Scale shape: the build is ONE distributed pass over the snapshot —
per (file, value) the k bit positions are JVM ``xxhash64`` expressions,
deduplicated before the driver collect, which is therefore bounded by
``n_files × m`` bits regardless of row count (m defaults to 8192 bits
= 1 KiB per file). Lookups hash the probe values in a single tiny
Spark job (they must use Spark's own xxhash64) and then prune purely
on driver-side metadata.

Reference analog: none (the reference has no storage layer); extension
surface beside store/snapshots.py's manifest min/max stats.
"""

from __future__ import annotations

import base64
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from log2sql_spark.store.snapshots import SnapshotStore

_DEFAULT_BITS = 8192
_K = 3  # xxhash64(col, seed) for seed in 0..k-1


def _position_cols(col: str, bits: int) -> list:
    return [
        F.pmod(F.xxhash64(F.col(col), F.lit(seed)), F.lit(bits)) for seed in range(_K)
    ]


def _pack(positions: list[int], bits: int) -> str:
    words = bytearray(bits // 8)
    for p in positions:
        words[p // 8] |= 1 << (p % 8)
    return base64.b64encode(bytes(words)).decode("ascii")


def _sidecar_path(store: SnapshotStore, version: int, column: str) -> str:
    return os.path.join(store._manifest_dir, f"bloom_v{version}_{column}.json")


def build_bloom_index(
    spark: SparkSession,
    store: SnapshotStore,
    column: str,
    bits: int = _DEFAULT_BITS,
    version: int | None = None,
) -> str:
    """Build per-file bloom bitmaps over ``column`` for a snapshot and
    publish them as a sidecar JSON next to the manifest (atomic rename,
    same protocol as the manifest itself). Returns the sidecar path."""
    version = store.head_version() if version is None else version
    snap = store.snapshot(version)
    if not snap.entries:
        payload = {"column": column, "bits": bits, "k": _K, "files": {}}
    else:
        paths = [os.path.join(store.path, e["path"]) for e in snap.entries]
        df = spark.read.option("mergeSchema", "true").parquet(*paths)
        pos = (
            df.select(
                F.input_file_name().alias("_f"),
                F.explode(F.array(*_position_cols(column, bits))).alias("p"),
            )
            .filter(F.col("p").isNotNull())
            .distinct()
        )
        by_file: dict[str, list[int]] = {}
        for r in pos.collect():  # bounded by n_files * bits, see module doc
            by_file.setdefault(r["_f"], []).append(r["p"])
        files = {}
        for e in snap.entries:
            rel = e["path"]
            # A file entry matches by suffix; a directory entry (hash
            # layout's _bucket=N dirs) matches every part file beneath
            # it — either way all matches merge into one bitmap.
            ps_all = [
                p
                for f, ps in by_file.items()
                if f.endswith(rel) or f"/{rel}/" in f
                for p in ps
            ]
            files[rel] = _pack(ps_all, bits)
        payload = {"column": column, "bits": bits, "k": _K, "files": files}

    final = _sidecar_path(store, version, column)
    tmp = final + ".inflight"
    with open(tmp, "w") as fh:
        json.dump(payload, fh)
    os.replace(tmp, final)
    return final


def _probe_positions(
    spark: SparkSession, store: SnapshotStore, snap, column: str, values: list, bits: int
) -> list[list[int]]:
    """k positions per probe value, via Spark's own xxhash64 (one tiny
    job — a python reimplementation could silently diverge)."""
    from pyspark.sql.types import StructField, StructType

    schema = StructType.fromJson(json.loads(snap.schema_json))
    field = schema[column]
    vdf = spark.createDataFrame([(v,) for v in values], StructType([StructField(field.name, field.dataType)]))
    out = vdf.select(
        F.col(column),
        *[c.alias(f"p{i}") for i, c in enumerate(_position_cols(column, bits))],
    ).collect()
    by_value = {r[column]: [r[f"p{i}"] for i in range(_K)] for r in out}
    return [by_value[v] for v in values]


def read_bloom_pruned(
    spark: SparkSession,
    store: SnapshotStore,
    column: str,
    values: list,
    version: int | None = None,
) -> DataFrame:
    """Point-lookup read pruned by the bloom sidecar: keeps only the
    files whose bitmap claims it might contain at least one probe
    value (a superset — apply the exact filter on the result). Raises
    if the sidecar for this (version, column) was never built."""
    version = store.head_version() if version is None else version
    snap = store.snapshot(version)
    if not os.path.isfile(_sidecar_path(store, version, column)):
        raise FileNotFoundError(
            f"no bloom index for column {column!r} at version {version}; "
            "run build_bloom_index first"
        )
    if not values or not snap.entries:
        return store.read(spark, version).limit(0)
    keep = bloom_kept_entries(spark, store, column, values, version)
    if not keep:
        return store.read(spark, version).limit(0)
    df = spark.read.option("mergeSchema", "true").parquet(
        *[os.path.join(store.path, rel) for rel in keep]
    )
    if "_bucket" in df.columns:
        df = df.drop("_bucket")
    return df


def bloom_kept_entries(
    spark: SparkSession,
    store: SnapshotStore,
    column: str,
    values: list,
    version: int | None = None,
) -> list[str]:
    """The entry paths a bloom-pruned lookup would read — the pruning
    evidence tests and observability queries assert on."""
    version = store.head_version() if version is None else version
    snap = store.snapshot(version)
    sidecar = _sidecar_path(store, version, column)
    with open(sidecar) as fh:
        idx = json.load(fh)
    bits = idx["bits"]
    probes = _probe_positions(spark, store, snap, column, values, bits)
    kept = []
    for e in snap.entries:
        raw = base64.b64decode(idx["files"].get(e["path"], ""))
        if not raw:
            kept.append(e["path"])
            continue
        if any(all(raw[p // 8] & (1 << (p % 8)) for p in ps) for ps in probes):
            kept.append(e["path"])
    return kept
