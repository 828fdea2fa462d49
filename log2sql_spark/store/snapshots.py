"""Snapshot-versioned parquet store: a minimal transactional table
format (manifest log + immutable data files) for the CDC apply path.

The reference's end state is replay SQL applied to a live MySQL server
(``log2sql.py:161-185``); the production Spark twin is ``foreachBatch →
MERGE INTO`` a transactional table (SURVEY.md §1.1). No Delta/Iceberg
jars exist in this container, so this module implements the part of a
table format those engines provide and the apply path actually needs:

* **Atomic, readable-or-invisible commits.** Every commit writes NEW
  immutable data directories first, then publishes a JSON manifest via
  ``os.replace`` (atomic on POSIX). A crash mid-write leaves orphan
  data files but no manifest — readers never observe a partial commit.
  This is exactly the Iceberg snapshot contract, minus the catalog.
* **Time travel.** Manifests are append-only (``_manifests/v{N}.json``
  with a parent pointer); ``read(spark, version=...)`` reconstructs any
  retained snapshot. Overwrites never delete prior data files —
  ``vacuum`` is the explicit, separate destructive step, like Delta's.
* **Optimistic concurrency.** A commit records the parent version it
  built on; publishing fails if that version is no longer the head
  (``os.replace`` onto an existing next-version manifest is preceded by
  an existence check, and the loser gets a ``ConflictError`` to retry
  on the new head) — single-writer-wins semantics on any filesystem
  with atomic rename; on object stores a real deployment swaps this
  for a catalog conditional-put, same protocol.
* **MERGE INTO.** ``merge`` composes :func:`~log2sql_spark.operators.
  merge.merge_into` (latest-change-per-key window, delete/upsert
  semantics, idempotent under re-delivery) with an overwrite commit.

Scale notes: the manifest holds directory paths, not per-file entries,
so its size is O(commits), not O(files); data stays wherever the
cluster's DFS puts it and is only ever read through
``spark.read.parquet`` with full pushdown. A merge rewrites the whole
table here (the honest cost of MERGE without file-level statistics);
partition the store by key ranges and merge per-partition to bound the
rewrite, or swap in Delta/Iceberg at the same call site.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from log2sql_spark.operators.merge import merge_into


class ConflictError(RuntimeError):
    """Another writer published a commit for the same parent version."""


@dataclass
class Snapshot:
    version: int
    parent: int | None
    mode: str  # "append" | "overwrite"
    dirs: list[str]  # relative data directories composing the snapshot


class SnapshotStore:
    def __init__(self, path: str):
        self.path = path
        self._manifest_dir = os.path.join(path, "_manifests")
        os.makedirs(self._manifest_dir, exist_ok=True)

    # ---- manifest log -------------------------------------------------

    def versions(self) -> list[int]:
        return sorted(
            int(f[1:-5])
            for f in os.listdir(self._manifest_dir)
            if f.startswith("v") and f.endswith(".json")
        )

    def head_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def snapshot(self, version: int) -> Snapshot:
        with open(os.path.join(self._manifest_dir, f"v{version}.json")) as f:
            m = json.load(f)
        return Snapshot(
            version=m["version"], parent=m["parent"], mode=m["mode"], dirs=m["dirs"]
        )

    # ---- commits ------------------------------------------------------

    def commit(self, df: DataFrame, mode: str = "append") -> int:
        """Write ``df`` as a new snapshot; returns the new version.

        Data lands in a fresh immutable directory named after the
        version being attempted; the manifest publish is the atomic
        commit point. ``overwrite`` replaces the visible contents but
        deletes nothing — prior snapshots stay readable until
        ``vacuum``."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"mode must be append|overwrite, got {mode!r}")
        parent = self.head_version()
        version = 1 if parent is None else parent + 1
        # Attempt-unique directory: two racing writers targeting the same
        # next version must not write into the same path (the publish
        # step decides the winner; the loser's directory stays orphaned
        # until vacuum). mkdtemp gives uniqueness + creation atomicity.
        import tempfile

        data_root = os.path.join(self.path, "data")
        os.makedirs(data_root, exist_ok=True)
        data_abs = tempfile.mkdtemp(prefix=f"v{version}-", dir=data_root)
        data_rel = os.path.join("data", os.path.basename(data_abs))
        df.write.mode("overwrite").parquet(data_abs)
        dirs = [data_rel] if mode == "overwrite" or parent is None else (
            self.snapshot(parent).dirs + [data_rel]
        )
        self._publish(
            {"version": version, "parent": parent, "mode": mode, "dirs": dirs}
        )
        return version

    def _publish(self, manifest: dict) -> None:
        final = os.path.join(self._manifest_dir, f"v{manifest['version']}.json")
        if os.path.exists(final):
            raise ConflictError(
                f"version {manifest['version']} was published by another writer"
            )
        tmp = final + ".inflight"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, final)  # atomic on POSIX: the commit point

    # ---- reads --------------------------------------------------------

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        version = self.head_version() if version is None else version
        if version is None:
            raise ValueError(f"store at {self.path} has no commits")
        snap = self.snapshot(version)
        paths = [os.path.join(self.path, d) for d in snap.dirs]
        return spark.read.parquet(*paths)

    # ---- MERGE INTO ---------------------------------------------------

    def merge(
        self,
        spark: SparkSession,
        changes: DataFrame,
        key_cols: list[str] | str,
        version_cols: list[str] | str,
        op_col: str = "op",
        delete_op: str = "delete",
    ) -> int:
        """Apply CDC changes (MERGE INTO semantics) as one new snapshot."""
        merged = merge_into(
            self.read(spark), changes, key_cols, version_cols, op_col, delete_op
        )
        return self.commit(merged, mode="overwrite")

    def diff(
        self, spark: SparkSession, from_version: int, to_version: int
    ) -> DataFrame:
        """Change data feed between two snapshots: full-row set diff,
        rows only in ``to_version`` tagged ``added``, rows only in
        ``from_version`` tagged ``removed`` (an update appears as one of
        each — the caller can pair them on the key). Computed from the
        retained snapshots alone, no change log needed; both sides are
        one exceptAll (a single aggregate-shaped shuffle each)."""
        from pyspark.sql import functions as F

        a = self.read(spark, from_version)
        b = self.read(spark, to_version)
        return b.exceptAll(a).withColumn(
            "change_type", F.lit("added")
        ).unionByName(
            a.exceptAll(b).withColumn("change_type", F.lit("removed"))
        )

    # ---- maintenance --------------------------------------------------

    def vacuum(self, keep_last: int = 1, include_orphans: bool = False) -> list[str]:
        """Drop manifests older than the last ``keep_last`` and delete
        data directories no retained snapshot references. Returns the
        deleted directories. The only destructive operation, and it
        never touches the head.

        ``include_orphans`` additionally removes data directories no
        manifest at all references (crashed or conflict-losing commit
        attempts). Only safe when no commit is concurrently in flight —
        an in-flight attempt's directory looks identical to an orphan."""
        import shutil

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        vs = self.versions()
        drop, keep = vs[:-keep_last], vs[-keep_last:]
        referenced = {d for v in keep for d in self.snapshot(v).dirs}
        deleted = []
        for v in drop:
            for d in self.snapshot(v).dirs:
                if d not in referenced:
                    abs_d = os.path.join(self.path, d)
                    if os.path.isdir(abs_d):
                        shutil.rmtree(abs_d)
                    deleted.append(d)
                    referenced.add(d)  # don't double-delete
            os.remove(os.path.join(self._manifest_dir, f"v{v}.json"))
        if include_orphans:
            data_root = os.path.join(self.path, "data")
            if os.path.isdir(data_root):
                for name in sorted(os.listdir(data_root)):
                    rel = os.path.join("data", name)
                    if rel not in referenced:
                        shutil.rmtree(os.path.join(data_root, name))
                        deleted.append(rel)
        return deleted
