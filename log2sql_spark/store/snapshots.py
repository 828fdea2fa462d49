"""Snapshot-versioned parquet store: a minimal transactional table
format (manifest log + immutable data files) for the CDC apply path.

The reference's end state is replay SQL applied to a live MySQL server
(``log2sql.py:161-185``); the production Spark twin is ``foreachBatch →
MERGE INTO`` a transactional table (SURVEY.md §1.1). No Delta/Iceberg
jars exist in this container, so this module implements the part of a
table format those engines provide and the apply path actually needs:

* **Atomic, readable-or-invisible commits.** Every commit writes NEW
  immutable data files first, then publishes a JSON manifest by
  writing a writer-unique ``.inflight`` temp file and hard-linking it
  onto ``v{N}.json`` — ``os.link`` is an atomic put-if-absent (fails
  with EEXIST when the destination exists). A crash mid-write leaves
  orphan data files but no manifest — readers never observe a partial
  commit. This is the Iceberg snapshot contract, minus the catalog.
* **Time travel.** Manifests are append-only (``_manifests/v{N}.json``
  with a parent pointer); ``read(spark, version=...)`` reconstructs any
  retained snapshot. Overwrites never delete prior data files —
  ``vacuum`` is the explicit, separate destructive step, like Delta's.
* **Optimistic concurrency.** A commit records the parent version it
  built on; the ``os.link`` put-if-absent publish IS the commit point:
  of two writers racing to the same next version exactly one link
  succeeds, the loser gets ``ConflictError`` (EEXIST) and retries on
  the new head — no check-then-act window, no silent lost update. On
  object stores a real deployment swaps the link for a catalog
  conditional-put (If-None-Match), same protocol.
* **MERGE INTO with file-level pruning.** ``merge`` composes
  :func:`~log2sql_spark.operators.merge.merge_into` (latest-change-per-
  key window, delete/upsert semantics, idempotent under re-delivery)
  with a commit. When the store is CLUSTERED (``cluster_by=<key>``:
  range-partitioned files with per-file min/max key stats recorded in
  the manifest), a merge reads and rewrites ONLY the files whose key
  range overlaps the change batch — untouched files carry over into the
  new manifest by reference. At 100 TB this is the difference between
  rewriting the table per batch and rewriting a few hundred MB: merge
  cost scales with the CHANGE footprint, not the table. This is the
  same mechanism as Delta's data skipping + Iceberg's manifest stats.

Beyond the core protocol, the store carries the lakehouse lifecycle a
long-lived CDC target accumulates — each one metadata-only where Delta
is: additive schema evolution (``merge_schema``), column RENAME and
DROP via a physical→logical mapping reconciled at read time, generated
columns (computed when absent, VALIDATED when present), persistent
CHECK constraints enforced by every commit and merge, read-time
governance (column masks + row filters, versioned with the snapshot;
maintenance reads stay raw), shallow CLONE by absolute-path reference
(borrowed files are never vacuum-owned), RESTORE, ``fsck``, full and
PARTIAL compaction (``compact_small`` rewrites only the small-file
backlog), and DSv2 batch/stream read and write connectors
(sources/cdf_datasource.py) that honor the same protocol — including
refusing to serve a policied store raw.

Scale notes: manifest size is O(files touched per commit + carried
entries) — file counts are controlled by ``target_files`` per commit
and ``compact()``. Data is only ever read through
``spark.read.parquet`` with full pushdown.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import tempfile
import threading
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from log2sql_spark.operators.merge import merge_into

_JSONABLE = (int, float, str, bool)

# read_changes truncates the accumulated feed's lineage every this-many
# commit steps (lazy localCheckpoint) so Catalyst analysis cost stays
# bounded on long histories; 32 keeps checkpoint overhead negligible
# while capping plan depth.
_CDF_CHECKPOINT_EVERY = 32


class ConflictError(RuntimeError):
    """Another writer published a commit for the same parent version."""


class ExpectationError(ValueError):
    """A commit-time constraint failed; nothing was written."""

    def __init__(self, failures: list[tuple[str, int]]):
        self.failures = failures
        super().__init__(
            "constraints violated: "
            + ", ".join(f"{name} ({n} rows)" for name, n in failures)
        )


@dataclass
class Snapshot:
    version: int
    parent: int | None
    mode: str  # "append" | "overwrite" | "merge"
    entries: list[dict]  # {"path": rel, "min": key|None, "max": key|None}
    cluster_by: str | None
    schema_json: str | None  # lets an all-pruned/empty snapshot keep its schema
    meta: dict  # caller metadata (e.g. applied streaming batch_id)
    layout: str = "range"  # physical layout of clustered data: range | hash
    n_buckets: int | None = None  # fixed bucket count for hash layout
    created_at: float | None = None  # publish wall-clock (epoch seconds)
    # Column mapping (Delta 'name'-mode analog): {physical: logical}.
    # Physical = the name inside data files written before the rename;
    # logical = the current schema name. Applied at read time.
    renames: dict = field(default_factory=dict)
    # Generated columns (Delta analog): {column: SQL expression}.
    # Enforced/computed on every commit; appends inherit the spec.
    generated: dict = field(default_factory=dict)
    # Dropped columns (physical names): excluded at read time; the
    # bytes stay in the files until a compact() rewrites them out.
    dropped: list = field(default_factory=list)
    # Read-time governance (Delta/lakehouse column-mask + row-filter
    # analog): {"masks": {column: SQL expr}, "row_filter": SQL bool
    # expr}. Enforced by read()/read_pruned*; maintenance paths
    # (merge/compact/diff) operate on raw data like a table owner.
    policies: dict = field(default_factory=dict)
    # Persistent CHECK constraints (Delta ALTER TABLE ADD CONSTRAINT
    # analog): {name: SQL bool expr}. Every future commit/merge
    # validates its written rows; violations abort before publish.
    constraints: dict = field(default_factory=dict)
    # Merge-on-read deletes (Delta deletion-vector analog): {"key":
    # [cols], "entries": [{"path": rel}]} — parquet files of deleted
    # KEY rows. Reads anti-join them; the next data write folds them
    # into a materialized rewrite (see delete_where_mor).
    tombstones: dict = field(default_factory=dict)
    # Operation metrics (Delta operationMetrics analog), stamped at
    # publish: files added/removed/carried + bytes physically written.
    metrics: dict = field(default_factory=dict)

    @property
    def dirs(self) -> list[str]:
        """Top-level data directories OWNED by this snapshot (an entry
        is either a dir or a file inside one). Absolute entry paths are
        BORROWED references (shallow clone) — never owned, so vacuum /
        forget must never delete them; they are skipped here. Tombstone
        (merge-on-read delete) files are owned data like any other —
        vacuum must not reap a directory a retained snapshot's
        tombstones still reference."""
        seen: list[str] = []
        for e in self.entries + list(self.tombstones.get("entries") or []):
            if os.path.isabs(e["path"]):
                continue
            parts = e["path"].split(os.sep)
            top = os.path.join(parts[0], parts[1])
            if top not in seen:
                seen.append(top)
        return seen

    @property
    def has_buckets(self) -> bool:
        return bool(self.entries) and all(
            e.get("bucket") is not None for e in self.entries
        )

    @property
    def has_stats(self) -> bool:
        return bool(self.entries) and all(
            e.get("min") is not None and e.get("max") is not None
            for e in self.entries
        )

    @property
    def zorder_cols(self) -> list[str]:
        """The multi-dimensional clustering columns (cluster_by holds
        them comma-joined) — z-order and Hilbert layouts share every
        read/merge/prune path; only the write-side sort key differs."""
        if self.layout not in ("zorder", "hilbert") or not self.cluster_by:
            return []
        return self.cluster_by.split(",")

    def has_dim_stats(self, col: str) -> bool:
        """True when every entry carries [min, max] stats for ``col``
        (the per-dimension skipping index of the zorder layout)."""
        return bool(self.entries) and all(
            (e.get("stats") or {}).get(col) is not None
            and (e["stats"][col][0] is not None)
            for e in self.entries
        )


def _inherited(snap: Snapshot) -> dict:
    """Manifest keys every snapshot-derived commit carries forward
    (merge / restore / rename / drop / policy / clone)."""
    return {
        "renames": snap.renames,
        "generated": snap.generated,
        "dropped": snap.dropped,
        "policies": snap.policies,
        "constraints": snap.constraints,
        # Metadata-only commits (restore/rename/constraint) compose
        # with pending merge-on-read deletes; data REWRITE paths fold
        # them first (_fold_pending_deletes), so by the time they
        # publish via _inherited this is {}.
        "tombstones": snap.tombstones,
    }


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
            version=m["version"],
            parent=m["parent"],
            mode=m["mode"],
            entries=m["entries"],
            cluster_by=m.get("cluster_by"),
            schema_json=m.get("schema"),
            meta=m.get("meta", {}),
            layout=m.get("layout", "range"),
            n_buckets=m.get("n_buckets"),
            created_at=m.get("created_at"),
            renames=m.get("renames") or {},
            generated=m.get("generated") or {},
            dropped=m.get("dropped") or [],
            policies=m.get("policies") or {},
            constraints=m.get("constraints") or {},
            tombstones=m.get("tombstones") or {},
            metrics=m.get("metrics") or {},
        )

    # ---- commits ------------------------------------------------------

    def _write_data(
        self,
        df: DataFrame,
        version: int,
        cluster_by: str | None,
        target_files: int,
    ) -> list[dict]:
        """Write df into an attempt-unique immutable directory; return
        manifest entries. Attempt-unique because two racing writers
        targeting the same next version must not share a path (the
        publish step decides the winner; the loser's directory stays
        orphaned until vacuum). Clustered writes range-partition on the
        key and record per-file min/max stats — the data-skipping index
        a later merge prunes with."""
        data_root = os.path.join(self.path, "data")
        os.makedirs(data_root, exist_ok=True)
        data_abs = tempfile.mkdtemp(prefix=f"v{version}-", dir=data_root)
        data_rel = os.path.join("data", os.path.basename(data_abs))
        if cluster_by is None:
            df.write.mode("overwrite").parquet(data_abs)
            return [{"path": data_rel, "min": None, "max": None}]
        clustered = df.repartitionByRange(target_files, cluster_by)
        clustered.write.mode("overwrite").parquet(data_abs)
        # Per-file key stats come straight from the parquet FOOTERS the
        # write just produced (Delta gets the same numbers from write
        # transaction metrics) — driver-side metadata reads, no extra
        # Spark job. Parquet footer min/max may be truncated for long
        # binary values, but truncation keeps them CONSERVATIVE bounds
        # (min rounds down, max rounds up), which is exactly what range
        # pruning needs. An empty input writes no part files at all —
        # that is a legal empty snapshot (schema in the manifest).
        entries = []
        for name in sorted(os.listdir(data_abs)):
            if not name.endswith(".parquet") or name.startswith(("_", ".")):
                continue
            fpath = os.path.join(data_abs, name)
            lo, hi = self._footer_bounds(fpath, cluster_by)
            entries.append(
                {
                    "path": os.path.relpath(fpath, self.path),
                    "min": lo,
                    "max": hi,
                }
            )
        return entries

    @staticmethod
    def _footer_bounds(fpath: str, column: str):
        """(min, max) of ``column`` across a parquet file's row groups,
        from footer statistics only; (None, None) when stats are absent
        or not JSON-representable (which just disables pruning for the
        file, never correctness)."""
        import pyarrow.parquet as pq

        md = pq.ParquetFile(fpath).metadata
        # Index by the full dotted path: parquet footers list LEAF
        # columns, and a nested field (e.g. a map's internal "key" leaf)
        # can share its bare name with a top-level column.
        idx = {md.schema.column(i).path: i for i in range(md.num_columns)}.get(column)
        if idx is None:
            return None, None
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return None, None
            rlo, rhi = st.min, st.max
            if isinstance(rlo, bytes):
                try:
                    rlo, rhi = rlo.decode(), rhi.decode()
                except UnicodeDecodeError:
                    return None, None
            if not isinstance(rlo, _JSONABLE) or not isinstance(rhi, _JSONABLE):
                return None, None
            lo = rlo if lo is None or rlo < lo else lo
            hi = rhi if hi is None or rhi > hi else hi
        return lo, hi

    def _write_data_hash(
        self, df: DataFrame, version: int, cluster_by: str, n_buckets: int
    ) -> list[dict]:
        """Hash-bucket layout: rows land in ``_bucket=<k>`` directories by
        ``pmod(xxhash64(key), n)``. The right physical design for keys
        without meaningful ranges (uuid/string CDC keys, where range
        stats on a uniform key space prune nothing): any key maps to
        exactly one bucket, so lookups and merges touch O(|affected
        buckets|) directories regardless of key distribution. The bucket
        count is FIXED for the store's lifetime (recorded in the
        manifest) — changing it is a rewrite, as with any bucketing."""
        data_root = os.path.join(self.path, "data")
        os.makedirs(data_root, exist_ok=True)
        data_abs = tempfile.mkdtemp(prefix=f"v{version}-", dir=data_root)
        data_rel = os.path.join("data", os.path.basename(data_abs))
        (
            # NULL keys hash to bucket 0 (coalesce) instead of spilling
            # into a __HIVE_DEFAULT_PARTITION__ directory the manifest
            # could not represent; lookups for NULL are meaningless, so
            # only bucket 0 ever over-reads for them.
            df.withColumn(
                "_bucket",
                F.coalesce(
                    F.pmod(F.xxhash64(F.col(cluster_by)), F.lit(n_buckets)),
                    F.lit(0),
                ),
            )
            .repartition(n_buckets, "_bucket")
            .write.partitionBy("_bucket")
            .mode("overwrite")
            .parquet(data_abs)
        )
        entries = []
        for name in sorted(os.listdir(data_abs)):
            if name.startswith("_bucket="):
                entries.append(
                    {
                        "path": os.path.join(data_rel, name),
                        "bucket": int(name.split("=", 1)[1]),
                    }
                )
        return entries

    def _write_data_zorder(
        self, df: DataFrame, version: int, cols: list[str], target_files: int,
        layout: str = "zorder",
    ) -> list[dict]:
        """Multi-dimensional clustered layout: files range-partitioned
        on a space-filling-curve value (operators/zorder.py — Morton
        z-value for ``layout="zorder"``, Skilling Hilbert index for
        ``layout="hilbert"``), with per-file [min, max] stats recorded
        for EVERY dimension — the multi-dimensional skipping index. A
        predicate on ANY clustered column prunes files; a single-key
        range sort can only ever skip on its one key. The Hilbert
        curve's no-diagonal-jump locality tightens each file's
        per-dimension spans at equal file count, so box predicates
        overlap fewer files (measured in tests/test_hilbert.py); the
        pruning CONTRACT is identical because it reads only the stats."""
        from log2sql_spark.operators.zorder import hilbert_key_nd, zorder_key

        data_root = os.path.join(self.path, "data")
        os.makedirs(data_root, exist_ok=True)
        data_abs = tempfile.mkdtemp(prefix=f"v{version}-", dir=data_root)
        key_fn = hilbert_key_nd if layout == "hilbert" else zorder_key
        z = key_fn(df, cols)
        (
            df.withColumn("_z", z)
            .repartitionByRange(target_files, "_z")
            .sortWithinPartitions("_z")
            .drop("_z")
            .write.mode("overwrite")
            .parquet(data_abs)
        )
        entries = []
        for name in sorted(os.listdir(data_abs)):
            if not name.endswith(".parquet") or name.startswith(("_", ".")):
                continue
            fpath = os.path.join(data_abs, name)
            stats = {}
            for c in cols:
                lo, hi = self._footer_bounds(fpath, c)
                stats[c] = [lo, hi]
            entries.append(
                {
                    "path": os.path.relpath(fpath, self.path),
                    "min": None,
                    "max": None,
                    "stats": stats,
                }
            )
        return entries

    def commit(
        self,
        df: DataFrame,
        mode: str = "append",
        cluster_by: str | None = None,
        target_files: int = 8,
        meta: dict | None = None,
        layout: str = "range",
        expect: list | None = None,
        merge_schema: bool = False,
        generated: dict[str, str] | None = None,
        policies: dict | None = None,
        constraints: dict | None = None,
        audit: bool = False,
        max_retries: int = 0,
        state_independent: bool = False,
    ) -> int:
        """Write ``df`` as a new snapshot; returns the new version.

        ``max_retries`` > 0 enables optimistic concurrency for APPENDS
        (the common multi-writer case): an append that loses the
        publish race rebases manifest-only onto the winner — appends
        are disjoint by construction (they only add files), so the
        rebase is always sound unless the winner changed schema,
        layout, clustering, or governance (including landing new
        merge-on-read tombstones), in which case the whole commit
        recomputes against the new head. Non-append modes retry by
        re-committing the SAME DataFrame — correct only when the
        content is state-independent (a true overwrite whose rows do
        not derive from the current head); a DERIVED rewrite (compact,
        zorder, delete_where) must re-derive from the new head instead,
        so those paths keep their own retry loops. Because the API
        cannot tell the two apart, ``max_retries`` > 0 with
        ``mode="overwrite"`` raises unless the caller asserts
        ``state_independent=True`` — the blind re-publish of a
        head-derived overwrite would silently erase the racing
        winner's rows (the exact lost-update ``compact``'s re-derive
        loop exists to prevent). Default 0 keeps fail-fast
        ``ConflictError``.

        ``generated`` maps column name -> SQL expression (Delta
        generated-columns analog): a column ABSENT from ``df`` is
        computed from the expression before writing; a column PRESENT
        is VALIDATED against it (null-safe equality; any mismatch
        raises before a byte is written — same determinism caveat as
        ``expect``). Appends inherit the spec from the parent snapshot
        (pass ``generated`` only on the first commit or an overwrite),
        so every future writer keeps the derivation true — which is
        what lets readers prune on a generated partition-like column
        without trusting each writer.

        The manifest publish is the atomic commit point. ``overwrite``
        replaces the visible contents but deletes nothing — prior
        snapshots stay readable until ``vacuum``. ``cluster_by`` writes
        clustered data enabling pruned merges: ``layout="range"``
        (range-partitioned files + per-file min/max stats — best for
        ordered numeric keys) or ``layout="hash"`` (fixed xxhash64
        buckets — best for arbitrary string/uuid keys).

        ``expect`` takes operators/expectations.py rules enforced as
        commit-time constraints (Delta's CHECK/NOT NULL analog): any
        rule with violations raises :class:`ExpectationError` BEFORE a
        byte is written, so a failed commit leaves no new version and
        no orphan data. The check is a separate pass over ``df``, so
        the no-violating-byte guarantee requires ``df`` to be
        DETERMINISTIC between the two evaluations (as Spark generally
        assumes for retried stages): a non-deterministic input (e.g.
        ``rand()`` without a seed, unordered ``limit``) can pass the
        check yet write different rows. Persist such inputs (and any
        expensive-to-recompute ones) before committing — or pass
        ``audit=True`` (Write-Audit-Publish): expectations and CHECK
        constraints are then enforced on a read-back of the WRITTEN
        files instead, which a non-deterministic input cannot slip
        past; a failed audit removes the attempt directory and
        publishes nothing, at the cost of one extra read of the new
        data.

        Schema enforcement + evolution (Delta semantics): an ``append``
        whose column names differ from the store's current schema
        raises unless ``merge_schema=True``, which allows ADDITIVE
        widening — the manifest records the union schema (store columns
        first, new columns after), and files from earlier snapshots
        read back with NULLs for the new columns (``read`` merges
        parquet schemas). ``overwrite`` always replaces the schema,
        like Delta ``overwriteSchema``."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"mode must be append|overwrite, got {mode!r}")
        if max_retries > 0 and mode != "append" and not state_independent:
            raise ValueError(
                "commit(mode='overwrite', max_retries>0) retries by "
                "re-publishing the SAME DataFrame, which loses the racing "
                "winner's rows if the content derives from the current "
                "head; pass state_independent=True to assert it does not "
                "(or use compact()/delete_where(), which re-derive)"
            )
        # Originals for a possible conflict-recompute retry: several
        # locals below are rebound (cluster_by joins, generated/policy
        # inheritance resolves) and must NOT leak into a retry that
        # should re-inherit from the NEW head.
        _retry_args = dict(
            mode=mode, cluster_by=cluster_by, target_files=target_files,
            meta=meta, layout=layout, expect=expect,
            merge_schema=merge_schema, generated=generated,
            policies=policies, constraints=constraints, audit=audit,
            state_independent=state_independent,
        )
        if mode == "append":
            # pending merge-on-read deletes fold before any new data
            # lands: appended entries join a manifest whose tombstones
            # are gone, so a re-inserted key is a new visible row
            self._fold_pending_deletes(df.sparkSession)
        parent = self.head_version()
        if mode == "append" and parent is not None and generated is None:
            generated = dict(self.snapshot(parent).generated)
        generated = generated or {}
        for col, expr in generated.items():
            if col not in df.columns:
                df = df.withColumn(col, F.expr(expr))
            else:
                # Validation is a separate pass, like `expect` — same
                # determinism requirement on df.
                bad = (
                    df.filter(~F.col(col).eqNullSafe(F.expr(expr)))
                    .limit(1)
                    .count()
                )
                if bad:
                    raise ValueError(
                        f"generated column {col!r} does not satisfy its "
                        f"expression {expr!r}; fix the writer or drop the "
                        "column to let the store compute it"
                    )
        if expect and not audit:
            from log2sql_spark.operators.expectations import check_expectations

            report = check_expectations(df, expect).collect()
            failures = [
                (r.rule, r.violations) for r in report if r.violations > 0
            ]
            if failures:
                raise ExpectationError(failures)
        if layout not in ("range", "hash", "zorder", "hilbert"):
            raise ValueError(
                f"layout must be range|hash|zorder|hilbert, got {layout!r}"
            )
        if isinstance(cluster_by, (list, tuple)):
            cluster_by = ",".join(cluster_by)
        if layout in ("zorder", "hilbert") and (
            cluster_by is None or "," not in cluster_by
        ):
            raise ValueError(
                f"{layout} layout needs >=2 comma-separated cluster_by cols"
            )
        version = 1 if parent is None else parent + 1
        schema_json = df.schema.json()
        # Appends inherit the column mapping (old files still carry
        # physical names); an overwrite replaces all visible data with
        # files written under the current logical schema, so the map
        # resets — same lifecycle as the schema itself.
        if mode == "overwrite" or parent is None:
            renames, dropped = {}, []
            # Unlike renames/dropped (file-name state a rewrite
            # materializes away), policies are GOVERNANCE — an explicit
            # pass-through (compact, CLI zorder) keeps them alive
            # across an overwrite; a plain overwrite resets like Delta
            # replacing the table.
            policies = dict(policies or {})
            constraints = dict(constraints or {})
        else:
            prev_meta = self.snapshot(parent)
            renames, dropped = dict(prev_meta.renames), list(prev_meta.dropped)
            policies = dict(prev_meta.policies if policies is None else policies)
            constraints = dict(
                prev_meta.constraints if constraints is None else constraints
            )
        if not audit:
            self._check_constraints(df, constraints)
        if renames:
            clash = [f.name for f in df.schema.fields if f.name in renames]
            if clash:
                raise ValueError(
                    f"append columns {clash} collide with physical names "
                    "of renamed columns (reading would merge them); pick "
                    "different names or compact() to materialize the rename"
                )
        if dropped:
            clash = [f.name for f in df.schema.fields if f.name in dropped]
            if clash:
                raise ValueError(
                    f"append columns {clash} reuse dropped column names "
                    "still present in old files (reading would resurface "
                    "stale values); compact() first to rewrite them out"
                )
        if mode == "append" and parent is not None:
            # Schema check BEFORE any byte is written: a failed append
            # leaves no new version and no orphan data directory.
            prev_st = T.StructType.fromJson(
                json.loads(self.snapshot(parent).schema_json)
            )
            added = [f.name for f in df.schema.fields if f.name not in prev_st.names]
            if added and not merge_schema:
                raise ValueError(
                    f"append schema adds columns {added} not in the store "
                    "schema; pass merge_schema=True to evolve (additive "
                    "widening; old files read NULL for new columns)"
                )
            # Manifest records the UNION schema (store order first, new
            # columns after): a subset append must not shrink the
            # recorded contract, and a widening one must extend it.
            schema_json = T.StructType(
                list(prev_st.fields)
                + [f for f in df.schema.fields if f.name not in prev_st.names]
            ).json()
        n_buckets = target_files if layout == "hash" else None
        if cluster_by is not None and layout == "hash":
            entries = self._write_data_hash(df, version, cluster_by, target_files)
        elif cluster_by is not None and layout in ("zorder", "hilbert"):
            entries = self._write_data_zorder(
                df, version, cluster_by.split(","), target_files, layout=layout
            )
        else:
            entries = self._write_data(df, version, cluster_by, target_files)
        if audit:
            # Write-Audit-Publish (Iceberg WAP): validate the BYTES the
            # write produced, not the input plan — which closes the
            # determinism caveat of the pre-write checks (a
            # non-deterministic df can pass a pre-check yet write
            # violating rows; it cannot pass an audit of the written
            # files). Failure removes the attempt directory and raises
            # with no version published — the reader-visible store is
            # untouched.
            self._audit_written(df.sparkSession, entries, expect, constraints)
        new_entries = list(entries)
        if mode == "append" and parent is not None:
            prev = self.snapshot(parent)
            entries = prev.entries + entries
            if prev.cluster_by != cluster_by or prev.layout != layout or (
                layout == "hash" and prev.n_buckets != n_buckets
            ):
                cluster_by = None  # mixed layouts: pruning no longer sound
                n_buckets = None
        try:
            self._publish(
                {
                    "version": version,
                    "parent": parent,
                    "mode": mode,
                    "entries": entries,
                    "cluster_by": cluster_by,
                    "schema": schema_json,
                    "meta": meta or {},
                    "layout": layout,
                    "n_buckets": n_buckets,
                    "renames": renames,
                    "generated": generated,
                    "dropped": dropped,
                    "policies": policies,
                    "constraints": constraints,
                }
            )
            return version
        except ConflictError:
            if max_retries <= 0:
                raise
            if mode == "append" and parent is not None:
                rebased = self._rebase_append(
                    self.snapshot(parent), new_entries, schema_json,
                    meta, (cluster_by, layout, n_buckets), max_retries,
                )
                if rebased is not None:
                    return rebased
            return self.commit(
                df, max_retries=max_retries - 1, **_retry_args
            )

    def _audit_written(
        self,
        spark: SparkSession,
        entries: list[dict],
        expect: list | None,
        constraints: dict,
    ) -> None:
        """Post-write audit for ``commit(audit=True)``: read back the
        just-written files and enforce expectations + CHECK constraints
        against them; clean up and raise on failure (nothing published).
        """
        if not entries:
            return
        try:
            audit_df = spark.read.parquet(
                *[os.path.join(self.path, e["path"]) for e in entries]
            )
            failures: list[tuple[str, int]] = []
            if expect:
                from log2sql_spark.operators.expectations import (
                    check_expectations,
                )

                report = check_expectations(audit_df, expect).collect()
                failures = [
                    (r.rule, r.violations) for r in report if r.violations > 0
                ]
            if failures:
                raise ExpectationError(failures)
            self._check_constraints(audit_df, constraints)
        except Exception:
            # attempt dir = first two path components (data/vN-XXXX)
            tops = set()
            for e in entries:
                parts = e["path"].split(os.sep)
                tops.add(os.path.join(self.path, parts[0], parts[1]))
            for t in tops:
                shutil.rmtree(t, ignore_errors=True)
            raise

    @staticmethod
    def _check_constraints(df: DataFrame, constraints: dict) -> None:
        """Persistent CHECK enforcement: standard SQL semantics (NULL
        predicate passes). One cheap existence probe over the rows
        about to be written; the per-constraint violation counts are
        computed only on the failure path."""
        if not constraints:
            return
        neg = " OR ".join(f"NOT ({c})" for c in constraints.values())
        if df.filter(F.expr(neg)).limit(1).count():
            failures = [
                (name, n)
                for name, c in constraints.items()
                if (n := df.filter(~F.expr(c)).count())
            ]
            raise ExpectationError(failures)

    def _operation_metrics(self, manifest: dict) -> dict:
        """Delta operationMetrics analog, computed at publish time from
        the parent's entry list (driver-side manifest diff + a stat per
        ADDED file — never a data read): how many files this commit
        added/removed/carried and the bytes it physically wrote. The
        write-amplification ledger that makes pruned-vs-full merges and
        rebase-vs-recompute visible in DESCRIBE HISTORY."""
        parent_v = manifest.get("parent")
        cur = {e["path"] for e in manifest.get("entries", [])}
        if parent_v is None:
            prev: set = set()
        else:
            try:
                prev = {e["path"] for e in self.snapshot(parent_v).entries}
            except OSError:
                return {}
        added = cur - prev
        bytes_added = 0
        for p in added:
            fp = p if os.path.isabs(p) else os.path.join(self.path, p)
            try:
                if os.path.isdir(fp):
                    for root, _, files in os.walk(fp):
                        bytes_added += sum(
                            os.path.getsize(os.path.join(root, f)) for f in files
                        )
                else:
                    bytes_added += os.path.getsize(fp)
            except OSError:
                pass  # borrowed/raced file: size best-effort
        return {
            "files_added": len(added),
            "files_removed": len(prev - cur),
            "files_carried": len(cur & prev),
            "bytes_added": bytes_added,
        }

    def _publish(self, manifest: dict) -> None:
        manifest.setdefault("created_at", time.time())
        manifest.setdefault("metrics", self._operation_metrics(manifest))
        final = os.path.join(self._manifest_dir, f"v{manifest['version']}.json")
        if os.path.exists(final):  # fast path only; the real gate is the link below
            raise ConflictError(
                f"version {manifest['version']} was published by another writer"
            )
        # Unique temp per writer so two racers never share an inflight file.
        tmp = f"{final}.{os.getpid()}.{threading.get_ident()}.inflight"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        try:
            # os.link is an atomic put-if-absent: unlike os.replace it FAILS
            # with EEXIST when the destination exists, so of two writers
            # racing through the exists()-check window exactly one wins the
            # commit point and the other surfaces a ConflictError for the
            # OCC retry loop — no silent lost update.
            os.link(tmp, final)
        except FileExistsError:
            raise ConflictError(
                f"version {manifest['version']} was published by another writer"
            ) from None
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass

    def detail(self, version: int | None = None) -> dict:
        """DESCRIBE DETAIL: one manifest-only summary dict for a
        snapshot (head by default) — version, layout/clustering, file
        count and total bytes, column count, and which governance /
        lineage features are active. No Spark session, no data read."""
        if version is None:
            version = self.head_version()
            if version is None:
                raise ValueError("store has no commits")
        snap = self.snapshot(version)
        size = 0
        for e in snap.entries:
            # absolute path = shallow-clone borrow, sized where it lives
            fp = e["path"] if os.path.isabs(e["path"]) else os.path.join(
                self.path, e["path"]
            )
            if os.path.exists(fp):
                size += os.path.getsize(fp)
        import json as _json

        schema = _json.loads(snap.schema_json) if snap.schema_json else {}
        n_cols = len(schema.get("fields", []))
        return {
            "version": version,
            "head_version": self.head_version(),
            "layout": snap.layout,
            "cluster_by": snap.cluster_by,
            "n_buckets": snap.n_buckets,
            "num_files": len(snap.entries),
            "size_bytes": size,
            "num_columns": n_cols,
            "mode": snap.mode,
            "renamed_columns": len(snap.renames),
            "dropped_columns": len(snap.dropped),
            "generated_columns": sorted(snap.generated),
            "constraints": sorted(snap.constraints),
            "masked_columns": sorted((snap.policies.get("masks") or {})),
            "has_row_filter": bool(snap.policies.get("row_filter")),
            "pending_delete_files": len(snap.tombstones.get("entries") or []),
            "tags": self.tags(),
            "branches": {
                b: ref["base_version"] for b, ref in self.branch_refs().items()
            },
        }

    def fsck(self, version: int | None = None) -> list[str]:
        """Manifest integrity check: the relative paths a snapshot's
        manifest references that do NOT exist on disk (a vacuum bug,
        manual deletion, or partial restore). Empty list = sound. A
        read() of a damaged snapshot fails with Spark's path error;
        ``fsck`` pinpoints the missing files first so an operator can
        restore them or roll back to an intact version — the same job
        as Delta's FSCK REPAIR TABLE diagnosis pass."""
        version = self.head_version() if version is None else version
        if version is None:
            return []
        snap = self.snapshot(version)
        return [
            e["path"]
            for e in snap.entries + list(snap.tombstones.get("entries") or [])
            if not os.path.exists(os.path.join(self.path, e["path"]))
        ]

    def file_count(self, version: int | None = None) -> int:
        """Actual parquet part files a snapshot references (walking
        directory entries — hash layouts list bucket DIRS in the
        manifest, whose per-bucket small files grow with every merge).
        The signal auto-compaction triggers on."""
        version = self.head_version() if version is None else version
        if version is None:
            return 0
        n = 0
        for e in self.snapshot(version).entries:
            p = os.path.join(self.path, e["path"])
            if os.path.isdir(p):
                for root, _dirs, files in os.walk(p):
                    n += sum(
                        f.endswith(".parquet") and not f.startswith(".")
                        for f in files
                    )
            elif p.endswith(".parquet"):
                n += 1
        return n

    def files(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Iceberg's ``.files`` metadata table (Delta: the add-file side
        of DESCRIBE DETAIL): one row per LIVE data file of the given
        snapshot — relative path, on-disk bytes, per-file key bounds
        (stringified: key types vary per table, like Iceberg's
        readable_metrics), hash bucket if any. Built from the manifest
        plus driver-side stat calls — O(|files|) metadata rows, zero
        data I/O, no Spark job until the caller acts on it. This is the
        observable surface maintenance planning reads: compact_where
        picks its band from exactly these bounds, skew shows up as one
        oversized row, and a vacuum dry-run diffs this table across
        versions."""
        return spark.createDataFrame(
            self.file_entries(version),
            "path string, size_bytes bigint, min_key string, "
            "max_key string, bucket int",
        )

    def file_entries(
        self, version: int | None = None
    ) -> list[tuple[str, int | None, str | None, str | None, int | None]]:
        """Driver-side rows behind :meth:`files` — (path, size_bytes,
        min_key, max_key, bucket) per live file. Shared by the CLI
        ``store files`` command so the listing can never drift from
        the DataFrame surface; raises the same clean ValueError on an
        empty store."""
        v = self.head_version() if version is None else version
        if v is None:
            raise ValueError("files() on an empty store")
        snap = self.snapshot(v)
        rows = []
        for e in snap.entries:
            p = os.path.join(self.path, e["path"])
            if os.path.isdir(p):
                size = sum(
                    os.path.getsize(os.path.join(root, f))
                    for root, _, fs in os.walk(p)
                    for f in fs
                )
            else:
                size = os.path.getsize(p) if os.path.exists(p) else None
            rows.append(
                (
                    e["path"],
                    size,
                    None if e.get("min") is None else str(e["min"]),
                    None if e.get("max") is None else str(e["max"]),
                    e.get("bucket"),
                )
            )
        return rows

    def history(self) -> list[dict]:
        """DESCRIBE HISTORY: one dict per retained version, oldest
        first — version, parent, mode, layout, file count, publish
        time, and caller metadata. Pure manifest reads."""
        out = []
        for v in self.versions():
            snap = self.snapshot(v)
            out.append(
                {
                    "version": snap.version,
                    "parent": snap.parent,
                    "mode": snap.mode,
                    "layout": snap.layout,
                    "n_files": len(snap.entries),
                    "created_at": snap.created_at,
                    "meta": snap.meta,
                    "metrics": snap.metrics,
                }
            )
        return out

    def version_at(self, ts: float) -> int:
        """Latest version published at or before epoch ``ts`` —
        Delta's TIMESTAMP AS OF resolution. Raises if the store has no
        version that old."""
        versions = self.versions()
        if not versions:
            raise ValueError("store has no commits")
        best = None
        for v in versions:
            created = self.snapshot(v).created_at
            if created is not None and created <= ts:
                best = v
        if best is None:
            raise ValueError(
                f"no snapshot at or before ts={ts}; earliest is "
                f"{self.snapshot(versions[0]).created_at}"
            )
        return best

    # ---- reads --------------------------------------------------------

    def read_as_of(self, spark: SparkSession, ts: float) -> DataFrame:
        """Timestamp time travel: read the snapshot that was current
        at epoch ``ts``."""
        return self.read(spark, self.version_at(ts))

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        apply_policies: bool = True,
    ) -> DataFrame:
        """Read a snapshot. ``apply_policies=False`` is the table-owner
        path (maintenance: merge/compact read raw — a masked merge
        would corrupt the stored values); governed readers get the
        snapshot's row filter + column masks applied, versioned with
        the snapshot itself (time travel reads THAT version's policy)."""
        version = self.head_version() if version is None else version
        if version is None:
            raise ValueError(f"store at {self.path} has no commits")
        snap = self.snapshot(version)
        if not snap.entries:
            from pyspark.sql.types import StructType

            df = spark.createDataFrame(
                [], StructType.fromJson(json.loads(snap.schema_json))
            )
            return self._apply_policies(df, snap) if apply_policies else df
        paths = [os.path.join(self.path, e["path"]) for e in snap.entries]
        # mergeSchema: additive schema evolution — an append that widened
        # the schema reads back with NULLs for columns absent in older
        # files (the manifest's recorded schema is the current contract;
        # per-snapshot schemas make old versions read with THEIR schema,
        # so time travel is schema-accurate too).
        df = spark.read.option("mergeSchema", "true").parquet(*paths)
        if "_bucket" in df.columns:
            # hash layout: partition-dir inference may resurface the
            # internal bucket column when sibling dirs share a parent
            df = df.drop("_bucket")
        df = self._apply_renames(df, snap.renames, snap.dropped)
        df = self._apply_tombstones(spark, df, snap)
        return self._apply_policies(df, snap) if apply_policies else df

    def _apply_tombstones(
        self, spark: SparkSession, df: DataFrame, snap: Snapshot
    ) -> DataFrame:
        """Merge-on-read deletes: anti-join the snapshot's tombstoned
        keys (Delta deletion-vector read side). Tombstone sets are
        small relative to the table by contract — a delete big enough
        to matter should be a copy-on-write ``delete_where`` — so the
        anti-join broadcasts and the scan stays one pass. Applied
        BEFORE governance policies: a tombstone is data state, not a
        view."""
        entries = snap.tombstones.get("entries") or []
        if not entries:
            return df
        keys = snap.tombstones["key"]
        tomb = spark.read.parquet(
            *[os.path.join(self.path, e["path"]) for e in entries]
        ).dropDuplicates(keys)
        return df.join(F.broadcast(tomb), on=keys, how="left_anti")

    @staticmethod
    def _apply_policies(df: DataFrame, snap: Snapshot) -> DataFrame:
        """Row filter first (decided on true values), then column masks
        (the output the governed reader sees) — Delta's evaluation
        order for row filters + column masks."""
        row_filter = snap.policies.get("row_filter")
        if row_filter:
            df = df.filter(F.expr(row_filter))
        for col, expr in (snap.policies.get("masks") or {}).items():
            if col in df.columns:
                df = df.withColumn(col, F.expr(expr))
        return df

    @staticmethod
    def _apply_renames(
        df: DataFrame, renames: dict, dropped: list | tuple = ()
    ) -> DataFrame:
        """Apply the snapshot's column mapping to a raw file read.

        Files written before a rename carry the PHYSICAL name, files
        written after carry the LOGICAL one; ``mergeSchema`` surfaces
        both as sibling columns with NULLs where absent, so within any
        row at most one side is populated — coalescing them is exact.
        ``rename_column`` composes chained renames into a single
        physical→logical hop, so one pass suffices. ``dropped``
        physical columns are excluded last — their bytes stay in the
        files until compaction, invisible to readers (Delta DROP COLUMN
        semantics)."""
        for phys, logical in renames.items():
            if phys not in df.columns:
                continue  # e.g. fully compacted: physical name is gone
            if logical in df.columns:
                df = df.withColumn(
                    logical, F.coalesce(F.col(logical), F.col(phys))
                ).drop(phys)
            else:
                df = df.withColumnRenamed(phys, logical)
        for phys in dropped:
            if phys in df.columns:
                df = df.drop(phys)
        return df

    def read_pruned(
        self,
        spark: SparkSession,
        values: list,
        version: int | None = None,
    ) -> DataFrame:
        """Manifest data skipping for point lookups: read only the files
        whose [min, max] cluster-key range contains at least one of
        ``values``. Falls back to a full read when stats are absent; the
        caller still applies its exact filter (this is a superset read,
        like any min/max skip). At scale this turns a keyed lookup into
        O(matching files) I/O without any external index."""
        version = self.head_version() if version is None else version
        snap = self.snapshot(version)
        if not values:
            return self.read(spark, version)
        if snap.layout == "hash" and snap.has_buckets and snap.n_buckets:
            buckets = self._buckets_of(spark, snap, values)
            keep = [e for e in snap.entries if e["bucket"] in buckets]
        elif snap.has_stats:
            keep = [
                e
                for e in snap.entries
                if any(e["min"] <= v <= e["max"] for v in values)
            ]
        else:
            return self.read(spark, version)
        if not keep:
            return self.read(spark, version).limit(0)
        df = spark.read.option("mergeSchema", "true").parquet(
            *[os.path.join(self.path, e["path"]) for e in keep]
        )
        if "_bucket" in df.columns:
            df = df.drop("_bucket")
        df = self._apply_renames(df, snap.renames, snap.dropped)
        return self._apply_policies(self._apply_tombstones(spark, df, snap), snap)

    def read_pruned_box(
        self,
        spark: SparkSession,
        preds: dict[str, tuple],
        version: int | None = None,
    ) -> DataFrame:
        """Multi-dimensional data skipping on a zorder-clustered
        snapshot: ``preds`` maps dimension -> (lo, hi) inclusive bounds
        (either side None for open); only files whose per-dimension
        [min, max] stats overlap EVERY given interval are read. This is
        the read-side payoff of the z-order layout — a predicate on any
        clustered dimension skips files, where the range layout can only
        skip on its single key. Superset read: apply the exact filter on
        the result."""
        version = self.head_version() if version is None else version
        snap = self.snapshot(version)
        usable = {
            c: b
            for c, b in preds.items()
            if c in snap.zorder_cols and snap.has_dim_stats(c)
        }
        if not usable or not snap.entries:
            return self.read(spark, version)

        def overlaps(e: dict) -> bool:
            for c, (plo, phi) in usable.items():
                lo, hi = e["stats"][c]
                if phi is not None and lo > phi:
                    return False
                if plo is not None and hi < plo:
                    return False
            return True

        keep = [e for e in snap.entries if overlaps(e)]
        if not keep:
            return self.read(spark, version).limit(0)
        df = spark.read.option("mergeSchema", "true").parquet(
            *[os.path.join(self.path, e["path"]) for e in keep]
        )
        df = self._apply_renames(df, snap.renames, snap.dropped)
        return self._apply_policies(self._apply_tombstones(spark, df, snap), snap)

    def analyze(self, cols: list[str]) -> int:
        """Delta-style any-column data skipping, added AFTER the fact:
        record per-file [min, max] stats for ``cols`` in the manifest —
        a METADATA-ONLY commit whose numbers come straight from the
        parquet FOOTERS already on disk (driver-side reads of file
        metadata; no Spark job, no data scanned). ``read_pruned_stats``
        then skips files on predicates over ANY analyzed column, which
        pays off exactly when a column correlates with ingest order
        (dates, monotonic ids — the common case for time-ordered CDC
        tables). O(files) per analyze; stats ride per-entry like the
        zorder layout's, so carried-by-reference files keep them
        through pruned merges, and files written later simply lack
        them (conservative: an un-analyzed file is never skipped).

        Restrictions: renamed/dropped column mappings must be
        compacted away first (footers hold physical names); masked
        columns are refused — their min/max in a world-readable
        manifest would leak what the mask hides."""
        head = self.head_version()
        if head is None:
            raise ValueError("analyze on an empty store")
        snap = self.snapshot(head)
        if snap.renames or snap.dropped:
            raise ValueError(
                "store has column mappings; compact() before analyze "
                "(footers hold physical names)"
            )
        masked = set(snap.policies.get("masks") or {})
        bad = masked & set(cols)
        if bad:
            raise ValueError(
                f"columns {sorted(bad)} are masked; manifest stats would "
                "leak masked values"
            )
        entries = []
        for e in snap.entries:
            root = e["path"] if os.path.isabs(e["path"]) else os.path.join(
                self.path, e["path"]
            )
            files = []
            if os.path.isdir(root):
                for r, _d, fs in os.walk(root):
                    files += [
                        os.path.join(r, f)
                        for f in fs
                        if f.endswith(".parquet") and not f.startswith((".", "_"))
                    ]
            else:
                files = [root]
            stats = dict(e.get("stats") or {})
            for c in cols:
                lo = hi = None
                ok = True
                for f in sorted(files):
                    flo, fhi = self._footer_bounds(f, c)
                    if flo is None or fhi is None:
                        ok = False
                        break
                    lo = flo if lo is None or flo < lo else lo
                    hi = fhi if hi is None or fhi > hi else hi
                if ok and lo is not None:
                    stats[c] = [lo, hi]
            entries.append({**e, "stats": stats} if stats else dict(e))
        self._publish(
            {
                "version": head + 1,
                "parent": head,
                "mode": "analyze",
                "entries": entries,
                "cluster_by": snap.cluster_by,
                "schema": snap.schema_json,
                "meta": {"analyzed": sorted(cols)},
                "layout": snap.layout,
                "n_buckets": snap.n_buckets,
                **_inherited(snap),
            }
        )
        return head + 1

    def read_pruned_stats(
        self,
        spark: SparkSession,
        preds: dict[str, tuple],
        version: int | None = None,
    ) -> DataFrame:
        """Generalized data skipping over ``analyze``-recorded stats:
        ``preds`` maps column -> (lo, hi) inclusive bounds (either side
        None for open); only entries whose recorded [min, max] for a
        predicate column rules out every row are skipped. Entries
        LACKING stats for a column are kept — an un-analyzed file is a
        conservative full read, never a correctness risk. Superset
        read, like every min/max skip: apply the exact filter on the
        result."""
        version = self.head_version() if version is None else version
        snap = self.snapshot(version)
        if not snap.entries:
            return self.read(spark, version)

        def overlaps(e: dict) -> bool:
            st = e.get("stats") or {}
            for c, (plo, phi) in preds.items():
                if c not in st or st[c][0] is None:
                    continue  # no stats recorded: cannot skip
                lo, hi = st[c]
                if phi is not None and lo > phi:
                    return False
                if plo is not None and hi < plo:
                    return False
            return True

        keep = [e for e in snap.entries if overlaps(e)]
        if not keep:
            return self.read(spark, version).limit(0)
        df = spark.read.option("mergeSchema", "true").parquet(
            *[
                e["path"] if os.path.isabs(e["path"])
                else os.path.join(self.path, e["path"])
                for e in keep
            ]
        )
        if "_bucket" in df.columns:
            df = df.drop("_bucket")
        df = self._apply_renames(df, snap.renames, snap.dropped)
        return self._apply_policies(self._apply_tombstones(spark, df, snap), snap)

    def _buckets_of(self, spark: SparkSession, snap: Snapshot, values: list) -> set:
        """Buckets the given key values hash into (one tiny Spark job —
        xxhash64 lives JVM-side; |values| is small by contract)."""
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(json.loads(snap.schema_json))
        field = schema[snap.cluster_by]
        rows = [(v,) for v in values]
        vdf = spark.createDataFrame(rows, StructType([field]))
        out = vdf.select(
            F.pmod(F.xxhash64(F.col(snap.cluster_by)), F.lit(snap.n_buckets)).alias("b")
        ).distinct()
        return {r.b for r in out.collect()}

    # ---- MERGE INTO ---------------------------------------------------

    def merge(
        self,
        spark: SparkSession,
        changes: DataFrame,
        key_cols: list[str] | str,
        version_cols: list[str] | str,
        op_col: str = "op",
        delete_op: str = "delete",
        merge_schema: bool = False,
        max_retries: int = 0,
    ) -> int:
        """Apply CDC changes (MERGE INTO semantics) as one new snapshot.

        On a clustered store (single key column matching ``cluster_by``,
        per-file stats present), only the files whose [min, max] key
        range overlaps the change batch's key bounds are read, merged,
        and rewritten; every other file carries into the new manifest
        by reference. Unclustered stores fall back to a full rewrite.
        Returns the new version either way.

        ``max_retries`` > 0 turns on optimistic concurrency control
        (Delta-style conflict resolution): when another writer publishes
        first, the loser does NOT immediately fail. On the pruned
        (range/zorder) path it first attempts a manifest-level REBASE —
        if the winner's commits are provably disjoint (our rewritten
        files all survive untouched in the new head, no winner-added
        file's key range overlaps our change batch, and
        schema/layout/governance are unchanged), the already-written
        merge output republishes on top of the new head with ZERO
        recomputation and zero extra data I/O. Non-disjoint (or
        non-pruned-path) conflicts fall back to recomputing the merge
        against the new head, up to ``max_retries`` times total. A lost
        attempt's data directory stays orphaned until ``vacuum``/
        ``fsck`` (the same contract racing committers already have).
        Default 0 preserves the historical fail-fast behavior."""
        keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
        self._fold_pending_deletes(spark)
        parent = self.head_version()
        if parent is None:
            raise ValueError("merge requires an existing snapshot; commit first")
        snap = self.snapshot(parent)
        def _recompute_on_conflict(attempt):
            try:
                return attempt()
            except ConflictError:
                if max_retries <= 0:
                    raise
                return self.merge(
                    spark, changes, key_cols, version_cols, op_col,
                    delete_op, merge_schema=merge_schema,
                    max_retries=max_retries - 1,
                )

        key_matches = snap.cluster_by is not None and keys == [snap.cluster_by]
        if key_matches and snap.layout == "hash" and snap.has_buckets and snap.n_buckets:
            return _recompute_on_conflict(lambda: self._merge_hash(
                spark, snap, changes, keys[0], version_cols, op_col, delete_op,
                merge_schema=merge_schema,
            ))
        # A zorder/hilbert store prunes merges on its LEADING dimension
        # (its entries carry per-dimension stats instead of flat min/max).
        zorder_keyed = (
            snap.layout in ("zorder", "hilbert")
            and len(keys) == 1
            and snap.zorder_cols
            and keys[0] == snap.zorder_cols[0]
            and snap.has_dim_stats(keys[0])
        )
        pruned = (key_matches and snap.layout == "range" and snap.has_stats) or zorder_keyed
        if not pruned:
            merged = merge_into(
                self.read(spark, apply_policies=False), changes, key_cols, version_cols, op_col,
                delete_op, merge_schema=merge_schema,
            )
            # The full-rewrite fallback is still a MERGE, not a table
            # replacement: generated-column specs, governance policies,
            # and CHECK constraints must survive (and be enforced — the
            # commit validates against the dicts passed here) exactly as
            # they do on the pruned/hash paths via _inherited.
            return _recompute_on_conflict(lambda: self.commit(
                merged,
                mode="overwrite",
                cluster_by=snap.cluster_by,
                layout=snap.layout,
                target_files=snap.n_buckets or 8,
                generated=snap.generated,
                policies=snap.policies,
                constraints=snap.constraints,
            ))

        key = keys[0]

        def ebounds(e: dict) -> tuple:
            if zorder_keyed:
                return tuple(e["stats"][key])
            return e["min"], e["max"]

        bounds = changes.agg(
            F.min(key).alias("lo"), F.max(key).alias("hi")
        ).head()
        lo = bounds.lo.item() if hasattr(bounds.lo, "item") else bounds.lo
        hi = bounds.hi.item() if hasattr(bounds.hi, "item") else bounds.hi
        if lo is None:  # empty (or all-null-key) change batch
            touched, untouched = [], list(snap.entries)
        else:
            touched = [
                e
                for e in snap.entries
                if not (ebounds(e)[1] < lo or ebounds(e)[0] > hi)
            ]
            touched_paths = {e["path"] for e in touched}
            untouched = [
                e for e in snap.entries if e["path"] not in touched_paths
            ]
        if touched:
            # mergeSchema: touched files may straddle a schema evolution
            # (pre-widening files lack the newer columns).
            base = self._apply_renames(
                spark.read.option("mergeSchema", "true").parquet(
                    *[os.path.join(self.path, e["path"]) for e in touched]
                ),
                snap.renames,
                snap.dropped,
            )
        else:
            base = self.read(spark, parent, apply_policies=False).limit(0)
        merged = merge_into(
            base, changes, keys, version_cols, op_col, delete_op,
            merge_schema=merge_schema,
        )
        self._check_constraints(merged, snap.constraints)
        version = parent + 1
        if zorder_keyed:
            new_entries = self._write_data_zorder(
                merged, version, snap.zorder_cols, max(1, len(touched)),
                layout=snap.layout,
            )
        else:
            new_entries = self._write_data(
                merged, version, snap.cluster_by, max(1, len(touched))
            )
        try:
            self._publish(
                {
                    "version": version,
                    "parent": parent,
                    "mode": "merge",
                    "entries": untouched + new_entries,
                    "cluster_by": snap.cluster_by,
                    "schema": merged.schema.json(),
                    "layout": snap.layout,
                    "n_buckets": snap.n_buckets,
                    # carried (untouched) files still hold physical names
                    **_inherited(snap),
                }
            )
            return version
        except ConflictError:
            if max_retries <= 0:
                raise
            if lo is not None:
                rebased = self._rebase_merge(
                    snap,
                    {e["path"] for e in touched},
                    new_entries,
                    merged.schema.json(),
                    key,
                    lo,
                    hi,
                    zorder_keyed,
                    max_retries,
                )
                if rebased is not None:
                    return rebased
            return self.merge(
                spark, changes, key_cols, version_cols, op_col,
                delete_op, merge_schema=merge_schema,
                max_retries=max_retries - 1,
            )

    @staticmethod
    def _schema_core(schema_json: str | None):
        """Schema identity modulo nullability and metadata: merge_into
        legally relaxes `nullable` on untouched columns, which must not
        veto a rebase (the parquet bytes are unchanged); a name/type/
        structure difference still must."""
        if schema_json is None:
            return None

        def strip(node):
            if isinstance(node, dict):
                return {
                    k: strip(v)
                    for k, v in node.items()
                    if k not in ("nullable", "metadata", "containsNull",
                                 "valueContainsNull")
                }
            if isinstance(node, list):
                return [strip(x) for x in node]
            return node

        return strip(json.loads(schema_json))

    def _rebase_safe(
        self,
        parent: Snapshot,
        head: Snapshot,
        touched_paths: set,
        merged_schema_json: str,
        key: str,
        lo,
        hi,
        zorder_keyed: bool,
    ) -> bool:
        """True iff a lost pruned merge can republish on ``head``
        without recomputation. Disjointness is decided manifest-only:

        - every file we read+rewrote must survive IDENTICALLY in head
          (a winner compacting/rewriting any of them means our merge
          output is stale — its rows may now live elsewhere too);
        - no winner-ADDED file's key range may overlap our change
          batch's [lo, hi] (the merge should have read those rows);
          any parent file overlapping [lo, hi] was in our touched set,
          so a winner modifying our range necessarily trips one of
          these two checks;
        - schema, layout, clustering, and every inherited governance
          key (renames/generated/dropped/policies/constraints/
          tombstones) must be unchanged — a concurrent evolution or a
          new merge-on-read tombstone always forces recompute.
        """
        if (head.cluster_by, head.layout, head.n_buckets) != (
            parent.cluster_by, parent.layout, parent.n_buckets
        ):
            return False
        head_core = self._schema_core(head.schema_json)
        if head_core != self._schema_core(parent.schema_json):
            return False
        if head_core is not None and self._schema_core(merged_schema_json) != head_core:
            return False
        if _inherited(head) != _inherited(parent):
            return False
        head_paths = {e["path"] for e in head.entries}
        if not touched_paths <= head_paths:
            return False
        parent_paths = {e["path"] for e in parent.entries}
        for e in head.entries:
            if e["path"] in parent_paths:
                continue
            if zorder_keyed:
                b = (e.get("stats") or {}).get(key)
            else:
                b = (e.get("min"), e.get("max"))
                if b[0] is None or b[1] is None:
                    b = None
            if b is None or not (b[1] < lo or b[0] > hi):
                return False
        return True

    def _rebase_merge(
        self,
        parent: Snapshot,
        touched_paths: set,
        new_entries: list,
        merged_schema_json: str,
        key: str,
        lo,
        hi,
        zorder_keyed: bool,
        attempts: int,
    ) -> int | None:
        """Republish an already-written pruned merge on top of the
        current head (optimistic-concurrency winner path). Pure
        manifest surgery: head's entries minus the files we rewrote,
        plus our freshly-written replacements — no Spark job. Returns
        the new version, or None when the conflict is not provably
        disjoint (caller recomputes)."""
        for _ in range(max(1, attempts)):
            head_v = self.head_version()
            head = self.snapshot(head_v)
            if not self._rebase_safe(
                parent, head, touched_paths, merged_schema_json,
                key, lo, hi, zorder_keyed,
            ):
                return None
            version = head_v + 1
            try:
                self._publish(
                    {
                        "version": version,
                        "parent": head_v,
                        "mode": "merge",
                        "entries": [
                            e for e in head.entries
                            if e["path"] not in touched_paths
                        ] + new_entries,
                        "cluster_by": head.cluster_by,
                        "schema": head.schema_json or merged_schema_json,
                        "layout": head.layout,
                        "n_buckets": head.n_buckets,
                        "meta": {"rebased_from": parent.version},
                        **_inherited(head),
                    }
                )
                return version
            except ConflictError:
                continue  # lost again — re-check disjointness vs newer head
        return None

    def _rebase_append(
        self,
        parent: Snapshot,
        new_entries: list,
        schema_json: str,
        meta: dict | None,
        our_shape: tuple,
        attempts: int,
    ) -> int | None:
        """Republish a lost append on the current head. Appends only
        ADD files, so two racing appends are disjoint by construction;
        the rebase is vetoed only when the winner changed the table's
        shape — schema (modulo nullability), clustering/layout, or any
        inherited governance key including tombstones (a winner's
        merge-on-read delete must see our rows, so we recompute through
        the normal fold-first path instead). ``our_shape`` is the
        (cluster_by, layout, n_buckets) OUR append computed vs the
        parent — a head that already took the same mixed-layout
        downgrade (e.g. both racers appended unclustered files) is
        compatible, not a conflict."""
        for _ in range(max(1, attempts)):
            head_v = self.head_version()
            head = self.snapshot(head_v)
            head_shape = (head.cluster_by, head.layout, head.n_buckets)
            parent_shape = (parent.cluster_by, parent.layout, parent.n_buckets)
            if head_shape == parent_shape:
                publish_shape = our_shape
            elif head_shape == our_shape:
                publish_shape = our_shape
            else:
                return None
            if self._schema_core(head.schema_json) != self._schema_core(
                parent.schema_json
            ):
                return None
            if _inherited(head) != _inherited(parent):
                return None
            version = head_v + 1
            try:
                self._publish(
                    {
                        "version": version,
                        "parent": head_v,
                        "mode": "append",
                        "entries": head.entries + new_entries,
                        "cluster_by": publish_shape[0],
                        "schema": schema_json,
                        "meta": {**(meta or {}), "rebased_from": parent.version},
                        "layout": publish_shape[1],
                        "n_buckets": publish_shape[2],
                        **_inherited(head),
                    }
                )
                return version
            except ConflictError:
                continue
        return None

    def _merge_hash(
        self,
        spark: SparkSession,
        snap: Snapshot,
        changes: DataFrame,
        key: str,
        version_cols,
        op_col: str,
        delete_op: str,
        merge_schema: bool = False,
    ) -> int:
        """Bucket-pruned merge: only the buckets the change keys hash
        into are read, merged, and rewritten; every other bucket
        directory carries by reference. Works for ANY key distribution
        (no range assumption) — the merge footprint is exactly the
        affected buckets."""
        touched_buckets = {
            r.b
            for r in changes.select(
                F.coalesce(
                    F.pmod(F.xxhash64(F.col(key)), F.lit(snap.n_buckets)),
                    F.lit(0),  # null keys live in bucket 0 (see _write_data_hash)
                ).alias("b")
            )
            .distinct()
            .collect()
        }
        touched = [e for e in snap.entries if e["bucket"] in touched_buckets]
        untouched = [e for e in snap.entries if e["bucket"] not in touched_buckets]
        if touched:
            base = spark.read.option("mergeSchema", "true").parquet(
                *[os.path.join(self.path, e["path"]) for e in touched]
            )
            if "_bucket" in base.columns:
                base = base.drop("_bucket")
            base = self._apply_renames(base, snap.renames, snap.dropped)
        else:
            base = self.read(spark, snap.version, apply_policies=False).limit(0)
        merged = merge_into(
            base, changes, [key], version_cols, op_col, delete_op,
            merge_schema=merge_schema,
        )
        self._check_constraints(merged, snap.constraints)
        version = snap.version + 1
        new_entries = self._write_data_hash(
            merged, version, snap.cluster_by, snap.n_buckets
        )
        # merged rows can only hash into touched buckets, so new entries
        # never collide with carried ones
        self._publish(
            {
                "version": version,
                "parent": snap.version,
                "mode": "merge",
                "entries": untouched + new_entries,
                "cluster_by": snap.cluster_by,
                "schema": merged.schema.json(),
                "layout": "hash",
                "n_buckets": snap.n_buckets,
                **_inherited(snap),
            }
        )
        return version

    def replace_where(
        self,
        spark: SparkSession,
        df: DataFrame,
        predicate: str,
        key_bounds: tuple | None = None,
    ) -> int:
        """Delta ``replaceWhere``: atomically replace exactly the rows
        matching ``predicate`` with ``df`` — the selective-overwrite a
        partition refresh / backfill needs (rebuild one day, one
        source, one key band) without touching the rest of the table.

        Contract (same as Delta): every row of ``df`` must satisfy
        ``predicate``; a violating row raises before a byte is written.
        The result is one new snapshot holding ``(old rows WHERE NOT
        predicate) ∪ df`` — constraints are enforced on the rewritten
        footprint, and generated/governance/rename state carries like a
        merge (this is data management, not a table replacement).

        Scale shape: on a range-clustered store, pass ``key_bounds=(lo,
        hi)`` — any interval the predicate provably lies within on the
        cluster key — and only files whose [min, max] overlap it are
        read and rewritten (with ``NOT predicate``, so an over-wide
        bound costs a rewrite, never correctness); every other file
        carries into the new manifest by reference. A file wholly
        inside an exact bound filters to zero rows and vanishes without
        special-casing. Without bounds (or on hash/zorder layouts,
        whose file placement a row-level filter cannot preserve
        per-file) the rewrite is full, like unclustered merge.
        """
        self._fold_pending_deletes(spark)
        parent = self.head_version()
        if parent is None:
            raise ValueError("replace_where requires an existing snapshot")
        snap = self.snapshot(parent)
        logical = [f.name for f in self.read(spark, parent, apply_policies=False).schema.fields]
        if [f.name for f in df.schema.fields] != logical:
            raise ValueError(
                f"replacement schema {df.columns} != store schema {logical}"
            )
        bad = df.filter(f"NOT ({predicate})").limit(1).count()
        if bad:
            raise ValueError(
                f"replacement rows do not all satisfy {predicate!r} — "
                "replaceWhere refuses to write rows outside the target"
            )
        pruned = (
            snap.layout == "range"
            and snap.has_stats
            and snap.cluster_by is not None
            and key_bounds is not None
        )
        if not pruned:
            base = self.read(spark, parent, apply_policies=False)
            out = base.filter(f"NOT ({predicate})").unionByName(df)
            return self.commit(
                out,
                mode="overwrite",
                cluster_by=snap.cluster_by,
                layout=snap.layout,
                target_files=snap.n_buckets or 8,
                generated=snap.generated,
                policies=snap.policies,
                constraints=snap.constraints,
            )
        lo, hi = key_bounds
        touched = [
            e for e in snap.entries if not (e["max"] < lo or e["min"] > hi)
        ]
        touched_paths = {e["path"] for e in touched}
        untouched = [e for e in snap.entries if e["path"] not in touched_paths]
        if not touched and df.isEmpty():
            return parent  # nothing overlaps, nothing to add: no-op
        if touched:
            base = self._apply_renames(
                spark.read.option("mergeSchema", "true").parquet(
                    *[os.path.join(self.path, e["path"]) for e in touched]
                ),
                snap.renames,
                snap.dropped,
            ).filter(f"NOT ({predicate})")
            out = base.select(*logical).unionByName(df.select(*logical))
        else:
            out = df.select(*logical)
        self._check_constraints(out, snap.constraints)
        version = parent + 1
        new_entries = self._write_data(
            out, version, snap.cluster_by, max(1, len(touched))
        )
        self._publish(
            {
                "version": version,
                "parent": parent,
                "mode": "replace_where",
                "entries": untouched + new_entries,
                "cluster_by": snap.cluster_by,
                "schema": out.schema.json(),
                "layout": snap.layout,
                "n_buckets": snap.n_buckets,
                **_inherited(snap),
            }
        )
        return version

    def delete_where(
        self,
        spark: SparkSession,
        predicate: str,
        key_bounds: tuple | None = None,
    ) -> int:
        """Delta ``DELETE FROM ... WHERE``: remove exactly the rows
        matching ``predicate`` — ``replace_where`` with an empty
        replacement, so it inherits the whole contract: atomic commit,
        constraint/governance/generated state carried, and on a
        range-clustered store with ``key_bounds`` only overlapping
        files are read and rewritten (a file wholly inside an exact
        bound vanishes; every other file carries by reference). Bytes
        remain until ``vacuum()`` — deletion is a manifest event, which
        is what keeps it O(footprint) and time travel intact."""
        parent = self.head_version()
        if parent is None:
            raise ValueError("delete_where requires an existing snapshot")
        schema = self.read(spark, parent, apply_policies=False).schema
        empty = spark.createDataFrame([], schema)
        return self.replace_where(spark, empty, predicate, key_bounds)

    def delete_where_mor(
        self,
        spark: SparkSession,
        predicate: str,
        key_cols: list[str] | str | None = None,
    ) -> int:
        """Merge-on-read DELETE (Delta deletion-vector analog): commit
        the delete WITHOUT rewriting a single data file. The matched
        rows' keys are written as a tiny tombstone parquet (O(|matched|)
        bytes) and the new manifest references the SAME data entries
        plus the tombstone; every read anti-joins the tombstoned keys
        out. This is what makes a point delete on a 100 TB table a
        kilobyte-sized commit — copy-on-write ``delete_where`` pays a
        rewrite of every touched FILE even for a one-row delete.

        Contract (documented restriction matrix, like early Delta DV):

        - ``key_cols`` (default: the cluster key) must identify rows
          uniquely — the store's CDC key. The anti-join is by key, so a
          non-unique key would over-delete.
        - Reads, time travel, ``diff``, metadata-only commits
          (restore / policies / constraints / rename or drop of OTHER
          columns) compose with pending tombstones.
        - The next DATA write (append / merge / replace_where /
          update_where / compact / forget) first folds pending
          tombstones into a materialized rewrite
          (``materialize_deletes``) — so carried-by-reference files can
          never resurrect deleted rows, and a later insert of a
          tombstoned key is a NEW visible row. Delta folds per-file;
          this stand-in folds wholesale at the next write.
        - Accumulating MOR deletes must share one key set.

        Returns the new version (or the head unchanged when nothing
        matched — an empty delete publishes nothing)."""
        import shutil

        parent = self.head_version()
        if parent is None:
            raise ValueError("delete_where_mor requires an existing snapshot")
        snap = self.snapshot(parent)
        if key_cols is None:
            if not snap.cluster_by or snap.layout in ("zorder", "hilbert"):
                raise ValueError(
                    "delete_where_mor needs key_cols on an unclustered or "
                    "zorder/hilbert store (the cluster key is the default "
                    "only for range/hash layouts)"
                )
            keys = [snap.cluster_by]
        else:
            keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
        prior = snap.tombstones
        if prior.get("entries") and prior.get("key") != keys:
            raise ValueError(
                f"pending tombstones use key {prior.get('key')}; a new "
                f"merge-on-read delete must use the same key (got {keys}) "
                "or materialize_deletes() first"
            )
        matched = (
            self.read(spark, parent, apply_policies=False)  # honors prior tombstones
            .filter(F.expr(predicate))
            .select(*keys)
            .dropDuplicates(keys)
        )
        data_root = os.path.join(self.path, "data")
        os.makedirs(data_root, exist_ok=True)
        data_abs = tempfile.mkdtemp(prefix=f"v{parent + 1}-del-", dir=data_root)
        matched.coalesce(1).write.mode("overwrite").parquet(data_abs)
        import pyarrow.parquet as pq

        new_entries = [
            {"path": os.path.relpath(os.path.join(data_abs, n), self.path)}
            for n in sorted(os.listdir(data_abs))
            if n.endswith(".parquet")
            and not n.startswith(("_", "."))
            # footer-only row count: drop the zero-row part Spark
            # writes for an empty match (no second scan of the table)
            and pq.ParquetFile(os.path.join(data_abs, n)).metadata.num_rows > 0
        ]
        if not new_entries:  # nothing matched: no version, no orphan dir
            shutil.rmtree(data_abs)
            return parent
        self._publish(
            {
                "version": parent + 1,
                "parent": parent,
                "mode": "delete_mor",
                "entries": snap.entries,
                "cluster_by": snap.cluster_by,
                "schema": snap.schema_json,
                "meta": {"predicate": predicate},
                "layout": snap.layout,
                "n_buckets": snap.n_buckets,
                **{
                    **_inherited(snap),
                    "tombstones": {
                        "key": keys,
                        "entries": list(prior.get("entries") or []) + new_entries,
                    },
                },
            }
        )
        return parent + 1

    def materialize_deletes(self, spark: SparkSession) -> int | None:
        """Fold pending merge-on-read tombstones into a real rewrite
        (the OPTIMIZE that clears deletion vectors): reads the head —
        which applies the tombstones — and commits the result as an
        overwrite preserving layout, clustering, generated columns,
        governance, and constraints. No-op when nothing is pending."""
        parent = self.head_version()
        if parent is None:
            return None
        snap = self.snapshot(parent)
        if not snap.tombstones.get("entries"):
            return parent
        out = self.read(spark, parent, apply_policies=False)
        return self.commit(
            out,
            mode="overwrite",
            cluster_by=snap.cluster_by,
            layout=snap.layout,
            target_files=snap.n_buckets or 8,
            generated=snap.generated,
            policies=snap.policies,
            constraints=snap.constraints,
        )

    def _fold_pending_deletes(self, spark: SparkSession) -> None:
        """Every data-REWRITE path calls this first: raw file reads and
        carried-by-reference entries are only sound against a head with
        no pending merge-on-read deletes."""
        head = self.head_version()
        if head is not None and self.snapshot(head).tombstones.get("entries"):
            self.materialize_deletes(spark)

    def update_where(
        self,
        spark: SparkSession,
        set_cols: dict[str, str],
        predicate: str,
        key_bounds: tuple | None = None,
    ) -> int:
        """Delta ``UPDATE ... SET ... WHERE``: rewrite matching rows
        with ``set_cols`` (column -> SQL expression over the old row),
        leaving the rest byte-identical. Unlike ``replace_where`` the
        post-image need NOT satisfy the predicate (an UPDATE may move a
        row out of its own WHERE clause), so the rewrite applies
        ``CASE WHEN predicate THEN expr ELSE old END`` per column to the
        touched footprint — no union, no replacement validation.

        Scale shape: with ``key_bounds`` on a range-clustered store only
        overlapping files rewrite, the rest carry by reference — BUT the
        cluster key itself refuses to be updated on the pruned path
        (rewritten rows would leave their file's [min, max] band and
        break pruning soundness); updating the cluster key falls back to
        the full rewrite, like unclustered merge."""
        self._fold_pending_deletes(spark)
        parent = self.head_version()
        if parent is None:
            raise ValueError("update_where requires an existing snapshot")
        snap = self.snapshot(parent)
        logical = [
            f.name
            for f in self.read(spark, parent, apply_policies=False).schema.fields
        ]
        unknown = set(set_cols) - set(logical)
        if unknown:
            raise ValueError(f"update_where: unknown columns {sorted(unknown)}")
        pruned = (
            snap.layout == "range"
            and snap.has_stats
            and snap.cluster_by is not None
            and key_bounds is not None
            and snap.cluster_by not in set_cols
        )

        def _updated(base: DataFrame) -> DataFrame:
            return base.select(
                *[
                    F.expr(
                        f"CASE WHEN ({predicate}) THEN ({set_cols[c]}) "
                        f"ELSE `{c}` END"
                    ).alias(c)
                    if c in set_cols
                    else F.col(c)
                    for c in logical
                ]
            )

        if not pruned:
            out = _updated(self.read(spark, parent, apply_policies=False))
            return self.commit(
                out,
                mode="overwrite",
                cluster_by=snap.cluster_by,
                layout=snap.layout,
                target_files=snap.n_buckets or 8,
                generated=snap.generated,
                policies=snap.policies,
                constraints=snap.constraints,
            )
        lo, hi = key_bounds
        touched = [
            e for e in snap.entries if not (e["max"] < lo or e["min"] > hi)
        ]
        touched_paths = {e["path"] for e in touched}
        untouched = [e for e in snap.entries if e["path"] not in touched_paths]
        if not touched:
            return parent  # nothing overlaps: no-op, no new snapshot
        base = self._apply_renames(
            spark.read.option("mergeSchema", "true").parquet(
                *[os.path.join(self.path, e["path"]) for e in touched]
            ),
            snap.renames,
            snap.dropped,
        ).select(*logical)
        out = _updated(base)
        self._check_constraints(out, snap.constraints)
        version = parent + 1
        new_entries = self._write_data(
            out, version, snap.cluster_by, max(1, len(touched))
        )
        self._publish(
            {
                "version": version,
                "parent": parent,
                "mode": "update_where",
                "entries": untouched + new_entries,
                "cluster_by": snap.cluster_by,
                "schema": out.schema.json(),
                "layout": snap.layout,
                "n_buckets": snap.n_buckets,
                **_inherited(snap),
            }
        )
        return version

    def diff(
        self, spark: SparkSession, from_version: int, to_version: int
    ) -> DataFrame:
        """Change data feed between two snapshots: full-row set diff,
        rows only in ``to_version`` tagged ``added``, rows only in
        ``from_version`` tagged ``removed`` (an update appears as one of
        each — the caller can pair them on the key). Computed from the
        retained snapshots alone, no change log needed. Files present in
        BOTH manifests (carried by reference through pruned merges)
        cancel out of the diff by construction, so only the rewritten
        footprint is compared."""
        a_snap, b_snap = self.snapshot(from_version), self.snapshot(to_version)
        if a_snap.tombstones.get("entries") or b_snap.tombstones.get("entries"):
            # A merge-on-read delete changes NO data entries, so the
            # file-level diff below would miss it; fall back to a full
            # logical diff through read() (which applies tombstones).
            # O(both snapshots) — only paid while tombstones pend.
            a_full = self.read(spark, from_version, apply_policies=False)
            b_full = self.read(spark, to_version, apply_policies=False)
            return b_full.exceptAll(a_full).withColumn(
                "change_type", F.lit("added")
            ).unionByName(
                a_full.exceptAll(b_full).withColumn("change_type", F.lit("removed"))
            )
        a_paths = {e["path"] for e in a_snap.entries}
        b_paths = {e["path"] for e in b_snap.entries}
        only_a = sorted(a_paths - b_paths)
        only_b = sorted(b_paths - a_paths)
        if not only_a and not only_b:
            empty = self.read(spark, from_version, apply_policies=False).limit(0)
            return empty.withColumn("change_type", F.lit(""))

        def _read(paths: list[str], version: int) -> DataFrame:
            if not paths:
                return self.read(spark, version, apply_policies=False).limit(0)
            # Both sides align on the TO-version's logical names:
            # rename maps compose forward, so the newest map covers
            # physical names from either snapshot's files.
            return self._apply_renames(
                spark.read.option("mergeSchema", "true").parquet(
                    *[os.path.join(self.path, p) for p in paths]
                ),
                b_snap.renames,
                b_snap.dropped,
            )

        a = _read(only_a, from_version)
        b = _read(only_b, to_version)
        return b.exceptAll(a).withColumn(
            "change_type", F.lit("added")
        ).unionByName(
            a.exceptAll(b).withColumn("change_type", F.lit("removed"))
        )

    def read_changes(
        self,
        spark: SparkSession,
        from_version: int,
        to_version: int,
        key_cols: list[str] | str | None = None,
    ) -> DataFrame:
        """Keyed change data feed — Delta ``table_changes()`` parity.

        One row per row-level change in ``(from_version, to_version]``,
        with ``_change_type`` in {insert, delete, update_preimage,
        update_postimage} and ``_commit_version`` attributing each
        change to the commit that made it. Built purely from retained
        snapshots (no change log): per commit step, the set-level
        :meth:`diff` (which reads only the REWRITTEN file footprint —
        files carried by reference cancel by construction) splits into
        added/removed rows, and one full-outer join on the key
        classifies them — key only on the added side is an insert, only
        on the removed side a delete, both sides an update pre/post
        pair. Requires the key to be unique per snapshot (the same
        precondition MERGE itself maintains). A rewrite that lands a
        byte-identical row cancels out of the set diff, so no-op
        rewrites (compaction, zorder) produce NO feed rows — by design.
        ``key_cols`` defaults to the store's cluster key.

        Scale shape: per commit, one join keyed on the changed rows
        only; commits process independently and union. At 100 TB the
        cost tracks the churn, never the table.

        Vacuum interplay: vacuum drops a PREFIX of history, so a range
        whose ``from_version`` is still retained always has every
        intermediate manifest too; asking for a vacuumed
        ``from_version`` fails loudly on the missing manifest (Delta's
        CDF has the same contract when change files are vacuumed).

        Reference analog: the flashback direction of this feed is the
        reference's whole reason to exist (log2sql.py:137-160);
        :func:`invert_changes` + :meth:`merge` below turn this feed
        back into the reference's rollback, transactionally.
        """
        if key_cols is None:
            head = self.snapshot(to_version)
            if head.cluster_by is None:
                raise ValueError("store has no cluster key; pass key_cols=")
            key_cols = [head.cluster_by]
        keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
        steps = [
            v for v in self.versions() if from_version < v <= to_version
        ]
        if not steps:
            raise ValueError(
                f"no commits in ({from_version}, {to_version}]"
            )
        out: DataFrame | None = None
        prev = from_version
        for i, v in enumerate(steps):
            d = self.diff(spark, prev, v)
            data_cols = [c for c in d.columns if c != "change_type"]
            non_keys = [c for c in data_cols if c not in keys]
            added = d.filter(F.col("change_type") == "added").select(
                *keys, F.struct(*non_keys).alias("_post")
            )
            removed = d.filter(F.col("change_type") == "removed").select(
                *keys, F.struct(*non_keys).alias("_pre")
            )
            joined = removed.join(added, on=keys, how="full_outer")
            pre, post = F.col("_pre"), F.col("_post")
            changes = (
                F.when(
                    pre.isNull(),
                    F.array(F.struct(post.alias("row"), F.lit("insert").alias("t"))),
                )
                .when(
                    post.isNull(),
                    F.array(F.struct(pre.alias("row"), F.lit("delete").alias("t"))),
                )
                .otherwise(
                    F.array(
                        F.struct(pre.alias("row"), F.lit("update_preimage").alias("t")),
                        F.struct(post.alias("row"), F.lit("update_postimage").alias("t")),
                    )
                )
            )
            step = joined.select(
                *keys, F.explode(changes).alias("_ch")
            ).select(
                *keys,
                *[F.col(f"_ch.row.{c}").alias(c) for c in non_keys],
                F.col("_ch.t").alias("_change_type"),
                F.lit(v).cast("long").alias("_commit_version"),
            )
            out = step if out is None else out.unionByName(step)
            prev = v
            # Bound driver-side plan growth on long histories: the
            # per-commit union nests one join+explode subtree per step,
            # and Catalyst analysis cost grows superlinearly with plan
            # depth. Every _CDF_CHECKPOINT_EVERY commits the accumulated
            # feed's lineage is truncated with a LAZY localCheckpoint —
            # no computation happens here; on first action the prefix
            # materializes once to executor-local blocks and the
            # downstream plan re-roots on a compact leaf. A 500-commit
            # feed then analyzes as ~16 shallow plans instead of one
            # 500-deep tree.
            #
            # Checkpoint reliability: localCheckpoint stores
            # NON-replicated executor-local blocks and severs the
            # recompute lineage, so on a multi-executor cluster an
            # executor loss mid-action would fail the whole CDF job
            # instead of recomputing. When the session has a reliable
            # checkpoint directory configured (sc.setCheckpointDir),
            # use df.checkpoint — blocks land on shared storage and
            # survive executor loss. localCheckpoint remains the
            # fallback (correct in local mode; on a cluster without a
            # checkpoint dir, executor loss aborts a long-history
            # read_changes and the caller re-runs it).
            if len(steps) > _CDF_CHECKPOINT_EVERY and (
                i + 1
            ) % _CDF_CHECKPOINT_EVERY == 0:
                sc = out.sparkSession.sparkContext
                if sc.getCheckpointDir() is not None:
                    out = out.checkpoint(eager=False)
                else:
                    out = out.localCheckpoint(eager=False)
        return out

    def flashback_to(
        self,
        spark: SparkSession,
        version: int,
        key_cols: list[str] | str | None = None,
    ) -> int:
        """Row-level flashback: undo every change since ``version`` by
        MERGING the inverted change feed — the reference's ``-B`` mode
        (log2sql.py:137-160, including the reverse-order README TODO)
        executed transactionally against the store instead of printed
        as SQL text. Unlike :meth:`restore` (metadata pointer rewind),
        this pays only for the churned rows and leaves an auditable
        forward commit; the final state is identical to the restored
        snapshot (pytest hash-asserts both paths agree)."""
        head = self.head_version()
        if head is None or head <= version:
            raise ValueError(f"nothing to flash back: head={head}")
        if key_cols is None:
            snap = self.snapshot(head)
            if snap.cluster_by is None:
                raise ValueError("store has no cluster key; pass key_cols=")
            key_cols = [snap.cluster_by]
        keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
        cdf = self.read_changes(spark, version, head, key_cols=keys)
        return self.merge(
            spark,
            invert_changes(cdf, keys),
            key_cols=keys if len(keys) > 1 else keys[0],
            version_cols="_seq",
        )

    # ---- maintenance --------------------------------------------------

    def restore(self, version: int) -> int:
        """Make an earlier snapshot current again (Delta ``RESTORE TABLE
        ... TO VERSION AS OF`` semantics): publishes a NEW head commit
        whose entries/schema/layout mirror ``version`` — data files are
        referenced, never copied, so restore is a metadata-only O(1)
        operation, it is itself time-travel-visible (the mistaken
        versions stay readable), and the normal optimistic-concurrency
        publish applies. Raises if ``version``'s files were already
        vacuumed (fsck) — a restore must never resurrect a manifest
        whose data is gone."""
        snap = self.snapshot(version)  # KeyError/FileNotFound if absent
        missing = self.fsck(version)
        if missing:
            raise ValueError(
                f"cannot restore v{version}: {len(missing)} data file(s) "
                f"vacuumed, e.g. {missing[0]}"
            )
        head = self.head_version()
        self._publish(
            {
                "version": head + 1,
                "parent": head,
                "mode": "restore",
                "entries": snap.entries,
                "cluster_by": snap.cluster_by,
                "schema": snap.schema_json,
                "meta": {"restored_from": version},
                "layout": snap.layout,
                "n_buckets": snap.n_buckets,
                **_inherited(snap),
            }
        )
        return head + 1

    def rename_column(self, old: str, new: str) -> int:
        """Metadata-only column rename (Delta column mapping, 'name'
        mode): publishes a new head whose schema carries ``new`` and
        whose manifest records the physical→logical map — zero bytes of
        data rewritten, O(1) regardless of table size. Old files keep
        the physical name; ``read`` reconciles (see _apply_renames).
        Post-rename appends/merges write the logical name directly, so
        the store self-heals toward physical==logical as files churn;
        ``compact()`` materializes the rename everywhere at once.
        Chained renames compose into a single physical→logical hop.
        The cluster key and per-file stats keys follow the rename, so
        file pruning keeps working across it."""
        head = self.head_version()
        if head is None:
            raise ValueError("rename_column on an empty store")
        snap = self.snapshot(head)
        if old in (snap.tombstones.get("key") or []):
            raise ValueError(
                f"column {old!r} keys pending merge-on-read deletes; "
                "materialize_deletes() before renaming it"
            )
        schema = T.StructType.fromJson(json.loads(snap.schema_json))
        if old not in schema.names:
            raise ValueError(f"no column {old!r}; have {schema.names}")
        if new in schema.names:
            raise ValueError(f"column {new!r} already exists")
        # Compose: every physical generation whose logical face is
        # `old` now points at `new` — including files written while the
        # column was LITERALLY named `old` (post-rename appends write
        # the then-current logical name, so each rename adds a physical
        # generation). Identity mappings drop out (rename-back).
        renames = {
            p: (new if log == old else log) for p, log in snap.renames.items()
        }
        if old not in renames:
            renames[old] = new
        renames = {p: log for p, log in renames.items() if p != log}
        if new in renames:
            raise ValueError(
                f"{new!r} is the physical name of another renamed "
                "column; compact() first to materialize that rename"
            )
        if new in snap.dropped:
            raise ValueError(
                f"{new!r} was dropped and its values are still in old "
                "files; compact() first to rewrite them out"
            )
        import re as _re

        generated = {}
        for gcol, gexpr in snap.generated.items():
            if _re.search(rf"\b{_re.escape(old)}\b", gexpr):
                raise ValueError(
                    f"column {old!r} is referenced by generated column "
                    f"{gcol!r} ({gexpr!r}); renaming would break the "
                    "derivation — drop or redefine the generated column "
                    "first"
                )
            generated[new if gcol == old else gcol] = gexpr
        pol_exprs = list(snap.policies.get("masks", {}).values()) + (
            [snap.policies["row_filter"]] if "row_filter" in snap.policies else []
        )
        if any(_re.search(rf"\b{_re.escape(old)}\b", e) for e in pol_exprs):
            raise ValueError(
                f"column {old!r} is referenced by a read policy "
                "(mask/row filter); drop or redefine the policy first"
            )
        if old in snap.policies.get("masks", {}):
            masks = dict(snap.policies["masks"])
            masks[new] = masks.pop(old)
            snap.policies = {**snap.policies, "masks": masks}
        if any(
            _re.search(rf"\b{_re.escape(old)}\b", c)
            for c in snap.constraints.values()
        ):
            raise ValueError(
                f"column {old!r} is referenced by a CHECK constraint; "
                "drop the constraint first"
            )
        new_fields = [
            T.StructField(new, f.dataType, f.nullable, f.metadata)
            if f.name == old
            else f
            for f in schema.fields
        ]
        cluster_by = snap.cluster_by
        if cluster_by:
            cluster_by = ",".join(
                new if c == old else c for c in cluster_by.split(",")
            )
        entries = []
        for e in snap.entries:
            if e.get("stats") and old in e["stats"]:
                stats = {new if c == old else c: v for c, v in e["stats"].items()}
                e = {**e, "stats": stats}
            entries.append(e)
        self._publish(
            {
                "version": head + 1,
                "parent": head,
                "mode": "rename",
                "entries": entries,
                "cluster_by": cluster_by,
                "schema": T.StructType(new_fields).json(),
                "meta": {"renamed": [old, new]},
                "layout": snap.layout,
                "n_buckets": snap.n_buckets,
                "renames": renames,
                "generated": generated,
                "dropped": snap.dropped,
                "policies": snap.policies,
                "constraints": snap.constraints,
                "tombstones": snap.tombstones,
            }
        )
        return head + 1

    def drop_column(self, col: str) -> int:
        """Metadata-only DROP COLUMN (Delta analog): publishes a new
        head whose schema omits ``col``; the manifest records every
        physical generation of the column and reads exclude them. Zero
        bytes rewritten — the values stay in the files, invisible,
        until ``compact()`` physically removes them (so like Delta,
        DROP is logical until the next rewrite; run compact+vacuum for
        erasure guarantees, or ``forget()`` for keyed erasure). The
        cluster key and generated-referenced columns refuse to drop."""
        head = self.head_version()
        if head is None:
            raise ValueError("drop_column on an empty store")
        snap = self.snapshot(head)
        if col in (snap.tombstones.get("key") or []):
            raise ValueError(
                f"column {col!r} keys pending merge-on-read deletes; "
                "materialize_deletes() before dropping it"
            )
        schema = T.StructType.fromJson(json.loads(snap.schema_json))
        if col not in schema.names:
            raise ValueError(f"no column {col!r}; have {schema.names}")
        cluster_cols = (snap.cluster_by or "").split(",")
        if col in cluster_cols:
            raise ValueError(
                f"{col!r} is the cluster key; re-cluster (commit with a "
                "different cluster_by) before dropping it"
            )
        import re as _re

        for gcol, gexpr in snap.generated.items():
            if gcol != col and _re.search(rf"\b{_re.escape(col)}\b", gexpr):
                raise ValueError(
                    f"column {col!r} is referenced by generated column "
                    f"{gcol!r} ({gexpr!r}); drop that first"
                )
        generated = {g: e for g, e in snap.generated.items() if g != col}
        other_exprs = [
            e for c, e in snap.policies.get("masks", {}).items() if c != col
        ] + ([snap.policies["row_filter"]] if "row_filter" in snap.policies else [])
        if any(_re.search(rf"\b{_re.escape(col)}\b", e) for e in other_exprs):
            raise ValueError(
                f"column {col!r} is referenced by a read policy "
                "(mask/row filter); drop or redefine the policy first"
            )
        if col in snap.policies.get("masks", {}):
            snap.policies = {
                **snap.policies,
                "masks": {
                    c: e for c, e in snap.policies["masks"].items() if c != col
                },
            }
        if any(
            _re.search(rf"\b{_re.escape(col)}\b", c)
            for c in snap.constraints.values()
        ):
            raise ValueError(
                f"column {col!r} is referenced by a CHECK constraint; "
                "drop the constraint first"
            )
        # every physical name that currently surfaces as `col`
        phys = [p for p, log in snap.renames.items() if log == col] or []
        if col not in snap.renames:  # files written under the literal name
            phys.append(col)
        renames = {p: log for p, log in snap.renames.items() if log != col}
        dropped = list(snap.dropped) + [p for p in phys if p not in snap.dropped]
        self._publish(
            {
                "version": head + 1,
                "parent": head,
                "mode": "drop",
                "entries": snap.entries,
                "cluster_by": snap.cluster_by,
                "schema": T.StructType(
                    [f for f in schema.fields if f.name != col]
                ).json(),
                "meta": {"dropped_column": col},
                "layout": snap.layout,
                "n_buckets": snap.n_buckets,
                "renames": renames,
                "generated": generated,
                "dropped": dropped,
                "policies": snap.policies,
                "constraints": snap.constraints,
                "tombstones": snap.tombstones,
            }
        )
        return head + 1

    def _publish_policies(self, snap: Snapshot, policies: dict, meta: dict) -> int:
        self._publish(
            {
                "version": snap.version + 1,
                "parent": snap.version,
                "mode": "policy",
                "entries": snap.entries,
                "cluster_by": snap.cluster_by,
                "schema": snap.schema_json,
                "meta": meta,
                "layout": snap.layout,
                "n_buckets": snap.n_buckets,
                "renames": snap.renames,
                "generated": snap.generated,
                "dropped": snap.dropped,
                "policies": policies,
                "constraints": snap.constraints,
                "tombstones": snap.tombstones,
            }
        )
        return snap.version + 1

    def set_mask(self, col: str, expr: str) -> int:
        """Read-time column mask (Delta/Unity column-mask analog):
        governed ``read()`` calls return ``expr`` in place of the raw
        value — e.g. ``"concat(substr(email, 1, 2), '***')"`` or a
        NULL-out. Metadata-only, versioned with the snapshot (time
        travel shows each version under ITS policy), and enforced on
        pruned reads too. Maintenance paths (merge/compact) keep the
        raw values, like a table owner. The cluster key refuses a mask:
        pruned lookups compare caller-supplied raw keys to file stats,
        and a masked key would make that contract unreadable."""
        head = self.head_version()
        if head is None:
            raise ValueError("set_mask on an empty store")
        snap = self.snapshot(head)
        schema = T.StructType.fromJson(json.loads(snap.schema_json))
        if col not in schema.names:
            raise ValueError(f"no column {col!r}; have {schema.names}")
        if col in (snap.cluster_by or "").split(","):
            raise ValueError(f"{col!r} is the cluster key; masks would break pruned lookups")
        policies = {**snap.policies, "masks": {**snap.policies.get("masks", {}), col: expr}}
        return self._publish_policies(snap, policies, {"set_mask": [col, expr]})

    def drop_mask(self, col: str) -> int:
        head = self.head_version()
        snap = self.snapshot(head)
        masks = dict(snap.policies.get("masks", {}))
        if col not in masks:
            raise ValueError(f"no mask on {col!r}")
        del masks[col]
        policies = {**snap.policies, "masks": masks}
        return self._publish_policies(snap, policies, {"drop_mask": col})

    def set_row_filter(self, predicate: str) -> int:
        """Read-time row filter (row-level security): governed reads
        see only rows where ``predicate`` holds — evaluated on the RAW
        values, before masks, Delta's order. Metadata-only and
        versioned like masks."""
        head = self.head_version()
        if head is None:
            raise ValueError("set_row_filter on an empty store")
        snap = self.snapshot(head)
        policies = {**snap.policies, "row_filter": predicate}
        return self._publish_policies(snap, policies, {"set_row_filter": predicate})

    def drop_row_filter(self) -> int:
        head = self.head_version()
        snap = self.snapshot(head)
        if "row_filter" not in snap.policies:
            raise ValueError("no row filter set")
        policies = {k: v for k, v in snap.policies.items() if k != "row_filter"}
        return self._publish_policies(snap, policies, {"drop_row_filter": True})

    def add_constraint(self, spark: SparkSession, name: str, predicate: str) -> int:
        """Persistent CHECK constraint (Delta ``ALTER TABLE ADD
        CONSTRAINT``): validated against the EXISTING rows first (like
        Delta — you cannot declare a check the current data violates),
        then recorded in the manifest so every future commit and merge
        enforces it before a byte is published. Standard SQL CHECK
        semantics: a NULL predicate passes."""
        head = self.head_version()
        if head is None:
            raise ValueError("add_constraint on an empty store")
        snap = self.snapshot(head)
        if name in snap.constraints:
            raise ValueError(f"constraint {name!r} already exists")
        self._check_constraints(
            self.read(spark, apply_policies=False), {name: predicate}
        )
        constraints = {**snap.constraints, name: predicate}
        self._publish(
            {
                "version": head + 1,
                "parent": head,
                "mode": "constraint",
                "entries": snap.entries,
                "cluster_by": snap.cluster_by,
                "schema": snap.schema_json,
                "meta": {"add_constraint": [name, predicate]},
                "layout": snap.layout,
                "n_buckets": snap.n_buckets,
                **{**_inherited(snap), "constraints": constraints},
            }
        )
        return head + 1

    def drop_constraint(self, name: str) -> int:
        head = self.head_version()
        snap = self.snapshot(head)
        if name not in snap.constraints:
            raise ValueError(f"no constraint {name!r}; have {list(snap.constraints)}")
        constraints = {k: v for k, v in snap.constraints.items() if k != name}
        self._publish(
            {
                "version": head + 1,
                "parent": head,
                "mode": "constraint",
                "entries": snap.entries,
                "cluster_by": snap.cluster_by,
                "schema": snap.schema_json,
                "meta": {"drop_constraint": name},
                "layout": snap.layout,
                "n_buckets": snap.n_buckets,
                **{**_inherited(snap), "constraints": constraints},
            }
        )
        return head + 1

    def clone_to(self, dest_path: str, version: int | None = None) -> "SnapshotStore":
        """Shallow clone (Delta ``CREATE TABLE ... SHALLOW CLONE``): a
        new store whose v1 manifest references this store's data files
        by ABSOLUTE path — zero bytes copied, O(manifest) regardless of
        table size. The clone then evolves independently: its commits
        write clone-owned files; borrowed entries are recognized by
        their absolute paths and are never owned, so ``vacuum`` /
        ``forget`` on the clone can never delete source data (and,
        symmetrically, cannot ERASE it — a clone needing physical
        erasure of source rows must ``compact()`` first to deep-copy).
        Vacuuming the SOURCE can invalidate a clone, exactly as in
        Delta — coordinate retention or compact the clone."""
        v = self.head_version() if version is None else version
        if v is None:
            raise ValueError("clone of an empty store")
        missing = self.fsck(v)
        if missing:
            raise ValueError(
                f"cannot clone v{v}: {len(missing)} data file(s) vacuumed, "
                f"e.g. {missing[0]}"
            )
        dest = SnapshotStore(dest_path)
        if dest.head_version() is not None:
            raise ValueError(f"clone target {dest_path} is not empty")
        snap = self.snapshot(v)
        src_root = os.path.abspath(self.path)
        entries = [
            {**e, "path": os.path.join(src_root, e["path"])}
            for e in snap.entries
        ]
        # pending merge-on-read tombstones are borrowed absolutely like
        # the data they mask — the clone reads the same post-delete
        # state, and (being absolute) they are never clone-owned
        tomb = snap.tombstones
        if tomb.get("entries"):
            tomb = {
                **tomb,
                "entries": [
                    {**e, "path": os.path.join(src_root, e["path"])}
                    for e in tomb["entries"]
                ],
            }
        dest._publish(
            {
                "version": 1,
                "parent": None,
                "mode": "clone",
                "entries": entries,
                "cluster_by": snap.cluster_by,
                "schema": snap.schema_json,
                "meta": {"cloned_from": src_root, "source_version": v},
                "layout": snap.layout,
                "n_buckets": snap.n_buckets,
                **{**_inherited(snap), "tombstones": tomb},
            }
        )
        return dest

    def compact(
        self, spark: SparkSession, target_files: int = 8, max_retries: int = 0,
    ) -> int:
        """Rewrite the head snapshot into ``target_files`` files (keeping
        the cluster layout if any) — the small-file compaction every
        streaming-ingest table needs; appears as a normal overwrite
        commit, so it is time-travel-safe and atomic like any other.

        Also the explicit way to fold pending merge-on-read deletes
        (it rewrites from read(), which applies them; the fresh
        manifest carries no tombstones).

        ``max_retries`` > 0: optimistic concurrency for OPTIMIZE racing
        live writers. A compaction is a DERIVED rewrite, so a lost race
        must never blind-retry the stale DataFrame (that would erase
        the winner's rows) — each retry RE-DERIVES from the new head
        and rewrites again; the loser pays another rewrite, never
        correctness."""
        last_exc: ConflictError | None = None
        for _ in range(max_retries + 1):
            snap = self.snapshot(self.head_version())
            df = self.read(spark, apply_policies=False)
            if snap.cluster_by is None:
                # unclustered writes inherit input partitioning (right
                # for normal commits); compaction's whole point is the
                # file count, so coalesce explicitly here
                df = df.repartition(target_files)
            try:
                return self.commit(
                    df,
                    mode="overwrite",
                    cluster_by=snap.cluster_by,
                    layout=snap.layout,
                    # hash layout: the bucket count is the store's
                    # contract, so compaction merges the per-bucket
                    # small files but never changes the bucketing
                    target_files=snap.n_buckets if snap.layout == "hash" and snap.n_buckets else target_files,
                    generated=snap.generated,  # the spec survives compaction
                    policies=snap.policies,  # governance survives compaction
                    constraints=snap.constraints,
                )
            except ConflictError as exc:
                last_exc = exc
        raise last_exc

    def compact_small(
        self,
        spark: SparkSession,
        min_file_mb: float = 4.0,
        target_files: int = 1,
    ) -> int | None:
        """Partial compaction (Delta OPTIMIZE semantics): rewrite ONLY
        files smaller than ``min_file_mb`` into ``target_files`` new
        files; every right-sized file carries into the new manifest by
        reference — so compaction cost scales with the SMALL-file
        backlog, not the table (``compact()`` is the full O(table)
        rewrite). Range layout keeps pruning: rewritten files get fresh
        min/max stats and range pruning never required disjoint files,
        only per-file bounds. Hash layout falls back to the full
        compact (files must stay bucket-pure). Returns the new version,
        or None when nothing qualifies. Column-mapped stores materialize
        renames only in the rewritten files — the read-side coalesce
        handles the mix, same as after a pruned merge."""
        self._fold_pending_deletes(spark)
        head = self.head_version()
        if head is None:
            raise ValueError("compact_small on an empty store")
        snap = self.snapshot(head)
        if (snap.layout == "hash" and snap.has_buckets) or snap.layout in (
            "zorder", "hilbert",
        ):
            # hash files must stay bucket-pure; zorder/hilbert files
            # carry multi-dim stats a plain range write cannot
            # reproduce — both fall back to the full rewrite
            return self.compact(spark, target_files=max(target_files, 8))
        threshold = int(min_file_mb * 1024 * 1024)

        def size_of(e: dict) -> int:
            p = os.path.join(self.path, e["path"])
            if os.path.isdir(p):
                return sum(
                    os.path.getsize(os.path.join(root, f))
                    for root, _, files in os.walk(p)
                    for f in files
                )
            return os.path.getsize(p)

        small = [e for e in snap.entries if size_of(e) < threshold]
        if len(small) <= target_files:
            return None  # backlog already within shape
        carried = [e for e in snap.entries if e not in small]
        df = self._apply_renames(
            spark.read.option("mergeSchema", "true").parquet(
                *[os.path.join(self.path, e["path"]) for e in small]
            ),
            snap.renames,
            snap.dropped,
        )
        if "_bucket" in df.columns:
            df = df.drop("_bucket")
        version = head + 1
        if snap.cluster_by and snap.layout == "range":
            new_entries = self._write_data(
                df, version, snap.cluster_by, target_files
            )
        else:
            new_entries = self._write_data(
                df.repartition(target_files), version, None, target_files
            )
        self._publish(
            {
                "version": version,
                "parent": head,
                "mode": "compact",
                "entries": carried + new_entries,
                "cluster_by": snap.cluster_by if snap.layout == "range" else None,
                "schema": snap.schema_json,
                "meta": {
                    "compacted_files": len(small),
                    "carried_files": len(carried),
                },
                "layout": snap.layout,
                "n_buckets": snap.n_buckets,
                **_inherited(snap),
            }
        )
        return version

    def compact_where(
        self,
        spark: SparkSession,
        lo,
        hi,
        target_files: int = 1,
        max_retries: int = 0,
    ) -> int | None:
        """Key-range-filtered compaction (Delta ``OPTIMIZE ... WHERE``):
        rewrite ONLY the files whose [min, max] key stats overlap
        [``lo``, ``hi``] into ``target_files`` fresh clustered files;
        everything outside the band carries into the new manifest by
        reference. This is the maintenance primitive for hot-band
        ingest (a stream of small merges fragments ONE key region while
        the cold history stays perfectly sized): cost tracks the band's
        file backlog, never the table. Selection is manifest-only —
        per-file stats decide overlap, no data is read to plan the
        rewrite. Files without key stats (mixed-layout unclustered
        appends) are conservatively INCLUDED: without bounds they
        cannot be proven outside the band, and rewriting them restores
        their stats. Range layout only — hash buckets are already
        key-partitioned (use ``compact()``: it preserves the bucket
        contract) and zorder files carry multi-dim stats a plain range
        write cannot reproduce. Returns the new version, or None when
        the band holds <= ``target_files`` files (nothing to merge).
        Delta analog: OPTIMIZE <t> WHERE <partition predicate>.

        ``max_retries`` > 0: optimistic concurrency for the filtered
        OPTIMIZE racing live writers — same contract as ``compact()``:
        a compaction is a DERIVED rewrite, so a lost race must never
        blind-retry stale output (that would erase the winner's rows);
        each retry RE-SELECTS the band from the NEW head's manifest and
        rewrites again. The loser pays another band rewrite, never
        correctness; the abandoned attempt directory is vacuum fodder.
        """
        last_exc: ConflictError | None = None
        for _ in range(max_retries + 1):
            self._fold_pending_deletes(spark)
            head = self.head_version()
            if head is None:
                raise ValueError("compact_where on an empty store")
            snap = self.snapshot(head)
            if snap.layout != "range" or not snap.cluster_by:
                raise ValueError(
                    "compact_where needs the range-clustered layout (hash "
                    "buckets are already key-partitioned and zorder carries "
                    "multi-dim stats; use compact() for those)"
                )

            def in_band(e: dict) -> bool:
                mn, mx = e.get("min"), e.get("max")
                if mn is None or mx is None:
                    return True  # no stats: cannot prove it outside the band
                return not (mx < lo or mn > hi)

            touched = [e for e in snap.entries if in_band(e)]
            if len(touched) <= target_files:
                return None
            carried = [e for e in snap.entries if not in_band(e)]
            df = self._apply_renames(
                spark.read.option("mergeSchema", "true").parquet(
                    *[os.path.join(self.path, e["path"]) for e in touched]
                ),
                snap.renames,
                snap.dropped,
            )
            if "_bucket" in df.columns:
                df = df.drop("_bucket")
            version = head + 1
            new_entries = self._write_data(df, version, snap.cluster_by, target_files)
            try:
                self._publish(
                    {
                        "version": version,
                        "parent": head,
                        "mode": "compact",
                        "entries": carried + new_entries,
                        "cluster_by": snap.cluster_by,
                        "schema": snap.schema_json,
                        "meta": {
                            "compacted_files": len(touched),
                            "carried_files": len(carried),
                            "where": [lo, hi],
                        },
                        "layout": snap.layout,
                        "n_buckets": snap.n_buckets,
                        **_inherited(snap),
                    }
                )
                return version
            except ConflictError as exc:
                last_exc = exc
        raise last_exc

    def forget(
        self,
        spark: SparkSession,
        keys: list,
        key_col: str | None = None,
    ) -> int:
        """Right-to-be-forgotten erasure: delete ``keys`` via a normal
        MERGE commit, then make the removal PHYSICAL — drop all prior
        versions (``vacuum(keep_last=1)``) and sweep files inside
        retained directories that no retained manifest references (a
        pruned merge leaves the pre-delete version of a rewritten file
        on disk next to carried siblings; logical deletion alone would
        keep the bytes). Returns the delete-commit version.

        Like ``vacuum(include_orphans=True)``, only safe with no commit
        concurrently in flight. On Delta/Iceberg the same flow is
        DELETE FROM + VACUUM at zero retention."""
        self._fold_pending_deletes(spark)
        head = self.head_version()
        if head is None:
            raise ValueError("forget on an empty store")
        pins = self._pinned_versions()
        if pins:
            raise ValueError(
                "forget cannot guarantee physical erasure while refs pin "
                f"history ({', '.join(f'v{v}: {r}' for v, r in sorted(pins.items()))}); "
                "drop the tags/branches first"
            )
        snap = self.snapshot(head)
        key_col = key_col or (
            snap.zorder_cols[0] if snap.zorder_cols else snap.cluster_by
        )
        if key_col is None:
            raise ValueError("pass key_col: the store is not clustered")
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(json.loads(snap.schema_json))
        changes = spark.createDataFrame(
            [(k,) for k in keys],
            StructType([schema[key_col]]),
        )
        for f in schema.fields:
            if f.name != key_col:
                changes = changes.withColumn(
                    f.name, F.lit(None).cast(f.dataType)
                )
        changes = changes.withColumn("op", F.lit("delete")).withColumn(
            "_seq", F.lit(1).cast("long")
        )
        version = self.merge(
            spark, changes, key_cols=key_col, version_cols="_seq"
        )
        self.vacuum(keep_last=1)
        # File-level orphan sweep: delete unreferenced parquet files
        # inside directories the retained snapshot keeps alive.
        referenced = set()
        for v in self.versions():
            for e in self.snapshot(v).entries:
                p = os.path.join(self.path, e["path"])
                if os.path.isdir(p):
                    for root, _dirs, files in os.walk(p):
                        referenced.update(os.path.join(root, f) for f in files)
                else:
                    referenced.add(p)
        data_root = os.path.join(self.path, "data")
        for root, _dirs, files in os.walk(data_root):
            for f in files:
                fp = os.path.join(root, f)
                if f.endswith(".parquet") and fp not in referenced:
                    os.remove(fp)
        return version

    def vacuum(
        self,
        keep_last: int = 1,
        include_orphans: bool = False,
        dry_run: bool = False,
        older_than: float | None = None,
    ) -> list[str]:
        """Drop manifests older than the last ``keep_last`` and delete
        data directories no retained snapshot references. Returns the
        deleted directories. The only destructive operation, and it
        never touches the head.

        ``older_than`` (epoch seconds) is the TIME-based retention axis
        (Iceberg ``expire_snapshots(older_than=)``, Delta's
        ``delta.logRetentionDuration``): a version is dropped only when
        it is BOTH outside ``keep_last`` AND published before the
        cutoff — so the two knobs compose as "keep at least N, and
        everything newer than T", the standard production policy. The
        head, pinned tags, and live branch fork-points always survive.

        Granularity is the top-level commit directory: a directory is
        deleted only when NO retained snapshot references any file
        inside it (pruned merges carry individual files forward, which
        keeps their parent directory alive).

        ``include_orphans`` additionally removes data directories no
        manifest at all references (crashed or conflict-losing commit
        attempts). Only safe when no commit is concurrently in flight —
        an in-flight attempt's directory looks identical to an orphan.

        ``dry_run=True`` (Delta ``VACUUM ... DRY RUN``) reports exactly
        what a real run would delete — directories AND the manifests —
        and touches nothing: the operator's pre-flight check before the
        one irreversible command, byte-identical store afterwards."""
        import shutil

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        vs = self.versions()
        # Tags and live branch fork-points PIN their versions (Iceberg
        # ref retention): a tagged release stays time-travelable and a
        # branch's borrowed base files stay on disk, whatever keep_last
        # says. drop_tag / drop_branch releases the pin.
        pinned = set(self._pinned_versions()) & set(vs)
        keep_set = set(vs[-keep_last:]) | pinned
        if older_than is not None:
            # time axis: anything published at/after the cutoff survives
            keep_set |= {
                v for v in vs if (self.snapshot(v).created_at or 0) >= older_than
            }
        drop = [v for v in vs if v not in keep_set]
        keep = [v for v in vs if v in keep_set]
        referenced = {d for v in keep for d in self.snapshot(v).dirs}
        deleted = []
        for v in drop:
            for d in self.snapshot(v).dirs:
                if d not in referenced:
                    abs_d = os.path.join(self.path, d)
                    if os.path.isdir(abs_d) and not dry_run:
                        shutil.rmtree(abs_d)
                    deleted.append(d)
                    referenced.add(d)  # don't double-delete
            if not dry_run:
                os.remove(os.path.join(self._manifest_dir, f"v{v}.json"))
        if include_orphans:
            data_root = os.path.join(self.path, "data")
            if os.path.isdir(data_root):
                for name in sorted(os.listdir(data_root)):
                    rel = os.path.join("data", name)
                    if rel not in referenced:
                        if not dry_run:
                            shutil.rmtree(os.path.join(data_root, name))
                        deleted.append(rel)
        return deleted

    # ---- refs: tags and branches ------------------------------------
    #
    # Reference analog: none — table-format extension surface
    # (SURVEY.md §2.2, the Delta/Iceberg stand-in the CDC apply path
    # targets). Iceberg-style named refs over the same manifest log. A TAG is an
    # immutable named pointer to a version — it PINS that version
    # against vacuum (release/audit retention). A BRANCH is an
    # independent line of development: physically a shallow clone
    # under <store>/_branches/<name> whose v1 borrows the fork-point
    # files by absolute path (zero bytes copied), so EVERY store
    # operation — merge, delete_where, constraints, WAP audit, OCC —
    # works on a branch unchanged. merge_branch publishes the branch's
    # state back onto main: hard-links branch-owned files into main's
    # data dir (same-filesystem, zero-copy) and rewrites borrowed
    # entries to main-relative paths, as a single atomic commit. This
    # is the multi-commit generalization of commit(audit=True)'s
    # write-audit-publish: stage ANY number of commits on a branch,
    # validate the branch head, then land main in one step.

    def _refs_dir(self, kind: str) -> str:
        d = os.path.join(self.path, "_refs", kind)
        os.makedirs(d, exist_ok=True)
        return d

    @staticmethod
    def _check_ref_name(name: str) -> None:
        if not re.fullmatch(r"[A-Za-z0-9][A-Za-z0-9._-]{0,63}", name):
            raise ValueError(
                f"invalid ref name {name!r}: alnum start, then "
                "[A-Za-z0-9._-], max 64 chars"
            )

    def _publish_ref(self, kind: str, name: str, payload: dict) -> None:
        """Atomic put-if-absent, same discipline as _publish: two
        clients racing to create the same ref resolve to one winner."""
        final = os.path.join(self._refs_dir(kind), f"{name}.json")
        tmp = f"{final}.{os.getpid()}.{threading.get_ident()}.inflight"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        try:
            os.link(tmp, final)
        except FileExistsError:
            raise ConflictError(
                f"{kind[:-1]} {name!r} already exists"
            ) from None
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass

    def create_tag(self, name: str, version: int | None = None) -> int:
        """Immutable named pointer to a version (Iceberg tag / git tag):
        ``read(spark, store.tag_version(name))`` time-travels to it
        forever, and ``vacuum`` retains the tagged version's manifest
        and files regardless of ``keep_last`` — the release-pinning
        retention Iceberg calls a tag's max-ref-age, here unbounded
        until ``drop_tag``."""
        self._check_ref_name(name)
        v = self.head_version() if version is None else version
        if v is None or v not in self.versions():
            raise ValueError(f"cannot tag nonexistent version {version!r}")
        self._publish_ref("tags", name, {"version": v, "created_at": time.time()})
        return v

    def tags(self) -> dict[str, int]:
        d = os.path.join(self.path, "_refs", "tags")
        if not os.path.isdir(d):
            return {}
        out = {}
        for f in sorted(os.listdir(d)):
            if f.endswith(".json"):
                with open(os.path.join(d, f)) as fh:
                    out[f[:-5]] = json.load(fh)["version"]
        return out

    def tag_version(self, name: str) -> int:
        try:
            return self.tags()[name]
        except KeyError:
            raise ValueError(f"no tag {name!r}") from None

    def read_tag(self, spark: SparkSession, name: str) -> DataFrame:
        return self.read(spark, self.tag_version(name))

    def drop_tag(self, name: str) -> None:
        p = os.path.join(self.path, "_refs", "tags", f"{name}.json")
        if not os.path.exists(p):
            raise ValueError(f"no tag {name!r}")
        os.remove(p)

    def expire_tags(
        self, older_than_secs: float, now: float | None = None
    ) -> list[str]:
        """Iceberg's tag max-ref-age: drop every tag created more than
        ``older_than_secs`` ago, returning the dropped names — the
        retention sweep that keeps nightly release tags from pinning
        the whole manifest history forever (run it before ``vacuum``
        so the newly unpinned versions reap in the same pass).
        Branches never auto-expire: a branch holds un-published WORK,
        and silently dropping one loses data — expiry is only sound
        for the immutable pointers."""
        now = time.time() if now is None else now
        d = os.path.join(self.path, "_refs", "tags")
        dropped: list[str] = []
        if not os.path.isdir(d):
            return dropped
        for f in sorted(os.listdir(d)):
            if not f.endswith(".json"):
                continue
            with open(os.path.join(d, f)) as fh:
                created = json.load(fh).get("created_at", now)
            if now - created > older_than_secs:
                os.remove(os.path.join(d, f))
                dropped.append(f[:-5])
        return dropped

    def _branch_root(self, name: str) -> str:
        return os.path.join(self.path, "_branches", name)

    def create_branch(
        self, name: str, version: int | None = None
    ) -> "SnapshotStore":
        """Fork an independent line of development at ``version``
        (default head). The branch is a shallow clone — v1 borrows the
        fork-point files by absolute path, zero bytes copied — so every
        store operation works on it unchanged, isolated from main's
        readers. The fork-point version is PINNED against main's vacuum
        for the branch's lifetime (a vacuumed base would dangle the
        borrow). Iceberg branch / Delta has no analog; the WAP workflow
        is create_branch → any commits/merges → validate → merge_branch.
        """
        self._check_ref_name(name)
        v = self.head_version() if version is None else version
        if v is None:
            raise ValueError("cannot branch an empty store")
        self._publish_ref(
            "branches", name, {"base_version": v, "created_at": time.time()}
        )
        try:
            return self.clone_to(self._branch_root(name), v)
        except BaseException:
            os.remove(
                os.path.join(self.path, "_refs", "branches", f"{name}.json")
            )
            raise

    def branch(self, name: str) -> "SnapshotStore":
        if name not in self.branch_refs():
            raise ValueError(f"no branch {name!r}")
        return SnapshotStore(self._branch_root(name))

    def branch_refs(self) -> dict[str, dict]:
        d = os.path.join(self.path, "_refs", "branches")
        if not os.path.isdir(d):
            return {}
        out = {}
        for f in sorted(os.listdir(d)):
            if f.endswith(".json"):
                with open(os.path.join(d, f)) as fh:
                    out[f[:-5]] = json.load(fh)
        return out

    def drop_branch(self, name: str) -> None:
        """Delete the branch line and its owned data. Main-owned files
        the branch borrowed are absolute references, never touched;
        files already merge_branch'd into main are hard links, so the
        branch-side unlink leaves main's inodes intact."""
        ref = os.path.join(self.path, "_refs", "branches", f"{name}.json")
        if not os.path.exists(ref):
            raise ValueError(f"no branch {name!r}")
        root = self._branch_root(name)
        if os.path.isdir(root):
            shutil.rmtree(root)
        os.remove(ref)

    def _pinned_versions(self) -> dict[int, str]:
        """version -> reason, for every version a tag or live branch
        base pins against vacuum."""
        pins: dict[int, str] = {}
        for t, v in self.tags().items():
            pins.setdefault(v, f"tag {t!r}")
        for b, ref in self.branch_refs().items():
            pins.setdefault(ref["base_version"], f"branch {b!r} base")
        return pins

    def merge_branch(
        self,
        spark: SparkSession,
        name: str,
        drop: bool = False,
        max_retries: int = 0,
    ) -> int:
        """Land the branch's current state on main as ONE atomic commit.

        Fast-forward (main unmoved since the fork): main becomes the
        branch head wholesale — entries, schema, layout, governance.
        Main moved: the merge still lands WITHOUT recomputation when
        the branch is provably disjoint from main's drift — every
        branch commit after the fork is an append, and neither side
        changed schema, layout, clustering, or governance — by
        publishing main's head entries plus the branch-added files
        (the append-rebase rule OCC uses, applied across a whole
        branch). Anything else raises ConflictError: re-fork and
        replay, exactly like a git rebase the fast path can't prove.

        Zero-copy either way: branch-owned files HARD-LINK into main's
        data directory (same filesystem by construction); entries the
        branch borrowed from main rewrite back to main-relative paths.
        The link step happens before the manifest publish, so a lost
        publish race leaves only an orphan directory for vacuum, never
        a dangling manifest. ``drop=True`` removes the branch after a
        successful merge (its links stay alive in main)."""
        if name not in self.branch_refs():
            raise ValueError(f"no branch {name!r}")
        b = self.branch(name)
        b._fold_pending_deletes(spark)
        bhead_v = b.head_version()
        bsnap = b.snapshot(bhead_v)
        base_v = self.branch_refs()[name]["base_version"]
        base_snap = self.snapshot(base_v)
        main_root = os.path.abspath(self.path)
        branch_root = os.path.abspath(b.path)

        last_exc: ConflictError | None = None
        for _ in range(max_retries + 1):
            head_v = self.head_version()
            fast_forward = head_v == base_v
            if not fast_forward:
                head = self.snapshot(head_v)
                appends_only = all(
                    b.snapshot(v).mode == "append"
                    for v in b.versions() if v > 1
                ) and all(
                    # main's drift must be append-only too: an
                    # overwrite/merge/delete on main means the branch's
                    # borrowed base is stale — publishing base+branch
                    # files over it would resurrect replaced rows
                    self.snapshot(v).mode == "append"
                    for v in self.versions() if base_v < v <= head_v
                )
                same_schema = (
                    self._schema_core(bsnap.schema_json)
                    == self._schema_core(base_snap.schema_json)
                    == self._schema_core(head.schema_json)
                )
                same_governance = (
                    _inherited(head) == _inherited(base_snap)
                    and {
                        k: v for k, v in _inherited(bsnap).items()
                        if k != "tombstones"
                    } == {
                        k: v for k, v in _inherited(base_snap).items()
                        if k != "tombstones"
                    }
                    and not (bsnap.tombstones.get("entries"))
                )
                if not (appends_only and same_schema and same_governance):
                    raise ConflictError(
                        f"cannot merge branch {name!r}: main moved "
                        f"(v{base_v} -> v{head_v}) and the branch is not "
                        "provably disjoint (append-only, no schema/"
                        "governance drift on either side); re-fork and "
                        "replay"
                    )

            new_v = head_v + 1
            data_root = os.path.join(self.path, "data")
            os.makedirs(data_root, exist_ok=True)
            import_dir = tempfile.mkdtemp(prefix=f"v{new_v}-", dir=data_root)
            import_rel = os.path.join("data", os.path.basename(import_dir))

            def _import(e: dict) -> dict:
                p = e["path"]
                if os.path.isabs(p):
                    ap = os.path.abspath(p)
                    if ap.startswith(main_root + os.sep) and not ap.startswith(
                        branch_root + os.sep
                    ):
                        # borrowed main file: back to a relative entry
                        return {**e, "path": os.path.relpath(ap, main_root)}
                    return e  # external borrow (branch of a clone): keep
                # branch-owned: hard-link the file/dir tree into main
                src = os.path.join(branch_root, p)
                sub = p[5:] if p.startswith("data" + os.sep) else p
                dst = os.path.join(import_dir, sub)
                if os.path.isdir(src):
                    for root, _dirs, files in os.walk(src):
                        rel = os.path.relpath(root, src)
                        tgt = dst if rel == "." else os.path.join(dst, rel)
                        os.makedirs(tgt, exist_ok=True)
                        for fn in files:
                            dp = os.path.join(tgt, fn)
                            if not os.path.exists(dp):
                                os.link(os.path.join(root, fn), dp)
                else:
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    if not os.path.exists(dst):
                        os.link(src, dst)
                return {**e, "path": os.path.join(import_rel, sub)}

            if fast_forward:
                entries = [_import(e) for e in bsnap.entries]
                manifest = {
                    "version": new_v,
                    "parent": head_v,
                    "mode": "branch_merge",
                    "entries": entries,
                    "cluster_by": bsnap.cluster_by,
                    "schema": bsnap.schema_json,
                    "layout": bsnap.layout,
                    "n_buckets": bsnap.n_buckets,
                    **_inherited(bsnap),
                }
            else:
                base_paths = {e["path"] for e in b.snapshot(1).entries}
                added = [
                    _import(e) for e in bsnap.entries
                    if e["path"] not in base_paths
                ]
                entries = self.snapshot(head_v).entries + added
                # Clustering survives only when both lines kept the
                # SAME layout (mixed layouts make pruning unsound —
                # same degradation rule as commit(mode='append')).
                same_layout = (
                    head.cluster_by, head.layout, head.n_buckets,
                ) == (bsnap.cluster_by, bsnap.layout, bsnap.n_buckets)
                manifest = {
                    "version": new_v,
                    "parent": head_v,
                    "mode": "branch_merge",
                    "entries": entries,
                    "cluster_by": head.cluster_by if same_layout else None,
                    "schema": head.schema_json,
                    "layout": head.layout if same_layout else "range",
                    "n_buckets": head.n_buckets if same_layout else None,
                    **_inherited(head),
                }
            manifest["meta"] = {
                "merged_branch": name,
                "branch_head": bhead_v,
                "base_version": base_v,
                "fast_forward": fast_forward,
            }
            try:
                self._publish(manifest)
                if drop:
                    self.drop_branch(name)
                return new_v
            except ConflictError as exc:
                last_exc = exc  # loser's import_dir stays for vacuum
        raise last_exc


def invert_changes(cdf: DataFrame, key_cols: list[str] | str) -> DataFrame:
    """Invert a keyed change feed into the MERGE batch that undoes it —
    the reference's flashback codegen (log2sql.py:137-160: insert →
    DELETE, delete → INSERT, update → swap images) lifted from SQL-text
    rendering to a relational transform.

    Per key, the EARLIEST change in the feed decides the restore action
    (a key touched by many commits must return to its state BEFORE the
    first of them — this is also what makes the reference's missing
    reverse ordering, README.md:23-27, a non-issue here: the window
    pick replaces order-sensitive statement replay):

    * first change ``insert``            → the key didn't exist: delete
    * first change ``delete``            → re-insert its preimage
    * first change ``update_preimage``   → update back to its preimage

    One window over one shuffle on the key; output is a changes frame
    (key, data…, op, _seq) ready for :meth:`SnapshotStore.merge`.
    """
    from pyspark.sql import Window as W

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    # update_postimage rows are redundant for inversion (the preimage
    # carries the restore state); drop them before the window so ties
    # inside one commit can't race.
    pre = cdf.filter(F.col("_change_type") != "update_postimage")
    w = W.partitionBy(*keys).orderBy("_commit_version")
    first = (
        pre.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    data_cols = [
        c
        for c in cdf.columns
        if c not in keys and c not in ("_change_type", "_commit_version")
    ]
    op = (
        F.when(F.col("_change_type") == "insert", F.lit("delete"))
        .when(F.col("_change_type") == "delete", F.lit("insert"))
        .otherwise(F.lit("update"))
    )
    return first.select(
        *keys, *data_cols, op.alias("op"), F.lit(1).alias("_seq")
    )
