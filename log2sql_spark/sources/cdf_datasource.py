"""Change-data-feed STREAM source over the snapshot store:
``spark.readStream.format("snapshot_cdf").load(store_path)``.

Delta's streaming CDF read, rebuilt on the Spark 4 Python DataSource
API: every snapshot version the store commits becomes one micro-batch
of row-level changes (``added`` / ``removed``, an update being one of
each), so any downstream pipeline — a second MV, a search indexer, an
audit log — can subscribe to a table maintained by the CDC apply path
without touching the binlog again. Offsets are snapshot versions;
restarts resume exactly from the checkpointed version because the
manifest log is append-only and immutable.

Diffs are computed from the manifests alone: files carried by
reference between two versions cancel out of the diff by construction
(same contract as ``SnapshotStore.diff``), so only each version's
rewritten footprint is read — driver-side via parquet (per-version CDC
deltas are batch-sized by contract; the heavy lifting happened when
the version was written).
"""

from __future__ import annotations

import json
import os
from collections import Counter
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructField, StructType, IntegerType, StringType


def _local_path(path: str | None) -> str | None:
    """Normalize a `file:` URI to a plain local path. The SQL surface
    (CREATE TABLE ... USING snapshot OPTIONS (path '...')) qualifies
    the option through Hadoop's path resolution, so the Python side
    receives file:/abs/dir while the DataFrame API passes the raw
    string — both must address the same store directory."""
    if path and path.startswith("file:"):
        stripped = path[5:]
        # file:///x and file:/x both mean local /x
        while stripped.startswith("//"):
            stripped = stripped[1:]
        return stripped
    return path


def _store_schema(path: str) -> StructType:
    from log2sql_spark.store import SnapshotStore

    store = SnapshotStore(path)
    head = store.head_version()
    if head is None:
        raise ValueError(f"snapshot_cdf: store at {path} has no commits yet")
    return StructType.fromJson(json.loads(store.snapshot(head).schema_json))


class SnapshotCdfDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "snapshot_cdf"

    def schema(self) -> StructType:
        base = _store_schema(_local_path(self.options.get("path")))
        return StructType(
            list(base.fields)
            + [
                StructField("_version", IntegerType()),
                StructField("_change_type", StringType()),
            ]
        )

    def simpleStreamReader(self, schema) -> "SnapshotCdfStreamReader":
        return SnapshotCdfStreamReader(schema, self.options)


def _freeze(v):
    if isinstance(v, dict):
        return tuple(sorted(v.items()))
    if isinstance(v, list):
        return tuple(v)
    return v


class SnapshotCdfStreamReader(SimpleDataSourceStreamReader):
    """Offset = last emitted snapshot version. Each trigger emits the
    row-level diff of every new version against its parent, tagged with
    the version and change type."""

    def __init__(self, schema: StructType, options):
        self.path = _local_path(options.get("path"))
        if not self.path:
            raise ValueError("snapshot_cdf requires a path: .load('/store')")
        self.fields = [f.name for f in schema.fields[:-2]]
        self.max_versions = int(options.get("maxVersionsPerTrigger", 16))
        self.starting = int(options.get("startingVersion", 0))
        # Optional keyed classification (Delta CDF parity): with
        # .option("key", "k[,k2]") the _change_type values become
        # insert / delete / update_preimage / update_postimage instead
        # of added / removed — an update pairs the removed (pre) and
        # added (post) image of the same key within one version.
        key_opt = options.get("key")
        self.key_cols = [k.strip() for k in key_opt.split(",")] if key_opt else None
        if self.key_cols:
            missing = [k for k in self.key_cols if k not in self.fields]
            if missing:
                raise ValueError(f"key columns not in store schema: {missing}")
            self._key_idx = [self.fields.index(k) for k in self.key_cols]

    def _store(self):
        from log2sql_spark.store import SnapshotStore

        return SnapshotStore(self.path)

    def initialOffset(self) -> dict:
        # versions <= starting-1 are history the subscriber skips;
        # startingVersion=0 (default) replays the full table as adds
        return {"version": self.starting - 1 if self.starting > 0 else 0}

    def _candidates(self, store, names: list) -> dict:
        # Resolve through the HEAD's composed map, not the emitted
        # version's: the subscriber declared TODAY's logical names, and
        # a version published before the rename knows nothing about it.
        renames = store.snapshot(store.head_version()).renames
        return {
            f: [f] + [p for p, log in renames.items() if log == f]
            for f in names
        }

    @staticmethod
    def _tomb_keyset(store, snap) -> tuple[list, set]:
        """(key columns, set of tombstoned key tuples) for a snapshot's
        pending merge-on-read deletes — empty when none."""
        import pyarrow.parquet as pq

        entries = snap.tombstones.get("entries") or []
        if not entries:
            return [], set()
        keys = snap.tombstones["key"]
        keyset = set()
        for e in entries:
            tbl = pq.read_table(os.path.join(store.path, e["path"]))
            for rec in tbl.to_pylist():
                keyset.add(tuple(rec.get(k) for k in keys))
        return keys, keyset

    def _version_rows(self, store, version: int, paths: set) -> list[tuple]:
        """VISIBLE rows of the given version restricted to ``paths``
        (relative), as hashable field tuples. Column-mapping aware: a
        file written before a rename stores the PHYSICAL name, so each
        subscriber field resolves through that version's physical
        generations (first name present in the record wins — one
        generation per file). Tombstone aware: rows merge-on-read
        deleted AT that version are not part of its visible state."""
        import pyarrow.parquet as pq

        snap = store.snapshot(version)
        keys, keyset = self._tomb_keyset(store, snap)
        kcand = self._candidates(store, keys) if keys else {}
        candidates = self._candidates(store, self.fields)
        out = []
        for rel in sorted(paths):
            tbl = pq.read_table(os.path.join(store.path, rel))
            for rec in tbl.to_pylist():
                if keyset:
                    kt = tuple(
                        next((rec[c] for c in kcand[k] if c in rec), None)
                        for k in keys
                    )
                    if kt in keyset:
                        continue
                out.append(
                    tuple(
                        _freeze(
                            next((rec[c] for c in candidates[f] if c in rec), None)
                        )
                        for f in self.fields
                    )
                )
        return out

    def _keyed_rows(
        self, store, version: int, paths: set, keys: list, keyset: set
    ) -> list[tuple]:
        """Rows of ``paths`` whose key tuple is in ``keyset`` — the
        subscriber-facing images of a merge-on-read tombstone delta."""
        import pyarrow.parquet as pq

        kcand = self._candidates(store, keys)
        candidates = self._candidates(store, self.fields)
        out = []
        for rel in sorted(paths):
            tbl = pq.read_table(os.path.join(store.path, rel))
            for rec in tbl.to_pylist():
                kt = tuple(
                    next((rec[c] for c in kcand[k] if c in rec), None)
                    for k in keys
                )
                if kt in keyset:
                    out.append(
                        tuple(
                            _freeze(
                                next(
                                    (rec[c] for c in candidates[f] if c in rec),
                                    None,
                                )
                            )
                            for f in self.fields
                        )
                    )
        return out

    def _thaw(self, row: tuple):
        vals = []
        for v in row:
            if isinstance(v, tuple) and v and all(
                isinstance(e, tuple) and len(e) == 2 for e in v
            ):
                vals.append(dict(v))  # frozen map
            else:
                vals.append(v)
        return vals

    def _diff(self, store, version: int) -> list[tuple]:
        new = store.snapshot(version)
        if new.parent is None:
            old_paths: set = set()
            new_paths = {e["path"] for e in new.entries}
            shared: set = set()
        else:
            old = store.snapshot(new.parent)
            a = {e["path"] for e in old.entries}
            b = {e["path"] for e in new.entries}
            old_paths, new_paths = a - b, b - a
            shared = a & b
        added = Counter(self._version_rows(store, version, new_paths))
        removed = Counter(
            self._version_rows(store, new.parent, old_paths)
        ) if new.parent is not None and old_paths else Counter()
        if new.parent is not None and shared:
            # Merge-on-read tombstone delta: a delete_where_mor (or a
            # restore across one) changes NO data entries, so the
            # file-level diff above is blind to it. Rows of the CARRIED
            # files whose key the new version tombstones (but the
            # parent did not) are removals; keys the parent tombstoned
            # that the new version does not (restore to pre-delete) are
            # additions. _version_rows applies each side's own
            # tombstones, so rewritten files never double-count.
            nk, nset = self._tomb_keyset(store, new)
            ok_, oset = self._tomb_keyset(store, store.snapshot(new.parent))
            newly_dead = nset - oset if nk else set()
            revived = oset - nset if ok_ else set()
            if newly_dead:
                removed += Counter(
                    self._keyed_rows(store, new.parent, shared, nk, newly_dead)
                )
            if revived:
                added += Counter(
                    self._keyed_rows(store, version, shared, ok_, revived)
                )
        net_added, net_removed = added - removed, removed - added
        if self.key_cols:
            return self._classify(net_added, net_removed, version)
        out = []
        for row, n in sorted(net_added.items()):
            out.extend([(*self._thaw(row), version, "added")] * n)
        for row, n in sorted(net_removed.items()):
            out.extend([(*self._thaw(row), version, "removed")] * n)
        return out

    def _classify(self, added: Counter, removed: Counter, version: int) -> list[tuple]:
        """Keyed change types: a key with exactly one net-added and one
        net-removed row is an update (pre/post pair); added-only keys
        are inserts, removed-only deletes. A key with several images on
        one side (non-unique key — outside MERGE's contract) degrades
        deterministically to per-row insert/delete tags rather than
        guessing pairings."""
        by_key: dict[tuple, tuple[list, list]] = {}
        for row, n in sorted(added.items()):
            k = tuple(row[i] for i in self._key_idx)
            by_key.setdefault(k, ([], []))[0].extend([row] * n)
        for row, n in sorted(removed.items()):
            k = tuple(row[i] for i in self._key_idx)
            by_key.setdefault(k, ([], []))[1].extend([row] * n)
        out = []
        for k in sorted(by_key):
            adds, rems = by_key[k]
            if len(adds) == 1 and len(rems) == 1:
                out.append((*self._thaw(rems[0]), version, "update_preimage"))
                out.append((*self._thaw(adds[0]), version, "update_postimage"))
                continue
            for row in rems:
                out.append((*self._thaw(row), version, "delete"))
            for row in adds:
                out.append((*self._thaw(row), version, "insert"))
        return out

    def read(self, start: dict):
        store = self._store()
        head = store.head_version() or 0
        lo = start["version"] + 1
        hi = min(head, start["version"] + self.max_versions)
        if hi < lo:
            return [], start
        rows: list[tuple] = []
        for v in range(lo, hi + 1):
            rows.extend(self._diff(store, v))
        return rows, {"version": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        store = self._store()
        rows: list[tuple] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            rows.extend(self._diff(store, v))
        return iter(rows)


# ---------------------------------------------------------------------------
# Batch read source: spark.read.format("snapshot")
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    In,
    InputPartition,
    WriterCommitMessage,
)


class _EntryPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class SnapshotReader(DataSourceReader):
    """Batch scan of a snapshot-store version with SOURCE-SIDE pruning:
    EqualTo/In filters on the store's cluster key resolve to the files
    or buckets that can contain the keys (manifest range stats or
    xxhash buckets) BEFORE any partition is planned — pushdown against
    our own table format through the Spark 4 Python DataSource API.
    Remaining predicates are returned to Spark and evaluated post-scan
    as usual. ``option("version", N)`` time-travels the scan."""

    def __init__(self, options):
        self.path = _local_path(options.get("path"))
        if not self.path:
            raise ValueError("snapshot source requires a path: .load('/store')")
        self.version = (
            int(options["version"]) if options.get("version") is not None else None
        )
        # TIMESTAMP AS OF parity with SnapshotStore.read_as_of: resolve
        # the wall-clock to a version once at plan time (epoch seconds).
        if options.get("timestampAsOf") is not None:
            if self.version is not None:
                raise ValueError(
                    "pass either version or timestampAsOf, not both"
                )
            self.version = self._store().version_at(
                float(options["timestampAsOf"])
            )
        self.key_values: set | None = None
        # Governance: the connector's Python workers cannot evaluate
        # the store's SQL mask/row-filter policies, so serving a
        # policied store here would silently BYPASS them. Refuse unless
        # the caller explicitly claims the owner path (raw=true), which
        # mirrors SnapshotStore.read(apply_policies=False).
        if self._store().head_version() is not None:
            _, snap = self._snap()
            if snap.policies and str(options.get("raw", "")).lower() != "true":
                raise ValueError(
                    "store has read policies (masks/row filter); the "
                    "snapshot DataSource cannot enforce them — read through "
                    "SnapshotStore.read(), or pass .option('raw', 'true') "
                    "to take the table-owner path deliberately"
                )

    def _store(self):
        from log2sql_spark.store import SnapshotStore

        return SnapshotStore(self.path)

    def _snap(self):
        store = self._store()
        v = self.version if self.version is not None else store.head_version()
        return store, store.snapshot(v)

    def pushFilters(self, filters: list[Filter]):
        _, snap = self._snap()
        key = snap.cluster_by
        unsupported: list[Filter] = []
        for f in filters:
            col = f.attribute[-1] if hasattr(f, "attribute") else None
            if key is not None and col == key and isinstance(f, EqualTo):
                vals = {f.value}
                self.key_values = (
                    vals if self.key_values is None else self.key_values & vals
                )
            elif key is not None and col == key and isinstance(f, In):
                vals = set(f.value)
                self.key_values = (
                    vals if self.key_values is None else self.key_values & vals
                )
                unsupported.append(f)  # pruning is file-level; re-check rows
            else:
                unsupported.append(f)
        if self.key_values is not None:
            # EqualTo handled exactly only at file granularity; let Spark
            # re-verify rows (the prune is a superset read by design)
            unsupported = list(filters)
        return unsupported

    def partitions(self) -> list[_EntryPartition]:
        store, snap = self._snap()
        entries = snap.entries
        if self.key_values:
            vals = sorted(self.key_values)
            if snap.layout == "hash" and snap.has_buckets and snap.n_buckets:
                # xxhash64 lives JVM-side; planning may run in a Python
                # worker with no session — prune only when one is active,
                # otherwise fall back to a full scan (never incorrect,
                # pruning is an optimization)
                from pyspark.sql import SparkSession

                spark = SparkSession.getActiveSession()
                if spark is not None:
                    buckets = store._buckets_of(spark, snap, vals)
                    entries = [e for e in entries if e["bucket"] in buckets]
            elif snap.has_stats:
                entries = [
                    e
                    for e in entries
                    if any(e["min"] <= v <= e["max"] for v in vals)
                ]
        return [
            _EntryPartition(os.path.join(store.path, e["path"])) for e in entries
        ]

    def read(self, partition: _EntryPartition) -> Iterator[tuple]:
        import pyarrow.parquet as pq

        _, snap = self._snap()
        fields = [
            f["name"] for f in json.loads(snap.schema_json)["fields"]
        ]
        # Column mapping: a file written before a rename stores the
        # PHYSICAL name — resolve each logical field through every
        # physical generation (first hit wins; within one file only one
        # generation exists), mirroring SnapshotStore._apply_renames.
        candidates = {
            f: [f] + [p for p, log in snap.renames.items() if log == f]
            for f in fields
        }
        # Merge-on-read tombstones: a connector must serve the same
        # post-delete state as SnapshotStore.read — skipping this would
        # resurrect deleted rows through a format-string change. The
        # keyset is small by contract (big deletes are copy-on-write).
        keys = snap.tombstones.get("key") or []
        keyset: set = set()
        if keys and snap.tombstones.get("entries"):
            kcand = {
                k: [k] + [p for p, log in snap.renames.items() if log == k]
                for k in keys
            }
            for e in snap.tombstones["entries"]:
                tpath = os.path.join(self.path, e["path"])
                for rec in pq.read_table(tpath).to_pylist():
                    keyset.add(tuple(rec.get(k) for k in keys))
        out = []
        tbl = pq.read_table(partition.path)
        for rec in tbl.to_pylist():
            if keyset:
                kt = tuple(
                    next((rec[c] for c in kcand[k] if c in rec), None)
                    for k in keys
                )
                if kt in keyset:
                    continue
            out.append(
                tuple(
                    next(
                        (rec[c] for c in candidates[f] if c in rec),
                        None,
                    )
                    for f in fields
                )
            )
        return iter(out)


class SnapshotDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "snapshot"

    def schema(self) -> StructType:
        store_path = _local_path(self.options.get("path"))
        version = self.options.get("version")
        ts = self.options.get("timestampAsOf")
        if version is None and ts is not None:
            from log2sql_spark.store import SnapshotStore

            version = SnapshotStore(store_path).version_at(float(ts))
        if version is not None:
            from log2sql_spark.store import SnapshotStore

            snap = SnapshotStore(store_path).snapshot(int(version))
            return StructType.fromJson(json.loads(snap.schema_json))
        return _store_schema(store_path)

    def reader(self, schema) -> SnapshotReader:
        return SnapshotReader(self.options)

    def writer(self, schema, overwrite: bool) -> "SnapshotWriter":
        return SnapshotWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "SnapshotStreamWriter":
        return SnapshotStreamWriter(self.options, schema)


class _SnapshotFileCommit(WriterCommitMessage):
    def __init__(self, rel_path: str, n_rows: int):
        self.rel_path = rel_path
        self.n_rows = n_rows


class SnapshotWriter(DataSourceWriter):
    """``df.write.format("snapshot").save()`` — the DSv2 write path
    against our own table format, honoring its commit protocol: tasks
    write parquet files into ONE attempt-unique directory under
    ``data/`` (executor-side, dot-free names are fine — the directory
    is unreferenced until publish), and ``commit()`` publishes the
    manifest atomically with optimistic-concurrency retries on
    ``ConflictError``. A lost job leaves an orphan directory the
    store's ``vacuum(include_orphans=True)`` sweeps — identical crash
    semantics to ``SnapshotStore.commit``. Appends enforce the store's
    schema contract; stores with column mappings / generated columns /
    policies refuse the raw writer (the API path computes and
    validates those) unless overwriting, which resets them."""

    def __init__(self, options, schema: StructType, overwrite: bool):
        import uuid

        self.path = _local_path(options.get("path"))
        if not self.path:
            raise ValueError("snapshot sink requires a path: .save('/store')")
        self.schema_json = schema.json()
        self.fields = [f.name for f in schema.fields]
        self.overwrite = overwrite
        self.attempt_dir = os.path.join("data", f"w-{uuid.uuid4().hex[:12]}")
        from log2sql_spark.store import SnapshotStore

        store = SnapshotStore(self.path)
        head = store.head_version()
        if head is not None and not overwrite:
            snap = store.snapshot(head)
            if (
                snap.renames or snap.generated or snap.dropped
                or snap.policies or snap.constraints
            ):
                raise ValueError(
                    "store has column mappings / generated columns / "
                    "policies / constraints; append through "
                    "SnapshotStore.commit (the writer cannot compute or "
                    "validate them)"
                )
            if snap.tombstones.get("entries"):
                raise ValueError(
                    "store has pending merge-on-read deletes; append "
                    "through SnapshotStore.commit (which folds them) or "
                    "materialize_deletes() first — a raw append must not "
                    "carry tombstones that would shadow re-inserted keys"
                )
            prev = StructType.fromJson(json.loads(snap.schema_json))
            added = [f for f in self.fields if f not in prev.names]
            if added:
                raise ValueError(
                    f"append schema adds columns {added}; use "
                    "SnapshotStore.commit(merge_schema=True) to evolve"
                )

    def write(self, iterator) -> _SnapshotFileCommit:
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        abs_dir = os.path.join(self.path, self.attempt_dir)
        os.makedirs(abs_dir, exist_ok=True)
        rows = [[r[f] for f in self.fields] for r in iterator]
        if not rows:
            return _SnapshotFileCommit("", 0)
        name = f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.parquet"
        cols = list(zip(*rows))
        import pyspark.sql.types as T

        def _pa_type(dt):
            m = {
                T.LongType: pa.int64(),
                T.IntegerType: pa.int32(),
                T.DoubleType: pa.float64(),
                T.FloatType: pa.float32(),
                T.StringType: pa.string(),
                T.BooleanType: pa.bool_(),
                T.DateType: pa.date32(),
                T.TimestampType: pa.timestamp("us", tz="UTC"),
            }
            for k, v in m.items():
                if isinstance(dt, k):
                    return v
            raise ValueError(f"snapshot writer: unsupported type {dt}")

        st = StructType.fromJson(json.loads(self.schema_json))
        tbl = pa.table(
            {
                f.name: pa.array(cols[i], type=_pa_type(f.dataType))
                for i, f in enumerate(st.fields)
            }
        )
        pq.write_table(tbl, os.path.join(abs_dir, name))
        return _SnapshotFileCommit(os.path.join(self.attempt_dir, name), len(rows))

    def commit(self, messages) -> None:
        from log2sql_spark.store import ConflictError, SnapshotStore

        store = SnapshotStore(self.path)
        entries = [
            {"path": m.rel_path, "min": None, "max": None}
            for m in messages
            if m is not None and m.rel_path
        ]
        for _ in range(5):  # optimistic concurrency: retry on a new head
            parent = store.head_version()
            version = 1 if parent is None else parent + 1
            all_entries = entries
            schema_json = self.schema_json
            if parent is not None and not self.overwrite:
                prev_snap = store.snapshot(parent)
                all_entries = prev_snap.entries + entries
                # subset append must not shrink the recorded schema
                # (same union rule as SnapshotStore.commit)
                prev_st = StructType.fromJson(json.loads(prev_snap.schema_json))
                mine = StructType.fromJson(json.loads(self.schema_json))
                schema_json = StructType(
                    list(prev_st.fields)
                    + [f for f in mine.fields if f.name not in prev_st.names]
                ).json()
            try:
                store._publish(
                    {
                        "version": version,
                        "parent": parent,
                        "mode": "overwrite" if self.overwrite else "append",
                        "entries": all_entries,
                        "cluster_by": None,
                        "schema": schema_json,
                        "meta": {"writer": "datasource"},
                        "layout": "range",
                        "n_buckets": None,
                        "renames": {},
                        "generated": {},
                        "dropped": [],
                        "policies": {},
                    }
                )
                return
            except ConflictError:
                continue
        raise ConflictError("snapshot writer lost 5 publish races; retry the job")

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(os.path.join(self.path, self.attempt_dir), ignore_errors=True)


class SnapshotStreamWriter(SnapshotWriter, DataSourceStreamWriter):
    """Streaming twin: ``writeStream.format("snapshot")`` — every
    micro-batch appends one atomic snapshot, EXACTLY-ONCE downstream of
    the checkpoint: the manifest records the committing batch id, and a
    replayed batch (restart between sink-commit and checkpoint-advance)
    sees its id already at or below the head's and skips the publish —
    its rewritten attempt directory stays orphaned for vacuum, the
    visible table gains nothing twice. Micro-batches run sequentially,
    so the head's batch id is the high-watermark."""

    def __init__(self, options, schema: StructType):
        super().__init__(options, schema, overwrite=False)

    def write(self, iterator):  # same task protocol as the batch writer
        return SnapshotWriter.write(self, iterator)

    def commit(self, messages, batchId: int) -> None:  # type: ignore[override]
        from log2sql_spark.store import ConflictError, SnapshotStore

        store = SnapshotStore(self.path)
        head = store.head_version()
        if head is not None:
            applied = store.snapshot(head).meta.get("stream_batch_id")
            if applied is not None and batchId <= applied:
                self.abort(messages, batchId)  # replay: drop the re-write
                return
        entries = [
            {"path": m.rel_path, "min": None, "max": None}
            for m in messages
            if m is not None and m.rel_path
        ]
        parent = head
        version = 1 if parent is None else parent + 1
        all_entries = entries
        schema_json = self.schema_json
        if parent is not None:
            prev_snap = store.snapshot(parent)
            all_entries = prev_snap.entries + entries
        store._publish(
            {
                "version": version,
                "parent": parent,
                "mode": "append",
                "entries": all_entries,
                "cluster_by": None,
                "schema": schema_json,
                "meta": {"writer": "datasource", "stream_batch_id": batchId},
                "layout": "range",
                "n_buckets": None,
                "renames": {},
                "generated": {},
                "dropped": [],
                "policies": {},
            }
        )

    def abort(self, messages, batchId: int) -> None:  # type: ignore[override]
        import shutil

        shutil.rmtree(os.path.join(self.path, self.attempt_dir), ignore_errors=True)


def register(spark) -> None:
    spark.dataSource.register(SnapshotCdfDataSource)
    spark.dataSource.register(SnapshotDataSource)
