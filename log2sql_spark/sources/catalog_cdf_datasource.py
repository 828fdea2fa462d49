"""Catalog-consistent streaming CDF:
``spark.readStream.format("catalog_cdf").load(catalog_root)``.

The per-store stream (``snapshot_cdf``) gives each table its OWN
version axis, so a consumer subscribing to N tables of one
multi-table transaction can observe one table's changes in an earlier
micro-batch than another's — a torn read across the transaction
boundary. This source subscribes at the CATALOG level instead
(store/txn_catalog.py): the offset is the catalog version, and each
micro-batch carries EVERY member table's keyed changes between the
pinned store versions of consecutive catalog vectors. A transaction
published by ``commit_multi`` (or the streaming
``apply_changes_to_catalog``) therefore arrives atomically — all
tables, same ``_catalog_version``, never split across batches (a
batch may carry several whole versions, see the reader docstring).

Exactly-once composes from the offset mechanics: Spark checkpoints the
catalog version; a restart replays the same version range through
``readBetweenOffsets`` and the manifest chain is append-only and
immutable, so the replayed batch is byte-identical. Retention: a
subscriber that falls behind ``expire()`` gets a loud error (the
parent manifest it needs is gone), never a silent gap.

Row shape: member-table columns + ``_table`` + ``_catalog_version`` +
``_change_type`` (keyed insert/delete/update_preimage/update_postimage
with ``.option("key", ...)``, added/removed otherwise). Member schemas
must match — true by construction for the CDC-apply stores this source
exists for.

Scale: the per-batch work is the member stores' CDF diffs — each
batch-sized by contract (the heavy lifting happened when the versions
were written) — plus O(tables) manifest JSON. Reference analog: none
(the reference is offline single-table); this is the streaming read
side of the multi-table transaction surface.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from log2sql_spark.sources.cdf_datasource import (
    SnapshotCdfStreamReader,
    _local_path,
)


def _member_schema(root: str, tables: list[str] | None) -> StructType:
    from log2sql_spark.store import SnapshotStore, StoreCatalog

    cat = StoreCatalog(root)
    head = cat.head_version()
    if head is None:
        raise ValueError(f"catalog_cdf: catalog at {root} has no versions yet")
    vec = cat.snapshot(head)["tables"]
    names = sorted(tables if tables is not None else vec)
    if not names:
        raise ValueError("catalog_cdf: catalog has no tables")
    schemas = {}
    for n in names:
        entry = vec.get(n)
        if entry is None:
            raise ValueError(f"catalog_cdf: table {n!r} not in catalog head")
        store = SnapshotStore(entry["path"])
        schemas[n] = store.snapshot(entry["version"]).schema_json
    first = json.loads(schemas[names[0]])
    for n, sj in schemas.items():
        if json.loads(sj) != first:
            raise ValueError(
                f"catalog_cdf: member schemas differ ({names[0]} vs {n}); "
                "subscribe per-table via snapshot_cdf for heterogeneous "
                "catalogs"
            )
    return StructType.fromJson(first)


class CatalogCdfDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "catalog_cdf"

    def _tables(self) -> list[str] | None:
        t = self.options.get("tables")
        return [x.strip() for x in t.split(",")] if t else None

    def schema(self) -> StructType:
        base = _member_schema(
            _local_path(self.options.get("path")), self._tables()
        )
        return StructType(
            list(base.fields)
            + [
                StructField("_table", StringType()),
                StructField("_catalog_version", IntegerType()),
                StructField("_change_type", StringType()),
            ]
        )

    def simpleStreamReader(self, schema) -> "CatalogCdfStreamReader":
        return CatalogCdfStreamReader(schema, self.options)


class CatalogCdfStreamReader(SimpleDataSourceStreamReader):
    """Offset = last emitted CATALOG version. Each trigger emits, for
    up to ``maxVersionsPerTrigger`` (default 16) new catalog versions,
    every member table's changes between the pinned store versions of
    consecutive vectors. The atomicity contract is that a batch
    boundary NEVER splits a catalog version: all tables' rows of one
    transaction share a batch (and a ``_catalog_version`` tag); a
    batch may carry several whole versions — same as Delta's streaming
    CDF batching multiple commits under maxFilesPerTrigger. (The
    default is not 1 because availableNow prefetches the simple-reader
    ONCE per trigger cycle: rationing one version per read would
    strand the rest until the next restart.)"""

    def __init__(self, schema: StructType, options):
        self.root = _local_path(options.get("path"))
        if not self.root:
            raise ValueError("catalog_cdf requires a path: .load('/catalog')")
        # member fields = schema minus (_table, _catalog_version, _change_type)
        self.fields = [f.name for f in schema.fields[:-3]]
        self.member_schema = StructType(list(schema.fields[:-3]))
        self.max_versions = int(options.get("maxVersionsPerTrigger", 16))
        self.starting = int(options.get("startingVersion", 0))
        t = options.get("tables")
        self.tables = [x.strip() for x in t.split(",")] if t else None
        self.key = options.get("key")
        self._readers: dict[str, SnapshotCdfStreamReader] = {}

    def _cat(self):
        from log2sql_spark.store import StoreCatalog

        return StoreCatalog(self.root)

    def _store_reader(self, store_path: str) -> SnapshotCdfStreamReader:
        if store_path not in self._readers:
            opts = {"path": store_path}
            if self.key:
                opts["key"] = self.key
            # the per-store reader's schema contract: member fields +
            # (_version, _change_type); we re-tag its tuples below
            st = StructType(
                list(self.member_schema.fields)
                + [
                    StructField("_version", IntegerType()),
                    StructField("_change_type", StringType()),
                ]
            )
            self._readers[store_path] = SnapshotCdfStreamReader(st, opts)
        return self._readers[store_path]

    def initialOffset(self) -> dict:
        return {"version": self.starting - 1 if self.starting > 0 else 0}

    def _vector(self, cat, version: int) -> dict:
        if version < 1:
            return {}
        path = os.path.join(self.root, "_catalog", f"v{version}.json")
        if not os.path.exists(path):
            raise ValueError(
                f"catalog_cdf: catalog version {version} no longer exists "
                "(expired?); the subscriber fell behind retention"
            )
        return cat.snapshot(version)["tables"]

    def _catalog_diff(self, cat, version: int) -> list[tuple]:
        """All subscribed tables' changes between catalog vectors
        version-1 and version, tagged (_table, _catalog_version,
        _change_type)."""
        from log2sql_spark.store import SnapshotStore

        new_vec = self._vector(cat, version)
        old_vec = self._vector(cat, version - 1)
        names = self.tables if self.tables is not None else sorted(new_vec)
        rows: list[tuple] = []
        for name in names:
            entry = new_vec.get(name)
            if entry is None:
                continue  # table not (yet) in this vector
            old = old_vec.get(name)
            lo = old["version"] if old else 0
            hi = entry["version"]
            if hi == lo:
                continue  # unmoved pin: no changes
            if hi < lo:
                # A restore/re-point to an OLDER store version. Silently
                # advancing would be indistinguishable from "no change"
                # downstream while history the subscriber already saw is
                # being rewritten — fail loudly (mirror of the
                # expired-version error) so the consumer resubscribes
                # from a fresh offset instead of reading a torn feed.
                raise ValueError(
                    f"catalog_cdf: table {name!r} pin moved backward "
                    f"({lo} -> {hi}) at catalog v{version} — the feed is "
                    "no longer append-consistent for this table; restart "
                    "the subscription from the current catalog version"
                )
            store = SnapshotStore(entry["path"])
            reader = self._store_reader(entry["path"])
            for sv in range(lo + 1, hi + 1):
                for t in reader._diff(store, sv):
                    # per-store tuple ends with (store_version, change_type)
                    rows.append((*t[:-2], name, version, t[-1]))
        return rows

    def read(self, start: dict):
        cat = self._cat()
        head = cat.head_version() or 0
        lo = start["version"] + 1
        hi = min(head, start["version"] + self.max_versions)
        if hi < lo:
            return [], start
        rows: list[tuple] = []
        for v in range(lo, hi + 1):
            rows.extend(self._catalog_diff(cat, v))
        return rows, {"version": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        cat = self._cat()
        rows: list[tuple] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            rows.extend(self._catalog_diff(cat, v))
        return iter(rows)


def register(spark) -> None:
    spark.dataSource.register(CatalogCdfDataSource)
