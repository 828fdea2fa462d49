"""Multi-table atomic commits: a catalog-level snapshot of snapshots.

Neither Delta nor (classic) Iceberg gives you a transaction ACROSS
tables — a pipeline that updates `orders_current` and `orders_history`
from the same CDC batch exposes readers to one-new/one-old between the
two commits. The production fix (Iceberg REST catalog multi-table
commits, Project Nessie, lakeFS) moves the commit point UP a level:
table snapshots keep committing independently, and a catalog pointer
pins a CONSISTENT vector of (table -> version) that advances atomically.
This module is that catalog over :class:`SnapshotStore`:

* **Layout** — ``<path>/_catalog/v{N}.json``: an append-only manifest
  chain mapping table name -> {path, version}, published with the same
  ``os.link`` put-if-absent protocol as the store itself (the commit
  point is a filesystem primitive, not a lock; losers get
  ``ConflictError`` and rebase).
* **Atomicity** — ``commit_multi`` first lands each table's rows as an
  ORDINARY store commit, then publishes ONE catalog manifest pinning
  all the new versions. Readers that resolve through the catalog
  (``read``/``resolve``) see the old vector or the new vector, never a
  mix. If the catalog publish loses to a same-table writer, the loser
  COMPENSATES: each store whose head is still the loser's own commit
  gets a metadata-only ``restore`` to its pre-transaction version, so
  the aborted rows never surface through a later catalog advance (an
  uncompensated aborted version would sit on the store's linear chain
  and leak into the table's next successful commit for append/merge
  modes). Two residual windows remain and are deliberate: a CRASH
  between the store commits and the catalog publish leaves versions no
  one compensates (the replay/caller must re-drive the transaction —
  for the streaming path the idempotent merges make this safe), and a
  third writer stacking a commit on top of the loser's within the race
  window makes that table uncompensatable (reported in the raised
  ConflictError as ``uncompensated``; caller must reconcile).
* **Isolation from vacuum** — publishing catalog version N creates an
  Iceberg-style tag (``cat-<id>-v{N}-<attempt-nonce>``, recorded in
  the manifest) on every member store at its pinned version, so a
  store-level ``vacuum`` can never reclaim a version the catalog can
  still serve; ``expire`` drops old catalog versions AND exactly their
  recorded tags, returning those store versions to the normal
  retention policy. Tags are attempt-unique so a publish-race loser's
  cleanup can only ever drop its own pins, never the winner's.
* **Concurrency** — two catalog writers race on the next manifest
  version. The loser rebases: if the winner moved DISJOINT tables, the
  loser's pins are still valid against the new head and it republishes
  (manifest-only, no table work); if the winner moved one of the
  loser's tables, the data race is real and ``ConflictError``
  propagates for the caller to recompute from the new state.

At 100 TB the catalog stays O(tables) metadata: no data moves through
it, ever — commit cost is the member stores' own commit cost plus two
tiny JSON writes, and the consistent-read guarantee costs readers one
manifest load.

Reference analog: none (the reference is a 305-LoC single-table CDC
parser); this is the engine-extension surface BASELINE.json's table-
format north star calls for, one level above store/snapshots.py.
"""

from __future__ import annotations

import json
import os
import threading
import time

from pyspark.sql import DataFrame, SparkSession

from log2sql_spark.store.snapshots import ConflictError, SnapshotStore


class StoreCatalog:
    def __init__(self, path: str):
        self.path = path
        self._dir = os.path.join(path, "_catalog")
        os.makedirs(self._dir, exist_ok=True)
        id_file = os.path.join(self._dir, "catalog_id")
        if not os.path.exists(id_file):
            tmp = f"{id_file}.{os.getpid()}.{threading.get_ident()}.tmp"
            with open(tmp, "w") as f:
                f.write(os.urandom(6).hex())
            try:
                os.link(tmp, id_file)  # first creator wins; racers converge
            except FileExistsError:
                pass
            finally:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass
        with open(id_file) as f:
            self.catalog_id = f.read().strip()

    # -- manifest chain -------------------------------------------------
    def versions(self) -> list[int]:
        out = []
        for f in os.listdir(self._dir):
            if f.startswith("v") and f.endswith(".json"):
                out.append(int(f[1:-5]))
        return sorted(out)

    def head_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def snapshot(self, version: int | None = None) -> dict:
        v = self.head_version() if version is None else version
        if v is None:
            return {"version": 0, "tables": {}}
        with open(os.path.join(self._dir, f"v{v}.json")) as f:
            return json.load(f)

    def _publish(self, manifest: dict) -> None:
        final = os.path.join(self._dir, f"v{manifest['version']}.json")
        tmp = f"{final}.{os.getpid()}.{threading.get_ident()}.inflight"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        try:
            os.link(tmp, final)  # atomic put-if-absent, same as the store
        except FileExistsError:
            raise ConflictError(
                f"catalog version {manifest['version']} was published by "
                "another writer"
            ) from None
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass

    def _tag_name(self, catalog_version: int, nonce: str) -> str:
        # ATTEMPT-unique (nonce), not just version-unique: two writers
        # racing the same next catalog version must never share a tag
        # name, or the loser's cleanup would drop the winner's vacuum
        # pin (and a loser's earlier create_tag could pin a DIFFERENT
        # store version than the winner's manifest records). Each
        # attempt tags under its own name; the winner's manifest
        # records its tag so expire() can release exactly it, and a
        # loser drops only its own.
        return f"cat-{self.catalog_id}-v{catalog_version}-{nonce}"

    def _pin(self, tables: dict, tag: str) -> None:
        for entry in tables.values():
            store = SnapshotStore(entry["path"])
            if tag not in store.tags():
                store.create_tag(tag, entry["version"])

    def _unpin(self, tables: dict, tag: str) -> None:
        for entry in tables.values():
            store = SnapshotStore(entry["path"])
            try:
                store.drop_tag(tag)
            except ValueError:
                pass

    # -- write paths ----------------------------------------------------
    def register(self, name: str, store_path: str) -> int:
        """Add (or re-point) a table at the store's CURRENT head.
        One catalog commit; other tables carry unchanged."""
        store = SnapshotStore(store_path)
        head = store.head_version()
        if head is None:
            raise ValueError(f"cannot register empty store at {store_path}")
        return self._commit_pins({name: (store_path, head)})

    def commit_multi(
        self,
        spark: SparkSession,
        writes: dict[str, tuple[DataFrame, dict]],
        max_retries: int = 0,
    ) -> int:
        """Atomically advance several tables: land each table's rows as
        an ordinary store commit (kwargs pass through — mode,
        cluster_by, target_files, ...), then publish ONE catalog
        version pinning all the new store versions. ``max_retries``
        covers the CATALOG race only (disjoint-table rebase is
        manifest-only); per-store commit kwargs may carry their own
        max_retries for the store-level race.

        On a catalog ConflictError (same table moved by a concurrent
        writer) the store commits this attempt landed are rolled back
        with metadata-only ``restore`` commits, so cross-table
        atomicity holds for aborted writers too — no aborted rows ride
        into the table's next successful catalog advance. A store whose
        head already moved past our commit (a third writer stacked on
        top inside the race window) cannot be compensated; its name is
        carried on the raised error as ``exc.uncompensated``."""
        head = self.snapshot()
        pins: dict[str, tuple[str, int]] = {}
        committed: list[tuple[SnapshotStore, int, int, str]] = []
        for name, (df, kwargs) in writes.items():
            entry = head["tables"].get(name)
            if entry is None:
                raise ValueError(
                    f"table {name!r} not registered in catalog; register() first"
                )
            store = SnapshotStore(entry["path"])
            parent = store.head_version()
            v = store.commit(df, **kwargs)
            committed.append((store, parent, v, name))
            pins[name] = (entry["path"], v)
        try:
            return self._commit_pins(pins, base=head, max_retries=max_retries)
        except ConflictError as exc:
            uncompensated: list[str] = []
            for store, parent, v, name in committed:
                # Compensate only when the chain top is still OUR
                # commit: restoring under someone else's head would
                # silently revert THEIR rows.
                if store.head_version() == v and parent is not None:
                    try:
                        store.restore(parent)
                    except (ConflictError, ValueError):
                        uncompensated.append(name)
                else:
                    uncompensated.append(name)
            exc.uncompensated = uncompensated  # type: ignore[attr-defined]
            raise

    def _commit_pins(
        self,
        pins: dict[str, tuple[str, int]],
        base: dict | None = None,
        max_retries: int = 0,
        meta: dict | None = None,
    ) -> int:
        """Publish a catalog version applying ``pins`` on top of
        ``base`` (the snapshot the caller's writes DERIVED from —
        conflicts are judged against it, not against whatever head
        exists at publish time: a table that moved since the caller
        read it is a real data race even if the publish slot is free)."""
        last: ConflictError | None = None
        if base is None:
            base = self.snapshot()
        derived_from = base
        head = self.snapshot()
        if head["version"] != base["version"]:
            # head moved between the caller's read and this publish:
            # same check as the in-loop rebase below, applied up front
            for name in pins:
                if (derived_from["tables"].get(name) or {}) != (
                    head["tables"].get(name) or {}
                ):
                    raise ConflictError(
                        f"catalog table {name!r} was moved by a concurrent "
                        "writer; recompute against the new state"
                    )
            base = head
        for _ in range(max_retries + 1):
            version = base["version"] + 1
            tables = dict(base["tables"])
            for name, (path, v) in pins.items():
                tables[name] = {"path": os.path.abspath(path), "version": v}
            tag = self._tag_name(version, os.urandom(4).hex())
            self._pin(tables, tag)
            try:
                self._publish(
                    {
                        "version": version,
                        "parent": base["version"],
                        "tables": tables,
                        "tag": tag,
                        "meta": meta or {},
                        "created_at": time.time(),
                    }
                )
                return version
            except ConflictError as exc:
                self._unpin(tables, tag)  # only OUR attempt's tags
                last = exc
                new = self.snapshot()
                for name in pins:
                    ours = derived_from["tables"].get(name)
                    theirs = new["tables"].get(name)
                    if (ours or {}) != (theirs or {}):
                        raise ConflictError(
                            f"catalog table {name!r} was moved by a concurrent "
                            "writer; recompute against the new state"
                        ) from exc
                base = new  # disjoint tables moved: rebase manifest-only
        raise last  # type: ignore[misc]

    # -- read paths -------------------------------------------------------
    def resolve(self, version: int | None = None) -> dict[str, tuple[str, int]]:
        snap = self.snapshot(version)
        return {
            name: (entry["path"], entry["version"])
            for name, entry in sorted(snap["tables"].items())
        }

    def read(
        self, spark: SparkSession, name: str, version: int | None = None
    ) -> DataFrame:
        snap = self.snapshot(version)
        entry = snap["tables"].get(name)
        if entry is None:
            raise ValueError(
                f"table {name!r} not in catalog version {snap['version']}"
            )
        return SnapshotStore(entry["path"]).read(spark, version=entry["version"])

    def read_changes(
        self,
        spark: SparkSession,
        name: str,
        from_version: int,
        to_version: int,
        key_cols=None,
    ) -> DataFrame:
        """Cross-table-consistent CDF: the keyed change feed of ONE
        member table between two CATALOG versions — i.e. between the
        store versions the catalog pinned at those vectors, not
        whatever the store head did in the meantime. Because every
        table's changes are addressed by the same pair of catalog
        versions, a consumer diffing N tables gets N feeds that all
        cut at the SAME transaction boundaries — the cross-table
        release-notes read a per-store CDF cannot give (its version
        axis is private to each table). A table absent from either
        vector raises; a table whose pin did not move returns an
        empty feed (store CDF over a zero-length range)."""
        lo = self.snapshot(from_version)["tables"].get(name)
        hi = self.snapshot(to_version)["tables"].get(name)
        if lo is None or hi is None:
            raise ValueError(
                f"table {name!r} not present in catalog versions "
                f"{from_version}..{to_version}"
            )
        store = SnapshotStore(hi["path"])
        if lo["version"] == hi["version"]:
            # unmoved pin: an EMPTY feed with the real feed schema
            # (table columns + _change_type + _commit_version), never
            # the store-head drift the catalog did not publish
            from pyspark.sql import functions as F

            base = store.read(spark, version=hi["version"]).limit(0)
            return base.select(
                "*",
                F.lit(None).cast("string").alias("_change_type"),
                F.lit(None).cast("long").alias("_commit_version"),
            )
        return store.read_changes(
            spark, lo["version"], hi["version"], key_cols=key_cols
        )

    def read_changes_all(
        self,
        spark: SparkSession,
        from_version: int,
        to_version: int,
        key_cols=None,
        tables: list[str] | None = None,
    ) -> DataFrame:
        """Every member table's keyed change feed between two CATALOG
        versions, unioned with a ``_table`` column — the batch twin of
        the ``catalog_cdf`` streaming source. All feeds cut at the same
        transaction boundaries (the catalog vectors), so a consumer
        diffing N tables reads ONE frame that provably describes the
        same transactions. A table present only in the to-vector
        (registered mid-range) contributes its full pinned state as
        inserts at ``_commit_version`` = its pin. Member schemas must
        match (they do for the CDC-apply stores; heterogeneous
        catalogs should read per-table via read_changes)."""
        from pyspark.sql import functions as F

        to_snap = self.snapshot(to_version)
        from_snap = self.snapshot(from_version)
        names = sorted(tables if tables is not None else to_snap["tables"])
        out: DataFrame | None = None
        for name in names:
            hi = to_snap["tables"].get(name)
            if hi is None:
                raise ValueError(
                    f"table {name!r} not in catalog version {to_version}"
                )
            if name in from_snap["tables"]:
                feed = self.read_changes(
                    spark, name, from_version, to_version, key_cols=key_cols
                )
            else:
                store = SnapshotStore(hi["path"])
                feed = store.read(spark, version=hi["version"]).select(
                    "*",
                    F.lit("insert").alias("_change_type"),
                    F.lit(hi["version"]).cast("long").alias("_commit_version"),
                )
            feed = feed.select(F.lit(name).alias("_table"), "*")
            out = feed if out is None else out.unionByName(feed)
        if out is None:
            raise ValueError("catalog has no tables to read changes for")
        return out

    def fsck(self) -> list[str]:
        """Catalog-level integrity check: every live catalog version
        must resolve — each pinned (path, version) exists in its member
        store, the version's pin tag is present at the right store
        version, and each member store passes its own fsck at the
        pinned version. Returns problems (empty = clean)."""
        problems: list[str] = []
        for v in self.versions():
            snap = self.snapshot(v)
            for name, entry in snap["tables"].items():
                try:
                    store = SnapshotStore(entry["path"])
                except Exception as exc:  # noqa: BLE001
                    problems.append(f"v{v}/{name}: store unreadable: {exc}")
                    continue
                if entry["version"] not in store.versions():
                    problems.append(
                        f"v{v}/{name}: pinned store version "
                        f"{entry['version']} missing from {entry['path']}"
                    )
                    continue
                tag_v = store.tags().get(snap["tag"])
                if tag_v != entry["version"]:
                    problems.append(
                        f"v{v}/{name}: pin tag {snap['tag']!r} "
                        f"points at {tag_v}, manifest pins {entry['version']}"
                    )
                problems.extend(
                    f"v{v}/{name}: {m}" for m in store.fsck(entry["version"])
                )
        return problems

    # -- retention --------------------------------------------------------
    def expire(self, keep_last: int = 1) -> list[int]:
        """Drop catalog versions beyond the newest ``keep_last`` and
        their store tags, returning the dropped versions. The member
        stores' own vacuum then reclaims data under their normal
        policy — expiry here only releases the pins."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        vs = self.versions()
        dropped = []
        for v in vs[:-keep_last] if len(vs) > keep_last else []:
            snap = self.snapshot(v)
            # Manifest FIRST, pins second: a crash between the two
            # degrades to a safe orphan tag (janitor() reaps it later).
            # The old order left a listed catalog version whose pins
            # were already gone — a reader/vacuum racing the crash
            # window could resolve a version whose store data was
            # reclaimable.
            os.remove(os.path.join(self._dir, f"v{v}.json"))
            self._unpin(snap["tables"], snap["tag"])
            dropped.append(v)
        return dropped

    def janitor(
        self,
        older_than_secs: float = 3600.0,
        now: float | None = None,
        extra_store_paths: tuple[str, ...] = (),
    ) -> list[str]:
        """Reap orphan pin tags: ``cat-<catalog_id>-*`` tags on member
        stores that no live catalog manifest records. Two crash windows
        create them — a writer that ``_pin``-ed then died before
        ``_publish`` (its tags pin store versions forever, no manifest
        to ``expire``), and an ``expire`` that removed the manifest
        then died before unpinning. Age-gated (default 1 h) so an
        in-flight writer's pins — created microseconds before its
        publish — are never reaped out from under it. Scans every store
        referenced by a live manifest plus ``extra_store_paths`` (for
        stores whose only referencing manifest was itself expired).
        Returns ``store_path:tag`` for each dropped tag."""
        now = time.time() if now is None else now
        live_tags = set()
        paths = {os.path.abspath(p) for p in extra_store_paths}
        for v in self.versions():
            snap = self.snapshot(v)
            live_tags.add(snap["tag"])
            for entry in snap["tables"].values():
                paths.add(entry["path"])
        prefix = f"cat-{self.catalog_id}-"
        dropped: list[str] = []
        for p in sorted(paths):
            d = os.path.join(p, "_refs", "tags")
            if not os.path.isdir(d):
                continue
            store = SnapshotStore(p)
            for f in sorted(os.listdir(d)):
                name = f[:-5]
                if not (f.endswith(".json") and name.startswith(prefix)):
                    continue
                if name in live_tags:
                    continue
                try:
                    with open(os.path.join(d, f)) as fh:
                        created = json.load(fh).get("created_at", now)
                except (OSError, json.JSONDecodeError):
                    continue
                if now - created > older_than_secs:
                    try:
                        store.drop_tag(name)
                        dropped.append(f"{p}:{name}")
                    except ValueError:
                        pass  # concurrent janitor got it first
        return dropped
