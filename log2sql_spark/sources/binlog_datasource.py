"""Python DataSource V2: ``spark.read.format("binlog").load(path)``.

The most idiomatic Spark packaging of the binlog reader (Spark 4's
Python DataSource API): the envelope schema is the source schema, one
input partition per dump file (parallelism = file count, matching
``read_binlog``'s wholetext plan), and predicate pushdown is REAL —
equality/IN on (op, db, table) and range comparisons on
(start_pos, stop_pos) are evaluated inside the source before rows ever
reach Spark, reproducing the reference's R1 argv-level range pushdown
(``main.py:88-105``) at the DataSource boundary.

Registration happens in ``log2sql_spark.get_spark`` (best-effort), so
any session can use the format name directly.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Iterable, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

from log2sql_spark.sources.binlog import ENVELOPE_SCHEMA, parse_binlog_lines

_EQ_COLS = {"op", "db", "table"}
_RANGE_COLS = {"start_pos", "stop_pos"}


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class BinlogReaderBase(DataSourceReader):
    """Scan without pushdown — used when the session has
    ``spark.sql.python.filterPushdown.enabled=false`` (a reader that
    defines pushFilters under that conf is rejected outright)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("binlog source requires a path: .load('/dumps/*.txt')")
        # pushed predicates: col -> set (equality/IN), col -> [(op, bound)]
        self.eq: dict[str, set] = {}
        self.ranges: dict[str, list[tuple[str, int]]] = {}

    def partitions(self) -> list[_FilePartition]:
        paths = (
            sorted(glob.glob(os.path.join(self.path, "*")))
            if os.path.isdir(self.path)
            else sorted(glob.glob(self.path))
        )
        if not paths:
            raise FileNotFoundError(f"no binlog dumps match {self.path!r}")
        return [_FilePartition(p) for p in paths]

    def _keep(self, ev: dict) -> bool:
        for col, allowed in self.eq.items():
            if ev.get(col) not in allowed:
                return False
        for col, bounds in self.ranges.items():
            v = ev.get(col)
            if v is None:
                return False
            for op, bound in bounds:
                if op == ">" and not v > bound:
                    return False
                if op == ">=" and not v >= bound:
                    return False
                if op == "<" and not v < bound:
                    return False
                if op == "<=" and not v <= bound:
                    return False
        return True

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        with open(partition.path, encoding="utf-8", errors="replace") as fh:
            # split('\n') to match the line-based text source exactly
            # (splitlines also breaks on \x1c-\x1e/\x85, corrupting values)
            lines = fh.read().split("\n")
        fields = [f.name for f in ENVELOPE_SCHEMA.fields]
        for ev in parse_binlog_lines(lines, file=partition.path):
            if self._keep(ev):
                yield tuple(ev.get(name) for name in fields)


class BinlogReader(BinlogReaderBase):
    """Scan WITH predicate pushdown (requires the filterPushdown conf)."""

    def pushFilters(self, filters: list[Filter]) -> Iterable[Filter]:
        # Built EAGERLY (plain list, not a generator): Spark treats every
        # filter NOT returned as handled by the source, so the side
        # effects recording pushed predicates must happen unconditionally
        # in the method body — a lazily-consumed generator would let a
        # partial iteration return rows as if filtered.
        def constrain(col: str, allowed: set) -> None:
            # filters are ANDed: multiple predicates on one column
            # INTERSECT (unioning them would silently widen to OR)
            self.eq[col] = (self.eq[col] & allowed) if col in self.eq else allowed

        unsupported: list[Filter] = []
        for f in filters:
            col = f.attribute[-1] if hasattr(f, "attribute") else None
            if isinstance(f, EqualTo) and col in _EQ_COLS:
                constrain(col, {f.value})
            elif isinstance(f, In) and col in _EQ_COLS:
                constrain(col, set(f.value))
            elif isinstance(f, GreaterThan) and col in _RANGE_COLS:
                self.ranges.setdefault(col, []).append((">", f.value))
            elif isinstance(f, GreaterThanOrEqual) and col in _RANGE_COLS:
                self.ranges.setdefault(col, []).append((">=", f.value))
            elif isinstance(f, LessThan) and col in _RANGE_COLS:
                self.ranges.setdefault(col, []).append(("<", f.value))
            elif isinstance(f, LessThanOrEqual) and col in _RANGE_COLS:
                self.ranges.setdefault(col, []).append(("<=", f.value))
            else:
                unsupported.append(f)  # Spark evaluates these post-scan
        return unsupported


class BinlogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "binlog"

    def schema(self):
        return ENVELOPE_SCHEMA

    def reader(self, schema) -> BinlogReaderBase:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        try:
            enabled = (
                spark is not None
                and spark.conf.get("spark.sql.python.filterPushdown.enabled", "false")
                == "true"
            )
        except Exception:
            enabled = False
        return BinlogReader(self.options) if enabled else BinlogReaderBase(self.options)

    def simpleStreamReader(self, schema) -> "BinlogStreamReader":
        return BinlogStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> "BinlogSqlWriter":
        if "sql_text" not in [f.name for f in schema.fields]:
            raise ValueError(
                "binlog sink requires a 'sql_text' column (rendered replay/"
                f"flashback SQL); got {[f.name for f in schema.fields]}"
            )
        return BinlogSqlWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "BinlogSqlStreamWriter":
        if "sql_text" not in [f.name for f in schema.fields]:
            raise ValueError(
                "binlog stream sink requires a 'sql_text' column; got "
                f"{[f.name for f in schema.fields]}"
            )
        return BinlogSqlStreamWriter(self.options)


class _SqlFileCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int):
        self.path = path
        self.n_rows = n_rows


class BinlogSqlWriter(DataSourceWriter):
    """Distributed ``.sql`` file sink: ``df.write.format("binlog")``.

    The reference's only sink is stdout print of rendered statements
    (``log2sql.py:14,62,185``); this is that sink made distributed and
    atomic-ish via stage-and-rename: each task writes its rows'
    ``sql_text`` to a dot-prefixed ``.inflight-*`` temp (executor-side,
    no driver collect), and only ``commit()`` renames reported temps to
    their visible ``part-*.sql`` names — so a task attempt that dies
    mid-write leaves an invisible temp, never a half file a reader
    could pick up, and a retry cannot double-publish. Commit writes a
    _SUCCESS manifest with the total row count and sweeps stale
    ``.inflight-*`` orphans; abort removes the reported temps.

    Overwrite mode is also deferred to ``commit()``: the previous
    output stays intact until every task has reported, so a failed
    overwrite job leaves the old contents untouched (non-destructive
    overwrite). Filenames embed a per-attempt uuid so append mode never
    clobbers an earlier write.

    Rename-at-commit runs driver-side — like the streaming twin, the
    sink root must be a shared (or local) filesystem."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("binlog sink requires a path")
        self.overwrite = overwrite

    def write(self, iterator) -> _SqlFileCommit:
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(
            self.path, f".inflight-part-{pid:05d}-{uuid.uuid4().hex[:8]}.sql"
        )
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(row["sql_text"])
                fh.write("\n")
                n += 1
        if n == 0:
            os.remove(tmp)
            return _SqlFileCommit("", 0)
        return _SqlFileCommit(tmp, n)

    def commit(self, messages) -> None:
        import glob as _glob

        if self.overwrite:  # old output survives until every task reported
            for old in _glob.glob(os.path.join(self.path, "part-*.sql")) + [
                os.path.join(self.path, "_SUCCESS")
            ]:
                try:
                    os.remove(old)
                except OSError:
                    pass
        total = 0
        committed = set()
        for m in messages:
            if m is not None and m.path:
                final = os.path.join(
                    self.path, os.path.basename(m.path)[len(".inflight-"):]
                )
                os.rename(m.path, final)
                committed.add(m.path)
                total += m.n_rows
        # crashed/zombie attempts left temps no message reports: sweep
        # them (single concurrent writer per sink dir, as with any
        # file-based Spark sink).
        for stale in _glob.glob(os.path.join(self.path, ".inflight-*.sql")):
            if stale not in committed:
                try:
                    os.remove(stale)
                except OSError:
                    pass
        with open(os.path.join(self.path, "_SUCCESS"), "w", encoding="utf-8") as fh:
            fh.write(f"{total}\n")

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and m.path:
                try:
                    os.remove(m.path)
                except OSError:
                    pass


class BinlogSqlStreamWriter(DataSourceStreamWriter):
    """Streaming twin of the .sql sink: ``writeStream.format("binlog")``.

    Each micro-batch lands in its own ``batch=<id>`` subdirectory (the
    same idempotent batch_id-partitioned layout as
    ``streaming/cdc_stream.py``'s foreachBatch sink): a replayed batch
    overwrites its own directory and no other, so the sink is
    exactly-once downstream of the checkpoint.

    Commit renames executor-written ``.inflight-*`` temps driver-side,
    so the sink root must be a filesystem both sides see (local dir,
    NFS, or a FUSE-mounted object store) — the standard assumption of
    rename-based committers. Crashed attempts leave orphaned temps that
    no commit message reports; each commit sweeps any strays left in
    the root after renaming its own batch's files."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("binlog stream sink requires .option('path', dir)")

    def write(self, iterator) -> _SqlFileCommit:
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(
            self.path, f".inflight-{pid:05d}-{uuid.uuid4().hex[:8]}.sql"
        )
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(row["sql_text"])
                fh.write("\n")
                n += 1
        if n == 0:
            os.remove(tmp)
            return _SqlFileCommit("", 0)
        return _SqlFileCommit(tmp, n)

    def commit(self, messages, batchId: int) -> None:
        import glob as _glob
        import shutil

        bdir = os.path.join(self.path, f"batch={batchId}")
        shutil.rmtree(bdir, ignore_errors=True)  # replay overwrites itself
        os.makedirs(bdir, exist_ok=True)
        total = 0
        for i, m in enumerate(messages):
            if m is not None and m.path:
                os.rename(m.path, os.path.join(bdir, f"part-{i:05d}.sql"))
                total += m.n_rows
        with open(os.path.join(bdir, "_SUCCESS"), "w", encoding="utf-8") as fh:
            fh.write(f"{total}\n")
        # orphans from crashed attempts (no message ever reports them):
        # micro-batches run sequentially, so anything still in the root
        # after this batch's renames is stale.
        for stale in _glob.glob(os.path.join(self.path, ".inflight-*.sql")):
            try:
                os.remove(stale)
            except OSError:
                pass

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and m.path:
                try:
                    os.remove(m.path)
                except OSError:
                    pass


def register(spark) -> None:
    """Idempotent registration of the 'binlog' format + the runtime conf
    its pushdown needs. Called from ``get_spark`` AND from queries, so a
    foreign session (the driver's) gets the format too."""
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass  # conf locked down: pushFilters then simply isn't consulted
    try:
        spark.dataSource.register(BinlogDataSource)
    except Exception:
        pass  # already registered in this session


class BinlogStreamReader(SimpleDataSourceStreamReader):
    """Streaming scan: ``spark.readStream.format("binlog")``.

    Offset = the last processed file name. Binlog files are
    sequence-numbered (mysql-bin.000001, .000002, ...), so lexicographic
    file order IS rotation order; each micro-batch picks up every file
    strictly after the offset, whole files at a time (a file is never
    split across batches — the envelope parser needs complete files).
    Replays between checkpointed offsets are exact (readBetweenOffsets
    re-parses the same file window), giving the streaming twin of the
    batch scan the same ordering contract the foreachBatch pipeline has.
    """

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("binlog stream requires a path: .load('/dumps')")
        # caps driver-side materialization per trigger — catching up on a
        # directory of rotated dumps must not parse them all in one batch
        self.max_files = int(options.get("maxFilesPerTrigger", 16))

    def _files(self) -> list[str]:
        return (
            sorted(glob.glob(os.path.join(self.path, "*")))
            if os.path.isdir(self.path)
            else sorted(glob.glob(self.path))
        )

    def initialOffset(self) -> dict:
        return {"last_file": ""}

    def _parse_files(self, paths: list[str]) -> list[tuple]:
        # materialized list, not a generator: Spark's prefetch cache
        # copy.copy()s the returned iterator, which generators reject.
        fields = [f.name for f in ENVELOPE_SCHEMA.fields]
        out = []
        for p in paths:
            with open(p, encoding="utf-8", errors="replace") as fh:
                lines = fh.read().split("\n")
            for ev in parse_binlog_lines(lines, file=p):
                out.append(tuple(ev.get(name) for name in fields))
        return out

    def read(self, start: dict):
        new = [p for p in self._files() if p > start["last_file"]][: self.max_files]
        if not new:
            return [], start
        return self._parse_files(new), {"last_file": new[-1]}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        window = [
            p for p in self._files() if start["last_file"] < p <= end["last_file"]
        ]
        return iter(self._parse_files(window))
