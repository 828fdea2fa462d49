"""Split-parse equivalence: chunked intra-file parallel parsing must be
byte-for-byte identical to the whole-file parse — same events, same
global event_seq, same DDL `use` resolution — for every chunk size,
including pathological ones that slice mid-line and mid-event."""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import pytest

from log2sql_spark.sources.binlog import read_binlog, read_binlog_split
from log2sql_spark.sources.binlog_fixture import render_binlog

TS = datetime(2024, 5, 1, 12, 0, 7)


def _mixed_events(n: int) -> list[dict]:
    """insert/update/delete/ddl mix; the ddl at index 2 precedes any later
    `use`, so chunked parsing must carry the db across chunk boundaries."""
    evs: list[dict] = []
    for i in range(n):
        ts = TS + timedelta(seconds=i)
        k = i % 4
        if k == 0:
            evs.append(
                {
                    "op": "insert",
                    "db": "shop",
                    "table": "orders",
                    "ts": ts,
                    "values": [(1, str(i)), (2, f"'name={i}'"), (3, "99.5")],
                }
            )
        elif k == 1:
            evs.append(
                {
                    "op": "update",
                    "db": "shop",
                    "table": "orders",
                    "ts": ts,
                    "before": [(1, str(i)), (2, "'old'")],
                    "after": [(1, str(i)), (2, "'new'")],
                }
            )
        elif k == 2:
            evs.append(
                {
                    "op": "ddl",
                    "db": "shop",
                    "table": None,
                    "ts": ts,
                    "statement": f"ALTER TABLE orders ADD COLUMN c{i} INT",
                }
            )
        else:
            evs.append(
                {
                    "op": "delete",
                    "db": "shop",
                    "table": "orders",
                    "ts": ts,
                    "values": [(1, str(i))],
                }
            )
    return evs


def _rows(df):
    out = []
    for r in df.collect():
        d = r.asDict()
        d["file"] = os.path.basename(d["file"])  # text source uses file:// URIs
        out.append(d)
    return sorted(out, key=lambda d: (d["file"], d["event_seq"]))


@pytest.fixture(scope="module")
def dump(tmp_path_factory):
    path = tmp_path_factory.mktemp("split") / "mysql-bin.000042.txt"
    path.write_text(render_binlog(_mixed_events(40)))
    return str(path)


def test_split_parse_equals_whole_file(spark, dump):
    whole = _rows(read_binlog(spark, dump))
    assert len(whole) == 40
    size = os.path.getsize(dump)
    for chunk_bytes in (size + 1, size // 2 + 1, 700, 137):
        split = _rows(read_binlog_split(spark, dump, chunk_bytes=chunk_bytes))
        assert split == whole, f"chunk_bytes={chunk_bytes}"


def test_split_parse_carries_use_db_across_chunks(spark, tmp_path):
    """A DDL event with NO `use` line of its own (mysqlbinlog only emits
    `use` when the session db changes) must inherit the db from an
    earlier chunk's `use` — the one piece of parser state that crosses
    event-group boundaries."""
    text = render_binlog(_mixed_events(40))
    first_use, out = True, []
    for line in text.split("\n"):
        if line.startswith("use `"):
            if first_use:
                out.append(line)
                first_use = False
            continue  # later DDLs rely on session-db state
        out.append(line)
    path = tmp_path / "mysql-bin.000007.txt"
    path.write_text("\n".join(out))

    whole = _rows(read_binlog(spark, str(path)))
    ddls = [d for d in whole if d["op"] == "ddl"]
    assert len(ddls) == 10 and all(d["db"] == "shop" for d in ddls)
    for chunk_bytes in (700, 137):
        split = _rows(read_binlog_split(spark, str(path), chunk_bytes=chunk_bytes))
        assert split == whole, f"chunk_bytes={chunk_bytes}"


def test_split_parse_multifile(spark, tmp_path):
    """Chunking composes with multi-file parallelism: event_seq restarts
    per file, exactly like the whole-file path."""
    for i in (1, 2):
        (tmp_path / f"mysql-bin.00000{i}.txt").write_text(
            render_binlog(_mixed_events(8 * i))
        )
    whole = _rows(read_binlog(spark, str(tmp_path / "*.txt")))
    split = _rows(read_binlog_split(spark, str(tmp_path / "*.txt"), chunk_bytes=256))
    assert split == whole
    per_file = {}
    for d in split:
        per_file.setdefault(d["file"], []).append(d["event_seq"])
    assert set(per_file) == {"mysql-bin.000001.txt", "mysql-bin.000002.txt"}
    for seqs in per_file.values():
        assert seqs == list(range(len(seqs)))
