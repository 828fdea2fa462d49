"""Raw-binlog front-end tests (reference main.py:88-105 parity).

``mysqlbinlog`` is not installed in this container, so the tests drive
the front-end with a FAKE binary — a shell script that records its argv
and emits a pre-rendered dump — proving both the argv construction and
the decode→parse round-trip without the real client.
"""

from __future__ import annotations

import os
import stat
from datetime import datetime

import pytest

from log2sql_spark.sources.binlog_raw import (
    dump_binlog,
    mysqlbinlog_argv,
    read_binlog_raw,
)
from log2sql_spark.sources.binlog_fixture import render_binlog

TS = datetime(2024, 5, 1, 12, 0, 7)

EVENTS = [
    {"op": "insert", "db": "shop", "table": "orders", "ts": TS,
     "values": [(1, "1"), (2, "'pending'")]},
    {"op": "update", "db": "shop", "table": "orders", "ts": TS,
     "before": [(1, "1"), (2, "'pending'")], "after": [(1, "1"), (2, "'shipped'")]},
    {"op": "delete", "db": "shop", "table": "orders", "ts": TS,
     "values": [(1, "1"), (2, "'shipped'")]},
]


def test_argv_matches_reference_surface():
    """Same options as reference main.py:90-102: range flags only when
    set and non-zero, decode-rows + -vv always, file last."""
    assert mysqlbinlog_argv("mysql-bin.000057") == [
        "mysqlbinlog", "--base64-output=decode-rows", "-vv", "mysql-bin.000057",
    ]
    assert mysqlbinlog_argv(
        "f", start_position=4, stop_position=120,
        start_datetime="2024-05-01 00:00:00", stop_datetime="2024-05-02 00:00:00",
    ) == [
        "mysqlbinlog",
        "--start-position=4",
        "--stop-position=120",
        "--start-datetime=2024-05-01 00:00:00",
        "--stop-datetime=2024-05-02 00:00:00",
        "--base64-output=decode-rows", "-vv", "f",
    ]
    # reference skips zero positions (main.py:95: `value != "" and value != 0`)
    assert mysqlbinlog_argv("f", start_position=0, stop_position=None) == [
        "mysqlbinlog", "--base64-output=decode-rows", "-vv", "f",
    ]


@pytest.fixture()
def fake_mysqlbinlog(tmp_path):
    """A fake mysqlbinlog: logs argv, then cats its last argument (the
    'raw' file, which the fixture pre-fills with rendered dump text)."""
    bindir = tmp_path / "bin"
    bindir.mkdir()
    argv_log = tmp_path / "argv.log"
    script = bindir / "mysqlbinlog"
    script.write_text(
        "#!/bin/sh\n"
        f'printf \'%s\\n\' "$@" > "{argv_log}"\n'
        'for last; do :; done\n'
        'cat "$last"\n'
    )
    script.chmod(script.stat().st_mode | stat.S_IXUSR | stat.S_IXGRP | stat.S_IXOTH)
    raw = tmp_path / "mysql-bin.000001"
    raw.write_text(render_binlog(EVENTS))
    return {"bindir": str(bindir), "argv_log": argv_log, "raw": str(raw),
            "script": str(script)}


def test_dump_binlog_fake_on_path(fake_mysqlbinlog, monkeypatch):
    monkeypatch.setenv("PATH", fake_mysqlbinlog["bindir"] + os.pathsep + os.environ["PATH"])
    text = dump_binlog(
        fake_mysqlbinlog["raw"], start_position=4,
        stop_datetime="2024-05-01 13:00:00",
    )
    assert "### INSERT INTO `shop`.`orders`" in text
    logged = fake_mysqlbinlog["argv_log"].read_text().splitlines()
    assert logged == [
        "--start-position=4",
        "--stop-datetime=2024-05-01 13:00:00",
        "--base64-output=decode-rows", "-vv", fake_mysqlbinlog["raw"],
    ]


def test_dump_binlog_missing_binary():
    with pytest.raises(FileNotFoundError, match="not found on PATH"):
        dump_binlog("f", binary="definitely-not-a-real-binary-xyz")


def test_read_binlog_raw_missing_binary(spark):
    with pytest.raises(FileNotFoundError):
        read_binlog_raw(spark, "f", binary="definitely-not-a-real-binary-xyz")


def test_read_binlog_raw_roundtrip(spark, fake_mysqlbinlog, tmp_path):
    """Envelope rows from the raw path ≡ rows from read_binlog on the
    equivalent text dump (same parser, different front door)."""
    from log2sql_spark.sources.binlog import read_binlog

    dump_txt = tmp_path / "dump.txt"
    dump_txt.write_text(render_binlog(EVENTS))

    # absolute-path binary: executor tasks resolve it without PATH games
    raw_df = read_binlog_raw(
        spark, fake_mysqlbinlog["raw"], binary=fake_mysqlbinlog["script"]
    ).drop("file")
    txt_df = read_binlog(spark, str(dump_txt)).drop("file")

    raw_rows = sorted((r.asDict() for r in raw_df.collect()),
                      key=lambda d: d["event_seq"])
    txt_rows = sorted((r.asDict() for r in txt_df.collect()),
                      key=lambda d: d["event_seq"])
    assert len(raw_rows) == 3
    assert raw_rows == txt_rows


def test_cli_raw_mode(spark, fake_mysqlbinlog, tmp_path):
    """--raw end-to-end: raw file → fake mysqlbinlog → replay SQL.

    Uses --mysqlbinlog-bin with an absolute path: a driver-side PATH
    monkeypatch would not reach executor Python workers (their env is
    frozen when the JVM starts)."""
    import json

    from log2sql_spark.cli import main

    cat = tmp_path / "cat.json"
    cat.write_text(json.dumps(
        {"shop.orders": {"columns": ["id", "status"], "key_columns": ["id"]}}
    ))
    out = str(tmp_path / "out")
    rc = main(["--start-file", fake_mysqlbinlog["raw"], "--raw",
               "--mysqlbinlog-bin", fake_mysqlbinlog["script"],
               "--catalog", str(cat), "--out", out, "--cpus", "4"])
    assert rc == 0
    ops = {r["op"] for r in spark.read.parquet(out).collect()}
    assert ops == {"insert", "update", "delete"}


def test_binlog_datasource_pushdown_unit():
    """pushFilters keeps only the supported predicates; read() applies
    them before rows leave the source."""
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, In, IsNotNull

    from log2sql_spark.sources.binlog_datasource import BinlogReader

    r = BinlogReader({"path": "/tmp/x"})
    residual = list(
        r.pushFilters(
            [
                EqualTo(("op",), "insert"),
                In(("db",), ("shop", "crm")),
                GreaterThanOrEqual(("start_pos",), 1000),
                IsNotNull(("statement",)),  # unsupported -> residual
            ]
        )
    )
    assert [type(f).__name__ for f in residual] == ["IsNotNull"]
    assert r.eq == {"op": {"insert"}, "db": {"shop", "crm"}}
    assert r.ranges == {"start_pos": [(">=", 1000)]}
    assert r._keep({"op": "insert", "db": "shop", "start_pos": 1000})
    assert not r._keep({"op": "delete", "db": "shop", "start_pos": 1000})
    assert not r._keep({"op": "insert", "db": "shop", "start_pos": 999})


def test_binlog_datasource_matches_read_binlog(spark, tmp_path):
    """format('binlog') rows ≡ read_binlog rows on the same dump."""
    from log2sql_spark.sources.binlog import read_binlog
    from log2sql_spark.sources.binlog_fixture import render_binlog

    p = tmp_path / "bin.000001.txt"
    p.write_text(render_binlog([
        {"op": "insert", "db": "shop", "table": "orders",
         "ts": __import__("datetime").datetime(2024, 5, 1, 12, 0, 7),
         "values": [(1, "1"), (2, "'a=b'")]},
        {"op": "delete", "db": "shop", "table": "orders",
         "ts": __import__("datetime").datetime(2024, 5, 1, 12, 0, 8),
         "values": [(1, "2"), (2, "'z'")]},
    ]))
    via_ds = spark.read.format("binlog").load(str(p)).drop("file").collect()
    via_fn = read_binlog(spark, str(p)).drop("file").collect()
    assert sorted(map(str, via_ds)) == sorted(map(str, via_fn))


def test_binlog_datasource_conjunctive_filters():
    """ANDed predicates on one column must INTERSECT, not union (an OR
    widening would return rows the query excluded)."""
    from pyspark.sql.datasource import EqualTo, In

    from log2sql_spark.sources.binlog_datasource import BinlogReader

    r = BinlogReader({"path": "/tmp/x"})
    list(r.pushFilters([In(("op",), ("insert", "update")), EqualTo(("op",), "insert")]))
    assert r.eq == {"op": {"insert"}}
    assert not r._keep({"op": "update"})

    r2 = BinlogReader({"path": "/tmp/x"})
    list(r2.pushFilters([EqualTo(("db",), "a"), EqualTo(("db",), "b")]))
    assert r2.eq == {"db": set()}  # contradictory -> no rows, still correct
