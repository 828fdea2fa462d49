"""Golden tests for the binlog text parser (reference surface R2–R8,
SURVEY.md §2.1), including the edge cases the reference gets wrong."""

from __future__ import annotations

from datetime import datetime

import pytest

from log2sql_spark.sources.binlog import parse_binlog_lines, read_binlog
from log2sql_spark.sources.binlog_fixture import render_binlog, sql_literal

TS = datetime(2024, 5, 1, 12, 0, 7)


def _lines(events, **kw):
    return render_binlog(events, **kw).splitlines()


def test_insert_parses_to_after_image():
    events = [
        {
            "op": "insert",
            "db": "shop",
            "table": "orders",
            "ts": TS,
            "values": [(1, "42"), (2, "'pending'"), (3, "99.5")],
        }
    ]
    (ev,) = parse_binlog_lines(_lines(events))
    assert ev["op"] == "insert"
    assert ev["db"] == "shop" and ev["table"] == "orders"
    assert ev["before"] is None
    assert ev["after"] == {"1": "42", "2": "'pending'", "3": "99.5"}
    assert ev["start_pos"] == 4 and ev["stop_pos"] == 124
    assert ev["event_ts"] == TS


def test_update_where_set_sections_split_images():
    events = [
        {
            "op": "update",
            "db": "shop",
            "table": "orders",
            "ts": TS,
            "before": [(1, "42"), (2, "'pending'")],
            "after": [(1, "42"), (2, "'shipped'")],
        }
    ]
    (ev,) = parse_binlog_lines(_lines(events))
    assert ev["before"] == {"1": "42", "2": "'pending'"}
    assert ev["after"] == {"1": "42", "2": "'shipped'"}


def test_delete_parses_to_before_image():
    events = [
        {"op": "delete", "db": "shop", "table": "orders", "ts": TS, "values": [(1, "42")]}
    ]
    (ev,) = parse_binlog_lines(_lines(events))
    assert ev["op"] == "delete"
    assert ev["before"] == {"1": "42"} and ev["after"] is None


def test_equals_sign_inside_value_survives():
    """The reference truncates values at the first '=' (log2sql.py:48);
    we keep the whole token."""
    events = [
        {
            "op": "insert",
            "db": "d",
            "table": "t",
            "ts": TS,
            "values": [(1, "'a=b=c'")],
        }
    ]
    (ev,) = parse_binlog_lines(_lines(events))
    assert ev["after"] == {"1": "'a=b=c'"}


def test_null_token_kept_verbatim():
    events = [
        {"op": "insert", "db": "d", "table": "t", "ts": TS, "values": [(1, "NULL")]}
    ]
    (ev,) = parse_binlog_lines(_lines(events))
    assert ev["after"] == {"1": "NULL"}


def test_type_comments_stripped():
    events = [
        {"op": "insert", "db": "d", "table": "t", "ts": TS, "values": [(1, "7")]}
    ]
    (ev,) = parse_binlog_lines(_lines(events, with_type_comments=True))
    assert ev["after"] == {"1": "7"}


def test_multi_row_event_yields_one_envelope_row_per_image():
    """mysqlbinlog repeats the '### INSERT INTO' header per row within
    one Write_rows event; each row image becomes its own change event
    (matching the reference's boundary detection at log2sql.py:97-99)."""
    text = "\n".join(
        [
            "# at 4",
            "#240501 12:00:07 server id 1  end_log_pos 300 CRC32 0xdead \tWrite_rows: table id 1 flags: STMT_END_F",
            "### INSERT INTO `d`.`t`",
            "### SET",
            "###   @1=1",
            "### INSERT INTO `d`.`t`",
            "### SET",
            "###   @1=2",
        ]
    )
    evs = parse_binlog_lines(text.splitlines())
    assert [e["after"] for e in evs] == [{"1": "1"}, {"1": "2"}]
    assert all(e["start_pos"] == 4 for e in evs)


def test_ddl_accumulates_until_terminator():
    events = [
        {
            "op": "ddl",
            "db": "shop",
            "table": None,
            "ts": TS,
            "statement": "ALTER TABLE orders\nADD COLUMN note VARCHAR(20)",
        }
    ]
    evs = parse_binlog_lines(_lines(events))
    assert len(evs) == 1
    ev = evs[0]
    assert ev["op"] == "ddl"
    assert ev["db"] == "shop"
    assert "ALTER TABLE orders" in ev["statement"]
    assert "ADD COLUMN note VARCHAR(20)" in ev["statement"]
    assert "/*!*/" not in ev["statement"]


def test_mixed_stream_sequencing_and_positions():
    events = [
        {"op": "insert", "db": "a", "table": "t1", "ts": TS, "values": [(1, "1")]},
        {"op": "ddl", "db": "a", "table": None, "ts": TS, "statement": "DROP TABLE t0"},
        {"op": "delete", "db": "b", "table": "t2", "ts": TS, "values": [(1, "9")]},
    ]
    evs = parse_binlog_lines(_lines(events))
    assert [e["op"] for e in evs] == ["insert", "ddl", "delete"]
    assert [e["start_pos"] for e in evs] == [4, 124, 244]
    assert [e["event_seq"] for e in evs] == [0, 1, 2]


def test_spark_read_binlog_roundtrip(spark, tmp_path):
    events = [
        {
            "op": "insert",
            "db": "shop",
            "table": "orders",
            "ts": TS,
            "values": [(1, "1"), (2, sql_literal("x"))],
        },
        {
            "op": "update",
            "db": "shop",
            "table": "orders",
            "ts": TS,
            "before": [(1, "1")],
            "after": [(1, "2")],
        },
    ]
    p = tmp_path / "dump.txt"
    p.write_text(render_binlog(events))
    df = read_binlog(spark, str(p))
    rows = {r["op"]: r for r in df.collect()}
    assert rows["insert"]["after"] == {"1": "1", "2": "'x'"}
    assert rows["update"]["before"] == {"1": "1"}
    assert rows["update"]["after"] == {"1": "2"}
    assert rows["insert"]["event_ts"] == TS


def test_type_comment_strip_keeps_inner_comment_opener():
    """A quoted value containing ' /*' must survive -vv annotation
    stripping: the regex anchors on the FINAL comment and rejects '*/'
    inside its body."""
    from log2sql_spark.sources.binlog import _strip_type_comment

    assert (
        _strip_type_comment("'glob /*.py patterns' /* VARSTRING(80) meta=80 nullable=1 */")
        == "'glob /*.py patterns'"
    )
    assert _strip_type_comment("42 /* INT meta=0 nullable=0 */") == "42"
    assert _strip_type_comment("'no comment here'") == "'no comment here'"


def test_parser_ignores_session_noise_lines():
    """Real mysqlbinlog -vv output interleaves BEGIN/COMMIT/SET
    GTID/TIMESTAMP noise between events — the parser must skip them
    without corrupting event boundaries or row images."""
    from datetime import datetime

    from log2sql_spark.sources.binlog_fixture import render_binlog

    base = render_binlog([
        {"op": "insert", "db": "shop", "table": "orders",
         "ts": datetime(2024, 5, 1, 12, 0, 7), "values": [(1, "1"), (2, "'a'")]},
        {"op": "delete", "db": "shop", "table": "orders",
         "ts": datetime(2024, 5, 1, 12, 0, 8), "values": [(1, "2"), (2, "'b'")]},
    ])
    noisy_lines = []
    for line in base.split("\n"):
        if line.startswith("# at "):
            # inject the session noise a live dump carries before events
            noisy_lines += [
                "SET @@SESSION.GTID_NEXT= 'ANONYMOUS'/*!*/;",
                "BEGIN",
                "/*!*/;",
                "COMMIT/*!*/;",
                "SET TIMESTAMP=1714564807/*!*/;",
                "# Transaction details omitted",
            ]
        noisy_lines.append(line)
    clean = parse_binlog_lines(base.split("\n"), file="f")
    noisy = parse_binlog_lines(noisy_lines, file="f")
    assert [
        (e["op"], e["db"], e["table"], e.get("values") or e.get("before"), e.get("after"))
        for e in clean
    ] == [
        (e["op"], e["db"], e["table"], e.get("values") or e.get("before"), e.get("after"))
        for e in noisy
    ]
    assert [e["start_pos"] for e in clean] == [e["start_pos"] for e in noisy]
