"""Property-based round-trip: render_binlog ∘ parse_binlog_lines is the
identity on event streams (hypothesis over ops, identifiers, values —
including the hostile ones: '=', quotes, NULL, unicode)."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from log2sql_spark.sources.binlog import parse_binlog_lines
from log2sql_spark.sources.binlog_fixture import render_binlog

BASE_TS = datetime(2024, 5, 1, 12, 0, 0)

ident = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters="_"),
    min_size=1,
    max_size=12,
).filter(lambda s: not s[0].isdigit())

# raw value tokens as mysqlbinlog would print them: bare ints/floats or
# quoted strings (hostile contents allowed), or NULL
bare_num = st.integers(-10**9, 10**9).map(str) | st.floats(
    allow_nan=False, allow_infinity=False, width=32
).map(repr)
quoted = st.text(
    alphabet=st.characters(blacklist_characters="'\\\n\r", blacklist_categories=("Cs",)),
    max_size=20,
).map(lambda s: "'" + s + "'")
token = bare_num | quoted | st.just("NULL")


def image(max_cols: int = 5):
    return st.lists(token, min_size=1, max_size=max_cols).map(
        lambda vals: [(i + 1, v) for i, v in enumerate(vals)]
    )


@st.composite
def event(draw):
    op = draw(st.sampled_from(["insert", "update", "delete"]))
    ev = {
        "op": op,
        "db": draw(ident),
        "table": draw(ident),
        "ts": BASE_TS + timedelta(seconds=draw(st.integers(0, 86_399))),
    }
    if op == "update":
        ev["before"] = draw(image())
        ev["after"] = draw(image())
    else:
        ev["values"] = draw(image())
    return ev


@given(st.lists(event(), min_size=1, max_size=8))
@settings(max_examples=150, deadline=None)
def test_render_parse_roundtrip(events):
    # split('\n'), not splitlines(): values may contain \x1e/  etc.
    parsed = parse_binlog_lines(render_binlog(events).split("\n"), file="f")
    assert len(parsed) == len(events)
    for ev, got in zip(events, parsed):
        assert got["op"] == ev["op"]
        assert got["db"] == ev["db"] and got["table"] == ev["table"]
        assert got["event_ts"] == ev["ts"]
        if ev["op"] == "update":
            assert got["before"] == {str(i): v for i, v in ev["before"]}
            assert got["after"] == {str(i): v for i, v in ev["after"]}
        elif ev["op"] == "insert":
            assert got["after"] == {str(i): v for i, v in ev["values"]}
        else:
            assert got["before"] == {str(i): v for i, v in ev["values"]}
    # positions are strictly increasing and sequenced
    poss = [e["start_pos"] for e in parsed]
    assert poss == sorted(poss) and len(set(poss)) == len(poss)
    assert [e["event_seq"] for e in parsed] == list(range(len(parsed)))
