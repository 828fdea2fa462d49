"""GTID / transaction parsing (SET @@SESSION.GTID_NEXT, BEGIN..COMMIT),
exactly-once dedup, and the chunked reader's cross-chunk txn-state
carry (mirrors the DDL ``use`` carry of read_binlog_split)."""

from __future__ import annotations

from datetime import datetime

from log2sql_spark.operators.cdc_filters import dedup_by_gtid
from log2sql_spark.sources.binlog import (
    parse_binlog_lines,
    read_binlog,
    read_binlog_split,
)
from log2sql_spark.sources.binlog_fixture import render_binlog

_TS = datetime(2024, 3, 1, 12, 0, 0)
_G = "3e11fa47-71ca-11e1-9e33-c80aa9429562"


def _ins(k, **extra):
    ev = {
        "op": "insert",
        "db": "shop",
        "table": "t",
        "ts": _TS,
        "values": [(1, str(k))],
    }
    ev.update(extra)
    return ev


def test_gtid_and_txn_assignment():
    events = [
        _ins(1, gtid=f"{_G}:1"),       # txn 0 opens
        _ins(2),                        # still txn 0
        _ins(3, commit=True),           # last of txn 0
        _ins(4, gtid=f"{_G}:2", commit=True),  # txn 1, single event
        _ins(5),                        # AFTER commit, before any BEGIN
    ]
    parsed = parse_binlog_lines(render_binlog(events).split("\n"))
    got = [(e["gtid"], e["txn_seq"]) for e in parsed]
    assert got == [
        (f"{_G}:1", 0),
        (f"{_G}:1", 0),
        (f"{_G}:1", 0),
        (f"{_G}:2", 1),
        (None, None),  # outside any transaction: definitively none
    ]


def test_gtid_automatic_is_null():
    text = render_binlog([_ins(1)])
    text = text.replace(
        "# at 4", "SET @@SESSION.GTID_NEXT= 'AUTOMATIC'/*!*/;\n# at 4"
    )
    (ev,) = parse_binlog_lines(text.split("\n"))
    assert ev["gtid"] is None


def test_gtidless_dump_has_null_columns():
    parsed = parse_binlog_lines(render_binlog([_ins(1), _ins(2)]).split("\n"))
    assert all(e["gtid"] is None and e["txn_seq"] is None for e in parsed)


def test_split_parse_carries_txn_state_across_chunks(spark, tmp_path):
    """Chunks cut mid-transaction: events parsed in a later chunk that
    precede its first GTID/BEGIN must inherit the open transaction of
    an earlier chunk — byte-identical output to the whole-file parse."""
    events = []
    for i in range(60):
        ev = _ins(i)
        if i % 10 == 0:
            ev["gtid"] = f"{_G}:{i // 10 + 1}"
        if i % 10 == 9:
            ev["commit"] = True
        events.append(ev)
    p = tmp_path / "mysql-bin.000001.txt"
    p.write_text(render_binlog(events))

    whole = read_binlog(spark, str(p)).orderBy("event_seq").collect()
    size = p.stat().st_size
    # ~9 chunks, guaranteed to split inside transactions
    split = (
        read_binlog_split(spark, str(p), chunk_bytes=size // 9 + 1)
        .orderBy("event_seq")
        .collect()
    )
    def norm(r):
        d = r.asDict()
        d["file"] = d["file"].removeprefix("file://")  # scheme-only diff
        return d

    assert [norm(r) for r in split] == [norm(r) for r in whole]
    # sanity on the content itself
    assert {r.txn_seq for r in whole} == set(range(6))
    assert all(r.gtid == f"{_G}:{r.txn_seq + 1}" for r in whole)


def test_dedup_by_gtid_keeps_one_delivery(spark, tmp_path):
    txn = [_ins(1, gtid=f"{_G}:1"), _ins(2, commit=True)]
    other = [_ins(3, gtid=f"{_G}:2", commit=True)]
    (tmp_path / "a.txt").write_text(render_binlog(txn + other))
    (tmp_path / "b.txt").write_text(render_binlog(txn))  # re-delivery

    env = read_binlog(spark, [str(tmp_path / "a.txt"), str(tmp_path / "b.txt")])
    assert env.count() == 5  # 3 + 2 duplicated
    kept = dedup_by_gtid(env).collect()
    assert len(kept) == 3
    assert all(r.file.endswith("a.txt") for r in kept)


def test_dedup_by_gtid_passes_gtidless_rows(spark, tmp_path):
    (tmp_path / "a.txt").write_text(render_binlog([_ins(1), _ins(2)]))
    (tmp_path / "b.txt").write_text(render_binlog([_ins(1), _ins(2)]))
    env = read_binlog(spark, [str(tmp_path / "a.txt"), str(tmp_path / "b.txt")])
    # no GTIDs -> nothing safe to dedup: all four rows pass through
    assert dedup_by_gtid(env).count() == 4


def _write(path, events):
    path.write_text(render_binlog(events))


def test_stream_exactly_once_across_batches(spark, tmp_path):
    """g2/g3 re-delivered in a later micro-batch (plus new g4): the
    sink holds every transaction exactly once; a replayed batch
    regenerates identical state instead of double-applying."""
    from log2sql_spark.sources.catalog import catalog_from_dict
    from log2sql_spark.streaming.gtid_stream import (
        replayed_sql,
        stream_binlog_exactly_once,
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    store = str(tmp_path / "gtids")
    cat = catalog_from_dict(
        spark, {"shop.t": {"columns": ["id"], "key_columns": ["id"]}}
    )

    def run():
        q = stream_binlog_exactly_once(
            spark, str(in_dir), cat, out_dir, ckpt, store
        )
        q.awaitTermination(120)

    _write(
        in_dir / "mysql-bin.000001.txt",
        [
            _ins(1, gtid=f"{_G}:1", commit=True),
            _ins(2, gtid=f"{_G}:2", commit=True),
            _ins(3, gtid=f"{_G}:3", commit=True),
        ],
    )
    run()
    got = replayed_sql(spark, out_dir)
    assert got.count() == 3

    # batch 2: re-delivery of g2+g3 plus genuinely new g4
    _write(
        in_dir / "mysql-bin.000002.txt",
        [
            _ins(2, gtid=f"{_G}:2", commit=True),
            _ins(3, gtid=f"{_G}:3", commit=True),
            _ins(4, gtid=f"{_G}:4", commit=True),
        ],
    )
    run()
    got = replayed_sql(spark, out_dir)
    assert got.count() == 4  # g2/g3 NOT double-delivered
    keys = sorted(
        r.sql_text.split("VALUES (")[1][0] for r in got.collect()
    )
    assert keys == ["1", "2", "3", "4"]


def test_batch_replay_is_idempotent(spark, tmp_path):
    """Crash-replay simulation: reprocessing the same batch_id leaves
    sink and GTID store byte-identical (batch-keyed overwrite)."""
    from log2sql_spark.sources.binlog import read_binlog
    from log2sql_spark.sources.catalog import catalog_from_dict
    from log2sql_spark.streaming.gtid_stream import (
        process_exactly_once_batch,
        replayed_sql,
    )

    cat = catalog_from_dict(
        spark, {"shop.t": {"columns": ["id"], "key_columns": ["id"]}}
    )
    p = tmp_path / "a.txt"
    _write(p, [_ins(1, gtid=f"{_G}:1", commit=True), _ins(2, gtid=f"{_G}:2", commit=True)])
    out, store = str(tmp_path / "out"), str(tmp_path / "gtids")

    env = read_binlog(spark, str(p))
    process_exactly_once_batch(env, cat, out, store, batch_id=0)
    first = sorted(r.sql_text for r in replayed_sql(spark, out).collect())
    # replay the SAME batch (crash before checkpoint commit)
    process_exactly_once_batch(env, cat, out, store, batch_id=0)
    again = sorted(r.sql_text for r in replayed_sql(spark, out).collect())
    assert again == first
    # and a LATER batch still filters those gtids
    process_exactly_once_batch(env, cat, out, store, batch_id=1)
    final = sorted(r.sql_text for r in replayed_sql(spark, out).collect())
    assert final == first
