"""Live remote binlog tail (reference main.py:88-105 made ONLINE).

``mysqlbinlog`` is absent in this container, so a FAKE binary plays the
server: it answers ``--read-from-remote-server`` dumps per
(file, --start-position) deterministically, including a mid-stream
rotation to the next log — proving the per-rotation re-invocation loop,
the incremental position pushdown, and the hand-off into the existing
watch-dir → checkpointed-stream path.
"""

from __future__ import annotations

import os
import stat

import pytest

from log2sql_spark.sources.binlog_remote import (
    TailState,
    last_end_pos,
    remote_argv,
    rotate_target,
    tail_remote_binlog,
)

# The fake server's timeline (all inserts into shop.orders):
#   bin.000001: ev1 (id=1,'a') @4..200, ev2 (id=2,'b') @200..300,
#               then ev3 (id=3,'c') @300..400 + Rotate to bin.000002
#   bin.000002: ev4 (id=4,'d') @4..250, then quiet.
_FAKE = r'''#!/usr/bin/env python3
import sys

args = sys.argv[1:]
# pin the no-password-on-argv invariant end-to-end: a real server box
# exposes /proc/<pid>/cmdline world-readable for the life of the dump
if any(a.startswith("--password") for a in args):
    sys.stderr.write("password leaked onto argv\n")
    sys.exit(13)
start = 4
logf = args[-1]
for a in args:
    if a.startswith("--start-position="):
        start = int(a.split("=", 1)[1])


def ev(pos, end, rid, status):
    return "\n".join([
        "# at %d" % pos,
        "#240501 12:00:07 server id 1  end_log_pos %d CRC32 0x1234abcd \tWrite_rows: table id 108 flags: STMT_END_F" % end,
        "### INSERT INTO `shop`.`orders`",
        "### SET",
        "###   @1=%d /* INT meta=0 nullable=0 is_null=0 */" % rid,
        "###   @2='%s' /* VARSTRING(255) meta=255 nullable=1 is_null=0 */" % status,
    ])


out = ["/*!50530 SET @@SESSION.PSEUDO_SLAVE_MODE=1*/;"]
if logf == "bin.000001":
    if start <= 4:
        out += [ev(4, 200, 1, "a"), ev(200, 300, 2, "b")]
    elif start <= 300:
        out += [
            ev(300, 400, 3, "c"),
            "#240501 12:00:07 server id 1  end_log_pos 443 CRC32 0xfeedbeef \tRotate to bin.000002  pos: 4",
        ]
elif logf == "bin.000002":
    if start <= 4:
        out += [ev(4, 250, 4, "d")]
out.append("# End of log file")
print("\n".join(out))
'''


@pytest.fixture()
def fake_remote_mysqlbinlog(tmp_path, monkeypatch):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    script = bindir / "mysqlbinlog"
    script.write_text(_FAKE)
    script.chmod(script.stat().st_mode | stat.S_IXUSR | stat.S_IXGRP | stat.S_IXOTH)
    monkeypatch.setenv("PATH", str(bindir) + os.pathsep + os.environ["PATH"])
    return str(script)


def test_remote_argv_surface():
    assert remote_argv("bin.000001", host="db", port=3307, user="repl",
                       start_position=300) == [
        "mysqlbinlog", "--read-from-remote-server", "--host=db",
        "--port=3307", "--user=repl",
        "--start-position=300", "--base64-output=decode-rows", "-vv",
        "bin.000001",
    ]
    # magic position (4) is omitted, like the reference's skip-empty
    # rule (main.py:95)
    assert remote_argv("f", start_position=4) == [
        "mysqlbinlog", "--read-from-remote-server", "--host=127.0.0.1",
        "--port=3306", "--user=root", "--base64-output=decode-rows",
        "-vv", "f",
    ]


def test_password_rides_env_not_argv(monkeypatch):
    """The server password must NEVER appear on argv — /proc/<pid>/cmdline
    is world-readable for the life of each dump, and a hard outage
    re-raises CalledProcessError carrying argv into operator logs. It
    travels as MYSQL_PWD in the subprocess env instead (same channel the
    mysql client tools document), and an empty password scrubs any
    inherited MYSQL_PWD rather than leaking the parent's."""
    from log2sql_spark.sources.binlog_remote import remote_env

    argv = remote_argv("bin.000001", host="db", user="repl",
                       start_position=300)
    assert not any("password" in a or "s3cret" in a for a in argv)
    env = remote_env("s3cret")
    assert env["MYSQL_PWD"] == "s3cret"
    monkeypatch.setenv("MYSQL_PWD", "stale-parent-secret")
    assert "MYSQL_PWD" not in remote_env("")


def test_dump_cursor_parsing():
    text = (
        "# at 4\n"
        "#240501 12:00:07 server id 1  end_log_pos 200 CRC32 0x1 \tWrite_rows: table id 108\n"
        "#240501 12:00:07 server id 1  end_log_pos 443 CRC32 0x2 \tRotate to bin.000002  pos: 4\n"
    )
    assert last_end_pos(text) == 443
    assert rotate_target(text) == ("bin.000002", 4)
    assert last_end_pos("no events") is None
    assert rotate_target("no events") is None


def test_missing_binary_is_actionable(tmp_path):
    with pytest.raises(FileNotFoundError, match="read-from-remote-server"):
        tail_remote_binlog(str(tmp_path), "bin.000001",
                           binary="definitely-not-a-real-binary-xyz")


def test_tail_rotates_and_lands_incremental_dumps(fake_remote_mysqlbinlog, tmp_path):
    """Four polls against the fake server: two incremental dumps of
    bin.000001 (position pushdown — the second starts at 300), one
    rotation into bin.000002, one empty poll. Every landed file is
    complete (atomic rename) and named by (log, from-position), so a
    tail RESTARTED from the checkpointed cursor re-lands identical
    names and the streaming file source never reprocesses."""
    watch = tmp_path / "watch"
    state = tail_remote_binlog(
        str(watch), "bin.000001", poll_interval=0.01, max_iterations=4,
        password="pw",  # rides MYSQL_PWD; the fake rejects argv passwords
    )
    assert isinstance(state, TailState)
    assert state.files_written == 3
    assert state.rotations == 1
    assert (state.log_file, state.position) == ("bin.000002", 250)
    names = sorted(os.listdir(watch))
    assert names == [
        "bin.000001.from300.txt",
        "bin.000001.from4.txt",
        "bin.000002.from4.txt",
    ]
    # the from-300 dump holds ONLY the new window (ev3), not history —
    # the server did the filtering (position pushdown), we never re-read
    tail2 = (watch / "bin.000001.from300.txt").read_text()
    assert "@1=3" in tail2 and "@1=1" not in tail2
    first = (watch / "bin.000001.from4.txt").read_text()
    assert "@1=1" in first and "@1=2" in first and "@1=3" not in first


def test_tail_feeds_the_stop_never_stream(spark, fake_remote_mysqlbinlog, tmp_path):
    """E2E: fake-server tail → watch-dir → the SAME checkpointed
    --stop-never stream path → rendered replay SQL, across a rotation."""
    from log2sql_spark.sources.catalog import catalog_from_dict
    from log2sql_spark.streaming.cdc_stream import stream_binlog_to_sql

    watch, out, ckpt = tmp_path / "watch", tmp_path / "out", tmp_path / "ckpt"
    tail_remote_binlog(str(watch), "bin.000001", poll_interval=0.01,
                       max_iterations=4)
    cat = catalog_from_dict(
        spark, {"shop.orders": {"columns": ["id", "status"], "key_columns": ["id"]}}
    )
    q = stream_binlog_to_sql(spark, str(watch), cat, str(out), str(ckpt))
    q.awaitTermination(120)
    got = {r["sql_text"] for r in spark.read.parquet(str(out)).collect()}
    assert got == {
        "INSERT INTO `shop`.`orders`(`id`, `status`) VALUES (1, 'a');",
        "INSERT INTO `shop`.`orders`(`id`, `status`) VALUES (2, 'b');",
        "INSERT INTO `shop`.`orders`(`id`, `status`) VALUES (3, 'c');",
        "INSERT INTO `shop`.`orders`(`id`, `status`) VALUES (4, 'd');",
    }


def test_cli_stop_never_raw_validation(tmp_path):
    from log2sql_spark.cli import build_parser, validate

    p = build_parser()
    with pytest.raises(ValueError, match="live remote tail"):
        validate(p.parse_args([
            "--stop-never", "--raw", "--watch-dir", "w", "--out", "o",
            "--checkpoint", "c", "--catalog", "cat.json",
        ]))
    # with --start-file it validates
    validate(p.parse_args([
        "--stop-never", "--raw", "--watch-dir", "w", "--out", "o",
        "--checkpoint", "c", "--catalog", "cat.json",
        "--start-file", "mysql-bin.000001",
    ]))


def test_tail_retries_transient_dump_failures(tmp_path, monkeypatch):
    """A mysqlbinlog non-zero exit (server restart, dropped replication
    connection) is an empty poll, not a dead tail: the SAME cursor
    retries and the next successful dump resumes exactly where the
    failure left off. A hard outage (max_consecutive_failures
    back-to-back) re-raises for the operator."""
    import stat as stat_mod
    import subprocess

    import pytest as _pytest

    bindir = tmp_path / "bin"
    bindir.mkdir()
    marker = tmp_path / "fail_once"
    marker.write_text("")  # present -> the fake fails, then removes it
    script = bindir / "mysqlbinlog"
    script.write_text(
        "#!/usr/bin/env python3\n"
        "import os, sys\n"
        f"m = {str(marker)!r}\n"
        "if os.path.exists(m):\n"
        "    os.unlink(m)\n"
        "    sys.stderr.write('ERROR: Failed on connect\\n'); sys.exit(1)\n"
        "print('# at 4')\n"
        "print('#240501 12:00:07 server id 1  end_log_pos 200 CRC32 0x1 "
        "\\tWrite_rows: table id 108 flags: STMT_END_F')\n"
        "print('### INSERT INTO `shop`.`orders`')\n"
        "print('### SET')\n"
        "print('###   @1=1')\n"
        "print('# End of log file')\n"
    )
    script.chmod(script.stat().st_mode | stat_mod.S_IXUSR)
    monkeypatch.setenv("PATH", str(bindir) + os.pathsep + os.environ["PATH"])

    watch = tmp_path / "watch"
    state = tail_remote_binlog(
        str(watch), "bin.000001", poll_interval=0.01, max_iterations=2,
    )
    assert state.dump_failures == 1  # first poll failed, second landed
    assert state.files_written == 1 and state.position == 200
    assert os.listdir(watch) == ["bin.000001.from4.txt"]

    # hard outage: every poll fails -> bounded re-raise
    always = bindir / "mysqlbinlog"
    always.write_text("#!/bin/sh\nexit 1\n")
    always.chmod(always.stat().st_mode | stat_mod.S_IXUSR)
    with _pytest.raises(subprocess.CalledProcessError):
        tail_remote_binlog(
            str(watch), "bin.000001", poll_interval=0.01,
            max_consecutive_failures=3,
        )


# ---------------------------------------------------------------------------
# GTID continuity across rotations: whole-transactions-only landing
# ---------------------------------------------------------------------------

def test_trim_incomplete_txn():
    """A dump cut inside a GTID block is trimmed back to the open
    transaction's `# at` marker (the resume cursor); whole dumps and
    framing-less dumps pass through untouched."""
    from log2sql_spark.sources.binlog_remote import trim_incomplete_txn

    whole = (
        "# at 4\n"
        "#240501 12:00:07 server id 1  end_log_pos 60 CRC32 0x1 \tGTID\n"
        "SET @@SESSION.GTID_NEXT= 'aaaa:1'/*!*/;\n"
        "# at 60\n"
        "#240501 12:00:07 server id 1  end_log_pos 120 CRC32 0x1 \tQuery\n"
        "BEGIN\n"
        "# at 120\n"
        "#240501 12:00:07 server id 1  end_log_pos 200 CRC32 0x1 \tWrite_rows: table id 108 flags: STMT_END_F\n"
        "### INSERT INTO `shop`.`orders`\n"
        "### SET\n"
        "###   @1=1\n"
        "# at 200\n"
        "#240501 12:00:07 server id 1  end_log_pos 300 CRC32 0x1 \tXid = 5\n"
        "COMMIT/*!*/;\n"
    )
    text, resume = trim_incomplete_txn(whole)
    assert text == whole and resume is None

    partial = whole + (
        "# at 300\n"
        "#240501 12:00:07 server id 1  end_log_pos 330 CRC32 0x1 \tGTID\n"
        "SET @@SESSION.GTID_NEXT= 'aaaa:2'/*!*/;\n"
        "# at 330\n"
        "#240501 12:00:07 server id 1  end_log_pos 360 CRC32 0x1 \tQuery\n"
        "BEGIN\n"
        "# at 360\n"
        "#240501 12:00:07 server id 1  end_log_pos 400 CRC32 0x1 \tWrite_rows: table id 108 flags: STMT_END_F\n"
        "### INSERT INTO `shop`.`orders`\n"
        "### SET\n"
        "###   @1=3\n"
    )  # connection died before the COMMIT
    text, resume = trim_incomplete_txn(partial)
    assert text == whole
    assert resume == 300  # retry re-dumps the txn WITH its GTID preamble

    # GTID_NEXT='AUTOMATIC' closes like COMMIT (between-txn state)
    auto = whole + "SET @@SESSION.GTID_NEXT= 'AUTOMATIC'/*!*/;\n"
    assert trim_incomplete_txn(auto) == (auto, None)

    # no transaction framing at all (gtid-less autocommit server):
    # nothing safe to cut, pass through
    bare = (
        "# at 4\n"
        "#240501 12:00:07 server id 1  end_log_pos 200 CRC32 0x1 \tWrite_rows: table id 108 flags: STMT_END_F\n"
        "### INSERT INTO `shop`.`orders`\n"
        "### SET\n"
        "###   @1=1\n"
    )
    assert trim_incomplete_txn(bare) == (bare, None)


# Fake server with GTID framing. Timeline of bin.000001:
#   g1 = aaaa:1 -> rows (1,'a'), (2,'b'), COMMIT @300
#   g2 = aaaa:2 -> rows (3,'c'), (4,'d'), COMMIT @470, Rotate to bin.000002
# bin.000002: g3 = aaaa:3 -> row (5,'e').
# While the crash marker exists, a from-4 dump of bin.000001 DIES
# mid-g2 (flushed output ends after row 3, exit 0 — the worst case: a
# partial transaction that LOOKS like a clean dump). Any mid-g2
# start-position snaps back to 300: GTID auto-position re-delivers an
# interrupted transaction whole, which is what makes duplicate delivery
# (not gaps) the failure mode the GTID dedup must absorb.
_FAKE_GTID = r'''#!/usr/bin/env python3
import os, sys

args = sys.argv[1:]
if any(a.startswith("--password") for a in args):
    sys.stderr.write("password leaked onto argv\n")
    sys.exit(13)
start = 4
logf = args[-1]
for a in args:
    if a.startswith("--start-position="):
        start = int(a.split("=", 1)[1])

H = "#240501 12:00:07 server id 1  end_log_pos %d CRC32 0x1234abcd \t%s"


def gtid(pos, end, g):
    return ["# at %d" % pos, H % (end, "GTID"),
            "SET @@SESSION.GTID_NEXT= '%s'/*!*/;" % g]


def begin(pos, end):
    return ["# at %d" % pos, H % (end, "Query"), "BEGIN"]


def ins(pos, end, rid, status):
    return ["# at %d" % pos,
            H % (end, "Write_rows: table id 108 flags: STMT_END_F"),
            "### INSERT INTO `shop`.`orders`",
            "### SET",
            "###   @1=%d /* INT meta=0 nullable=0 is_null=0 */" % rid,
            "###   @2='%s' /* VARSTRING(255) meta=255 nullable=1 is_null=0 */" % status]


def commit(pos, end):
    return ["# at %d" % pos, H % (end, "Xid = 9"), "COMMIT/*!*/;"]


G1 = (gtid(4, 60, "aaaa:1") + begin(60, 120) + ins(120, 200, 1, "a")
      + ins(200, 260, 2, "b") + commit(260, 300))
G2 = (gtid(300, 330, "aaaa:2") + begin(330, 360) + ins(360, 400, 3, "c")
      + ins(400, 450, 4, "d") + commit(450, 470))
G2_PARTIAL = G2[:len(gtid(0, 0, "x")) + len(begin(0, 0)) + len(ins(0, 0, 0, "x"))]
ROT = [H % (513, "Rotate to bin.000002  pos: 4")]
G3 = (gtid(4, 60, "aaaa:3") + begin(60, 100) + ins(100, 180, 5, "e")
      + commit(180, 210))

out = ["/*!50530 SET @@SESSION.PSEUDO_SLAVE_MODE=1*/;"]
marker = os.environ.get("FAKE_CRASH_MARKER", "")
if logf == "bin.000001":
    if start <= 4:
        if marker and os.path.exists(marker):
            os.unlink(marker)
            # died mid-g2: flushed partial output, clean exit code
            print("\n".join(out + G1 + G2_PARTIAL))
            sys.exit(0)
        out += G1 + G2 + ROT
    elif start <= 470:
        out += G2 + ROT  # auto-position: interrupted txn re-dumps WHOLE
elif logf == "bin.000002":
    if start <= 4:
        out += G3
out.append("# End of log file")
print("\n".join(out))
'''


@pytest.fixture()
def fake_gtid_server(tmp_path, monkeypatch):
    bindir = tmp_path / "gbin"
    bindir.mkdir()
    script = bindir / "mysqlbinlog"
    script.write_text(_FAKE_GTID)
    script.chmod(script.stat().st_mode | stat.S_IXUSR | stat.S_IXGRP | stat.S_IXOTH)
    marker = tmp_path / "crash_once"
    marker.write_text("")
    monkeypatch.setenv("FAKE_CRASH_MARKER", str(marker))
    monkeypatch.setenv("PATH", str(bindir) + os.pathsep + os.environ["PATH"])
    return str(script)


def test_mid_txn_crash_at_rotation_is_exactly_once(
    spark, fake_gtid_server, tmp_path
):
    """VERDICT r10 #4: the server dies MID-TRANSACTION right before the
    rotation boundary; the GTID-grouped replay neither splits nor
    re-applies the transaction.

    The dangerous half is the split: dedup keeps each GTID's FIRST
    delivery and the cross-batch store drops later ones, so if the tail
    landed the crash-truncated window (g2 preamble + row 3, no COMMIT),
    that partial copy would win and row 4 would never apply. The tail's
    whole-transactions-only trim is what forbids it. The re-apply half
    is then driven explicitly: a stale mid-g2 cursor (as a pre-trim
    checkpoint would hold) re-dumps g2 whole into a SECOND file, and
    the streaming GTID store must collapse the duplicate."""
    from log2sql_spark.sources.binlog_remote import tail_once
    from log2sql_spark.sources.catalog import catalog_from_dict
    from log2sql_spark.streaming.gtid_stream import (
        replayed_sql,
        stream_binlog_exactly_once,
    )

    watch = tmp_path / "watch"
    state = tail_remote_binlog(
        str(watch), "bin.000001", poll_interval=0.01, max_iterations=3,
    )
    # poll 1 crashed mid-g2: ONLY the complete g1 landed, trimmed at
    # g2's `# at 300`, and the cursor resumed exactly there
    first = (watch / "bin.000001.from4.txt").read_text()
    assert "@1=1" in first and "@1=2" in first
    assert "@1=3" not in first and "aaaa:2" not in first
    # poll 2 re-dumped g2 WHOLE (with its GTID preamble) + the rotation;
    # poll 3 landed g3 from the next log
    assert state.rotations == 1
    assert (state.log_file, state.position) == ("bin.000002", 210)
    assert sorted(os.listdir(watch)) == [
        "bin.000001.from300.txt",
        "bin.000001.from4.txt",
        "bin.000002.from4.txt",
    ]
    resumed = (watch / "bin.000001.from300.txt").read_text()
    assert "aaaa:2" in resumed and "@1=3" in resumed and "@1=4" in resumed

    # duplicate delivery: a STALE mid-g2 cursor (what a pre-trim
    # checkpoint could persist) re-dumps the whole transaction into a
    # second, differently-named file
    stale = TailState(log_file="bin.000001", position=350)
    assert tail_once(stale, str(watch))
    dup = (watch / "bin.000001.from350.txt").read_text()
    assert "aaaa:2" in dup and "@1=3" in dup and "@1=4" in dup

    # drive the watch dir through the exactly-once stream, one file per
    # micro-batch, so the duplicate g2 arrives in a LATER batch and the
    # persisted GTID store (not in-batch dedup) must absorb it
    cat = catalog_from_dict(
        spark,
        {"shop.orders": {"columns": ["id", "status"], "key_columns": ["id"]}},
    )
    out, ckpt, gstore = (
        str(tmp_path / "out"), str(tmp_path / "ckpt"), str(tmp_path / "gtids")
    )
    q = stream_binlog_exactly_once(
        spark, str(watch), cat, out, ckpt, gstore, max_files_per_trigger=1
    )
    q.awaitTermination(180)
    got = sorted(r.sql_text for r in replayed_sql(spark, out).collect())
    # five rows, each applied exactly once: g2 is WHOLE (3 and 4 both
    # present — not split) and SINGLE (not re-applied from the dup file)
    assert got == [
        "INSERT INTO `shop`.`orders`(`id`, `status`) VALUES (1, 'a');",
        "INSERT INTO `shop`.`orders`(`id`, `status`) VALUES (2, 'b');",
        "INSERT INTO `shop`.`orders`(`id`, `status`) VALUES (3, 'c');",
        "INSERT INTO `shop`.`orders`(`id`, `status`) VALUES (4, 'd');",
        "INSERT INTO `shop`.`orders`(`id`, `status`) VALUES (5, 'e');",
    ]
