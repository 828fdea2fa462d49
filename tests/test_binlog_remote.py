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
