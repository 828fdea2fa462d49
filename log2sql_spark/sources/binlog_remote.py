"""Live remote binlog tail: ``mysqlbinlog --read-from-remote-server``
→ rotating dump files in a watch directory.

The reference workflow shells out to ``mysqlbinlog`` once, offline
(``main.py:88-105``) — its ``--stop-never`` flag is commented out
(``main.py:26-27``). This module is that flag made ONLINE: a small
producer loop that, per iteration,

1. invokes ``mysqlbinlog --read-from-remote-server`` for the current
   binlog file, pushing the last-seen position down into the binary via
   ``--start-position`` (the server streams only the new window — same
   pushdown story as ``binlog_raw.py``, but over the replication
   protocol instead of a local file seek);
2. lands any NEW events as a complete file in the watch directory
   (temp-write + atomic ``os.replace``, so the Structured Streaming
   file source never observes a partial file);
3. advances to the next log when the dump ends in a ``Rotate to``
   event, restarting at position 4 — per-rotation re-invocation, so a
   dropped connection resumes from the checkpointed (file, position)
   rather than re-streaming history.

The existing ``--stop-never`` stream (watch-dir → checkpointed file
source → parse → sink, ``streaming/cdc_stream.py``) consumes the files
exactly as if an operator were dropping dumps by hand; the tail is a
pure producer, so exactly-once accounting stays entirely inside the
streaming checkpoint. On a real deployment the tail runs on the driver
(or any box that can reach the server) while parsing stays distributed
on the executors.

Gated: the binary is absent in this container, so entry points raise
``FileNotFoundError`` with an actionable message; tests exercise the
loop with a fake ``mysqlbinlog`` on PATH emitting rotating dumps.
"""

from __future__ import annotations

import os
import re
import shutil
import subprocess
import tempfile
import time
from dataclasses import dataclass

# Absolute position of the last event the dump contains, from the
# standard `... server id N  end_log_pos M ...` header lines.
_END_POS_RE = re.compile(r"\bend_log_pos\s+(\d+)\b")
# A Rotate event closes the file: `Rotate to mysql-bin.000002  pos: 4`.
_ROTATE_RE = re.compile(r"\bRotate to\s+(\S+)\s+pos:\s*(\d+)")
# Event-start marker (`# at N`) and the transaction framing the binlog
# parser keys on (sources/binlog.py): a GTID preamble opens a
# transaction, COMMIT / GTID_NEXT='AUTOMATIC' closes it.
_AT_RE = re.compile(r"^#\s*at\s+(\d+)\s*$")
_GTID_NEXT_RE = re.compile(
    r"SET\s+@@SESSION\.GTID_NEXT\s*=\s*'([^']*)'", re.IGNORECASE
)

BINLOG_MAGIC_POS = 4  # events start after the 4-byte magic header


def remote_argv(
    log_file: str,
    *,
    binary: str = "mysqlbinlog",
    host: str = "127.0.0.1",
    port: int = 3306,
    user: str = "root",
    start_position: int | None = None,
) -> list[str]:
    """argv for one remote incremental dump of ``log_file``.

    ``=``-joined options throughout: list-argv (never a shell), and the
    single-token form keeps the fake-binary test parser and the real
    binary's getopt in exact agreement. The password is deliberately
    NOT part of argv — ``/proc/<pid>/cmdline`` is world-readable for
    the life of every dump, and a failing dump would embed argv in the
    re-raised ``CalledProcessError``. It travels in the subprocess
    environment instead (:func:`remote_env`), which mysqlbinlog reads
    as ``MYSQL_PWD`` and which only the owning user can inspect.
    """
    argv = [
        binary,
        "--read-from-remote-server",
        f"--host={host}",
        f"--port={port}",
        f"--user={user}",
    ]
    if start_position and start_position > BINLOG_MAGIC_POS:
        argv.append(f"--start-position={start_position}")
    argv += ["--base64-output=decode-rows", "-vv", log_file]
    return argv


def remote_env(password: str = "") -> dict[str, str]:
    """Subprocess environment for one dump: the caller's env plus
    ``MYSQL_PWD`` when a password is set (mysql client tools read it
    exactly like ``--password=`` but off the world-readable argv)."""
    env = dict(os.environ)
    if password:
        env["MYSQL_PWD"] = password
    else:
        env.pop("MYSQL_PWD", None)
    return env


def last_end_pos(dump_text: str) -> int | None:
    """Largest ``end_log_pos`` in the dump — the resume position."""
    best = None
    for m in _END_POS_RE.finditer(dump_text):
        p = int(m.group(1))
        if best is None or p > best:
            best = p
    return best


def rotate_target(dump_text: str) -> tuple[str, int] | None:
    """(next_log_file, start_pos) if the dump ends in a rotation."""
    last = None
    for m in _ROTATE_RE.finditer(dump_text):
        last = (m.group(1), int(m.group(2)))
    return last


def trim_incomplete_txn(dump_text: str) -> tuple[str, int | None]:
    """Cut a trailing transaction the dump left OPEN; return
    ``(whole_txns_text, open_txn_start_pos | None)``.

    A connection that dies mid-transaction can leave ``mysqlbinlog``'s
    flushed output ending inside a GTID block (preamble/BEGIN with no
    COMMIT before EOF). Landing that partial window is how a split
    transaction happens downstream: the GTID dedup keeps each
    transaction's FIRST delivery (operators/cdc_filters.dedup_by_gtid)
    and the cross-batch GTID store drops every later one
    (streaming/gtid_stream.py), so a partial first copy would win and
    the complete re-dump would be discarded — the transaction's tail
    rows would never apply. The tail therefore lands WHOLE transactions
    only: the trailing open transaction is trimmed at its ``# at``
    event-start marker, and the resume cursor points at that marker so
    the retry re-dumps the transaction from its GTID preamble onward.

    Dumps without transaction framing (servers running without
    gtid_mode / binlogs of autocommit statements) pass through
    untouched — every event is its own implicit transaction and there
    is nothing safe to cut.
    """
    lines = dump_text.splitlines(keepends=True)
    last_at: tuple[int, int] | None = None  # (pos, line index)
    open_start: tuple[int, int] | None = None
    for i, raw in enumerate(lines):
        stripped = raw.strip()
        m = _AT_RE.match(stripped)
        if m:
            last_at = (int(m.group(1)), i)
            continue
        g = _GTID_NEXT_RE.search(stripped)
        if g:
            if g.group(1).upper() == "AUTOMATIC":
                open_start = None
            elif open_start is None:
                open_start = last_at
            continue
        if stripped == "BEGIN" and open_start is None:
            open_start = last_at
            continue
        if stripped.startswith("COMMIT") or stripped.startswith("ROLLBACK"):
            open_start = None
    if open_start is None:
        return dump_text, None
    pos, line_idx = open_start
    return "".join(lines[:line_idx]), pos


@dataclass
class TailState:
    """Resumable cursor: which log, and how far into it we've landed."""

    log_file: str
    position: int = BINLOG_MAGIC_POS
    files_written: int = 0
    rotations: int = 0
    dump_failures: int = 0  # transient mysqlbinlog failures retried


def _land_atomic(watch_dir: str, name: str, text: str) -> str:
    """Write ``text`` into ``watch_dir/name`` via temp + atomic rename.

    The streaming file source lists the directory between micro-batches;
    ``os.replace`` guarantees it either sees the whole file or nothing.
    """
    fd, tmp = tempfile.mkstemp(dir=watch_dir, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(text)
        final = os.path.join(watch_dir, name)
        os.replace(tmp, final)
        return final
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def tail_once(
    state: TailState,
    watch_dir: str,
    *,
    binary: str = "mysqlbinlog",
    password: str = "",
    **conn,
) -> bool:
    """One tail iteration; returns True if a new dump file landed.

    Pure with respect to ``state`` + server: dump from
    ``state.position``, land new events (if any), advance the cursor —
    on rotation, jump to the next log at the magic position so the next
    iteration re-invokes the binary for the new file. The password goes
    via ``MYSQL_PWD`` in the subprocess env, never argv (see
    :func:`remote_argv`).
    """
    argv = remote_argv(
        state.log_file, binary=binary, start_position=state.position, **conn
    )
    proc = subprocess.run(
        argv, capture_output=True, text=True, check=True,
        env=remote_env(password),
    )
    # Whole transactions only: a dump cut mid-transaction (connection
    # died inside a GTID block) is trimmed back to the last transaction
    # boundary, so the GTID dedup downstream never sees a partial first
    # delivery (see trim_incomplete_txn). The trimmed cursor naturally
    # resumes at the open transaction's start: its `# at` equals the
    # previous event's end_log_pos, which is last_end_pos of the
    # trimmed text.
    text, _open_txn = trim_incomplete_txn(proc.stdout)
    end = last_end_pos(text)
    rot = rotate_target(text)
    grew = end is not None and end > state.position
    landed = False
    if grew:
        name = f"{os.path.basename(state.log_file)}.from{state.position}.txt"
        _land_atomic(watch_dir, name, text)
        state.files_written += 1
        state.position = end
        landed = True
    if rot is not None:
        state.log_file, state.position = rot[0], max(rot[1], BINLOG_MAGIC_POS)
        state.rotations += 1
    return landed


def tail_remote_binlog(
    watch_dir: str,
    start_file: str,
    *,
    binary: str = "mysqlbinlog",
    host: str = "127.0.0.1",
    port: int = 3306,
    user: str = "root",
    password: str = "",
    poll_interval: float = 1.0,
    max_iterations: int | None = None,
    stop_event=None,
    max_consecutive_failures: int = 30,
) -> TailState:
    """Producer loop: tail the server's binlog into ``watch_dir``.

    Runs until ``stop_event`` (a ``threading.Event``) is set or
    ``max_iterations`` elapse (tests); sleeps ``poll_interval`` between
    EMPTY polls only — a growing log is drained as fast as the binary
    streams it. Returns the final cursor so a caller can persist and
    resume it.

    Transient dump failures (server restart, dropped replication
    connection — ``mysqlbinlog`` exits non-zero) do NOT kill the tail:
    the iteration is treated as an empty poll and retried from the SAME
    checkpointed (file, position) cursor, which is exactly what makes
    per-rotation re-invocation resumable. ``max_consecutive_failures``
    bounds a hard outage — after that many back-to-back failures the
    last error re-raises so the operator sees it instead of a silent
    forever-retry. That re-raise carries the failing argv in
    ``CalledProcessError.cmd``, which is safe to log precisely because
    the password is never on argv — it rides ``MYSQL_PWD`` in the
    subprocess environment (:func:`remote_env`).

    Binary-gated up front: absent ``mysqlbinlog`` raises immediately
    with the actionable message, not after the stream is already up.
    """
    if shutil.which(binary) is None:
        raise FileNotFoundError(
            f"{binary!r} not found on PATH — the live remote tail needs the "
            "mysqlbinlog client binary (--read-from-remote-server). Install "
            "the MySQL client tools, or point --mysqlbinlog-bin at the "
            "binary; for offline use pass text dumps via --watch-dir instead."
        )
    os.makedirs(watch_dir, exist_ok=True)
    state = TailState(log_file=start_file)
    conn = dict(host=host, port=port, user=user, password=password)
    n = 0
    failures = 0
    while True:
        if stop_event is not None and stop_event.is_set():
            return state
        try:
            landed = tail_once(state, watch_dir, binary=binary, **conn)
            failures = 0
        except subprocess.CalledProcessError:
            failures += 1
            state.dump_failures += 1
            if failures >= max_consecutive_failures:
                raise
            landed = False  # transient: wait, then retry the same cursor
        n += 1
        if max_iterations is not None and n >= max_iterations:
            return state
        if not landed:
            if stop_event is not None:
                stop_event.wait(poll_interval)
            else:
                time.sleep(poll_interval)
