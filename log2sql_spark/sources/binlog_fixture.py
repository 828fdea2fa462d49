"""Synthetic ``mysqlbinlog --base64-output=decode-rows -vv`` fixture text.

The reference has no tests and no checked-in dumps, so golden tests and
the oracle-checked CDC queries generate their own dump text in the
public mysqlbinlog row-event format (FIXTURES.md §B). The generator is
the *inverse* of the parser — kept deliberately independent of it (it
renders strings; the parser state-machines over lines) so tests are a
real round-trip, not a tautology.
"""

from __future__ import annotations

from datetime import datetime

HEADER_POS_STEP = 120  # deterministic synthetic positions: 4, 124, 244, …


def sql_literal(value) -> str:
    """Render a Python value the way mysqlbinlog -vv decode-rows does:
    ints/floats bare, strings single-quoted, None as NULL."""
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return str(int(value))
    if isinstance(value, (int, float)):
        return repr(value)
    if isinstance(value, datetime):
        return f"'{value.strftime('%Y-%m-%d %H:%M:%S')}'"
    return "'" + str(value).replace("'", "\\'") + "'"


def _value_lines(image: list, with_type_comment: bool) -> list[str]:
    lines = []
    for ordinal, token in image:
        comment = " /* VARSTRING(255) meta=255 nullable=1 is_null=0 */" if with_type_comment else ""
        lines.append(f"###   @{ordinal}={token}{comment}")
    return lines


def render_binlog(events: list[dict], server_id: int = 1, with_type_comments: bool = True) -> str:
    """Events → dump text.

    Each event dict: ``op`` (insert/update/delete/ddl), ``db``, ``table``,
    ``ts`` (datetime), and images as ``[(ordinal, raw_token), …]``:
    ``values`` for insert/delete, ``before``+``after`` for update,
    ``statement`` for ddl. Positions are synthesized deterministically.

    Transaction markers (optional): ``gtid`` on an event emits the
    ``SET @@SESSION.GTID_NEXT= '<gtid>'`` preamble plus ``BEGIN`` before
    it (a new transaction starts at this event); ``commit: True`` emits
    ``COMMIT`` after it. The marker statements are emitted without their
    own ``# at`` headers (a simplification over real dumps — the parser
    keys on the statements, not their headers), so row-event positions
    keep the same deterministic arithmetic either way.
    """
    out: list[str] = ["/*!50530 SET @@SESSION.PSEUDO_SLAVE_MODE=1*/;"]
    pos = 4
    for ev in events:
        if ev.get("gtid"):
            out.append(f"SET @@SESSION.GTID_NEXT= '{ev['gtid']}'/*!*/;")
            out.append("BEGIN")
            out.append("/*!*/;")
        ts: datetime = ev["ts"]
        hdr_ts = ts.strftime("%y%m%d %H:%M:%S")
        stop = pos + HEADER_POS_STEP
        op = ev["op"]
        if op == "ddl":
            out.append(f"# at {pos}")
            out.append(
                f"#{hdr_ts} server id {server_id}  end_log_pos {stop} CRC32 0x1234abcd \tQuery\tthread_id=7\texec_time=0\terror_code=0"
            )
            out.append(f"use `{ev['db']}`/*!*/;")
            out.append(f"SET TIMESTAMP={int(ts.timestamp())}/*!*/;")
            out.append(ev["statement"].rstrip(";") + "\n/*!*/;")
        else:
            event_kind = {"insert": "Write_rows", "update": "Update_rows", "delete": "Delete_rows"}[op]
            out.append(f"# at {pos}")
            out.append(
                f"#{hdr_ts} server id {server_id}  end_log_pos {stop} CRC32 0x1234abcd \t{event_kind}: table id 108 flags: STMT_END_F"
            )
            tbl = f"`{ev['db']}`.`{ev['table']}`"
            if op == "insert":
                out.append(f"### INSERT INTO {tbl}")
                out.append("### SET")
                out.extend(_value_lines(ev["values"], with_type_comments))
            elif op == "delete":
                out.append(f"### DELETE FROM {tbl}")
                out.append("### WHERE")
                out.extend(_value_lines(ev["values"], with_type_comments))
            else:
                out.append(f"### UPDATE {tbl}")
                out.append("### WHERE")
                out.extend(_value_lines(ev["before"], with_type_comments))
                out.append("### SET")
                out.extend(_value_lines(ev["after"], with_type_comments))
        if ev.get("commit"):
            out.append("COMMIT/*!*/;")
        pos = stop
    out.append("# End of log file")
    return "\n".join(out) + "\n"
