"""Execute a rendered ``MERGE INTO`` statement on DuckDB.

The engine renders Delta-dialect ``MERGE INTO`` text
(``operators/merge.py::render_merge_into_sql`` /
``render_merge_full_sync_sql``) for the lakehouse seam. This container
has no Delta catalog, and its DuckDB (1.0) predates native ``MERGE``
— so golden-comparing the text was the only check. This module closes
that gap: it parses the rendered statement's clause skeleton and
executes it against DuckDB with standard MERGE semantics, copying every
condition, assignment, and insert expression **verbatim** into the
translated statements (only backtick quoting becomes double-quote).
A rendering bug in any expression — wrong column in UPDATE SET, missing
delete guard, bad ON key — therefore propagates into DuckDB execution
and is caught by comparing final table state, not by string similarity.

Semantics implemented (SQL:2003 / Delta):

* the source matches each target row at most once (guaranteed upstream
  by the row_number pick inside USING; not re-checked here);
* matching is evaluated against the ORIGINAL target state;
* WHEN clauses apply first-match-wins (via one CASE over the clause
  conditions, so NULL conditions correctly fall through);
* WHEN NOT MATCHED BY SOURCE targets rows without any source match.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass
class _Clause:
    kind: str  # 'matched' | 'not_matched' | 'not_matched_by_source'
    condition: str | None  # verbatim SQL, or None (unconditional)
    action: str  # 'delete' | 'update' | 'insert'
    detail: str | None  # SET list / "(cols) VALUES (vals)" payload


_WHEN_RE = re.compile(
    r"WHEN\s+(?P<kind>MATCHED|NOT\s+MATCHED\s+BY\s+SOURCE|NOT\s+MATCHED)"
    r"(?:\s+AND\s+(?P<cond>.*?))?\s+THEN\s+(?P<action>DELETE|UPDATE\s+SET|INSERT)"
    r"\s*(?P<detail>.*?)(?=\s*WHEN\s+(?:NOT\s+)?MATCHED|\s*$)",
    re.IGNORECASE | re.DOTALL,
)

_HEAD_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+(?P<target>.+?)\s+AS\s+(?P<talias>\w+)\s+"
    r"USING\s+(?P<source>\(.*\)|\S+)\s+AS\s+(?P<salias>\w+)\s+"
    r"ON\s+(?P<on>.*?)(?=\s*WHEN\s)",
    re.IGNORECASE | re.DOTALL,
)


def _dq(sql: str) -> str:
    """Backtick identifiers -> double-quoted (Delta dialect -> DuckDB)."""
    return re.sub(r"`([^`]*)`", r'"\1"', sql)


def parse_merge(sql: str) -> dict:
    head = _HEAD_RE.search(sql)
    if not head:
        raise ValueError("unrecognized MERGE statement head")
    clauses: list[_Clause] = []
    for m in _WHEN_RE.finditer(sql[head.end("on"):]):
        kind = re.sub(r"\s+", "_", m.group("kind").strip().lower())
        action_kw = m.group("action").upper()
        action = (
            "delete"
            if action_kw == "DELETE"
            else "update" if action_kw.startswith("UPDATE") else "insert"
        )
        clauses.append(
            _Clause(
                kind=kind,
                condition=m.group("cond"),
                action=action,
                detail=(m.group("detail") or "").strip() or None,
            )
        )
    if not clauses:
        raise ValueError("MERGE statement has no WHEN clauses")
    return {
        "target": head.group("target").strip(),
        "t": head.group("talias"),
        "source": head.group("source").strip(),
        "s": head.group("salias"),
        "on": head.group("on").strip(),
        "clauses": clauses,
    }


def _strip_target_prefix(assignments: str, t_alias: str) -> str:
    """``t."x" = s."x", ...`` -> ``"x" = s."x", ...`` (DuckDB UPDATE SET
    requires bare column names on the left)."""
    return re.sub(rf'(^|,\s*){t_alias}\.("?[\w]+"?)\s*=', r"\1\2 =", assignments)


def execute_merge_duckdb(con, sql: str, target_table: str | None = None) -> None:
    """Run the rendered MERGE against a DuckDB connection.

    ``target_table``: DuckDB table standing in for the Delta target
    (defaults to the statement's own target name, unquoted).
    The statement's source view/subquery must be resolvable in ``con``.
    """
    p = parse_merge(sql)
    t, s = p["t"], p["s"]
    target = target_table or _dq(p["target"]).replace('"', "")
    on = _dq(p["on"])
    src = _dq(p["source"])
    src_sql = f"SELECT * FROM {src} AS {s}" if not src.startswith("(") else f"SELECT * FROM {src} {s}"

    con.execute("DROP TABLE IF EXISTS _merge_src")
    con.execute(f"CREATE TEMP TABLE _merge_src AS {src_sql}")

    matched = [c for c in p["clauses"] if c.kind == "matched"]
    not_matched = [c for c in p["clauses"] if c.kind == "not_matched"]
    by_source = [c for c in p["clauses"] if c.kind == "not_matched_by_source"]

    def clause_case(cs: list[_Clause]) -> str:
        # first-match-wins: CASE stops at the first TRUE condition;
        # a NULL condition falls through, per standard MERGE.
        whens = []
        for i, c in enumerate(cs, start=1):
            cond = _dq(c.condition) if c.condition else "TRUE"
            whens.append(f"WHEN {cond} THEN {i}")
        return "CASE " + " ".join(whens) + " ELSE 0 END"

    # Evaluate ALL matches against the ORIGINAL target state first.
    con.execute("DROP TABLE IF EXISTS _merge_action")
    if matched:
        con.execute(
            f"CREATE TEMP TABLE _merge_action AS "
            f"SELECT {t}.rowid AS _trid, {s}.*, {clause_case(matched)} AS _clause "
            f"FROM {target} AS {t} JOIN _merge_src AS {s} ON {on}"
        )
    con.execute("DROP TABLE IF EXISTS _merge_ins")
    if not_matched:
        con.execute(
            f"CREATE TEMP TABLE _merge_ins AS "
            f"SELECT {s}.*, {clause_case(not_matched)} AS _clause "
            f"FROM _merge_src AS {s} WHERE NOT EXISTS "
            f"(SELECT 1 FROM {target} AS {t} WHERE {on})"
        )
    con.execute("DROP TABLE IF EXISTS _merge_nms")
    if by_source:
        con.execute(
            f"CREATE TEMP TABLE _merge_nms AS "
            f"SELECT {t}.rowid AS _trid FROM {target} AS {t} WHERE NOT EXISTS "
            f"(SELECT 1 FROM _merge_src AS {s} WHERE {on})"
        )

    # Apply: deletes/updates address original rows by rowid, inserts are
    # pre-materialized, so apply order cannot change the outcome.
    for i, c in enumerate(matched, start=1):
        if c.action == "delete":
            con.execute(
                f"DELETE FROM {target} WHERE rowid IN "
                f"(SELECT _trid FROM _merge_action WHERE _clause = {i})"
            )
        elif c.action == "update":
            sets = _strip_target_prefix(_dq(c.detail), t)
            con.execute(
                f"UPDATE {target} AS {t} SET {sets} FROM _merge_action AS {s} "
                f"WHERE {t}.rowid = {s}._trid AND {s}._clause = {i}"
            )
    for i, c in enumerate(not_matched, start=1):
        if c.action != "insert":
            raise ValueError("NOT MATCHED clause must INSERT")
        m = re.match(r"\((?P<cols>.*?)\)\s*VALUES\s*\((?P<vals>.*)\)", _dq(c.detail), re.DOTALL)
        if not m:
            raise ValueError(f"unrecognized INSERT payload: {c.detail!r}")
        con.execute(
            f"INSERT INTO {target} ({m.group('cols')}) "
            f"SELECT {m.group('vals')} FROM _merge_ins AS {s} WHERE {s}._clause = {i}"
        )
    for c in by_source:
        if c.action == "delete":
            con.execute(
                f"DELETE FROM {target} WHERE rowid IN (SELECT _trid FROM _merge_nms)"
            )
        elif c.action == "update":
            sets = _strip_target_prefix(_dq(c.detail), t)
            con.execute(
                f"UPDATE {target} SET {sets} WHERE rowid IN "
                f"(SELECT _trid FROM _merge_nms)"
            )
