"""Fast vacuity guard for the oracle registry (no Spark needed).

The full gate (tools/check_oracles.py, slow-marked twin in
test_full_oracles.py) FAILS any 0-row/0-row oracle match as vacuous.
This is its always-on half: every registered oracle runs on DuckDB
alone at sf0.01 — if the ORACLE returns 0 rows, the Spark-vs-oracle
comparison can only ever pass vacuously, so a future fixture or
synthesis change that re-vacuifies a query (the llm_dedup_url_canonical
failure mode: 8 rounds of 0-row "passes") fails `pytest tests/`
immediately, without waiting for the slow gate.

Also pins the hand-audit contract from tools/sample_coverage.json:
every oracle returning <= 2 rows must carry a written adjudication
(scalar-by-design / pruned-by-design), so tiny result sets stay a
reviewed choice, not an accident.
"""

from __future__ import annotations

import json
from pathlib import Path

import duckdb
import pytest

from log2sql_spark import registry

REPO = Path(__file__).resolve().parent.parent
SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="module")
def oracle_rowcounts():
    import sys

    sys.path.insert(0, str(REPO / "tools"))
    from check_oracles import EXPECTED_EMPTY

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    counts = {}
    for name, sql in registry.all_oracles().items():
        counts[name] = len(con.execute(sql).fetchdf())
    con.close()
    return counts, EXPECTED_EMPTY


def test_no_oracle_is_vacuously_empty(oracle_rowcounts):
    counts, expected_empty = oracle_rowcounts
    vacuous = sorted(
        n for n, c in counts.items() if c == 0 and n not in expected_empty
    )
    assert not vacuous, (
        f"{len(vacuous)} oracle(s) return 0 rows at sf0.01 — the correctness "
        f"comparison is vacuous for them: {vacuous}. Fix the fixture/synthesis "
        "or opt in via tools/check_oracles.py EXPECTED_EMPTY with a reason."
    )


def test_tiny_oracles_are_hand_audited(oracle_rowcounts):
    counts, _ = oracle_rowcounts
    audit = json.loads((REPO / "tools" / "sample_coverage.json").read_text())[
        "vacuity_audit"
    ]
    adjudicated = set()
    for section in ("one_row_by_design", "two_rows_by_design", "fixed"):
        adjudicated |= set(audit.get(section, {}))
    tiny = {n for n, c in counts.items() if 0 < c <= 2}
    missing = sorted(tiny - adjudicated)
    assert not missing, (
        f"oracle(s) returning <=2 rows without a hand-audit entry in "
        f"tools/sample_coverage.json vacuity_audit: {missing}. Add an "
        "adjudication via tools/sample_coverage.py (edit the tool, not the "
        "artifact) or widen the query's result."
    )
    # stale entries: adjudicated names must still be registered (catches
    # renames that would silently retire an audit)
    stale = sorted(adjudicated - set(counts))
    assert not stale, f"vacuity_audit entries no longer registered: {stale}"
