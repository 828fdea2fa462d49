"""Full-registry correctness gate, in-repo.

The driver samples ~50 of the registered queries per round; this test
runs ALL of them (tools/check_oracles.py: Spark vs DuckDB oracle,
rowcount + columns + order-insensitive value hash at sf0.01) so a
regression in any registered query fails `pytest tests/` — no silent
rotation out of the checked set.

Runs in a subprocess so it gets its own full-width Spark session and
cannot poison the shared 4-cpu test session. Skippable for quick
iteration with SPARK_GRAFT_SKIP_SLOW=1.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.slow


@pytest.mark.skipif(
    bool(os.environ.get("SPARK_GRAFT_SKIP_SLOW")),
    reason="SPARK_GRAFT_SKIP_SLOW set",
)
def test_all_registered_queries_match_oracles() -> None:
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "check_oracles.py")],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    summary = "\n".join(
        ln for ln in proc.stdout.splitlines() if ln.startswith(("FAIL", "rows "))
    )
    tail = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    assert proc.returncode == 0, (
        f"oracle gate failed ({tail}):\n{summary}\n{proc.stderr[-2000:]}"
    )
