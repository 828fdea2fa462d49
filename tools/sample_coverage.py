"""Driver-sample coverage report.

The driver's CORRECTNESS_r{N}.json checks a ~50-query sample of the
registry per round; queries outside the union of all samples have never
been driver-verified and rely on the in-repo full-oracle gate
(tests/test_full_oracles.py → tools/check_oracles.py, ALL registered
queries every pytest run). This report makes that split explicit:
which queries any driver round has sampled, which only the full gate
covers — so "driver green" is never mistaken for "registry covered".

Usage: python tools/sample_coverage.py   (writes tools/sample_coverage.json)
"""

from __future__ import annotations

import glob
import json
import os
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> int:
    from log2sql_spark import registry

    registered = sorted(registry.all_queries())
    sampled: dict[str, list[str]] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(path).replace("CORRECTNESS_", "").replace(".json", "")
        try:
            data = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        for name in data:
            sampled.setdefault(name, []).append(rnd)

    driver_sampled = sorted(set(sampled) & set(registered))
    never_sampled = sorted(set(registered) - set(sampled))
    stale = sorted(set(sampled) - set(registered))  # renamed/removed queries
    report = {
        "registered": len(registered),
        "driver_sampled": len(driver_sampled),
        "full_gate_only": len(never_sampled),
        "note": (
            "every registered query is checked against its DuckDB oracle "
            "by tests/test_full_oracles.py on every pytest run; the driver "
            "additionally re-checks a ~50-query rotating sample per round"
        ),
        "sampled_rounds": {n: sampled[n] for n in driver_sampled},
        "never_driver_sampled": never_sampled,
        "sampled_but_no_longer_registered": stale,
    }
    out = os.path.join(_REPO, "tools", "sample_coverage.json")
    # Carry the hand-written vacuity audit (round 9: disposition of every
    # <=2-row-at-sf0.01 query) forward across regenerations.
    try:
        prev = json.load(open(out))
        if "vacuity_audit" in prev:
            report["vacuity_audit"] = prev["vacuity_audit"]
    except (OSError, json.JSONDecodeError):
        pass
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(
        f"{report['registered']} registered; {report['driver_sampled']} "
        f"driver-sampled across rounds; {report['full_gate_only']} covered "
        f"only by the full oracle gate -> {out}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
