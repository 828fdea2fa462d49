"""Runtime-metrics regression gate: the plan fingerprint's missing half.

The static fingerprint (tools/plan_fingerprint.py) pins plan SHAPE —
it cannot see data-volume regressions: a filter that stops pruning
rows, a broadcast table that grew 10x, a dedup blocking key that
degenerated. This tool EXECUTES every registered query at sf0.01 and
records what actually moved:

* ``shuffle_records`` — rows written to shuffle across the query's
  stages (the number that predicts 100 TB shuffle cost; deterministic
  for a fixed plan + data).
* ``shuffle_bytes``   — informational (codec/timing variance).
* ``rows_out``        — result cardinality, captured via a ride-along
  ``observe`` so the plan executes exactly once.

Capture reads the JVM AppStatusStore (works with spark.ui.enabled
false): stage IDs are monotonically increasing, so each query's
metrics are the sum over stages created during its run — no listener,
no REST server, no double execution.

The pytest gate (tests/test_runtime_metrics.py) fails any query whose
recomputed shuffle_records grew beyond 2x committed (above an absolute
floor) without an in-file disposition in ``DISPOSITIONS`` below, and
proves itself live on an intentionally de-pruned plan.

Usage:
    python tools/runtime_metrics.py            # check (exit 1 on regressions)
    python tools/runtime_metrics.py --update   # rewrite the committed file
    python tools/runtime_metrics.py --update q1_pricing_summary ...  # subset
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

METRICS_PATH = _REPO / "tools" / "runtime_metrics.json"
DEFAULT_SF_DIR = "/root/testdata/sf0.01"

# Gate thresholds: shuffle-record growth is a regression when BOTH
# hold — the ratio is large AND the absolute growth is non-trivial
# (tiny queries shuffle O(100) rows where one AQE coalesce decision
# flips counts by small absolute amounts).
GROWTH_RATIO = 2.0
GROWTH_FLOOR = 10_000  # absolute record growth below this never fails

# In-file dispositions: queries whose shuffle volume legitimately
# varies run-to-run (sampling-order-dependent iterative convergence,
# wall-clock-keyed fixtures). Each entry must say WHY.
DISPOSITIONS: dict[str, str] = {
    # graph iterations converge in a data-dependent number of rounds;
    # round count is stable at fixed sf but the eager localCheckpoint
    # chain attributes per-round shuffles that AQE may re-coalesce
    # differently across Spark task-size decisions.
    "graph_connected_components": "iterative rounds; shuffle volume tracks convergence path",
    "graph_kcore_decomposition": "iterative peeling rounds; volume tracks convergence path",
}


def _stage_rows(spark):
    """All stages the app has run so far: [(stage_id, shuffle_write_records,
    shuffle_write_bytes)]. Reads the always-on AppStatusStore via py4j."""
    sc = spark.sparkContext
    jsc = sc._jsc.sc()
    try:
        jsc.listenerBus().waitUntilEmpty(30_000)
    except Exception:  # noqa: BLE001 — older signature: no-arg variant
        try:
            jsc.listenerBus().waitUntilEmpty()
        except Exception:  # noqa: BLE001
            pass
    store = jsc.statusStore()
    jvm = spark._jvm
    # Scala default args compile to `name$default$N` getters — use them
    # for params 2-5 (details, withSummaries, quantiles double[], task
    # statuses) so the call survives signature drift across versions.
    seq = store.stageList(
        jvm.java.util.ArrayList(),
        getattr(store, "stageList$default$2")(),
        getattr(store, "stageList$default$3")(),
        getattr(store, "stageList$default$4")(),
        getattr(store, "stageList$default$5")(),
    )
    out = []
    for i in range(seq.size()):
        sd = seq.apply(i)
        out.append(
            (
                sd.stageId(),
                sd.shuffleWriteRecords(),
                sd.shuffleWriteBytes(),
            )
        )
    return out


def measure_df(spark, df) -> dict:
    """Execute ``df`` once (noop sink + ride-along observe) and return
    its runtime metrics: shuffle records/bytes summed over the stages
    this execution created, plus result row count."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    before_ids = {s[0] for s in _stage_rows(spark)}
    obs = Observation()
    df.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
        "overwrite"
    ).format("noop").save()
    rows_out = obs.get["n"]
    recs = byts = 0
    for sid, r, b in _stage_rows(spark):
        if sid not in before_ids:
            recs += r
            byts += b
    return {
        "shuffle_records": int(recs),
        "shuffle_bytes": int(byts),
        "rows_out": int(rows_out),
    }


def compute_all(spark, sf_dir: str, names: list[str] | None = None) -> dict:
    from log2sql_spark import registry

    out: dict[str, dict] = {}
    queries = registry.all_queries()
    for name, fn in sorted(queries.items()):
        if names and name not in names:
            continue
        try:
            out[name] = measure_df(spark, fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": str(exc)[:200]}
        spark.catalog.clearCache()  # drop per-query persist() leaks
    return out


def load_committed() -> dict:
    if not METRICS_PATH.exists():
        return {}
    return json.loads(METRICS_PATH.read_text())


def diff_metrics(old: dict, new: dict) -> tuple[list[str], list[str]]:
    """(regressions, notices). A regression = shuffle_records grew
    beyond GROWTH_RATIO x committed AND by more than GROWTH_FLOOR
    absolute, for a query with no disposition. Bytes and rows_out are
    informational (rows correctness is the oracle gate's job)."""
    regressions: list[str] = []
    notices: list[str] = []
    for name, nm in sorted(new.items()):
        om = old.get(name)
        if om is None:
            notices.append(f"{name}: NEW query — run --update to commit its metrics")
            continue
        if "error" in nm:
            if "error" not in om:
                regressions.append(f"{name}: execution now errors: {nm['error']}")
            continue
        if "error" in om:
            notices.append(f"{name}: previously errored, now runs — run --update")
            continue
        growth = nm["shuffle_records"] - om["shuffle_records"]
        if (
            nm["shuffle_records"] > GROWTH_RATIO * max(om["shuffle_records"], 1)
            and growth > GROWTH_FLOOR
        ):
            msg = (
                f"{name}: shuffle records grew {om['shuffle_records']} -> "
                f"{nm['shuffle_records']} (>{GROWTH_RATIO}x; a filter stopped "
                "pruning or a broadcast grew?)"
            )
            if name in DISPOSITIONS:
                notices.append(f"{msg} [disposition: {DISPOSITIONS[name]}]")
            else:
                regressions.append(msg)
        elif nm["shuffle_records"] * GROWTH_RATIO < om["shuffle_records"] and (
            om["shuffle_records"] - nm["shuffle_records"] > GROWTH_FLOOR
        ):
            notices.append(
                f"{name}: shuffle records improved {om['shuffle_records']} -> "
                f"{nm['shuffle_records']}"
            )
        if om.get("rows_out") != nm.get("rows_out"):
            notices.append(
                f"{name}: rows_out changed {om.get('rows_out')} -> "
                f"{nm.get('rows_out')} (oracle gate owns correctness)"
            )
    for name in sorted(set(old) - set(new)):
        notices.append(f"{name}: no longer registered — run --update to drop it")
    return regressions, notices


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    update = "--update" in sys.argv
    names = args or None

    from log2sql_spark import get_spark

    spark = get_spark("runtime_metrics")
    spark.sparkContext.setLogLevel("ERROR")
    new = compute_all(spark, DEFAULT_SF_DIR, names)

    if update:
        committed = load_committed()
        committed.update(new)
        if names is None:
            committed = {k: v for k, v in committed.items() if k in new}
        METRICS_PATH.write_text(
            json.dumps(committed, indent=1, sort_keys=True) + "\n"
        )
        errs = [k for k, v in committed.items() if "error" in v]
        print(f"wrote {METRICS_PATH} ({len(committed)} queries, {len(errs)} errors)")
        for k in errs:
            print(f"  ERROR {k}: {committed[k]['error']}")
        return 1 if errs else 0

    old = load_committed()
    if not old:
        print("no committed metrics — run with --update first")
        return 1
    regressions, notices = diff_metrics(old, new)
    for n in notices:
        print(f"NOTE  {n}")
    for r in regressions:
        print(f"REGRESSION  {r}")
    print(f"\n{len(new)} checked: {len(regressions)} regressions, {len(notices)} notices")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
