"""Per-round environment-seam probe (VERDICT r10 #5).

Three real-backend seams are environment-gated in this container (no
pip/apt/network): delta-spark, the spark-sql-kafka connector, and
pymysql. The gates are honest — each skip/refusal carries the runnable
body — but a container change should be NOTICED the round it happens,
not whenever someone re-reads the skip list. This probe re-checks all
three every run, persists the result to ``tools/env_seams.json`` (a
stable committed file, so an unlock shows up as a git diff), and FAILS
LOUDLY if a seam unlocked but the corresponding real-backend test
would not run:

* delta-spark importable but ``tests/test_merge_delta_real.py``'s own
  gate still skipping → inconsistent gating, fail;
* pymysql importable → there is no skipif-gated live test yet (only
  refusal pins, ``streaming/apply_sink.py:36``), so the unlock itself
  fails this probe until one is written;
* ``format("kafka")`` loadable → same contract as the pin in
  ``tests/test_debezium_kafka_contract.py``: upgrade to a live read.
"""

from __future__ import annotations

import importlib.util
import json
import os

_RECORD = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "env_seams.json",
)


def _kafka_loadable(spark) -> bool:
    try:
        spark.read.format("kafka").option(
            "kafka.bootstrap.servers", "localhost:9092"
        ).option("subscribe", "t").load()
        return True
    except Exception:  # noqa: BLE001
        return False


def test_environment_seams(spark):
    seams = {
        "delta_spark": importlib.util.find_spec("delta") is not None,
        "kafka_connector": _kafka_loadable(spark),
        "pymysql": importlib.util.find_spec("pymysql") is not None,
    }
    # persist so an unlock is visible as a git diff the round it lands
    with open(_RECORD, "w") as f:
        json.dump(seams, f, indent=2, sort_keys=True)
        f.write("\n")

    if seams["delta_spark"]:
        # the real-Delta test gates on its own probe; if the import
        # works but that gate still skips, the unlock would be missed
        real = os.path.join(os.path.dirname(__file__), "test_merge_delta_real.py")
        spec = importlib.util.spec_from_file_location("_delta_real_gate", real)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        assert mod._delta_available(), (
            "delta is importable but test_merge_delta_real.py would "
            "still skip — fix its gate so the live MERGE test runs"
        )
    assert not seams["kafka_connector"], (
        "format('kafka') loaded — a connector is now available; "
        "upgrade tests/test_debezium_kafka_contract.py to a live "
        "swap-in read"
    )
    assert not seams["pymysql"], (
        "pymysql is now importable — write the live apply-sink test "
        "(streaming/apply_sink.py pymysql_executor) and drop this guard"
    )
