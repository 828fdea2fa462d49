"""Real-Delta MERGE execution — environment-gated.

The round-9 verdict asked for `execute_merge` run against an actual
Delta table. Documented environment refusal: this container forbids
`pip`/`apt` installs and has no network, so neither the `delta-spark`
Python package nor the `io.delta:delta-spark` jar (an Ivy/Maven fetch
via `spark.jars.packages`) can land. The availability probe below keeps
the test honest: the moment a future environment provides Delta, the
body runs the full MERGE + final-state hash comparison instead of
skipping.

Until then the rendered MERGE is machine-EXECUTED elsewhere: DuckDB
runs the translated clause skeleton and the final state hash-matches
the snapshot-store apply (tools/duckdb_merge.py,
tests/test_merge_duckdb_exec.py) — so the SQL the delta backend emits
is validated end-to-end, just not by Delta's own parser.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

_SKIP_REASON = (
    "environment refusal: delta-spark is not installed and cannot be — this "
    "container forbids pip/apt and has no network for the ivy fetch of "
    "io.delta:delta-spark. Rendered MERGE is instead executed and "
    "final-state-hash-checked on DuckDB (tests/test_merge_duckdb_exec.py)."
)


def _delta_available() -> bool:
    if importlib.util.find_spec("delta") is None:
        return False
    spark_home = os.environ.get("SPARK_HOME", "")
    jars = os.path.join(spark_home, "jars")
    if os.path.isdir(jars) and not any(
        "delta-spark" in j or "delta-core" in j for j in os.listdir(jars)
    ):
        # python package without the jar still can't execute MERGE
        return False
    return True


@pytest.mark.skipif(not _delta_available(), reason=_SKIP_REASON)
def test_execute_merge_against_real_delta(tmp_path):
    """When Delta IS available: execute_merge(backend='delta') against a
    real Delta table must produce the same final state as the
    snapshot-store apply of the same change set."""
    from pyspark.sql import SparkSession

    from log2sql_spark.operators.merge import execute_merge
    from log2sql_spark.store import SnapshotStore

    builder = (
        SparkSession.builder.master("local[4]")
        .appName("delta_merge_real")
        .config("spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension")
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
        .config("spark.sql.warehouse.dir", str(tmp_path / "wh"))
    )
    spark = builder.getOrCreate()
    try:
        base = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
        base.write.format("delta").saveAsTable("t_delta")
        changes = spark.createDataFrame(
            [(2, "b2", "update", 1), (3, "c", "insert", 1), (1, None, "delete", 1)],
            "k int, v string, op string, seq int",
        )
        execute_merge(
            spark, changes, "t_delta", key_cols="k", version_cols="seq",
            backend="delta",
        )
        delta_state = {
            (r.k, r.v) for r in spark.table("t_delta").select("k", "v").collect()
        }

        store = SnapshotStore(str(tmp_path / "snap"))
        store.commit(base, mode="overwrite")
        execute_merge(
            spark, changes, "ignored", key_cols="k", version_cols="seq",
            store=store,
        )
        store_state = {
            (r.k, r.v) for r in store.read(spark).select("k", "v").collect()
        }
        assert delta_state == store_state == {(2, "b2"), (3, "c")}
    finally:
        spark.stop()
