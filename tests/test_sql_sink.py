"""DataSource V2 write path: df.write.format("binlog") → .sql files.

The distributed twin of the reference's stdout sink (log2sql.py:14) —
each partition writes executor-side, commit records a manifest, append
never clobbers.
"""

from __future__ import annotations

import os

import pytest


def _read_all_sql(d: str) -> list[str]:
    lines: list[str] = []
    for f in sorted(os.listdir(d)):
        if f.endswith(".sql"):
            with open(os.path.join(d, f), encoding="utf-8") as fh:
                lines.extend(ln for ln in fh.read().splitlines() if ln)
    return lines


def test_sql_sink_writes_all_rows(spark, tmp_path):
    stmts = [f"INSERT INTO `shop`.`orders`(`k`) VALUES ({i});" for i in range(40)]
    df = spark.createDataFrame([(s,) for s in stmts], "sql_text string").repartition(4)
    d = str(tmp_path / "out")
    df.write.format("binlog").mode("overwrite").save(d)

    assert sorted(_read_all_sql(d)) == sorted(stmts)
    with open(os.path.join(d, "_SUCCESS"), encoding="utf-8") as fh:
        assert fh.read().strip() == "40"


def test_sql_sink_overwrite_and_append(spark, tmp_path):
    d = str(tmp_path / "out")
    one = spark.createDataFrame([("A;",)], "sql_text string")
    two = spark.createDataFrame([("B;",)], "sql_text string")
    one.write.format("binlog").mode("overwrite").save(d)
    one.write.format("binlog").mode("overwrite").save(d)  # replaces, not doubles
    assert _read_all_sql(d) == ["A;"]
    two.write.format("binlog").mode("append").save(d)
    assert sorted(_read_all_sql(d)) == ["A;", "B;"]


def test_sql_sink_rejects_missing_column(spark, tmp_path):
    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(Exception, match="sql_text"):
        df.write.format("binlog").mode("overwrite").save(str(tmp_path / "bad"))


def test_sql_sink_roundtrip_with_parser(spark, tmp_path):
    """End-to-end: dump → parse → codegen → .sql sink — the reference's
    whole pipeline with a distributed file sink instead of stdout."""
    from log2sql_spark import registry

    df = registry.all_queries()["cdc_insert_replay"](spark, "/root/testdata/sf0.001")
    d = str(tmp_path / "replay")
    df.select("sql_text").write.format("binlog").mode("overwrite").save(d)
    lines = _read_all_sql(d)
    assert len(lines) == df.count()
    assert all(l.startswith("INSERT INTO") and l.endswith(";") for l in lines)


def test_sql_stream_sink_batch_dirs(spark, tmp_path):
    """writeStream.format('binlog'): each micro-batch lands in its own
    batch=<id> directory with a _SUCCESS manifest; a second availableNow
    run (same checkpoint) adds a new batch without touching the first."""
    import pandas as pd

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    stream = spark.readStream.schema("sql_text string").parquet(str(in_dir))

    pd.DataFrame({"sql_text": ["A;", "B;"]}).to_parquet(in_dir / "b1.parquet")
    q = (
        stream.writeStream.format("binlog")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(_read_all_sql(os.path.join(out, "batch=0"))) == ["A;", "B;"]

    pd.DataFrame({"sql_text": ["C;"]}).to_parquet(in_dir / "b2.parquet")
    q = (
        stream.writeStream.format("binlog")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(_read_all_sql(os.path.join(out, "batch=1"))) == ["C;"]
    assert sorted(_read_all_sql(os.path.join(out, "batch=0"))) == ["A;", "B;"]
