"""Table maintenance + apply-sink tests: small-file compaction and the
streaming SQL-apply executor path."""

from __future__ import annotations

import os
from datetime import datetime

from log2sql_spark.sources.binlog_fixture import render_binlog
from log2sql_spark.sources.catalog import catalog_from_dict
from log2sql_spark.sources.compaction import compact_parquet
from log2sql_spark.sources.tables import load_table
from log2sql_spark.streaming.apply_sink import stream_apply_sql

TS = datetime(2024, 5, 1, 12, 0, 7)


def test_compaction_reduces_files_preserves_data(spark, sf_dir, tmp_path):
    out = str(tmp_path / "frag")
    li = load_table(spark, "lineitem", sf_dir)
    li.repartition(32).write.parquet(out)  # fragment: 32 tiny files
    before_files = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    before_n = spark.read.parquet(out).count()
    before_sum = spark.read.parquet(out).groupBy().sum("l_quantity").collect()[0][0]

    n_files = compact_parquet(spark, out, target_file_mb=128, sort_by=["l_shipdate"])

    assert n_files < before_files
    assert spark.read.parquet(out).count() == before_n
    assert spark.read.parquet(out).groupBy().sum("l_quantity").collect()[0][0] == before_sum


def test_stream_apply_sql_executes_in_binlog_order(spark, tmp_path):
    in_dir, ckpt = tmp_path / "in", tmp_path / "ckpt"
    in_dir.mkdir()
    cat = catalog_from_dict(
        spark, {"shop.orders": {"columns": ["id", "status"], "key_columns": ["id"]}}
    )
    (in_dir / "bin.000001.txt").write_text(
        render_binlog(
            [
                {"op": "insert", "db": "shop", "table": "orders", "ts": TS,
                 "values": [(1, "1"), (2, "'a'")]},
                {"op": "update", "db": "shop", "table": "orders", "ts": TS,
                 "before": [(1, "1"), (2, "'a'")], "after": [(1, "1"), (2, "'b'")]},
                {"op": "delete", "db": "shop", "table": "orders", "ts": TS,
                 "values": [(1, "1"), (2, "'b'")]},
            ]
        )
    )
    applied: list[str] = []
    q = stream_apply_sql(spark, str(in_dir), cat, str(ckpt), executor=applied.extend)
    q.awaitTermination(120)
    assert applied == [
        "INSERT INTO `shop`.`orders`(`id`, `status`) VALUES (1, 'a');",
        "UPDATE `shop`.`orders` SET `id`=1, `status`='b' WHERE `id`=1 LIMIT 1;",
        "DELETE FROM `shop`.`orders` WHERE `id`=1 LIMIT 1;",
    ]

    # restart: no new files -> executor must not re-fire
    applied2: list[str] = []
    q2 = stream_apply_sql(spark, str(in_dir), cat, str(ckpt), executor=applied2.extend)
    q2.awaitTermination(120)
    assert applied2 == []
