"""Parquet table loaders for the TPC-H-ish star schema (TESTDATA.md).

``spark.read.parquet`` gives Catalyst full pushdown: filters and column
pruning reach the scan (``PushedFilters`` / ``ReadSchema`` in
``.explain``), and partition-sized splits parallelize a 100 TB table
across however many executors exist. Nothing here materializes data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor; fact
# tables scale with SF and must never be broadcast.
DIM_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # Defensive: the driver may call queries() with ITS OWN SparkSession
    # (without session.py's configs). Both confs are runtime-settable;
    # without nanosAsLong the events scan throws PARQUET_TYPE_ILLEGAL,
    # and a non-UTC session TZ would skew timestamp compares.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark reads as a
        # LongType nanos-since-epoch under spark.sql.legacy.parquet.nanosAsLong
        # (set in session.py). The data is microsecond-precise (verified:
        # epoch_ns % 1000 == 0 for every row), so the µs conversion is lossless.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            # integer DIV: double division would lose precision at 1e18 ns
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so ``spark.sql`` queries run."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
