"""SparkSession factory tuned for the engine.

Local-mode defaults mirror what we would set on a real cluster: AQE on
(runtime re-planning, skew-join splitting, partition coalescing), Arrow
for every Python↔JVM crossing, shuffle partitions sized to the
parallelism actually available rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# On a 1000-executor cluster this would be ~2-3x total cores; in
# local[N] mode it should match N so no thread sits idle on the tail.
_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "log2sql_spark", cpus: str | None = None) -> SparkSession:
    """Build (or reuse) the session.

    All knobs here survive a 100x scale-up unchanged except
    ``shuffle.partitions`` which a cluster deploy would raise with the
    core count; AQE coalescing makes an over-estimate cheap.
    """
    cpus = cpus or _DEFAULT_CPUS
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Split size sized for local[N]: the bench datasets arrive as ONE
        # parquet file per table (sf1 lineitem ~184 MB), so the default
        # 128 MB split would scan the biggest fact table on 2 cores while
        # 30 idle. 8 MB splits every bench table across the full
        # parallelism (scan-heavy sf1 queries ~40% faster). A cluster
        # deploy reverts to the 128 MB default: at 100 TB the input is
        # many files and 8 MB splits would mean 12.5M scan tasks of pure
        # scheduling overhead.
        .config("spark.sql.files.maxPartitionBytes", os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m"))
        # openCostInBytes stays at Spark's 4 MB default. r14 dropped the
        # floor to 256 KB (10 MB sf0.1 fact tables then scan as ~31
        # tasks instead of ~3); warmed best-of-N A/Bs looked faster, but
        # under the driver's cold fresh-JVM protocol the extra task
        # scheduling was a flat +0.05-0.3 s tax on every scan-bound
        # query (r14: 15 headline queries regressed 20-50%; r15 cold
        # A/B: q1/q5/agg_rollup consistently ~0.1 s better at 4 MB,
        # nothing better at 256 KB). Splits are identical at sf1+ where
        # bytes/core exceeds the floor, so the default loses nothing at
        # scale. Env-overridable for deploys with different open costs.
        .config("spark.sql.files.openCostInBytes", os.environ.get("SPARK_GRAFT_OPEN_COST_BYTES", str(4 * 1024 * 1024)))
        # testdata events.parquet stores TIMESTAMP(NANOS); Spark reads it
        # as LongType nanos under this flag (converted in sources.tables).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        # No \r[Stage ...] progress bars on stdout: harness/driver tools
        # parse the last line of stdout, and progress floods push it out
        # of their capture window.
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    # expose spark.read.format("binlog") (Python DataSource V2)
    from log2sql_spark.sources.binlog_datasource import register

    register(spark)
    # expose spark.readStream.format("snapshot_cdf") (store CDF stream)
    from log2sql_spark.sources.cdf_datasource import register as register_cdf

    register_cdf(spark)
    # expose spark.readStream.format("catalog_cdf") (multi-table
    # transaction-consistent CDF stream over a StoreCatalog)
    from log2sql_spark.sources.catalog_cdf_datasource import (
        register as register_catalog_cdf,
    )

    register_catalog_cdf(spark)
    return spark
