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
        # Scan parallelism is min(maxPartitionBytes, max(openCostInBytes,
        # bytes/core)): the default 4 MB openCost floor caps a 10 MB
        # sf0.1 fact table at ~3 scan tasks on 32 cores. 256 KB keeps the
        # floor near a realistic file-open cost on fast local storage and
        # lets bytes/core govern instead, so scan tasks track the core
        # count at ANY input size (measured: q1 -36% at sf0.1; identical
        # splits at sf1+ where bytes/core already dominates). A spinning-
        # disk/object-store deploy would raise it toward the 4 MB default
        # to pack more per open; env-overridable for that reason.
        .config("spark.sql.files.openCostInBytes", os.environ.get("SPARK_GRAFT_OPEN_COST_BYTES", str(256 * 1024)))
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
