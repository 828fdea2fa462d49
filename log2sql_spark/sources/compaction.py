"""Small-file compaction: the table-maintenance operator.

Streaming sinks and fine-grained partitioning leave thousands of tiny
parquet files; at 100 TB, scan throughput is then dominated by file
open/footer costs and the driver's listing. Compaction rewrites a
directory to ~target-sized files (size-derived partition count, not a
guess), preserving the data exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files if not f.startswith("."))
    return total


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    sort_by: list[str] | None = None,
) -> int:
    """Rewrite ``path`` with ⌈size/target⌉ files; returns the new file
    count. ``sort_by`` optionally clusters rows (range-partitioned sort)
    so min/max row-group stats become selective after the rewrite."""
    df = spark.read.parquet(path)
    n_files = max(1, -(-dir_bytes(path) // (target_file_mb * 1024 * 1024)))
    out = df.repartitionByRange(n_files, *sort_by) if sort_by else df.repartition(n_files)
    tmp = path.rstrip("/") + ".compact.tmp"
    out.write.mode("overwrite").parquet(tmp)
    import shutil

    shutil.rmtree(path)
    os.rename(tmp, path)
    return len(
        [f for f in os.listdir(path) if f.endswith(".parquet") and not f.startswith(".")]
    )
