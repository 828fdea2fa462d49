"""Apply sink: execute rendered replay/flashback SQL against a target.

The reference's consumers pipe its stdout into ``mysql`` by hand; the
engine closes the loop: per micro-batch, rendered statements are handed
to an injected executor in binlog order. The executor is a callable
``(list[str]) -> None`` — a JDBC/pymysql writer on a real deployment
(import-gated; neither is reachable in this container), a recording
fake in tests.

Ordering: statements are applied sorted by (file, start_pos, event_seq)
within the batch, and the file source delivers files in arrival order —
the per-key ordering an idempotent replay needs. The driver-side
iteration is bounded by the batch (micro-batch = a few dump files), not
the stream.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from log2sql_spark.operators.cdc_codegen import with_sql_text
from log2sql_spark.sources.binlog import read_binlog_batch_files
from log2sql_spark.sources.catalog import resolve_columns


def pymysql_executor(**connect_kwargs) -> Callable[[list[str]], None]:
    """Real-target executor (requires pymysql + a reachable MySQL —
    import-gated, untested in this container)."""
    try:
        import pymysql  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError("pymysql not installed in this environment") from exc

    def execute(statements: list[str]) -> None:  # pragma: no cover
        conn = pymysql.connect(**connect_kwargs)
        try:
            with conn.cursor() as cur:
                for stmt in statements:
                    cur.execute(stmt)
            conn.commit()
        finally:
            conn.close()

    return execute


def stream_apply_sql(
    spark: SparkSession,
    in_dir: str,
    catalog: DataFrame,
    checkpoint_dir: str,
    executor: Callable[[list[str]], None],
    flashback: bool = False,
) -> StreamingQuery:
    """Online replay: watch ``in_dir`` for dumps, render SQL, hand each
    micro-batch's statements (in binlog order) to ``executor``."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        envelope = read_binlog_batch_files(spark, batch_df)
        rendered = with_sql_text(
            resolve_columns(envelope, catalog), flashback=flashback
        )
        ordered = rendered.orderBy("file", "start_pos", "event_seq")
        stmts = [r["sql_text"] for r in ordered.select("sql_text").toLocalIterator()]
        if stmts:
            executor(stmts)

    # Discovery-only stream, one row per file (binaryFile prunes
    # `content` when unselected) — same shape as read_binlog_line_stream.
    lines = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, length bigint, content binary")
        .load(in_dir)
        .select(F.col("path").alias("file"))
    )
    return (
        lines.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
