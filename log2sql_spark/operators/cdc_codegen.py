"""Replay / flashback SQL-text codegen over the CDC envelope.

Re-expresses the reference's ``generate_sql_pattern`` (``log2sql.py:135-185``)
as a column projection: the rendered statement is just another column,
built entirely from JVM-side map/array/string expressions (no Python in
the data path), so it codegens into the same whole-stage pipeline as the
rest of the plan.

Semantics matched to the reference:

* replay  (``flashback=False``): insert→INSERT, delete→DELETE … LIMIT 1,
  update→UPDATE SET <after> WHERE <before> LIMIT 1 (``log2sql.py:161-185``);
* flashback (``flashback=True``): insert→DELETE, delete→INSERT,
  update→UPDATE SET <before> WHERE <after> LIMIT 1 (``log2sql.py:137-160``);
* WHERE prefers the key image (primary/unique key columns) and falls
  back to the full row image (``log2sql.py:169-172``);
* a literal ``NULL`` value renders as ```col` IS NULL`` in predicates
  (``log2sql.py:127-132``).

Improvement over the reference: :func:`flashback_sql` emits statements in
**reverse position order** — the rollback-correct order the reference
documents as missing (``README.md:23-27``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bt(col: Column) -> Column:
    """Backtick-quote an identifier."""
    return F.concat(F.lit("`"), col, F.lit("`"))


def _qualified(df_or_none=None) -> Column:
    return F.concat(_bt(F.col("db")), F.lit("."), _bt(F.col("table")))


def _predicate(image: Column) -> Column:
    """Map image → ``\\`k\\`=v AND \\`k2\\` IS NULL …`` (NULL-aware,
    reference: log2sql.py:127-132)."""
    return F.array_join(
        F.transform(
            F.map_entries(image),
            lambda e: F.when(
                e["value"] == "NULL", F.concat(_bt(e["key"]), F.lit(" IS NULL"))
            ).otherwise(F.concat(_bt(e["key"]), F.lit("="), e["value"])),
        ),
        " AND ",
    )


def _assignments(image: Column) -> Column:
    """Map image → ``\\`k\\`=v, \\`k2\\`=v2 …`` (SET clause)."""
    return F.array_join(
        F.transform(
            F.map_entries(image),
            lambda e: F.concat(_bt(e["key"]), F.lit("="), e["value"]),
        ),
        ", ",
    )


def _key_image(image: Column) -> Column:
    """Subset of the image covering the key columns (reference's
    ``index_info``, log2sql.py:57-58); empty map when keyless."""
    return F.map_filter(image, lambda k, _: F.array_contains(F.col("key_columns"), k))


def _where(image: Column) -> Column:
    """Key-image predicate if a key is present in the image, else the
    full row image (log2sql.py:169-172)."""
    key = _key_image(image)
    return F.when(F.size(F.map_keys(key)) > 0, _predicate(key)).otherwise(_predicate(image))


def _insert(image: Column) -> Column:
    return F.concat(
        F.lit("INSERT INTO "),
        _qualified(),
        F.lit("("),
        F.array_join(F.transform(F.map_keys(image), _bt), ", "),
        F.lit(") VALUES ("),
        F.array_join(F.map_values(image), ", "),
        F.lit(");"),
    )


def _delete(image: Column) -> Column:
    return F.concat(
        F.lit("DELETE FROM "), _qualified(), F.lit(" WHERE "), _where(image), F.lit(" LIMIT 1;")
    )


def _update(set_image: Column, where_image: Column) -> Column:
    return F.concat(
        F.lit("UPDATE "),
        _qualified(),
        F.lit(" SET "),
        _assignments(set_image),
        F.lit(" WHERE "),
        _where(where_image),
        F.lit(" LIMIT 1;"),
    )


def with_sql_text(resolved: DataFrame, flashback: bool = False, no_pk: bool = False) -> DataFrame:
    """Add ``sql_text`` (the rendered statement) and ``pos_info`` (the
    reference's position comment line, log2sql.py:100-104) columns.

    ``no_pk=True`` renders INSERTs without the primary-key columns
    (auto-increment-friendly re-insert) — the reference *declares* this
    flag (`-K`, main.py:79-80) but never implements it; here it works.
    Mutually exclusive with flashback, as in the reference (main.py:28-29).

    Expects a catalog-resolved envelope (named images + ``key_columns``).
    """
    if flashback and no_pk:
        raise ValueError("only one of flashback or no_pk can be set (main.py:28-29)")
    before, after = F.col("before"), F.col("after")
    # no_pk strips key columns from the INSERT image ONLY — predicates
    # (DELETE/UPDATE WHERE) must keep the key image.
    insert_after = after
    if no_pk:
        insert_after = F.map_filter(
            after, lambda k, _: ~F.array_contains(F.col("key_columns"), k)
        )
    if flashback:
        sql = (
            F.when(F.col("op") == "insert", _delete(after))
            .when(F.col("op") == "delete", _insert(before))
            .when(F.col("op") == "update", _update(before, after))
        )
    else:
        sql = (
            F.when(F.col("op") == "insert", _insert(insert_after))
            .when(F.col("op") == "delete", _delete(before))
            .when(F.col("op") == "update", _update(after, before))
        )
    sql = F.when(F.col("op") == "ddl", F.col("statement")).otherwise(sql)
    pos_info = F.concat(
        F.lit("# start-pos: "),
        F.col("start_pos").cast("string"),
        F.lit("; stop-pos: "),
        F.col("stop_pos").cast("string"),
        F.lit("; datetime: "),
        F.date_format("event_ts", "yyyy-MM-dd HH:mm:ss"),
    )
    return resolved.withColumn("sql_text", sql).withColumn("pos_info", pos_info)


def replay_sql(resolved: DataFrame) -> DataFrame:
    """Forward replay, in original binlog order (file, position).

    The rendered relation is persisted before the global sort: a range
    exchange computes its partition bounds by a SAMPLING pass over its
    child, and this child (scan → Arrow parse → broadcast resolve →
    codegen) contains no materialized exchange below the sort — so
    without the cache the whole Python parse executes twice per run
    (once for bounds, once for the shuffle). Caching makes the sample
    and the sort read the same one-parse result (guide §5: reuse whose
    recompute cost — a full re-parse — exceeds the memory it holds);
    spills to disk at scale, freed by the session's clearCache."""
    from pyspark.storagelevel import StorageLevel

    rendered = with_sql_text(resolved, flashback=False).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    return rendered.orderBy("file", "start_pos", "event_seq")


def flashback_sql(resolved: DataFrame, ordered: bool = True) -> DataFrame:
    """Rollback script: inverted ops in **reverse** order — fixes the
    reference's known gap (README.md:23-27, forward-ordered flashback).
    Persisted before the sort for the same range-sampling reason as
    :func:`replay_sql`; downstream multi-consumer operators (the
    flashback apply-rank aggregate + join) also re-read the cache
    instead of re-parsing.

    ``ordered=False`` skips the global sort: callers that derive the
    apply order from the VALUES (the distributed apply-rank queries)
    don't consume row order, so sorting before them is a dead range
    exchange + its sampling pass — they encode the same reverse order
    in the rank column instead."""
    from pyspark.storagelevel import StorageLevel

    rendered = with_sql_text(resolved, flashback=True).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if not ordered:
        return rendered
    return rendered.orderBy(
        F.desc("file"), F.desc("start_pos"), F.desc("event_seq")
    )
