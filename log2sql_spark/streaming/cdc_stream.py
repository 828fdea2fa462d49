"""Online CDC: continuous binlog-dump ingestion → replay/flashback SQL.

Restores the *online* mode the offline reference deliberately dropped
(``--stop-never`` commented out at ``main.py:26-27``): new dump files
appearing in a directory are picked up per micro-batch, parsed with the
SAME batch transform chain (``read_binlog`` → ``resolve_columns``
→ codegen), and appended to a sink. Batch/streaming share one
implementation — the core promise of Structured Streaming.

The streaming text source does file discovery + checkpointing only;
each micro-batch's files are re-read wholetext by the batch parser
(``read_binlog_batch_files``), so per-file line order never depends on
the streaming frame's partitioning. ``maxFilesPerTrigger`` is the rate
limit the reference parsed but never honored (``--back-interval``,
``main.py:83-84``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from log2sql_spark.operators.cdc_codegen import with_sql_text
from log2sql_spark.sources.binlog import read_binlog_batch_files
from log2sql_spark.sources.catalog import resolve_columns



def _trigger_kwargs(trigger_interval: float | None) -> dict:
    """availableNow (drain-and-stop, the testable default) vs a
    processing-time trigger. ``trigger_interval`` seconds > 0 maps the
    reference's ``--back-interval`` throttle (main.py:82-83 — sleep
    between rollback chunks, declared there but never honored) onto the
    engine's honest equivalent: the minimum pause between micro-batches
    on the --stop-never path."""
    if trigger_interval is None:
        return {"availableNow": True}
    return {"processingTime": f"{trigger_interval} seconds"}

def read_binlog_line_stream(spark: SparkSession, in_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-discovery stream: one row per FILE, content never read.

    The stream exists for discovery + checkpoint bookkeeping only
    (foreachBatch re-reads the batch's files wholetext, where line
    order is trivially per-file). The earlier text-format source
    delivered every LINE of every file into the micro-batch just so
    process() could distinct() the file names back out of it — a full
    read + a per-batch aggregation over row data that discovery never
    needed (guide §6). binaryFile prunes `content` when unselected, so
    the micro-batch is one row per file."""
    reader = spark.readStream.format("binaryFile").schema(
        "path string, modificationTime timestamp, length bigint, content binary"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(in_dir).select(F.col("path").alias("file"))


def stream_binlog_to_sql(
    spark: SparkSession,
    in_dir: str,
    catalog: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    flashback: bool = False,
    max_files_per_trigger: int | None = None,
    evolve_schema: bool = False,
    trigger_interval: float | None = None,
) -> StreamingQuery:
    """writeStream(foreachBatch): per micro-batch, run the batch CDC
    chain and append the rendered SQL to parquet at ``out_dir``.

    foreachBatch (rather than a direct streaming sink) because the parse
    needs complete files in line order — a batch-shaped operation, served
    by re-reading the micro-batch's files wholetext.

    ``evolve_schema=True`` applies in-stream ``ALTER TABLE ADD COLUMN``
    DDL to column resolution (sources/catalog_evolution.py), persisting
    the accumulated deltas next to the checkpoint so later micro-batches
    (and restarts) see schema changes from earlier ones.
    """
    import os

    deltas_dir = os.path.join(checkpoint_dir, "_schema_deltas")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        envelope = read_binlog_batch_files(spark, batch_df)
        if evolve_schema:
            from log2sql_spark.sources.catalog_evolution import (
                ddl_catalog_deltas,
                resolve_columns_versioned,
                versioned_catalog,
            )

            new_deltas = ddl_catalog_deltas(envelope)
            if os.path.exists(deltas_dir):
                all_deltas = spark.read.parquet(deltas_dir).unionByName(new_deltas)
            else:
                all_deltas = new_deltas
            all_deltas = all_deltas.distinct().localCheckpoint()
            all_deltas.write.mode("overwrite").parquet(deltas_dir + ".tmp")
            import shutil

            if os.path.exists(deltas_dir):
                shutil.rmtree(deltas_dir)
            os.rename(deltas_dir + ".tmp", deltas_dir)
            resolved = resolve_columns_versioned(
                envelope, versioned_catalog(catalog, all_deltas)
            )
        else:
            resolved = resolve_columns(envelope, catalog)
        rendered = with_sql_text(resolved, flashback=flashback)
        (
            rendered.select(
                "file", "event_seq", "op", "db", "table", "start_pos",
                "stop_pos", "event_ts", "pos_info", "sql_text",
            )
            # Batch-keyed overwrite of the batch's OWN partition
            # directory: a micro-batch retried from the checkpoint after
            # a partial write replaces only its own rows — the
            # idempotent-sink contract foreachBatch leaves to the
            # caller. Writing the partition path directly produces the
            # exact layout partitionBy("batch_id") + dynamic overwrite
            # did (batch_id read back via partition-dir inference) while
            # skipping the Hive dynamic-overwrite staging commit, which
            # cost ~1.4 s on a cold first batch for a single-partition
            # write (measured A/B; guide §6 commit overhead).
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"batch_id={batch_id}"))
        )

    lines = read_binlog_line_stream(spark, in_dir, max_files_per_trigger)
    return (
        lines.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**_trigger_kwargs(trigger_interval))
        .start()
    )


def apply_changes_to_state(
    spark: SparkSession,
    in_dir: str,
    catalog: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    key_col: str = "id",
) -> StreamingQuery:
    """Idempotent MERGE-style apply: maintain latest row state per key.

    Without a transactional table format in this container, the merge is
    :func:`log2sql_spark.operators.merge.merge_into` over the parquet
    store — the same plan a Delta ``MERGE INTO`` would execute. On a
    real deployment the body of ``process`` becomes ``DeltaTable.merge``;
    partitioning by the key keeps the rewrite local.

    Newest-version ordering must span file rotations: start_pos restarts
    per binlog file, so changes rank by (file, start_pos, event_seq) —
    binlog file names are sequence-numbered, so lexicographic file order
    IS chronological order; event_seq breaks start_pos ties (several row
    images share one event's position). The prior store always ranks
    below any change (merge_into's priority column).
    """
    import os

    from log2sql_spark.operators.merge import merge_into

    def process(batch_df: DataFrame, batch_id: int) -> None:
        envelope = read_binlog_batch_files(spark, batch_df)
        resolved = resolve_columns(envelope, catalog)
        changes = resolved.select(
            F.element_at(F.coalesce("after", "before"), key_col).alias("key"),
            F.col("op"),
            F.col("after"),
            F.col("file"),
            F.col("start_pos"),
            F.col("event_seq"),
        )
        if os.path.exists(state_dir):
            store = spark.read.parquet(state_dir).select("key", "after")
        else:
            store = spark.createDataFrame([], "key string, after map<string,string>")
        latest = merge_into(
            store, changes, key_cols="key", version_cols=["file", "start_pos", "event_seq"]
        )
        latest.write.mode("overwrite").parquet(state_dir + ".tmp")
        # atomic-ish swap for the local filesystem
        import shutil

        if os.path.exists(state_dir):
            shutil.rmtree(state_dir)
        os.rename(state_dir + ".tmp", state_dir)

    lines = read_binlog_line_stream(spark, in_dir)
    return (
        lines.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def apply_changes_to_snapshot_store(
    spark: SparkSession,
    in_dir: str,
    catalog: DataFrame | None,
    store_path: str,
    checkpoint_dir: str,
    key_col: str | None = "id",
    clustered: bool = True,
    auto_compact_files: int | None = 64,
    transport: str = "binlog",
    max_files_per_trigger: int | None = None,
    trigger_interval: float | None = None,
    merge_max_retries: int = 2,
    quarantine_dir: str | None = None,
) -> StreamingQuery:
    """The production apply path end-to-end: ``foreachBatch → MERGE INTO``
    a transactional snapshot store (SURVEY.md §1.1's named target, with
    :class:`~log2sql_spark.store.SnapshotStore` standing in for
    Delta/Iceberg).

    ``clustered`` (default) keeps the store range-clustered on the key
    with per-file stats, so each micro-batch's merge reads and rewrites
    only the files its keys overlap — per-batch apply cost tracks the
    batch, not the accumulated table.

    ``key_col=None`` derives each row's key from the CATALOG instead of
    one fixed column: the store key becomes ``db.table:<key values>``
    (the table's declared key_columns read from the row image), so one
    store holds the latest state of EVERY table in the dump — the
    multi-table apply the single-column form cannot do.

    Vs :func:`apply_changes_to_state`'s parquet swap, every micro-batch
    commits one new snapshot through an atomic manifest publish: a crash
    mid-batch leaves the previous version intact and fully readable (no
    rmtree window), re-running the batch after restart is idempotent at
    the row level (merge_into's version ordering), and each batch's
    pre-image stays time-travelable until ``vacuum`` — the audit trail a
    CDC consumer actually wants. Version ordering spans file rotations
    via (file, start_pos, event_seq), same as the parquet-state twin.

    ``auto_compact_files``: every micro-batch merge adds small files
    (hash layout: per touched bucket); once the snapshot's ACTUAL part
    count exceeds the threshold, the batch finishes with a compaction
    commit — Delta's optimizeWrite/auto-compact behavior, keeping scan
    cost flat under continuous ingest instead of degrading with every
    batch. Set None to disable.

    ``quarantine_dir``: dead-letter sink. Non-DDL events whose
    (db, table) has no catalog entry are diverted there per micro-batch
    (batch-keyed parquet with a ``reason`` column) instead of flowing
    into the merge with a NULL-derived key — Debezium's dead-letter
    topic / DLT expectations analog. None (default) keeps the historic
    never-drop behavior of resolve_columns.

    ``transport="debezium"`` swaps the source for a Kafka-shaped topic
    (`sources/debezium.py`); the merge, layout, auto-compaction and
    version ordering run unchanged — the Debezium envelope's (file,
    start_pos, event_seq) are (partition, source.pos, offset), which
    order every key's history because Debezium keys records by primary
    key. With ``key_col=None`` the multi-table key derives from the
    in-band db/table names (no catalog needed; pass ``catalog=None``).
    """
    from log2sql_spark.store import SnapshotStore

    store = SnapshotStore(store_path)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if transport == "debezium":
            from log2sql_spark.sources.debezium import debezium_to_envelope

            resolved = debezium_to_envelope(batch_df, keep_key=(key_col is None))
        else:
            envelope = read_binlog_batch_files(spark, batch_df)
            if quarantine_dir is not None:
                # dead-letter split BEFORE resolution: rogue-table rows
                # would otherwise derive a NULL store key and merge into
                # one phantom record. Batch-keyed overwrite = replaying
                # a crashed micro-batch rewrites, never double-appends
                # (same idempotence protocol as the sink itself).
                from log2sql_spark.sources.catalog import split_catalog_misses

                envelope, rejected = split_catalog_misses(envelope, catalog)
                rejected.write.mode("overwrite").parquet(
                    os.path.join(quarantine_dir, f"batch_id={batch_id}")
                )
            resolved = resolve_columns(envelope, catalog)
        img = F.coalesce("after", "before")
        if key_col is None:
            if transport == "debezium":
                # Debezium keys records by primary key: the Kafka key IS
                # the row key — no catalog needed for multi-table apply
                key = F.concat_ws(
                    ":", F.concat_ws(".", "db", "table"), F.col("_kafka_key")
                )
            else:
                key_vals = F.transform(
                    "key_columns",
                    lambda c: F.coalesce(F.element_at(img, c), F.lit("")),
                )
                key = F.concat_ws(
                    ":",
                    F.concat_ws(".", "db", "table"),
                    F.concat_ws("|", key_vals),
                )
        else:
            key = F.element_at(img, key_col)
        changes = resolved.select(
            key.alias("key"),
            F.col("op"),
            F.col("after"),
            F.col("file"),
            F.col("start_pos"),
            F.col("event_seq"),
        )
        if store.head_version() is None:
            # hash layout: binlog keys are arbitrary strings, so fixed
            # xxhash64 buckets (not range stats) is the layout that
            # prunes — each micro-batch merge rewrites only the buckets
            # its keys hash into
            store.commit(
                spark.createDataFrame([], "key string, after map<string,string>"),
                mode="overwrite",
                cluster_by="key" if clustered else None,
                layout="hash" if clustered else "range",
            )
        # merge_max_retries: the streaming sink survives a concurrent
        # writer (an OPTIMIZE/compaction job, a second pipeline, an ad
        # hoc backfill) via the store's optimistic concurrency -- a
        # disjoint winner costs a manifest-only rebase, an overlapping
        # one a bounded recompute; without it one maintenance commit
        # mid-batch would fail the whole stream.
        store.merge(
            spark,
            changes,
            key_cols="key",
            version_cols=["file", "start_pos", "event_seq"],
            max_retries=merge_max_retries,
        )
        if auto_compact_files and store.file_count() > auto_compact_files:
            store.compact(spark)

    # observe(): per-micro-batch input counts surface in the query's
    # streaming progress (observedMetrics.cdc_audit) — the
    # applied-vs-received audit an operator reconciles against the
    # source, collected on the SAME scan, never by a second read.
    # (Counts FILES since the discovery stream became one-row-per-file;
    # Debezium transport still counts records.)
    if transport == "debezium":
        from log2sql_spark.sources.debezium import read_debezium_topic_stream

        source = read_debezium_topic_stream(spark, in_dir)
    else:
        source = read_binlog_line_stream(spark, in_dir, max_files_per_trigger)
    lines = source.observe("cdc_audit", F.count(F.lit(1)).alias("n_lines"))
    return (
        lines.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**_trigger_kwargs(trigger_interval))
        .start()
    )


def maintain_mv_stream(
    spark: SparkSession,
    in_dir: str,
    catalog: DataFrame | None,
    store_path: str,
    checkpoint_dir: str,
    group_col: str,
    sum_col: str,
    database: str | None = None,
    table: str | None = None,
    transport: str = "binlog",
) -> StreamingQuery:
    """Continuous aggregate: maintain a (group, count, sum) materialized
    view over the CDC stream by folding each micro-batch's SIGNED deltas
    (operators/ivm.py) into the MV — never re-aggregating the base.

    Exactly-once: foreachBatch is at-least-once, and a delta apply is
    NOT naturally idempotent (re-applying double-counts), so the applied
    batch_id rides in the snapshot manifest's metadata and an already-
    applied batch is skipped on re-delivery — the transactional-sink
    pattern, with the store's atomic commit as the transaction.

    ``transport`` picks the wire format: ``"binlog"`` (mysqlbinlog text
    dumps, the reference's shape) or ``"debezium"`` (Kafka-shaped JSON
    change events, `sources/debezium.py` — the shape real deployments
    see). Everything after the envelope — delta fold, exactly-once
    batch-id contract, store commit — is shared; the Debezium envelope
    is born name-keyed so it needs no catalog (pass ``catalog=None``)."""
    from log2sql_spark.operators.ivm import apply_delta, delta_aggregate
    from log2sql_spark.store import SnapshotStore

    store = SnapshotStore(store_path)
    sum_name = f"sum_{sum_col}"

    def process(batch_df: DataFrame, batch_id: int) -> None:
        head = store.head_version()
        if head is not None:
            applied = store.snapshot(head).meta.get("batch_id", -1)
            if applied >= batch_id:
                return  # re-delivered batch: already folded in
        if transport == "debezium":
            from log2sql_spark.sources.debezium import debezium_to_envelope

            resolved = debezium_to_envelope(batch_df)
        else:
            envelope = read_binlog_batch_files(spark, batch_df)
            resolved = resolve_columns(envelope, catalog)
        # scope to the MV's table: a multi-table dump must not leak other
        # tables' rows (whose images lack these columns) into the deltas
        if database is not None:
            resolved = resolved.filter(F.col("db") == database)
        if table is not None:
            resolved = resolved.filter(F.col("table") == table)
        changes = resolved.select(
            "op",
            F.element_at("after", group_col).alias(group_col),
            F.element_at("after", sum_col).cast("long").alias(sum_col),
            F.element_at("before", group_col).alias(f"before_{group_col}"),
            F.element_at("before", sum_col).cast("long").alias(f"before_{sum_col}"),
        )
        delta = delta_aggregate(changes, [group_col], {sum_name: sum_col})
        if head is None:
            mv = spark.createDataFrame(
                [], f"{group_col} string, n bigint, {sum_name} bigint"
            )
        else:
            mv = store.read(spark)
        store.commit(
            apply_delta(mv, delta, [group_col]),
            mode="overwrite",
            meta={"batch_id": batch_id},
        )

    if transport == "debezium":
        from log2sql_spark.sources.debezium import read_debezium_topic_stream

        lines = read_debezium_topic_stream(spark, in_dir)
    else:
        lines = read_binlog_line_stream(spark, in_dir)
    return (
        lines.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def maintain_minmax_mv_stream(
    spark: SparkSession,
    in_dir: str,
    catalog: DataFrame,
    replica_store_path: str,
    view_store_path: str,
    checkpoint_dir: str,
    key_col: str,
    group_col: str,
    val_col: str,
) -> StreamingQuery:
    """Continuous MIN/MAX materialized view over the CDC stream — the
    non-distributive streaming twin of :func:`maintain_mv_stream`: a
    deleted extremum cannot be subtracted out of the view, so the fold
    (``operators/ivm.py:minmax_apply``) recomputes ONLY dirty groups —
    and the post-change base it recomputes FROM is the replica store the
    apply path maintains anyway (merged first, in the same micro-batch).
    The composition is the production shape: one transactional replica
    (key-merged, batch-idempotent by version ordering) feeding any
    number of derived views, each folding batch deltas with bounded
    reads of the replica.

    Exactly-once: the replica merge is naturally idempotent under
    re-delivery (newest-wins version ordering); the view fold is NOT, so
    the applied batch_id rides in the view store's manifest metadata and
    a re-delivered batch skips the fold. A crash BETWEEN replica merge
    and view commit replays safely: the merge no-ops row-wise, and the
    fold's dirty-group recompute reads post-change state either way."""
    from log2sql_spark.operators.ivm import minmax_apply
    from log2sql_spark.store import SnapshotStore

    replica = SnapshotStore(replica_store_path)
    view_store = SnapshotStore(view_store_path)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        head = view_store.head_version()
        if head is not None:
            if view_store.snapshot(head).meta.get("batch_id", -1) >= batch_id:
                return  # re-delivered batch: view already folded
        envelope = read_binlog_batch_files(spark, batch_df)
        resolved = resolve_columns(envelope, catalog)
        img = F.coalesce("after", "before")
        changes = resolved.select(
            F.element_at(img, key_col).alias("key"),
            "op",
            "after",
            "file",
            "start_pos",
            "event_seq",
            F.element_at("after", group_col).alias(group_col),
            F.element_at("after", val_col).cast("long").alias(val_col),
            F.element_at("before", group_col).alias(f"before_{group_col}"),
            F.element_at("before", val_col).cast("long").alias(f"before_{val_col}"),
        )
        if replica.head_version() is None:
            replica.commit(
                spark.createDataFrame([], "key string, after map<string,string>"),
                mode="overwrite",
            )
        replica.merge(
            spark,
            changes.select("key", "op", "after", "file", "start_pos", "event_seq"),
            key_cols="key",
            version_cols=["file", "start_pos", "event_seq"],
        )
        base_new = replica.read(spark).select(
            F.element_at("after", group_col).alias(group_col),
            F.element_at("after", val_col).cast("long").alias(val_col),
        )
        if view_store.head_version() is None:
            mv = spark.createDataFrame(
                [], f"{group_col} string, n bigint, min_v bigint, max_v bigint"
            )
        else:
            mv = view_store.read(spark)
        folded = minmax_apply(
            mv,
            changes,
            base_new,
            [group_col],
            val_col,
        ).drop("recomputed")
        view_store.commit(folded, mode="overwrite", meta={"batch_id": batch_id})

    lines = read_binlog_line_stream(spark, in_dir)
    return (
        lines.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def apply_changes_to_catalog(
    spark: SparkSession,
    in_dir: str,
    catalog: DataFrame,
    root_dir: str,
    checkpoint_dir: str,
    tables: list[str],
    trigger_interval: float | None = None,
    merge_max_retries: int = 2,
) -> StreamingQuery:
    """Multi-table CDC apply with ATOMIC cross-table visibility: each
    micro-batch routes a mixed dump's changes into one SnapshotStore
    per ``db.table`` (under ``root_dir/<db>.<table>``) and then
    publishes ONE StoreCatalog version pinning all the new store
    versions. A reader resolving through the catalog sees every table
    at the same micro-batch boundary — the one-new/one-old skew the
    per-table apply paths (and per-table Delta/Iceberg sinks) expose
    between their independent commits cannot happen here.

    Exactly-once composes from both layers: the store merges are
    row-idempotent under re-delivery (version ordering on (file,
    start_pos, event_seq), same as apply_changes_to_snapshot_store),
    and the applied batch_id rides in the CATALOG manifest meta — a
    replayed micro-batch (crash before checkpoint commit) re-runs the
    idempotent merges but publishes no second catalog version, so the
    cross-table history stays one version per micro-batch. A crash
    BETWEEN the store merges and the catalog publish leaves moved
    store heads that the catalog does not serve; the replay re-merges
    (no-op row-wise) and publishes the vector that crash dropped.

    Tables with no changes in a batch carry their previous pin
    unchanged into the new catalog version (the manifest copies them),
    so resolve() is always the full consistent vector. Changes for
    ``db.table`` values NOT in ``tables`` are never silently dropped:
    they land in ``root_dir/_dead_letter/batch=<id>`` and the names
    ride in the manifest's ``meta.unrouted``. At 100 TB: per
    batch, each table's merge cost tracks that table's change
    footprint (hash-bucket pruning), and the catalog adds O(tables)
    JSON metadata — the atomicity is free at data scale.
    """
    from log2sql_spark.store import SnapshotStore, StoreCatalog

    cat = StoreCatalog(root_dir)
    stores: dict[str, SnapshotStore] = {}
    for t in tables:
        store = SnapshotStore(os.path.join(root_dir, t))
        if store.head_version() is None:
            store.commit(
                spark.createDataFrame([], "key string, after map<string,string>"),
                mode="overwrite",
                cluster_by="key",
                layout="hash",
            )
        stores[t] = store
        if t not in cat.snapshot()["tables"]:
            cat.register(t, store.path)

    def applied_batch_id() -> int:
        # Scan back to the most recent manifest CARRYING a batch_id —
        # head.meta alone is not the watermark: an interleaved catalog
        # publish without one (register() of a new table, the CLI's
        # `store catalog --register`) would reset it to -1 and let a
        # replayed micro-batch republish a duplicate catalog version.
        for v in reversed(cat.versions()):
            b = cat.snapshot(v).get("meta", {}).get("batch_id")
            if b is not None:
                return b
        return -1

    def process(batch_df: DataFrame, batch_id: int) -> None:
        head = cat.snapshot()
        if applied_batch_id() >= batch_id:
            return  # replayed micro-batch: vector already published
        envelope = read_binlog_batch_files(spark, batch_df)
        resolved = resolve_columns(envelope, catalog)
        img = F.coalesce("after", "before")
        key_vals = F.transform(
            "key_columns",
            lambda c: F.coalesce(F.element_at(img, c), F.lit("")),
        )
        changes_all = resolved.select(
            F.concat_ws(".", "db", "table").alias("_tbl"),
            F.concat_ws("|", key_vals).alias("key"),
            F.col("op"),
            F.col("after"),
            F.col("file"),
            F.col("start_pos"),
            F.col("event_seq"),
        )
        changes_all = changes_all.persist()
        try:
            # ONE pass decides which tables the batch touches (a
            # bounded #tables-row collect), instead of a probe job per
            # registered table per batch
            touched = {
                r._tbl for r in changes_all.select("_tbl").distinct().collect()
            }
            # db.table values in the dump but not routed to any store:
            # dead-letter the rows (same discipline as
            # split_catalog_misses) and record the names in the catalog
            # manifest meta — silently dropping changes for an
            # unregistered table is data loss wearing a filter's
            # clothes.
            unrouted = sorted(touched - set(stores))
            if unrouted:
                changes_all.filter(F.col("_tbl").isin(unrouted)).write.mode(
                    "overwrite"
                ).parquet(
                    os.path.join(root_dir, "_dead_letter", f"batch={batch_id}")
                )
            pins: dict[str, tuple[str, int]] = {}
            for t, store in stores.items():
                if t not in touched:
                    continue  # untouched table: previous pin carries
                v = store.merge(
                    spark,
                    changes_all.filter(F.col("_tbl") == t).drop("_tbl"),
                    key_cols="key",
                    version_cols=["file", "start_pos", "event_seq"],
                    max_retries=merge_max_retries,
                )
                pins[t] = (store.path, v)
        finally:
            changes_all.unpersist()
        # publish even when pins is empty: the batch_id watermark must
        # advance or an empty replayed batch would re-publish later ones
        meta = {"batch_id": batch_id}
        if unrouted:
            meta["unrouted"] = unrouted
        cat._commit_pins(pins, base=head, meta=meta)

    lines = read_binlog_line_stream(spark, in_dir)
    return (
        lines.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**_trigger_kwargs(trigger_interval))
        .start()
    )
