"""CLI: drop-in workflow replacement for the reference's ``main.py``.

Same argument surface (``main.py:42-85``) including the live-MySQL
connection flags (``-h/-u/-p/-P``, ``main.py:44-52``, with the bare
``-p`` getpass prompt, ``main.py:35-38``) — with ``--catalog`` absent
the catalog loads ONCE from the server's ``information_schema`` over
JDBC instead of the reference's per-event N+1 queries — plus the flags
the reference declared but never honored:

* ``--no-primary-key`` actually strips PKs from INSERTs;
* ``--stop-never`` runs the online Structured-Streaming mode the
  offline fork dropped (``main.py:26-27``);
* DDL output is reachable via ``--include-ddl`` (reference's
  ``--only-dml`` is dead-defaulted, ``main.py:73-74``).

Usage::

    python -m log2sql_spark --start-file dump.txt --catalog catalog.json
    python -m log2sql_spark --start-file dump.txt --catalog catalog.json \
        -B --database shop -t orders lineitem --start-position 4
    python -m log2sql_spark --watch-dir /dumps --catalog catalog.json \
        --stop-never --out /cdc/out --checkpoint /cdc/ckpt
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    # add_help=False so -h can mean --host, exactly like the reference
    # (main.py:44, which reserves -h for the MySQL host and moves help
    # to --help).
    p = argparse.ArgumentParser(
        prog="log2sql_spark",
        description="Parse MySQL binlog dumps to replay/flashback SQL on Spark",
        add_help=False,
    )
    p.add_argument("--help", action="help", help="show this help message and exit")

    # Live-MySQL connection flags (reference main.py:44-52): used when
    # --catalog is absent — the catalog then loads ONCE from the
    # server's information_schema via JDBC (sources/catalog.py
    # catalog_from_jdbc), replacing the reference's per-event N+1
    # lookups (log2sql.py:29-46).
    conn = p.add_argument_group("connect setting")
    conn.add_argument("-h", "--host", dest="host", default="127.0.0.1",
                      help="Host the MySQL database server located")
    conn.add_argument("-u", "--user", dest="user", default="root",
                      help="MySQL Username to log in as")
    conn.add_argument("-p", "--password", dest="password", nargs="*", default="",
                      help="MySQL Password to use (bare -p prompts, like the "
                           "reference's getpass fallback, main.py:35-38)")
    conn.add_argument("-P", "--port", dest="port", type=int, default=3306,
                      help="MySQL port to use")

    src = p.add_argument_group("source")
    src.add_argument("--start-file", dest="start_file", help="binlog dump file/glob to parse")
    src.add_argument("--raw", action="store_true", default=False,
                     help="start-file is a RAW binlog (mysql-bin.NNNNNN): decode via "
                          "the mysqlbinlog binary like the reference (main.py:88-105)")
    src.add_argument("--mysqlbinlog-bin", dest="mysqlbinlog_bin", default="mysqlbinlog",
                     help="mysqlbinlog binary name/path (executors must resolve it too)")
    src.add_argument("--watch-dir", dest="watch_dir", help="directory to stream dumps from")
    src.add_argument("--catalog", default=None,
                     help="catalog JSON ({'db.table': {columns, key_columns}}); "
                          "omit to load the catalog live from the server's "
                          "information_schema via -h/-u/-p/-P")

    interval = p.add_argument_group("interval filter")
    interval.add_argument("--start-position", type=int, default=None)
    interval.add_argument("--stop-position", type=int, default=None)
    interval.add_argument("--start-datetime", default=None, help="YYYY-MM-DD HH:MM:SS")
    interval.add_argument("--stop-datetime", default=None, help="YYYY-MM-DD HH:MM:SS")

    schema = p.add_argument_group("schema filter")
    schema.add_argument("-d", "--database", default=None)
    schema.add_argument("-t", "--tables", nargs="*", default=None)

    event = p.add_argument_group("type filter")
    event.add_argument("--sql-type", dest="sql_type", nargs="*", default=None,
                       help="insert/update/delete subset")
    event.add_argument("--include-ddl", action="store_true", default=False)

    p.add_argument("-K", "--no-primary-key", dest="no_pk", action="store_true", default=False)
    p.add_argument("-B", "--flashback", action="store_true", default=False)
    p.add_argument("--stop-never", dest="stop_never", action="store_true", default=False,
                   help="online mode: keep processing new files FOREVER "
                        "(processing-time trigger, paced by --back-interval, "
                        "default 1.0s like the reference's back_interval; pass "
                        "--drain to process existing dumps then exit; "
                        "requires --watch-dir)")
    p.add_argument("--drain", action="store_true", default=False,
                   help="with --stop-never: drain-and-stop (availableNow "
                        "trigger) — process everything currently in "
                        "--watch-dir, then exit instead of running forever")
    p.add_argument("--out", default=None, help="output parquet dir (default: print to stdout)")
    p.add_argument("--apply-store", dest="apply_store", default=None,
                   help="apply changes into a snapshot store (MERGE semantics, "
                        "atomic versioned commits, time travel) instead of "
                        "rendering SQL")
    p.add_argument("--key-column", dest="key_column", default="id",
                   help="row-image key column for --apply-store (default: id)")
    p.add_argument("--quarantine-dir", dest="quarantine_dir", default=None,
                   help="dead-letter sink for --apply-store: events whose "
                        "(db, table) has no catalog entry land here with a "
                        "reason column instead of merging under a NULL key")
    p.add_argument("--checkpoint", default=None, help="streaming checkpoint dir")
    p.add_argument("--back-interval", dest="back_interval", type=float, default=None,
                   help="seconds between micro-batches on --stop-never "
                        "(reference main.py:82-83's declared-but-unused rollback "
                        "throttle, honored here as the processing-time trigger; "
                        "default 1.0 when --stop-never is on without --drain)")
    p.add_argument("--max-files-per-trigger", dest="max_files_per_trigger",
                   type=int, default=None,
                   help="cap dump files per micro-batch on --stop-never")
    p.add_argument("--cpus", default=None, help="local parallelism (default: SPARK_GRAFT_CPUS)")
    return p


def validate(args: argparse.Namespace) -> None:
    if args.flashback and args.no_pk:
        raise ValueError("Only one of flashback or no_pk can be True")  # main.py:28-29
    if args.stop_never and not (
        args.watch_dir and args.checkpoint and (args.out or args.apply_store)
    ):
        raise ValueError(
            "--stop-never requires --watch-dir, --checkpoint and --out/--apply-store"
        )
    if args.apply_store and args.flashback:
        raise ValueError("--apply-store applies forward changes; drop -B")
    if args.drain and not args.stop_never:
        raise ValueError("--drain only modifies --stop-never")
    if args.stop_never and args.raw and not args.start_file:
        raise ValueError(
            "--stop-never --raw (live remote tail) needs --start-file: the "
            "binlog file name to start tailing from (e.g. mysql-bin.000001)"
        )
    if not args.stop_never and not args.start_file:
        raise ValueError("Lack of parameter: start_file")  # main.py:24-25
    from datetime import datetime

    for v in (args.start_datetime, args.stop_datetime):
        if v is not None:
            try:
                datetime.strptime(v, "%Y-%m-%d %H:%M:%S")
            except ValueError as exc:
                raise ValueError("Incorrect datetime argument") from exc  # main.py:30-34


def resolve_trigger_interval(args: argparse.Namespace) -> float | None:
    """--stop-never means NEVER stop (the reference contract:
    continuously parse, main.py:26-27) — so without --drain the stream
    runs on a processing-time trigger paced by --back-interval,
    defaulting to 1.0 s (the reference's back_interval default,
    main.py:82-83). --drain opts into the availableNow drain-and-stop
    trigger (returned as None)."""
    if args.drain:
        return None
    if args.back_interval is not None:
        return args.back_interval
    return 1.0


def resolve_password(args: argparse.Namespace, live: bool = False) -> str:
    """Reference getpass fallback (main.py:35-38): the reference prompts
    whenever the password is EMPTY — both bare ``-p`` and absent ``-p``
    (``if not args.password: getpass.getpass()``). Matched here on the
    live-catalog path (``live=True``) when stdin is a tty; in a
    non-interactive run an absent ``-p`` sends the empty password
    instead of blocking on a prompt that nobody will answer (the one
    deliberate divergence, so CI/pipeline invocations stay hangproof).
    ``-p secret`` takes the first token."""
    if args.password == "" or args.password is None or (
        isinstance(args.password, list) and not args.password
    ):
        bare_p = isinstance(args.password, list)
        if bare_p or live:
            import getpass
            import sys

            if bare_p or sys.stdin.isatty():
                return getpass.getpass()
        return ""
    if isinstance(args.password, list):
        return args.password[0]
    return str(args.password)


def load_catalog(args: argparse.Namespace, spark):
    """Route --catalog JSON vs live information_schema over JDBC.

    The JDBC path is driver-gated the same way streaming/apply_sink.py
    gates pymysql: with no MySQL JDBC driver on the classpath the
    attempt raises a clear actionable error instead of a JVM stack."""
    from log2sql_spark.sources.catalog import catalog_from_jdbc, catalog_from_json

    if args.catalog:
        return catalog_from_json(spark, args.catalog)
    url = f"jdbc:mysql://{args.host}:{args.port}"
    properties = {"user": args.user, "password": resolve_password(args, live=True)}
    try:
        return catalog_from_jdbc(spark, url, properties)
    except Exception as exc:  # noqa: BLE001 — env gate, driver jar absent
        # Narrow match: only the exact missing-driver signatures get the
        # actionable rewrite. Auth/TLS/connect failures that merely
        # *mention* a driver class propagate untouched so the real cause
        # stays visible.
        msg = str(exc)
        if (
            "No suitable driver" in msg
            or "ClassNotFoundException: com.mysql" in msg
            or "Failed to find data source: jdbc" in msg
        ):
            raise SystemExit(
                f"live catalog load from {args.host}:{args.port} needs the MySQL "
                "JDBC driver on Spark's classpath (spark.jars); pass --catalog "
                f"catalog.json to run without a live server [cause: {msg.splitlines()[0][:200]}]"
            ) from exc
        raise


def _parse_where_bounds(store, raw: str):
    """Parse ``store compact --where lo,hi`` into bounds typed to MATCH
    the store's key stats, so compact_where's manifest band test never
    mixes str/int comparisons (an opaque TypeError deep in in_band).
    Bounds are whitespace-stripped ("0, 199" is accepted); when the
    head manifest's key stats are numeric the bounds must parse as
    numbers (clear error otherwise), and when they are strings the
    bounds stay strings."""
    if "," not in raw:
        raise ValueError(f"--where needs 'lo,hi', got {raw!r}")
    lo_s, hi_s = (part.strip() for part in raw.split(",", 1))
    stat = None
    head = store.head_version()
    if head is not None:
        for e in store.snapshot(head).entries:
            if e.get("min") is not None:
                stat = e["min"]
                break
    if isinstance(stat, (int, float)) and not isinstance(stat, bool):
        caster = type(stat)
        try:
            return caster(lo_s), caster(hi_s)
        except ValueError:
            raise ValueError(
                f"--where bounds {lo_s!r},{hi_s!r} do not parse as "
                f"{caster.__name__}, but the store's key stats are "
                f"{caster.__name__} (e.g. min={stat!r})"
            ) from None
    return lo_s, hi_s


def store_main(argv: list[str]) -> int:
    """Table-maintenance subcommands over a snapshot store — the
    DESCRIBE HISTORY/DETAIL / VACUUM / OPTIMIZE [ZORDER BY] /
    replaceWhere surface a lakehouse CLI exposes. ``history``,
    ``detail``, ``vacuum``, ``restore``, ``fsck``, ``rename-column``,
    and ``clone`` are manifest-only (no Spark startup); ``compact``,
    ``zorder``, and ``replace-where`` run a rewrite commit;
    ``delete-mor`` commits a merge-on-read delete (tombstone only, no
    rewrite) and ``materialize-deletes`` folds pending tombstones.
    ``tag`` / ``branch`` manage named refs (create/list/drop;
    manifest-only, no Spark startup) and ``merge-branch`` lands a
    branch on main (fast-forward or append-rebase, zero-copy)."""
    import json as _json

    p = argparse.ArgumentParser(prog="log2sql_spark store")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in (
        "history", "vacuum", "compact", "zorder", "restore", "fsck",
        "rename-column", "drop-column", "clone", "detail",
        "set-mask", "drop-mask", "set-row-filter", "drop-row-filter",
        "add-constraint", "drop-constraint", "replace-where",
        "delete-mor", "materialize-deletes", "analyze",
        "cdf", "flashback",
        "tag", "branch", "merge-branch", "files", "catalog",
    ):
        sp = sub.add_parser(name)
        sp.add_argument("path", help="snapshot store directory")
        if name == "vacuum":
            sp.add_argument("--keep-last", type=int, default=1)
            sp.add_argument("--include-orphans", action="store_true", default=False)
            sp.add_argument("--dry-run", action="store_true", default=False,
                            help="report what would be deleted; touch nothing")
            sp.add_argument("--older-than-hours", type=float, default=None,
                            help="time-based retention: only drop versions "
                                 "published more than this many hours ago "
                                 "(composes with --keep-last)")
        if name == "compact":
            sp.add_argument("--target-files", type=int, default=8)
            sp.add_argument("--min-file-mb", type=float, default=None,
                            help="partial OPTIMIZE: rewrite only files "
                                 "smaller than this; others carry by reference")
            sp.add_argument("--where", default=None, metavar="LO,HI",
                            help="OPTIMIZE WHERE: rewrite only files whose "
                                 "cluster-key range overlaps [lo, hi]; the "
                                 "rest carry by reference")
        if name == "restore":
            sp.add_argument("--to-version", type=int, required=True)
        if name == "zorder":
            sp.add_argument("--by", required=True,
                            help="comma-separated cluster columns (>=2)")
            sp.add_argument("--target-files", type=int, default=8)
            sp.add_argument("--curve", choices=("zorder", "hilbert"),
                            default="zorder",
                            help="space-filling curve: Morton (default) or "
                                 "Hilbert (tighter per-dimension file spans "
                                 "for box predicates; 2-4 columns)")
        if name == "rename-column":
            sp.add_argument("--from", dest="rename_from", required=True)
            sp.add_argument("--to", dest="rename_to", required=True)
        if name == "drop-column":
            sp.add_argument("--column", required=True)
        if name == "clone":
            sp.add_argument("--dest", required=True,
                            help="target directory (must be a new/empty store)")
            sp.add_argument("--at-version", type=int, default=None)
        if name in ("set-mask", "drop-mask"):
            sp.add_argument("--column", required=True)
        if name == "set-mask":
            sp.add_argument("--expr", required=True)
        if name == "set-row-filter":
            sp.add_argument("--predicate", required=True)
        if name in ("add-constraint", "drop-constraint"):
            sp.add_argument("--name", dest="c_name", required=True)
        if name == "add-constraint":
            sp.add_argument("--predicate", required=True)
        if name == "detail":
            sp.add_argument("--at-version", type=int, default=None)
        if name == "files":
            sp.add_argument("--at-version", type=int, default=None,
                            help="list that snapshot's files (default: head)")
        if name == "analyze":
            sp.add_argument("--columns", required=True,
                            help="comma-separated columns to record per-file "
                                 "footer stats for (metadata-only commit)")
        if name == "delete-mor":
            sp.add_argument("--predicate", required=True)
            sp.add_argument("--key", default=None,
                            help="comma-separated key columns (default: "
                                 "the cluster key)")
        if name == "replace-where":
            sp.add_argument("--predicate", required=True)
            sp.add_argument("--source", required=True,
                            help="parquet path holding the replacement rows")
            sp.add_argument("--key-bounds", default=None,
                            help="lo,hi on the cluster key: prune the "
                                 "rewrite to overlapping files")
        if name == "cdf":
            sp.add_argument("--from-version", dest="from_version", type=int, required=True)
            sp.add_argument("--to-version", dest="to_version", type=int, required=True)
            sp.add_argument("--key", default=None,
                            help="comma-separated key columns (default: cluster key)")
            sp.add_argument("--out", default=None,
                            help="write the feed to this parquet dir instead of printing")
            sp.add_argument("--limit", type=int, default=100,
                            help="max rows to print without --out")
        if name == "flashback":
            sp.add_argument("--to-version", dest="to_version", type=int, required=True)
            sp.add_argument("--key", default=None,
                            help="comma-separated key columns (default: cluster key)")
        if name in ("tag", "branch"):
            g = sp.add_mutually_exclusive_group()
            g.add_argument("--create", default=None, metavar="NAME")
            g.add_argument("--drop", dest="drop_ref", default=None,
                           metavar="NAME")
            sp.add_argument("--at-version", type=int, default=None,
                            help="with --create: pin/fork this version "
                                 "(default: head)")
        if name == "catalog":
            cg = sp.add_mutually_exclusive_group()
            cg.add_argument("--register", nargs=2, default=None,
                            metavar=("NAME", "STORE_PATH"),
                            help="pin NAME at STORE_PATH's current head "
                                 "(one atomic catalog commit)")
            cg.add_argument("--expire-keep-last", type=int, default=None,
                            help="drop catalog versions beyond the newest N "
                                 "and release their store pins")
            cg.add_argument("--janitor", action="store_true", default=False,
                            help="reap orphan cat-* pin tags older than "
                                 "--older-than-hours that no live catalog "
                                 "version records (crash debris of a pin "
                                 "without a publish, or an expire that died "
                                 "before unpinning)")
            sp.add_argument("--older-than-hours", type=float, default=1.0,
                            help="janitor age gate (default 1h) so in-flight "
                                 "writers' pins are never reaped")
            sp.add_argument("--at-version", type=int, default=None,
                            help="resolve this catalog version (default: head)")
        if name == "merge-branch":
            sp.add_argument("--name", required=True)
            sp.add_argument("--drop", action="store_true", default=False,
                            help="remove the branch after a successful merge")
            sp.add_argument("--max-retries", type=int, default=0,
                            help="re-derive and retry on a lost publish race")
        if name in ("compact", "zorder", "add-constraint", "replace-where",
                    "delete-mor", "materialize-deletes", "cdf", "flashback",
                    "merge-branch"):
            sp.add_argument("--cpus", default=None)
    args = p.parse_args(argv)

    from log2sql_spark.store import SnapshotStore

    if args.cmd == "catalog":  # manifest-only, no Spark startup
        from log2sql_spark.store import StoreCatalog

        cat = StoreCatalog(args.path)
        if args.register is not None:
            name, spath = args.register
            print(f"v{cat.register(name, spath)}")
            return 0
        if args.expire_keep_last is not None:
            for v in cat.expire(keep_last=args.expire_keep_last):
                print(f"v{v}")
            return 0
        if args.janitor:
            for t in cat.janitor(older_than_secs=args.older_than_hours * 3600):
                print(t)
            return 0
        for tname, (tpath, tver) in cat.resolve(args.at_version).items():
            print(_json.dumps({"table": tname, "path": tpath, "version": tver}))
        return 0

    store = SnapshotStore(args.path)
    if args.cmd == "history":
        for h in store.history():
            print(_json.dumps(h))
        return 0
    if args.cmd == "vacuum":
        import time as _time

        cutoff = (
            None
            if args.older_than_hours is None
            else _time.time() - args.older_than_hours * 3600
        )
        for d in store.vacuum(
            args.keep_last,
            older_than=cutoff,
            include_orphans=args.include_orphans,
            dry_run=args.dry_run,
        ):
            print(d)
        return 0
    if args.cmd == "restore":
        print(f"v{store.restore(args.to_version)}")
        return 0
    if args.cmd == "fsck":
        missing = store.fsck()
        for m in missing:
            print(m)
        return 1 if missing else 0
    if args.cmd == "rename-column":
        print(f"v{store.rename_column(args.rename_from, args.rename_to)}")
        return 0
    if args.cmd == "drop-column":
        print(f"v{store.drop_column(args.column)}")
        return 0
    if args.cmd == "clone":
        store.clone_to(args.dest, version=args.at_version)
        print(args.dest)
        return 0
    if args.cmd == "set-mask":
        print(f"v{store.set_mask(args.column, args.expr)}")
        return 0
    if args.cmd == "drop-mask":
        print(f"v{store.drop_mask(args.column)}")
        return 0
    if args.cmd == "set-row-filter":
        print(f"v{store.set_row_filter(args.predicate)}")
        return 0
    if args.cmd == "drop-row-filter":
        print(f"v{store.drop_row_filter()}")
        return 0
    if args.cmd == "drop-constraint":
        print(f"v{store.drop_constraint(args.c_name)}")
        return 0
    if args.cmd == "detail":
        print(_json.dumps(store.detail(args.at_version)))
        return 0
    if args.cmd == "files":  # manifest + stat calls only, no Spark startup
        # same code path as SnapshotStore.files() minus the DataFrame,
        # so the CLI listing can never drift; clean error on empty store
        try:
            entries = store.file_entries(args.at_version)
        except ValueError as exc:
            print(f"error: {exc}", file=sys.stderr)
            return 2
        for path, size, min_k, max_k, bucket in entries:
            print(_json.dumps({
                "path": path, "size_bytes": size,
                "min": min_k, "max": max_k, "bucket": bucket,
            }))
        return 0
    if args.cmd == "analyze":  # footer reads only — no Spark startup
        print(f"v{store.analyze(args.columns.split(','))}")
        return 0
    if args.cmd == "tag":  # manifest-only, no Spark startup
        if args.create:
            print(f"v{store.create_tag(args.create, version=args.at_version)}")
        elif args.drop_ref:
            store.drop_tag(args.drop_ref)
            print(args.drop_ref)
        else:
            for name_, v in store.tags().items():
                print(_json.dumps({"tag": name_, "version": v}))
        return 0
    if args.cmd == "branch":  # fork = manifest-only shallow clone
        if args.create:
            br = store.create_branch(args.create, version=args.at_version)
            print(br.path)
        elif args.drop_ref:
            store.drop_branch(args.drop_ref)
            print(args.drop_ref)
        else:
            for name_, ref in store.branch_refs().items():
                print(_json.dumps({
                    "branch": name_,
                    "base_version": ref["base_version"],
                    "head": SnapshotStore(
                        store._branch_root(name_)
                    ).head_version(),
                }))
        return 0

    from log2sql_spark.session import get_spark

    spark = get_spark("log2sql_spark_store", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    if args.cmd == "add-constraint":  # validates EXISTING rows first
        print(f"v{store.add_constraint(spark, args.c_name, args.predicate)}")
        return 0
    if args.cmd == "delete-mor":
        keys = args.key.split(",") if args.key else None
        print(f"v{store.delete_where_mor(spark, args.predicate, key_cols=keys)}")
        return 0
    if args.cmd == "materialize-deletes":
        print(f"v{store.materialize_deletes(spark)}")
        return 0
    if args.cmd == "cdf":
        keys = args.key.split(",") if args.key else None
        feed = store.read_changes(
            spark, args.from_version, args.to_version, key_cols=keys
        )
        if args.out:
            feed.write.mode("overwrite").parquet(args.out)
            print(args.out)
        else:
            for row in feed.orderBy("_commit_version").limit(args.limit).collect():
                print(_json.dumps(row.asDict(), default=str))
        return 0
    if args.cmd == "flashback":
        keys = args.key.split(",") if args.key else None
        print(f"v{store.flashback_to(spark, args.to_version, key_cols=keys)}")
        return 0
    if args.cmd == "merge-branch":
        print(f"v{store.merge_branch(spark, args.name, drop=args.drop, max_retries=args.max_retries)}")
        return 0
    if args.cmd == "replace-where":
        bounds = None
        if args.key_bounds:
            lo, hi = args.key_bounds.split(",", 1)
            bounds = (int(lo), int(hi))
        df = spark.read.parquet(args.source)
        print(f"v{store.replace_where(spark, df, args.predicate, key_bounds=bounds)}")
        return 0
    if args.cmd == "compact":
        if args.where is not None:
            try:
                lo, hi = _parse_where_bounds(store, args.where)
            except ValueError as exc:
                print(f"error: {exc}", file=sys.stderr)
                return 2
            v = store.compact_where(
                spark, lo, hi, target_files=args.target_files
            )
            print("noop" if v is None else f"v{v}")
            return 0
        if args.min_file_mb is not None:
            v = store.compact_small(
                spark, min_file_mb=args.min_file_mb, target_files=args.target_files
            )
            print("noop" if v is None else f"v{v}")
            return 0
        v = store.compact(spark, target_files=args.target_files)
    else:
        head = store.snapshot(store.head_version())
        v = store.commit(
            store.read(spark, apply_policies=False),  # rewrite raw, owner path
            mode="overwrite",
            cluster_by=args.by,
            layout=args.curve,
            target_files=args.target_files,
            generated=head.generated,
            policies=head.policies,
            constraints=head.constraints,
        )
    print(f"v{v}")
    return 0


def query_main(argv: list[str]) -> int:
    """Run any registered analytics query by name — the ad-hoc front
    end over the same registry the driver contract exposes::

        log2sql_spark query --list
        log2sql_spark query q1_pricing_summary --sf /root/testdata/sf0.1
        log2sql_spark query join_asof --explain
    """
    import sys as _sys

    p = argparse.ArgumentParser(prog="log2sql_spark query")
    p.add_argument("name", nargs="?", help="registered query name")
    p.add_argument("--sf", default="/root/testdata/sf0.01", help="table directory")
    p.add_argument("--limit", type=int, default=20, help="max rows to print")
    p.add_argument("--explain", action="store_true", default=False,
                   help="print the formatted physical plan instead of rows")
    p.add_argument("--list", action="store_true", default=False)
    p.add_argument("--cpus", default=None)
    args = p.parse_args(argv)

    from log2sql_spark import registry

    qs = registry.all_queries()
    if args.list or not args.name:
        for name in sorted(qs):
            print(name)
        return 0
    if args.name not in qs:
        import difflib

        near = difflib.get_close_matches(args.name, qs, n=3)
        hint = f" (did you mean: {', '.join(near)}?)" if near else ""
        print(f"unknown query {args.name!r}{hint}", file=_sys.stderr)
        return 2

    from log2sql_spark.session import get_spark

    spark = get_spark("log2sql_spark_query", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    df = qs[args.name](spark, args.sf)
    if args.explain:
        df.explain("formatted")
    else:
        df.show(args.limit, truncate=False)
    return 0


def main(argv: list[str] | None = None) -> int:
    import sys as _sys

    argv = _sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "store":
        return store_main(argv[1:])
    if argv and argv[0] == "query":
        return query_main(argv[1:])
    args = build_parser().parse_args(argv)
    validate(args)

    from log2sql_spark.session import get_spark

    spark = get_spark("log2sql_spark_cli", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    catalog = load_catalog(args, spark)

    filters = dict(
        sql_types=args.sql_type,
        database=args.database,
        tables=args.tables,
        start_position=args.start_position,
        stop_position=args.stop_position,
        start_datetime=args.start_datetime,
        stop_datetime=args.stop_datetime,
        include_ddl=args.include_ddl,
    )

    if args.stop_never:
        interval = resolve_trigger_interval(args)
        tail_stop = None
        if args.raw:
            # Live remote tail (reference main.py:88-105 made online):
            # a producer thread invokes mysqlbinlog
            # --read-from-remote-server per rotation and lands rotating
            # dumps in --watch-dir; the stream below consumes them
            # through the normal checkpointed file source.
            import shutil as _shutil
            from threading import Event, Thread

            from log2sql_spark.sources.binlog_remote import tail_remote_binlog

            if _shutil.which(args.mysqlbinlog_bin) is None:
                raise SystemExit(
                    f"{args.mysqlbinlog_bin!r} not found on PATH — "
                    "--stop-never --raw tails the server live via "
                    "mysqlbinlog --read-from-remote-server; install the "
                    "MySQL client tools or point --mysqlbinlog-bin at the "
                    "binary (offline alternative: drop text dumps into "
                    "--watch-dir and omit --raw)"
                )
            tail_stop = Event()
            Thread(
                target=tail_remote_binlog,
                args=(args.watch_dir, args.start_file),
                kwargs=dict(
                    binary=args.mysqlbinlog_bin,
                    host=args.host,
                    port=args.port,
                    user=args.user,
                    password=resolve_password(args, live=True),
                    poll_interval=interval or 1.0,
                    stop_event=tail_stop,
                ),
                daemon=True,
            ).start()
        if args.apply_store:
            from log2sql_spark.streaming.cdc_stream import (
                apply_changes_to_snapshot_store,
            )

            q = apply_changes_to_snapshot_store(
                spark, args.watch_dir, catalog, args.apply_store,
                args.checkpoint, key_col=args.key_column,
                max_files_per_trigger=args.max_files_per_trigger,
                trigger_interval=interval,
                quarantine_dir=args.quarantine_dir,
            )
        else:
            from log2sql_spark.streaming.cdc_stream import stream_binlog_to_sql

            q = stream_binlog_to_sql(
                spark, args.watch_dir, catalog, args.out, args.checkpoint,
                flashback=args.flashback,
                max_files_per_trigger=args.max_files_per_trigger,
                trigger_interval=interval,
            )
        try:
            q.awaitTermination()
        finally:
            if tail_stop is not None:
                tail_stop.set()
        return 0

    from log2sql_spark.operators.cdc_codegen import with_sql_text
    from log2sql_spark.operators.cdc_filters import filter_events
    from log2sql_spark.sources.binlog import read_binlog
    from log2sql_spark.sources.catalog import resolve_columns
    from pyspark.sql import functions as F

    if args.raw:
        # raw binlog: range pushdown happens INSIDE mysqlbinlog (it seeks,
        # we never decode outside the window), mirroring reference
        # main.py:88-105; filter_events still applies the same range so
        # semantics are identical either way.
        from log2sql_spark.sources.binlog_raw import read_binlog_raw

        envelope = read_binlog_raw(
            spark, args.start_file,
            binary=args.mysqlbinlog_bin,
            start_position=args.start_position,
            stop_position=args.stop_position,
            start_datetime=args.start_datetime,
            stop_datetime=args.stop_datetime,
        )
    else:
        envelope = read_binlog(spark, args.start_file)
    envelope = filter_events(envelope, **filters)
    if args.apply_store:
        # offline apply: the whole dump merges into the store as ONE
        # atomic versioned commit (the batch twin of --stop-never
        # --apply-store; reference analog: piping rendered SQL into
        # mysql, log2sql.py:161-185, minus the replay race)
        from log2sql_spark.store import SnapshotStore

        store = SnapshotStore(args.apply_store)
        changes = resolve_columns(envelope, catalog).select(
            F.element_at(F.coalesce("after", "before"), args.key_column).alias("key"),
            F.col("op"), F.col("after"),
            F.col("file"), F.col("start_pos"), F.col("event_seq"),
        )
        if store.head_version() is None:
            store.commit(
                spark.createDataFrame([], "key string, after map<string,string>"),
                mode="overwrite", cluster_by="key", layout="hash",
            )
        version = store.merge(
            spark, changes, key_cols="key",
            version_cols=["file", "start_pos", "event_seq"],
            # same OCC default as the streaming apply: a concurrent
            # maintenance commit costs a retry, not the whole run
            max_retries=2,
        )
        n = store.read(spark).count()
        print(f"applied: store={args.apply_store} version={version} rows={n}")
        return 0
    rendered = with_sql_text(
        resolve_columns(envelope, catalog), flashback=args.flashback, no_pk=args.no_pk
    )
    order = (
        [F.desc("file"), F.desc("start_pos"), F.desc("event_seq")]
        if args.flashback
        else ["file", "start_pos", "event_seq"]
    )
    rendered = rendered.orderBy(*order)
    if args.out:
        rendered.write.mode("overwrite").parquet(args.out)
    else:
        # reference prints pos_info comment then the statement
        # (log2sql.py:62-63); bounded by the dump size, like the reference
        for row in rendered.select("pos_info", "sql_text").toLocalIterator():
            print(row["pos_info"])
            print(row["sql_text"])
    return 0


if __name__ == "__main__":
    sys.exit(main())
