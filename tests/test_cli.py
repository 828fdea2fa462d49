"""CLI tests: the reference-workflow entry point (argument parity with
main.py:42-85 + the flags the reference never implemented)."""

from __future__ import annotations

import json
from datetime import datetime

import pytest

from log2sql_spark.cli import build_parser, main, validate
from log2sql_spark.sources.binlog_fixture import render_binlog

TS = datetime(2024, 5, 1, 12, 0, 7)


@pytest.fixture()
def dump_and_catalog(tmp_path):
    dump = tmp_path / "dump.txt"
    dump.write_text(
        render_binlog(
            [
                {"op": "insert", "db": "shop", "table": "orders", "ts": TS,
                 "values": [(1, "1"), (2, "'a'")]},
                {"op": "delete", "db": "other", "table": "t", "ts": TS,
                 "values": [(1, "9")]},
            ]
        )
    )
    cat = tmp_path / "cat.json"
    cat.write_text(json.dumps({"shop.orders": {"columns": ["id", "status"], "key_columns": ["id"]}}))
    return str(dump), str(cat)


def test_cli_replay_to_parquet(spark, dump_and_catalog, tmp_path, capsys):
    dump, cat = dump_and_catalog
    out = str(tmp_path / "out")
    rc = main(["--start-file", dump, "--catalog", cat, "--out", out, "--cpus", "4"])
    assert rc == 0
    rows = {r["op"]: r["sql_text"] for r in spark.read.parquet(out).collect()}
    assert rows["insert"] == "INSERT INTO `shop`.`orders`(`id`, `status`) VALUES (1, 'a');"
    assert rows["delete"].startswith("DELETE FROM `other`.`t`")


def test_cli_filters(spark, dump_and_catalog, tmp_path):
    dump, cat = dump_and_catalog
    out = str(tmp_path / "out2")
    rc = main([
        "--start-file", dump, "--catalog", cat, "--out", out,
        "--database", "shop", "--sql-type", "insert", "--cpus", "4",
    ])
    assert rc == 0
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1 and rows[0]["op"] == "insert"


def test_cli_validation_errors(dump_and_catalog):
    dump, cat = dump_and_catalog
    p = build_parser()
    with pytest.raises(ValueError, match="flashback or no_pk"):
        validate(p.parse_args(["--start-file", dump, "--catalog", cat, "-B", "-K"]))
    with pytest.raises(ValueError, match="start_file"):
        validate(p.parse_args(["--catalog", cat]))
    with pytest.raises(ValueError, match="datetime"):
        validate(p.parse_args(["--start-file", dump, "--catalog", cat,
                               "--start-datetime", "2024/05/01"]))
    with pytest.raises(ValueError, match="stop-never"):
        validate(p.parse_args(["--catalog", cat, "--stop-never"]))
    with pytest.raises(ValueError, match="drain"):
        validate(p.parse_args(["--start-file", dump, "--catalog", cat, "--drain"]))


def test_stop_never_trigger_resolution():
    """--stop-never honors its reference contract (continuously parse):
    default is a 1.0 s processing-time trigger, --back-interval re-paces
    it, and only an explicit --drain yields the availableNow
    drain-and-stop trigger."""
    from log2sql_spark.cli import resolve_trigger_interval

    p = build_parser()
    base = ["--watch-dir", "w", "--stop-never", "--out", "o", "--checkpoint", "c"]
    assert resolve_trigger_interval(p.parse_args(base)) == 1.0
    assert resolve_trigger_interval(p.parse_args(base + ["--back-interval", "2.5"])) == 2.5
    assert resolve_trigger_interval(p.parse_args(base + ["--drain"])) is None
    # --drain wins even alongside --back-interval
    assert resolve_trigger_interval(
        p.parse_args(base + ["--drain", "--back-interval", "2.5"])
    ) is None


def test_cli_apply_store(spark, dump_and_catalog, tmp_path, capsys):
    dump, cat = dump_and_catalog
    store_dir = str(tmp_path / "snapstore")
    rc = main([
        "--start-file", dump, "--catalog", cat, "-d", "shop",
        "--apply-store", store_dir,
    ])
    assert rc == 0
    from log2sql_spark.store import SnapshotStore

    store = SnapshotStore(store_dir)
    rows = {r.key: r.after for r in store.read(spark).collect()}
    assert rows == {"1": {"id": "1", "status": "'a'"}}
    assert "version=2" in capsys.readouterr().out

    # applying the same dump again is idempotent and adds one version
    rc = main([
        "--start-file", dump, "--catalog", cat, "-d", "shop",
        "--apply-store", store_dir,
    ])
    assert rc == 0
    assert {r.key: r.after for r in store.read(spark).collect()} == rows


def test_cli_apply_store_validation(dump_and_catalog):
    dump, cat = dump_and_catalog
    import pytest as _pytest

    args = build_parser().parse_args(
        ["--start-file", dump, "--catalog", cat, "-B", "--apply-store", "/tmp/x"]
    )
    with _pytest.raises(ValueError):
        validate(args)


def test_cli_store_history_and_zorder(spark, tmp_path, capsys):
    """`store` subcommands: zorder rewrite commits a new version, and
    history lists every version without starting Spark."""
    import json

    import pyspark.sql.functions as F

    from log2sql_spark.cli import main
    from log2sql_spark.store import SnapshotStore

    path = str(tmp_path / "clistore")
    store = SnapshotStore(path)
    df = spark.range(1000).select(
        (F.col("id") % 50).alias("a"),
        ((F.col("id") / 50).cast("long")).alias("b"),
        F.col("id").alias("payload"),
    )
    store.commit(df, mode="overwrite")

    assert main(["store", "zorder", path, "--by", "a,b", "--cpus", "4"]) == 0
    out = capsys.readouterr().out.strip()
    assert out == "v2"
    assert store.snapshot(2).layout == "zorder"
    assert store.read(spark).count() == 1000

    assert main(["store", "history", path]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert [h["version"] for h in lines] == [1, 2]
    assert lines[1]["layout"] == "zorder"

    # --curve hilbert: same rewrite commit, Hilbert layout (round 13)
    assert main(["store", "zorder", path, "--by", "a,b",
                 "--curve", "hilbert", "--cpus", "4"]) == 0
    assert capsys.readouterr().out.strip() == "v3"
    snap3 = store.snapshot(3)
    assert snap3.layout == "hilbert"
    assert snap3.has_dim_stats("a") and snap3.has_dim_stats("b")
    assert store.read(spark).count() == 1000


def test_cli_store_vacuum(spark, tmp_path, capsys):
    import os

    import pyspark.sql.functions as F

    from log2sql_spark.cli import main
    from log2sql_spark.store import SnapshotStore

    path = str(tmp_path / "vacstore")
    store = SnapshotStore(path)
    df = spark.range(100).select(F.col("id").alias("k"))
    store.commit(df, mode="overwrite")
    store.commit(df.withColumn("k", F.col("k") + 1), mode="overwrite")
    assert len(store.versions()) == 2

    assert main(["store", "vacuum", path, "--keep-last", "1"]) == 0
    deleted = capsys.readouterr().out.strip().splitlines()
    assert len(deleted) >= 1
    assert store.versions() == [2]
    assert store.read(spark).count() == 100
    for d in deleted:
        assert not os.path.exists(d)


def test_cli_store_compact(spark, tmp_path, capsys):
    import pyspark.sql.functions as F

    from log2sql_spark.cli import main
    from log2sql_spark.store import SnapshotStore

    path = str(tmp_path / "compactstore")
    store = SnapshotStore(path)
    df = spark.range(500).select(F.col("id").alias("k"))
    # many-file commit: compaction has something to merge
    store.commit(df.repartition(12), mode="overwrite")
    assert store.file_count() >= 10

    assert main(["store", "compact", path, "--target-files", "2", "--cpus", "4"]) == 0
    assert capsys.readouterr().out.strip() == "v2"
    assert store.file_count() <= 4
    assert store.read(spark).count() == 500


def test_cli_store_rename_and_clone(spark, tmp_path, capsys):
    """`store rename-column` and `store clone` are manifest-only (no
    Spark startup needed by the CLI path itself)."""
    import pyspark.sql.functions as F

    from log2sql_spark.cli import main
    from log2sql_spark.store import SnapshotStore

    path = str(tmp_path / "clistore")
    store = SnapshotStore(path)
    store.commit(
        spark.range(10).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("cents")
        )
    )
    assert main(["store", "rename-column", path, "--from", "cents", "--to", "money"]) == 0
    assert capsys.readouterr().out.strip() == "v2"
    assert store.read(spark).columns == ["k", "money"]

    dest = str(tmp_path / "clistore_clone")
    assert main(["store", "clone", path, "--dest", dest]) == 0
    assert capsys.readouterr().out.strip() == dest
    clone = SnapshotStore(dest)
    assert clone.read(spark).columns == ["k", "money"]
    assert clone.read(spark).count() == 10


def test_cli_store_governance_surface(spark, tmp_path, capsys):
    """CLI parity for masks / row filters / constraints."""
    import pyspark.sql.functions as F

    from log2sql_spark.cli import main
    from log2sql_spark.store import SnapshotStore

    path = str(tmp_path / "govstore")
    store = SnapshotStore(path)
    store.commit(
        spark.range(10).select(F.col("id").alias("k"), (F.col("id") * 10).alias("cents"))
    )
    assert main(["store", "set-row-filter", path, "--predicate", "k % 2 = 0"]) == 0
    assert main(["store", "set-mask", path, "--column", "cents", "--expr", "0"]) == 0
    capsys.readouterr()
    assert {(r.k, r.cents) for r in store.read(spark).collect()} == {
        (k, 0) for k in (0, 2, 4, 6, 8)
    }
    assert main(["store", "add-constraint", path, "--name", "nn",
                 "--predicate", "cents >= 0", "--cpus", "4"]) == 0
    assert capsys.readouterr().out.strip() == "v4"
    assert main(["store", "drop-constraint", path, "--name", "nn"]) == 0
    assert main(["store", "drop-mask", path, "--column", "cents"]) == 0
    assert main(["store", "drop-row-filter", path]) == 0
    capsys.readouterr()
    assert store.read(spark).count() == 10


def test_cli_store_detail_and_replace_where(spark, tmp_path, capsys):
    """`store detail` (manifest-only DESCRIBE DETAIL) and
    `store replace-where` (selective overwrite from a parquet source
    with key-bound file pruning)."""
    import json

    import pyspark.sql.functions as F

    from log2sql_spark.cli import main
    from log2sql_spark.store import SnapshotStore

    path = str(tmp_path / "detstore")
    store = SnapshotStore(path)
    df = spark.range(1, 101).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("val")
    )
    store.commit(df, mode="overwrite", cluster_by="k", target_files=4)
    store.add_constraint(spark, "val_pos", "val > 0")

    assert main(["store", "detail", path]) == 0
    d = json.loads(capsys.readouterr().out.strip())
    assert d["version"] == 2 and d["layout"] == "range"
    assert d["cluster_by"] == "k" and d["num_files"] == 4
    assert d["constraints"] == ["val_pos"] and d["size_bytes"] > 0
    assert d["num_columns"] == 2 and not d["has_row_filter"]

    src = str(tmp_path / "repl.parquet")
    spark.range(10, 21).select(
        F.col("id").alias("k"), F.lit(7).alias("val")
    ).write.parquet(src)
    assert main([
        "store", "replace-where", path,
        "--predicate", "k BETWEEN 10 AND 20",
        "--source", src, "--key-bounds", "10,20", "--cpus", "4",
    ]) == 0
    assert capsys.readouterr().out.strip() == "v3"
    got = {r.k: r.val for r in store.read(spark).collect()}
    assert got[10] == 7 and got[20] == 7 and got[9] == 18 and len(got) == 100


def test_cli_zorder_keeps_constraints(spark, tmp_path, capsys):
    """Regression: the CLI zorder rewrite passed policies through but
    silently RESET constraints (same class as the unclustered-merge
    governance drop)."""
    import pyspark.sql.functions as F

    from log2sql_spark.cli import main
    from log2sql_spark.store import SnapshotStore

    path = str(tmp_path / "zconstore")
    store = SnapshotStore(path)
    df = spark.range(100).select(
        (F.col("id") % 10).alias("a"), F.col("id").alias("b"),
        (F.col("id") + 1).alias("val"),
    )
    store.commit(df, mode="overwrite")
    store.add_constraint(spark, "val_pos", "val > 0")
    assert main(["store", "zorder", path, "--by", "a,b", "--cpus", "4"]) == 0
    capsys.readouterr()
    head = store.snapshot(store.head_version())
    assert head.constraints == {"val_pos": "val > 0"}


def test_cli_query_list_and_run(spark, capsys):
    """`query` subcommand: --list prints the registry; running a name
    prints rows; an unknown name suggests near-matches and exits 2."""
    from log2sql_spark.cli import main

    assert main(["query", "--list"]) == 0
    names = capsys.readouterr().out.split()
    assert "q1_pricing_summary" in names and len(names) >= 250

    assert main(["query", "topk_global", "--cpus", "4"]) == 0
    out = capsys.readouterr().out
    assert "+" in out  # a rendered table

    assert main(["query", "q1_pricing_sumary", "--cpus", "4"]) == 2
    err = capsys.readouterr().err
    assert "did you mean" in err and "q1_pricing_summary" in err


def test_cli_connection_flags_parse():
    """Reference parity (main.py:44-52): -h/-u/-p/-P parse with the
    reference's defaults; -h means --host (help moved to --help,
    add_help=False like the reference's parser)."""
    p = build_parser()
    args = p.parse_args(["--start-file", "x"])
    assert (args.host, args.user, args.port) == ("127.0.0.1", "root", 3306)
    assert args.password == ""
    args = p.parse_args(["--start-file", "x", "-h", "db.prod", "-u", "repl",
                         "-p", "secret", "-P", "3307"])
    assert (args.host, args.user, args.port) == ("db.prod", "repl", 3307)
    assert args.password == ["secret"]


def test_cli_password_getpass_fallback(monkeypatch):
    """Bare -p (empty nargs list) prompts via getpass (main.py:35-38);
    -p secret takes the first token; absent -p is empty password."""
    import getpass as getpass_mod

    from log2sql_spark.cli import resolve_password

    p = build_parser()
    monkeypatch.setattr(getpass_mod, "getpass", lambda: "prompted")
    assert resolve_password(p.parse_args(["--start-file", "x", "-p"])) == "prompted"
    assert resolve_password(
        p.parse_args(["--start-file", "x", "-p", "s3cret", "extra"])
    ) == "s3cret"
    assert resolve_password(p.parse_args(["--start-file", "x"])) == ""


def test_cli_password_live_path_prompts_on_empty(monkeypatch):
    """Reference parity (main.py:35-38): getpass prompts whenever the
    password is EMPTY, including when -p is absent — matched on the
    live-catalog path when stdin is a tty; non-tty sends the empty
    password instead of blocking (documented divergence)."""
    import getpass as getpass_mod
    import sys as sys_mod

    from log2sql_spark.cli import resolve_password

    p = build_parser()
    monkeypatch.setattr(getpass_mod, "getpass", lambda: "prompted")

    class _Tty:
        def isatty(self):
            return True

    class _Pipe:
        def isatty(self):
            return False

    args = p.parse_args(["--start-file", "x"])  # -p absent
    monkeypatch.setattr(sys_mod, "stdin", _Tty())
    assert resolve_password(args, live=True) == "prompted"
    monkeypatch.setattr(sys_mod, "stdin", _Pipe())
    assert resolve_password(args, live=True) == ""
    # bare -p still always prompts, tty or not
    args_bare = p.parse_args(["--start-file", "x", "-p"])
    assert resolve_password(args_bare, live=True) == "prompted"
    assert resolve_password(args_bare) == "prompted"
    # explicit password never prompts on the live path
    args_pw = p.parse_args(["--start-file", "x", "-p", "s3cret"])
    assert resolve_password(args_pw, live=True) == "s3cret"


def test_cli_jdbc_driver_gate_is_narrow(monkeypatch):
    """Only the exact missing-driver signatures get rewritten into the
    actionable SystemExit; an auth failure that merely MENTIONS a
    driver class propagates untouched (advice r9: substring 'driver'
    match hid real causes)."""
    import pytest

    from log2sql_spark import cli as cli_mod

    p = build_parser()
    args = p.parse_args(["--start-file", "x"])

    def _raise(msg):
        def _f(*a, **k):
            raise RuntimeError(msg)

        return _f

    # missing-driver signature -> actionable SystemExit carrying the cause
    monkeypatch.setattr(
        "log2sql_spark.sources.catalog.catalog_from_jdbc",
        _raise("java.sql.SQLException: No suitable driver"),
    )
    with pytest.raises(SystemExit, match="No suitable driver"):
        cli_mod.load_catalog(args, spark=None)
    monkeypatch.setattr(
        "log2sql_spark.sources.catalog.catalog_from_jdbc",
        _raise("java.lang.ClassNotFoundException: com.mysql.cj.jdbc.Driver"),
    )
    with pytest.raises(SystemExit, match="JDBC driver"):
        cli_mod.load_catalog(args, spark=None)
    # auth error mentioning a driver class -> original exception, not SystemExit
    monkeypatch.setattr(
        "log2sql_spark.sources.catalog.catalog_from_jdbc",
        _raise("Access denied for user 'root' (using driver com.mysql.cj.jdbc.Driver)"),
    )
    with pytest.raises(RuntimeError, match="Access denied"):
        cli_mod.load_catalog(args, spark=None)


def test_cli_live_catalog_routes_to_jdbc(monkeypatch):
    """Without --catalog, load_catalog builds the JDBC URL from
    -h/-u/-p/-P and calls catalog_from_jdbc (one-shot information_schema
    load) — driver-gated, so the live connection itself is not made."""
    import log2sql_spark.sources.catalog as catmod
    from log2sql_spark.cli import load_catalog

    seen = {}

    def fake_jdbc(spark, url, properties=None):
        seen["url"] = url
        seen["props"] = properties
        return "CATALOG_DF"

    monkeypatch.setattr(catmod, "catalog_from_jdbc", fake_jdbc)
    p = build_parser()
    args = p.parse_args(["--start-file", "x", "-h", "db.prod", "-u", "repl",
                         "-p", "pw", "-P", "3307"])
    out = load_catalog(args, spark=None)
    assert out == "CATALOG_DF"
    assert seen["url"] == "jdbc:mysql://db.prod:3307"
    assert seen["props"] == {"user": "repl", "password": "pw"}


def test_cli_live_catalog_driver_gate(monkeypatch):
    """With no MySQL JDBC driver on the classpath the live path exits
    with an actionable message instead of a JVM stack."""
    import log2sql_spark.sources.catalog as catmod
    from log2sql_spark.cli import load_catalog

    def no_driver(spark, url, properties=None):
        raise RuntimeError("java.sql.SQLException: No suitable driver")

    monkeypatch.setattr(catmod, "catalog_from_jdbc", no_driver)
    p = build_parser()
    args = p.parse_args(["--start-file", "x"])
    with pytest.raises(SystemExit, match="JDBC driver"):
        load_catalog(args, spark=None)


def test_cli_store_cdf_and_flashback(spark, tmp_path, capsys):
    """CLI surface for the keyed change feed and row-level flashback."""
    from log2sql_spark.store import SnapshotStore

    d = str(tmp_path / "s")
    store = SnapshotStore(d)
    store.commit(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"),
        mode="overwrite", cluster_by="k", layout="hash",
    )
    store.merge(
        spark,
        spark.createDataFrame(
            [(1, "a2", "update", 1), (3, "c", "insert", 1)],
            "k int, v string, op string, seq int",
        ),
        key_cols="k", version_cols="seq",
    )

    assert main(["store", "cdf", d, "--from-version", "1", "--to-version", "2"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    feed = [json.loads(ln) for ln in out]
    assert {(r["k"], r["_change_type"]) for r in feed} == {
        (1, "update_preimage"), (1, "update_postimage"), (3, "insert"),
    }

    assert main(["store", "flashback", d, "--to-version", "1"]) == 0
    assert capsys.readouterr().out.strip() == "v3"
    rows = {tuple(r) for r in store.read(spark).collect()}
    assert rows == {(1, "a"), (2, "b")}


def test_cli_stop_never_drains_watch_dir(spark, dump_and_catalog, tmp_path):
    """The --stop-never ONLINE branch of main() end-to-end: watch-dir ->
    streaming parse -> rendered SQL parquet. --drain switches the
    default always-on processing-time trigger to availableNow
    (drain-and-stop), so the call terminates once the existing dumps
    are processed — the always-on default is the same path with a
    processing-time trigger (covered by the paced-stream test)."""
    dump, cat = dump_and_catalog
    import shutil

    watch = tmp_path / "watch"
    watch.mkdir()
    shutil.copy(dump, watch / "bin.000001.txt")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    rc = main([
        "--watch-dir", str(watch), "--stop-never", "--drain", "--catalog", cat,
        "--out", out, "--checkpoint", ckpt,
        "--max-files-per-trigger", "1",
    ])
    assert rc == 0
    got = {r["sql_text"] for r in __import__("pyspark").sql.SparkSession.active().read.parquet(out).collect()}
    assert "INSERT INTO `shop`.`orders`(`id`, `status`) VALUES (1, 'a');" in got


def test_cli_store_files_and_compact_where(spark, tmp_path, capsys):
    """`store files` lists the live manifest entries (manifest-only, no
    Spark startup); `store compact --where lo,hi` runs the filtered
    OPTIMIZE and the files listing shrinks by exactly the band."""
    import json as _json

    import pyspark.sql.functions as F

    from log2sql_spark.cli import main
    from log2sql_spark.store import SnapshotStore

    path = str(tmp_path / "fstore")
    store = SnapshotStore(path)
    store.commit(
        spark.range(10_000).select(F.col("id").alias("k"), F.lit("v").alias("val")),
        cluster_by="k",
        target_files=4,
    )
    for i in range(3):  # fragment the hot band k < 100
        store.commit(
            spark.createDataFrame([(i * 10 + j, "hot") for j in range(10)],
                                  "k long, val string"),
            mode="append", cluster_by="k", target_files=1,
        )

    assert main(["store", "files", path]) == 0
    rows = [_json.loads(line) for line in capsys.readouterr().out.splitlines()]
    assert len(rows) == 7
    assert all(r["size_bytes"] > 0 for r in rows)
    # bounds are stringified (shared code path with SnapshotStore.files(),
    # whose min_key/max_key are strings because key types vary per table)
    assert sum(1 for r in rows if r["max"] is not None and int(r["max"]) < 100) == 3

    assert main(["store", "compact", path, "--where", "0,99",
                 "--target-files", "1", "--cpus", "4"]) == 0
    assert capsys.readouterr().out.strip() == "v5"
    assert main(["store", "files", path]) == 0
    after = [_json.loads(line) for line in capsys.readouterr().out.splitlines()]
    # 4 files: 3 cold base files carried + the merged band file
    assert len(after) == 4
    assert store.read(spark).count() == 10_030


def test_cli_store_vacuum_older_than(spark, tmp_path, capsys):
    """--older-than-hours: recent versions survive an aggressive
    --keep-last (time axis composes as keep-at-least-N AND newer-than-T)."""
    from log2sql_spark.cli import main
    from log2sql_spark.store import SnapshotStore

    path = str(tmp_path / "tstore")
    store = SnapshotStore(path)
    for i in range(3):
        store.commit(
            spark.createDataFrame([(i, "x")], "k long, val string"),
            mode="overwrite",
        )
    # everything is seconds old: a 1-hour retention drops nothing
    assert main(["store", "vacuum", path, "--keep-last", "1",
                 "--older-than-hours", "1"]) == 0
    assert capsys.readouterr().out.strip() == ""
    assert store.versions() == [1, 2, 3]
    # without the time axis the same keep-last drops two versions
    assert main(["store", "vacuum", path, "--keep-last", "1"]) == 0
    assert store.versions() == [3]


def test_cli_store_files_empty_store_clean_error(tmp_path, capsys):
    """`store files` on an empty store exits 2 with a clean message
    instead of crashing in snapshot(None)."""
    from log2sql_spark.cli import main
    from log2sql_spark.store import SnapshotStore

    path = str(tmp_path / "estore")
    SnapshotStore(path)  # initialized, zero commits
    assert main(["store", "files", path]) == 2
    err = capsys.readouterr().err
    assert "empty store" in err


def test_cli_compact_where_bounds_parsing(spark, tmp_path, capsys):
    """--where bound parsing: whitespace is stripped ("0, 199"), string
    cluster keys keep string bounds (no mixed str/int TypeError deep in
    in_band), and a non-numeric bound against numeric key stats is a
    clean exit-2 error."""
    import pyspark.sql.functions as F

    from log2sql_spark.cli import main
    from log2sql_spark.store import SnapshotStore

    # numeric keys: whitespace-y bounds parse; alpha bound is rejected
    npath = str(tmp_path / "numstore")
    nstore = SnapshotStore(npath)
    nstore.commit(
        spark.range(400).select(F.col("id").alias("k"), F.lit("v").alias("val")),
        cluster_by="k", target_files=4,
    )
    nstore.commit(
        spark.createDataFrame([(5, "hot")], "k long, val string"),
        mode="append", cluster_by="k", target_files=1,
    )
    assert main(["store", "compact", npath, "--where", " 0 , 99 ",
                 "--target-files", "1", "--cpus", "4"]) == 0
    assert capsys.readouterr().out.strip() == "v3"
    assert main(["store", "compact", npath, "--where", "a,z",
                 "--target-files", "1", "--cpus", "4"]) == 2
    assert "do not parse as int" in capsys.readouterr().err
    assert main(["store", "compact", npath, "--where", "0",
                 "--target-files", "1", "--cpus", "4"]) == 2
    assert "needs 'lo,hi'" in capsys.readouterr().err

    # string keys: digit-looking bounds must STAY strings
    spath = str(tmp_path / "strstore")
    sstore = SnapshotStore(spath)
    sstore.commit(
        spark.createDataFrame(
            [(f"{i:04d}", "v") for i in range(200)], "k string, val string"
        ),
        cluster_by="k", target_files=4,
    )
    sstore.commit(
        spark.createDataFrame([("0005", "hot")], "k string, val string"),
        mode="append", cluster_by="k", target_files=1,
    )
    assert main(["store", "compact", spath, "--where", "0000,0099",
                 "--target-files", "1", "--cpus", "4"]) == 0
    assert capsys.readouterr().out.strip() == "v3"
    assert sstore.read(spark).count() == 201
