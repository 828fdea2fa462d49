"""tools/gen_sf.py: the deterministic scale-up generator behind the
bench's sf1 section. Pure duckdb — no Spark session needed."""

from __future__ import annotations

import importlib.util
import os
import shutil
import tempfile

import duckdb
import pytest

BASE = "/root/testdata/sf0.01"  # small base keeps the test fast


@pytest.fixture(scope="module")
def gen_sf():
    spec = importlib.util.spec_from_file_location(
        "gen_sf", os.path.join(os.path.dirname(__file__), "..", "tools", "gen_sf.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def scaled(gen_sf):
    out = tempfile.mkdtemp(prefix="gen_sf_test_")
    gen_sf.generate(out, 2, base=BASE)
    yield out
    shutil.rmtree(out, ignore_errors=True)


def _q(sql: str):
    return duckdb.connect().execute(sql).fetchone()


def test_row_counts_scale(scaled):
    for table in ("orders", "lineitem", "events", "documents", "customer"):
        n_base = _q(f"SELECT count(*) FROM read_parquet('{BASE}/{table}.parquet')")[0]
        n = _q(f"SELECT count(*) FROM read_parquet('{scaled}/{table}.parquet')")[0]
        assert n == 2 * n_base, table
    # fixed dimensions do not scale
    assert _q(f"SELECT count(*) FROM read_parquet('{scaled}/nation.parquet')")[0] == 25


def test_keys_stay_unique(scaled):
    for table, key in (("orders", "o_orderkey"), ("customer", "c_custkey"),
                       ("documents", "doc_id"), ("events", "event_id")):
        n, d = duckdb.connect().execute(
            f"SELECT count(*), count(DISTINCT {key}) FROM read_parquet('{scaled}/{table}.parquet')"
        ).fetchone()
        assert n == d, table


def test_referential_integrity(scaled):
    # every lineitem joins exactly one order; every order one customer
    n_li = _q(f"SELECT count(*) FROM read_parquet('{scaled}/lineitem.parquet')")[0]
    joined = _q(
        f"SELECT count(*) FROM read_parquet('{scaled}/lineitem.parquet') l "
        f"JOIN read_parquet('{scaled}/orders.parquet') o ON l.l_orderkey = o.o_orderkey"
    )[0]
    assert joined == n_li
    orphans = _q(
        f"SELECT count(*) FROM read_parquet('{scaled}/orders.parquet') o "
        f"ANTI JOIN read_parquet('{scaled}/customer.parquet') c ON o.o_custkey = c.c_custkey"
    )[0]
    assert orphans == 0


def test_documents_are_near_duplicates(scaled):
    # copy k of doc d has text = base text + ' v<k>' and a consistent n_chars
    bad = _q(
        f"SELECT count(*) FROM read_parquet('{scaled}/documents.parquet') "
        f"WHERE n_chars != length(text)"
    )[0]
    assert bad == 0
    n_base = _q(f"SELECT count(*) FROM read_parquet('{BASE}/documents.parquet')")[0]
    sfx = _q(
        f"SELECT count(*) FROM read_parquet('{scaled}/documents.parquet') "
        f"WHERE doc_id >= {n_base} AND text NOT LIKE '% v1'"
    )[0]
    assert sfx == 0


def test_deterministic(gen_sf, scaled):
    # a second generation of one table is byte-identical
    out2 = tempfile.mkdtemp(prefix="gen_sf_test2_")
    try:
        gen_sf.generate(out2, 2, base=BASE)
        a = open(os.path.join(scaled, "orders.parquet"), "rb").read()
        b = open(os.path.join(out2, "orders.parquet"), "rb").read()
        assert a == b
    finally:
        shutil.rmtree(out2, ignore_errors=True)
