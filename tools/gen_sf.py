"""Deterministic scale-up generator: synthesize sfN parquet tables from
the driver's sf0.1 base (TESTDATA.md) by key-space replication.

Why replication, not re-synthesis: the driver's generator (seed=42) is
not in this repo, so we cannot extend its sequence. Replicating the
sf0.1 tables M times with per-copy key offsets preserves

  * referential integrity (o_custkey/l_orderkey/l_partkey/l_suppkey/
    user_id offsets move in lockstep with their dimension copies),
  * every value distribution exactly (each copy is the same marginal
    distribution, so aggregates scale linearly and group-by
    cardinalities scale with the key space — what a bigger SF does),
  * determinism (pure SQL over the frozen sf0.1 input; bit-identical
    output on every run, no RNG).

Document text gets a per-copy suffix so replicas are NEAR-duplicates of
the originals rather than exact ones — that keeps the MinHash/SimHash
bench paths honest at scale (exact-dup shortcuts can't win).

Usage: python tools/gen_sf.py <out_dir> <multiplier>
e.g.   python tools/gen_sf.py /root/repo/.bench_data/sf1 10

Output dir is created; existing tables are only rebuilt if missing, so
the bench pays generation cost once per machine.
"""

from __future__ import annotations

import os
import sys

import duckdb

BASE = os.environ.get("SPARK_GRAFT_BASE_SF_DIR", "/root/testdata/sf0.1")

# table -> list of (column, kind) where kind is:
#   "key:<span_col>"  offset by copy * span of that key space
#   "cast:<type>"     pass through with an explicit cast (preserve int32)
#   None              pass through unchanged
PLANS: dict[str, list[tuple[str, str | None]]] = {
    "region": [("r_regionkey", None), ("r_name", None)],
    "nation": [("n_nationkey", None), ("n_name", None), ("n_regionkey", None)],
    "customer": [
        ("c_custkey", "key:c_custkey"),
        ("c_name", None),
        ("c_nationkey", "cast:INTEGER"),
        ("c_acctbal", None),
        ("c_mktsegment", None),
    ],
    "supplier": [
        ("s_suppkey", "key:s_suppkey"),
        ("s_name", None),
        ("s_nationkey", "cast:INTEGER"),
        ("s_acctbal", None),
    ],
    "part": [
        ("p_partkey", "key:p_partkey"),
        ("p_name", None),
        ("p_brand", None),
        ("p_type", None),
        ("p_size", "cast:INTEGER"),
        ("p_retailprice", None),
    ],
    "orders": [
        ("o_orderkey", "key:o_orderkey"),
        ("o_custkey", "key:c_custkey"),
        ("o_orderstatus", None),
        ("o_totalprice", None),
        ("o_orderdate", None),
        ("o_orderpriority", None),
    ],
    "lineitem": [
        ("l_orderkey", "key:o_orderkey"),
        ("l_partkey", "key:p_partkey"),
        ("l_suppkey", "key:s_suppkey"),
        ("l_linenumber", "cast:INTEGER"),
        ("l_quantity", None),
        ("l_extendedprice", None),
        ("l_discount", None),
        ("l_tax", None),
        ("l_returnflag", None),
        ("l_linestatus", None),
        ("l_shipdate", None),
    ],
    "events": [
        ("event_id", "key:event_id"),
        ("ts", None),
        ("user_id", "key:user_id"),
        ("event_type", None),
        ("value", None),
        ("props", None),
    ],
    "documents": [
        ("doc_id", "key:doc_id"),
        # copy 0 is the original text; copies 1..M-1 append a short
        # per-copy marker -> near-duplicates (Jaccard ~ len/(len+1))
        ("text", "expr:CASE WHEN _copy = 0 THEN text ELSE text || ' v' || _copy END"),
        ("lang", None),
        ("source", None),
        ("n_chars", "expr:CAST(length(CASE WHEN _copy = 0 THEN text ELSE text || ' v' || _copy END) AS BIGINT)"),
    ],
    "embeddings": [
        ("vec_id", "key:vec_id"),
        ("embedding", None),
        ("label", "cast:INTEGER"),
    ],
}

# key spaces whose span is measured once from the base data
SPAN_SOURCES = {
    "c_custkey": "customer",
    "s_suppkey": "supplier",
    "p_partkey": "part",
    "o_orderkey": "orders",
    "event_id": "events",
    "user_id": "events",
    "doc_id": "documents",
    "vec_id": "embeddings",
}


def generate(
    out_dir: str,
    multiplier: int,
    base: str = BASE,
    tables: tuple[str, ...] | None = None,
) -> None:
    """Scale the base tables by ``multiplier`` into ``out_dir``.

    ``tables`` restricts generation to a subset (e.g. only `documents`
    at 100x for the dedup scale bench, without paying for a 600M-row
    lineitem)."""
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    spans = {
        key: con.execute(
            f"SELECT max({key}) + 1 FROM read_parquet('{base}/{tbl}.parquet')"
        ).fetchone()[0]
        for key, tbl in SPAN_SOURCES.items()
    }
    for table, cols in PLANS.items():
        if tables is not None and table not in tables:
            continue
        dest = os.path.join(out_dir, f"{table}.parquet")
        if os.path.exists(dest):
            continue
        exprs = []
        for col, kind in cols:
            if kind is None:
                exprs.append(col)
            elif kind.startswith("key:"):
                exprs.append(f"{col} + _copy * {spans[kind[4:]]} AS {col}")
            elif kind.startswith("cast:"):
                exprs.append(f"CAST({col} AS {kind[5:]}) AS {col}")
            elif kind.startswith("expr:"):
                exprs.append(f"{kind[5:]} AS {col}")
        if table in ("region", "nation"):
            src = f"SELECT {', '.join(exprs)} FROM read_parquet('{base}/{table}.parquet')"
        else:
            src = (
                f"SELECT {', '.join(exprs)} "
                f"FROM read_parquet('{base}/{table}.parquet') "
                f"CROSS JOIN (SELECT unnest(range({multiplier})) AS _copy) c "
                f"ORDER BY _copy"
            )
        tmp = dest + ".inflight"
        con.execute(f"COPY ({src}) TO '{tmp}' (FORMAT PARQUET, COMPRESSION SNAPPY)")
        os.replace(tmp, dest)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_data/sf1"
    multiplier = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    generate(out_dir, multiplier)
    con = duckdb.connect()
    for t in sorted(PLANS):
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{os.path.join(out_dir, t)}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n}")


if __name__ == "__main__":
    main()
