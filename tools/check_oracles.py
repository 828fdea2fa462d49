"""Local stand-in for the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over
the same parquet tables, then compares row count, column names/dtypes,
and an order-insensitive value hash. Usage::

    python tools/check_oracles.py [sf_dir] [query ...]

Exit code 0 iff every checked query matches.
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from log2sql_spark import get_spark, registry  # noqa: E402
from log2sql_spark.sources.tables import TABLES  # noqa: E402


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, then rows by every column — order-insensitive."""
    df = df.reindex(sorted(df.columns), axis=1)
    # Stringify for a stable cross-engine representation.
    out = pd.DataFrame()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_float_dtype(col):
            out[c] = col.map(lambda v: "null" if pd.isna(v) else f"{v:.10g}")
        elif pd.api.types.is_datetime64_any_dtype(col):
            out[c] = col.dt.strftime("%Y-%m-%d %H:%M:%S.%f").fillna("null")
        else:
            out[c] = col.map(lambda v: "null" if v is None or (isinstance(v, float) and pd.isna(v)) else str(v))
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def _value_hash(df: pd.DataFrame) -> str:
    norm = _normalize(df)
    h = hashlib.sha256()
    for row in norm.itertuples(index=False):
        h.update("\x1f".join(map(str, row)).encode())
        h.update(b"\x1e")
    return h.hexdigest()


# Queries whose asserted behavior IS an empty result at sf0.01 (none
# today). Anything else matching on 0 rows fails as vacuous.
EXPECTED_EMPTY: frozenset[str] = frozenset()


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]

    spark = get_spark("check_oracles")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = registry.all_queries()
    oracles = registry.all_oracles()
    names = only or list(qs)
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        finally:
            # drop caches queries persist() but cannot unpersist —
            # over 200 queries the leak becomes GC thrash
            spark.catalog.clearCache()
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        problems = []
        if len(sdf) != len(ddf):
            problems.append(f"rowcount spark={len(sdf)} duckdb={len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(f"columns spark={sorted(sdf.columns)} duckdb={sorted(ddf.columns)}")
        elif _value_hash(sdf) != _value_hash(ddf):
            problems.append("value-hash mismatch")
            ns, nd = _normalize(sdf), _normalize(ddf)
            diff = ns.compare(nd) if ns.shape == nd.shape else None
            if diff is not None and not diff.empty:
                print(diff.head(8))
            else:
                print("spark head:\n", ns.head(4), "\nduckdb head:\n", nd.head(4))
        if not problems and len(sdf) == 0 and name not in EXPECTED_EMPTY:
            # A 0-row/0-row match proves only that both engines agree on
            # emptiness — the query's logic is untested at this scale.
            # (Caught llm_dedup_url_canonical's lcm-700 synthesis, whose
            # sf0.01 result was empty.) Queries whose CONTRACT is an
            # empty result must opt in via EXPECTED_EMPTY.
            problems.append("vacuous: both engines returned 0 rows")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
        else:
            print(f"OK    {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
