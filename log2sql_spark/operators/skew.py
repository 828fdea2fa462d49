"""Skew mitigation: salted aggregation and salted replicated joins.

At 100 TB a handful of hot keys (one mega-customer, one dominant
returnflag) turn a shuffle into a single straggler task. Two standard
remedies, exposed as operators (complementing AQE's runtime skew-join
splitting, which is enabled in session.py):

* **salted aggregation** — two-phase: group on (key, salt) so the hot
  key's rows spread over N reducers, then re-aggregate on the key.
  Works for any algebraic aggregate (sum/count/min/max — things with an
  associative merge).
* **salted join** — the big side gets a deterministic salt in
  [0, buckets); the small side is replicated once per salt value; the
  join key becomes (key, salt). Hot-key rows land on ``buckets``
  reducers instead of one.

Salts are derived from a hash of stable columns (never ``rand()``) so
plans stay deterministic and retry-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),  # partial counts re-merge by summing
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def _salt(cols: list[str], buckets: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets))


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``: output name → (function, input column) with function in
    {sum, count, min, max}. ``salt_cols`` default to every non-key
    column used by the aggregates (high-cardinality spread).
    """
    for name, (fn, _col) in aggs.items():
        if fn not in _ALGEBRAIC:
            raise ValueError(f"{fn!r} is not algebraic; salted two-phase agg unsupported")
    salt_cols = salt_cols or sorted({c for _, c in aggs.values()})
    partial = (
        df.withColumn("_salt", _salt(salt_cols, buckets))
        .groupBy(*keys, "_salt")
        .agg(*[_ALGEBRAIC[fn][0](c).alias(name) for name, (fn, c) in aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[_ALGEBRAIC[fn][1](name).alias(name) for name, (fn, _c) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    buckets: int = 16,
    salt_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side.

    The small side grows ×buckets (fine — it is small by contract); the
    big side's hot keys spread across ``buckets`` reducers.

    Only join types where every output row is witnessed by a big-side
    row are allowed: under right/full outer joins an unmatched
    small-side row would be emitted once per salt replica (``buckets``
    duplicates)."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
               "left_anti", "leftanti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — small-side replication "
            f"duplicates unmatched rows under right/full outer joins; use one of {sorted(allowed)}"
        )
    salt_cols = salt_cols or [c for c in big.columns if c not in keys][:1] or keys
    big_s = big.withColumn("_salt", _salt(salt_cols, buckets))
    small_r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<long>"))
    )
    out = big_s.join(small_r, [*keys, "_salt"], how)
    return out.drop("_salt")
