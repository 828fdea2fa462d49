"""Distributed exact global ranking — ntile/row_number without the
single-partition window.

``Window.orderBy(...)`` with no partition spec is the one construct in
a Spark plan that cannot scale: Catalyst plans it as ``Exchange
SinglePartition`` + one task sorting every input row. For corpus-level
order statistics (ntile segmentation, exact quantile picks, gains
curves) the suite instead decomposes the global rank:

    rank(row) = base_rank(group(row)) + row_number within group(row)

where ``group`` is any order-embedding of the sort key (the key itself,
or a coarser monotone bucket like ``day(ts)``). The per-group
row_number is a PARTITIONED window (scales with the group, not the
corpus), and the base ranks come from a cumulative count over the
DISTINCT group values — a relation bounded by key cardinality (word
counts, day buckets, integer latencies), never by row count. ntile's
bucket arithmetic is then a closed-form integer CASE over the rank
((N mod n) leading buckets get one extra row — the exact semantics of
``F.ntile``), so the result is bit-identical to the single-window form
the DuckDB oracles run.

First proven by ``quality_classifier_gains_deciles`` (r12); factored
here in r14 so the RFM / uplift / funnel-quantile family shares one
audited implementation. Reference analog: none — the reference
(``log2sql.py``, 188 lines) has no ranking operators; this is the
extension surface (SURVEY.md §2.2 C7/C8).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["distributed_global_rank", "ntile_from_rank"]


def distributed_global_rank(
    df: DataFrame,
    score_col: str,
    tie_cols: list,
    *,
    descending: bool = False,
    coarse: Column | None = None,
    out: str = "rank",
) -> DataFrame:
    """Exact global ``row_number() OVER (ORDER BY score [DESC], *ties)``
    as a new ``out`` column, computed without any single-partition stage
    over data-proportional rows.

    ``tie_cols`` (strings → ascending, or explicit sort Columns like
    ``F.desc(...)``) must make the order total (a unique tie-break), or
    the assignment is engine-dependent — same contract as every ntile in
    the suite. ``coarse``, when given, must be a monotone non-decreasing
    function of ``score_col`` (an order-embedding: x <= y implies
    g(x) <= g(y)); use it when the score itself is near-unique (e.g.
    timestamps → ``F.to_date(...)``, byte positions → fixed-size block
    numbers) so the distinct-group relation the cumulative pass runs
    over stays cardinality-bounded.

    Plan shape: one count aggregate over distinct groups, one cumulative
    window over those |groups| (key-cardinality) rows, one partitioned
    row_number, one broadcast join. No Exchange SinglePartition anywhere
    above row data.
    """
    group_expr = coarse if coarse is not None else F.col(score_col)
    tagged = df.withColumn("__g", group_expr)
    grp = tagged.groupBy("__g").agg(F.count(F.lit(1)).alias("__cnt"))
    w_cum = Window.orderBy(F.desc("__g") if descending else F.asc("__g")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    base = grp.select(
        "__g", F.coalesce(F.sum("__cnt").over(w_cum), F.lit(0)).alias("__base")
    )
    in_order = [F.desc(score_col) if descending else F.asc(score_col)]
    in_order += [F.asc(c) if isinstance(c, str) else c for c in tie_cols]
    w_in = Window.partitionBy("__g").orderBy(*in_order)
    return (
        tagged.withColumn("__rn", F.row_number().over(w_in))
        .join(F.broadcast(base), "__g")
        .withColumn(out, (F.col("__base") + F.col("__rn")).cast("long"))
        .drop("__g", "__rn", "__base")
    )


def ntile_from_rank(rank: Column, n_total: Column, n: int) -> Column:
    """``ntile(n)`` bucket for a 1-based global ``rank`` out of
    ``n_total`` rows, as a closed-form integer expression: with
    N = q*n + r, the first r buckets hold q+1 rows (Spark's and
    DuckDB's shared ntile semantics). When N < n the otherwise-branch
    divides by q = 0 — unreachable (every rank is <= cut) and null-safe
    under Spark's non-ANSI integer division, matching the
    gains-deciles precedent."""
    q = (n_total / n).cast("long")
    r = n_total % n
    cut = (q + 1) * r
    return F.when(rank <= cut, F.ceil(rank / (q + 1))).otherwise(
        r + F.ceil((rank - cut) / q)
    ).cast("long")
