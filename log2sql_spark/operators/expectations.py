"""Declarative data-quality expectations (constraint checking).

The pre-flight gate a pipeline runs before trusting a table: a rule set
(NOT NULL, uniqueness, domain membership, value ranges, regex shape,
referential integrity, arbitrary boolean conditions) compiled into as
few Spark jobs as the rule mix allows:

- every ROW-LEVEL rule (not_null / in_set / between / regex / custom
  condition) becomes one conditional ``sum`` in a SINGLE aggregate over
  one scan of the table — adding rules does not add passes;
- ``unique`` needs its own keyed aggregate (count>1 groups);
- ``foreign_key`` is a broadcast left-anti join against the (small)
  dimension — at 100 TB the fact table streams map-side, the dim ships
  once per executor.

Violation counts, not samples: the report is a fixed-size DataFrame
(one row per rule) regardless of table size, so it is safe to collect,
alert on, or append to a quality-history table every pipeline run.

Reference analog: the reference validates its inputs ad hoc
(``main.py:9-14`` datetime checks, ``log2sql.py:29-46`` schema probes);
this operator is that idea generalized into a reusable, declarative
surface.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One expectation. ``kind`` selects the check; fields are by kind."""

    name: str
    kind: str  # not_null | in_set | between | regex | condition | unique | foreign_key
    column: str | None = None
    columns: tuple[str, ...] = ()
    values: tuple = ()
    lo: object = None
    hi: object = None
    pattern: str | None = None
    condition: Column | None = field(default=None, compare=False)
    # foreign_key only:
    ref: DataFrame | None = field(default=None, compare=False)
    ref_column: str | None = None


def not_null(name: str, column: str) -> Rule:
    return Rule(name=name, kind="not_null", column=column)


def in_set(name: str, column: str, values) -> Rule:
    return Rule(name=name, kind="in_set", column=column, values=tuple(values))


def between(name: str, column: str, lo, hi) -> Rule:
    return Rule(name=name, kind="between", column=column, lo=lo, hi=hi)


def matches(name: str, column: str, pattern: str) -> Rule:
    return Rule(name=name, kind="regex", column=column, pattern=pattern)


def condition(name: str, cond: Column) -> Rule:
    """Rows where ``cond`` is FALSE or NULL count as violations."""
    return Rule(name=name, kind="condition", condition=cond)


def unique(name: str, *columns: str) -> Rule:
    return Rule(name=name, kind="unique", columns=tuple(columns))


def foreign_key(name: str, column: str, ref: DataFrame, ref_column: str) -> Rule:
    return Rule(name=name, kind="foreign_key", column=column, ref=ref, ref_column=ref_column)


def _row_violation(rule: Rule) -> Column:
    """Boolean column: TRUE iff the row violates the rule."""
    c = F.col(rule.column) if rule.column else None
    if rule.kind == "not_null":
        return c.isNull()
    if rule.kind == "in_set":
        # NULL is a domain violation too: NOT IN(NULL) is NULL, coalesce it.
        return ~F.coalesce(c.isin(*rule.values), F.lit(False))
    if rule.kind == "between":
        return ~F.coalesce(c.between(F.lit(rule.lo), F.lit(rule.hi)), F.lit(False))
    if rule.kind == "regex":
        return ~F.coalesce(c.rlike(rule.pattern), F.lit(False))
    if rule.kind == "condition":
        return ~F.coalesce(rule.condition, F.lit(False))
    raise ValueError(f"not a row-level rule: {rule.kind}")


def check_expectations(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule; return one row per rule:
    (rule, violations, rows_checked, passed)."""
    spark = df.sparkSession
    row_rules = [r for r in rules if r.kind in
                 ("not_null", "in_set", "between", "regex", "condition")]
    reports: list[DataFrame] = []

    if row_rules:
        agg = df.agg(
            F.count(F.lit(1)).alias("__n"),
            *[
                F.sum(_row_violation(r).cast("long")).alias(f"__v{i}")
                for i, r in enumerate(row_rules)
            ],
        )
        # One row in, |rules| rows out: stack the conditional sums.
        stacked = agg.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r.name).alias("rule"),
                            F.coalesce(F.col(f"__v{i}"), F.lit(0)).alias("violations"),
                            F.col("__n").alias("rows_checked"),
                        )
                        for i, r in enumerate(row_rules)
                    ]
                )
            ).alias("s")
        ).select("s.*")
        reports.append(stacked)

    for r in rules:
        if r.kind == "unique":
            keyed = df.groupBy(*r.columns).agg(F.count(F.lit(1)).alias("cnt"))
            rep = keyed.agg(
                F.lit(r.name).alias("rule"),
                # excess rows beyond the first per duplicated key
                F.coalesce(
                    F.sum(F.when(F.col("cnt") > 1, F.col("cnt") - 1)), F.lit(0)
                ).cast("long").alias("violations"),
                F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("rows_checked"),
            )
            reports.append(rep)
        elif r.kind == "foreign_key":
            dim = r.ref.select(F.col(r.ref_column).alias(r.column)).distinct()
            orphans = df.join(F.broadcast(dim), on=r.column, how="left_anti")
            rep = df.agg(F.count(F.lit(1)).cast("long").alias("rows_checked")).crossJoin(
                orphans.agg(F.count(F.lit(1)).cast("long").alias("violations"))
            ).select(
                F.lit(r.name).alias("rule"), "violations", "rows_checked"
            )
            reports.append(rep)

    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out.select(
        "rule",
        "violations",
        "rows_checked",
        (F.col("violations") == 0).cast("int").alias("passed"),
    ).orderBy("rule")
