"""typed_view: pivot the stringly CDC envelope into typed columns.

SURVEY.md §1.2's planned operator: the envelope carries
``map<string,string>`` images (schema-on-read, any table); once the
table is known, the map pivots into real typed columns using a type
spec — making the change stream queryable like the table itself.

Value tokens come from mysqlbinlog dumps: numbers bare, strings/dates
single-quoted, NULL literal. ``_untoken`` strips the quoting, then a
cast to the declared type. All JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _untoken(raw: Column) -> Column:
    """Raw dump token → plain string or NULL ('NULL' literal, quotes,
    escaped quotes)."""
    unquoted = F.when(
        raw.rlike("^'.*'$"),
        F.regexp_replace(F.regexp_extract(raw, "^'(.*)'$", 1), r"\\'", "'"),
    ).otherwise(raw)
    return F.when(raw == "NULL", F.lit(None).cast("string")).otherwise(unquoted)


def typed_view(
    resolved: DataFrame,
    column_types: dict[str, str],
    image: str = "after",
) -> DataFrame:
    """Envelope → one typed column per catalog column, from the chosen
    image (``after`` for the post-change row, ``before`` for the
    pre-change row). Keeps op/position/timestamp alongside.

    ``column_types``: column name → Spark SQL type string
    (e.g. ``{"o_orderkey": "bigint", "o_orderdate": "timestamp"}``).
    """
    cols = [
        _untoken(F.element_at(F.col(image), name)).cast(typ).alias(name)
        for name, typ in column_types.items()
    ]
    return resolved.select(
        "op", "db", "table", "start_pos", "stop_pos", "event_ts", *cols
    )
