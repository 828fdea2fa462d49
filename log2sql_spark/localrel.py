"""Small local relations as JVM ``VALUES`` literals.

``spark.createDataFrame(rows)`` plans a *pickled Python RDD* (``Scan
ExistingRDD``): every execution that touches the little table — a
broadcast dim side, a query-term list, a BFS seed — first runs a
Python-worker job just to deserialize a handful of rows. Rendering the
same rows as a SQL ``VALUES`` literal yields a ``LocalTableScan``
(guide §4: eliminate the JVM<->Python boundary), which costs nothing
per execution and broadcasts without scheduling a Python stage.

Only the literal shapes the query paths actually use are supported:
str, bool, int, float, None, datetime.date, and flat arrays thereof.
Anything else should keep using ``createDataFrame``.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return repr(v) + "D"  # repr round-trips float64 exactly
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            raise TypeError("values_df: tz-aware datetimes unsupported")
        return f"TIMESTAMP'{v.strftime('%Y-%m-%d %H:%M:%S.%f')}'"
    if isinstance(v, datetime.date):
        return f"DATE'{v.isoformat()}'"
    if isinstance(v, (list, tuple)):
        return "array(" + ", ".join(_lit(x) for x in v) + ")"
    raise TypeError(f"values_df: unsupported literal {type(v).__name__}")


def values_df(spark: SparkSession, rows: list, schema: str) -> DataFrame:
    """Build a DataFrame from in-memory rows as a pure-JVM
    ``LocalTableScan``. ``schema`` is a DDL string (``"a long, b
    string"``); every column is cast to its declared type so NULLs and
    empty arrays land with the right type. Empty ``rows`` falls back to
    ``createDataFrame`` (no VALUES syntax for zero rows)."""
    struct = T.StructType.fromDDL(schema)
    if not rows:
        return spark.createDataFrame([], struct)
    names = [f.name for f in struct.fields]
    rendered = ", ".join(
        "(" + ", ".join(_lit(v) for v in row) + ")" for row in rows
    )
    df = spark.sql(
        "SELECT * FROM VALUES " + rendered + " AS t(" + ", ".join(names) + ")"
    )
    return df.select(
        *[
            F.col(f.name).cast(f.dataType).alias(f.name)
            for f in struct.fields
        ]
    )
