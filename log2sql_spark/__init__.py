"""log2sql_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference
``database-on-line/log2sql`` (an offline MySQL-binlog → replay/flashback
SQL converter; see SURVEY.md), re-expressed Spark-first:

* the CDC surface (binlog text → change-event envelope → replay /
  flashback SQL) as DataFrame transforms over ``spark.read`` /
  ``readStream`` sources (reference: ``log2sql.py:66-108``, ``log2sql.py:135-185``);
* a full relational operator library (joins, aggregations, windows,
  set-ops, scalar functions) that the 305-line reference implies but
  delegates to MySQL — here expressed on the DataFrame/SQL API so
  Catalyst/Tungsten plan and execute them;
* large-scale training-data pipeline operators (dedup, similarity
  search, text analysis, multimodal columns) designed for 100 TB scale.

Everything is declarative DataFrame/SQL; Python crosses into the data
path only via Arrow-batched pandas UDFs where Spark lacks a builtin.
"""

from log2sql_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
