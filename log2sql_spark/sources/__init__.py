"""Sources: testdata star-schema tables, binlog text scans, catalogs."""

from log2sql_spark.sources.tables import load_table, load_tables, register_views  # noqa: F401
