"""Sources & sinks (the reference delegates these to host Impala; here they
are Spark's built-in readers, wrapped for the test star schema)."""

from rocana_impala_udfs_spark.sources.io import TABLES, load_table, load_tables, register_temp_views

__all__ = ["TABLES", "load_table", "load_tables", "register_temp_views"]
