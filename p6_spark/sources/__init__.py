from p6_spark.sources.tables import HARNESS_TABLES, load_table, load_tables, register_views

__all__ = ["HARNESS_TABLES", "load_table", "load_tables", "register_views"]
