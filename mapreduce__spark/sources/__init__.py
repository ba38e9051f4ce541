from mapreduce__spark.sources.tables import TABLES, ensure_parallelism, load_table, load_tables

__all__ = ["TABLES", "ensure_parallelism", "load_table", "load_tables"]
