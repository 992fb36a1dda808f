from nano_vectordb_rs_spark.sources.tables import TABLES, load_table

__all__ = ["TABLES", "load_table"]
