from automem_spark.sources.tables import TABLES, load_table, memories_view

__all__ = ["TABLES", "load_table", "memories_view"]
