from hive_metadata_collect_spark.sources.fixtures import TABLES, load_table

__all__ = ["TABLES", "load_table"]
