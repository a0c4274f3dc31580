from imp_etl_spark.sources.parquet import load_fixtures, read_table

__all__ = ["read_table", "load_fixtures"]
