from imp_etl_spark.streaming import log_stream, windows

__all__ = ["log_stream", "windows"]
