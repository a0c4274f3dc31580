from imp_etl_spark.plans import pipeline, runner, upsert

__all__ = ["pipeline", "runner", "upsert"]
