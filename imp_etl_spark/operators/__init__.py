from imp_etl_spark.operators import agg, dedup, join, similarity, skew, window

__all__ = ["agg", "dedup", "join", "similarity", "skew", "window"]
