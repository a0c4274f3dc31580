from imp_etl_spark.functions import cleanse, hashing, text, vector

__all__ = ["cleanse", "hashing", "text", "vector"]
