from farmrpg_etl_spark.functions import hashing, text, vectors

__all__ = ["text", "hashing", "vectors"]
