from wage_etl_spark.functions import cleaning, hashing, text

__all__ = ["cleaning", "hashing", "text"]
