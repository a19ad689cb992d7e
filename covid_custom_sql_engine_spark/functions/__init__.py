from covid_custom_sql_engine_spark.functions import text, dedup, similarity

__all__ = ["text", "dedup", "similarity"]
