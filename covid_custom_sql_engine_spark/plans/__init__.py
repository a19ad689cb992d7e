from covid_custom_sql_engine_spark.plans.listener import ExecutionLog, timed_action

__all__ = ["ExecutionLog", "timed_action"]
