"""Plan-shaping utilities: parallelism spreading, plan inspection."""

from implementation_of_an_etl_process_spark.plans.shape import spread, explain_str

__all__ = ["spread", "explain_str"]
