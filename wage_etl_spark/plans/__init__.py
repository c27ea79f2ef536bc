from wage_etl_spark.plans.lint import assert_plan, plan_report

__all__ = ["assert_plan", "plan_report"]
