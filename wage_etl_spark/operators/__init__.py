from wage_etl_spark.operators.dedup_lww import dedup_lww, dedup_lww_window
from wage_etl_spark.operators.validate import validate_events, violation_rules
from wage_etl_spark.operators.merge import merge_apply

__all__ = [
    "dedup_lww",
    "dedup_lww_window",
    "validate_events",
    "violation_rules",
    "merge_apply",
]
