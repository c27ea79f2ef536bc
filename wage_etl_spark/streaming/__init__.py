from wage_etl_spark.streaming.replay import replay, reference_state, verify_state, ReplayConfig

__all__ = ["replay", "reference_state", "verify_state", "ReplayConfig"]
