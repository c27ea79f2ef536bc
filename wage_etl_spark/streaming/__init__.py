from wage_etl_spark.streaming.replay import replay, verify_state, ReplayConfig

__all__ = ["replay", "verify_state", "ReplayConfig"]
