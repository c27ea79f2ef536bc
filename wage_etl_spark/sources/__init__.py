from wage_etl_spark.sources.synth import synthesize_repos, synthesize_events

__all__ = ["synthesize_repos", "synthesize_events"]
