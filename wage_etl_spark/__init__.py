"""wage_etl_spark — a PySpark-native CDC / incremental-ingest engine.

Re-expresses the data-processing contract of the reference Wage-ETL pipeline
(extract -> validate -> quarantine -> last-writer-wins upsert -> run manifest;
see /root/reference/main.py:32-135) as a distributed change-data-capture
replay into snapshot-versioned lake tables:

- change events keyed by (repo, path), ordered by (commit, event_seq)
- vectorized validation with dead-letter quarantine
  (reference: src/transform/models.py:9-87, src/load/staging.py:109-159)
- LWW dedup + MERGE-apply (reference: src/load/staging.py:50-59 ON CONFLICT)
- exactly-once commit epochs with a checkpoint manifest
  (reference: src/load/run_tracker.py:13-76)

Everything is DataFrame-first: Catalyst plans the joins/aggregations; Python
only orchestrates epochs and the snapshot-commit protocol.
"""

from wage_etl_spark.session import get_spark
from wage_etl_spark.lake.table import LakeTable
from wage_etl_spark.operators.dedup_lww import dedup_lww
from wage_etl_spark.operators.validate import validate_events
from wage_etl_spark.streaming.replay import replay, verify_state

__all__ = [
    "get_spark",
    "LakeTable",
    "dedup_lww",
    "validate_events",
    "replay",
    "verify_state",
]

__version__ = "0.1.0"
