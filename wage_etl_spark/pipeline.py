"""Top-level public API — mirrors the reference's package exports
(/root/reference/src/extract/__init__.py:19-35, src/transform/__init__.py:35-58,
src/load/__init__.py:72-87) per SURVEY.md §7.5."""

from __future__ import annotations

from wage_etl_spark.lake.manifest import (
    commit_epoch,
    epoch_status,
    last_committed_epoch,
    next_run_id,
)
from wage_etl_spark.lake.table import LakeTable
from wage_etl_spark.operators.dedup_lww import dedup_lww
from wage_etl_spark.operators.merge import merge_apply
from wage_etl_spark.operators.validate import validate_events
from wage_etl_spark.session import get_spark
from wage_etl_spark.sources.events import EpochSource
from wage_etl_spark.sources.synth import synthesize_events, synthesize_repos
from wage_etl_spark.streaming.replay import (
    ReplayConfig,
    apply_epoch,
    open_tables,
    reference_state,
    replay,
    verify_state,
)

__all__ = [
    # extract analog
    "synthesize_repos",
    "synthesize_events",
    "EpochSource",
    # validate/transform analog
    "validate_events",
    "dedup_lww",
    # load analog
    "merge_apply",
    "LakeTable",
    # run tracking analog
    "commit_epoch",
    "last_committed_epoch",
    "next_run_id",
    "epoch_status",
    # orchestration
    "get_spark",
    "ReplayConfig",
    "apply_epoch",
    "open_tables",
    "replay",
    "reference_state",
    "verify_state",
]
