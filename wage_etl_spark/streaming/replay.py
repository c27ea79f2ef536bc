"""Epoch-replay orchestrator: exactly-once CDC apply with resume.

The top-level `replay()` is the analog of the reference's per-state pipeline
(/root/reference/main.py:32-135): for each commit epoch it validates, routes
rejects to the DLQ, LWW-dedups, MERGE-applies into the target LakeTable, and
finalizes the checkpoint manifest — in that order, because the manifest append
is the commit point.

Exactly-once protocol (SURVEY.md §7.2 step 6):
  - every snapshot a given epoch produces (DLQ append, target merge, manifest
    append) is tagged with properties={"epoch": e} (WAP-style).
  - resume: last committed epoch L = newest manifest summary row. Any DLQ /
    target snapshots tagged with epoch > L are orphans of a crashed epoch:
    roll both tables back to their newest snapshot with epoch <= L, then
    re-run from L+1. Re-running an epoch is deterministic (same winners, same
    bytes) so the observable final state equals an uninterrupted run.
"""

from __future__ import annotations

import datetime as _dt
import logging
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)

from wage_etl_spark.lake.manifest import (
    commit_epoch, create_manifest, epoch_status, last_committed_epoch, next_run_id,
)
from wage_etl_spark.lake.table import LakeTable, bucket_expr
from wage_etl_spark.operators.dedup_lww import dedup_lww
from wage_etl_spark.operators.merge import merge_apply
from wage_etl_spark.operators.validate import validate_events

log = logging.getLogger("wage_etl_spark.replay")

KEY_COLS = ["repo", "path"]
ORDERING_COLS = ["commit", "event_seq"]

TARGET_SCHEMA = StructType(
    [
        StructField("repo", StringType()),
        StructField("path", StringType()),
        StructField("commit", StringType()),
        StructField("event_seq", LongType()),
        StructField("lang", StringType()),
        StructField("content", StringType()),
        StructField("content_sha256", StringType()),
        StructField("epoch", LongType()),
        StructField("run_id", LongType()),
        StructField("load_timestamp", TimestampType()),
    ]
)

DLQ_SCHEMA = StructType(
    [
        StructField("run_id", LongType()),
        StructField("raw_data", StringType()),
        StructField("rejection_reason", StringType()),
        StructField("reject_timestamp", TimestampType()),
        StructField("epoch", LongType()),
    ]
)


@dataclass
class ReplayConfig:
    warehouse: str
    num_buckets: int = 32
    salt_buckets: int = 0  # >0 enables two-phase salted LWW for hot keys
    max_epochs: int | None = None
    extra: dict = field(default_factory=dict)


def open_tables(spark: SparkSession, cfg: ReplayConfig) -> tuple[LakeTable, LakeTable, LakeTable]:
    target = LakeTable(spark, os.path.join(cfg.warehouse, "repo_code"))
    dlq = LakeTable(spark, os.path.join(cfg.warehouse, "dlq"))
    manifest = LakeTable(spark, os.path.join(cfg.warehouse, "manifest"))
    if not target.exists():
        target = LakeTable.create(
            spark, target.root, TARGET_SCHEMA, key_cols=KEY_COLS, num_buckets=cfg.num_buckets
        )
    if not dlq.exists():
        dlq = LakeTable.create(spark, dlq.root, DLQ_SCHEMA, key_cols=["epoch"], num_buckets=1)
    if not manifest.exists():
        manifest = create_manifest(spark, manifest.root)
    return target, dlq, manifest


def _rollback_orphans(table: LakeTable, last_epoch: int) -> None:
    """Drop snapshots from crashed (uncommitted) epochs."""
    cur = table.snapshot()
    cur_epoch = int(cur.properties.get("epoch", -1))
    if cur_epoch <= last_epoch:
        return
    good = table.latest_version_where(
        lambda p: int(p.get("epoch", -1)) <= last_epoch
    )
    if good is not None and good != cur.version:
        log.warning("rolling back %s to v%s (orphan epoch %s)", table.root, good, cur_epoch)
        table.rollback_to(good, properties={"epoch": str(last_epoch)})


def apply_epoch(
    spark: SparkSession,
    cfg: ReplayConfig,
    target: LakeTable,
    dlq: LakeTable,
    manifest: LakeTable,
    events: DataFrame,
    epoch: int,
    run_id: int,
) -> dict:
    """Validate -> DLQ -> LWW dedup -> MERGE -> manifest, one epoch."""
    start_ts = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
    ev = events.persist()
    try:
        events_in = ev.count()
        valid, quarantined = validate_events(ev, run_id=run_id)

        q = quarantined.withColumn("epoch", F.lit(epoch).cast("long"))
        dlq.append(q, properties={"epoch": str(epoch)})
        n_quarantined = dlq.read().filter(
            (F.col("epoch") == epoch) & (F.col("run_id") == run_id)
        ).count()
        n_valid = events_in - n_quarantined

        winners = dedup_lww(valid, KEY_COLS, ORDERING_COLS, salt_buckets=cfg.salt_buckets)
        payload = (
            winners.withColumn("content_sha256", F.sha2(F.col("content"), 256))
            .withColumn("epoch", F.lit(epoch).cast("long"))
            .withColumn("run_id", F.lit(run_id).cast("long"))
            .withColumn("load_timestamp", F.current_timestamp())
        )
        # per-bucket lineage counts (<= num_buckets rows collected)
        pc_rows = (
            payload.withColumn("_b", bucket_expr(KEY_COLS, target.snapshot().num_buckets))
            .groupBy("_b").count().collect()
        )
        partition_counts = {int(r["_b"]): int(r["count"]) for r in pc_rows}

        snap, rows_written = merge_apply(
            target, payload, ordering_cols=ORDERING_COLS, op_col="op",
            properties={"epoch": str(epoch)},
        )
        status = epoch_status(events_in, n_valid, n_quarantined)
        end_ts = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
        commit_epoch(
            manifest,
            epoch=epoch, run_id=run_id, status=status, events_in=events_in,
            rows_merged=rows_written, rows_quarantined=n_quarantined,
            snapshot_id=snap.version, start_ts=start_ts, end_ts=end_ts,
            partition_counts=partition_counts,
        )
        return {
            "epoch": epoch, "status": status, "events_in": events_in,
            "valid": n_valid, "quarantined": n_quarantined,
            "rows_written": rows_written, "snapshot": snap.version,
        }
    finally:
        ev.unpersist()


def replay(spark: SparkSession, cfg: ReplayConfig, source) -> list[dict]:
    """Replay all epochs from the source, resuming after the last committed
    epoch. ``source`` is a sources.events.EpochSource (or anything with
    ``max_epoch()`` and ``epoch(e)``)."""
    target, dlq, manifest = open_tables(spark, cfg)
    last = last_committed_epoch(manifest)
    _rollback_orphans(target, last)
    _rollback_orphans(dlq, last)
    run_id = next_run_id(manifest)

    results = []
    stop = source.max_epoch()
    if cfg.max_epochs is not None:
        stop = min(stop, last + cfg.max_epochs)
    for e in range(last + 1, stop + 1):
        res = apply_epoch(spark, cfg, target, dlq, manifest, source.epoch(e), e, run_id)
        log.info("epoch %s: %s", e, res)
        results.append(res)
    return results


def verify_state(spark: SparkSession, target: LakeTable, oracle_state: dict) -> dict:
    """Per-row sha256(content) equality vs the oracle replay (BASELINE.json
    invariant). ``oracle_state`` maps (repo, path) -> sha256 hex. Comparison
    happens driver-side only after both sides are reduced to key->hash maps."""
    rows = target.read().select("repo", "path", "content_sha256").collect()
    engine = {(r["repo"], r["path"]): r["content_sha256"] for r in rows}
    missing = {k: v for k, v in oracle_state.items() if k not in engine}
    extra = {k: v for k, v in engine.items() if k not in oracle_state}
    mismatched = {
        k: (oracle_state[k], engine[k])
        for k in oracle_state.keys() & engine.keys()
        if oracle_state[k] != engine[k]
    }
    return {
        "equal": not (missing or extra or mismatched),
        "engine_rows": len(engine),
        "oracle_rows": len(oracle_state),
        "missing": missing,
        "extra": extra,
        "mismatched": mismatched,
    }
