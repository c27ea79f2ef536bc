"""Resume-from-checkpoint: kill after epoch k (including torn epochs whose
data writes landed but whose manifest append did not), restart, and the final
state must equal an uninterrupted run (FIXTURES.md §5 resume fixture)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wage_etl_spark.lake.manifest import last_committed_epoch, next_run_id
from wage_etl_spark.sources.events import EpochSource
from wage_etl_spark.sources.synth import synthesize_events
from wage_etl_spark.streaming.replay import (
    ReplayConfig, apply_epoch, open_tables, replay, verify_state,
)

from tests.oracle import replay_oracle, sha_map

SYNTH = dict(n_events=2000, n_keys=120, n_epochs=4, invalid_frac=0.03)


def _final(spark, warehouse, tag):
    cfg = ReplayConfig(warehouse=f"{warehouse}/{tag}", num_buckets=8)
    return cfg


def test_resume_after_clean_stop(spark, warehouse):
    ev = synthesize_events(spark, **SYNTH)
    src = EpochSource(ev)

    cfg = _final(spark, warehouse, "resumed")
    # stop after 2 epochs, then resume
    replay(spark, cfg, src) if False else None
    partial = replay(spark, ReplayConfig(cfg.warehouse, num_buckets=8, max_epochs=2), src)
    assert [r["epoch"] for r in partial] == [0, 1]
    resumed = replay(spark, cfg, src)
    assert [r["epoch"] for r in resumed] == [2, 3]

    oracle_state, *_ = replay_oracle([r.asDict() for r in ev.collect()])
    target, dlq, manifest = open_tables(spark, cfg)
    assert verify_state(spark, target, sha_map(oracle_state))["equal"]


def test_resume_after_torn_epoch(spark, warehouse):
    """Simulate a crash between the data writes and the manifest append:
    epoch 2's DLQ append + MERGE land, manifest row does not. Resume must
    roll the orphan snapshots back and re-run epoch 2 exactly once."""
    ev = synthesize_events(spark, **SYNTH)
    src = EpochSource(ev)

    cfg = _final(spark, warehouse, "torn")
    replay(spark, ReplayConfig(cfg.warehouse, num_buckets=8, max_epochs=2), src)
    target, dlq, manifest = open_tables(spark, cfg)

    # torn epoch 2: do the data writes by hand, skip the manifest append
    from wage_etl_spark.operators.dedup_lww import dedup_lww
    from wage_etl_spark.operators.merge import merge_apply
    from wage_etl_spark.operators.validate import validate_events

    e2 = src.epoch(2)
    valid, quarantined = validate_events(e2, run_id=99)
    dlq.append(
        quarantined.withColumn("epoch", F.lit(2).cast("long")), properties={"epoch": "2"}
    )
    winners = dedup_lww(valid, ["repo", "path"], ["commit", "event_seq"])
    payload = (
        winners.withColumn("content_sha256", F.sha2(F.col("content"), 256))
        .withColumn("epoch", F.lit(2).cast("long"))
        .withColumn("run_id", F.lit(99).cast("long"))
        .withColumn("load_timestamp", F.current_timestamp())
    )
    merge_apply(target, payload, ["commit", "event_seq"], properties={"epoch": "2"})

    assert last_committed_epoch(manifest) == 1  # manifest never saw epoch 2
    torn_target_version = target.current_version()

    # resume: must roll back the torn snapshots and re-run epochs 2..3
    resumed = replay(spark, cfg, src)
    assert [r["epoch"] for r in resumed] == [2, 3]
    target2, dlq2, manifest2 = open_tables(spark, cfg)
    hist_ops = [s.operation for s in target2.history()]
    assert "rollback" in hist_ops

    oracle_state, n_valid, n_quar = replay_oracle([r.asDict() for r in ev.collect()])
    assert verify_state(spark, target2, sha_map(oracle_state))["equal"]
    # DLQ was not double-appended for the torn epoch
    assert dlq2.read().count() == n_quar


def test_uninterrupted_equals_resumed(spark, warehouse):
    ev = synthesize_events(spark, **SYNTH)
    src = EpochSource(ev)

    cfg_a = _final(spark, warehouse, "straight")
    replay(spark, cfg_a, src)
    cfg_b = _final(spark, warehouse, "chunked")
    for _ in range(4):
        replay(spark, ReplayConfig(cfg_b.warehouse, num_buckets=8, max_epochs=1), src)

    ta, *_ = open_tables(spark, cfg_a)
    tb, *_ = open_tables(spark, cfg_b)
    cols = ["repo", "path", "commit", "event_seq", "lang", "content", "content_sha256", "epoch"]
    sa = {tuple(r) for r in ta.read().select(*cols).collect()}
    sb = {tuple(r) for r in tb.read().select(*cols).collect()}
    assert sa == sb
