"""Structured Streaming front-end: stream the event log with
maxFilesPerTrigger, foreachBatch -> apply_epoch; final state equals a batch
replay of the same events; restarting the stream is a no-op."""

from __future__ import annotations

import os

from wage_etl_spark.sources.synth import synthesize_events
from wage_etl_spark.streaming.replay import ReplayConfig, open_tables, verify_state
from wage_etl_spark.streaming.structured import start_stream, stream_events

from tests.oracle import replay_oracle_global, sha_map


def _write_stream_files(spark, ev, path, n_files=4):
    # several files so maxFilesPerTrigger yields multiple micro-batches
    ev.repartition(n_files).write.mode("overwrite").parquet(path)


def test_stream_replay_matches_oracle(spark, tmp_path):
    ev = synthesize_events(spark, n_events=2000, n_keys=150, n_epochs=1, invalid_frac=0.04)
    events_dir = str(tmp_path / "events")
    _write_stream_files(spark, ev, events_dir)

    # micro-batch boundaries are arbitrary file groupings (out of version
    # order), so the target must keep tombstones: a late lower-version event
    # must not resurrect a deleted key
    cfg = ReplayConfig(warehouse=str(tmp_path / "wh"), num_buckets=8, keep_tombstones=True)
    schema = spark.read.parquet(events_dir).schema
    stream = stream_events(spark, events_dir, schema, max_files_per_trigger=2)
    q = start_stream(spark, cfg, stream, str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    # order-independent oracle: global max-version winner per key
    rows = [r.asDict() for r in ev.collect()]
    oracle_state, n_valid, n_quar = replay_oracle_global(rows)
    target, dlq, manifest = open_tables(spark, cfg)
    assert verify_state(spark, target, sha_map(oracle_state))["equal"]
    assert dlq.read().count() == n_quar
    # multiple micro-batches were committed
    assert manifest.read().filter("partition_id is null").count() >= 2


def test_stream_restart_is_noop(spark, tmp_path):
    ev = synthesize_events(spark, n_events=500, n_keys=50, n_epochs=1, invalid_frac=0.0)
    events_dir = str(tmp_path / "events")
    _write_stream_files(spark, ev, events_dir, n_files=2)
    cfg = ReplayConfig(warehouse=str(tmp_path / "wh"), num_buckets=4)
    schema = spark.read.parquet(events_dir).schema

    q = start_stream(spark, cfg, stream_events(spark, events_dir, schema), str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    target, _, manifest = open_tables(spark, cfg)
    v1 = target.current_version()

    q2 = start_stream(spark, cfg, stream_events(spark, events_dir, schema), str(tmp_path / "ckpt"))
    q2.awaitTermination(300)
    assert target.current_version() == v1  # nothing re-applied
