"""LWW dedup: argmax vs window parity, salting correctness, tie handling."""

from __future__ import annotations

from pyspark.sql import functions as F

from wage_etl_spark.operators.dedup_lww import dedup_lww, dedup_lww_window
from wage_etl_spark.sources.synth import synthesize_events

KEYS = ["repo", "path"]
ORDER = ["commit", "event_seq"]


def _as_set(df):
    return {
        (r["repo"], r["path"], r["commit"], r["event_seq"], r["op"])
        for r in df.select("repo", "path", "commit", "event_seq", "op").collect()
    }


def test_argmax_equals_window(spark):
    ev = synthesize_events(spark, n_events=3000, n_keys=120, n_epochs=1, invalid_frac=0.0)
    a = dedup_lww(ev, KEYS, ORDER)
    w = dedup_lww_window(ev, KEYS, ORDER)
    assert _as_set(a) == _as_set(w)
    assert a.count() == a.select(*KEYS).distinct().count()


def test_salted_equals_unsalted(spark):
    ev = synthesize_events(spark, n_events=3000, n_keys=50, n_epochs=1, invalid_frac=0.0)
    plain = dedup_lww(ev, KEYS, ORDER, salt_buckets=0)
    salted = dedup_lww(ev, KEYS, ORDER, salt_buckets=7)
    assert _as_set(plain) == _as_set(salted)


def test_winner_is_max_version(spark):
    df = spark.createDataFrame(
        [
            ("r", "p", "a" * 40, 1, "I", "v1"),
            ("r", "p", "b" * 40, 2, "U", "v2"),
            ("r", "p", "b" * 40, 3, "U", "v3"),  # same commit, later seq wins
            ("r", "q", "a" * 40, 4, "I", "w1"),
        ],
        "repo string, path string, commit string, event_seq long, op string, content string",
    )
    out = {(r["path"], r["content"]) for r in dedup_lww(df, KEYS, ORDER).collect()}
    assert out == {("p", "v3"), ("q", "w1")}


def test_duplicate_identical_events_collapse(spark):
    df = spark.createDataFrame(
        [("r", "p", "a" * 40, 1, "I", "x")] * 3,
        "repo string, path string, commit string, event_seq long, op string, content string",
    )
    assert dedup_lww(df, KEYS, ORDER).count() == 1


def test_columns_preserved(spark):
    ev = synthesize_events(spark, n_events=100, n_keys=10, n_epochs=1)
    out = dedup_lww(ev, KEYS, ORDER)
    assert out.columns == ev.columns


def test_argmax_plan_has_partial_aggregate(spark):
    """Scale guard: the LWW dedup must plan as partial+final aggregation
    (map-side combine collapses duplicate keys BEFORE the shuffle — at
    10^10 events this is the difference between shuffling one row per
    (key, map partition) and shuffling everything), and must not fall back
    to a Window sort (no partial reduction at all)."""
    ev = synthesize_events(spark, n_events=100, n_keys=10, n_epochs=1)
    plan = dedup_lww(ev, KEYS, ORDER)._jdf.queryExecution().sparkPlan().toString()
    assert "partial_max" in plan
    assert "Window" not in plan


def test_operator_cache_registry_releases(spark):
    """Operators register their persists; release_operator_caches drops
    them all (round-3 ADVICE: long sessions must not accumulate caches)."""
    from wage_etl_spark.operators.caching import (
        _LIVE, register_cache, release_operator_caches,
    )

    release_operator_caches()  # clean slate
    df = spark.range(10).persist()
    register_cache(df)
    df.count()
    assert df.storageLevel.useMemory
    n = release_operator_caches(blocking=True)
    assert n >= 1 and not _LIVE
    assert not df.storageLevel.useMemory  # unpersisted
    # releasing again is a safe no-op
    assert release_operator_caches() == 0
