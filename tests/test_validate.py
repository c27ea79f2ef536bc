"""Validation & quarantine: each corruption mode is rejected with the right
reason; valid + quarantined partitions the input; oracle rule parity."""

from __future__ import annotations

import json

from wage_etl_spark.operators.validate import null_ratio, validate_events
from wage_etl_spark.sources.synth import synthesize_events

from tests.oracle import validate as oracle_validate

EV_SCHEMA = (
    "op string, repo string, path string, commit string, event_seq long, "
    "lang string, content string, epoch long"
)

GOOD = ("I", "org1/repo1", "src/a.py", "a" * 40, 1, "python", "print(1)\n", 0)


def _mk(spark, **overrides):
    row = dict(zip(["op", "repo", "path", "commit", "event_seq", "lang", "content", "epoch"], GOOD))
    row.update(overrides)
    return spark.createDataFrame([tuple(row.values())], EV_SCHEMA)


def _reasons(df):
    _, q = validate_events(df, run_id=7)
    rows = q.collect()
    return rows[0]["rejection_reason"].split(";") if rows else []


def test_good_row_passes(spark):
    valid, q = validate_events(_mk(spark), run_id=7)
    assert valid.count() == 1 and q.count() == 0


def test_each_rule_fires(spark):
    assert "null_or_empty_repo" in _reasons(_mk(spark, repo=None))
    assert "null_or_empty_path" in _reasons(_mk(spark, path="  "))
    assert "bad_commit_hex" in _reasons(_mk(spark, commit="abc"))
    assert "bad_commit_hex" in _reasons(_mk(spark, commit="Z" * 40))
    assert "negative_event_seq" in _reasons(_mk(spark, event_seq=-1))
    assert "null_event_seq" in _reasons(_mk(spark, event_seq=None))
    assert "bad_op" in _reasons(_mk(spark, op="X"))
    assert "delete_with_content" in _reasons(_mk(spark, op="D"))
    assert "upsert_without_content" in _reasons(_mk(spark, content=None))
    assert "malformed_content" in _reasons(_mk(spark, content="   "))


def test_delete_with_null_content_valid(spark):
    valid, q = validate_events(_mk(spark, op="D", content=None), run_id=1)
    assert valid.count() == 1 and q.count() == 0


def test_quarantine_shape_matches_reference_rejects(spark):
    """(run_id, raw_data JSON, rejection_reason, reject_timestamp) — the
    reference reject-table contract (V004 migration + staging.py:135-141)."""
    _, q = validate_events(_mk(spark, op="X"), run_id=42)
    row = q.first()
    assert row["run_id"] == 42
    raw = json.loads(row["raw_data"])
    assert raw["repo"] == "org1/repo1" and raw["op"] == "X"
    assert row["reject_timestamp"] is not None
    assert q.columns == ["run_id", "raw_data", "rejection_reason", "reject_timestamp"]


def test_split_partitions_input_and_matches_oracle(spark):
    ev = synthesize_events(spark, n_events=4000, n_keys=200, n_epochs=2, invalid_frac=0.05)
    total = ev.count()
    valid, q = validate_events(ev, run_id=1)
    nv, nq = valid.count(), q.count()
    assert nv + nq == total
    # oracle agreement on every row's verdict
    rows = [r.asDict() for r in ev.collect()]
    oracle_bad = sum(1 for r in rows if oracle_validate(r))
    assert nq == oracle_bad


def test_null_ratio_gate(spark):
    df = spark.createDataFrame(
        [("a", None), ("b", None), ("c", "x"), ("d", "y")], "k string, v string"
    )
    assert abs(null_ratio(df) - 0.25) < 1e-9
