"""Property-based CDC semantics: random event streams (ops, dup keys,
out-of-order versions, deletes, invalid rows, multi-epoch) replayed through
the engine must produce exactly the pure-Python oracle's final state, DLQ
count, and per-key sha256 — for EVERY generated stream, not just the seeded
fixtures. (The reference has no property tests; SURVEY §5 calls this out as
the upgrade.)"""

from __future__ import annotations

import tempfile

from hypothesis import HealthCheck, given, settings, strategies as st

from wage_etl_spark.sources.events import EpochSource
from wage_etl_spark.streaming.replay import ReplayConfig, open_tables, replay, verify_state

from tests.oracle import replay_oracle, sha_map

EVENT_SCHEMA = (
    "op string, repo string, path string, commit string, event_seq long, "
    "lang string, content string, epoch long"
)

REPOS = ["r0", "r1", ""]          # "" exercises null_or_empty_repo
PATHS = ["a.py", "b.md", "c"]
LANGS = ["py", "md", None]


@st.composite
def event_streams(draw):
    """Bounded random streams. (key, commit, event_seq) is unique per stream
    — a log never assigns one sequence number twice — so the LWW order is a
    total order and engine/oracle tie semantics can't diverge."""
    n = draw(st.integers(min_value=1, max_value=60))
    n_epochs = draw(st.integers(min_value=1, max_value=3))
    events = []
    for i in range(n):
        op = draw(st.sampled_from(["I", "U", "D", "X"]))  # X = invalid op
        # a few commits, drawn out of order; seq i keeps versions unique
        commit = f"{draw(st.integers(min_value=0, max_value=3)):040x}"
        bad_commit = draw(st.booleans()) and draw(st.booleans())  # ~25%
        content = None if op == "D" else draw(
            st.sampled_from(["hello", "world", "x" * 50, "", "bad\x00byte"])
        )
        events.append(
            {
                "op": op,
                "repo": draw(st.sampled_from(REPOS)),
                "path": draw(st.sampled_from(PATHS)),
                "commit": "zz-not-hex" if bad_commit else commit,
                "event_seq": i,
                "lang": draw(st.sampled_from(LANGS)),
                "content": content,
                "epoch": draw(st.integers(min_value=0, max_value=n_epochs - 1)),
            }
        )
    return events


@given(stream=event_streams())
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_replay_equals_oracle_on_random_streams(spark, stream):
    rows = [tuple(e[k] for k in (
        "op", "repo", "path", "commit", "event_seq", "lang", "content", "epoch"
    )) for e in stream]
    ev = spark.createDataFrame(rows, EVENT_SCHEMA)

    with tempfile.TemporaryDirectory() as wh:
        cfg = ReplayConfig(warehouse=wh, num_buckets=4)
        results = replay(spark, cfg, EpochSource(ev))
        oracle_state, n_valid, n_quar = replay_oracle(stream)
        target, dlq, manifest = open_tables(spark, cfg)
        report = verify_state(spark, target, sha_map(oracle_state))
        assert report["equal"], (report, stream)
        assert dlq.read().count() == n_quar
        assert sum(r["quarantined"] for r in results) == n_quar
        assert sum(r["valid"] for r in results) == n_valid
