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


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)).filter(lambda t: t[0] != t[1]),
        max_size=60,
    ),
    extra_nodes=st.lists(st.integers(0, 60), max_size=10),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_dedup_clusters_equals_union_find_on_random_graphs(spark, edges, extra_nodes):
    """dedup_clusters (pointer-jumping propagation) vs a pure-Python
    union-find oracle on arbitrary random graphs — paths, cycles, forests,
    self-free multi-edges, isolated nodes."""
    from wage_etl_spark.operators.dedupe import dedup_clusters

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    for n in extra_nodes:
        find(n)
    expected = {n: find(n) for n in parent}

    pairs = spark.createDataFrame(
        edges or [(0, 1)], "id_a long, id_b long"
    )
    if not edges:
        expected.setdefault(0, 0)
        expected[0] = 0
        expected[1] = 0
        union(0, 1)
        expected = {n: find(n) for n in parent}
    nodes = (
        spark.createDataFrame([(n,) for n in extra_nodes], "doc_id long")
        if extra_nodes
        else None
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(pairs, nodes=nodes).collect()
    }
    assert got == expected
