"""Schema evolution mid-stream: a column appears in later epochs and must be
merged into the target schema (reference analog: migration V008 adding a
column, /root/reference/sql/migrations/V008__ALTER_county_fips_and_add_year.sql)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wage_etl_spark.sources.events import EpochSource
from wage_etl_spark.sources.synth import synthesize_events
from wage_etl_spark.streaming.replay import ReplayConfig, open_tables, replay, verify_state

from tests.oracle import replay_oracle, sha_map

# enough keys that some final winners predate the evolution epoch (their
# lang_version must stay null) while later epochs update others
SYNTH = dict(n_events=1200, n_keys=400, n_epochs=4, invalid_frac=0.02, evolve_from_epoch=2)


def test_column_appears_mid_stream(spark, warehouse):
    ev = synthesize_events(spark, **SYNTH)
    src = EpochSource(ev)
    # the per-epoch source really drops the column before the evolution point
    assert "lang_version" not in src.epoch(0).columns
    assert "lang_version" in src.epoch(2).columns

    cfg = ReplayConfig(warehouse=warehouse, num_buckets=8)
    replay(spark, cfg, src)
    target, dlq, manifest = open_tables(spark, cfg)
    df = target.read()
    assert "lang_version" in df.columns

    # sha256 state still matches the oracle
    oracle_state, *_ = replay_oracle([r.asDict() for r in ev.collect()])
    assert verify_state(spark, target, sha_map(oracle_state))["equal"]

    # lang_version values match the oracle per key
    got = {
        (r["repo"], r["path"]): r["lang_version"]
        for r in df.select("repo", "path", "lang_version").collect()
    }
    want = {k: v["lang_version"] for k, v in oracle_state.items()}
    assert got == want
    # and at least one key written before the evolution point carries null
    assert any(v is None for v in got.values())
    assert any(v is not None for v in got.values())


def test_rename_after_evolution(spark, warehouse):
    """Renamed columns (north star: 'added/renamed columns') — rename the
    evolved column, reads remap, subsequent merges keep working."""
    ev = synthesize_events(spark, **SYNTH)
    cfg = ReplayConfig(warehouse=warehouse, num_buckets=8)
    replay(spark, cfg, EpochSource(ev))
    target, *_ = open_tables(spark, cfg)
    target.rename_column("lang_version", "language_version")
    df = target.read()
    assert "language_version" in df.columns and "lang_version" not in df.columns
    assert df.filter(F.col("language_version").isNotNull()).count() > 0
