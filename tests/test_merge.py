"""MERGE-apply: upsert/delete semantics, bucket pruning, idempotent
re-application, schema evolution through merge."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from wage_etl_spark.lake.table import LakeTable
from wage_etl_spark.operators.merge import merge_apply
from wage_etl_spark.streaming.replay import TARGET_SCHEMA, KEY_COLS, ORDERING_COLS

SRC_SCHEMA = (
    "repo string, path string, commit string, event_seq long, lang string, "
    "content string, op string"
)


def make_target(spark, warehouse, nb=8):
    return LakeTable.create(
        spark, f"{warehouse}/repo_code", TARGET_SCHEMA, KEY_COLS, num_buckets=nb
    )


def _src(spark, rows):
    return spark.createDataFrame(rows, SRC_SCHEMA)


def _state(t):
    return {
        (r["repo"], r["path"]): (r["commit"], r["event_seq"], r["content"])
        for r in t.read().collect()
    }


def test_insert_update_delete(spark, warehouse):
    t = make_target(spark, warehouse)
    merge_apply(t, _src(spark, [
        ("r1", "a", "1" * 40, 1, "py", "v1", "I"),
        ("r1", "b", "1" * 40, 2, "py", "w1", "I"),
    ]), ORDERING_COLS)
    merge_apply(t, _src(spark, [
        ("r1", "a", "2" * 40, 3, "py", "v2", "U"),   # update
        ("r1", "b", "2" * 40, 4, "py", None, "D"),   # delete
        ("r1", "c", "2" * 40, 5, "py", "x1", "U"),   # upsert-insert (never inserted)
    ]), ORDERING_COLS)
    s = _state(t)
    assert set(s) == {("r1", "a"), ("r1", "c")}
    assert s[("r1", "a")][2] == "v2"


def test_stale_event_loses_to_target(spark, warehouse):
    t = make_target(spark, warehouse)
    merge_apply(t, _src(spark, [("r1", "a", "5" * 40, 10, "py", "new", "I")]), ORDERING_COLS)
    merge_apply(t, _src(spark, [("r1", "a", "3" * 40, 2, "py", "old", "U")]), ORDERING_COLS)
    assert _state(t)[("r1", "a")][2] == "new"


def test_reapply_same_batch_is_idempotent(spark, warehouse):
    t = make_target(spark, warehouse)
    batch = [("r1", "a", "4" * 40, 7, "py", "vv", "I"), ("r2", "z", "4" * 40, 8, "py", None, "D")]
    merge_apply(t, _src(spark, batch), ORDERING_COLS)
    before = _state(t)
    merge_apply(t, _src(spark, batch), ORDERING_COLS)
    assert _state(t) == before


def test_bucket_pruning_untouched_files_carry_over(spark, warehouse):
    """An epoch touching few keys must not rewrite unrelated buckets."""
    t = make_target(spark, warehouse, nb=16)
    rows = [(f"r{i}", f"p{i}", "1" * 40, i, "py", f"c{i}", "I") for i in range(200)]
    merge_apply(t, _src(spark, rows), ORDERING_COLS)
    snap1 = t.snapshot()
    merge_apply(t, _src(spark, [("r5", "p5", "2" * 40, 999, "py", "new", "U")]), ORDERING_COLS)
    snap2 = t.snapshot()
    changed = {b for b in snap2.files if snap2.files[b] != snap1.files.get(b)}
    assert len(changed) == 1  # exactly the winner's bucket
    # and state is still complete
    assert t.read().count() == 200
    assert _state(t)[("r5", "p5")][2] == "new"


def test_schema_evolution_through_merge(spark, warehouse):
    t = make_target(spark, warehouse)
    merge_apply(t, _src(spark, [("r1", "a", "1" * 40, 1, "py", "v1", "I")]), ORDERING_COLS)
    evolved = spark.createDataFrame(
        [("r1", "b", "2" * 40, 2, "py", "v2", "I", "py-3")],
        SRC_SCHEMA + ", lang_version string",
    )
    merge_apply(t, evolved, ORDERING_COLS)
    df = t.read()
    assert "lang_version" in df.columns
    got = {r["path"]: r["lang_version"] for r in df.collect()}
    assert got == {"a": None, "b": "py-3"}


def test_merge_empty_source_is_noop(spark, warehouse):
    t = make_target(spark, warehouse)
    merge_apply(t, _src(spark, [("r1", "a", "1" * 40, 1, "py", "v1", "I")]), ORDERING_COLS)
    before = t.snapshot().files
    snap, rows, buckets = merge_apply(t, _src(spark, []), ORDERING_COLS)
    assert rows == 0 and buckets == {} and snap.files == before


def test_narrow_numeric_key_buckets_against_table_type(spark, warehouse):
    """ADVICE r2: xxhash64(int) != xxhash64(long), so winners arriving with a
    NARROWER numeric key type than the table must be cast up before bucketing
    or they land in (and prune against) the wrong buckets."""
    from pyspark.sql.types import StructType

    t = LakeTable.create(
        spark, f"{warehouse}/num_key",
        StructType.fromDDL("k long, v string, ver long"), ["k"], num_buckets=8,
    )
    merge_apply(
        t,
        spark.createDataFrame([(i, f"v{i}", 1) for i in range(50)],
                              "k long, v string, ver long, op string"
                              .replace(", op string", "")).withColumn("op", F.lit("I")),
        ["ver"],
    )
    # second epoch arrives with k as INT (narrower) — must still update in place
    narrow = spark.createDataFrame(
        [(5, "updated", 2, "U")], "k int, v string, ver long, op string"
    )
    merge_apply(t, narrow, ["ver"])
    rows = {r["k"]: r["v"] for r in t.read().collect()}
    assert len(rows) == 50, "narrow-key merge must not duplicate keys into wrong buckets"
    assert rows[5] == "updated"
    # bucket purity: every file's rows hash to its bucket under the LONG type
    from wage_etl_spark.lake.table import bucket_expr
    snap = t.snapshot()
    df = t.read().withColumn("_b", bucket_expr(["k"], snap.num_buckets))
    import os as _os
    for b, fs in snap.files.items():
        for f in fs:
            got = {
                r["_b"]
                for r in spark.read.parquet(_os.path.join(t.root, f))
                .withColumn("_b", bucket_expr(["k"], snap.num_buckets))
                .select("_b").distinct().collect()
            }
            assert got <= {int(b)}, f"bucket {b} file contains foreign keys {got}"


def test_merge_is_single_shuffle(spark, warehouse, monkeypatch):
    """VERDICT r2 #5: the MERGE write must move rows through exactly ONE
    exchange — the repartition on the bucket id. The LWW winner resolution
    is a bucket-local sort (Window.partitionBy(_b) is satisfied by that
    partitioning), and _write_files writes prepartitioned output without
    re-shuffling. Counting Exchange nodes is noise-immune proof."""
    t = make_target(spark, warehouse)
    merge_apply(t, _src(spark, [
        (f"r{i}", f"p{i}", "1" * 40, i, "py", f"c{i}", "I") for i in range(100)
    ]), ORDERING_COLS)

    captured = {}
    orig = LakeTable._write_files

    def spy(self, df, snap, prepartitioned=False):
        captured["plan"] = df._jdf.queryExecution().sparkPlan().toString()
        captured["prepartitioned"] = prepartitioned
        return orig(self, df, snap, prepartitioned=prepartitioned)

    monkeypatch.setattr(LakeTable, "_write_files", spy)
    merge_apply(
        t,
        _src(spark, [("r5", "p5", "2" * 40, 999, "py", "new", "U")]),
        ORDERING_COLS,
        stage_source=False,
    )
    assert captured["prepartitioned"] is True
    n_exchanges = captured["plan"].count("Exchange")
    assert n_exchanges == 1, f"expected 1 exchange, got {n_exchanges}:\n{captured['plan']}"
    assert "Window" in captured["plan"] or "Sort" in captured["plan"]
