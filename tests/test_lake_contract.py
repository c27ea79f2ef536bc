"""The Iceberg seam as an executable CONTRACT (VERDICT r2 #6).

``lake/table.py`` stands in for Iceberg because no runtime jar ships in this
sandbox. This module pins the exact capabilities the engine needs from that
seam — create / append / MERGE upsert+delete / idempotent re-merge / schema
evolution on write / snapshot properties / time travel / rollback — as an
abstract backend contract, parametrized over implementations:

- ``lake``: the shipped LakeTable + merge_apply (always runs, must be green).
- ``iceberg``: a real Iceberg catalog driven through SQL (``MERGE INTO``,
  ``ALTER TABLE``, time travel ``VERSION AS OF``, ``rollback_to_snapshot``).
  Auto-skipped when no Iceberg runtime is on the classpath; if a jar is ever
  added, the SAME suite validates the production mapping with zero test
  changes.

Spark-side semantics under contract (Iceberg docs semantics):
MERGE = ``MERGE INTO t USING s ON <keys> WHEN MATCHED AND s.op='D' THEN
DELETE WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED AND s.op<>'D' THEN
INSERT *`` — mirrored by operators/merge.py:merge_apply.
"""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StructType

from wage_etl_spark.lake.table import LakeTable
from wage_etl_spark.operators.merge import merge_apply

DDL = "k string, v string, ver long"

# ONE statement text for both backends (lake front-end + real Iceberg) —
# the "config change, not API migration" contract
_MERGE_SQL = (
    "MERGE INTO {target} t USING s ON t.k = s.k "
    "WHEN MATCHED AND s.op = 'D' THEN DELETE "
    "WHEN MATCHED THEN UPDATE SET * "
    "WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT *"
)


class LakeBackend:
    """Contract adapter over the shipped snapshot layer."""

    name = "lake"

    def __init__(self, spark, root: str):
        self.t = LakeTable.create(
            spark, root, StructType.fromDDL(DDL), ["k"], num_buckets=4
        )

    def append(self, df: DataFrame, properties=None):
        self.t.append(df, properties=properties)

    def merge(self, winners: DataFrame, properties=None):
        merge_apply(self.t, winners, ordering_cols=["ver"], properties=properties)

    def merge_sql(self, winners: DataFrame):
        from wage_etl_spark.lake.sql_merge import merge_into

        winners.createOrReplaceTempView("s")
        merge_into(
            self.t.spark, _MERGE_SQL.format(target="t_lake"),
            tables={"t_lake": self.t}, sources={"s": winners},
        )

    def read(self) -> DataFrame:
        return self.t.read()

    def current_version(self):
        return self.t.current_version()

    def read_at(self, version) -> DataFrame:
        return self.t.read(version=version)

    def rollback_to(self, version):
        self.t.rollback_to(version)

    def properties_of_latest(self) -> dict:
        return self.t.snapshot().properties


class IcebergBackend:
    """The production mapping: same contract via Iceberg SQL."""

    name = "iceberg"

    def __init__(self, spark, root: str):
        self.spark = spark
        self.tbl = "ice_contract.db.t"
        spark.sql(
            f"CREATE TABLE {self.tbl} ({DDL}) USING iceberg "
            f"TBLPROPERTIES ('write.merge.mode'='copy-on-write')"
        )

    def append(self, df: DataFrame, properties=None):
        df.writeTo(self.tbl).append()

    def merge(self, winners: DataFrame, properties=None):
        winners.createOrReplaceTempView("s")
        self.spark.sql(
            f"MERGE INTO {self.tbl} t USING s ON t.k = s.k "
            "WHEN MATCHED AND s.op = 'D' THEN DELETE "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT *"
        )

    def merge_sql(self, winners: DataFrame):
        winners.createOrReplaceTempView("s")
        self.spark.sql(_MERGE_SQL.format(target=self.tbl))

    def read(self) -> DataFrame:
        return self.spark.table(self.tbl)

    def current_version(self):
        return (
            self.spark.sql(f"SELECT snapshot_id FROM {self.tbl}.snapshots "
                           "ORDER BY committed_at DESC LIMIT 1").first()[0]
        )

    def read_at(self, version) -> DataFrame:
        return self.spark.read.option("snapshot-id", version).table(self.tbl)

    def rollback_to(self, version):
        self.spark.sql(
            f"CALL ice_contract.system.rollback_to_snapshot('db.t', {version})"
        )

    def properties_of_latest(self) -> dict:
        row = self.spark.sql(
            f"SELECT summary FROM {self.tbl}.snapshots ORDER BY committed_at DESC LIMIT 1"
        ).first()
        return dict(row[0])


@pytest.fixture(params=["lake", "iceberg"])
def backend(request, spark, tmp_path):
    if request.param == "lake":
        return LakeBackend(spark, str(tmp_path / "t"))
    # Iceberg: only when a runtime jar + catalog are actually usable
    try:
        spark.conf.set("spark.sql.catalog.ice_contract",
                       "org.apache.iceberg.spark.SparkCatalog")
        spark.conf.set("spark.sql.catalog.ice_contract.type", "hadoop")
        spark.conf.set("spark.sql.catalog.ice_contract.warehouse",
                       str(tmp_path / "ice_wh"))
        return IcebergBackend(spark, str(tmp_path / "ice_wh"))
    except Exception as e:  # noqa: BLE001 — any classpath/catalog failure
        pytest.skip(f"no Iceberg runtime in this environment: {type(e).__name__}")


def _df(spark, rows, ddl=DDL + ", op string"):
    return spark.createDataFrame(rows, ddl)


def _state(b):
    return {r["k"]: (r["v"], r["ver"]) for r in b.read().collect()}


def test_contract_append_and_read(spark, backend):
    backend.append(_df(spark, [("a", "1", 1), ("b", "2", 1)], DDL))
    assert _state(backend) == {"a": ("1", 1), "b": ("2", 1)}


def test_contract_merge_upsert_and_delete(spark, backend):
    backend.append(_df(spark, [("a", "1", 1), ("b", "2", 1)], DDL))
    backend.merge(_df(spark, [
        ("a", "1b", 2, "U"),   # update
        ("b", None, 2, "D"),   # delete
        ("c", "3", 2, "I"),    # insert
        ("d", None, 2, "D"),   # delete of absent key: no-op, not an insert
    ]))
    got = {k: v for k, (v, _) in _state(backend).items()}
    assert got == {"a": "1b", "c": "3"}


def test_contract_merge_sql_statement(spark, backend):
    """THE SAME canonical MERGE INTO text runs on both backends (lake via
    the sql_merge front-end, Iceberg via spark.sql) and produces the same
    state — swapping the backend is a config change, not an API migration."""
    backend.append(_df(spark, [("a", "1", 1), ("b", "2", 1)], DDL))
    backend.merge_sql(_df(spark, [
        ("a", "1b", 2, "U"),
        ("b", None, 2, "D"),
        ("c", "3", 2, "I"),
        ("d", None, 2, "D"),
    ]))
    got = {k: v for k, (v, _) in _state(backend).items()}
    assert got == {"a": "1b", "c": "3"}


def test_contract_merge_idempotent_reapply(spark, backend):
    backend.append(_df(spark, [("a", "1", 1)], DDL))
    winners = _df(spark, [("a", "1b", 2, "U"), ("c", "3", 2, "I")])
    backend.merge(winners)
    before = _state(backend)
    backend.merge(winners)  # exactly-once replay: same winners, same state
    assert _state(backend) == before


def test_contract_schema_evolution_on_write(spark, backend):
    backend.append(_df(spark, [("a", "1", 1)], DDL))
    if backend.name == "iceberg":
        spark.conf.set("spark.sql.iceberg.check-ordering", "false")
        spark.sql(f"ALTER TABLE {backend.tbl} ADD COLUMN extra string")
        backend.merge(_df(spark, [("b", "2", 2, "I")], DDL + ", op string")
                      .withColumn("extra", F.lit("x")))
    else:
        backend.merge(
            _df(spark, [("b", "2", 2, "I")], DDL + ", op string")
            .withColumn("extra", F.lit("x"))
        )
    df = backend.read()
    assert "extra" in df.columns
    got = {r["k"]: r["extra"] for r in df.collect()}
    assert got == {"a": None, "b": "x"}


def test_contract_snapshot_properties(spark, backend):
    props = {"epoch": "7", "operation": "merge"} if backend.name == "lake" else None
    backend.append(_df(spark, [("a", "1", 1)], DDL), properties=None)
    backend.merge(_df(spark, [("a", "2", 2, "U")]), properties=props)
    if backend.name == "lake":
        assert backend.properties_of_latest()["epoch"] == "7"
    else:
        # Iceberg surfaces commit metadata through the snapshot summary
        assert backend.properties_of_latest().get("operation") in (
            "overwrite", "replace", "append", "delete"
        )


def test_contract_time_travel_and_rollback(spark, backend):
    backend.append(_df(spark, [("a", "1", 1)], DDL))
    v1 = backend.current_version()
    backend.merge(_df(spark, [("a", "2", 2, "U"), ("b", "9", 2, "I")]))
    assert _state(backend)["a"] == ("2", 2)
    # time travel reads the pre-merge state
    old = {r["k"]: r["v"] for r in backend.read_at(v1).collect()}
    assert old == {"a": "1"}
    # rollback restores it as the current state
    backend.rollback_to(v1)
    assert {k: v for k, (v, _) in _state(backend).items()} == {"a": "1"}


def test_contract_concurrent_writer_conflict(spark, backend):
    """Optimistic concurrency (round-3 verdict #3): two writers race the
    same parent version; exactly one commit wins, the loser gets a
    detectable conflict and succeeds on retry against the new parent.
    (Iceberg enforces the same contract natively — CommitFailedException +
    commit.retry.num-retries around the metadata-pointer swap; this case
    pins our LakeTable side of the seam.)"""
    import dataclasses

    from wage_etl_spark.lake.table import SnapshotConflict

    if backend.name != "lake":
        pytest.skip("Iceberg resolves the race natively via commit retries")
    t = backend.t
    backend.append(_df(spark, [("a", "1", 1)], DDL))
    cur = t.snapshot()
    # both writers computed version = parent + 1 before either committed
    w1 = dataclasses.replace(cur, version=cur.version + 1, parent=cur.version,
                             operation="append")
    w2 = dataclasses.replace(cur, version=cur.version + 1, parent=cur.version,
                             operation="append")
    t._write_snapshot(w1)
    with pytest.raises(SnapshotConflict):
        t._write_snapshot(w2)
    # loser re-reads the table and retries against the winner's version
    w2_retry = dataclasses.replace(w2, version=t.current_version() + 1,
                                   parent=t.current_version())
    t._write_snapshot(w2_retry)
    assert t.current_version() == cur.version + 2
    # history is a clean linear chain — no torn/duplicate versions
    assert [s.version for s in t.history()] == list(range(1, cur.version + 3))


def test_contract_expire_snapshots_gc_orphans(spark, backend):
    """GC contract (round-3 verdict #3): a crash mid-write leaves data files
    no snapshot references; expire_snapshots must delete BOTH expired-
    version files and these orphans while every live file and the current
    state survive. (Iceberg analog: expire_snapshots + remove_orphan_files.)"""
    import os

    if backend.name != "lake":
        pytest.skip("Iceberg analog: CALL system.expire_snapshots/remove_orphan_files")
    t = backend.t
    backend.append(_df(spark, [("a", "1", 1)], DDL))
    backend.merge(_df(spark, [("a", "2", 2, "U")]))
    live_before = set(t.snapshot().all_files())

    # simulate a writer that crashed after _write_files, before _commit
    orphan_dir = os.path.join(t.data_dir, "deadbeefcrashed", "_b=0")
    os.makedirs(orphan_dir)
    orphan = os.path.join(orphan_dir, "part-00000.parquet")
    spark.createDataFrame([("z", "9", 9)], DDL).toPandas().to_parquet(orphan)

    deleted = t.expire_snapshots(keep_last=1)
    assert deleted >= 1
    assert not os.path.exists(orphan)  # orphan GC'd
    assert set(t.snapshot().all_files()) == live_before  # live files intact
    for f in live_before:
        assert os.path.exists(os.path.join(t.root, f))
    assert {k: v for k, (v, _) in _state(backend).items()} == {"a": "2"}
