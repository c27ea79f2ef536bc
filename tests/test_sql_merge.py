"""MERGE INTO front-end (lake/sql_merge.py): parser, semantics vs
merge_apply, Iceberg-parity corners, and loud failures for anything outside
the supported grammar."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from wage_etl_spark.lake.sql_merge import merge_into, parse_merge
from wage_etl_spark.lake.table import LakeTable

DDL = "k string, v string, ver long"

CANON = (
    "MERGE INTO tgt t USING src s ON t.k = s.k "
    "WHEN MATCHED AND s.op = 'D' THEN DELETE "
    "WHEN MATCHED THEN UPDATE SET * "
    "WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT *"
)


@pytest.fixture
def table(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "t"), StructType.fromDDL(DDL), ["k"], num_buckets=4
    )


def _src(spark, rows):
    return spark.createDataFrame(rows, DDL + ", op string")


def _state(table):
    return {r["k"]: r["v"] for r in table.read().collect()}


def test_parse_canonical():
    p = parse_merge(CANON)
    assert p.target == "tgt" and p.source == "src"
    assert p.on_keys == ["k"]
    assert [(b.matched, b.action, b.cond) for b in p.branches] == [
        (True, "delete", "op = 'D'"),
        (True, "update_star", None),
        (False, "insert_star", "op <> 'D'"),
    ]


def test_canonical_upsert_delete(spark, table):
    table.append(spark.createDataFrame([("a", "1", 1), ("b", "2", 1)], DDL))
    merge_into(
        spark, CANON, tables={"tgt": table},
        sources={"src": _src(spark, [
            ("a", "1b", 2, "U"), ("b", None, 2, "D"),
            ("c", "3", 2, "I"), ("d", None, 2, "D"),
        ])},
    )
    assert _state(table) == {"a": "1b", "c": "3"}


def test_source_resolves_from_temp_view(spark, table):
    _src(spark, [("a", "1", 1, "I")]).createOrReplaceTempView("src")
    merge_into(spark, CANON, tables={"tgt": table})
    assert _state(table) == {"a": "1"}


def test_merge_overwrites_regardless_of_version(spark, table):
    """MERGE semantics (Iceberg parity): the source row replaces the target
    row even with a LOWER version — no LWW ordering is evaluated."""
    table.append(spark.createDataFrame([("a", "new", 9)], DDL))
    merge_into(
        spark, CANON, tables={"tgt": table},
        sources={"src": _src(spark, [("a", "old", 1, "U")])},
    )
    assert table.read().collect()[0]["ver"] == 1


def test_update_only_touches_existing_keys(spark, table):
    table.append(spark.createDataFrame([("a", "1", 1)], DDL))
    merge_into(
        spark,
        "MERGE INTO tgt t USING src s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET *",
        tables={"tgt": table},
        sources={"src": _src(spark, [("a", "1b", 2, "U"), ("zz", "9", 2, "U")])},
    )
    assert _state(table) == {"a": "1b"}  # zz NOT inserted


def test_insert_only_skips_existing_keys(spark, table):
    table.append(spark.createDataFrame([("a", "1", 1)], DDL))
    merge_into(
        spark,
        "MERGE INTO tgt t USING src s ON t.k = s.k "
        "WHEN NOT MATCHED THEN INSERT *",
        tables={"tgt": table},
        sources={"src": _src(spark, [("a", "SHOULD_NOT_WIN", 2, "U"),
                                     ("c", "3", 2, "I")])},
    )
    assert _state(table) == {"a": "1", "c": "3"}


def test_unconditional_insert_inserts_unmatched_delete_rows(spark, table):
    """Iceberg parity corner: WITHOUT the `s.op <> 'D'` guard on INSERT, a
    not-matched delete-event row IS inserted (the general matched-flag path
    must handle this; the pure-upsert fast path must not claim it)."""
    table.append(spark.createDataFrame([("a", "1", 1)], DDL))
    merge_into(
        spark,
        "MERGE INTO tgt t USING src s ON t.k = s.k "
        "WHEN MATCHED AND s.op = 'D' THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
        tables={"tgt": table},
        sources={"src": _src(spark, [("a", None, 2, "D"), ("d", None, 2, "D")])},
    )
    # a deleted (matched D), d inserted (not-matched, unconditional INSERT)
    assert set(_state(table)) == {"d"}


def test_complement_spellings_take_fast_path_with_same_result(spark, table):
    table.append(spark.createDataFrame([("a", "1", 1)], DDL))
    merge_into(
        spark,
        "MERGE INTO tgt t USING src s ON t.k = s.k "
        "WHEN MATCHED AND s.op = 'D' THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED AND s.op != 'D' THEN INSERT *",
        tables={"tgt": table},
        sources={"src": _src(spark, [("a", None, 2, "D"), ("c", "3", 2, "I")])},
    )
    assert _state(table) == {"c": "3"}


def test_duplicate_source_keys_raise(spark, table):
    with pytest.raises(ValueError, match="multiple rows per key"):
        merge_into(
            spark, CANON, tables={"tgt": table},
            sources={"src": _src(spark, [("a", "1", 1, "U"), ("a", "2", 2, "U")])},
        )


def test_on_keys_must_match_table_keys(spark, table):
    with pytest.raises(ValueError, match="key columns"):
        merge_into(
            spark,
            "MERGE INTO tgt t USING src s ON t.v = s.v "
            "WHEN MATCHED THEN UPDATE SET *",
            tables={"tgt": table},
            sources={"src": _src(spark, [("a", "1", 1, "U")])},
        )


@pytest.mark.parametrize(
    "stmt",
    [
        # column-level assignment
        "MERGE INTO tgt t USING src s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = s.v",
        # explicit insert column list
        "MERGE INTO tgt t USING src s ON t.k = s.k "
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)",
        # non-equality ON
        "MERGE INTO tgt t USING src s ON t.k > s.k "
        "WHEN MATCHED THEN UPDATE SET *",
        # target-column branch condition
        "MERGE INTO tgt t USING src s ON t.k = s.k "
        "WHEN MATCHED AND t.ver < s.ver THEN UPDATE SET *",
    ],
)
def test_unsupported_constructs_raise_loudly(stmt):
    with pytest.raises(NotImplementedError):
        parse_merge(stmt)


def test_parse_rejects_trailing_garbage():
    # the trailer is swallowed into the last branch's action text (lazy
    # match extends to end-of-string), so it surfaces as an unsupported
    # action — still a loud NotImplementedError, never a silent half-apply
    with pytest.raises(NotImplementedError):
        parse_merge(CANON + " WHNE TYPO")
