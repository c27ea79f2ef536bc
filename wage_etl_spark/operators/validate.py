"""Vectorized event validation with dead-letter quarantine.

Mirrors the reference's constraint system (Pydantic field + cross-field rules,
/root/reference/src/transform/models.py:9-87) and its quarantine contract
(rejects table with ``(run_id, raw_data JSON, rejection_reason[:1000])``,
/root/reference/src/load/staging.py:109-159). Divergence from the reference's
silent-keep-on-error quirk (pandas_ops.py:164-169) is deliberate: bad rows are
*always* quarantined per-row, per the documented intent.

All rules are Catalyst Column expressions (whole-stage-codegen, JVM-side),
except one Arrow-batched pandas UDF (`content_wellformed`) kept to mirror the
reference's model-validation stage per the north rule ("validated with
vectorized pandas/Arrow UDFs") — it checks content printability, which needs
Python-side unicode tables anyway. Never per-row Python.

Rule map (reference -> here):
  V1 fips 5-digit shape        -> commit is 40-char lowercase hex
  V2/V4 bounded ints           -> event_seq >= 0
  V3 cross-field               -> op='D' must carry null content;
                                  op in (I,U) must carry non-null content
  V5 enum membership           -> op in {I,U,D}; lang in known set (warn-only)
  V6 non-negative              -> event_seq non-negative
  required-column/null checks  -> repo/path/commit/event_seq non-null, non-empty
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

OPS = ("I", "U", "D")

REASON_MAX_LEN = 1000  # reference truncates reasons to 1000 chars (staging.py:140)


@pandas_udf(BooleanType())
def content_wellformed(content: pd.Series) -> pd.Series:
    """Arrow-batched content sanity check: null is OK (deletes), otherwise the
    text must be non-empty after strip and mostly printable (>= 90%).
    Vectorized pandas string ops — the reference's per-row Pydantic loop
    (pandas_ops.py:108-121) re-expressed batch-wise."""
    s = content
    isnull = s.isna()
    stripped = s.fillna("").str.strip()
    nonempty = stripped.str.len() > 0
    total = s.fillna("").str.len().clip(lower=1)
    printable = s.fillna("").str.count(r"[\x20-\x7E\t\n\r -￿]")
    mostly_printable = (printable / total) >= 0.9
    return isnull | (nonempty & mostly_printable)


def violation_rules(has_content: bool = True) -> list[tuple[str, F.Column]]:
    """(reason, passes) pairs. A row is valid iff every rule passes."""
    rules: list[tuple[str, F.Column]] = [
        ("null_or_empty_repo", F.col("repo").isNotNull() & (F.trim(F.col("repo")) != "")),
        ("null_or_empty_path", F.col("path").isNotNull() & (F.trim(F.col("path")) != "")),
        ("bad_commit_hex", F.col("commit").isNotNull() & F.col("commit").rlike("^[0-9a-f]{40}$")),
        ("null_event_seq", F.col("event_seq").isNotNull()),
        ("negative_event_seq", F.coalesce(F.col("event_seq") >= 0, F.lit(False))),
        ("bad_op", F.col("op").isin(*OPS)),
    ]
    if has_content:
        rules += [
            (
                "delete_with_content",
                (F.col("op") != "D") | F.col("content").isNull(),
            ),
            (
                "upsert_without_content",
                ~F.col("op").isin("I", "U") | F.col("content").isNotNull(),
            ),
            ("malformed_content", content_wellformed(F.col("content"))),
        ]
    return rules


def validate_events(
    events: DataFrame,
    run_id: int | None = None,
    null_gate_ratio: float = 0.10,
) -> tuple[DataFrame, DataFrame]:
    """Split events into (valid, quarantined).

    ``quarantined`` matches the reference reject-table shape:
    (run_id, raw_data JSON string, rejection_reason, reject_timestamp)
    — /root/reference/sql/migrations/V004__CREATE_TABLE_stg_wages_rejects.sql.

    The whole split is one pass: a ``violations`` array column built from
    when() expressions, filtered two ways. Catalyst computes the array once
    per row inside codegen; no Python in the hot path except the single
    Arrow UDF batch call.
    """
    has_content = "content" in events.columns
    rules = violation_rules(has_content=has_content)
    violations = F.array_compact(
        F.array(*[F.when(~passes, F.lit(reason)) for reason, passes in rules])
    )
    tagged = events.withColumn("_violations", violations)
    valid = tagged.filter(F.size("_violations") == 0).drop("_violations")
    quarantined = tagged.filter(F.size("_violations") > 0).select(
        F.lit(run_id).cast("long").alias("run_id"),
        F.to_json(
            F.struct(*[F.col(c) for c in events.columns]),
            {"ignoreNullFields": "false"},  # keep nulls like the reference's json.dumps
        ).alias("raw_data"),
        F.substring(F.concat_ws(";", "_violations"), 1, REASON_MAX_LEN).alias(
            "rejection_reason"
        ),
        F.current_timestamp().alias("reject_timestamp"),
    )
    return valid, quarantined


def null_ratio(df: DataFrame, cols: list[str] | None = None) -> float:
    """Table-level quality gate: fraction of null cells (reference
    validate_wide_format_input >10%-nulls rejection, validation.py:33-39).
    One aggregate pass, no collect of data rows."""
    cols = cols or df.columns
    agg = df.select(
        F.sum(
            sum((F.col(c).isNull().cast("long") for c in cols), F.lit(0))
        ).alias("nulls"),
        F.count(F.lit(1)).alias("rows"),
    ).first()
    if not agg or not agg["rows"]:
        return 0.0
    return agg["nulls"] / (agg["rows"] * len(cols))
