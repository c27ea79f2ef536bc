"""Census-style JSON rows scan (S4) and CSV artifact sink (S9).

Reference: the Census API returns ``[[header...], [row...], ...]`` — a list
of lists with the header as row 0 (/root/reference/src/extract/
census_api.py:106-127). Spark mapping: ``from_json`` into
``array<array<string>>``, explode with the header row projected out — all
JVM-side expressions, no Python parsing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def parse_json_rows(df: DataFrame, json_col: str, columns: list[str]) -> DataFrame:
    """DataFrame[(..., json_col)] -> one row per data row with named columns.
    Row 0 (the header) is skipped, mirroring census_api.py:114-127."""
    arr = F.from_json(F.col(json_col), "array<array<string>>")
    others = [c for c in df.columns if c != json_col]
    exploded = df.select(
        *others, F.posexplode(arr).alias("_pos", "_row")
    ).filter(F.col("_pos") > 0)
    return exploded.select(
        *others,
        *[F.col("_row").getItem(i).alias(name) for i, name in enumerate(columns)],
    )


def save_csv(df: DataFrame, path: str, partition_cols: list[str] | None = None) -> None:
    """CSV artifact sink (S9): reference saved per-state/per-year CSVs
    (/root/reference/src/transform/csv_utils.py:14-52); ``partitionBy`` is
    the distributed analog of its path layout."""
    w = df.write.mode("overwrite").option("header", True)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.csv(path)
