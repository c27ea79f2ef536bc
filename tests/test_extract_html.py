"""Extract-layer parity: HTML results-table scan (S3), JSON rows scan (S4),
CSV sink (S9), truncate (S11), and the reference's full lifecycle on its own
data shape: html -> wide -> melt+normalize -> validated long records ->
LWW upsert keyed by the reference's natural key."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, IntegerType, StringType, StructField, StructType, DateType,
)

from wage_etl_spark.functions.cleaning import parse_updated_date
from wage_etl_spark.lake.table import LakeTable
from wage_etl_spark.operators.dedup_lww import dedup_lww
from wage_etl_spark.operators.merge import merge_apply
from wage_etl_spark.operators.reshape import normalize_wages_wide
from wage_etl_spark.sources.html_table import (
    parse_results_page, scan_html_tables, wide_from_map,
)
from wage_etl_spark.sources.rows_json import parse_json_rows, save_csv

# reference-style fixture (shape from /root/reference/tests/integration/
# test_wage_scraper.py:85-124): 2-row thead with colspan, ragged row, stamp
HTML = """
<html><body>
<p>Last updated on January 15, 2025.</p>
<table class="results_table">
  <thead>
    <tr><th></th><th colspan="2">1 ADULT</th><th colspan="2">2 ADULTS (1 WORKING)</th></tr>
    <tr><th></th><th>0 Children</th><th>1 Child</th><th>0 Children</th><th>1 Child</th></tr>
  </thead>
  <tbody>
    <tr><td>Living Wage</td><td>$18.71</td><td>$38.87</td><td>$30.27</td><td>$36.16</td></tr>
    <tr><td>Poverty Wage</td><td>$6.19</td><td>$10.56</td><td>$8.38</td></tr>
  </tbody>
</table>
</body></html>
"""


def test_parse_results_page_headers_and_ragged_rows():
    rows = parse_results_page("34001", HTML)
    assert len(rows) == 2
    r0 = rows[0]
    assert r0["category"] == "Living Wage"
    assert r0["values"]["1 ADULT 0 Children"] == "$18.71"
    assert r0["values"]["2 ADULTS (1 WORKING) 1 Child"] == "$36.16"
    assert r0["page_updated_raw"] == "January 15, 2025"
    # ragged row padded with ''
    assert rows[1]["values"]["2 ADULTS (1 WORKING) 1 Child"] == ""


def test_scan_html_tables_distributed(spark):
    pages = spark.createDataFrame([("34001", HTML), ("34003", HTML)], "page_id string, html string")
    out = scan_html_tables(pages)
    assert out.count() == 4
    assert set(out.columns) == {
        "page_id", "table_idx", "category", "values", "page_updated_raw"
    }
    assert {r["table_idx"] for r in out.collect()} == {0}


def test_full_reference_lifecycle_html_to_upsert(spark, warehouse):
    """The reference's one real query (main.py:32-135) end-to-end on Spark."""
    pages = spark.createDataFrame([("34001", HTML)], "page_id string, html string")
    long = scan_html_tables(pages)
    headers = ["1 ADULT 0 Children", "1 ADULT 1 Child",
               "2 ADULTS (1 WORKING) 0 Children", "2 ADULTS (1 WORKING) 1 Child"]
    wide = wide_from_map(long, headers).drop("page_id", "page_updated_raw")

    records = normalize_wages_wide(wide, "34001", "2025-01-15")
    rows = {(r["wage_type"], r["adults"], r["working_adults"], r["children"]): r["hourly_wage"]
            for r in records.collect()}
    assert rows[("living", 1, 1, 0)] == 18.71
    assert rows[("living", 2, 1, 1)] == 36.16
    assert rows[("poverty", 2, 1, 0)] == 8.38
    assert rows[("poverty", 2, 1, 1)] == 0.0  # ragged cell -> cleaned to 0.0

    # upsert into a LakeTable keyed by the reference natural key (V008:9-13)
    key = ["county_fips", "page_updated_at", "adults", "working_adults", "children", "wage_type"]
    schema = StructType([
        StructField("county_fips", StringType()), StructField("page_updated_at", DateType()),
        StructField("adults", IntegerType()), StructField("working_adults", IntegerType()),
        StructField("children", IntegerType()), StructField("wage_type", StringType()),
        StructField("hourly_wage", DoubleType()), StructField("version", IntegerType()),
    ])
    t = LakeTable.create(spark, f"{warehouse}/stg_wages", schema, key, num_buckets=4)
    src = records.withColumn("version", F.lit(1)).withColumn("op", F.lit("I"))
    merge_apply(t, src, ordering_cols=["version"])
    assert t.read().count() == 8

    # re-run = idempotent overwrite (reference ON CONFLICT DO UPDATE, README.md:59)
    src2 = records.withColumn(
        "hourly_wage", F.col("hourly_wage") + 1.0
    ).withColumn("version", F.lit(2)).withColumn("op", F.lit("U"))
    merge_apply(t, src2, ordering_cols=["version"])
    got = {r["wage_type"]: r["hourly_wage"] for r in t.read().filter(
        (F.col("adults") == 1) & (F.col("children") == 0)).collect()}
    assert got["living"] == 19.71
    assert t.read().count() == 8


def test_parse_json_rows_census_shape(spark):
    js = '[["NAME","state","county"],["Atlantic County, New Jersey","34","001"],["Bergen County, New Jersey","34","003"]]'
    df = spark.createDataFrame([("NJ", js)], "tag string, body string")
    out = parse_json_rows(df, "body", ["name", "state_fips", "county_fips"])
    rows = out.orderBy("county_fips").collect()
    assert len(rows) == 2
    assert rows[0]["name"].startswith("Atlantic")
    assert rows[0]["state_fips"] == "34" and rows[0]["county_fips"] == "001"


def test_csv_sink_and_truncate(spark, warehouse, tmp_path):
    df = spark.createDataFrame([("34", 2025, 1.5), ("36", 2025, 2.5)], "state string, year int, v double")
    out = str(tmp_path / "csv")
    save_csv(df, out, partition_cols=["year", "state"])
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 2
    assert os.path.isdir(os.path.join(out, "year=2025", "state=34"))

    t = LakeTable.create(spark, f"{warehouse}/t", df.schema, ["state"], num_buckets=2)
    t.append(df)
    assert t.read().count() == 2
    t.truncate()
    assert t.read().count() == 0
    # time travel still sees the data
    assert t.read(version=2).count() == 2


# two-table page: wages (idx 0) + expenses (idx 1), reference contract
HTML_TWO_TABLES = """
<html><body>
<p>Last updated on January 15, 2025.</p>
<table class="results_table">
<thead><tr><th>Category</th><th>1 Adult</th></tr></thead>
<tbody><tr><td>Living Wage</td><td>$18.71</td></tr></tbody>
</table>
<table class="results_table">
<thead><tr><th>Category</th><th>1 Adult</th><th>2 Adults</th></tr></thead>
<tbody>
<tr><td>Food</td><td>$4,686</td><td>$8,000</td></tr>
<tr><td>Medical Care</td><td>$2,522</td><td>$5,000</td></tr>
</tbody></table></body></html>
"""


def test_parse_all_results_tables_with_index():
    """The reference parses BOTH results_tables per page (wage_scraper.py:
    60-73): tables[0] = wages, tables[1] = expenses."""
    rows = parse_results_page("06075", HTML_TWO_TABLES)
    by_idx = {}
    for r in rows:
        by_idx.setdefault(r["table_idx"], []).append(r)
    assert set(by_idx) == {0, 1}
    assert [r["category"] for r in by_idx[0]] == ["Living Wage"]
    assert [r["category"] for r in by_idx[1]] == ["Food", "Medical Care"]
    assert by_idx[1][0]["values"]["2 Adults"] == "$8,000"


def test_min_tables_contract_raises():
    """Strict mode mirrors the reference's >=2-table page contract
    (wage_scraper.py:64-66)."""
    import pytest

    with pytest.raises(ValueError, match="at least 2 tables"):
        parse_results_page("34001", HTML, min_tables=2)
    # two-table page passes the same contract
    assert parse_results_page("06075", HTML_TWO_TABLES, min_tables=2)


def test_expense_lifecycle_distributed(spark):
    """scan -> normalize_expense_pages: aliases map (Medical Care ->
    healthcare), annual_amount cleaned, ExpenseRecord gate applied."""
    from wage_etl_spark.operators.reshape import normalize_expense_pages

    pages = spark.createDataFrame(
        [("6075", HTML_TWO_TABLES)], "page_id string, html string"
    )
    out = normalize_expense_pages(scan_html_tables(pages, min_tables=2))
    rows = {
        (r["expense_category"], r["adults"], r["working_adults"]): r
        for r in out.collect()
    }
    assert len(rows) == 4
    r = rows[("healthcare", 1, 1)]
    assert r["annual_amount"] == 2522.0 and r["valid"]
    assert r["county_fips"] == "06075"
    assert str(r["page_updated_at"]) == "2025-01-15"
    assert rows[("food", 2, 2)]["annual_amount"] == 8000.0
