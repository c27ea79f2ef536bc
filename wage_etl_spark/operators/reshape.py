"""Reshaping: the reference's melt/unpivot (wide -> long) and its
map-lookup "joins" as broadcast dimension joins — for BOTH halves of the
reference's page (wages table and expenses table).

Reference: `df.melt(id_vars, value_vars, 'family', 'value')` is THE reshape
of Wage-ETL (/root/reference/src/transform/pandas_ops.py:124-132, docs
src/transform/README.md:125); the family-config and category lookups are
12/17-entry dict lookups applied columnwise
(/root/reference/src/transform/normalizers.py:36-72, constants.py:5-44);
``normalize_wages`` and ``normalize_expenses`` are the same melt+lookup
pipeline differing only in the value column name and the record model
(pandas_ops.py:135-212, models.py:28-87).

Spark-first mapping: built-in ``DataFrame.unpivot`` (no UDTF needed) and
``broadcast()`` hash joins against literal dimension frames — at scale the
dimension side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import broadcast

from wage_etl_spark.functions.cleaning import (
    clean_currency, normalize_category_key, normalize_header,
    parse_updated_date, slugify, zfill,
)

# 12-entry family-config dimension (reference constants.py:5-18)
FAMILY_CONFIGS = [
    ("1 adult", 1, 1, 0),
    ("1 adult 1 child", 1, 1, 1),
    ("1 adult 2 children", 1, 1, 2),
    ("1 adult 3 children", 1, 1, 3),
    ("2 adults (1 working)", 2, 1, 0),
    ("2 adults (1 working) 1 child", 2, 1, 1),
    ("2 adults (1 working) 2 children", 2, 1, 2),
    ("2 adults (1 working) 3 children", 2, 1, 3),
    ("2 adults", 2, 2, 0),
    ("2 adults 1 child", 2, 2, 1),
    ("2 adults 2 children", 2, 2, 2),
    ("2 adults 3 children", 2, 2, 3),
]

# the FULL 17-entry category map (reference constants.py:20-44): wage
# categories, expense categories with aliases, derived-income categories.
# Keys are in normalize_category_key form (lower, non-word runs -> space).
CATEGORY_MAP = {
    # wage categories
    "living wage": "living",
    "poverty wage": "poverty",
    "minimum wage": "minimum",
    # expense categories (incl. aliases)
    "food": "food",
    "child care": "childcare",
    "childcare": "childcare",
    "housing": "housing",
    "transportation": "transportation",
    "medical": "healthcare",
    "medical care": "healthcare",
    "health care": "healthcare",
    "other": "other",
    "civic": "civic",
    "internet mobile": "internet_mobile",
    # derived income categories
    "required annual income after taxes": "required_after_tax",
    "annual taxes": "annual_taxes",
    "required annual income before taxes": "required_before_tax",
}

# canonical wage categories (reference models.py:54, WageRecord Literal)
WAGE_TYPES = {"living wage": "living", "poverty wage": "poverty", "minimum wage": "minimum"}

# canonical expense categories (reference models.py:66-78, ExpenseRecord
# Literal — the 11-value enum gate)
EXPENSE_CATEGORIES = [
    "food", "childcare", "housing", "transportation", "healthcare", "other",
    "civic", "internet_mobile", "required_after_tax", "annual_taxes",
    "required_before_tax",
]


def melt(
    df: DataFrame,
    id_vars: list[str],
    value_vars: list[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """pandas-melt semantics on Spark's built-in unpivot."""
    return df.unpivot(
        [F.col(c) for c in id_vars],
        [F.col(c) for c in value_vars],
        var_name,
        value_name,
    )


def family_config_dim(spark) -> DataFrame:
    from wage_etl_spark.sources.fixtures import fixture_df

    return fixture_df(
        spark, FAMILY_CONFIGS, "family string, adults int, working_adults int, children int"
    )


def canonical_category(col: Column | str) -> Column:
    """Category text -> canonical value via the 17-entry CATEGORY_MAP with
    slug fallback for unknown categories (reference
    normalize_category_column, pandas_ops.py:92-105 + normalizers.py:62-72).
    A literal map expression — folded by Catalyst, never a shuffle."""
    cmap = F.create_map(*[F.lit(x) for kv in CATEGORY_MAP.items() for x in kv])
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(cmap[normalize_category_key(c)], slugify(c))


def base_record_valid() -> Column:
    """The reference's BaseRecord field validators as one explicit predicate
    (models.py:28-50): adults in {1,2} (V2), 1 <= working_adults <= adults
    (V3, the cross-field rule), 0 <= children <= 3 (V4). Spelled rule by
    rule — NOT derived from family-dim membership — so a future dim edit
    cannot silently widen acceptance."""
    return (
        F.col("adults").isin(1, 2)
        & (F.col("working_adults") >= 1)
        & (F.col("working_adults") <= F.col("adults"))
        & F.col("children").between(0, 3)
    )


def wage_record_valid(wage_type: Column, hourly_wage: Column) -> Column:
    """WageRecord gate (models.py:53-63): base rules + canonical wage_type
    enum + non-negative hourly_wage."""
    return (
        base_record_valid()
        & wage_type.isin(*sorted(set(WAGE_TYPES.values())))
        & (hourly_wage >= 0)
    )


def expense_record_valid(expense_category: Column, annual_amount: Column) -> Column:
    """ExpenseRecord gate (models.py:65-87): base rules + 11-value category
    enum + non-negative annual_amount."""
    return (
        base_record_valid()
        & expense_category.isin(*EXPENSE_CATEGORIES)
        & (annual_amount >= 0)
    )


def normalize_wages_wide(
    wide: DataFrame, county_fips: str, page_updated_at: str
) -> DataFrame:
    """The reference's normalize_wages (pandas_ops.py:135-171) as one Spark
    plan: melt family columns -> broadcast-join family dim -> canonicalize
    category -> clean currency -> attach constants. Unknown categories fall
    back to a slug (normalizers.py:72)."""
    spark = wide.sparkSession
    id_vars = [c for c in wide.columns if c.lower() in ("category", "county_fips")]
    value_vars = [c for c in wide.columns if c not in id_vars]
    long = melt(wide, id_vars, value_vars, "family_raw", "raw_value")
    long = long.toDF(*[c.lower() for c in long.columns])

    dim = family_config_dim(spark)
    long = long.withColumn("family", normalize_header("family_raw")).join(
        broadcast(dim), "family", "left"
    )
    return long.select(
        F.lit(county_fips).alias("county_fips"),
        F.to_date(F.lit(page_updated_at)).alias("page_updated_at"),
        F.col("adults"),
        F.col("working_adults"),
        F.col("children"),
        canonical_category(F.col("category")).alias("wage_type"),
        clean_currency("raw_value").alias("hourly_wage"),
    )


def _normalized_long(scanned: DataFrame, table_idx: int) -> DataFrame:
    """Shared front half of both lifecycles: pick one results_table position,
    explode the values map (the melt, U2), header-normalize + broadcast
    family-dim join (F2, J1)."""
    spark = scanned.sparkSession
    picked = (
        scanned.filter(F.col("table_idx") == table_idx)
        if "table_idx" in scanned.columns
        else scanned
    )
    long = picked.select(
        "page_id",
        "category",
        "page_updated_raw",
        F.explode("values").alias("family_raw", "raw_value"),
    )
    return long.withColumn("family", normalize_header("family_raw")).join(
        broadcast(family_config_dim(spark)), "family", "left"
    )


def normalize_scanned_pages(scanned: DataFrame) -> DataFrame:
    """The WAGES half of the extract lifecycle after the HTML scan, fully
    distributed (no per-page driver loop): scan_html_tables output ->
    table_idx 0 (the reference's ``tables[0]`` = wages_data,
    wage_scraper.py:68) -> melt -> family join -> category canonicalize with
    slug fallback (J2/F3/F4) -> currency clean (F1) -> key zero-pad (F5) +
    page-date parse (F6). Mirrors the reference's per-page loop
    main.py:65-103 as one Spark plan over all pages.

    ``valid`` is the explicit WageRecord gate (models.py:28-63) rule by
    rule — see wage_record_valid."""
    long = _normalized_long(scanned, 0)
    wage_type = canonical_category(F.col("category"))
    hourly_wage = clean_currency("raw_value")
    return long.select(
        zfill("page_id", 5).alias("county_fips"),
        parse_updated_date("page_updated_raw").alias("page_updated_at"),
        F.col("adults"),
        F.col("working_adults"),
        F.col("children"),
        wage_type.alias("wage_type"),
        hourly_wage.alias("hourly_wage"),
        F.coalesce(
            wage_record_valid(wage_type, hourly_wage), F.lit(False)
        ).alias("valid"),
    )


def normalize_expense_pages(scanned: DataFrame) -> DataFrame:
    """The EXPENSES half: same lifecycle over the page's SECOND results_table
    (the reference's ``tables[1]`` = expenses_data, wage_scraper.py:69 and
    normalize_expenses, pandas_ops.py:174-212) — value column is
    ``annual_amount`` and the gate is the 11-category ExpenseRecord enum
    (models.py:65-87)."""
    long = _normalized_long(scanned, 1)
    category = canonical_category(F.col("category"))
    annual_amount = clean_currency("raw_value")
    return long.select(
        zfill("page_id", 5).alias("county_fips"),
        parse_updated_date("page_updated_raw").alias("page_updated_at"),
        F.col("adults"),
        F.col("working_adults"),
        F.col("children"),
        category.alias("expense_category"),
        annual_amount.alias("annual_amount"),
        F.coalesce(
            expense_record_valid(category, annual_amount), F.lit(False)
        ).alias("valid"),
    )
