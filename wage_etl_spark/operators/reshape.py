"""Reshaping: the reference's melt/unpivot (wide -> long) and its
map-lookup "joins" as broadcast dimension joins.

Reference: `df.melt(id_vars, value_vars, 'family', 'value')` is THE reshape
of Wage-ETL (/root/reference/src/transform/pandas_ops.py:124-132, docs
src/transform/README.md:125); the family-config and category lookups are
12/17-entry dict lookups applied columnwise
(/root/reference/src/transform/normalizers.py:36-72, constants.py:5-44).

Spark-first mapping: built-in ``DataFrame.unpivot`` (no UDTF needed) and
``broadcast()`` hash joins against literal dimension frames — at scale the
dimension side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast

from wage_etl_spark.functions.cleaning import (
    clean_currency, normalize_header, parse_updated_date, slugify, zfill,
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

# canonical wage categories (reference models.py:54)
WAGE_TYPES = {"living wage": "living", "poverty wage": "poverty", "minimum wage": "minimum"}


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
    return spark.createDataFrame(
        FAMILY_CONFIGS, "family string, adults int, working_adults int, children int"
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
    wage_map = F.create_map(*[F.lit(x) for kv in WAGE_TYPES.items() for x in kv])
    return long.select(
        F.lit(county_fips).alias("county_fips"),
        F.to_date(F.lit(page_updated_at)).alias("page_updated_at"),
        F.col("adults"),
        F.col("working_adults"),
        F.col("children"),
        F.coalesce(
            wage_map[F.lower(F.col("category"))], slugify(F.col("category"))
        ).alias("wage_type"),
        clean_currency("raw_value").alias("hourly_wage"),
    )


def normalize_scanned_pages(scanned: DataFrame) -> DataFrame:
    """The full extract lifecycle after the HTML scan, fully distributed
    (no per-page driver loop): scan_html_tables output (page_id, category,
    values map, page_updated_raw) -> explode the map (the melt, U2) ->
    header normalize + broadcast family-dim join (F2, J1) -> category
    canonicalize with slug fallback (J2, F3, F4) -> currency clean (F1) ->
    key zero-pad (F5) + page-date parse (F6). Mirrors the reference's
    per-page loop main.py:65-103 as one Spark plan over all pages.

    ``valid`` marks rows passing the model gate (known family config +
    canonical wage category — reference models.py:28-54)."""
    spark = scanned.sparkSession
    dim = family_config_dim(spark)
    long = scanned.select(
        "page_id",
        "category",
        "page_updated_raw",
        F.explode("values").alias("family_raw", "raw_value"),
    )
    long = long.withColumn("family", normalize_header("family_raw")).join(
        broadcast(dim), "family", "left"
    )
    wage_map = F.create_map(*[F.lit(x) for kv in WAGE_TYPES.items() for x in kv])
    wage_type = F.coalesce(wage_map[F.lower(F.col("category"))], slugify(F.col("category")))
    return long.select(
        zfill("page_id", 5).alias("county_fips"),
        parse_updated_date("page_updated_raw").alias("page_updated_at"),
        F.col("adults"),
        F.col("working_adults"),
        F.col("children"),
        wage_type.alias("wage_type"),
        clean_currency("raw_value").alias("hourly_wage"),
        (
            F.col("adults").isNotNull()
            & wage_type.isin(*sorted(set(WAGE_TYPES.values())))
        ).alias("valid"),
    )
