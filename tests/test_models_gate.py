"""Rule-by-rule record-gate parity with the reference's Pydantic models
(/root/reference/src/transform/models.py:28-87, exercised by the reference's
tests/unit/test_transform_models.py): BaseRecord V2-V4 (adults in {1,2},
1 <= working_adults <= adults, children 0-3), the WageRecord wage-type enum
+ non-negative wage, and the ExpenseRecord 11-category enum + non-negative
amount — each as an explicit Column predicate, NOT derived from family-dim
membership, so a dim edit can't silently widen acceptance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wage_etl_spark.operators.reshape import (
    EXPENSE_CATEGORIES, base_record_valid, expense_record_valid,
    wage_record_valid,
)


def _base_valid(spark, adults, working_adults, children):
    df = spark.createDataFrame(
        [(adults, working_adults, children)],
        "adults int, working_adults int, children int",
    )
    out = df.select(F.coalesce(base_record_valid(), F.lit(False)).alias("v"))
    return out.first()["v"]


@pytest.mark.parametrize(
    "adults,working,children,expect",
    [
        (1, 1, 0, True),          # test_valid_base_record
        (2, 2, 3, True),
        (3, 1, 0, False),         # adults_invalid_value (V2)
        (0, 1, 0, False),
        (2, 0, 0, False),         # working_adults_less_than_one (V3)
        (1, 2, 0, False),         # working_adults_exceeds_adults (V3 cross-field)
        (1, 1, -1, False),        # children_invalid_negative (V4)
        (1, 1, 4, False),         # children_invalid_too_many (V4)
        (None, 1, 0, False),      # unknown family config -> nulls -> invalid
    ],
)
def test_base_record_rules(spark, adults, working, children, expect):
    assert _base_valid(spark, adults, working, children) is expect


def _wage_valid(spark, wage_type, hourly_wage):
    df = spark.createDataFrame(
        [(1, 1, 0, wage_type, hourly_wage)],
        "adults int, working_adults int, children int, wage_type string, hourly_wage double",
    )
    return df.select(
        F.coalesce(
            wage_record_valid(F.col("wage_type"), F.col("hourly_wage")), F.lit(False)
        ).alias("v")
    ).first()["v"]


@pytest.mark.parametrize(
    "wage_type,wage,expect",
    [
        ("living", 18.71, True),      # test_valid_wage_record
        ("poverty", 0.0, True),       # test_wage_record_zero_wage
        ("minimum", 15.13, True),
        ("typical_expenses", 10.0, False),  # test_wage_record_invalid_type (slug)
        ("living", -1.0, False),      # test_wage_record_negative_wage
    ],
)
def test_wage_record_rules(spark, wage_type, wage, expect):
    assert _wage_valid(spark, wage_type, wage) is expect


def _expense_valid(spark, category, amount):
    df = spark.createDataFrame(
        [(1, 1, 0, category, amount)],
        "adults int, working_adults int, children int, expense_category string, annual_amount double",
    )
    return df.select(
        F.coalesce(
            expense_record_valid(F.col("expense_category"), F.col("annual_amount")),
            F.lit(False),
        ).alias("v")
    ).first()["v"]


@pytest.mark.parametrize("cat", EXPENSE_CATEGORIES)
def test_every_expense_category_accepted(spark, cat):
    assert _expense_valid(spark, cat, 100.0) is True  # test_valid_expense_record


@pytest.mark.parametrize(
    "cat,amount,expect",
    [
        ("food", 0.0, True),        # test_expense_record_zero_amount
        ("broadband", 10.0, False),  # test_expense_record_invalid_category
        ("food", -5.0, False),      # test_expense_record_negative_amount
    ],
)
def test_expense_record_edge_rules(spark, cat, amount, expect):
    assert _expense_valid(spark, cat, amount) is expect


def test_expense_enum_matches_reference_model():
    """The 11-value Literal in /root/reference/src/transform/models.py:66-78."""
    assert sorted(EXPENSE_CATEGORIES) == sorted(
        [
            "food", "childcare", "housing", "transportation", "healthcare",
            "other", "civic", "internet_mobile", "required_after_tax",
            "annual_taxes", "required_before_tax",
        ]
    )
    assert len(EXPENSE_CATEGORIES) == 11
