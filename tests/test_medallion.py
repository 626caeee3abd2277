"""Reference-fidelity tests for the medallion silver transform.

Asserts the conform step reproduces the reference's silver semantics
(``dags/silver/dag_silver_financial_sample.py:65-110``) while FIXING its
cataloged bugs (SURVEY.md §1.2): correct ``gross_sales``/``cogs`` names,
``manufacturing_price`` cast to double, literal (non-regex) currency
scrub order 'R$' then ','.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from projetos_etl_spark.medallion import (
    RENAME_MAP,
    gold_profit_mart,
    require_nonempty,
    silver_conform,
)

RAW_HEADERS = [
    "Segment",
    "Country ",
    " Product",
    "Discount Band",
    " Units Sold ",
    "Manufacturing Price",
    "Sale Price",
    "Gross Sales",
    "Discounts",
    "Sales",
    "COGS",
    "Profit",
    "Date",
    "Month Number",
    "Month Name",
    "Year",
]

ROW = (
    "Government",
    "Canada",
    "Carretera",
    "None",
    1618.5,
    "$3.00",
    "R$20.00",
    "R$32,370.00",
    "R$0.00",
    "R$32,370.00",
    "R$16,185.00",
    "R$16,185.00",
    "2014-01-01",
    1,
    "January",
    2014,
)


@pytest.fixture(scope="module")
def silver(spark):
    raw = spark.createDataFrame([ROW], RAW_HEADERS)
    return silver_conform(raw)


def test_headers_stripped_and_renamed(silver):
    # Exactly the reference's snake_case map with both typos fixed:
    # gross_sales (not gross_sale, silver:93) and cogs (not gocs, silver:96).
    assert set(silver.columns) == set(RENAME_MAP.values()) | {"ingestion_date"}


def test_currency_columns_are_double(silver):
    schema = {f.name: f.dataType for f in silver.schema.fields}
    for col in (
        "manufacturing_price",  # the reference forgot this cast (silver:76)
        "sale_price",
        "gross_sales",
        "discounts",
        "sales",
        "cogs",
        "profit",
    ):
        assert schema[col] == T.DoubleType(), col


def test_scrub_values_literal_semantics(silver):
    row = silver.collect()[0]
    assert row.manufacturing_price == 3.0
    assert row.sale_price == 20.0
    assert row.gross_sales == 32370.0  # 'R$32,370.00' -> strip R$ then ','
    assert row.cogs == 16185.0
    assert row.units_sold == 1618.5


def test_ingestion_timestamp_kept_as_timestamp(silver):
    # The reference stuffs a timestamp into a DATE column (silver:73 vs
    # silver:190); we keep TimestampType precision.
    schema = {f.name: f.dataType for f in silver.schema.fields}
    assert schema["ingestion_date"] == T.TimestampType()


def test_empty_guard_raises(spark):
    raw = spark.createDataFrame([ROW], RAW_HEADERS)
    with pytest.raises(ValueError, match="empty"):
        require_nonempty(silver_conform(raw.limit(0)))


def test_gold_rollup_has_grand_total(spark):
    raw = spark.createDataFrame([ROW, ROW], RAW_HEADERS)
    silver = silver_conform(raw)
    mart = gold_profit_mart(silver)
    rows = {(r.segment, r.year): r for r in mart.collect()}
    assert rows[("ALL", -1)].n_rows == 2
    assert rows[("ALL", -1)].total_profit == 32370.0
    assert rows[("Government", 2014)].total_sales == 64740.0
