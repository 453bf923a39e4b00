"""Serving-layer semantics (S12, P8-P10): the screener's ticker search
must match the reference dashboard's "Ticker Contains" filter — an
unconditional substring ILIKE (2_Universe_Screener.py:73-75) — for ALL
inputs, including all-digit terms; exact lookup is a separate,
explicit API."""

from __future__ import annotations

import pytest

from stock_market_data_pipeline_spark.serve import screener


@pytest.fixture(scope="module")
def dim_view(spark):
    df = spark.createDataFrame(
        [(12, "Brand#11", 10.0, 50.0, 0.10, 0.2),
         (1234, "Brand#11", 11.0, 50.0, 0.20, 0.2),
         (512, "Brand#12", 12.0, 50.0, 0.30, 0.2),
         (7, "Brand#12", 13.0, 50.0, 0.40, 0.2)],
        "ticker int, sector string, close double, rsi double, "
        "return_m double, volatility_ann double")
    df.createOrReplaceTempView("dim_securities_servetest")
    return "dim_securities_servetest"


def test_digit_search_is_substring_contains(spark, dim_view):
    """ADVICE r3 (low): searching '12' must match 12, 1234 AND 512 —
    the reference's contains filter, not exact equality."""
    got = sorted(r.ticker for r in
                 screener(spark, dim_view=dim_view,
                          ticker_search="12").collect())
    assert got == [12, 512, 1234]


def test_exact_lookup_is_a_separate_typed_api(spark, dim_view):
    got = [r.ticker for r in
           screener(spark, dim_view=dim_view, ticker_exact=12).collect()]
    assert got == [12]


def test_like_metacharacters_are_escaped(spark, dim_view):
    got = [r.ticker for r in
           screener(spark, dim_view=dim_view, ticker_search="%").collect()]
    assert got == []


def test_empty_search_adds_no_clause(spark, dim_view):
    got = screener(spark, dim_view=dim_view).count()
    assert got == 4
