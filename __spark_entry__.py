"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``stock_market_data_pipeline_spark``; this file
is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (README.md:381-389 "latest golden crosses" analog):
    full momentum indicator fact on sf0.001, most recent signals first."""
    from pyspark.sql import functions as F

    from stock_market_data_pipeline_spark.catalog import QUERIES

    fct = QUERIES["fct_trading_momentum_small"](spark, SF0001)
    # bounded top-k (TakeOrderedAndProject) — the reference's display
    # queries all carry LIMIT (data-viz/streamlit_app.py:28); an
    # unbounded global sort would be a full distributed sort at scale
    return fct.orderBy(
        F.desc("golden_cross"), F.desc("bullish_crossover"),
        F.desc("trade_date"), F.asc("ticker")).limit(5000)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from stock_market_data_pipeline_spark.catalog import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from stock_market_data_pipeline_spark.catalog import ORACLES
    return dict(ORACLES)
