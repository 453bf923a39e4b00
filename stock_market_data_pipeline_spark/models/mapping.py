"""TPC-H -> market-data shape mapping (FIXTURES.md "Mapping to driver
testdata"): lineitem plays the daily-bars fact (l_partkey -> ticker,
l_shipdate -> trade_date), part plays the constituent dimension.

Every expression here is chosen to be FP-deterministic across engines so
the DuckDB oracle hash-matches bit-for-bit where possible:
- close = (min+max)/2 — min/max are exact, halving is exact;
- volume = SUM(l_quantity) of integer-valued doubles — exact;
- synthetic dimension attributes derive from integer modulo arithmetic.

The matching DuckDB SQL text for these views lives in
``catalog_sql.BARS_SQL`` / ``CONSTITUENTS_SQL``; keep the two in sync.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..models.staging import stack_constituent_snapshots
from datetime import date


def bars_from_lineitem(lineitem: DataFrame) -> DataFrame:
    """One OHLCV-style bar per (l_partkey, ship date).

    Aggregating to the (ticker, trade_date) grain both mirrors
    bar-construction from trades and guarantees a unique window ordering
    key, so every downstream LAG/rolling result is deterministic.
    """
    from ..functions.indicators import flag

    price = F.col("l_extendedprice")
    bars = (
        lineitem.groupBy(
            F.col("l_partkey").alias("ticker"),
            F.col("l_shipdate").cast("date").alias("trade_date"),
        )
        .agg(
            F.min(price).alias("low"),
            F.max(price).alias("high"),
            ((F.min(price) + F.max(price)) / F.lit(2.0)).alias("close"),
            F.sum("l_quantity").cast("long").alias("volume"),
            F.count(F.lit(1)).alias("n_trades"),
        )
    )
    # staging flags (P3/P4, stg_daily_stocks.sql:13-23): has_volume and a
    # multi-predicate validity flag. volume >= 3 plays the "enough data to
    # trust the bar" predicate so is_valid_record=0 actually occurs on the
    # synthetic universe (pure OHLC sanity is true by construction here).
    low, high, close, vol = (F.col(c) for c in ["low", "high", "close", "volume"])
    return (
        bars.withColumn("has_volume", flag(vol > 0))
        .withColumn("is_valid_record",
                    flag((low > 0) & (high > 0) & (close >= low)
                         & (close <= high) & (vol >= 3)))
    )


def universe_daily_from_tpch(spark: SparkSession, sf_dir: str,
                             broadcast_dim: bool = True) -> DataFrame:
    """bars + synthetic constituents -> int_universe_daily-shaped frame."""
    import os
    from ..models.intermediate import int_universe_daily

    lineitem = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    part = spark.read.parquet(os.path.join(sf_dir, "part.parquet"))
    return int_universe_daily(
        bars_from_lineitem(lineitem),
        constituents_from_part(part),
        broadcast_dim=broadcast_dim,
    )


#: the four membership snapshots: (valid_from, valid_to, excluded
#: p_partkey residue mod 10).  Four snapshots with three churn
#: boundaries (~10% of tickers each) mirror the reference's four
#: Russell seed files with their contiguous validity intervals
#: (stg_russell3000__constituents.sql:18-52), so the as-of join (J1)
#: and is_new_to_index flag (W10) have observable effects at every
#: boundary.
SNAPSHOT_SPECS: list[tuple[date, date | None, int]] = [
    (date(1992, 1, 1), date(1993, 12, 31), 0),
    (date(1994, 1, 1), date(1995, 12, 31), 1),
    (date(1996, 1, 1), date(1997, 6, 30), 2),
    (date(1997, 7, 1), None, 3),
]


def constituents_from_part(part: DataFrame) -> DataFrame:
    """Four deterministic membership snapshots with validity intervals
    (see :data:`SNAPSHOT_SPECS`): snapshot k covers parts with
    p_partkey % 10 != k, so each boundary drops one residue class and
    re-admits the previous one — the 4-way UNION ALL stack of
    stg_russell3000__constituents.sql:18-52.
    """
    base = part.select(
        F.col("p_partkey").alias("ticker"),
        F.col("p_name").alias("company"),
        F.col("p_brand").alias("sector"),
        ((F.col("p_partkey") % 97) / F.lit(10.0)).alias("index_weight"),
    )
    return stack_constituent_snapshots([
        (base.where(F.col("ticker") % 10 != excluded), valid_from, valid_to)
        for valid_from, valid_to, excluded in SNAPSHOT_SPECS
    ])
