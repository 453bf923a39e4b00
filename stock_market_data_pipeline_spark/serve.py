"""Serving layer (S12, P8-P10) — the dashboard query surface.

The reference's Streamlit pages build SQL strings from widget state
and run them over Snowflake (2_Universe_Screener.py:29-77,
3_Ticker_Momentum.py:46-70, utilities/snowflake_helper.py:42-51); user
input is escaped by hand (P10, :74). Here every query is a
PARAMETERIZED ``spark.sql`` call (named args, Spark >= 3.4) — the
strictly-better injection-safe form the SURVEY mapping calls for —
over registered temp views, returning DataFrames the caller can
``toPandas()`` through Arrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

SCREENER_SQL = """
SELECT ticker, sector, close, rsi, return_m, volatility_ann
FROM {dim}
WHERE {predicates}
ORDER BY return_m DESC, ticker
LIMIT {limit}
"""

TICKER_RANGE_SQL = """
SELECT ticker, trade_date, close, sma_s, sma_m, sma_l, rsi, volume
FROM {fct}
WHERE ticker = :ticker AND trade_date BETWEEN :start AND :end
ORDER BY trade_date
"""

BREADTH_RECENT_SQL = """
SELECT *
FROM {breadth}
ORDER BY trade_date DESC
LIMIT {limit}
"""

FRESHNESS_SQL = """
SELECT (SELECT MAX(trade_date) FROM {breadth}) AS data_through,
       (SELECT COUNT(*) FROM {dim}) AS ticker_count
"""


def _escape_like(term: str) -> str:
    """Neutralize LIKE metacharacters in user input — parameter binding
    prevents SQL injection but not wildcard injection (a '%' in the
    search term would otherwise match everything)."""
    return (term.replace("\\", "\\\\")
            .replace("%", "\\%").replace("_", "\\_"))


def screener(spark: SparkSession, dim_view: str = "dim_securities",
             rsi_lo: float = 0.0, rsi_hi: float = 100.0,
             sectors: list[str] | None = None,
             min_return: float = -1.0,
             ticker_search: str = "",
             ticker_exact=None,
             limit: int = 500) -> DataFrame:
    """P8 + P10: IN list / BETWEEN / >= / ticker-search predicates,
    AND-combined, ordered top-k — all user inputs bound as named
    parameters, LIKE metacharacters escaped.

    ``ticker_search`` is ALWAYS a substring match — the reference
    dashboard's "Ticker Contains" filter is an unconditional ILIKE
    '%term%' (data-viz/pages/2_Universe_Screener.py:73-75), so
    searching "12" must match ticker 1234 even when the term is all
    digits. ``ticker_exact`` is the separate, documented exact-lookup
    API: it binds a TYPED equality on the key (sargable, partition-
    pruning friendly) and never does substring work.

    Predicate hygiene: clauses are assembled only for filters the user
    actually set, so an empty ticker search adds NO clause (the common
    dashboard case carries no per-row cast that would defeat pushdown
    or pruning on the key column). The substring path casts through a
    string form because this test dim is numeric-keyed; on a
    string-keyed deployment the column binds directly with no cast."""
    predicates = [
        "rsi BETWEEN :rsi_lo AND :rsi_hi",
        "(:any_sector OR array_contains(:sectors, sector))",
        "return_m >= :min_return",
    ]
    args: dict = {
        "rsi_lo": rsi_lo, "rsi_hi": rsi_hi,
        "any_sector": sectors is None,
        "sectors": sectors or [],
        "min_return": min_return,
    }
    if ticker_exact is not None:
        predicates.append("ticker = :ticker_eq")
        args["ticker_eq"] = ticker_exact
    elif ticker_search:
        predicates.append("CAST(ticker AS STRING) ILIKE :ticker_pat")
        args["ticker_pat"] = f"%{_escape_like(ticker_search)}%"
    return spark.sql(
        SCREENER_SQL.format(dim=dim_view, limit=int(limit),
                            predicates="\n  AND ".join(predicates)),
        args=args)


def ticker_momentum(spark: SparkSession, ticker,
                    start: str, end: str,
                    fct_view: str = "fct_momentum") -> DataFrame:
    """P9: key + date-range predicate — partition-pruning friendly."""
    return spark.sql(
        TICKER_RANGE_SQL.format(fct=fct_view),
        args={"ticker": ticker, "start": start, "end": end})


def breadth_recent(spark: SparkSession, limit: int = 30,
                   breadth_view: str = "market_breadth") -> DataFrame:
    """O2: recency top-k over the breadth table."""
    return spark.sql(BREADTH_RECENT_SQL.format(
        breadth=breadth_view, limit=int(limit)))


def data_freshness(spark: SparkSession,
                   breadth_view: str = "market_breadth",
                   dim_view: str = "dim_securities") -> DataFrame:
    """The dashboard's freshness caption: data-through date from the
    breadth mart + ticker coverage from the dim
    (data-viz/utilities/dashboard_helpers.py:75-95). Two scalar
    subqueries — each a partial-agg MAX/COUNT, no join, no shuffle of
    table rows — returned as ONE row the caption renders."""
    return spark.sql(FRESHNESS_SQL.format(breadth=breadth_view,
                                          dim=dim_view))
