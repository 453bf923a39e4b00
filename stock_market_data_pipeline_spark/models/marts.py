"""Marts layer — the analytics heart of the engine.

fct_trading_momentum      ~ models/marts/fct_trading_momentum.sql
agg_daily_market_breadth  ~ models/marts/agg_daily_market_breadth.sql
dim_securities_current    ~ models/marts/dim_securities_current.sql

Window lengths are parameterized (IndicatorParams) with the reference's
defaults; tests also run scaled-down params so the non-NULL paths are
exercised on small fixtures. Output column names are neutral (sma_s
rather than sma_20) so one name set serves every parameterization.

Scale design: all per-ticker window columns in fct share ONE WindowSpec
partitioning (ticker, ordered by trade_date) -> Spark evaluates them in a
single Window operator after a single shuffle, the analog of the
reference's cluster_by=['ticker'] (fct_trading_momentum.sql:5). The
breadth aggregate reduces to day grain (~250 rows/year) before its global
ordered windows, so the single-partition A/D-line window (W12) is cheap
at any fact scale.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import indicators as ind
from ..functions.indicators import flag


@dataclass(frozen=True)
class IndicatorParams:
    """Window lengths; defaults are the reference's
    (fct_trading_momentum.sql: SMA 20/50/200, 252-row 52-week band,
    14-row RSI, 20-row relative volume)."""
    sma_s: int = 20
    sma_m: int = 50
    sma_l: int = 200
    high_low: int = 252
    rsi_n: int = 14
    rel_vol: int = 20
    # dim_securities_current lookbacks (macros/calculate_return.sql call
    # sites: 1w/1m/3m/"ytd" = 5/21/63/252 trading-day rows)
    ret_short: int = 5
    ret_mid: int = 21
    ret_long: int = 63
    ret_year: int = 252
    vol_window: int = 20  # volatility aggregate, last 20 rows/ticker


#: scaled-down params for small fixtures (documents the ratio, not magic)
SMALL = IndicatorParams(sma_s=3, sma_m=5, sma_l=10, high_low=15, rsi_n=4,
                        rel_vol=5, ret_short=2, ret_mid=5, ret_long=10,
                        ret_year=15, vol_window=5)


def fct_trading_momentum(universe_daily: DataFrame,
                         p: IndicatorParams = IndicatorParams(),
                         valid_only: bool = False) -> DataFrame:
    """Per (ticker, trade_date) indicator fact (W1-W8 of SURVEY.md §2.5).

    ``universe_daily`` needs: ticker, trade_date, close, volume,
    prev_close (+ passthrough company/sector if present).
    ``valid_only`` applies the reference's incremental-run filter
    ``is_valid_record = 1`` (fct_trading_momentum.sql:213).
    """
    df = universe_daily
    if valid_only:
        df = df.where(F.col("is_valid_record") == 1)

    ordered = Window.partitionBy("ticker").orderBy("trade_date")
    w_s = ind.rolling_window("ticker", "trade_date", p.sma_s)
    w_m = ind.rolling_window("ticker", "trade_date", p.sma_m)
    w_l = ind.rolling_window("ticker", "trade_date", p.sma_l)
    w_hl = ind.rolling_window("ticker", "trade_date", p.high_low)
    w_rsi = ind.rolling_window("ticker", "trade_date", p.rsi_n)
    w_rv = ind.rolling_window("ticker", "trade_date", p.rel_vol)

    close, volume = F.col("close"), F.col("volume")
    prev_close = F.col("prev_close")
    avg_gain, avg_loss = ind.avg_gain_loss(close, prev_close, w_rsi, p.rsi_n)

    out = (
        df.withColumn("yesterday_close", F.lag("close", 1).over(ordered))
        .withColumn("sma_s", ind.guarded_sma(close, w_s, p.sma_s))
        .withColumn("sma_m", ind.guarded_sma(close, w_m, p.sma_m))
        .withColumn("sma_l", ind.guarded_sma(close, w_l, p.sma_l))
        .withColumn("roll_high", ind.guarded_max(close, w_hl, p.high_low))
        .withColumn("roll_low", ind.guarded_min(close, w_hl, p.high_low))
        .withColumn("avg_gain", avg_gain)
        .withColumn("avg_loss", avg_loss)
        .withColumn("rel_volume", ind.relative_volume(volume, w_rv, p.rel_vol))
    )
    # crossovers compare lagged values of already-computed columns -> a
    # second pass over the same (reused) window partitioning
    out = (
        out.withColumn("rsi", ind.rsi(F.col("avg_gain"), F.col("avg_loss")))
        .withColumn("bullish_crossover",
                    ind.crossover(close, F.col("sma_s"), ordered))
        .withColumn("bearish_crossover",
                    ind.crossover(F.col("sma_s"), close, ordered))
        .withColumn("golden_cross",
                    ind.crossover(F.col("sma_m"), F.col("sma_l"), ordered))
        .withColumn("death_cross",
                    ind.crossover(F.col("sma_l"), F.col("sma_m"), ordered))
        .withColumn("is_new_high", flag(close == F.col("roll_high")))
        .withColumn("is_new_low", flag(close == F.col("roll_low")))
    )
    return out


def agg_daily_market_breadth(fct: DataFrame,
                             p: IndicatorParams = IndicatorParams(),
                             smooth_n: int = 10) -> DataFrame:
    """One row per trade_date: breadth counts, ratios, A/D line,
    smoothed high/low index (A1-A3, W12-W13, J4, O1).

    Mirrors agg_daily_market_breadth.sql: advances/declines/unchanged vs
    yesterday_close, conditional volume sums, new highs/lows from the
    rolling band, pct-above-SMA ratios, AVG(rsi), unbounded running
    SUM(advances-declines) ordered by day, 10-day smoothed
    high/(high+low) index.
    """
    close, vol, prev = F.col("close"), F.col("volume"), F.col("yesterday_close")

    base = fct.groupBy("trade_date").agg(
        F.countDistinct("ticker").alias("stocks_traded"),
        F.sum(flag(prev.isNotNull() & (close > prev))).alias("advances"),
        F.sum(flag(prev.isNotNull() & (close < prev))).alias("declines"),
        F.sum(flag(prev.isNotNull() & (close == prev))).alias("unchanged"),
        F.sum(F.when(prev.isNotNull() & (close > prev), vol)
              .otherwise(F.lit(0))).alias("advancing_volume"),
        F.sum(F.when(prev.isNotNull() & (close < prev), vol)
              .otherwise(F.lit(0))).alias("declining_volume"),
        F.sum(vol).alias("total_volume"),
        F.sum(F.when(F.col("roll_high").isNotNull(),
                     flag(close == F.col("roll_high")))
              .otherwise(F.lit(0))).alias("new_highs"),
        F.sum(F.when(F.col("roll_low").isNotNull(),
                     flag(close == F.col("roll_low")))
              .otherwise(F.lit(0))).alias("new_lows"),
        (F.sum(flag(close > F.col("sma_s"))) / F.count(close))
        .alias("pct_above_sma_s"),
        (F.sum(flag(close > F.col("sma_m"))) / F.count(close))
        .alias("pct_above_sma_m"),
        (F.sum(flag(close > F.col("sma_l"))) / F.count(close))
        .alias("pct_above_sma_l"),
        F.avg("rsi").alias("market_rsi"),
    )

    # Day-grain global windows: input is already one row per trading day,
    # so the single-partition sort is over ~250 rows/year regardless of
    # fact scale (SURVEY.md §2.5 W12 note).
    w_run = Window.orderBy("trade_date").rowsBetween(
        Window.unboundedPreceding, 0)
    w_smooth = Window.orderBy("trade_date").rowsBetween(-(smooth_n - 1), 0)

    hl_denom = F.col("new_highs") + F.col("new_lows")
    return (
        base.withColumn(
            "net_advances", F.col("advances") - F.col("declines"))
        .withColumn("ad_line", F.sum(
            F.col("advances") - F.col("declines")).over(w_run))
        .withColumn("ad_ratio", F.when(
            F.col("declines") != 0,
            F.col("advances") / F.col("declines")))
        .withColumn("ad_percentage",
                    (F.col("advances") + F.col("declines")
                     + F.col("unchanged")) / F.col("stocks_traded"))
        .withColumn("high_low_ratio",
                    F.when(hl_denom != 0, F.col("new_highs") / hl_denom))
        .withColumn("high_low_index_smoothed", F.avg(
            F.when(hl_denom != 0,
                   F.col("new_highs") / hl_denom)).over(w_smooth))
        .orderBy("trade_date")
    )


def dim_securities_current(fct: DataFrame,
                           p: IndicatorParams = IndicatorParams(),
                           reuse_input: bool = False) -> DataFrame:
    """One row per ticker, as of the latest trade_date in the fact
    (dim_securities_current.sql; W6, W11, W14-W15, A4-A7, J5-J6).

    Assembled exactly like the reference: latest snapshot per ticker
    (QUALIFY top-1) LEFT JOIN lookback returns / trading-day counts /
    volatility metrics / last-signal dates, then whole-universe
    percent_rank with NULL segregation and per-sector analytic AVG.

    The fact is consumed exactly ONCE: the return/recency window stage
    feeds a single per-ticker aggregate that computes the latest-row
    values (MAX over the rank-1 row), the trailing metrics, and the
    signal dates together — the reference's four CTE scans
    (dim_securities_current.sql:40-154) collapse into one pass, and
    the global-latest-date filter runs over the ticker-grain output.
    ``reuse_input=True`` caches the fact for callers that consume it
    again elsewhere; the dim itself no longer needs it.
    """
    if reuse_input:
        fct = fct.cache()
    ordered = Window.partitionBy("ticker").orderBy("trade_date")

    # ONE window pass computes the lag returns AND the recency rank the
    # trailing-window aggregates need (same partitioning, so both
    # orderings share one exchange)
    w_tail = Window.partitionBy("ticker").orderBy(F.col("trade_date").desc())
    with_returns = (
        fct.withColumn("return_s", ind.lag_return(F.col("close"), ordered, p.ret_short))
        .withColumn("return_m", ind.lag_return(F.col("close"), ordered, p.ret_mid))
        .withColumn("return_l", ind.lag_return(F.col("close"), ordered, p.ret_long))
        .withColumn("return_y", ind.lag_return(F.col("close"), ordered, p.ret_year))
        .withColumn("__rn_desc", F.row_number().over(w_tail))
    )

    # J6 + QUALIFY-top-1 + A4-A6 all FUSED into ONE per-ticker
    # aggregate pass. The reference runs latest-row selection and
    # three metric CTEs as four scans (dim_securities_current.sql:
    # 40-154); round-2 r1 fused the three CTEs; this fuses the
    # latest-row extraction too: every "value at the newest row"
    # column is MAX(CASE WHEN rn_desc = 1 THEN col END) inside the
    # same groupBy (exactly one row matches, so MAX is identity and
    # NULL-safe). The global-latest-date filter (J6) then runs as a
    # single-partition window over the TICKER-GRAIN output instead of
    # a third scalar-aggregate pass over the fact — the whole dim now
    # costs ONE momentum-pipeline evaluation instead of two full + one
    # pruned (measured 5.2s -> ~3s at sf0.1).
    passthrough = [c for c in ("company", "sector") if c in fct.columns]
    rn1 = F.col("__rn_desc") == 1
    at_latest = [
        F.max(F.when(rn1, F.col(c))).alias(c)
        for c in ("close", "volume", "sma_s", "sma_m", "sma_l",
                  "roll_high", "roll_low", "rsi",
                  "return_s", "return_m", "return_l", "return_y",
                  *passthrough)
    ]
    in_tail = F.col("__rn_desc") <= p.vol_window
    log_ret = F.when(
        in_tail
        & F.col("prev_close").isNotNull() & (F.col("prev_close") != 0)
        & (F.col("close") / F.col("prev_close") > 0),
        F.log(F.col("close") / F.col("prev_close")))
    per_ticker = with_returns.groupBy("ticker").agg(
        F.max("trade_date").alias("trade_date"),
        *at_latest,
        # A4 over the trailing vol_window rows
        (F.stddev_samp(log_ret) * F.lit(math.sqrt(252)))
        .alias("volatility_ann"),
        F.avg(F.when(in_tail, F.col("volume"))).alias("avg_volume"),
        F.sum(F.when(in_tail, 1).otherwise(0)).cast("long")
        .alias("window_rows"),
        # A5 — trading-day count. The fact is (ticker, trade_date)
        # KEY-GRAIN by construction (bars_from_lineitem groupBy +
        # grain-preserving windows), so COUNT(*) == COUNT(DISTINCT
        # trade_date); the distinct form would force an Expand +
        # SortAggregate plan, while plain COUNT keeps the whole
        # aggregate hashable (measured SortAggregate->HashAggregate
        # flip; the oracle makes the same grain assumption)
        F.count(F.lit(1)).cast("long").alias("trading_days"),
        # A6
        F.coalesce(
            F.max(F.when(F.col("golden_cross") == 1, F.col("trade_date"))),
            F.min(F.when(F.col("sma_l").isNotNull(), F.col("trade_date"))),
        ).alias("last_golden_cross"),
        F.coalesce(
            F.max(F.when(F.col("death_cross") == 1, F.col("trade_date"))),
            F.min(F.when(F.col("sma_l").isNotNull(), F.col("trade_date"))),
        ).alias("last_death_cross"),
        F.max(F.when(F.col("bullish_crossover") == 1, F.col("trade_date")))
        .alias("last_bullish_crossover"),
    )

    # J5 collapses entirely: latest-row values and per-ticker metrics
    # come out of the same aggregate, so there is nothing to join.
    # J6: keep only tickers whose newest row IS the global newest date
    # — a window max over the ticker-grain frame (thousands of rows),
    # not another pass over the fact.
    dim = (
        per_ticker.withColumn(
            "__max_d", F.max("trade_date").over(Window.partitionBy()))
        .where(F.col("trade_date") == F.col("__max_d"))
        .drop("__max_d")
        .select("ticker", "trade_date", "close", "volume",
                "sma_s", "sma_m", "sma_l", "roll_high", "roll_low", "rsi",
                "return_s", "return_m", "return_l", "return_y",
                *passthrough,
                "volatility_ann", "avg_volume", "window_rows",
                "trading_days", "last_golden_cross", "last_death_cross",
                "last_bullish_crossover")
    )

    # W15: percent_rank across the whole universe, NULL rows segregated
    # into their own partition and nulled out (reference semantics:
    # ranks across ALL tickers, not per sector — SURVEY.md §4 gotcha 6)
    notnull_flag = F.when(F.col("return_m").isNotNull(), 1).otherwise(0)
    w_rank = Window.partitionBy(notnull_flag).orderBy("return_m")
    dim = dim.withColumn(
        "performance_percentile",
        F.when(F.col("return_m").isNotNull(),
               F.percent_rank().over(w_rank)))

    # W14: whole-partition analytic AVG per sector (no ORDER BY)
    if "sector" in fct.columns:
        dim = dim.withColumn(
            "sector_return_m",
            F.avg("return_m").over(Window.partitionBy("sector")))

    # days_since_* via calendar DATEDIFF from the snapshot date
    dim = (
        dim.withColumn("days_since_golden_cross",
                       F.datediff(F.col("trade_date"),
                                  F.col("last_golden_cross")).cast("long"))
        .withColumn("days_since_death_cross",
                    F.datediff(F.col("trade_date"),
                               F.col("last_death_cross")).cast("long"))
    )
    return dim
