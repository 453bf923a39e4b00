"""DuckDB oracle SQL builders.

Each function returns ANSI-ish SQL that DuckDB runs over the same parquet
tables, mirroring the Spark models expression-by-expression (same NULL
guards, same 0/1 flag semantics, same rounding). These are the dbt-macro
analog on the oracle side: one source of truth per operator, composed
into full model queries.

Cross-engine determinism rules used throughout (SURVEY.md §8.6):
- hash-compared SUM/AVG of doubles go through EXACT decimal sums
  (``SUM(CAST(x AS DECIMAL(18,k)))``) on both engines, then one cast
  to double and one division — association-order-independent, so no
  ROUND is needed (and none is applied: rounding half-boundary doubles
  is itself engine-divergent);
- genuinely inexact scalars (stddev, log-return ratios, percent_rank
  products) are ROUND()ed identically on both sides — safe because
  their values don't sit on decimal boundaries;
- integer aggregates are CAST(... AS BIGINT) because DuckDB
  SUM(INTEGER) returns HUGEINT while Spark returns LongType;
- ROW_NUMBER/derived ints are BIGINT on both sides.
"""

from __future__ import annotations

from datetime import date

from .models.mapping import SNAPSHOT_SPECS
from .models.marts import IndicatorParams

# ---------------------------------------------------------------- bases

BARS_SQL = """
SELECT *,
       CASE WHEN volume > 0 THEN 1 ELSE 0 END AS has_volume,
       CASE WHEN low > 0 AND high > 0 AND close >= low AND close <= high
                 AND volume >= 3 THEN 1 ELSE 0 END AS is_valid_record
FROM (
  SELECT l_partkey AS ticker,
         CAST(l_shipdate AS DATE) AS trade_date,
         MIN(l_extendedprice) AS low,
         MAX(l_extendedprice) AS high,
         (MIN(l_extendedprice) + MAX(l_extendedprice)) / 2.0 AS close,
         CAST(SUM(l_quantity) AS BIGINT) AS volume,
         COUNT(*) AS n_trades
  FROM lineitem
  GROUP BY 1, 2
)
""".strip()

def _constituents_sql() -> str:
    """4-way UNION ALL snapshot stack, generated from the SAME
    ``SNAPSHOT_SPECS`` the Spark side uses (models/mapping.py) — one
    source of truth for the membership rule and validity intervals
    (stg_russell3000__constituents.sql:18-52 analog)."""
    branches = []
    for valid_from, valid_to, excluded in SNAPSHOT_SPECS:
        vt = valid_to or date(9999, 12, 31)
        branches.append(
            "SELECT p_partkey AS ticker, p_name AS company,"
            " p_brand AS sector,\n"
            "       (p_partkey % 97) / CAST(10 AS DOUBLE) AS index_weight,\n"
            f"       DATE '{valid_from}' AS valid_from,"
            f" DATE '{vt}' AS valid_to\n"
            f"FROM part WHERE p_partkey % 10 != {excluded}")
    return "\nUNION ALL\n".join(branches)


CONSTITUENTS_SQL = _constituents_sql()

UNIVERSE_SQL = f"""
WITH bars AS ({BARS_SQL}),
cons AS ({CONSTITUENTS_SQL}),
dedup AS (SELECT DISTINCT * FROM bars),
joined AS (
  SELECT f.*, c.company, c.sector, c.index_weight
  FROM dedup f
  JOIN cons c
    ON f.ticker = c.ticker
   AND f.trade_date BETWEEN c.valid_from AND c.valid_to
)
SELECT j.*,
       LAG(close) OVER w AS prev_close,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS consecutive_trading_days,
       CASE WHEN LAG(ticker) OVER w IS NULL THEN 1 ELSE 0 END AS is_new_to_index
FROM joined j
WINDOW w AS (PARTITION BY ticker ORDER BY trade_date)
""".strip()


def momentum_core_sql(p: IndicatorParams, valid_only: bool = False,
                      universe_sql: str | None = None) -> str:
    """CTE chain ending in unrounded momentum columns (table ``t3``).

    ``valid_only`` mirrors the reference's incremental-run filter
    ``is_valid_record = 1`` (fct_trading_momentum.sql:213): applied to
    the fact source BEFORE the indicator windows, so warmup counts run
    over valid rows only — exactly what the Spark model does.

    ``universe_sql`` overrides the universe CTE (default: the sf-table
    universe) — the daily-pipeline entry feeds the synthetic-ingest
    universe through the SAME indicator SQL, one source of truth for
    the momentum math whatever the fact source.
    """
    src = ("(SELECT * FROM universe WHERE is_valid_record = 1)"
           if valid_only else "universe")
    return f"""
WITH universe AS ({universe_sql or UNIVERSE_SQL}),
t2 AS (
  SELECT *,
    LAG(close) OVER ord AS yesterday_close,
    -- decimal SUM / n instead of double AVG: exact, association-order-
    -- independent, bit-identical to the Spark side (indicators.exact_sum)
    CASE WHEN COUNT(close) OVER w_s >= {p.sma_s} THEN
      CAST(SUM(CAST(close AS DECIMAL(18,6))) OVER w_s AS DOUBLE) / {p.sma_s} END AS sma_s,
    CASE WHEN COUNT(close) OVER w_m >= {p.sma_m} THEN
      CAST(SUM(CAST(close AS DECIMAL(18,6))) OVER w_m AS DOUBLE) / {p.sma_m} END AS sma_m,
    CASE WHEN COUNT(close) OVER w_l >= {p.sma_l} THEN
      CAST(SUM(CAST(close AS DECIMAL(18,6))) OVER w_l AS DOUBLE) / {p.sma_l} END AS sma_l,
    CASE WHEN COUNT(close) OVER w_hl >= {p.high_low} THEN MAX(close) OVER w_hl END AS roll_high,
    CASE WHEN COUNT(close) OVER w_hl >= {p.high_low} THEN MIN(close) OVER w_hl END AS roll_low,
    CASE WHEN COUNT(close) OVER w_rsi >= {p.rsi_n} THEN
      CAST(SUM(CAST(CASE WHEN close > prev_close THEN close - prev_close ELSE 0.0 END
               AS DECIMAL(18,6))) OVER w_rsi AS DOUBLE)
        / CAST({p.rsi_n} AS DOUBLE) END AS avg_gain,
    CASE WHEN COUNT(close) OVER w_rsi >= {p.rsi_n} THEN
      CAST(SUM(CAST(CASE WHEN close < prev_close THEN prev_close - close ELSE 0.0 END
               AS DECIMAL(18,6))) OVER w_rsi AS DOUBLE)
        / CAST({p.rsi_n} AS DOUBLE) END AS avg_loss,
    CASE WHEN COUNT(volume) OVER w_rv >= {p.rel_vol} AND AVG(volume) OVER w_rv != 0
         THEN volume / AVG(volume) OVER w_rv END AS rel_volume
  FROM {src}
  WINDOW
    ord  AS (PARTITION BY ticker ORDER BY trade_date),
    w_s  AS (PARTITION BY ticker ORDER BY trade_date ROWS BETWEEN {p.sma_s - 1} PRECEDING AND CURRENT ROW),
    w_m  AS (PARTITION BY ticker ORDER BY trade_date ROWS BETWEEN {p.sma_m - 1} PRECEDING AND CURRENT ROW),
    w_l  AS (PARTITION BY ticker ORDER BY trade_date ROWS BETWEEN {p.sma_l - 1} PRECEDING AND CURRENT ROW),
    w_hl AS (PARTITION BY ticker ORDER BY trade_date ROWS BETWEEN {p.high_low - 1} PRECEDING AND CURRENT ROW),
    w_rsi AS (PARTITION BY ticker ORDER BY trade_date ROWS BETWEEN {p.rsi_n - 1} PRECEDING AND CURRENT ROW),
    w_rv AS (PARTITION BY ticker ORDER BY trade_date ROWS BETWEEN {p.rel_vol - 1} PRECEDING AND CURRENT ROW)
),
t3 AS (
  SELECT *,
    CASE WHEN avg_gain IS NULL OR avg_loss IS NULL THEN NULL
         WHEN avg_gain = 0 AND avg_loss = 0 THEN 50.0
         WHEN avg_loss = 0 THEN 100.0
         WHEN avg_gain = 0 THEN 0.0
         ELSE GREATEST(100.0 - 100.0 / (1.0 + avg_gain / avg_loss), 0.0)
    END AS rsi,
    CASE WHEN close > sma_s AND LAG(close) OVER ord <= LAG(sma_s) OVER ord
         THEN 1 ELSE 0 END AS bullish_crossover,
    CASE WHEN sma_s > close AND LAG(sma_s) OVER ord <= LAG(close) OVER ord
         THEN 1 ELSE 0 END AS bearish_crossover,
    CASE WHEN sma_m > sma_l AND LAG(sma_m) OVER ord <= LAG(sma_l) OVER ord
         THEN 1 ELSE 0 END AS golden_cross,
    CASE WHEN sma_l > sma_m AND LAG(sma_l) OVER ord <= LAG(sma_m) OVER ord
         THEN 1 ELSE 0 END AS death_cross,
    CASE WHEN close = roll_high THEN 1 ELSE 0 END AS is_new_high,
    CASE WHEN close = roll_low THEN 1 ELSE 0 END AS is_new_low
  FROM t2
  WINDOW ord AS (PARTITION BY ticker ORDER BY trade_date)
)
""".strip()


#: rounded output projection shared by the momentum queries
MOMENTUM_PROJECTION = """
SELECT ticker, trade_date, volume, n_trades, company, sector, index_weight,
       consecutive_trading_days, is_new_to_index,
       ROUND(close, 4) AS close,
       ROUND(yesterday_close, 4) AS yesterday_close,
       -- sma/avg_gain/avg_loss/rsi are decimal-sum deterministic:
       -- emitted unrounded (ROUND of a half-boundary double is itself a
       -- cross-engine hazard; these values sit on boundaries by design)
       sma_s, sma_m, sma_l,
       roll_high, roll_low,
       avg_gain, avg_loss,
       rsi, ROUND(rel_volume, 6) AS rel_volume,
       bullish_crossover, bearish_crossover, golden_cross, death_cross,
       is_new_high, is_new_low
FROM t3
""".strip()


def momentum_sql(p: IndicatorParams, valid_only: bool = False) -> str:
    return f"{momentum_core_sql(p, valid_only)}\n{MOMENTUM_PROJECTION}"


def breadth_sql(p: IndicatorParams, smooth_n: int = 10) -> str:
    return f"""
{momentum_core_sql(p)},
base AS (
  SELECT trade_date,
    COUNT(DISTINCT ticker) AS stocks_traded,
    CAST(SUM(CASE WHEN prev_close IS NOT NULL AND close > prev_close THEN 1 ELSE 0 END) AS BIGINT) AS advances,
    CAST(SUM(CASE WHEN prev_close IS NOT NULL AND close < prev_close THEN 1 ELSE 0 END) AS BIGINT) AS declines,
    CAST(SUM(CASE WHEN prev_close IS NOT NULL AND close = prev_close THEN 1 ELSE 0 END) AS BIGINT) AS unchanged,
    CAST(SUM(CASE WHEN prev_close IS NOT NULL AND close > prev_close THEN volume ELSE 0 END) AS BIGINT) AS advancing_volume,
    CAST(SUM(CASE WHEN prev_close IS NOT NULL AND close < prev_close THEN volume ELSE 0 END) AS BIGINT) AS declining_volume,
    CAST(SUM(volume) AS BIGINT) AS total_volume,
    CAST(SUM(CASE WHEN roll_high IS NOT NULL AND close = roll_high THEN 1 ELSE 0 END) AS BIGINT) AS new_highs,
    CAST(SUM(CASE WHEN roll_low IS NOT NULL AND close = roll_low THEN 1 ELSE 0 END) AS BIGINT) AS new_lows,
    CAST(SUM(CASE WHEN close > sma_s THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(close) AS pct_above_sma_s,
    CAST(SUM(CASE WHEN close > sma_m THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(close) AS pct_above_sma_m,
    CAST(SUM(CASE WHEN close > sma_l THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(close) AS pct_above_sma_l,
    AVG(rsi) AS market_rsi
  FROM t3
  GROUP BY trade_date
)
SELECT trade_date, stocks_traded, advances, declines, unchanged,
  advancing_volume, declining_volume, total_volume, new_highs, new_lows,
  ROUND(pct_above_sma_s, 6) AS pct_above_sma_s,
  ROUND(pct_above_sma_m, 6) AS pct_above_sma_m,
  ROUND(pct_above_sma_l, 6) AS pct_above_sma_l,
  ROUND(market_rsi, 4) AS market_rsi,
  advances - declines AS net_advances,
  CAST(SUM(advances - declines) OVER (ORDER BY trade_date
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ad_line,
  ROUND(CASE WHEN declines != 0 THEN advances / CAST(declines AS DOUBLE) END, 6) AS ad_ratio,
  ROUND((advances + declines + unchanged) / CAST(stocks_traded AS DOUBLE), 6) AS ad_percentage,
  ROUND(CASE WHEN new_highs + new_lows != 0
        THEN new_highs / CAST(new_highs + new_lows AS DOUBLE) END, 6) AS high_low_ratio,
  ROUND(AVG(CASE WHEN new_highs + new_lows != 0
        THEN new_highs / CAST(new_highs + new_lows AS DOUBLE) END)
        OVER (ORDER BY trade_date ROWS BETWEEN {smooth_n - 1} PRECEDING AND CURRENT ROW),
        6) AS high_low_index_smoothed
FROM base
""".strip()


def securities_dim_sql(p: IndicatorParams) -> str:
    return f"""
{momentum_core_sql(p)},
with_returns AS (
  SELECT *,
    CASE WHEN LAG(close, {p.ret_short}) OVER ord IS NOT NULL AND LAG(close, {p.ret_short}) OVER ord != 0
         THEN (close - LAG(close, {p.ret_short}) OVER ord) / LAG(close, {p.ret_short}) OVER ord END AS return_s,
    CASE WHEN LAG(close, {p.ret_mid}) OVER ord IS NOT NULL AND LAG(close, {p.ret_mid}) OVER ord != 0
         THEN (close - LAG(close, {p.ret_mid}) OVER ord) / LAG(close, {p.ret_mid}) OVER ord END AS return_m,
    CASE WHEN LAG(close, {p.ret_long}) OVER ord IS NOT NULL AND LAG(close, {p.ret_long}) OVER ord != 0
         THEN (close - LAG(close, {p.ret_long}) OVER ord) / LAG(close, {p.ret_long}) OVER ord END AS return_l,
    CASE WHEN LAG(close, {p.ret_year}) OVER ord IS NOT NULL AND LAG(close, {p.ret_year}) OVER ord != 0
         THEN (close - LAG(close, {p.ret_year}) OVER ord) / LAG(close, {p.ret_year}) OVER ord END AS return_y,
    ROW_NUMBER() OVER (PARTITION BY ticker ORDER BY trade_date DESC) AS rn_desc
  FROM t3
  WINDOW ord AS (PARTITION BY ticker ORDER BY trade_date)
),
latest AS (
  SELECT ticker, trade_date, close, volume, sma_s, sma_m, sma_l,
         roll_high, roll_low, rsi, return_s, return_m, return_l, return_y,
         company, sector
  FROM with_returns
  WHERE rn_desc = 1
    AND trade_date = (SELECT MAX(trade_date) FROM t3)
),
tail AS (
  SELECT * FROM (
    SELECT ticker, close, prev_close, volume,
           ROW_NUMBER() OVER (PARTITION BY ticker ORDER BY trade_date DESC) AS rn
    FROM t3)
  WHERE rn <= {p.vol_window}
),
vol_metrics AS (
  SELECT ticker,
    STDDEV_SAMP(CASE WHEN prev_close IS NOT NULL AND prev_close != 0
                      AND close / prev_close > 0
                     THEN LN(close / prev_close) END) * SQRT(252) AS volatility_ann,
    AVG(volume) AS avg_volume,
    COUNT(*) AS window_rows
  FROM tail GROUP BY ticker
),
day_counts AS (
  -- (ticker, trade_date) is key-grain by construction on both engines,
  -- so COUNT(*) == COUNT(DISTINCT trade_date) (keeps Spark's aggregate
  -- hash-based; see models/marts.py A5 note)
  SELECT ticker, CAST(COUNT(*) AS BIGINT) AS trading_days FROM t3 GROUP BY ticker
),
signals AS (
  SELECT ticker,
    COALESCE(MAX(CASE WHEN golden_cross = 1 THEN trade_date END),
             MIN(CASE WHEN sma_l IS NOT NULL THEN trade_date END)) AS last_golden_cross,
    COALESCE(MAX(CASE WHEN death_cross = 1 THEN trade_date END),
             MIN(CASE WHEN sma_l IS NOT NULL THEN trade_date END)) AS last_death_cross,
    MAX(CASE WHEN bullish_crossover = 1 THEN trade_date END) AS last_bullish_crossover
  FROM t3 GROUP BY ticker
),
dim AS (
  SELECT l.*, v.volatility_ann, v.avg_volume, v.window_rows,
         d.trading_days, s.last_golden_cross, s.last_death_cross,
         s.last_bullish_crossover
  FROM latest l
  LEFT JOIN vol_metrics v USING (ticker)
  LEFT JOIN day_counts d USING (ticker)
  LEFT JOIN signals s USING (ticker)
),
ranked AS (
  SELECT *,
    CASE WHEN return_m IS NOT NULL THEN
      PERCENT_RANK() OVER (
        PARTITION BY (CASE WHEN return_m IS NOT NULL THEN 1 ELSE 0 END)
        ORDER BY return_m) END AS performance_percentile,
    AVG(return_m) OVER (PARTITION BY sector) AS sector_return_m
  FROM dim
)
SELECT ticker, trade_date, volume, company, sector, trading_days,
  window_rows, last_golden_cross, last_death_cross, last_bullish_crossover,
  ROUND(close, 4) AS close,
  ROUND(sma_s, 4) AS sma_s, ROUND(sma_m, 4) AS sma_m, ROUND(sma_l, 4) AS sma_l,
  roll_high, roll_low,
  ROUND(rsi, 6) AS rsi,
  ROUND(return_s, 6) AS return_s, ROUND(return_m, 6) AS return_m,
  ROUND(return_l, 6) AS return_l, ROUND(return_y, 6) AS return_y,
  ROUND(volatility_ann, 6) AS volatility_ann,
  avg_volume,
  ROUND(performance_percentile, 6) AS performance_percentile,
  ROUND(sector_return_m, 6) AS sector_return_m,
  CAST(DATE_DIFF('day', last_golden_cross, trade_date) AS BIGINT) AS days_since_golden_cross,
  CAST(DATE_DIFF('day', last_death_cross, trade_date) AS BIGINT) AS days_since_death_cross
FROM ranked
""".strip()
