"""Data-quality checks — the reference's dbt test suite as DataFrame
predicates (W16 + SURVEY.md §5).

Singular tests ported 1:1 from dbt/stock_analytics/tests/*.sql (each
returns a VIOLATIONS DataFrame; empty == pass):

  breadth_reconciles            adv+dec+unch == stocks_traded
  record_high_pct_reasonable    new-high share <= 30%
  close_within_rolling_band     close within [roll_low, roll_high]
  golden_death_exclusive        golden and death not both 1
  rsi_range_or_null             rsi in [0,100] or NULL
  sma_population_monotonic      sma_l present => sma_m & sma_s present
  yesterday_close_is_lag        yesterday_close == LAG(close)
  freshness_fct / freshness_breadth / freshness_dim
                                rows within the last 4 days

Generic schema tests (models/*/_schema.yml) as helpers:
  unique_key, not_null, accepted_range.

Deviation from the reference, on purpose: the SQL tests window to
``CURRENT_DATE() - 7``; this engine pins ``as_of`` to the table's max
trade_date instead, because the synthetic history ends in 1998 and a
wall-clock window would make every check vacuously green. Semantics
are otherwise identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

RECENT_DAYS = 7
FRESH_DAYS = 4


def _as_of(df: DataFrame, ts: str = "trade_date"):
    return df.agg(F.max(ts)).first()[0]


def _recent(df: DataFrame, as_of, days: int = RECENT_DAYS,
            ts: str = "trade_date") -> DataFrame:
    return df.where(
        F.col(ts) >= F.date_sub(F.lit(as_of).cast("date"), days))


# ------------------------------------------------- singular tests

def breadth_reconciles(breadth: DataFrame, as_of=None) -> DataFrame:
    """adv_decline_unchanged_equal_all_stocks.sql:5-7."""
    as_of = as_of or _as_of(breadth)
    return _recent(breadth, as_of).where(
        (F.col("advances") + F.col("declines") + F.col("unchanged"))
        != F.col("stocks_traded"))


def record_high_pct_reasonable(breadth: DataFrame, as_of=None,
                               min_stocks: int = 20) -> DataFrame:
    """record_high_pct_reasonable.sql:6 — >30% of the market at record
    highs is implausible. ``min_stocks`` guards thin days (the synthetic
    tail has 1-5 stocks/day, where one new high is 100% — the ratio
    test only means something on a populated market day)."""
    as_of = as_of or _as_of(breadth)
    return _recent(breadth, as_of).where(
        (F.col("stocks_traded") >= min_stocks)
        & ((F.col("new_highs") / F.col("stocks_traded")) > 0.3))


def close_within_rolling_band(fct: DataFrame, as_of=None) -> DataFrame:
    """close_within_52week_high_low.sql:5-6."""
    as_of = as_of or _as_of(fct)
    return _recent(fct, as_of).where(
        F.col("roll_high").isNotNull()
        & ((F.col("close") > F.col("roll_high"))
           | (F.col("close") < F.col("roll_low"))))


def golden_death_exclusive(fct: DataFrame, as_of=None) -> DataFrame:
    """golden_death_cross_exclusive.sql:4-6."""
    as_of = as_of or _as_of(fct)
    return _recent(fct, as_of).where(
        (F.col("golden_cross") == 1) & (F.col("death_cross") == 1))


def rsi_range_or_null(fct: DataFrame, as_of=None) -> DataFrame:
    """rsi_range_or_null.sql:4-6."""
    as_of = as_of or _as_of(fct)
    return _recent(fct, as_of).where(
        F.col("rsi").isNotNull()
        & ((F.col("rsi") < 0) | (F.col("rsi") > 100)))


def sma_population_monotonic(fct: DataFrame, as_of=None) -> DataFrame:
    """sma_logic.sql:4-8 — longer SMA present implies shorter present."""
    as_of = as_of or _as_of(fct)
    return _recent(fct, as_of).where(
        (F.col("sma_l").isNotNull() & F.col("sma_m").isNull())
        | (F.col("sma_l").isNotNull() & F.col("sma_s").isNull())
        | (F.col("sma_m").isNotNull() & F.col("sma_s").isNull()))


def yesterday_close_is_lag(fct: DataFrame, as_of=None) -> DataFrame:
    """yesterday_close_equal_prev_date_close.sql:3-15."""
    as_of = as_of or _as_of(fct)
    w = Window.partitionBy("ticker").orderBy("trade_date")
    agg = fct.withColumn("lag_close", F.lag("close", 1).over(w))
    return _recent(agg, as_of).where(
        F.col("yesterday_close").isNotNull()
        & (F.col("yesterday_close") != F.col("lag_close")))


def freshness(df: DataFrame, as_of=None,
              ts: str = "trade_date") -> DataFrame:
    """*__table_freshness.sql — violation iff zero distinct recent
    dates within the last FRESH_DAYS."""
    as_of = as_of or _as_of(df, ts)
    recent = (_recent(df, as_of, FRESH_DAYS, ts)
              .agg(F.countDistinct(ts).alias("recent_dates")))
    return recent.where(F.col("recent_dates") == 0)


# ------------------------------------------------- generic tests

def unique_key(df: DataFrame, cols: list[str]) -> DataFrame:
    """_schema.yml composite-key uniqueness (intermediate/_schema.yml:109)."""
    return (df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > 1))


def not_null(df: DataFrame, cols: list[str]) -> DataFrame:
    cond = F.lit(False)
    for c in cols:
        cond = cond | F.col(c).isNull()
    return df.where(cond)


def accepted_range(df: DataFrame, col: str, lo=None, hi=None,
                   allow_null: bool = True,
                   inclusive: bool = True) -> DataFrame:
    """dbt_utils.accepted_range / dbt_expectations between tests.
    ``inclusive=False`` excludes the bounds themselves
    (marts/_schema.yml:36-38 ``inclusive: false`` on volume)."""
    c: Column = F.col(col)
    viol = F.lit(False)
    if lo is not None:
        viol = viol | ((c < lo) if inclusive else (c <= lo))
    if hi is not None:
        viol = viol | ((c > hi) if inclusive else (c >= hi))
    if not allow_null:
        viol = viol | c.isNull()
    else:
        viol = c.isNotNull() & viol
    return df.where(viol)


def row_count_parity(a: DataFrame, b: DataFrame) -> int:
    """dbt_expectations.expect_table_row_count_to_equal_other_table
    (marts/_schema.yml:142-143: fct must not drop/duplicate rows vs
    int_russell3000__daily). Returns |count(a) - count(b)| so a zero
    means parity — same violations-==-0 contract as the DataFrame
    checks, driver-side scalars only."""
    return abs(a.count() - b.count())


# ------------------------------------------------- runner

def fact_schema_checks(fct: DataFrame) -> dict[str, DataFrame]:
    """Mart-grain generic tests shared by :func:`run_all` and the
    daily-pipeline gate (marts/_schema.yml:23-38,136-139) — ONE source
    for names, columns and bounds, so the external gate and the check
    suite cannot drift apart."""
    return {
        "fct_unique_key": unique_key(fct, ["ticker", "trade_date"]),
        "fct_not_null": not_null(fct, ["ticker", "trade_date",
                                       "close", "volume"]),
        # volume strictly positive (marts/_schema.yml:36-38,
        # inclusive: false)
        "fct_volume_positive": accepted_range(fct, "volume", lo=0,
                                              inclusive=False),
    }


def universe_schema_checks(universe: DataFrame) -> dict[str, DataFrame]:
    """Intermediate-grain generic tests
    (intermediate/_schema.yml:106-117), shared like
    :func:`fact_schema_checks`."""
    return {
        "universe_unique_key": unique_key(universe,
                                          ["ticker", "trade_date"]),
        "universe_not_null": not_null(universe,
                                      ["ticker", "trade_date"]),
        "universe_index_weight_range": accepted_range(
            universe, "index_weight", 0, 10),
    }


def run_all(fct: DataFrame, breadth: DataFrame,
            dim: DataFrame, as_of=None,
            universe: DataFrame | None = None) -> dict[str, int]:
    """dbt-test analog: every check's violation count (all must be 0).
    Mirrors the DAG position of `dbt test` after the marts build
    (daily_stock_pipeline_dag.py:48-55).

    ``as_of`` anchors the freshness checks. Pass the pipeline's
    external notion of "now" — the ingest ledger's max completed date,
    or the trading calendar's last session (``ingest/calendar.py``).
    Default: the max trade_date ACROSS the three tables, so a table
    lagging behind its siblings is detected. (A per-table max — each
    table judged against itself — can only fail on an empty table;
    that tautology is exactly what an external anchor removes.)

    Inputs are cached for the duration: the suite fires ~19 actions
    over them, and an uncached window-heavy fact would recompute per
    check. (Unpersisted at the end; materialized pipeline tables are
    already cheap re-reads, so the cache is harmless there too.)"""
    # remember which frames WE cache, so the end-of-run unpersist
    # never evicts a cache the caller installed (and still relies on)
    own = [df for df in (fct, breadth, dim) if not df.is_cached]
    fct = fct.cache()
    breadth = breadth.cache()
    dim = dim.cache()
    as_of_fct = _as_of(fct)
    as_of_b = _as_of(breadth)
    if as_of is None:
        candidates = [d for d in (as_of_fct, as_of_b, _as_of(dim))
                      if d is not None]
        # All three tables empty: leave as_of None. The freshness
        # checks then window on a NULL date, match zero recent rows,
        # and report a violation for each table — "everything stale"
        # rather than ValueError on max() of an empty sequence.
        as_of = max(candidates) if candidates else None
    out = {
        "breadth_reconciles": breadth_reconciles(breadth, as_of_b).count(),
        "record_high_pct_reasonable":
            record_high_pct_reasonable(breadth, as_of_b).count(),
        "close_within_rolling_band":
            close_within_rolling_band(fct, as_of_fct).count(),
        "golden_death_exclusive":
            golden_death_exclusive(fct, as_of_fct).count(),
        "rsi_range_or_null": rsi_range_or_null(fct, as_of_fct).count(),
        "sma_population_monotonic":
            sma_population_monotonic(fct, as_of_fct).count(),
        "yesterday_close_is_lag":
            yesterday_close_is_lag(fct, as_of_fct).count(),
        "freshness_fct": freshness(fct, as_of).count(),
        "freshness_breadth": freshness(breadth, as_of).count(),
        "freshness_dim": freshness(dim, as_of).count(),
        # generic schema tests (marts/_schema.yml:33-143); the shared
        # trio comes from fact_schema_checks so the pipeline gate and
        # this suite stay one definition
        **{name: viol.count()
           for name, viol in fact_schema_checks(fct).items()},
        "fct_rsi_range": accepted_range(fct, "rsi", 0, 100).count(),
        "fct_rel_volume_positive":
            accepted_range(fct, "rel_volume", lo=0).count(),
        "fct_avg_gain_nonneg": accepted_range(fct, "avg_gain", lo=0).count(),
        # avg_loss within float epsilon of nonnegative
        # (marts/_schema.yml:117-120, min_value: -1e-8)
        "fct_avg_loss_bound":
            accepted_range(fct, "avg_loss", lo=-1e-8).count(),
        "breadth_unique_day": unique_key(breadth, ["trade_date"]).count(),
        "breadth_not_null":
            not_null(breadth, ["trade_date", "stocks_traded"]).count(),
        # breadth ranges (marts/_schema.yml:180-225 analogs; the
        # pct/ratio/rsi bounds are INCLUSIVE here where the reference
        # excludes them — exclusivity encodes real-market
        # impossibility (3,000 stocks never ALL advance, market RSI
        # never exactly 0/100), but a small synthetic universe
        # legitimately saturates the bounds on thin days)
        "breadth_pct_sma_nonneg":
            accepted_range(breadth, "pct_above_sma_s", lo=0).count(),
        "breadth_market_rsi_range":
            accepted_range(breadth, "market_rsi", 0, 100).count(),
        "breadth_ad_pct_range":
            accepted_range(breadth, "ad_percentage", -1, 1).count(),
        "breadth_ad_ratio_nonneg":
            accepted_range(breadth, "ad_ratio", lo=0).count(),
        "breadth_hl_index_range":
            accepted_range(breadth, "high_low_index_smoothed",
                           0, 1).count(),
        "dim_unique_ticker": unique_key(dim, ["ticker"]).count(),
        "dim_ticker_not_null": not_null(dim, ["ticker"]).count(),
    }
    if universe is not None:
        universe_own = not universe.is_cached
        universe = universe.cache()
        # intermediate-grain tests (intermediate/_schema.yml:106-117),
        # shared with the pipeline gate via universe_schema_checks
        for name, viol in universe_schema_checks(universe).items():
            out[name] = viol.count()
        # mart row-count parity with the intermediate
        # (marts/_schema.yml:142-143)
        out["fct_rowcount_parity"] = row_count_parity(fct, universe)
        if universe_own:
            universe.unpersist()
    for df in own:
        df.unpersist()
    return out
