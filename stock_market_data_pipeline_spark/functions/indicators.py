"""Technical-indicator column factories.

Re-expresses the reference's dbt macros and windowed SQL as reusable
``Column`` factories:

- guarded rolling aggregates  (macros/calculate_sma.sql:2-16; the
  NULL-until-frame-full idiom appears 9x across the models — SURVEY.md §2.5)
- N-row lag returns           (macros/calculate_return.sql:2-18)
- RSI, simple-moving variant  (models/marts/fct_trading_momentum.sql:99-138,188-201)
- crossover detection         (fct_trading_momentum.sql:147-169)
- relative volume             (fct_trading_momentum.sql:171-186)

Every factory reuses the caller's WindowSpec objects; Spark computes all
window functions sharing one spec in a single Window physical operator,
so a full indicator set costs ONE shuffle on (partition key) — the Spark
analog of the reference's ``cluster_by=['ticker']``.

Semantic gotchas preserved on purpose (SURVEY.md §4): RSI divides by the
constant frame length (simple RSI, not Wilder's smoothing); rolling
frames are ROWS-based (trading-day rows, never RANGE/time frames).
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F


def rolling_window(partition_col: str, order_col: str, n: int) -> WindowSpec:
    """ROWS BETWEEN n-1 PRECEDING AND CURRENT ROW, per-key, time-ordered."""
    return (
        Window.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(-(n - 1), 0)
    )


def guarded(agg: Column, count_target: Column, w: WindowSpec, n: int) -> Column:
    """NULL until the rolling frame holds >= n non-null observations.

    The count-guard idiom of macros/calculate_sma.sql:9-15: emit the
    aggregate only once the window is fully populated, else NULL.
    """
    return F.when(F.count(count_target).over(w) >= n, agg.over(w))


#: decimal type wide enough for any price-like double in the synthetic
#: universe (≤2-dp inputs, ≤3-dp derived closes); summing decimals is
#: EXACT and therefore independent of partition/association order, which
#: raw double sums are not (root cause of round 1's 3 hash failures:
#: DuckDB's segment-tree window sums associate differently from Spark's)
DEC = "decimal(18,6)"


def exact_sum(col: Column, w: WindowSpec) -> Column:
    """Order-independent windowed sum: sum exact decimals, then one
    double cast — bit-identical across engines for fixed-point inputs."""
    return F.sum(col.cast(DEC)).over(w).cast("double")


def guarded_sma(col: Column, w: WindowSpec, n: int) -> Column:
    """Simple moving average, NULL until n rows present (W1).

    Under the count guard the frame holds exactly n non-null rows, so
    AVG == SUM/n; the decimal SUM makes the value deterministic (the
    raw double AVG is association-order-dependent at ulp scale).
    """
    return F.when(F.count(col).over(w) >= n, exact_sum(col, w) / F.lit(float(n)))


def guarded_max(col: Column, w: WindowSpec, n: int) -> Column:
    """Rolling high (e.g. 52-week = 252 rows), NULL-guarded (W2)."""
    return guarded(F.max(col), col, w, n)


def guarded_min(col: Column, w: WindowSpec, n: int) -> Column:
    """Rolling low, NULL-guarded (W2)."""
    return guarded(F.min(col), col, w, n)


def gain(close: Column, prev_close: Column) -> Column:
    """Positive close-over-close move, else 0 (fct_trading_momentum.sql:101-107)."""
    return F.when(close > prev_close, close - prev_close).otherwise(F.lit(0.0))


def loss(close: Column, prev_close: Column) -> Column:
    """Positive magnitude of a down move, else 0 (fct_trading_momentum.sql:110-116)."""
    return F.when(close < prev_close, prev_close - close).otherwise(F.lit(0.0))


def avg_gain_loss(close: Column, prev_close: Column, w: WindowSpec,
                  n: int = 14) -> tuple[Column, Column]:
    """Rolling average gain/loss with the reference's exact semantics:
    SUM(moves)/n — constant denominator n, NOT the count of moves, and
    guarded on COUNT(close) >= n, where the first row's NULL
    yesterday_close contributes 0 to the SUM
    (fct_trading_momentum.sql:99-138 avg_gain_14/avg_loss_14).
    Decimal sums for cross-engine determinism (see exact_sum).
    """
    guard = F.count(close).over(w) >= n
    g = F.when(guard, exact_sum(gain(close, prev_close), w) / F.lit(float(n)))
    l = F.when(guard, exact_sum(loss(close, prev_close), w) / F.lit(float(n)))
    return g, l


def rsi(avg_gain: Column, avg_loss: Column) -> Column:
    """Piecewise RSI formula (fct_trading_momentum.sql:188-201):
    both zero -> 50; zero loss -> 100; zero gain -> 0;
    else 100 - 100/(1 + gain/loss), clamped at 0 via GREATEST.
    """
    return (
        F.when(avg_gain.isNull() | avg_loss.isNull(), F.lit(None).cast("double"))
        .when((avg_gain == 0) & (avg_loss == 0), F.lit(50.0))
        .when(avg_loss == 0, F.lit(100.0))
        .when(avg_gain == 0, F.lit(0.0))
        .otherwise(
            F.greatest(
                F.lit(100.0) - F.lit(100.0) / (F.lit(1.0) + avg_gain / avg_loss),
                F.lit(0.0),
            )
        )
    )


def lag_return(col: Column, w_ordered: WindowSpec, n: int) -> Column:
    """(x - LAG(x, n)) / LAG(x, n), NULL when the lag row is missing or the
    divisor is zero (macros/calculate_return.sql:2-18). ``w_ordered`` must
    be an un-framed partitioned+ordered window.
    """
    prev = F.lag(col, n).over(w_ordered)
    return F.when(prev.isNotNull() & (prev != 0), (col - prev) / prev)


def crossover(fast: Column, slow: Column, w_ordered: WindowSpec) -> Column:
    """1 on the row where ``fast`` crosses above ``slow``
    (fct_trading_momentum.sql:147-169): fast > slow today AND
    LAG(fast) <= LAG(slow) yesterday; 0 otherwise (incl. warmup rows where
    the lagged values are NULL — reference CASE returns 0 there too).
    """
    prev_fast = F.lag(fast).over(w_ordered)
    prev_slow = F.lag(slow).over(w_ordered)
    return F.when(
        (fast > slow) & (prev_fast <= prev_slow), F.lit(1)
    ).otherwise(F.lit(0))


def relative_volume(volume: Column, w: WindowSpec, n: int = 20) -> Column:
    """volume / rolling-average-volume, NULL-guarded at n rows and on a
    zero denominator (fct_trading_momentum.sql:171-186)."""
    avg_vol = F.avg(volume).over(w)
    return F.when(
        (F.count(volume).over(w) >= n) & (avg_vol != 0), volume / avg_vol
    )


def flag(cond: Column) -> Column:
    """0/1 integer flag — the reference never uses BOOLEAN
    (SURVEY.md §1.3); dashboards filter ``= 1``."""
    return F.when(cond, F.lit(1)).otherwise(F.lit(0))
