"""Intermediate layer — int_universe_daily
(~ models/intermediate/int_russell3000__daily.sql, full-history build).

Pipeline (SURVEY.md §2 rows A9, J1/J2, W5, W9, W10):
  1. defensive ``SELECT DISTINCT *`` on staged bars (line 17),
  2. point-in-time join to the interval-versioned constituent dimension
     (lines 48-51) — also filters the full market to universe members,
  3. per-ticker 1-row LAG for prev_close (lines 77-95; in a full-history
     build LAG alone is sufficient, per the reference's own comment at
     lines 88-95),
  4. ROW_NUMBER consecutive_trading_days (lines 72-75),
  5. is_new_to_index via LAG(ticker) IS NULL (lines 99-106).

Scale notes: the dedup is one shuffle on all columns (kept for semantic
parity — the reference pays it too); the join broadcasts the small
dimension; steps 3-5 share a single Window partitioning on ticker, so
the whole model is dedup-shuffle + one window-shuffle over the fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.indicators import flag
from ..operators.asof import asof_interval_join


def int_universe_daily(staged_bars: DataFrame, constituents: DataFrame,
                       broadcast_dim: bool = True) -> DataFrame:
    """staged bars + interval-versioned constituents -> universe daily rows.

    ``constituents`` needs: ticker, company, sector, index_weight,
    valid_from, valid_to.
    """
    # Keyed dedup, not all-column: bar construction groups by
    # (ticker, trade_date) so that grain is already unique — the
    # reference's SELECT DISTINCT * (line 17) is equally a no-op on its
    # staging output. Keying avoids shuffling the full row width as the
    # hash key at scale; dropDuplicates on the grain keeps the defensive
    # semantics if an upstream ever violates the invariant.
    deduped = staged_bars.dropDuplicates(["ticker", "trade_date"])
    joined = asof_interval_join(
        deduped,
        constituents.select(
            "ticker", "company", "sector", "index_weight",
            "valid_from", "valid_to",
        ),
        key="ticker",
        ts="trade_date",
        broadcast_dim=broadcast_dim,
    )
    w = Window.partitionBy("ticker").orderBy("trade_date")
    return (
        joined.withColumn("prev_close", F.lag("close", 1).over(w))
        .withColumn("consecutive_trading_days",
                    F.row_number().over(w).cast("long"))
        .withColumn("is_new_to_index",
                    flag(F.lag("ticker").over(w).isNull()))
    )
