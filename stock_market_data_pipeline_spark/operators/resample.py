"""Time-series resampling operators — the hypertable-rollup analogs
(gap-fill to a continuous calendar; OHLC downsampling to coarser
grains). The reference consumes pre-bucketed daily bars, so these are
the extension surface for irregular/finer-grained inputs.

Both are pure Catalyst column programs (no UDFs): gap-fill is
sequence-explode + last-ignore-nulls over the per-key ordered window;
downsampling is min_by/max_by/sum over the bucket grain. One shuffle
each, keyed on the series key — scale-safe by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fill_daily_gaps(bars: DataFrame, key: str = "ticker",
                    ts: str = "trade_date") -> DataFrame:
    """Reindex each key's series to EVERY calendar day in its own
    [min, max] span, forward-filling close and flagging filled rows.

    Output grain: (key, day). Columns: close (forward-filled),
    is_gap_fill 0/1, plus the raw close as close_raw (NULL on gaps).
    """
    from ..functions.indicators import flag

    spans = bars.groupBy(key).agg(
        F.min(ts).alias("__d0"), F.max(ts).alias("__d1"))
    days = spans.select(
        key, F.explode(F.sequence(F.col("__d0"), F.col("__d1")))
        .alias(ts))
    w_fill = (Window.partitionBy(key).orderBy(ts)
              .rowsBetween(Window.unboundedPreceding, 0))
    joined = days.join(bars.select(key, ts, "close"), [key, ts], "left")
    return (
        joined
        .withColumn("close_raw", F.col("close"))
        .withColumn("close",
                    F.last("close", ignorenulls=True).over(w_fill))
        .withColumn("is_gap_fill", flag(F.col("close_raw").isNull()))
        .select(key, ts, "close", "close_raw", "is_gap_fill")
    )


def resample_ohlc(bars: DataFrame, every: str = "week",
                  key: str = "ticker", ts: str = "trade_date") -> DataFrame:
    """Downsample (key, day) bars to a coarser grain: open = first
    close by date, close = last by date (min_by/max_by — exact, no
    sort), high/low = extrema, volume summed. ``every`` is any
    date_trunc unit."""
    bucket = F.date_trunc(every, F.col(ts)).cast("date").alias("bucket_start")
    return (
        bars.groupBy(key, bucket)
        .agg(
            F.min_by("close", ts).alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", ts).alias("close"),
            F.sum("volume").cast("long").alias("volume"),
            F.count(F.lit(1)).alias("n_days"),
        )
    )
