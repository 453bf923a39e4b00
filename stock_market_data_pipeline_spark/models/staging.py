"""Staging layer.

stage_daily_stocks: rename-projection + cast + derived 0/1 flags over the
raw Polygon-shaped bars (models/staging/stg_daily_stocks.sql:2-25).

stack_constituent_snapshots: UNION ALL of N universe snapshots, each
stamped with literal [valid_from, valid_to) interval columns
(models/staging/stg_russell3000__constituents.sql:6-53).
"""

from __future__ import annotations

from datetime import date

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.indicators import flag

#: far-future sentinel used by the reference for the open validity interval
OPEN_END = date(9999, 12, 31)


def stage_daily_stocks(raw: DataFrame) -> DataFrame:
    """Raw OHLCV bars -> staged bars.

    Columns in (raw DDL src/snowflake_client.py:63-77):
        T, V, VW, O, C, H, L, N, TS, DATE, INGESTED_AT
    Columns out (stg_daily_stocks.sql:2-23): renamed + cast + flags;
    rows with NULL trade_date dropped (line 25).

    ``has_volume``: IFF(V > 0, 1, 0). ``is_valid_record``: OHLC sanity —
    all four prices > 0, close within [low, high], low <= high.
    Flags stay 0/1 integers, not booleans (SURVEY.md §1.3).
    """
    v, o, c, h, low = (F.col(x) for x in ["V", "O", "C", "H", "L"])
    return (
        raw.where(F.col("DATE").isNotNull())
        .select(
            F.col("T").alias("ticker"),
            F.col("DATE").cast("date").alias("trade_date"),
            o.cast("double").alias("open"),
            h.cast("double").alias("high"),
            low.cast("double").alias("low"),
            c.cast("double").alias("close"),
            v.cast("long").alias("volume"),
            F.col("VW").cast("double").alias("volume_weighted_avg"),
            F.col("N").cast("long").alias("num_transactions"),
            flag(v > 0).alias("has_volume"),
            flag(
                (o > 0) & (c > 0) & (h > 0) & (low > 0)
                & (c <= h) & (c >= low) & (low <= h)
            ).alias("is_valid_record"),
        )
    )


def stack_constituent_snapshots(
    snapshots: list[tuple[DataFrame, date, date | None]],
) -> DataFrame:
    """UNION ALL snapshot stacking with validity intervals (U1).

    ``snapshots``: (df, valid_from, valid_to) per snapshot; ``valid_to``
    None means the open interval (reference uses a far-future literal).
    Each df must share one schema; output appends valid_from/valid_to
    DateType columns. Inclusive bounds, as the reference's
    ``trade_date BETWEEN valid_from AND valid_to`` join expects.
    """
    stamped = []
    for df, valid_from, valid_to in snapshots:
        stamped.append(
            df.withColumn("valid_from", F.lit(valid_from).cast("date"))
            .withColumn("valid_to", F.lit(valid_to or OPEN_END).cast("date"))
        )
    out = stamped[0]
    for df in stamped[1:]:
        out = out.unionByName(df)
    return out


def parse_grouped_number(col: F.Column) -> F.Column:
    """'988,555,988.64'-style comma-grouped numeric string -> double
    (seed CSV parse, SURVEY.md §1.3 last row: Snowflake's seed loader
    strips commas; Spark's CSV reader does not)."""
    return F.regexp_replace(col, ",", "").cast("double")
