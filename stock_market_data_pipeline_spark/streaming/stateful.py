"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.9 "stateful cross-batch lookback").

Operator: per-user running aggregates with cross-batch state — the
streaming analog of the reference's incremental LAG-across-boundary
dance (int_russell3000__daily.sql:54-95). Each user's state (event
count, value sum, last event time) persists in the state store across
micro-batches; arbitrary session logic (timeouts, custom eviction)
hangs off the same hook.

Scale: state is partitioned by the grouping key across executors; the
state store checkpoints with the query. Value sums accumulate in
integer cents so cross-batch accumulation order can't drift the total
(same determinism rule as everywhere else in this engine).
"""

from __future__ import annotations

import os
import tempfile

from ..scratch import scratch_dir
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType, TimestampType,
)

STATE_SCHEMA = StructType([
    StructField("n_events", LongType()),
    StructField("value_cents", LongType()),
    StructField("last_ts_us", LongType()),
])

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
    StructField("last_ts", TimestampType()),
])


def _update_user(key, pdfs: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    """Fold this batch's rows for one user into persistent state and
    emit the updated running aggregate."""
    (user_id,) = key
    if state.exists:
        n, cents, last_us = state.get
    else:
        n, cents, last_us = 0, 0, 0
    for pdf in pdfs:
        n += len(pdf)
        # 2-dp values -> integer cents PER ELEMENT, then integer sum:
        # exact at any batch size (a float batch-sum then one round
        # would drift once the accumulated FP error nears half a cent)
        cents += int((pdf["value"] * 100).round().astype("int64").sum())
        if len(pdf):
            last_us = max(last_us,
                          int(pdf["ts"].max().value // 1000))
    state.update((n, cents, last_us))
    yield pd.DataFrame({
        "user_id": [user_id],
        "n_events": [n],
        "total_value": [cents / 100.0],
        "last_ts": [pd.Timestamp(last_us, unit="us")],
    })


def user_running_totals(spark: SparkSession, sf_dir: str,
                        batches: int = 2) -> DataFrame:
    """Run the stateful operator over the events stream split into
    multiple micro-batches (so state genuinely crosses batches) and
    return the terminal per-user aggregates."""
    from ..operators.events_ops import read_events
    from .events import _events_stream

    # split the table into per-half files for multi-batch replay.
    # Layout-agnostic: read through the normalizing batch reader (ts is
    # TimestampType micros whatever the source layout) and pin the
    # staged halves to TIMESTAMP_MICROS so the stream reader's footer
    # sniff sees a layout it knows.
    whole = read_events(spark, sf_dir)
    half = scratch_dir("events_halves_")
    prev_out = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType",
                   "TIMESTAMP_MICROS")
    try:
        whole.where("event_id % 2 = 0").write.mode("overwrite") \
            .parquet(os.path.join(half, "h0"))
        whole.where("event_id % 2 = 1").write.mode("overwrite") \
            .parquet(os.path.join(half, "h1"))
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev_out)
    flat = scratch_dir("events_flat_")
    i = 0
    for sub in ("h0", "h1"):
        for f in os.listdir(os.path.join(half, sub)):
            if f.endswith(".parquet"):
                os.rename(os.path.join(half, sub, f),
                          os.path.join(flat, f"part_{i}.parquet"))
                i += 1

    stream = _events_stream(spark, flat, max_files=max(1, i // batches))
    updated = (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            _update_user,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    name = "user_running_totals_sink"
    with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
        q = (updated.writeStream.format("memory").queryName(name)
             .outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
    # update-mode memory sink holds one row per (user, batch) — the
    # terminal state is each user's LAST emitted row
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    sink = spark.table(name)
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (sink.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1).drop("__rn"))
