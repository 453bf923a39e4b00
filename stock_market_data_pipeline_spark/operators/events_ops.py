"""Batch operators over the event-stream table: sessionization,
hopping (sliding) windows, and JSON property extraction.

These are the batch halves of a clickstream/training-telemetry
pipeline (the streaming halves live in ``streaming/``). The reference
has no event table — its closest analog is the per-date replay loop
(src/extract_load_stocks.py:64-78) — so these follow the standard
large-scale event-pipeline shapes instead:

- sessionization: the LAG + cumulative-flag idiom — one shuffle on
  the session key, everything else window-local. At 100 TB the only
  exchange is ``hashpartitioning(user_id)``; no self-join, no
  cross-product, state never leaves the per-key sorted run.
- hopping windows: each event is expanded to the (duration/slide)
  windows that contain it (here 2) *before* the aggregate, so the
  whole thing is one map-side explode + one keyed aggregate.
- JSON extraction: ``get_json_object`` is a Catalyst expression
  (JVM-side, codegen) — no Python in the loop.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: exact decimal for the 2-dp synthetic event values (cross-engine
#: deterministic sums — SURVEY.md §8.6 rule 1)
_DEC = "decimal(18,2)"


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch events reader, robust to the generator's physical ``ts``
    layout: the parquet footer is sniffed once (driver-side, no Spark
    job) and the reader branches — TIMESTAMP(NANOS) is read under an
    EXPLICIT ``ts BIGINT`` schema (raw nanos, no session conf) and
    floor-truncated to micros exactly like DuckDB's nanos->micros
    read; TIMESTAMP(MICROS) is read as TIMESTAMP directly. Any other
    layout raises :class:`~..physical.SchemaDriftError` instead of
    silently mis-scaling (the round-5 failure mode)."""
    from ..physical import EVENTS_DDL, events_ts_unit, normalize_event_ts

    path = os.path.join(sf_dir, "events.parquet")
    unit = events_ts_unit(path)
    # timestamps compare as UTC-naive against DuckDB: date casts and
    # time windows must not depend on the host/session zone. Session
    # time zone has no reader-level equivalent and is consumed at
    # ACTION time, so save/restore around this lazy read would restore
    # too early — set it for the session (documented exception).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.schema(EVENTS_DDL[unit]).parquet(path)
    return normalize_event_ts(df, unit)


def sessionize(df: DataFrame, key: str = "user_id", ts: str = "ts",
               gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to
    the previous event of the same key exceeds ``gap_minutes``.

    Classic two-window plan sharing ONE partitioning: LAG to flag
    session starts, then a running SUM of the flags to number the
    sessions — both over ``(key ORDER BY ts)``, so Spark plans a
    single Exchange + Sort and evaluates both windows in one pass.
    """
    us = F.unix_micros(F.col(ts))
    w = Window.partitionBy(key).orderBy(ts, "event_id")
    gap_us = gap_minutes * 60_000_000
    prev = F.lag(us).over(w)
    new_flag = F.when(prev.isNull() | ((us - prev) > gap_us), 1).otherwise(0)
    return (
        df.withColumn("_new", new_flag)
        .withColumn("session_seq",
                    F.sum("_new").over(
                        w.rowsBetween(Window.unboundedPreceding, 0)))
        .drop("_new")
    )


def session_stats(df: DataFrame, key: str = "user_id",
                  ts: str = "ts", gap_minutes: int = 30) -> DataFrame:
    """Per-session rollup over :func:`sessionize`: bounds, event count
    and an exact-decimal value total (hash-stable across engines)."""
    return (
        sessionize(df, key, ts, gap_minutes)
        .groupBy(key, "session_seq")
        .agg(
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double")
            .alias("total_value"),
        )
    )


def hopping_window_counts(df: DataFrame, ts: str = "ts",
                          duration_minutes: int = 60,
                          slide_minutes: int = 30) -> DataFrame:
    """Overlapping (hopping) time windows via ``F.window``: each event
    lands in duration/slide windows; Spark explodes map-side then runs
    one keyed aggregate — no self-join. ``duration`` must be a
    multiple of ``slide``."""
    assert duration_minutes % slide_minutes == 0
    win = F.window(F.col(ts), f"{duration_minutes} minutes",
                   f"{slide_minutes} minutes")
    return (
        df.groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum(F.col("value").cast(_DEC)).cast("double")
             .alias("total_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n_events", "total_value")
    )


def json_props_stats(df: DataFrame) -> DataFrame:
    """Extract the ``k`` property from the JSON ``props`` column
    (``get_json_object`` — pure Catalyst, codegen'd) and aggregate per
    event type. The average divides two exact integers once, so it is
    bit-identical across engines."""
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        df.withColumn("k", k)
        .groupBy("event_type")
        .agg(F.count("k").alias("n_with_k"),
             F.sum("k").alias("k_sum"),
             F.min("k").alias("k_min"),
             F.max("k").alias("k_max"),
             (F.sum("k").cast("double") / F.count("k")).alias("k_avg"))
    )


def session_funnel(df: DataFrame, key: str = "user_id", ts: str = "ts",
                   gap_minutes: int = 30,
                   stages: tuple[str, str, str] = ("view", "click",
                                                   "purchase")) -> DataFrame:
    """Ordered in-session funnel: how many sessions reach stage 1,
    stage 1 THEN stage 2 (at-or-after), then stage 3. "Then" is
    timestamp-ordered within the session — a later-stage event BEFORE
    the earlier stage doesn't count, which is why this can't be a
    plain conditional count.

    Plan: the three stage timestamps are successive window MINs over
    the SAME (key, session) partitioning (one Exchange shared with
    the sessionizer), then one session-grain aggregate and a 4-row
    stack. Scale-safe: nothing leaves the per-key sorted run until
    the session grain."""
    s1, s2, s3 = stages
    s = sessionize(df, key, ts, gap_minutes)
    w = Window.partitionBy(key, "session_seq")
    t = F.col(ts)
    et = F.col("event_type")
    s = s.withColumn("first_s1", F.min(F.when(et == s1, t)).over(w))
    s = s.withColumn(
        "s2_after",
        F.min(F.when((et == s2) & (t >= F.col("first_s1")), t)).over(w))
    s = s.withColumn(
        "s3_after",
        F.min(F.when((et == s3) & (t >= F.col("s2_after")), t)).over(w))
    per_session = (
        s.groupBy(key, "session_seq")
        .agg(F.max("first_s1").alias("fv"), F.max("s2_after").alias("ca"),
             F.max("s3_after").alias("pa"))
    )
    row = per_session.agg(
        F.count("*").alias("n_sessions"), F.count("fv").alias("n_s1"),
        F.count("ca").alias("n_s12"), F.count("pa").alias("n_s123"))
    return row.selectExpr(
        f"stack(4, 'sessions', n_sessions, '{s1}', n_s1, "
        f"'{s1}_{s2}', n_s12, '{s1}_{s2}_{s3}', n_s123) "
        "AS (stage, n_sessions)")
