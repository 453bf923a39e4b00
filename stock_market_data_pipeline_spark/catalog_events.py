"""Catalog entries for the batch event-stream operators: gap-based
sessionization, hopping windows, JSON property extraction, streaming
dedup, and the backward as-of join.

Cross-engine determinism notes (SURVEY.md §8.6): timestamps compare at
microsecond precision on both engines — the readers sniff the parquet
footer and normalize ``ts`` to micros whatever the physical layout
(TIMESTAMP(NANOS) floor-truncates identically to DuckDB;
TIMESTAMP(MICROS) reads bit-identical; see ``physical.py``); value
sums go through DECIMAL(18,2); session/window numbering is integer
arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import q
from .operators.events_ops import (
    hopping_window_counts,
    json_props_stats,
    read_events,
    session_stats,
)

SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM numbered
GROUP BY user_id, session_seq
""".strip()

HOPPING_SQL = """
WITH expanded AS (
  SELECT make_timestamp((epoch_us(ts) // 1800000000) * 1800000000)
           AS window_start, event_type, value
  FROM events
  UNION ALL
  SELECT make_timestamp((epoch_us(ts) // 1800000000) * 1800000000
                        - 1800000000), event_type, value
  FROM events
)
SELECT window_start,
       window_start + INTERVAL 60 MINUTES AS window_end,
       event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM expanded
GROUP BY 1, 2, 3
""".strip()

JSON_PROPS_SQL = """
SELECT event_type,
       COUNT(k) AS n_with_k,
       CAST(SUM(k) AS BIGINT) AS k_sum,
       MIN(k) AS k_min, MAX(k) AS k_max,
       CAST(SUM(k) AS DOUBLE) / COUNT(k) AS k_avg
FROM (SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events)
GROUP BY event_type
""".strip()

STREAM_DEDUP_SQL = """
SELECT event_id, ts, user_id, event_type, value, props FROM events
""".strip()

ASOF_PRIOR_VIEW_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, ts, value FROM events
  WHERE event_type = 'click'
),
views AS (
  SELECT user_id, ts, MAX(event_id) AS view_event_id FROM events
  WHERE event_type = 'view'
  GROUP BY user_id, ts
)
SELECT c.event_id, c.user_id, c.ts, c.value,
       v.ts AS matched_ts, v.view_event_id AS matched_view_event_id
FROM clicks c ASOF LEFT JOIN views v
  ON c.user_id = v.user_id AND c.ts >= v.ts
""".strip()


@q("sessionize_events", SESSIONIZE_SQL)
def sessionize_events_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) + per-session
    rollup. One Exchange on user_id serves the LAG, the running
    session counter, AND the final per-session aggregate — the
    sessionizer adds zero extra shuffles over a plain keyed agg."""
    return session_stats(read_events(spark, sf_dir), gap_minutes=30)


@q("events_hopping_counts", HOPPING_SQL)
def events_hopping_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping windows (60-min duration / 30-min slide) per event
    type: map-side window explode + single keyed aggregate; the
    oracle reproduces the two-windows-per-event expansion with a
    UNION ALL of shifted 30-min floors."""
    return hopping_window_counts(read_events(spark, sf_dir),
                                 duration_minutes=60, slide_minutes=30)


@q("events_json_props", JSON_PROPS_SQL)
def events_json_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction from the ``props`` column via
    ``get_json_object`` (Catalyst expression, whole-stage codegen —
    no Python in the loop) + per-type stats; the average is one
    bigint->double division on both engines."""
    return json_props_stats(read_events(spark, sf_dir))


JSONL_ROUNDTRIP_SQL = """
SELECT event_id, ts, user_id, event_type,
       CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
""".strip()


@q("source_jsonl_roundtrip", JSONL_ROUNDTRIP_SQL)
def source_jsonl_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines as a first-class SINK + SOURCE (S-family beyond the
    reference's parquet/CSV): the events table is written out as
    JSONL and read back under an EXPLICIT schema (schema'd
    ``spark.read.json`` — never inference, which would re-type per
    file at scale), then the nested props field is projected with
    ``get_json_object``.  Value-exactness across the text format is
    engineered, not hoped for: timestamps travel as ``unix_micros``
    integers (ISO text would re-parse through the session zone) and
    the 2-dp values travel as DECIMAL(18,2) strings (a raw double
    would depend on the writer's shortest-repr emitting enough
    digits).  Hash parity against the parquet-direct oracle proves
    the round trip loses nothing."""
    from .operators.events_ops import read_events
    from .scratch import scratch_dir

    jdir = scratch_dir("events_jsonl_")
    (read_events(spark, sf_dir)
     .select("event_id", F.unix_micros("ts").alias("ts_us"),
             "user_id", "event_type",
             F.col("value").cast("decimal(18,2)").cast("string")
             .alias("value_s"),
             "props")
     .write.mode("overwrite").json(jdir))
    back = spark.read.schema(
        "event_id long, ts_us long, user_id long, "
        "event_type string, value_s string, props string").json(jdir)
    return back.select(
        "event_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "user_id", "event_type",
        F.col("value_s").cast("double").alias("value"),
        F.get_json_object("props", "$.k").cast("long").alias("k"))


@q("stream_dedup_events", STREAM_DEDUP_SQL)
def stream_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicates under duplicate delivery (the same
    payload staged as two micro-batches): terminal append-mode state
    must equal the single-copy source — the streaming half of
    exactly-once delivery."""
    from .streaming.events import dedup_replay
    return dedup_replay(spark, sf_dir)


@q("asof_prior_view", ASOF_PRIOR_VIEW_SQL)
def asof_prior_view_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each click event picks up the latest
    view event of the same user at-or-before its timestamp (LEFT:
    clicks with no prior view keep NULLs). Spark plan is the
    union-window trick — ONE shuffle on user_id, no inequality join
    — verified against DuckDB's native ASOF LEFT JOIN."""
    from .operators.asof import asof_backward_join

    ev = read_events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value")
    views = (ev.where(F.col("event_type") == "view")
             .groupBy("user_id", "ts")
             .agg(F.max("event_id").alias("view_event_id")))
    return asof_backward_join(clicks, views, key="user_id",
                              left_ts="ts", right_ts="ts",
                              payload_cols=["view_event_id"])


CUMULATIVE_USERS_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
         COUNT(DISTINCT user_id) AS active_users
  FROM events GROUP BY 1
),
firsts AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
  FROM events GROUP BY 1
),
newbies AS (
  SELECT first_day AS day, COUNT(*) AS new_users FROM firsts GROUP BY 1
)
SELECT d.day, d.n_events, d.active_users,
       COALESCE(n.new_users, 0) AS new_users,
       CAST(SUM(COALESCE(n.new_users, 0))
              OVER (ORDER BY d.day ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cumulative_users
FROM daily d LEFT JOIN newbies n ON d.day = n.day
""".strip()


@q("cumulative_distinct_users", CUMULATIVE_USERS_SQL)
def cumulative_users_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day WITHOUT a running
    COUNT(DISTINCT) (unbounded state at scale): each user contributes
    on their FIRST day only, then a running sum over the day grain —
    two keyed aggregates + one single-partition window over ~days
    rows. The same trick Structured Streaming needs (exact running
    distinct is unbounded state there too)."""
    from .operators.events_ops import read_events
    from pyspark.sql.window import Window

    ev = read_events(spark, sf_dir)
    day = F.col("ts").cast("date")
    daily = (ev.groupBy(day.alias("day"))
             .agg(F.count("*").alias("n_events"),
                  F.countDistinct("user_id").alias("active_users")))
    newbies = (ev.groupBy("user_id").agg(F.min(day).alias("day"))
               .groupBy("day").agg(F.count("*").alias("new_users")))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (daily.join(F.broadcast(newbies), "day", "left")
            .select("day", "n_events", "active_users",
                    F.coalesce("new_users", F.lit(0)).alias("new_users"))
            .withColumn("cumulative_users", F.sum("new_users").over(w)))


FUNNEL_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 28800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts, event_type,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
),
w1 AS (
  SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts END)
              OVER (PARTITION BY user_id, session_seq) AS first_s1
  FROM numbered
),
w2 AS (
  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts >= first_s1
                     THEN ts END)
              OVER (PARTITION BY user_id, session_seq) AS s2_after
  FROM w1
),
w3 AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts >= s2_after
                     THEN ts END)
              OVER (PARTITION BY user_id, session_seq) AS s3_after
  FROM w2
),
per_s AS (
  SELECT user_id, session_seq, MAX(first_s1) AS fv, MAX(s2_after) AS ca,
         MAX(s3_after) AS pa
  FROM w3 GROUP BY user_id, session_seq
),
agg AS (
  SELECT COUNT(*) AS n_sessions, COUNT(fv) AS n_s1,
         COUNT(ca) AS n_s12, COUNT(pa) AS n_s123
  FROM per_s
)
SELECT 'sessions' AS stage, n_sessions FROM agg
UNION ALL SELECT 'view', n_s1 FROM agg
UNION ALL SELECT 'view_click', n_s12 FROM agg
UNION ALL SELECT 'view_click_purchase', n_s123 FROM agg
""".strip()


@q("session_funnel", FUNNEL_SQL)
def session_funnel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view->click->purchase funnel within sessions: stage
    timestamps via chained window MINs over one (user, session)
    partitioning; an out-of-order purchase does NOT count (that's the
    difference from a conditional count). 4-row conversion table.

    480-min gap: the synthetic stream is sparse per user (hours
    between same-user events), so a web-style 30-min gap yields 1-2
    event sessions and a vacuous funnel tail; 8h sessions give signal
    at every stage (53 completed funnels at sf0.01)."""
    from .operators.events_ops import session_funnel
    return session_funnel(read_events(spark, sf_dir), gap_minutes=480)


SESSION_WINDOW_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM numbered
GROUP BY user_id, session_seq
""".strip()


@q("session_window_native", SESSION_WINDOW_SQL)
def session_window_native_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window aggregate (merging-state session
    windows — the streaming-capable form) must produce the same
    sessions as the hand-rolled LAG+flag sessionizer: same 30-min gap,
    same oracle. session_window.end is last_event + gap by definition,
    so session_end is re-derived as MAX(ts) to match the gap-based
    semantics."""
    from .operators.events_ops import read_events

    ev = read_events(spark, sf_dir)
    return (
        ev.groupBy("user_id",
                   F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"),
             F.count("*").alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
             .alias("total_value"))
        .select("user_id", "session_start", "session_end", "n_events",
                "total_value")
    )

#: 480-min gap (same rationale as session_funnel): long sessions make
#: ~51 sessions straddle the 3 chunk boundaries at sf0.01, so the
#: cross-batch session-state MERGE is observably exercised — with a
#: 30-min gap no session straddles and the replay proves nothing.
STREAM_SESSION_SQL = SESSION_WINDOW_SQL.replace("1800000000",
                                                "28800000000")


@q("stream_session_windows", STREAM_SESSION_SQL)
def stream_session_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING session windows: 480-min-gap sessions built with
    merging session_window state across micro-batches (the input is
    split into 3 chronological chunks, one per batch) — sessions
    split across batch boundaries must merge back into one row;
    terminal state equals the batch LAG-based oracle."""
    from .streaming.events import session_replay
    return session_replay(spark, sf_dir, gap="480 minutes")


HLL_SQL = """
WITH h AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)
              AS BIGINT) AS hv
  FROM events
),
ranked AS (
  SELECT day, hv % 256 AS bucket,
         CASE WHEN hv // 256 = 0 THEN 53
              ELSE 52 - length(bin(hv // 256)) + 1 END AS r
  FROM h
),
regs AS (
  SELECT day, bucket, MAX(r) AS mr FROM ranked GROUP BY day, bucket
),
ex AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         COUNT(DISTINCT user_id) AS exact_users
  FROM events GROUP BY 1
)
SELECT day,
       CAST(256 - COUNT(*) AS BIGINT) AS n_zero_registers,
       CAST(SUM(mr) AS BIGINT) AS register_sum,
       exact_users
FROM regs JOIN ex USING (day)
GROUP BY day, exact_users
""".strip()


@q("sketch_hll_daily_users", HLL_SQL)
def sketch_hll_daily_users_q(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """MERGEABLE DISTINCT-COUNT SKETCHES (HyperLogLog, the published
    Flajolet et al. construction behind approx_count_distinct): one
    256-register sketch per day over user_id, built with
    deterministic md5 hashing so the DuckDB oracle rebuilds
    BYTE-IDENTICAL registers — the parity surface is the exact
    integer register state (zero-count + register sum per day), the
    serving surface is the float estimate.  In-entry assertions prove
    the sketch ESTIMATES: per-day and, after an element-wise-max
    MERGE of all days into one sketch (the operation that makes a
    90-day distinct a fold over 90 tiny rows instead of a re-scan at
    100 TB), within HLL's published error of the exact distinct
    counts."""
    from .functions import sketches as S

    ev = read_events(spark, sf_dir)
    day = F.date_format("ts", "yyyy-MM-dd").alias("day")
    sk = S.hll_registers(ev.select(day, "user_id"),
                         ["day"], "user_id", p=8)
    exact = (ev.select(day, "user_id")
             .groupBy("day")
             .agg(F.countDistinct("user_id").alias("exact_users")))
    both = sk.join(exact, "day")
    # tolerance gate: HLL(p=8) std error is 6.5%; 4 sigma + small-n
    # slack.  A broken rank/bucket derivation lands far outside.
    checked = both.withColumn(
        "est", S.hll_estimate(F.col("hll"), p=8))
    bad = checked.where(
        F.abs(F.col("est") - F.col("exact_users"))
        > 0.3 * F.col("exact_users") + 3).count()
    if bad:
        raise RuntimeError(f"{bad} daily HLL estimates outside the "
                           f"published error envelope")
    merged = (checked
              .agg(S.hll_merge_agg("hll").alias("hll"))
              .withColumn("est", S.hll_estimate(F.col("hll"), p=8))
              .collect()[0])
    total_exact = ev.select("user_id").distinct().count()
    if abs(merged["est"] - total_exact) > 0.3 * total_exact + 3:
        raise RuntimeError(
            f"merged HLL estimate {merged['est']:.1f} vs exact "
            f"{total_exact} outside the error envelope")
    return (checked.select(
        "day",
        S.hll_zeros(F.col("hll")).alias("n_zero_registers"),
        S.hll_register_sum(F.col("hll")).alias("register_sum"),
        "exact_users"))
