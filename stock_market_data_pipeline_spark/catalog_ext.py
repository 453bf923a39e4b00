"""Catalog entries for the streaming slice and the ingest path
(SURVEY.md §2.1 S1-S8, §2.9). Streaming entries run real Structured
Streaming queries to a terminal state and are verified against batch
oracles — the defining correctness property of a streaming pipeline.
"""

from __future__ import annotations

import tempfile

from .scratch import scratch_dir
from datetime import date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import q

STREAM_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""".strip()

STREAM_STATEFUL_SQL = """
SELECT user_id, COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
            AS DOUBLE) / 100.0 AS total_value,
       MAX(ts) AS last_ts
FROM events
GROUP BY user_id
""".strip()

STREAM_UPSERT_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1
""".strip()

PENDING_DATES_SQL = """
WITH days AS (
  SELECT CAST(unnest(generate_series(DATE '1998-02-02', DATE '1998-03-31',
                                     INTERVAL 1 DAY)) AS DATE) AS cal_date
),
trading AS (
  SELECT cal_date FROM days
  WHERE isodow(cal_date) <= 5 AND cal_date != DATE '1998-02-16'
)
SELECT cal_date FROM trading WHERE day(cal_date) % 3 != 0
""".strip()

INGEST_BARS_SQL = """
WITH ids AS (SELECT unnest(generate_series(0, 49)) AS i),
dts AS (SELECT unnest([DATE '1998-02-02', DATE '1998-02-03',
                       DATE '1998-02-04']) AS dt),
calc AS (
  SELECT 'TK' || lpad(CAST(i AS VARCHAR), 4, '0') AS T,
         CAST((i * 131 + day(dt) * 977) % 100000 + 1 AS DOUBLE) AS V,
         ((i * 17 + day(dt) * 11) % 1000) / 10.0 + 1.0 AS O,
         ((i * 31 + day(dt) * 7) % 1000) / 10.0 + 1.0 AS C,
         CAST(i + day(dt) AS BIGINT) AS mix,
         CAST((i + day(dt)) % 500 + 1 AS BIGINT) AS N,
         dt AS "DATE"
  FROM ids CROSS JOIN dts
)
SELECT T, V, (O + C) / 2.0 AS VW, O, C,
       greatest(C, O) + (mix % 10) / 10.0 AS H,
       least(C, O) - (mix % 7) / 10.0 AS L,
       N, "DATE"
FROM calc
""".strip()


SEED_CSV_SQL = """
WITH ids AS (SELECT unnest(generate_series(0, 199)) AS i)
SELECT 'TK' || lpad(CAST(i AS VARCHAR), 4, '0') AS ticker,
       'Company ' || CAST(i AS VARCHAR) AS company,
       ['Tech', 'Energy', 'Health', 'Finance', 'Retail'][(i % 5) + 1]
         AS sector,
       ((i * 7919) % 90000000 + 10000000) / 100.0 AS market_value
FROM ids
""".strip()


@q("seed_csv_constituents", SEED_CSV_SQL)
def seed_csv_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9: seed CSV with declared schema, quoted fields, and
    comma-GROUPED numerics ('1,234,567.89') — written then read back
    through the seed loader, which must strip grouping commas like
    Snowflake's does (dbt_project.yml:26-52; Spark's CSV reader alone
    would yield NULLs). Oracle recomputes the parsed values from the
    same arithmetic."""
    import os

    from .seeds import read_seed_csv

    d = scratch_dir("seeds_")
    path = os.path.join(d, "constituents.csv")
    sectors = ["Tech", "Energy", "Health", "Finance", "Retail"]
    with open(path, "w") as f:
        f.write("ticker,company,sector,market_value\n")
        for i in range(200):
            mv = ((i * 7919) % 90000000 + 10000000) / 100.0
            f.write(f'TK{i:04d},Company {i},{sectors[i % 5]},"{mv:,.2f}"\n')
    return read_seed_csv(spark, path,
                         string_cols=["ticker", "company", "sector"],
                         grouped_numeric_cols=["market_value"])


@q("stream_hourly_rollup", STREAM_HOURLY_SQL)
def stream_hourly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming tumbling 1h event-time windows + watermark,
    AvailableNow replay to a memory sink; terminal state must equal the
    batch GROUP BY oracle (SURVEY §2.9 tumbling window / late data)."""
    from .streaming.events import hourly_rollup
    return hourly_rollup(spark, sf_dir)


@q("stream_upsert_rollup", STREAM_UPSERT_SQL)
def stream_upsert_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch MERGE upsert with ledger idempotency under
    DUPLICATE delivery (source unioned with itself): the dedup-on-key
    upsert makes the terminal rollup equal the single-copy batch
    oracle — without it every count would double."""
    from .streaming.events import upsert_replay
    return upsert_replay(spark, sf_dir)


@q("stream_upsert_dv", STREAM_UPSERT_SQL)
def stream_upsert_dv_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LOW-SHUFFLE form of stream_upsert_rollup: every micro-batch
    merges via merge_batch(mode='dv') — matched rows dead-marked by
    deletion vectors, batch rows appended, ledger + DVs + files in ONE
    atomic commit.  Terminal state must equal the same single-copy
    batch oracle; the entry raises unless duplicate delivery actually
    produced deletion vectors (merge-on-read happened) — the
    steady-state CDC write shape at 100 TB, where each micro-batch
    touches a sliver of rows across many large partitions."""
    from .streaming.events import upsert_replay
    return upsert_replay(spark, sf_dir, mode="dv")


@q("stream_manifest_append", STREAM_UPSERT_SQL)
def stream_manifest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming file sink (§2.9): foreachBatch appends
    into a ManifestTable whose batch ledger commits ATOMICALLY with
    the data (one manifest CAS link covers both), then the last batch
    is re-delivered as a crash recovery would and must be refused with
    the version unchanged — the entry raises otherwise, so green means
    the exactly-once contract actually held, not just that counts
    matched."""
    from .streaming.events import manifest_append_replay
    return manifest_append_replay(spark, sf_dir)


#: 20 of the 25 possible p_brand sectors — the IN-list filter excludes
#: Brand#*5 so it observably filters, while keeping rows at all scales
SCREENER_SECTORS = [f"Brand#{i}{j}" for i in range(1, 6)
                    for j in range(1, 5)]


def _serving_screener_sql() -> str:
    from . import oracles
    from .models.marts import SMALL
    in_list = ", ".join(f"'{s}'" for s in SCREENER_SECTORS)
    return f"""
WITH dim AS ({oracles.securities_dim_sql(SMALL)})
SELECT ticker, sector, close, rsi, return_m, volatility_ann
FROM dim
WHERE rsi BETWEEN 10 AND 90
  AND sector IN ({in_list})
  AND return_m >= -1.0
ORDER BY return_m DESC, ticker
LIMIT 500
""".strip()


def _serving_range_sql() -> str:
    from . import oracles
    from .models.marts import SMALL
    return f"""
WITH fct AS ({oracles.momentum_sql(SMALL)})
SELECT ticker, trade_date, close, sma_s, sma_m, sma_l, rsi, volume
FROM fct
WHERE ticker = 5
  AND trade_date BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
ORDER BY trade_date
""".strip()


@q("serving_screener", _serving_screener_sql())
def serving_screener_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12 + P8 + P10: the Universe Screener page query as a
    PARAMETERIZED spark.sql over the registered dim view — RSI band,
    sector IN-list, min return, ILIKE ticker search, ordered top-k
    (2_Universe_Screener.py:29-77) with every user input bound as a
    named parameter instead of string-spliced."""
    from .catalog import QUERIES
    from .serve import screener

    dim = QUERIES["dim_securities_current"](spark, sf_dir)
    sel = dim.select("ticker", "sector", "close", "rsi", "return_m",
                     "volatility_ann")
    sel.createOrReplaceTempView("dim_securities")
    return screener(spark, rsi_lo=10.0, rsi_hi=90.0,
                    sectors=SCREENER_SECTORS,
                    min_return=-1.0, ticker_search="", limit=500)


@q("serving_ticker_range", _serving_range_sql())
def serving_range_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12 + P9: the Ticker Momentum page query — key + date-range
    predicate through parameterized SQL (3_Ticker_Momentum.py:93-96);
    with a date-partitioned fact this prunes partitions at scale."""
    from .catalog import QUERIES
    from .serve import ticker_momentum

    fct = QUERIES["fct_trading_momentum_small"](spark, sf_dir)
    fct.createOrReplaceTempView("fct_momentum")
    return ticker_momentum(spark, 5, "1995-01-01", "1996-12-31")


@q("stream_stateful_user_totals", STREAM_STATEFUL_SQL)
def stream_stateful_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    running totals whose state crosses micro-batches; terminal state
    must equal the batch GROUP BY oracle (SURVEY §2.9 stateful
    cross-batch lookback). Integer-cents accumulation keeps the sum
    order-independent."""
    from .streaming.stateful import user_running_totals
    return user_running_totals(spark, sf_dir)


@q("ingest_pending_dates", PENDING_DATES_SQL)
def pending_dates_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4+S8: trading-calendar plan minus ledger-completed dates
    (here: every 3rd day-of-month already completed), the daily-run
    date planner (src/extract_load_stocks.py:40-69)."""
    from .ingest.calendar import trading_days
    cal = trading_days(spark, date(1998, 2, 2), date(1998, 3, 31),
                       holidays=[date(1998, 2, 16)])
    return cal.where(F.dayofmonth("cal_date") % 3 != 0)


@q("ingest_daily_bars", INGEST_BARS_SQL)
def ingest_bars_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1-S8 end-to-end: plan 3 trading days, fetch (deterministic
    Polygon-shaped generator) with retry wrapper, normalize (P5/P6),
    bulk-append, checkpoint — then RE-RUN the whole loop to prove
    ledger idempotency (second pass loads 0). Oracle reproduces the
    generator arithmetic in SQL."""
    from .ingest.loader import extract_load_range

    warehouse = scratch_dir("ingest_wh_")
    r1 = extract_load_range(spark, warehouse,
                            date(1998, 2, 2), date(1998, 2, 4))
    r2 = extract_load_range(spark, warehouse,
                            date(1998, 2, 2), date(1998, 2, 4))
    if not (r1["loaded"] == 3 and r2["loaded"] == 0
            and r2["skipped"] == 3):     # survives `python -O`
        raise RuntimeError(f"ledger idempotency violated: {r1} {r2}")
    bars = spark.read.parquet(r1["bars_path"])
    return bars.select("T", "V", "VW", "O", "C", "H", "L", "N", "DATE")


@q("datasource_grouped_daily", INGEST_BARS_SQL)
def datasource_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1-S3 as a FIRST-CLASS Spark source: the custom Python
    DataSource (Spark 4 DataSource API) plans one InputPartition per
    trading date, so a backfill's per-date REST fetches run
    distributed across executors (task retry = per-date retry) —
    same normalized rows as the imperative loader path, same oracle."""
    from .ingest import datasource

    datasource.register(spark)
    df = (spark.read.format("grouped_daily")
          .option("start", "1998-02-02").option("end", "1998-02-04")
          .load())
    return df.select("T", "V", "VW", "O", "C", "H", "L", "N", "DATE")


def _serving_breadth_sql() -> str:
    from . import oracles
    from .models.marts import SMALL
    return f"""
WITH breadth AS ({oracles.breadth_sql(SMALL)})
SELECT * FROM breadth
ORDER BY trade_date DESC
LIMIT 30
""".strip()


def _serving_freshness_sql() -> str:
    from . import oracles
    from .models.marts import SMALL
    return f"""
WITH breadth AS ({oracles.breadth_sql(SMALL)}),
dim AS ({oracles.securities_dim_sql(SMALL)})
SELECT (SELECT MAX(trade_date) FROM breadth) AS data_through,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM dim) AS ticker_count
""".strip()


@q("serving_freshness", _serving_freshness_sql())
def serving_freshness_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12 metadata: the dashboard freshness caption — breadth
    data-through date + dim ticker coverage as one row
    (dashboard_helpers.py:75-95). A7-shaped scalar aggregates only."""
    from .catalog import QUERIES
    from .serve import data_freshness

    b = QUERIES["agg_daily_market_breadth"](spark, sf_dir)
    b.createOrReplaceTempView("market_breadth")
    dim = QUERIES["dim_securities_current"](spark, sf_dir)
    dim.createOrReplaceTempView("dim_securities")
    return data_freshness(spark)


@q("serving_breadth", _serving_breadth_sql())
def serving_breadth_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12 + O2: the Market Breadth page query — recency top-30 over
    the breadth mart through the serving layer
    (data-viz/pages/1_Market_Breadth.py:28); the bounded DESC sort
    plans TakeOrderedAndProject, never a full sort."""
    from .catalog import QUERIES
    from .serve import breadth_recent

    b = QUERIES["agg_daily_market_breadth"](spark, sf_dir)
    b.createOrReplaceTempView("market_breadth")
    return breadth_recent(spark, limit=30)


# ---------------------------------------------------------------------
# the daily Airflow DAG composed as ONE catalog entry
# ---------------------------------------------------------------------

DAILY_START, DAILY_END = date(1998, 2, 2), date(1998, 2, 27)  # 20 weekdays

#: the synthetic-ingest universe reproduced in DuckDB SQL: generator
#: arithmetic (same formulas as INGEST_BARS_SQL) -> staging casts ->
#: all-ticker constituents dim -> prev_close/streak window — the
#: ingest-side replacement for the sf-table universe CTE
_DAILY_UNIVERSE_SQL = f"""
WITH days AS (
  SELECT CAST(unnest(generate_series(DATE '{DAILY_START}', DATE '{DAILY_END}',
                                     INTERVAL 1 DAY)) AS DATE) AS dt
),
trading AS (SELECT dt FROM days WHERE isodow(dt) <= 5),
ids AS (SELECT unnest(generate_series(0, 49)) AS i),
calc AS (
  SELECT 'TK' || lpad(CAST(i AS VARCHAR), 4, '0') AS ticker, dt,
         CAST((i * 131 + day(dt) * 977) % 100000 + 1 AS BIGINT) AS volume,
         ((i * 31 + day(dt) * 7) % 1000) / 10.0 + 1.0 AS close,
         CAST((i + day(dt)) % 500 + 1 AS BIGINT) AS n_trades
  FROM ids CROSS JOIN trading
),
uni AS (
  SELECT ticker, dt AS trade_date, close, volume, n_trades,
         ticker AS company, 'Synthetic' AS sector,
         CAST(1.0 AS DOUBLE) AS index_weight
  FROM calc
)
SELECT u.*,
       LAG(close) OVER w AS prev_close,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS consecutive_trading_days,
       CASE WHEN LAG(ticker) OVER w IS NULL THEN 1 ELSE 0
       END AS is_new_to_index
FROM uni u
WINDOW w AS (PARTITION BY ticker ORDER BY trade_date)
""".strip()


def _daily_pipeline_sql() -> str:
    from . import oracles
    from .models.marts import IndicatorParams

    p = IndicatorParams(sma_s=3, sma_m=5, sma_l=8, high_low=8,
                        rsi_n=3, rel_vol=3)
    core = oracles.momentum_core_sql(p, universe_sql=_DAILY_UNIVERSE_SQL)
    return f"{core}\n{oracles.MOMENTUM_PROJECTION}"


@q("daily_pipeline_run", _daily_pipeline_sql())
def daily_pipeline_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's daily Airflow DAG as ONE catalog entry
    (airflow/dags/daily_stock_pipeline_dag.py:30-60 task order):
    extract/load (S1-S8) -> staging (P1-P4) -> intermediate membership
    join -> momentum mart (W1-W8) -> data-quality checks (the
    ``dbt test`` stage). A second extract/load pass proves ledger
    idempotency (0 loads, all skips), the checks must report ZERO
    violations before the mart is returned, and freshness is anchored
    to the ledger: the mart's data-through date must equal the max
    completed ingest date. The oracle replays the generator arithmetic
    + staging casts + the shared momentum SQL in DuckDB."""
    import os

    from .checks import (
        golden_death_exclusive,
        rsi_range_or_null,
        yesterday_close_is_lag,
    )
    from .ingest.ledger import Ledger
    from .ingest.loader import extract_load_range
    from .models.intermediate import int_universe_daily
    from .models.marts import IndicatorParams, fct_trading_momentum
    from .models.staging import (
        stage_daily_stocks,
        stack_constituent_snapshots,
    )

    warehouse = scratch_dir("daily_wh_")
    r1 = extract_load_range(spark, warehouse, DAILY_START, DAILY_END)
    r2 = extract_load_range(spark, warehouse, DAILY_START, DAILY_END)
    if not (r1["loaded"] == 20 and r2["loaded"] == 0
            and r2["skipped"] == 20):
        raise RuntimeError(
            f"ledger idempotency gate: run1 {r1} run2 {r2}")

    staged = stage_daily_stocks(spark.read.parquet(r1["bars_path"]))
    dim = stack_constituent_snapshots([(
        staged.select("ticker").distinct()
        .withColumn("company", F.col("ticker"))
        .withColumn("sector", F.lit("Synthetic"))
        .withColumn("index_weight", F.lit(1.0)),
        date(1998, 1, 1), None)])
    p = IndicatorParams(sma_s=3, sma_m=5, sma_l=8, high_low=8,
                        rsi_n=3, rel_vol=3)
    universe = (
        int_universe_daily(
            staged.withColumnRenamed("num_transactions", "n_trades"), dim)
        .select("ticker", "trade_date", "close", "volume", "n_trades",
                "company", "sector", "index_weight", "prev_close",
                "consecutive_trading_days", "is_new_to_index")
        .localCheckpoint(eager=True))
    fct = fct_trading_momentum(universe, p)
    # materialize ONCE before the gate fan-out: the dbt-test stage
    # fires ~10 independent actions, each of which would otherwise
    # re-run the ingest + 8-window lineage from scratch.  This is a
    # throughput materialization, NOT the r6-era correctness cache —
    # the uncached check path (the Catalyst column-pruning repro
    # surface) stays pinned by tests/test_daily_e2e.py.
    fct = fct.localCheckpoint(eager=True)

    # the `dbt test` stage: domain invariants gate the mart.  Real
    # exceptions, not `assert` — gates must survive `python -O`
    # (a stripped assert would silently turn the dbt-test stage into
    # a no-op).  The generic schema tests come from the SAME builders
    # checks.run_all uses (fact_schema_checks / universe_schema_checks
    # + row-count parity, marts/_schema.yml:23-38,136-143,
    # intermediate/_schema.yml:106-117) — one definition, two
    # consumers, no drift.
    from .checks import (
        fact_schema_checks,
        row_count_parity,
        universe_schema_checks,
    )
    gates = {
        check.__name__: check(fct)
        for check in (yesterday_close_is_lag, rsi_range_or_null,
                      golden_death_exclusive)
    }
    gates.update(fact_schema_checks(fct))
    gates.update(universe_schema_checks(universe))
    for gname, viol in gates.items():
        bad = viol.count()
        if bad:
            raise RuntimeError(f"{gname}: {bad} violations")
    parity = row_count_parity(fct, universe)
    if parity:
        raise RuntimeError(
            f"fct_rowcount_parity: mart and intermediate row counts "
            f"differ by {parity}")

    # freshness anchors to the ledger (S7/S8), not to the data itself
    ledger = Ledger(spark, os.path.join(warehouse,
                                        "ingestion_checkpoints"))
    data_through = fct.agg(F.max("trade_date")).first()[0]
    if data_through.isoformat() != max(ledger.completed_dates()):
        raise RuntimeError(
            f"freshness gate: mart data-through {data_through} != "
            f"ledger max completed date {max(ledger.completed_dates())}")

    from .catalog import _momentum_projection

    # materialize the 1000-row result so repeated invocations (parity
    # sweeps, bench reps) don't re-run the ingest lineage
    return _momentum_projection(fct).localCheckpoint(eager=True)


STREAM_INTERVAL_JOIN_SQL = """
SELECT c.event_id AS click_id, v.event_id AS view_id, c.user_id,
       c.ts AS click_ts, v.ts AS view_ts
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id AND v.ts <= c.ts
 AND c.ts < v.ts + INTERVAL 1 HOUR
""".strip()


@q("stream_interval_join", STREAM_INTERVAL_JOIN_SQL)
def stream_interval_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join: clicks matched to
    same-user views in the trailing hour across 3 chronological
    micro-batches; watermarks + the range predicate bound the join
    state; terminal output equals the batch interval join."""
    from .streaming.events import interval_join_replay
    return interval_join_replay(spark, sf_dir)
