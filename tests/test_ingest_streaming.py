"""Unit tests for the ingest path (S1-S8) and streaming semantics that
the oracle entries can't observe: retry ladders, failure checkpoints,
crash-recovery idempotency."""

from __future__ import annotations

import os
import tempfile
from datetime import date

import pytest

from stock_market_data_pipeline_spark.ingest.source import (
    FetchError, RateLimiter, Response, fetch_with_retry,
    synthetic_grouped_daily,
)


def test_retry_ladder_429_then_ok():
    calls, sleeps = [], []
    def transport(d):
        calls.append(d)
        return Response(429, []) if len(calls) < 3 else Response(200, [{"x": 1}])
    rows = fetch_with_retry("1998-02-02", transport=transport,
                            sleeper=sleeps.append)
    assert rows == [{"x": 1}]
    assert sleeps == [60.0, 60.0]          # 429 -> long wait, twice


def test_retry_5xx_wait_differs():
    sleeps = []
    seq = iter([Response(503, []), Response(200, [{"x": 2}])])
    rows = fetch_with_retry("1998-02-02", transport=lambda d: next(seq),
                            sleeper=sleeps.append)
    assert rows == [{"x": 2}] and sleeps == [5.0]


def test_retry_4xx_aborts_immediately():
    with pytest.raises(FetchError, match="non-retryable HTTP 403"):
        fetch_with_retry("1998-02-02",
                         transport=lambda d: Response(403, []),
                         sleeper=lambda s: None)


def test_retry_exhaustion():
    with pytest.raises(FetchError, match="exhausted 3 attempts"):
        fetch_with_retry("1998-02-02",
                         transport=lambda d: Response(429, []),
                         sleeper=lambda s: None)


def test_rate_limiter_enforces_interval():
    t = {"now": 0.0}
    slept = []
    rl = RateLimiter(min_interval=20.0, clock=lambda: t["now"],
                     sleeper=slept.append)
    rl.wait()                      # first call: no wait
    t["now"] = 5.0
    rl.wait()                      # 15s early
    assert slept == [15.0]


def test_synthetic_rows_are_deterministic():
    a = synthetic_grouped_daily("1998-02-02")
    b = synthetic_grouped_daily("1998-02-02")
    assert a.rows == b.rows and len(a.rows) == 50


def test_failed_date_is_retried_next_run(spark):
    """A date whose load FAILS is not marked completed: the next run
    retries it (src/load.py:82-99 failure checkpoint semantics)."""
    from stock_market_data_pipeline_spark.ingest.loader import (
        extract_load_range,
    )

    wh = tempfile.mkdtemp(prefix="wh_fail_")
    boom = {"armed": True}

    def flaky(d):
        if d == "1998-02-03" and boom["armed"]:
            return Response(403, [])   # terminal failure on day 2
        return synthetic_grouped_daily(d)

    with pytest.raises(FetchError):
        extract_load_range(spark, wh, date(1998, 2, 2), date(1998, 2, 4),
                           transport=flaky)
    boom["armed"] = False
    r = extract_load_range(spark, wh, date(1998, 2, 2), date(1998, 2, 4),
                           transport=flaky)
    # day 1 was completed before the crash -> skipped; days 2-3 load now
    assert r["skipped"] == 1 and r["loaded"] == 2
    bars = spark.read.parquet(os.path.join(wh, "raw_daily_bars"))
    assert bars.count() == 150 and bars.select("DATE").distinct().count() == 3


def test_ledger_completed_dates(spark):
    from stock_market_data_pipeline_spark.ingest.ledger import Ledger

    led = Ledger(spark, tempfile.mkdtemp(prefix="led_") + "/l")
    assert led.completed_dates() == set()
    rid = led.record("1998-02-02", "started")
    assert led.completed_dates() == set()
    led.record("1998-02-02", "completed", rows_loaded=50, run_id=rid)
    led.record("1998-02-03", "failed", error="x")
    assert led.completed_dates() == {"1998-02-02"}


def test_schema_self_heal_and_evolution(spark):
    """S6 self-heal: a frame missing a table column gets NULL-padded;
    a frame with a NEW column evolves the table, and evolved_read
    surfaces it with NULLs on old files."""
    import tempfile

    from pyspark.sql import functions as F

    from stock_market_data_pipeline_spark.ingest.loader import (
        append_bars, evolved_read, heal_schema,
    )

    path = tempfile.mkdtemp(prefix="heal_") + "/t"
    v1 = spark.createDataFrame([(1, "a", 10.0)], "id long, s string, x double")
    append_bars(v1, path, spark)

    # frame MISSING column x -> healed with NULL double
    v2 = spark.createDataFrame([(2, "b")], "id long, s string")
    healed = heal_schema(v2, spark, path)
    assert "x" in healed.columns
    append_bars(v2, path, spark)

    # frame with a NEW column y -> schema evolution
    v3 = spark.createDataFrame([(3, "c", 30.0, 99)],
                               "id long, s string, x double, y long")
    append_bars(v3, path, spark)

    out = evolved_read(spark, path).orderBy("id").collect()
    assert [r.id for r in out] == [1, 2, 3]
    assert out[1].x is None          # healed NULL
    assert out[0].y is None and out[2].y == 99


def test_datasource_plans_one_partition_per_trading_date(spark):
    """The custom DataSource must parallelize a backfill by DATE:
    one InputPartition per weekday (the distributed form of the
    reference's serial date loop)."""
    from stock_market_data_pipeline_spark.ingest.datasource import (
        GroupedDailyReader, weekdays,
    )
    from datetime import date

    r = GroupedDailyReader({"start": "1998-02-02", "end": "1998-02-15"})
    parts = r.partitions()
    assert len(parts) == len(weekdays(date(1998, 2, 2), date(1998, 2, 15)))
    assert len(parts) == 10  # two full Mon-Fri weeks
    assert [p.value for p in parts][:2] == ["1998-02-02", "1998-02-03"]
    # executor-side read of one partition yields that date's bars only
    rows = list(r.read(parts[0]))
    assert len(rows) == 50
    assert {row[-1] for row in rows} == {date(1998, 2, 2)}
