"""Partition-scoped incremental writes: a MERGE run must rewrite ONLY
the trailing trade_date partitions (dynamic partition overwrite), and
every untouched partition's files must be byte-identical afterwards —
the reference's incremental run touches exactly the trailing-4-day
slice (fct_trading_momentum.sql:209-214), never the whole table."""

from __future__ import annotations

import hashlib
import os
from collections import Counter

import pytest
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.incremental import (
    incremental_momentum_run,
    merge_into_partitioned,
    write_partitioned,
)
from stock_market_data_pipeline_spark.models.mapping import (
    universe_daily_from_tpch,
)
from stock_market_data_pipeline_spark.models.marts import (
    SMALL,
    fct_trading_momentum,
)

SPLIT = "1997-06-30"


def _partition_state(path: str) -> dict[str, list[tuple[str, str]]]:
    """{partition dir -> sorted [(file name, md5 of bytes)]}."""
    state: dict[str, list[tuple[str, str]]] = {}
    for d in sorted(os.listdir(path)):
        full = os.path.join(path, d)
        if not (os.path.isdir(full) and d.startswith("trade_date=")):
            continue
        files = []
        for f in sorted(os.listdir(full)):
            if f.endswith(".parquet"):
                digest = hashlib.md5(
                    open(os.path.join(full, f), "rb").read()).hexdigest()
                files.append((f, digest))
        state[d] = files
    return state


@pytest.fixture(scope="module")
def universe(spark, sf_dir):
    return universe_daily_from_tpch(spark, sf_dir)


def test_incremental_run_rewrites_only_trailing_partitions(
        spark, universe, tmp_path_factory):
    target = str(tmp_path_factory.mktemp("fct") / "fct_momentum")
    prior = fct_trading_momentum(
        universe.where(F.col("trade_date") <= F.lit(SPLIT)), SMALL)
    write_partitioned(prior, target)

    before = _partition_state(target)
    result = incremental_momentum_run(spark, universe, target, SMALL,
                                      lookback_days=4)
    after = _partition_state(target)

    cutoff = "trade_date=1997-06-26"  # SPLIT - 4 calendar days
    untouched_before = {k: v for k, v in before.items() if k < cutoff}
    untouched_after = {k: v for k, v in after.items() if k < cutoff}
    assert untouched_before, "no untouched partitions — test is vacuous"
    assert untouched_before == untouched_after, (
        "files in partitions outside the trailing window changed")

    # trailing + new partitions WERE rewritten (fresh file names)
    touched = [k for k in after if k >= cutoff]
    assert touched, "no trailing partitions written"
    for k in touched:
        if k in before:
            assert before[k] != after[k]

    # the incremental result is bit-identical to a full rebuild
    full = fct_trading_momentum(universe, SMALL)
    cols = sorted(full.columns)
    got = Counter(map(tuple, result.select(*cols).collect()))
    want = Counter(map(tuple, full.select(*cols).collect()))
    assert got == want


def test_merge_into_partitioned_scopes_to_touched_partitions(
        spark, tmp_path_factory):
    target = str(tmp_path_factory.mktemp("merge") / "t")
    base = spark.createDataFrame(
        [("A", "2020-01-01", 1.0), ("B", "2020-01-01", 2.0),
         ("A", "2020-01-02", 3.0), ("B", "2020-01-02", 4.0),
         ("A", "2020-01-03", 5.0)],
        "ticker string, trade_date string, v double",
    ).withColumn("trade_date", F.col("trade_date").cast("date"))
    write_partitioned(base, target)
    before = _partition_state(target)

    # update one existing key + insert one new key, both on 01-03 only
    updates = spark.createDataFrame(
        [("A", "2020-01-03", 50.0), ("C", "2020-01-03", 6.0)],
        "ticker string, trade_date string, v double",
    ).withColumn("trade_date", F.col("trade_date").cast("date"))
    merge_into_partitioned(spark, target, updates,
                           keys=["ticker", "trade_date"])
    after = _partition_state(target)

    assert before["trade_date=2020-01-01"] == after["trade_date=2020-01-01"]
    assert before["trade_date=2020-01-02"] == after["trade_date=2020-01-02"]
    assert before["trade_date=2020-01-03"] != after["trade_date=2020-01-03"]

    rows = sorted(map(tuple, spark.read.parquet(target)
                      .select("ticker", "v").collect()))
    assert rows == [("A", 1.0), ("A", 3.0), ("A", 50.0),
                    ("B", 2.0), ("B", 4.0), ("C", 6.0)]


def test_merge_validate_catches_key_that_moved_partitions(
        spark, tmp_path_factory):
    """ADVICE r3 (medium): if an update re-dates a key — its partition
    value differs from the existing row's — the partition-pruned MERGE
    would leave the stale row behind.  The debug validator must refuse;
    without it the documented precondition is on the caller."""
    target = str(tmp_path_factory.mktemp("mv") / "t")
    base = spark.createDataFrame(
        [("E1", "2020-01-01", 1.0), ("E2", "2020-01-02", 2.0)],
        "event_id string, event_date string, v double",
    ).withColumn("event_date", F.col("event_date").cast("date"))
    write_partitioned(base, target, ts="event_date")

    # E1 re-delivered with a DIFFERENT date -> key moves partitions
    moved = spark.createDataFrame(
        [("E1", "2020-01-02", 9.0)],
        "event_id string, event_date string, v double",
    ).withColumn("event_date", F.col("event_date").cast("date"))

    with pytest.raises(ValueError, match="precondition violated"):
        merge_into_partitioned(spark, target, moved, keys=["event_id"],
                               ts="event_date",
                               validate_partition_stability=True)

    # stable re-delivery (same date) passes validation and merges
    stable = spark.createDataFrame(
        [("E2", "2020-01-02", 20.0)],
        "event_id string, event_date string, v double",
    ).withColumn("event_date", F.col("event_date").cast("date"))
    merge_into_partitioned(spark, target, stable, keys=["event_id"],
                           ts="event_date",
                           validate_partition_stability=True)
    rows = sorted(map(tuple, spark.read.parquet(target)
                      .select("event_id", "v").collect()))
    assert rows == [("E1", 1.0), ("E2", 20.0)]
