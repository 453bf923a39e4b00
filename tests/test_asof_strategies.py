"""J1 as-of interval join: the broadcast and bucketed-sort-merge
strategies must agree exactly, and the SMJ path must actually plan a
co-located sort-merge join once broadcast is off the table (the
beyond-broadcast-dim scale path documented in operators/asof.py)."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def _inputs(spark):
    from stock_market_data_pipeline_spark.models.mapping import (
        bars_from_lineitem, constituents_from_part,
    )

    bars = bars_from_lineitem(
        spark.read.parquet(f"{SF_SMALL}/lineitem.parquet"))
    cons = constituents_from_part(
        spark.read.parquet(f"{SF_SMALL}/part.parquet")).select(
        "ticker", "company", "sector", "index_weight",
        "valid_from", "valid_to")
    return bars, cons


def test_smj_asof_equals_broadcast_asof(spark):
    from stock_market_data_pipeline_spark.operators.asof import (
        asof_interval_join,
    )

    bars, cons = _inputs(spark)
    bc = asof_interval_join(bars, cons, key="ticker", ts="trade_date")
    smj = asof_interval_join(bars, cons, key="ticker", ts="trade_date",
                             broadcast_dim=False, bucket_partitions=8)
    assert bc.exceptAll(smj).count() == 0
    assert smj.exceptAll(bc).count() == 0


def test_smj_asof_plans_sort_merge_when_not_broadcastable(spark):
    from stock_market_data_pipeline_spark.operators.asof import (
        asof_interval_join,
    )

    bars, cons = _inputs(spark)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        # simulate a dim too large to broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        smj = asof_interval_join(bars, cons, key="ticker", ts="trade_date",
                                 broadcast_dim=False, bucket_partitions=8)
        plan = smj._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "BroadcastHashJoin" not in plan
        # interval predicate rides as a join-condition residual, not a
        # post-join filter over a wider join
        assert smj.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_backward_asof_semantics(spark):
    """Tie (equal ts) matches inclusively; no-prior-row yields NULLs;
    latest-not-first prior row wins."""
    from datetime import datetime as dt

    from stock_market_data_pipeline_spark.operators.asof import (
        asof_backward_join,
    )

    left = spark.createDataFrame(
        [(1, dt(2024, 1, 1, 10, 0)),   # after two rights -> latest (9:30)
         (1, dt(2024, 1, 1, 9, 0)),    # exactly at a right ts -> inclusive
         (2, dt(2024, 1, 1, 8, 0)),    # before any right -> NULLs
         (3, dt(2024, 1, 1, 12, 0))],  # key with no right rows -> NULLs
        "k long, lts timestamp")
    right = spark.createDataFrame(
        [(1, dt(2024, 1, 1, 9, 0), 100),
         (1, dt(2024, 1, 1, 9, 30), 200),
         (2, dt(2024, 1, 1, 9, 0), 300)],
        "k long, rts timestamp, payload long")

    out = asof_backward_join(left, right, key="k", left_ts="lts",
                             right_ts="rts", payload_cols=["payload"])
    got = {(r["k"], r["lts"].hour): (r["matched_payload"],
                                     r["matched_rts"] and r["matched_rts"].minute)
           for r in out.collect()}
    assert got[(1, 10)] == (200, 30)
    assert got[(1, 9)] == (100, 0)
    assert got[(2, 8)] == (None, None)
    assert got[(3, 12)] == (None, None)
    assert out.count() == 4


def test_backward_asof_single_shuffle_plan(spark):
    """The union-window as-of is ONE exchange on the key — never an
    inequality join (no BroadcastNestedLoop / cartesian)."""
    from stock_market_data_pipeline_spark.operators.events_ops import (
        read_events,
    )
    from stock_market_data_pipeline_spark.operators.asof import (
        asof_backward_join,
    )
    from pyspark.sql import functions as F

    ev = read_events(spark, SF_SMALL)
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value")
    views = ev.where(F.col("event_type") == "view").select(
        F.col("user_id"), F.col("ts"), F.col("event_id").alias("vid"))
    out = asof_backward_join(clicks, views.dropDuplicates(["user_id", "ts"]),
                             key="user_id", left_ts="ts", right_ts="ts",
                             payload_cols=["vid"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # pure union + window, no join operator
    assert plan.count("Exchange hashpartitioning(user_id") >= 1
