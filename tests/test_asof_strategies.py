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
