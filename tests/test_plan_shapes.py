"""Physical-plan regression tests: the properties that make these
queries scale are asserted, not assumed — a refactor that silently
adds a shuffle, drops a broadcast, or un-pushes a filter fails CI.

(The 100 TB design rests on these invariants: one window exchange for
the whole indicator set, broadcast as-of dim join, scan-level filter
pushdown, top-k as TakeOrderedAndProject, no cartesian products.)"""

from __future__ import annotations

import re

from tests.conftest import SF_SMALL


def plan_str(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _q(name):
    from stock_market_data_pipeline_spark.catalog import QUERIES
    return QUERIES[name]


def test_momentum_single_window_exchange(spark):
    """All W1-W8 indicator columns must evaluate after ONE exchange on
    ticker (the cluster_by analog) — plus the bars-grain groupBy
    exchange. A third exchange means a window spec stopped being
    shared."""
    p = plan_str(_q("fct_trading_momentum")(spark, SF_SMALL))
    keys = re.findall(r"Exchange hashpartitioning\((\w+)", p)
    assert len(keys) == 2, f"expected 2 exchanges, got {keys}"
    assert sorted(set(keys)) == sorted({"ticker", "l_partkey"}), keys


def test_momentum_broadcasts_constituents(spark):
    """J1 as-of join must broadcast the dimension: the fact side never
    shuffles for the join."""
    p = plan_str(_q("fct_trading_momentum")(spark, SF_SMALL))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_screener_filters_reach_scan(spark):
    """P8 predicates must push to the parquet scan (partition/row-group
    pruning at scale)."""
    p = plan_str(_q("screener_filter")(spark, SF_SMALL))
    m = re.search(r"PushedFilters: \[([^\]]*)", p)
    assert m, "no PushedFilters in scan"
    pushed = m.group(1)
    assert "In(p_size" in pushed
    assert "IsNotNull(p_retailprice)" in pushed


def test_topk_plans_take_ordered(spark):
    """O2/O3 and entry(): bounded sorts must plan TakeOrderedAndProject,
    never a full global sort."""
    import __spark_entry__ as E

    for df in [_q("topk_by_metric")(spark, SF_SMALL), E.entry(spark)]:
        assert "TakeOrderedAndProject" in plan_str(df)


def test_no_cartesian_anywhere_but_bruteforce(spark):
    """Only the brute-force ANN baseline may contain a cartesian-style
    join; every bucketed/LSH path must be an equi-join."""
    for name in ["dedup_minhash_lsh", "dedup_ngram_jaccard",
                 "dedup_simhash", "ann_ivf_topk",
                 "dedup_embedding_cosine"]:
        p = plan_str(_q(name)(spark, SF_SMALL))
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name


def test_breadth_global_windows_after_day_grain(spark):
    """W12/W13 single-partition windows must sit above the day-grain
    aggregate: the single-partition exchange carries ~rows/day, not the
    fact table."""
    p = plan_str(_q("agg_daily_market_breadth")(spark, SF_SMALL))
    # a global ordered window needs Exchange SinglePartition; it must
    # appear after (above) a HashAggregate on trade_date
    assert "Exchange SinglePartition" in p
    agg_pos = p.find("HashAggregate")
    single_pos = p.find("Exchange SinglePartition")
    assert agg_pos != -1 and single_pos < agg_pos, \
        "single-partition window should consume the day-grain aggregate"
