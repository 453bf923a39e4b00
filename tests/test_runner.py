"""S11: the dependency-ordered materializer (dbt run analog) driven
end-to-end — view / table / incremental modes, topological ordering,
and incremental-run equivalence with a rebuild."""

from __future__ import annotations

import tempfile

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _register_pipeline(spark, warehouse, universe_filter=None):
    from stock_market_data_pipeline_spark.models.mapping import (
        universe_daily_from_tpch,
    )
    from stock_market_data_pipeline_spark.models.marts import (
        SMALL, agg_daily_market_breadth, fct_trading_momentum,
    )
    from stock_market_data_pipeline_spark.runner import Model, Runner

    r = Runner(spark, warehouse)

    def build_universe(s, built):
        u = universe_daily_from_tpch(s, SF_SMALL)
        if universe_filter is not None:
            u = u.where(universe_filter)
        return u

    r.register(Model("int_universe_daily", build_universe,
                     materialization="view"))
    r.register(Model(
        "fct_momentum",
        lambda s, built: fct_trading_momentum(built["int_universe_daily"],
                                              SMALL),
        materialization="incremental",
        depends_on=["int_universe_daily"],
        unique_key=["ticker", "trade_date"]))
    r.register(Model(
        "agg_breadth",
        lambda s, built: agg_daily_market_breadth(built["fct_momentum"],
                                                  SMALL),
        materialization="table",
        depends_on=["fct_momentum"]))
    return r


def test_runner_orders_and_materializes(spark):
    wh = tempfile.mkdtemp(prefix="runner_wh_")
    r = _register_pipeline(spark, wh)
    built = r.run()
    assert set(built) == {"int_universe_daily", "fct_momentum",
                          "agg_breadth"}
    # table + incremental models are readable as registered views
    assert spark.table("fct_momentum").count() == \
        built["fct_momentum"].count() > 0
    assert spark.table("agg_breadth").count() > 0


def test_runner_detects_cycles(spark):
    from stock_market_data_pipeline_spark.runner import Model, Runner

    r = Runner(spark, tempfile.mkdtemp())
    r.register(Model("a", lambda s, b: None, depends_on=["b"]))
    r.register(Model("b", lambda s, b: None, depends_on=["a"]))
    with pytest.raises(ValueError, match="cycle"):
        r.run()


def test_runner_incremental_second_run_merges(spark):
    """Run 1 on a date-prefix, run 2 on the full source: the
    incremental model's second run must equal a from-scratch build."""
    wh = tempfile.mkdtemp(prefix="runner_inc_")
    split = F.col("trade_date") <= F.lit("1996-12-31")

    r1 = _register_pipeline(spark, wh, universe_filter=split)
    n_prefix = r1.run()["fct_momentum"].count()

    r2 = _register_pipeline(spark, wh)          # same warehouse
    merged = r2.run()["fct_momentum"]

    full = _register_pipeline(
        spark, tempfile.mkdtemp(prefix="runner_full_")).run()["fct_momentum"]
    assert n_prefix < merged.count() == full.count()
    # spot-parity on the overlap boundary year
    a = merged.where(F.col("trade_date").between("1996-01-01", "1997-06-30"))
    b = full.where(F.col("trade_date").between("1996-01-01", "1997-06-30"))
    assert a.count() == b.count()
    assert a.select("ticker", "trade_date", "close").exceptAll(
        b.select("ticker", "trade_date", "close")).count() == 0
