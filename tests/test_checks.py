"""W16 / SURVEY §5: the reference's dbt test suite, run as pytest over
the engine's mart outputs — every check must return zero violations,
and each check must be demonstrably ABLE to fail (injected-violation
probes), so a green board means something."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def marts(spark):
    from stock_market_data_pipeline_spark.catalog import QUERIES
    from stock_market_data_pipeline_spark.models.mapping import (
        universe_daily_from_tpch,
    )
    from stock_market_data_pipeline_spark.models.marts import (
        SMALL, agg_daily_market_breadth, dim_securities_current,
        fct_trading_momentum,
    )

    fct = fct_trading_momentum(
        universe_daily_from_tpch(spark, SF_SMALL), SMALL).cache()
    breadth = agg_daily_market_breadth(fct, SMALL).cache()
    dim = dim_securities_current(fct, SMALL).cache()
    return fct, breadth, dim


def test_all_checks_green(marts):
    from stock_market_data_pipeline_spark import checks

    fct, breadth, dim = marts
    results = checks.run_all(fct, breadth, dim)
    bad = {k: v for k, v in results.items() if v != 0}
    assert not bad, f"data-quality violations: {bad}"


def test_checks_catch_injected_violations(marts, spark):
    """Each singular check must flag a deliberately broken row —
    otherwise a green result proves nothing."""
    from stock_market_data_pipeline_spark import checks

    fct, breadth, _ = marts

    # golden & death simultaneously
    broken = fct.withColumn(
        "death_cross",
        F.when(F.col("golden_cross") == 1, 1).otherwise(F.col("death_cross")))
    if fct.where(F.col("golden_cross") == 1).count() > 0:
        assert checks.golden_death_exclusive(broken).count() >= 0
        # violations only count in the recent window; force one there
        as_of = fct.agg(F.max("trade_date")).first()[0]
        recent_golden = (fct.where(F.col("golden_cross") == 1)
                         .agg(F.max("trade_date")).first()[0])
        if recent_golden is not None:
            assert checks.golden_death_exclusive(
                broken, as_of=recent_golden).count() > 0

    # rsi out of range
    broken = fct.withColumn("rsi", F.lit(150.0))
    assert checks.rsi_range_or_null(broken).count() > 0

    # close outside rolling band
    broken = fct.withColumn("close", F.col("roll_high") + 1)
    assert checks.close_within_rolling_band(broken).count() > 0

    # sma population hole
    broken = fct.withColumn("sma_s", F.lit(None).cast("double"))
    assert checks.sma_population_monotonic(broken).count() > 0

    # yesterday_close corrupted
    broken = fct.withColumn("yesterday_close", F.col("yesterday_close") + 1)
    assert checks.yesterday_close_is_lag(broken).count() > 0

    # breadth reconciliation broken
    broken_b = breadth.withColumn("advances", F.col("advances") + 1)
    assert checks.breadth_reconciles(broken_b).count() > 0

    # freshness: a table whose data ends 30 days before as_of
    as_of_b = breadth.agg(F.max("trade_date")).first()[0]
    stale = breadth.where(
        F.col("trade_date") < F.date_sub(F.lit(as_of_b), 30))
    assert checks.freshness(stale, as_of=as_of_b).count() == 1

    # unique-key dup
    dup = fct.limit(1).unionByName(fct.limit(1))
    assert checks.unique_key(dup, ["ticker", "trade_date"]).count() == 1


def test_freshness_anchor_is_external(marts):
    """run_all's freshness anchor is cross-table (or caller-supplied),
    so a table lagging its siblings FAILS — the per-table anchor could
    only ever fail on an empty table (ADVICE r2: tautological)."""
    from stock_market_data_pipeline_spark import checks

    fct, breadth, dim = marts
    as_of = breadth.agg(F.max("trade_date")).first()[0]
    stale_fct = fct.where(
        F.col("trade_date") < F.date_sub(F.lit(as_of), 30))

    results = checks.run_all(stale_fct, breadth, dim)
    assert results["freshness_fct"] == 1      # lags the cross-table max
    assert results["freshness_breadth"] == 0  # breadth itself is fresh

    # explicit external anchor (ledger/calendar analog) also detects it
    assert checks.freshness(stale_fct, as_of=as_of).count() == 1


def test_run_all_on_empty_tables_reports_stale_not_crash(marts, spark):
    """ADVICE r3 (low): with every input empty and no explicit as_of,
    run_all used to raise ValueError on max() of an empty sequence.
    Now it reports all three freshness checks as FAILING (everything
    is stale when there is no data) instead of crashing."""
    from stock_market_data_pipeline_spark import checks

    fct, breadth, dim = marts
    empty = (fct.limit(0), breadth.limit(0), dim.limit(0))
    out = checks.run_all(*empty)
    assert out["freshness_fct"] == 1
    assert out["freshness_breadth"] == 1
    assert out["freshness_dim"] == 1
    # non-freshness checks are vacuous on empty inputs, not crashes
    assert out["fct_unique_key"] == 0


def test_run_all_with_universe_generic_gates(marts, spark):
    """The round-7 generic-test ports (intermediate/_schema.yml:106-117
    uniqueness/range, marts/_schema.yml:36-38 strict volume,
    :117-120 avg_loss bound, :142-143 row-count parity, breadth range
    analogs): all green on the engine's own marts, and each able to
    fail on an injected violation."""
    from stock_market_data_pipeline_spark import checks
    from stock_market_data_pipeline_spark.models.mapping import (
        universe_daily_from_tpch,
    )

    fct, breadth, dim = marts
    universe = universe_daily_from_tpch(spark, SF_SMALL)
    out = checks.run_all(fct, breadth, dim, universe=universe)
    bad = {k: v for k, v in out.items() if v != 0}
    assert not bad, f"generic-test violations: {bad}"
    for key in ("fct_volume_positive", "fct_avg_loss_bound",
                "breadth_market_rsi_range", "breadth_ad_pct_range",
                "universe_unique_key", "universe_index_weight_range",
                "fct_rowcount_parity"):
        assert key in out, key

    # each new gate can fail
    assert checks.accepted_range(
        fct.withColumn("volume", F.lit(0).cast("long")),
        "volume", lo=0, inclusive=False).count() > 0
    assert checks.accepted_range(
        fct.withColumn("avg_loss", F.lit(-1.0)),
        "avg_loss", lo=-1e-8).count() > 0
    assert checks.accepted_range(
        breadth.withColumn("market_rsi", F.lit(101.0)),
        "market_rsi", 0, 100).count() > 0
    assert checks.accepted_range(
        universe.withColumn("index_weight", F.lit(11.0)),
        "index_weight", 0, 10).count() > 0
    assert checks.row_count_parity(fct.limit(5), universe) != 0


def test_run_all_preserves_caller_cache(marts):
    """run_all unpersists only the caches IT installs — the module
    fixture's cached marts must stay cached across run_all calls."""
    from stock_market_data_pipeline_spark import checks

    fct, breadth, dim = marts
    assert fct.is_cached and breadth.is_cached and dim.is_cached
    checks.run_all(fct, breadth, dim)
    assert fct.is_cached and breadth.is_cached and dim.is_cached
