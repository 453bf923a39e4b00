"""End-to-end daily pipeline: the reference's Airflow DAG composed —
extract/load (S1-S8) -> staging (P1-P4) -> intermediate as-of join ->
momentum indicators -> data-quality checks, with the second run
proving ledger idempotency. The layers are individually oracled; this
test proves they COMPOSE on the real ingest schema (T/V/VW/O/C/H/L/N/
DATE), which no catalog entry exercises end-to-end."""

from __future__ import annotations

from datetime import date

from pyspark.sql import functions as F


def test_daily_pipeline_end_to_end(spark, tmp_path):
    from stock_market_data_pipeline_spark.checks import (
        golden_death_exclusive,
        rsi_range_or_null,
        yesterday_close_is_lag,
    )
    from stock_market_data_pipeline_spark.ingest.loader import (
        extract_load_range,
    )
    from stock_market_data_pipeline_spark.models.intermediate import (
        int_universe_daily,
    )
    from stock_market_data_pipeline_spark.models.marts import (
        IndicatorParams,
        fct_trading_momentum,
    )
    from stock_market_data_pipeline_spark.models.staging import (
        stage_daily_stocks,
        stack_constituent_snapshots,
    )

    warehouse = str(tmp_path / "wh")
    # 1) ingest two weeks of trading days (10 bars/ticker)
    r1 = extract_load_range(spark, warehouse,
                            date(1998, 2, 2), date(1998, 2, 13))
    assert r1["loaded"] == 10
    raw = spark.read.parquet(r1["bars_path"])

    # 2) staging: rename/cast/flags; synthetic bars satisfy OHLC sanity
    staged = stage_daily_stocks(raw)
    assert staged.where(F.col("is_valid_record") == 0).count() == 0

    # 3) constituents dim: all 50 tickers, one open-interval snapshot
    dim = stack_constituent_snapshots([(
        staged.select("ticker").distinct()
        .withColumn("company", F.col("ticker"))
        .withColumn("sector", F.lit("Synthetic"))
        .withColumn("index_weight", F.lit(1.0)),
        date(1998, 1, 1), None)])

    # 4) intermediate + momentum with windows short enough to populate
    p = IndicatorParams(sma_s=3, sma_m=5, sma_l=8, high_low=8,
                        rsi_n=3, rel_vol=3)

    def build_fct(raw_bars):
        universe = int_universe_daily(
            stage_daily_stocks(raw_bars)
            .withColumnRenamed("num_transactions", "n_trades"), dim
        ).select("ticker", "trade_date", "close", "volume", "n_trades",
                 "company", "sector", "index_weight", "prev_close",
                 "consecutive_trading_days", "is_new_to_index")
        return fct_trading_momentum(universe, p)

    # deliberately UNCACHED: the checks re-derive lag/flag columns
    # over the full 8-window DAG. An earlier round cached here to dodge
    # a Catalyst column-pruning failure (INTERNAL_ERROR_ATTRIBUTE_NOT_
    # FOUND on close); that no longer reproduces, and this test now
    # pins the uncached path so any regression surfaces here first.
    fct = build_fct(raw)

    n_rows = fct.count()
    assert n_rows == 10 * 50
    # every indicator populates once its window fills
    last_day = fct.where(F.col("trade_date") == date(1998, 2, 13))
    assert last_day.where(F.col("sma_l").isNull()).count() == 0
    assert last_day.where(F.col("rsi").isNull()).count() == 0

    # 5) the dbt-test analog: domain invariants on the composed output
    for check in (yesterday_close_is_lag, rsi_range_or_null,
                  golden_death_exclusive):
        violations = check(fct)
        assert violations.count() == 0, check.__name__

    # 6) rerun: ledger skips all dates; mart rebuild is identical
    r2 = extract_load_range(spark, warehouse,
                            date(1998, 2, 2), date(1998, 2, 13))
    assert r2["loaded"] == 0 and r2["skipped"] == 10
    fct2 = build_fct(spark.read.parquet(r2["bars_path"]))
    # exceptAll directly over these lineages trips a Spark optimizer
    # bug (dropDuplicates(subset)+filter under RewriteExceptAll — see
    # tests/test_exceptall_pruning_bug.py); cut lineage first.
    a = fct.localCheckpoint(eager=True)
    b = fct2.localCheckpoint(eager=True)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
