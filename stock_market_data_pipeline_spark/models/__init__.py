"""Model layer — one module per reference dbt model (SURVEY.md §3.2 DAG):

    staging.stage_daily_stocks        ~ models/staging/stg_daily_stocks.sql
    staging.stack_constituent_snapshots ~ models/staging/stg_russell3000__constituents.sql
    intermediate.int_universe_daily   ~ models/intermediate/int_russell3000__daily.sql
    marts.fct_trading_momentum        ~ models/marts/fct_trading_momentum.sql
    marts.agg_daily_market_breadth    ~ models/marts/agg_daily_market_breadth.sql
    marts.dim_securities_current      ~ models/marts/dim_securities_current.sql

Each model is a pure DataFrame -> DataFrame function: materialization
(view / table / incremental MERGE) is the runner's concern, exactly as
dbt separates SELECT logic from materialization config.
"""
