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


def test_runner_namespaces(spark):
    """S11 proper: models with schema= land as catalog tables in the
    reference's raw_* namespaces (dbt_project.yml:55-65), incremental
    second runs merge partition-scoped, and untouched trade_date
    partitions' files are byte-identical after the second run."""
    import glob
    import os

    from stock_market_data_pipeline_spark.models.mapping import (
        universe_daily_from_tpch,
    )
    from stock_market_data_pipeline_spark.models.marts import (
        SMALL, agg_daily_market_breadth, fct_trading_momentum,
    )
    from stock_market_data_pipeline_spark.runner import (
        LAYER_SCHEMAS, Model, Runner,
    )

    def pipeline(universe_filter=None):
        r = Runner(spark, tempfile.mkdtemp(prefix="ns_wh_"))

        def build_universe(s, built):
            u = universe_daily_from_tpch(s, SF_SMALL)
            if universe_filter is not None:
                u = u.where(universe_filter)
            return u

        r.register(Model("int_universe_ns", build_universe,
                         materialization="view"))
        r.register(Model(
            "fct_momentum_ns",
            lambda s, built: fct_trading_momentum(built["int_universe_ns"],
                                                  SMALL),
            materialization="incremental",
            depends_on=["int_universe_ns"],
            unique_key=["ticker", "trade_date"],
            partition_by=["trade_date"],
            schema=LAYER_SCHEMAS["intermediate"]))
        r.register(Model(
            "agg_breadth_ns",
            lambda s, built: agg_daily_market_breadth(built["fct_momentum_ns"],
                                                      SMALL),
            materialization="table",
            depends_on=["fct_momentum_ns"],
            schema=LAYER_SCHEMAS["marts"]))
        return r

    # drop both the metastore entries AND the physical locations — a
    # fresh Derby metastore over a persisted spark-warehouse dir knows
    # nothing of last session's managed tables, so DROP alone leaves a
    # LOCATION_ALREADY_EXISTS landmine
    import shutil

    wh_root = spark.conf.get(
        "spark.sql.warehouse.dir").removeprefix("file:")
    for db in ("raw_intermediate", "raw_marts"):
        for tbl in ("fct_momentum_ns", "agg_breadth_ns"):
            spark.sql(f"DROP TABLE IF EXISTS {db}.{tbl}")
            shutil.rmtree(os.path.join(wh_root, f"{db}.db", tbl),
                          ignore_errors=True)

    # run 1 on a date prefix
    split = F.col("trade_date") <= F.lit("1996-12-31")
    n_prefix = pipeline(split).run()["fct_momentum_ns"].count()

    # namespace placement
    assert spark.catalog.tableExists("raw_intermediate.fct_momentum_ns")
    assert spark.catalog.tableExists("raw_marts.agg_breadth_ns")
    tbls = [t.name for t in spark.catalog.listTables("raw_marts")]
    assert "agg_breadth_ns" in tbls

    # snapshot the physical files of an early (untouched) partition
    loc = (spark.sql(
        "DESCRIBE TABLE EXTENDED raw_intermediate.fct_momentum_ns")
        .where("col_name = 'Location'").first()["data_type"])
    loc_path = loc.removeprefix("file:")
    early = sorted(glob.glob(
        os.path.join(loc_path, "trade_date=1995-*", "*.parquet")))
    assert early, loc_path
    before = {f: (os.path.getmtime(f), os.path.getsize(f)) for f in early}

    # run 2 on the trailing slice only (the daily-run shape),
    # overlapping H2-1996 so matched keys take the update path: the
    # merge must land prefix + slice == a from-scratch build's keyset
    trailing = F.col("trade_date") >= F.lit("1996-07-01")
    merged = pipeline(trailing).run()["fct_momentum_ns"]
    full_src = universe_daily_from_tpch(spark, SF_SMALL)
    full = fct_trading_momentum(full_src, SMALL)
    assert n_prefix < merged.count() == full.count()
    assert merged.select("ticker", "trade_date", "close").exceptAll(
        full.select("ticker", "trade_date", "close")).count() == 0

    # untouched partitions were not rewritten
    after = {f: (os.path.getmtime(f), os.path.getsize(f)) for f in early}
    assert before == after


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


def test_runner_incremental_mutable_partition_column_no_stale_rows(spark):
    """r8 ADVICE item 2: an incremental model partitioned by a MUTABLE
    attribute (partition column NOT part of the unique key) must not
    leave a stale row alive when an update moves a key to a new
    partition value.  The runner now falls back to the unpartitioned
    manifest layout for that shape, where merge is a full keyed
    rewrite — no pruning assumption to violate."""
    import tempfile as _tf

    from stock_market_data_pipeline_spark.runner import Model, Runner

    wh = _tf.mkdtemp(prefix="runner_mut_")
    v1 = [("k1", "gold", 1.0), ("k2", "silver", 2.0)]
    v2 = [("k1", "silver", 9.0)]          # k1 MOVES gold -> silver

    def _reg(rows):
        r = Runner(spark, wh)
        r.register(Model(
            "tiers",
            lambda s, built: s.createDataFrame(
                rows, "id string, tier string, score double"),
            materialization="incremental",
            unique_key=["id"], partition_by=["tier"]))
        return r

    _reg(v1).run()
    out = _reg(v2).run()["tiers"]
    got = {(r.id, r.tier, r.score) for r in out.collect()}
    # exactly one k1 row — the moved one; no stale gold-partition ghost
    assert got == {("k1", "silver", 9.0), ("k2", "silver", 2.0)}
