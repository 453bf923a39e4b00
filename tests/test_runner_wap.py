"""Runner WRITE-AUDIT-PUBLISH: audits gate every materialization
(the blocking `dbt test` the reference's DAG lacks —
daily_stock_pipeline_dag.py runs `dbt run` before `dbt test`, so a
failed test leaves the bad build live).  Path-based models audit on
an isolated manifest branch; a failed audit publishes NOTHING."""

from __future__ import annotations

import os
import tempfile

import pytest

from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.manifest import ManifestTable
from stock_market_data_pipeline_spark.runner import (
    AuditFailed, Model, Runner,
)


def _frame(spark, lo, hi, close=10.0):
    return (spark.range(lo, hi)
            .select(F.col("id"),
                    (F.col("id") % 4).cast("string").alias("grp"),
                    F.lit(close).cast("double").alias("close")))


NOT_NULL = {"not_null_close":
            lambda df: df.where(F.col("close").isNull())}
ALWAYS_FAIL = {"always_fail": lambda df: df.limit(1)}


def _runner(spark, wh, df, materialization="incremental",
            audits=NOT_NULL):
    r = Runner(spark, wh)
    r.register(Model("t", lambda s, built: df,
                     materialization=materialization,
                     unique_key=["id"], audits=audits))
    return r


def test_first_build_audit_fail_creates_nothing(spark):
    wh = tempfile.mkdtemp(prefix="wap_wh_")
    bad = _frame(spark, 0, 100).withColumn(
        "close", F.lit(None).cast("double"))
    with pytest.raises(AuditFailed) as e:
        _runner(spark, wh, bad).run()
    assert e.value.failures == {"not_null_close": 100}
    assert not os.path.isdir(os.path.join(wh, "t", "_manifests"))


def test_incremental_audit_fail_leaves_main_untouched(spark):
    wh = tempfile.mkdtemp(prefix="wap_wh_")
    _runner(spark, wh, _frame(spark, 0, 100)).run()
    table = ManifestTable(os.path.join(wh, "t"), None)
    v0, n0 = table.version(), table.read(spark).count()
    # poisoned batch: NULL closes on new keys
    bad = _frame(spark, 100, 150).withColumn(
        "close", F.lit(None).cast("double"))
    with pytest.raises(AuditFailed):
        _runner(spark, wh, bad).run()
    assert table.version() == v0
    assert table.read(spark).count() == n0 == 100
    assert table.branches() == {}      # failed branch dropped
    # a good batch afterwards publishes exactly one commit
    _runner(spark, wh, _frame(spark, 100, 150)).run()
    assert table.version() == v0 + 1
    assert table.read(spark).count() == 150
    assert table.branches() == {}      # published branch cleaned up


def test_table_refresh_audit_fail_keeps_old_build(spark):
    wh = tempfile.mkdtemp(prefix="wap_wh_")
    _runner(spark, wh, _frame(spark, 0, 50), "table").run()
    table = ManifestTable(os.path.join(wh, "t"), None)
    with pytest.raises(AuditFailed):
        _runner(spark, wh, _frame(spark, 0, 10), "table",
                ALWAYS_FAIL).run()
    assert table.read(spark).count() == 50   # old refresh still live
    # and a passing refresh replaces it atomically
    _runner(spark, wh, _frame(spark, 0, 30), "table").run()
    assert table.read(spark).count() == 30


def test_stale_wap_branch_from_crashed_run_is_recut(spark):
    wh = tempfile.mkdtemp(prefix="wap_wh_")
    _runner(spark, wh, _frame(spark, 0, 20)).run()
    table = ManifestTable(os.path.join(wh, "t"), None)
    # simulate a writer that died mid-audit: branch exists, half-done
    stale = table.create_branch("wap")
    stale.append(_frame(spark, 900, 910))
    assert table.branches()["wap"]["commits"] == 1
    _runner(spark, wh, _frame(spark, 20, 40)).run()
    assert table.branches() == {}
    out = table.read(spark)
    assert out.count() == 40                       # 0..40, no 900s
    assert out.where(F.col("id") >= 900).count() == 0


def test_view_audit_fail_never_registers(spark):
    wh = tempfile.mkdtemp(prefix="wap_wh_")
    name = "wap_view_never"
    r = Runner(spark, wh)
    r.register(Model(name, lambda s, built: _frame(s, 0, 5),
                     materialization="view", audits=ALWAYS_FAIL))
    with pytest.raises(AuditFailed):
        r.run()
    assert not any(t.name == name
                   for t in spark.catalog.listTables())


def test_catalog_sink_audit_fail_blocks_write(spark):
    wh = tempfile.mkdtemp(prefix="wap_wh_")
    r = Runner(spark, wh)
    r.register(Model("wap_cat_t", lambda s, built: _frame(s, 0, 10),
                     materialization="table", schema="raw_marts",
                     audits=ALWAYS_FAIL))
    with pytest.raises(AuditFailed):
        r.run()
    assert not spark.catalog.tableExists("raw_marts.wap_cat_t")


def test_all_failing_audits_reported_together(spark):
    wh = tempfile.mkdtemp(prefix="wap_wh_")
    audits = dict(NOT_NULL)
    audits["ids_small"] = lambda df: df.where(F.col("id") >= 10)
    bad = _frame(spark, 0, 20).withColumn(
        "close", F.when(F.col("id") < 5, None)
                  .otherwise(F.col("close")))
    with pytest.raises(AuditFailed) as e:
        _runner(spark, wh, bad, audits=audits).run()
    assert e.value.failures == {"not_null_close": 5, "ids_small": 10}
