"""SQL-addressable manifest tables (VERDICT r10 #2):
`ManifestTable.register` binds a temp view over the DSv2 pushdown
path so raw `spark.sql` serves the governed table — live snapshot
semantics, time-travel pins, Delta's literal VERSION AS OF via
`manifest_sql`, and pushdown observable as task count."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.manifest import ManifestTable
from stock_market_data_pipeline_spark.manifest_datasource import (
    manifest_sql,
)


def _frame(spark, lo, hi):
    return (spark.range(lo, hi)
            .select(F.col("id"),
                    (F.col("id") % 4).cast("string").alias("pt"),
                    (F.col("id") * 2.0).alias("v")))


@pytest.fixture()
def t(spark, tmp_path):
    return ManifestTable.create(_frame(spark, 0, 100),
                                str(tmp_path / "t"), ts="pt")


def test_register_serves_table_via_sql(spark, t):
    t.register(spark, "reg_t")
    got = spark.sql("SELECT COUNT(*) AS n, SUM(v) AS s FROM reg_t "
                    "WHERE pt = '2'").collect()[0]
    assert got["n"] == 25
    assert got["s"] == sum(i * 2.0 for i in range(2, 100, 4))


def test_register_is_snapshot_scoped_and_rebindable(spark, t):
    """Registration pins the snapshot current at register() (the
    documented Delta-DataFrame-like semantics); re-registering the
    same name — the serving tier's per-request refresh — serves the
    new state, including merge-on-read deletes masked executor-side."""
    t.register(spark, "reg_live")
    assert spark.sql(
        "SELECT COUNT(*) AS n FROM reg_live").collect()[0]["n"] == 100
    t.append(_frame(spark, 100, 120))
    t.delete_where(spark, F.expr("pmod(id, 10) = 0"), mode="dv")
    assert spark.sql(
        "SELECT COUNT(*) AS n FROM reg_live").collect()[0]["n"] == 100
    t.register(spark, "reg_live")          # refresh: re-bind
    live = spark.sql(
        "SELECT COUNT(*) AS n FROM reg_live").collect()[0]["n"]
    assert live == 120 - 12        # append visible, DV delete masked


def test_register_version_pin(spark, t):
    t.append(_frame(spark, 100, 150))            # v2
    t.register(spark, "reg_v1", version=1)
    t.register(spark, "reg_v2", version=2)
    assert spark.sql(
        "SELECT COUNT(*) AS n FROM reg_v1").collect()[0]["n"] == 100
    assert spark.sql(
        "SELECT COUNT(*) AS n FROM reg_v2").collect()[0]["n"] == 150
    with pytest.raises(ValueError, match="at most ONE"):
        t.register(spark, "bad", version=1, tag="x")


def test_manifest_sql_version_as_of(spark, t):
    t.delete_where(spark, F.expr("id < 50"))     # v2 rewrite
    out = manifest_sql(
        spark,
        "SELECT (SELECT COUNT(*) FROM tt VERSION AS OF 1) AS before_n,"
        " COUNT(*) AS now_n FROM tt", {"tt": t})
    row = out.collect()[0]
    assert (row["before_n"], row["now_n"]) == (100, 50)


def test_manifest_sql_join_and_unknown_names(spark, t, tmp_path):
    other = ManifestTable.create(
        _frame(spark, 0, 10).select("id", "pt",
                                    F.col("v").alias("w")),
        str(tmp_path / "o"), ts="pt")
    spark.range(0, 5).createOrReplaceTempView("plain_view")
    out = manifest_sql(
        spark,
        "SELECT COUNT(*) AS n FROM tt VERSION AS OF 1 "
        "JOIN oo VERSION AS OF 1 USING (id, pt) "
        "WHERE id IN (SELECT id FROM plain_view)",
        {"tt": t, "oo": other})
    assert out.collect()[0]["n"] == 5


def test_register_sql_pushdown_task_count(spark, t):
    """The SQL front door plans through the same pruning as the
    DataFrame path: task count == surviving files."""
    t.register(spark, "reg_push")
    plan = t.scan_plan({"pt": ["3"]})
    probe = spark.sql("SELECT * FROM reg_push WHERE pt = '3'")
    assert probe.rdd.getNumPartitions() == len(plan["files"])
    total = sum(r["files"] for r in t._raw()["partitions"].values())
    assert len(plan["files"]) < total
