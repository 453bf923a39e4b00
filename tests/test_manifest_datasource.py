"""`spark.read.format("manifest")`: the Python DataSource over
ManifestTable — pinned schema, DV-correct reads, and Catalyst-pushed
filters driving scan_plan's pruning (task count == surviving files)."""

from __future__ import annotations

import tempfile

import pytest

from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.manifest import ManifestTable
from stock_market_data_pipeline_spark.manifest_datasource import (
    ManifestDataSource,
)

PUSH = "spark.sql.python.filterPushdown.enabled"


@pytest.fixture()
def pushdown(spark):
    spark.dataSource.register(ManifestDataSource)
    prior = spark.conf.get(PUSH, "false")
    spark.conf.set(PUSH, "true")
    yield
    spark.conf.set(PUSH, prior)


def _table(spark, n=3000, dv=True, bloom=None):
    root = tempfile.mkdtemp(prefix="mds_t_")
    df = (spark.range(0, n)
          .select(F.col("id"),
                  (F.col("id") % 10).cast("string").alias("pt"),
                  (F.col("id") * 2).alias("v")))
    t = ManifestTable.create(df, root, ts="pt", bloom=bloom)
    if dv:
        t.delete_where(spark, F.expr("pmod(id, 7) = 0"), mode="dv")
    return root, t


def test_schema_and_dv_correct_read(spark, pushdown):
    root, _ = _table(spark)
    d = spark.read.format("manifest").load(root)
    assert d.schema.simpleString() == \
        "struct<id:bigint,pt:string,v:bigint>"
    live = [i for i in range(3000) if i % 7 != 0]
    assert d.count() == len(live)
    assert sorted(r["id"] for r in d.collect()) == live


def test_pushdown_prunes_partitions_to_task_count(spark, pushdown):
    root, t = _table(spark)
    d = spark.read.format("manifest").load(root)
    full = d.rdd.getNumPartitions()
    filt = d.where((F.col("pt") == "3") & (F.col("id") >= 100))
    expect_files = len(t.scan_plan(
        {"pt": ["3"], "id": (100, None)})["files"])
    assert filt.rdd.getNumPartitions() == expect_files < full
    expect = [i for i in range(100, 3000) if i % 10 == 3 and i % 7]
    assert sorted(r["id"] for r in filt.collect()) == expect


def test_range_and_in_filters_fold_and_stay_residual(spark, pushdown):
    root, _ = _table(spark)
    d = spark.read.format("manifest").load(root)
    out = d.where(F.col("pt").isin("2", "5")
                  & (F.col("id") > 40) & (F.col("id") <= 2000))
    expect = [i for i in range(41, 2001)
              if i % 10 in (2, 5) and i % 7]
    assert sorted(r["id"] for r in out.collect()) == expect
    assert out.rdd.getNumPartitions() == 2    # two partition values


def test_fully_pruned_read_is_empty(spark, pushdown):
    root, _ = _table(spark, dv=False)
    d = spark.read.format("manifest").load(root)
    gone = d.where(F.col("pt") == "no-such-partition")
    assert gone.count() == 0


def test_bloom_membership_prunes_files(spark, pushdown):
    """An equality probe on a bloom-indexed, hash-scattered key must
    skip files zone maps cannot (every file's [min,max] spans the
    id domain when ids are scattered mod-partitioned)."""
    root = tempfile.mkdtemp(prefix="mds_b_")
    df = (spark.range(0, 4000)
          .select(F.col("id"),
                  (F.col("id") % 8).cast("string").alias("pt")))
    t = ManifestTable.create(df, root, ts="pt",
                             bloom={"cols": ["id"], "m": 1 << 14,
                                    "k": 5})
    spark_plan = t.scan_plan({"id": [1234]})
    assert spark_plan["bloom_skipped"] > 0
    d = spark.read.format("manifest").load(root)
    probe = d.where(F.col("id") == 1234)
    assert probe.rdd.getNumPartitions() == len(spark_plan["files"])
    assert [r["pt"] for r in probe.collect()] == ["2"]


def test_date_range_pushdown_canonicalizes(spark, pushdown):
    root = tempfile.mkdtemp(prefix="mds_d_")
    df = (spark.range(0, 365)
          .select(F.date_add(F.lit("1997-01-01").cast("date"),
                             F.col("id").cast("int")).alias("d"),
                  F.col("id")))
    df = df.withColumn("m", F.date_format("d", "yyyy-MM"))
    ManifestTable.create(df, root, ts="m")
    d = spark.read.format("manifest").load(root)
    out = d.where(F.col("d").between("1997-03-10", "1997-04-05"))
    assert out.count() == 27
    assert out.rdd.getNumPartitions() == 2    # March + April only
