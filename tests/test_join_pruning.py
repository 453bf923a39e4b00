"""Dynamic file pruning for joins (read_pruned_by_keys).

Contract (manifest.py): the distinct join keys of a filtered
dimension drive the manifest's full skipping stack — partition
pruning, zone maps, per-file Bloom probes — BEFORE the fact scan, so
a key-selective join opens only the files that can match.  The pruned
frame is a superset (skipping is file-granular); the join itself is
the exact predicate.  Beyond ``max_keys`` distinct keys the spec
degrades to the keys' [min, max] range — bounded driver traffic at
any dimension size.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.manifest import ManifestTable


@pytest.fixture()
def fact(spark, tmp_path):
    """60 rows, 3 date partitions, bloom on ticker, one file per
    (partition, 10-row chunk) so per-file skipping is observable."""
    rows = [(f"T{i:02d}", d, float(i))
            for d in ("2024-01-02", "2024-01-03", "2024-01-04")
            for i in range(20)]
    df = (spark.createDataFrame(
              rows, "ticker string, trade_date string, close double")
          .withColumn("trade_date", F.col("trade_date").cast("date"))
          .repartition(1).sortWithinPartitions("ticker"))
    return ManifestTable.create(
        df, str(tmp_path / "fact"), "trade_date",
        bloom={"cols": ["ticker"], "m": 1 << 12, "k": 5},
        max_records_per_file=5)


def test_keys_prune_files_and_join_matches(spark, fact):
    dim = spark.createDataFrame(
        [("T01", "tech"), ("T02", "tech")], "ticker string, s string")
    pruned, plan = fact.read_pruned_by_keys(spark, dim, "ticker")
    total = sum(r["files"] for r in
                fact._raw()["partitions"].values())
    assert plan["skipped"] > 0
    assert len(plan["files"]) < total
    got = (pruned.join(F.broadcast(dim), "ticker")
           .groupBy("ticker").count().collect())
    assert {(r["ticker"], r["count"]) for r in got} == {
        ("T01", 3), ("T02", 3)}


def test_pruned_superset_still_exact_after_join(spark, fact):
    """Equivalence against the unpruned join, row for row."""
    dim = spark.createDataFrame([("T05",), ("T19",)], "ticker string")
    pruned, _ = fact.read_pruned_by_keys(spark, dim, "ticker")
    exact = sorted(map(tuple, fact.read(spark).join(dim, "ticker")
                       .collect()))
    got = sorted(map(tuple, pruned.join(dim, "ticker").collect()))
    assert got == exact and len(got) == 6


def test_no_matching_keys_reads_nothing(spark, fact):
    dim = spark.createDataFrame([("ZZZ",)], "ticker string")
    pruned, plan = fact.read_pruned_by_keys(spark, dim, "ticker")
    assert plan["files"] == [] or plan["bloom_skipped"] > 0
    assert pruned.join(dim, "ticker").count() == 0


def test_oversized_dim_degrades_to_range(spark, fact):
    """More distinct keys than max_keys: no unbounded collect — the
    spec becomes the keys' [min, max] range and partition-date
    pruning still applies through a second predicate."""
    dim = spark.createDataFrame(
        [(f"T{i:02d}",) for i in range(20)], "ticker string")
    pruned, plan = fact.read_pruned_by_keys(spark, dim, "ticker",
                                            max_keys=5)
    # range T00..T19 spans everything: no files dropped, but the read
    # stays correct
    assert pruned.join(dim, "ticker").count() == 60
    assert len(plan["files"]) == sum(
        r["files"] for r in fact._raw()["partitions"].values())


def test_date_keys_prune_partitions(spark, fact):
    dim = (spark.createDataFrame([("2024-01-03",)], "d string")
           .select(F.col("d").cast("date").alias("trade_date")))
    pruned, plan = fact.read_pruned_by_keys(spark, dim, "trade_date")
    assert plan["partitions_pruned"] == 2
    assert pruned.count() == 20
