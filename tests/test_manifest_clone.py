"""CLONE on manifest tables (Delta ``CREATE TABLE ... CLONE`` analog).

Contract (manifest.py clone): shallow clone is ZERO-COPY — the new
table's manifest borrows the source's immutable data files by absolute
path, so cloning costs O(metadata) regardless of data size; deep clone
copies the files and is fully self-contained.  Either way the clone is
an INDEPENDENT table: fresh history at v1, schema / column mapping /
Bloom spec / constraints carried, stream ledger and tags/branches NOT
carried, and writes to either side never affect the other.  Deletion
vectors survive the clone (sidecar copy with rewritten row addresses)
through BOTH read paths — ``ManifestTable.read`` and the DSv2
``format("manifest")`` reader.
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.manifest import (
    ConstraintViolation,
    ManifestTable,
)


def _mkdf(spark, rows):
    df = spark.createDataFrame(
        rows, "ticker string, trade_date string, close double")
    return df.withColumn("trade_date",
                         F.col("trade_date").cast("date"))


BASE = [
    ("AAA", "2024-01-02", 10.0), ("BBB", "2024-01-02", 20.0),
    ("AAA", "2024-01-03", 11.0), ("BBB", "2024-01-03", 21.0),
]


def _snap(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def src(spark, tmp_path):
    return ManifestTable.create(_mkdf(spark, BASE),
                                str(tmp_path / "src"), "trade_date")


def test_shallow_clone_is_zero_copy(spark, src, tmp_path):
    c = src.clone(str(tmp_path / "c"))
    assert _snap(c.read(spark)) == _snap(src.read(spark))
    assert c.version() == 1
    # zero-copy: not one data parquet landed under the clone root
    copied = glob.glob(os.path.join(c.root, "data", "**", "*.parquet"),
                       recursive=True)
    assert copied == []


def test_clone_pins_a_version(spark, src, tmp_path):
    v1 = _snap(src.read(spark))
    src.append(_mkdf(spark, [("CCC", "2024-01-04", 5.0)]))
    c = src.clone(str(tmp_path / "c"), version=1)
    assert _snap(c.read(spark)) == v1


def test_clone_and_source_diverge_independently(spark, src, tmp_path):
    c = src.clone(str(tmp_path / "c"))
    c.append(_mkdf(spark, [("CCC", "2024-01-04", 5.0)]))
    src.delete_where(spark, "ticker = 'AAA'")
    assert len(_snap(c.read(spark))) == 5       # clone: BASE + insert
    assert len(_snap(src.read(spark))) == 2     # source: BBB only
    assert src.version() == 2 and c.version() == 2


def test_shallow_clone_carries_deletion_vectors(spark, src, tmp_path):
    src.delete_where(spark, "ticker = 'AAA'", mode="dv")
    c = src.clone(str(tmp_path / "c"))
    got = _snap(c.read(spark))
    assert {r[0] for r in got} == {"BBB"}
    # same through the DSv2 reader (borrowed-file rel addressing)
    from stock_market_data_pipeline_spark.manifest_datasource import (
        ManifestDataSource,
    )
    spark.dataSource.register(ManifestDataSource)
    push = "spark.sql.python.filterPushdown.enabled"
    prior = spark.conf.get(push, None)
    spark.conf.set(push, "true")
    try:
        ds = (spark.read.format("manifest")
              .option("path", c.root).load())
        assert {r["ticker"] for r in ds.collect()} == {"BBB"}
        assert ds.count() == 2
    finally:
        spark.conf.set(push, prior if prior is not None else "false")


def test_deep_clone_is_self_contained(spark, src, tmp_path):
    src.delete_where(spark, "ticker = 'AAA'", mode="dv")
    c = src.clone(str(tmp_path / "c"), shallow=False)
    shutil.rmtree(src.root)                     # source gone entirely
    got = _snap(c.read(spark))
    assert {r[0] for r in got} == {"BBB"} and len(got) == 2


def test_clone_carries_schema_index_and_constraints(spark, src,
                                                    tmp_path):
    src.add_range_check(spark, "px_positive", "close", lo=0.0)
    src.rename_column("close", "px")
    c = src.clone(str(tmp_path / "c"))
    assert set(c.constraints_spec()) == {"px_positive"}
    assert "px" in c.read(spark).columns
    bad = _mkdf(spark, [("DDD", "2024-01-05", -1.0)]) \
        .withColumnRenamed("close", "px")
    with pytest.raises(ConstraintViolation, match="px_positive"):
        c.append(bad)


def test_compact_rehomes_borrowed_files(spark, src, tmp_path):
    c = src.clone(str(tmp_path / "c"))
    c.compact(spark, min_files=1)
    shutil.rmtree(src.root)
    assert _snap(c.read(spark)) == _snap(_mkdf(spark, BASE))


def test_clone_vacuum_never_touches_borrowed(spark, src, tmp_path):
    c = src.clone(str(tmp_path / "c"))
    c.vacuum(retention_seconds=0.0)
    assert _snap(c.read(spark)) == _snap(_mkdf(spark, BASE))
    assert _snap(src.read(spark)) == _snap(_mkdf(spark, BASE))


def test_clone_does_not_carry_the_stream_ledger(spark, src, tmp_path):
    src.append_batch(_mkdf(spark, [("CCC", "2024-01-04", 5.0)]),
                     stream_id="s1", batch_id=7)
    c = src.clone(str(tmp_path / "c"))
    assert c._raw().get("streams") == {}
    # a stream re-pointed at the clone is a fresh sink identity:
    # batch 7 must NOT be replay-suppressed
    c.append_batch(_mkdf(spark, [("DDD", "2024-01-05", 6.0)]),
                   stream_id="s1", batch_id=7)
    assert len(_snap(c.read(spark))) == 6


def test_clone_refuses_an_occupied_destination(spark, src, tmp_path):
    src.clone(str(tmp_path / "c"))
    with pytest.raises(RuntimeError, match="already holds"):
        src.clone(str(tmp_path / "c"))
