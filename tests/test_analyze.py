"""ANALYZE TABLE column statistics on manifest tables.

Contract (manifest.py analyze / meta_column_stats): one distributed
aggregation records per-column NDV / null count / min / max in the
commit object, stamped with the analyzed version; the stats carry
commit-to-commit and surface as a metadata-only inspection table that
flags them STALE once the table commits past the analyzed version.
``approx=True`` swaps exact countDistinct for HyperLogLog — the
100 TB default.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.manifest import (
    ManifestTable,
    SchemaMismatch,
)


def _mkdf(spark, rows):
    df = spark.createDataFrame(
        rows, "ticker string, trade_date string, close double")
    return df.withColumn("trade_date",
                         F.col("trade_date").cast("date"))


BASE = [
    ("AAA", "2024-01-02", 10.0), ("BBB", "2024-01-02", 20.0),
    ("AAA", "2024-01-03", 11.0), ("BBB", "2024-01-03", None),
]


@pytest.fixture()
def table(spark, tmp_path):
    return ManifestTable.create(_mkdf(spark, BASE),
                                str(tmp_path / "t"), "trade_date")


def test_analyze_records_exact_stats(spark, table):
    payload = table.analyze(spark)
    # the analyze commit itself is version 2; it changes no data, so
    # the stats are valid (not stale) at that version
    assert payload["version"] == 2 and payload["approx"] is False
    got = {r["column"]: r for r in
           table.meta_column_stats(spark).collect()}
    assert got["ticker"]["ndv"] == 2
    assert got["ticker"]["nulls"] == 0
    assert got["ticker"]["vmin"] == "AAA"
    assert got["ticker"]["vmax"] == "BBB"
    assert got["close"]["ndv"] == 3          # NULL not a value
    assert got["close"]["nulls"] == 1
    assert got["trade_date"]["vmin"] == "2024-01-02"
    assert all(r["stale"] is False for r in got.values())


def test_stats_go_stale_after_a_commit(spark, table):
    table.analyze(spark)
    table.append(_mkdf(spark, [("CCC", "2024-01-04", 5.0)]))
    got = {r["column"]: r for r in
           table.meta_column_stats(spark).collect()}
    assert all(r["stale"] is True for r in got.values())
    assert got["ticker"]["ndv"] == 2         # recorded, now stale
    table.analyze(spark)                     # refresh
    got = {r["column"]: r for r in
           table.meta_column_stats(spark).collect()}
    assert got["ticker"]["ndv"] == 3
    assert all(r["stale"] is False for r in got.values())


def test_analyze_respects_dv_deletes(spark, table):
    """Live rows only: a merge-on-read delete's DV-dead rows must not
    count (read path applies the sidecars)."""
    table.delete_where(spark, "ticker = 'AAA'", mode="dv")
    table.analyze(spark)
    got = {r["column"]: r for r in
           table.meta_column_stats(spark).collect()}
    assert got["ticker"]["ndv"] == 1
    assert got["ticker"]["vmin"] == "BBB"


def test_partial_and_approx_analyze(spark, table):
    table.analyze(spark, columns=["ticker"], approx=True)
    got = {r["column"]: r for r in
           table.meta_column_stats(spark).collect()}
    assert got["ticker"]["ndv"] == 2         # HLL exact at tiny n
    assert got["close"]["ndv"] is None       # not analyzed
    with pytest.raises(SchemaMismatch, match="nope"):
        table.analyze(spark, columns=["nope"])
