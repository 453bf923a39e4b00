"""Manifest-committed MERGE: atomic across ALL touched partitions.

The contract under test (manifest.py): a reader resolving through
``_manifests/CURRENT`` sees either the entire pre-merge snapshot or the
entire post-merge one — never a mix — and a writer crash anywhere
between staging and the CURRENT swap leaves the old snapshot fully
live.  This is the table-level transactionality the reference gets
from Snowflake's MERGE (fct_trading_momentum.sql:2-7) and that plain
dynamic partition overwrite (incremental.py) explicitly lacks.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.manifest import (
    CrashInjected,
    ManifestTable,
)

KEYS = ["ticker", "trade_date"]


def _mkdf(spark, rows):
    df = spark.createDataFrame(rows, "ticker string, trade_date string, close double")
    return df.withColumn("trade_date", F.col("trade_date").cast("date"))


BASE = [
    ("AAA", "2024-01-02", 10.0), ("BBB", "2024-01-02", 20.0),
    ("AAA", "2024-01-03", 11.0), ("BBB", "2024-01-03", 21.0),
    ("AAA", "2024-01-04", 12.0), ("BBB", "2024-01-04", 22.0),
]
# touches TWO partitions: updates 01-03 AAA, inserts CCC on 01-04,
# inserts a brand-new partition 01-05
UPDATES = [
    ("AAA", "2024-01-03", 99.0),
    ("CCC", "2024-01-04", 30.0),
    ("AAA", "2024-01-05", 13.0),
]


def _snap(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "mtable")
    t = ManifestTable.create(_mkdf(spark, BASE), root, ts="trade_date")
    return t


def test_create_and_read_roundtrip(spark, table):
    assert table.version() == 1
    assert _snap(table.read(spark)) == _snap(_mkdf(spark, BASE))


def test_merge_is_upsert_across_partitions(spark, table):
    table.merge(spark, _mkdf(spark, UPDATES), KEYS)
    assert table.version() == 2
    expect = {(t, d): c for (t, d, c) in BASE}
    expect.update({(t, d): c for (t, d, c) in UPDATES})
    got = {(r.ticker, str(r.trade_date)): r.close
           for r in table.read(spark).collect()}
    assert got == expect


def test_crash_before_commit_preserves_old_snapshot(spark, table):
    """THE crash-injection test: writer dies after staging every new
    partition directory but before the CURRENT swap.  The reader must
    see the untouched v1 snapshot, and a rerun of the same merge must
    heal to the merged state."""
    before = _snap(table.read(spark))
    with pytest.raises(CrashInjected):
        table.merge(spark, _mkdf(spark, UPDATES), KEYS,
                    _crash_before_commit=True)
    # old snapshot fully live, version unchanged
    assert table.version() == 1
    assert _snap(table.read(spark)) == before
    # orphaned staged files exist on disk but are invisible to readers
    data = os.path.join(table.root, "data")
    assert len(os.listdir(data)) == 2  # v1 txn + orphaned txn
    # rerun heals: same merge commits atomically
    table.merge(spark, _mkdf(spark, UPDATES), KEYS)
    assert table.version() == 2
    expect = {(t, d): c for (t, d, c) in BASE}
    expect.update({(t, d): c for (t, d, c) in UPDATES})
    got = {(r.ticker, str(r.trade_date)): r.close
           for r in table.read(spark).collect()}
    assert got == expect


def test_time_travel_and_vacuum(spark, table):
    table.merge(spark, _mkdf(spark, UPDATES), KEYS)
    # time travel: the v1 manifest still resolves the old snapshot
    assert _snap(table.read(spark, "manifest-00000001.json")) \
        == _snap(_mkdf(spark, BASE))
    merged_now = _snap(table.read(spark))
    removed = table.vacuum()
    # vacuum dropped the superseded partition dirs + old manifest
    assert any(r.startswith("data/") for r in removed)
    assert any(r.endswith("manifest-00000001.json") for r in removed)
    # live snapshot unchanged after vacuum
    assert _snap(table.read(spark)) == merged_now


def test_vacuum_reclaims_crash_orphans(spark, table):
    with pytest.raises(CrashInjected):
        table.merge(spark, _mkdf(spark, UPDATES), KEYS,
                    _crash_before_commit=True)
    before = _snap(table.read(spark))
    removed = table.vacuum()
    assert removed  # the orphaned txn went away
    data = os.path.join(table.root, "data")
    assert len(os.listdir(data)) == 1
    assert _snap(table.read(spark)) == before


def test_untouched_partition_dirs_not_rewritten(spark, table):
    """Partition-pruned write: a merge touching 3 of the partitions
    must not restage the untouched one (2024-01-02)."""
    live_before = table.manifest()["partitions"]
    table.merge(spark, _mkdf(spark, UPDATES), KEYS)
    live_after = table.manifest()["partitions"]
    assert live_after["2024-01-02"] == live_before["2024-01-02"]
    for v in ("2024-01-03", "2024-01-04", "2024-01-05"):
        assert live_after[v] != live_before.get(v)
