"""Metadata inspection tables: meta_partitions / meta_files /
meta_snapshots must agree with each other, with the write ops'
reports, and with actual reads — at zero data I/O for the
partition-level surface (commit-object only)."""

from __future__ import annotations

import json
import tempfile

from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.manifest import ManifestTable


def _frame(spark, lo, hi):
    return (spark.range(lo, hi)
            .select(F.col("id"),
                    (F.col("id") % 3).cast("string").alias("pt"),
                    (F.col("id") * 2).alias("v")))


def test_meta_tables_agree_across_surfaces(spark):
    root = tempfile.mkdtemp(prefix="meta_t_")
    table = ManifestTable.create(_frame(spark, 0, 90), root, ts="pt")
    table.append(_frame(spark, 90, 120))
    out = table.delete_where(spark, F.expr("pmod(id, 5) = 0"),
                             mode="dv")

    parts = {r["partition"]: r
             for r in table.meta_partitions(spark).collect()}
    assert set(parts) == {"0", "1", "2"}
    # live + dead == physical == files table's per-partition fold
    files = table.meta_files(spark).collect()
    phys = {}
    for r in files:
        phys[r["partition"]] = phys.get(r["partition"], 0) + r["rows"]
    for v, p in parts.items():
        assert p["live_rows"] + p["deleted_rows"] == phys[v]
        assert p["bytes"] > 0 and p["files"] >= 1
    assert sum(p["deleted_rows"] for p in parts.values()) \
        == out["rows_deleted"] == 24
    assert sum(p["live_rows"] for p in parts.values()) \
        == table.read(spark).count() == 96
    # every touched partition carries a DV sidecar ref
    assert all(p["dv_files"] >= 1 for p in parts.values())

    # zone maps in the files table are real parsed stats
    stats = [json.loads(r["stats_json"]) for r in files]
    assert all("id" in s and s["id"][0] <= s["id"][1] for s in stats)

    # snapshots: 3 commits, live rows traced through the DV delete
    snaps = sorted(table.meta_snapshots(spark).collect(),
                   key=lambda r: r["version"])
    assert [s["rows"] for s in snaps] == [90, 120, 96]
    assert [s["version"] for s in snaps] == \
        list(range(snaps[0]["version"], snaps[0]["version"] + 3))


def test_meta_refs_lists_main_branches_and_tags(spark):
    """REFS table (Iceberg db.t.refs analog): main head + live WAP
    branches (head/base/commits) + snapshot tags, each a small JSON
    read — and it tracks drop/publish lifecycle."""
    root = tempfile.mkdtemp(prefix="meta_r_")
    table = ManifestTable.create(_frame(spark, 0, 60), root, ts="pt")
    table.create_tag("v1")
    bt = table.create_branch("audit")
    bt.append(_frame(spark, 60, 90))

    refs = {(r["name"], r["type"]): r
            for r in table.meta_refs(spark).collect()}
    assert refs[("main", "branch")]["version"] == 1
    a = refs[("audit", "branch")]
    assert (a["version"], a["base"], a["commits"]) == (2, 1, 1)
    assert refs[("v1", "tag")]["version"] == 1

    table.publish_branch("audit")
    table.drop_branch("audit")
    table.drop_tag("v1")
    refs2 = {r["name"] for r in table.meta_refs(spark).collect()}
    assert refs2 == {"main"}
    assert table.meta_refs(spark).collect()[0]["version"] == 2


def test_meta_partitions_reads_no_shards(spark, monkeypatch):
    """The partition-level surface is commit-object-only: hydrating a
    shard from meta_partitions is a scale bug (O(#files) driver reads
    on a 100 TB table), so it must never call _entries."""
    root = tempfile.mkdtemp(prefix="meta_np_")
    table = ManifestTable.create(_frame(spark, 0, 60), root, ts="pt")

    def boom(*a, **k):
        raise AssertionError("meta_partitions hydrated a shard")

    monkeypatch.setattr(ManifestTable, "_entries", boom)
    rows = table.meta_partitions(spark).collect()
    assert sum(r["live_rows"] for r in rows) == 60
