"""Write-audit-publish branches (manifest.py create_branch /
publish_branch / drop_branch / branches(), §2.11).

The contract under test (Iceberg branch + fast-forward publish; the
isolation the reference's dbt build-test-swap LACKS — a failed ``dbt
test`` there leaves the bad build already published, models/marts/*):

- a branch is an invisible manifest chain: any write against it —
  append, merge, dv delete, schema evolution — leaves main's version
  AND read untouched;
- publish is an atomic fast-forward through the normal backend CAS,
  and STRICTLY a fast-forward: main advancing past the cut point
  fails the publish with CommitConflict instead of silently dropping
  commits;
- a dropped (audit-failed) branch's data files are vacuum orphans;
  an UNDROPPED branch head's files are live at ANY age;
- CDF survives a single-commit publish and is absent from a squash.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.manifest import (
    CommitConflict,
    ManifestTable,
)
from tests.test_manifest import BASE, UPDATES, _mkdf, _sibling, _snap


@pytest.fixture()
def wt(spark, tmp_path):
    return ManifestTable.create(
        _mkdf(spark, BASE), str(tmp_path / "wt"), ts="trade_date")


EXTRA = [("DDD", "2024-01-02", 40.0), ("DDD", "2024-01-06", 41.0)]


def test_branch_write_is_invisible_to_main(spark, wt):
    v0 = wt.version()
    before = _snap(wt.read(spark))
    bt = wt.create_branch("audit")
    bt.append(_mkdf(spark, EXTRA))
    assert wt.version() == v0
    assert _snap(wt.read(spark)) == before
    assert _snap(bt.read(spark)) == _snap(_mkdf(spark, BASE + EXTRA))
    assert wt.branches() == {
        "audit": {"base": v0, "head": v0 + 1, "commits": 1}}


def test_publish_fast_forwards_atomically(spark, wt):
    v0 = wt.version()
    bt = wt.create_branch("audit")
    bt.append(_mkdf(spark, EXTRA))
    out = wt.publish_branch("audit")
    assert out == {"published_version": v0 + 1, "commits": 1}
    assert wt.version() == v0 + 1
    assert _snap(wt.read(spark)) == _snap(_mkdf(spark, BASE + EXTRA))
    # a second read handle (fresh process shape) sees the same state
    assert _snap(_sibling(wt).read(spark)) == _snap(
        _mkdf(spark, BASE + EXTRA))


def test_publish_refuses_when_main_advanced(spark, wt):
    bt = wt.create_branch("audit")
    bt.append(_mkdf(spark, EXTRA))
    wt.append(_mkdf(spark, [("EEE", "2024-01-07", 50.0)]))
    with pytest.raises(CommitConflict, match="re-create the branch"):
        wt.publish_branch("audit")
    # main keeps its own commit; the branch is still inspectable
    assert ("EEE",) in {(r.ticker,) for r in wt.read(spark).collect()}
    assert wt.branches()["audit"]["commits"] == 1


def test_two_branches_same_base_second_publish_conflicts(spark, wt):
    b1 = wt.create_branch("a1")
    b1.append(_mkdf(spark, EXTRA))
    b2 = wt.create_branch("a2")
    b2.append(_mkdf(spark, [("FFF", "2024-01-08", 60.0)]))
    assert wt.publish_branch("a1")["published_version"] == wt.version()
    with pytest.raises(CommitConflict):
        wt.publish_branch("a2")


def test_zero_commit_branch_publishes_nothing(spark, wt):
    v0 = wt.version()
    wt.create_branch("audit")
    assert wt.publish_branch("audit") == {
        "published_version": None, "commits": 0}
    assert wt.version() == v0


def test_create_existing_branch_refused(spark, wt):
    wt.create_branch("audit")
    with pytest.raises(RuntimeError, match="already exists"):
        wt.create_branch("audit")
    with pytest.raises(ValueError, match="branch name"):
        wt.create_branch("bad.name")


def test_branch_ops_run_on_the_right_handle(spark, wt):
    bt = wt.create_branch("audit")
    for call in (lambda: bt.create_branch("x"),
                 lambda: bt.publish_branch("x"),
                 lambda: bt.drop_branch("x"),
                 lambda: bt.vacuum(0)):
        with pytest.raises(RuntimeError, match="main table"):
            call()


def test_vacuum_keeps_live_branch_head_at_any_age(spark, wt):
    bt = wt.create_branch("audit")
    bt.append(_mkdf(spark, EXTRA))
    branch_state = _snap(bt.read(spark))
    wt.vacuum(0)            # zero retention: everything non-live goes
    # the unpublished branch survives a full-strength vacuum intact
    assert _snap(bt.read(spark)) == branch_state
    assert wt.branches()["audit"]["commits"] == 1
    # and is still publishable afterwards
    assert wt.publish_branch("audit")["commits"] == 1
    assert _snap(wt.read(spark)) == branch_state


def test_dropped_branch_files_are_vacuum_orphans(spark, wt):
    main_state = _snap(wt.read(spark))
    bt = wt.create_branch("audit")
    bt.append(_mkdf(spark, EXTRA))
    mf = bt._raw()
    branch_only = {e["path"] for v in mf["partitions"]
                   for e in bt._entries(mf, v)} - {
        e["path"] for v in wt._raw()["partitions"]
        for e in wt._entries(wt._raw(), v)}
    assert branch_only
    assert wt.drop_branch("audit") == 2     # cut copy + 1 commit
    removed = set(wt.vacuum(0))
    assert branch_only <= removed
    assert _snap(wt.read(spark)) == main_state
    assert wt.branches() == {}


def test_merge_and_dv_delete_on_branch_publish_correctly(spark, wt):
    """The whole write surface works branch-side: a three-clause MERGE
    then a merge-on-read DV delete, audited, published — main shows
    the composed result and the DV sidecars survive the publish."""
    bt = wt.create_branch("audit")
    bt.merge(spark, _mkdf(spark, UPDATES), keys=["ticker", "trade_date"])
    out = bt.delete_where(spark, F.col("ticker") == "BBB", mode="dv")
    assert out["partitions_rewritten"] == 0 and out["rows_deleted"] > 0
    expect = _snap(bt.read(spark))
    assert wt.publish_branch("audit")["commits"] == 2
    assert _snap(wt.read(spark)) == expect
    assert not any(r.ticker == "BBB" for r in wt.read(spark).collect())
    # published refs still carry the sidecars; vacuum keeps them
    assert sum(r.get("dv_rows", 0)
               for r in wt._raw()["partitions"].values()) > 0
    wt.vacuum(0)
    assert _snap(wt.read(spark)) == expect


def test_single_commit_publish_keeps_cdf_squash_drops_it(spark, wt):
    bt = wt.create_branch("one")
    bt.append(_mkdf(spark, EXTRA), cdf=True)
    v = wt.publish_branch("one")["published_version"]
    ch = wt.changes(spark, v)
    assert ch.count() == len(EXTRA)
    assert set(r._change_type for r in ch.collect()) == {"insert"}
    bt2 = wt.create_branch("two")
    bt2.append(_mkdf(spark, [("GGG", "2024-01-09", 70.0)]), cdf=True)
    bt2.append(_mkdf(spark, [("HHH", "2024-01-10", 80.0)]), cdf=True)
    v2 = wt.publish_branch("two")["published_version"]
    assert "cdf" not in wt._raw(wt._mname(v2))


def test_schema_evolution_on_branch(spark, wt):
    bt = wt.create_branch("audit")
    bt.add_columns([("venue", "string")])
    ext = _mkdf(spark, EXTRA).withColumn("venue", F.lit("XNYS"))
    bt.append(ext)
    assert "venue" not in wt.read(spark).columns   # isolation
    wt.publish_branch("audit")
    got = wt.read(spark)
    assert "venue" in got.columns
    assert got.where(F.col("venue") == "XNYS").count() == len(EXTRA)


def test_branch_chain_keeps_appends_never_conflict(spark, wt):
    """Two writer handles on the SAME branch: blind appends rebase
    through the branch chain's CAS exactly as on main (appends never
    conflict), and both land — the branch sits behind the same
    optimistic protocol, not a weaker copy of it."""
    bt1 = wt.create_branch("audit")
    bt2 = ManifestTable(wt.root, wt.ts, branch="audit")
    bt1.append(_mkdf(spark, EXTRA))
    bt2.append(_mkdf(spark, [("ZZZ", "2024-01-11", 90.0)]))
    assert wt.branches()["audit"]["commits"] == 2
    assert _snap(bt1.read(spark)) == _snap(_mkdf(
        spark, BASE + EXTRA + [("ZZZ", "2024-01-11", 90.0)]))
    # ... and a publish carries both writers' commits in one squash
    assert wt.publish_branch("audit")["commits"] == 2
    assert _snap(wt.read(spark)) == _snap(bt1.read(spark))
