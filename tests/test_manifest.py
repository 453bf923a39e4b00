"""Manifest-committed MERGE: atomic across ALL touched partitions.

The contract under test (manifest.py): a reader resolving through the
highest committed manifest sees either the entire pre-merge snapshot
or the entire post-merge one — never a mix — and a writer crash
anywhere between staging and the commit link leaves the old snapshot
fully live.  This is the table-level transactionality the reference
gets from Snowflake's MERGE (fct_trading_momentum.sql:2-7); since
round 8 this layer is the engine's DEFAULT write path (the per-
partition dynamic-overwrite mechanism it replaced is gone).
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


def _backend(kind: str):
    from stock_market_data_pipeline_spark.manifest import (
        CoordinatorClaimBackend,
        PosixLinkBackend,
    )
    return {"posix": PosixLinkBackend,
            "coordinator": CoordinatorClaimBackend}[kind]()


#: the commit-protocol tests (crash / conflict / race / vacuum) run
#: against BOTH CommitBackends (VERDICT r8 #2) via indirect
#: parametrize; everything else uses the default posix backend
BOTH_BACKENDS = pytest.mark.parametrize(
    "table", ["posix", "coordinator"], indirect=True)


@pytest.fixture()
def table(spark, tmp_path, request):
    root = str(tmp_path / "mtable")
    backend = _backend(getattr(request, "param", "posix"))
    t = ManifestTable.create(_mkdf(spark, BASE), root, ts="trade_date",
                             backend=backend)
    return t


def _sibling(table) -> ManifestTable:
    """A second writer handle on the same table, SAME backend kind —
    what a concurrent process using this deployment's storage would
    construct."""
    return ManifestTable(table.root, table.ts,
                         backend=type(table.backend)())


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


@BOTH_BACKENDS
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
    # DEFAULT retention: young history is retained (r8 ADVICE item 4)
    # — a routine vacuum must NOT disable time travel inside the window
    assert table.vacuum() == []
    assert _snap(table.read(spark, "manifest-00000001.json")) \
        == _snap(_mkdf(spark, BASE))
    removed = table.vacuum(retention_seconds=0)
    # zero retention: superseded partition dirs + old manifest go
    assert any(r.startswith("data/") for r in removed)
    assert any(r.endswith("manifest-00000001.json") for r in removed)
    # live snapshot unchanged after vacuum
    assert _snap(table.read(spark)) == merged_now


def test_vacuum_retains_history_within_retention(spark, table):
    """r8 ADVICE item 4 end-to-end: inside the retention window a
    change-feed consumer polling since_version=N and a restore(N) both
    survive a routine vacuum; once the history AGES OUT, the same
    default-parameter vacuum reclaims manifests, shards and their
    now-unreferenced data files together."""
    import time

    v1 = table.version()
    table.merge(spark, _mkdf(spark, UPDATES), KEYS)
    table.vacuum()                               # routine, default 24 h
    # the change-feed consumer keeps working...
    inc = {(r.ticker, r.close)
           for r in table.read_incremental(spark, v1).collect()}
    assert ("CCC", 30.0) in inc
    # ...and so does restore to the pre-merge version
    table.restore(v1)
    assert _snap(table.read(spark)) == _snap(_mkdf(spark, BASE))
    table.restore(2)                             # roll forward again
    # age the v1/v2 history out: every file mtime older than retention
    old = time.time() - 7 * 86400
    for dp, _, fs in os.walk(table.root):
        for f in fs:
            p = os.path.join(dp, f)
            if "manifest-%08d" % table.version() not in f:
                os.utime(p, (old, old))
    removed = table.vacuum()
    assert any("manifest-00000001.json" in r for r in removed)
    with pytest.raises(FileNotFoundError):
        table.restore(v1)                        # aged out: clear error


@BOTH_BACKENDS
def test_vacuum_reclaims_crash_orphans(spark, table):
    with pytest.raises(CrashInjected):
        table.merge(spark, _mkdf(spark, UPDATES), KEYS,
                    _crash_before_commit=True)
    before = _snap(table.read(spark))
    # grace window: the young orphan txn survives (consumed coordinator
    # claim markers are the one thing a routine vacuum may clear)
    assert [r for r in table.vacuum() if ".claim-" not in r] == []
    removed = table.vacuum(retention_seconds=0)
    assert removed  # the orphaned txn went away
    data = os.path.join(table.root, "data")
    assert len(os.listdir(data)) == 1
    assert _snap(table.read(spark)) == before


def test_vacuum_skips_inflight_stager(spark, table, monkeypatch):
    """VERDICT r7 #3: vacuum() running CONCURRENTLY with a writer that
    is between ``_stage`` and ``_commit`` must not delete the staged
    files — the writer's subsequent commit must read back intact.  The
    default retention gives every young, uncommitted txn dir a grace
    window; only aged orphans are reclaimed."""
    from stock_market_data_pipeline_spark import manifest as M

    orig_stage = M.ManifestTable._stage

    def stage_then_vacuum(self, df, **kw):
        staged = orig_stage(self, df, **kw)
        # a maintenance job fires vacuum exactly in the crash window
        ManifestTable(table.root, table.ts).vacuum()
        return staged

    monkeypatch.setattr(M.ManifestTable, "_stage", stage_then_vacuum)
    table.merge(spark, _mkdf(spark, UPDATES), KEYS)
    monkeypatch.setattr(M.ManifestTable, "_stage", orig_stage)
    expect = {(t, d): c for (t, d, c) in BASE}
    expect.update({(t, d): c for (t, d, c) in UPDATES})
    got = {(r.ticker, str(r.trade_date)): r.close
           for r in table.read(spark).collect()}
    assert got == expect                 # commit reads back intact


def test_vacuum_reclaims_aged_orphans_under_default_retention(
        spark, table):
    """The grace window is an AGE bound, not amnesty: an orphan txn
    whose files are older than the retention is reclaimed by the
    default-parameter vacuum."""
    import time

    with pytest.raises(CrashInjected):
        table.merge(spark, _mkdf(spark, UPDATES), KEYS,
                    _crash_before_commit=True)
    live = {e["path"] for es in table.manifest()["partitions"].values()
            for e in es}
    data = os.path.join(table.root, "data")
    old = time.time() - 7 * 86400
    for dp, _, fs in os.walk(data):
        for f in fs:
            p = os.path.join(dp, f)
            if os.path.relpath(p, table.root) not in live:
                os.utime(p, (old, old))
        os.utime(dp, (old, old))
    removed = table.vacuum()             # default retention
    assert any(r.startswith("data/") for r in removed)
    assert len(os.listdir(data)) == 1    # only the live txn remains


def test_untouched_partition_dirs_not_rewritten(spark, table):
    """Partition-pruned write: a merge touching 3 of the partitions
    must not restage the untouched one (2024-01-02)."""
    live_before = table.manifest()["partitions"]
    table.merge(spark, _mkdf(spark, UPDATES), KEYS)
    live_after = table.manifest()["partitions"]
    assert live_after["2024-01-02"] == live_before["2024-01-02"]
    for v in ("2024-01-03", "2024-01-04", "2024-01-05"):
        assert live_after[v] != live_before.get(v)


# -- round 7: file-level stats, skipping, compaction, concurrency ----


def test_manifest_records_file_stats(spark, table):
    """Every file entry carries rows/bytes and footer min-max for the
    scalar columns; per-partition row sums reconcile with the data."""
    parts = table.manifest()["partitions"]
    assert set(parts) == {"2024-01-02", "2024-01-03", "2024-01-04"}
    for value, entries in parts.items():
        assert entries, value
        for e in entries:
            assert e["rows"] > 0 and e["bytes"] > 0
            assert "close" in e["stats"] and "ticker" in e["stats"]
            lo, hi = e["stats"]["close"]
            assert lo <= hi
        assert sum(e["rows"] for e in entries) == 2  # AAA + BBB per day
    total = sum(e["rows"] for es in parts.values() for e in es)
    assert total == table.read(spark).count()


def test_partition_pruned_read(spark, table):
    """A range on the partition column resolves only matching files —
    the manifest prunes without any directory listing — and the pruned
    read plus the exact filter equals the full-scan answer."""
    where = {"trade_date": ("2024-01-03", "2024-01-04")}
    plan = table.scan_plan(where)
    assert plan["partitions_pruned"] == 1        # 2024-01-02 dropped
    assert plan["skipped"] >= 1
    pruned = (table.read(spark, where=where)
              .where(F.col("trade_date").between("2024-01-03",
                                                 "2024-01-04")))
    full = (table.read(spark)
            .where(F.col("trade_date").between("2024-01-03",
                                               "2024-01-04")))
    assert _snap(pruned) == _snap(full)


def test_stats_skipping_on_value_column(spark, table):
    """A predicate on a NON-partition column skips files whose footer
    [min, max] cannot intersect it (zone-map semantics), and the kept
    superset + exact filter is still correct."""
    # close >= 100 matches nothing; every file's max close is < 100
    plan = table.scan_plan({"close": (100.0, None)})
    assert plan["files"] == []
    assert plan["skipped"] == 3
    # a selective-but-nonempty bound keeps only intersecting files
    where = {"close": (21.5, None)}
    plan = table.scan_plan(where)
    assert 0 < len(plan["files"]) < 3
    got = (table.read(spark, where=where)
           .where(F.col("close") >= 21.5))
    assert _snap(got) == _snap(table.read(spark)
                               .where(F.col("close") >= 21.5))


def test_append_and_compact(spark, table):
    """Blind appends accumulate files per partition; compact() folds
    each multi-file partition to one file atomically, preserving rows
    exactly and keeping the pre-compaction snapshot time-travelable."""
    table.append(_mkdf(spark, [("CCC", "2024-01-02", 30.0)]))
    table.append(_mkdf(spark, [("DDD", "2024-01-02", 40.0)]))
    parts = table.manifest()["partitions"]
    assert len(parts["2024-01-02"]) == 3
    before = _snap(table.read(spark))
    pre_name = f"manifest-{table.version():08d}.json"
    out = table.compact(spark)
    assert out["partitions"] == 1
    assert out["files_before"] == 3 and out["files_after"] == 1
    assert len(table.manifest()["partitions"]["2024-01-02"]) == 1
    assert _snap(table.read(spark)) == before            # row-preserving
    assert _snap(table.read(spark, pre_name)) == before  # time travel
    # idempotent: nothing left to compact
    assert table.compact(spark)["partitions"] == 0


def test_vacuum_dry_run_reports_without_deleting(spark, table):
    """vacuum(dry_run=True) returns exactly what a real vacuum would
    reclaim — and deletes nothing: same list on the real pass, table
    bytes untouched in between."""
    import os

    table.merge(spark, _mkdf(spark, UPDATES), KEYS)
    before = _snap(table.read(spark))
    planned = table.vacuum(retention_seconds=0, dry_run=True)
    assert planned                      # superseded v1 files exist
    assert all(os.path.exists(os.path.join(table.root, r))
               for r in planned if not r.endswith("data"))
    assert _snap(table.read(spark)) == before
    real = table.vacuum(retention_seconds=0)
    assert sorted(real) == sorted(planned)
    assert _snap(table.read(spark)) == before


def test_compact_partition_targeted(spark, table):
    """compact(partitions=[...]) — Delta's OPTIMIZE WHERE shape:
    only the named partitions rewrite; the others ride by ref
    untouched (the 100 TB incremental-maintenance pattern).  Unknown
    values raise instead of silently no-op'ing."""
    table.append(_mkdf(spark, [("CCC", "2024-01-02", 30.0),
                               ("EEE", "2024-01-03", 50.0)]))
    table.append(_mkdf(spark, [("DDD", "2024-01-02", 40.0),
                               ("FFF", "2024-01-03", 60.0)]))
    mf = table._raw()
    other_ref = mf["partitions"]["2024-01-03"]["shard"]
    before = _snap(table.read(spark))
    out = table.compact(spark, partitions=["2024-01-02"])
    assert out["partitions"] == 1 and out["files_after"] == 1
    mf2 = table._raw()
    assert len(table._entries(mf2, "2024-01-02")) == 1
    # untargeted partition: same shard ref, still multi-file
    assert mf2["partitions"]["2024-01-03"]["shard"] == other_ref
    assert len(table._entries(mf2, "2024-01-03")) == 3
    assert _snap(table.read(spark)) == before
    with pytest.raises(KeyError, match="not in the live snapshot"):
        table.compact(spark, partitions=["2024-99-99"])


@BOTH_BACKENDS
def test_commit_conflict_detected_not_torn(spark, table):
    """Optimistic concurrency: writer B commits between writer A's
    read snapshot and A's commit link.  A must raise CommitConflict;
    B's commit stays fully live (no lost update, no torn mix); A's
    retry against the new snapshot lands both writes."""
    from stock_market_data_pipeline_spark.manifest import CommitConflict

    b_updates = _mkdf(spark, [("BBB", "2024-01-03", 77.0)])

    def competing_commit():
        _sibling(table).merge(spark, b_updates, KEYS)

    with pytest.raises(CommitConflict):
        table.merge(spark, _mkdf(spark, UPDATES), KEYS,
                    _pre_commit_hook=competing_commit)
    got = {(r.ticker, str(r.trade_date)): r.close
           for r in table.read(spark).collect()}
    expect = {(t, d): c for (t, d, c) in BASE}
    expect[("BBB", "2024-01-03")] = 77.0      # B won; A fully invisible
    assert got == expect
    table.merge(spark, _mkdf(spark, UPDATES), KEYS)  # A retries cleanly
    expect.update({(t, d): c for (t, d, c) in UPDATES})
    got = {(r.ticker, str(r.trade_date)): r.close
           for r in table.read(spark).collect()}
    assert got == expect
    # vacuum reclaims A's first-attempt orphan files (aged out)
    assert any(r.startswith("data/")
               for r in table.vacuum(retention_seconds=0))


def test_append_batch_exactly_once_and_ledger_survives_compact(spark, table):
    """The streaming sink contract: (a) a batch commits data + ledger
    atomically, (b) a replayed batch id is refused without staging,
    (c) maintenance commits (compact) CARRY the ledger — losing it
    would silently re-admit replayed batches after a compaction."""
    b0 = _mkdf(spark, [("EEE", "2024-01-02", 50.0)])
    b1 = _mkdf(spark, [("FFF", "2024-01-02", 60.0)])
    assert table.append_batch(b0, "s1", 0) is True
    assert table.append_batch(b1, "s1", 1) is True
    assert table.manifest()["streams"] == {"s1": 1}
    rows = _snap(table.read(spark))
    v = table.version()
    # replay of batch 1 (and a stale batch 0): refused, nothing staged
    assert table.append_batch(b1, "s1", 1) is False
    assert table.append_batch(b0, "s1", 0) is False
    assert table.version() == v and _snap(table.read(spark)) == rows
    # an independent stream has its own high-water mark
    assert table.append_batch(b0, "s2", 0) is True
    # compaction folds the multi-file partition and KEEPS the ledger
    out = table.compact(spark)
    assert out["partitions"] >= 1
    assert table.manifest()["streams"] == {"s1": 1, "s2": 0}
    assert table.append_batch(b1, "s1", 1) is False


@BOTH_BACKENDS
def test_merge_batch_crash_mid_upsert_preserves_old_snapshot(spark, table):
    """VERDICT r7 #1's done-criterion: a crash mid-streaming-upsert
    (after the merge staged its rewritten partitions, before the
    commit link) leaves the streaming target readable at the OLD
    snapshot with the ledger unadvanced; re-delivering the batch heals
    to the merged state; a second delivery is refused."""
    b0 = _mkdf(spark, [("AAA", "2024-01-03", 55.0)])
    assert table.merge_batch(spark, b0, KEYS, "s", 0) is True
    rows_after_b0 = _snap(table.read(spark))
    v = table.version()
    b1 = _mkdf(spark, [("MMM", "2024-01-03", 66.0)])
    with pytest.raises(CrashInjected):
        table.merge_batch(spark, b1, KEYS, "s", 1,
                          _crash_before_commit=True)
    # old snapshot fully live, ledger unadvanced
    assert table.version() == v
    assert table.manifest()["streams"] == {"s": 0}
    assert _snap(table.read(spark)) == rows_after_b0
    # checkpoint recovery re-delivers batch 1: heals atomically
    assert table.merge_batch(spark, b1, KEYS, "s", 1) is True
    vals = {(r[0], str(r[1]), r[2]) for r in table.read(spark).collect()}
    assert ("MMM", "2024-01-03", 66.0) in vals
    assert ("AAA", "2024-01-03", 55.0) in vals      # b0 merge survived
    # a replay of the committed batch is refused without staging
    v2 = table.version()
    assert table.merge_batch(spark, b1, KEYS, "s", 1) is False
    assert table.version() == v2
    # the crashed attempt's staged orphans are vacuum-reclaimable
    assert any(r.startswith("data/")
               for r in table.vacuum(retention_seconds=0))
    assert ("MMM", "2024-01-03", 66.0) in {
        (r[0], str(r[1]), r[2]) for r in table.read(spark).collect()}


@BOTH_BACKENDS
def test_merge_batch_restages_through_conflict(spark, table, monkeypatch):
    """A CommitConflict mid-merge must RE-STAGE against the new
    snapshot (unlike append_batch's stage-once retry): the competing
    writer may have rewritten the very partitions this merge read.
    Both writes must land; the merge must not resurrect the
    pre-conflict version of the partition it merged."""
    from stock_market_data_pipeline_spark import manifest as M

    mine = _mkdf(spark, [("NNN", "2024-01-02", 1.0)])
    competing = _mkdf(spark, [("AAA", "2024-01-02", 88.0)])
    fired = {"done": False}
    orig = M.ManifestTable._commit

    def racy_commit(self, partitions, base_version, streams=None,
                    schema=None, cdf=None, cdf_kind="classified",
                    **kw):
        if not fired["done"]:
            fired["done"] = True
            ManifestTable(table.root, table.ts).merge(
                spark, competing, KEYS)
        return orig(self, partitions, base_version, streams=streams,
                    schema=schema, cdf=cdf, cdf_kind=cdf_kind, **kw)

    monkeypatch.setattr(M.ManifestTable, "_commit", racy_commit)
    assert table.merge_batch(spark, mine, KEYS, "s", 0) is True
    got = {(r.ticker, str(r.trade_date)): r.close
           for r in table.read(spark).collect()}
    assert got[("NNN", "2024-01-02")] == 1.0
    assert got[("AAA", "2024-01-02")] == 88.0   # competitor's row kept
    assert table.manifest()["streams"] == {"s": 0}


@BOTH_BACKENDS
def test_append_batch_retries_through_conflict(spark, table, monkeypatch):
    """A CommitConflict mid-append (another writer committed first)
    must re-read the snapshot and retry, landing BOTH writes."""
    from stock_market_data_pipeline_spark import manifest as M

    b = _mkdf(spark, [("GGG", "2024-01-05", 70.0)])
    competing = _mkdf(spark, [("HHH", "2024-01-05", 80.0)])
    fired = {"done": False}
    orig = M.ManifestTable._commit

    def racy_commit(self, partitions, base_version, streams=None,
                    schema=None, cdf=None, cdf_kind="classified",
                    **kw):
        if not fired["done"]:
            fired["done"] = True
            ManifestTable(table.root, table.ts).append(competing)
        return orig(self, partitions, base_version, streams=streams,
                    schema=schema, cdf=cdf, cdf_kind=cdf_kind, **kw)

    monkeypatch.setattr(M.ManifestTable, "_commit", racy_commit)
    assert table.append_batch(b, "s1", 0) is True
    got = _snap(table.read(spark))
    vals = {(r[0], str(r[1])) for r in got}
    assert ("GGG", "2024-01-05") in vals and ("HHH", "2024-01-05") in vals
    assert table.manifest()["streams"] == {"s1": 0}


def test_clustered_compaction_enables_file_skipping(spark, tmp_path):
    """Sort-within-partition + maxRecordsPerFile = the ZORDER-lite
    maintenance op: after `compact(cluster_by=["close"])` each file's
    footer [min, max] on close is a tight chunk, so a selective close
    predicate skips most files of the partition — and the rewrite is
    row-preserving with the ledger intact."""
    rows = [("T%03d" % (i % 7), "2024-02-0%d" % (1 + i % 2),
             float((i * 37) % 1000)) for i in range(1000)]
    t = ManifestTable.create(_mkdf(spark, rows), str(tmp_path / "zt"),
                             ts="trade_date")
    t.append_batch(_mkdf(spark, [("ZZZ", "2024-02-01", 1000.0)]),
                   "s", 0)
    before = _snap(t.read(spark))
    out = t.compact(spark, cluster_by=["close"],
                    max_records_per_file=100)
    assert out["partitions"] == 2
    assert out["files_after"] > out["partitions"]  # chunked output
    # tight per-file ranges: a 5%-wide predicate keeps few files
    plan_all = t.scan_plan()
    plan_sel = t.scan_plan({"close": (0.0, 50.0)})
    assert plan_sel["skipped"] > 0
    assert len(plan_sel["files"]) <= len(plan_all["files"]) // 2
    # row-preserving + exact residual filter still correct
    assert _snap(t.read(spark)) == before
    got = (t.read(spark, where={"close": (0.0, 50.0)})
           .where(F.col("close") <= 50.0))
    want = [r for r in before if r[2] <= 50.0]
    assert _snap(got) == sorted(want)
    assert t.manifest()["streams"] == {"s": 0}


def test_schema_drift_rejected_at_write_boundary(spark, table):
    """With mergeSchema=false a drifted append would make the new
    column silently vanish at read time; the manifest pins the schema
    and every write path fails loudly instead."""
    from stock_market_data_pipeline_spark.manifest import SchemaMismatch

    extra_col = (_mkdf(spark, [("III", "2024-01-06", 1.0)])
                 .withColumn("venue", F.lit("XNYS")))
    retyped = spark.createDataFrame(
        [("JJJ", "2024-01-06", 2)],
        "ticker string, trade_date string, close int",
    ).withColumn("trade_date", F.col("trade_date").cast("date"))
    v = table.version()
    for bad in (extra_col, retyped):
        with pytest.raises(SchemaMismatch):
            table.append(bad)
        with pytest.raises(SchemaMismatch):
            table.append_batch(bad, "s", 0)
        with pytest.raises(SchemaMismatch):
            table.merge(spark, bad, KEYS)
    assert table.version() == v               # nothing committed
    # matching schema (any column order) still flows
    reordered = _mkdf(spark, [("KKK", "2024-01-06", 3.0)]) \
        .select("close", "ticker", "trade_date")
    table.append(reordered)
    assert table.version() == v + 1


def test_file_entry_drops_partial_rowgroup_stats(tmp_path):
    """A column with footer stats in only SOME row groups (an all-NULL
    chunk writes no min/max) has an unknown true range: the manifest
    must drop it entirely — keeping the partial range would let
    scan_plan skip files that DO contain matching rows, the
    wrong-answer failure mode."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from stock_market_data_pipeline_spark.manifest import _file_entry

    path = str(tmp_path / "two_rg.parquet")
    schema = pa.schema([("a", pa.int64()), ("b", pa.float64())])
    rg1 = pa.table({"a": [1, 2], "b": [1.5, 2.5]}, schema=schema)
    rg2 = pa.table({"a": [3, 4],
                    "b": pa.array([None, None], pa.float64())},
                   schema=schema)
    with pq.ParquetWriter(path, schema) as w:
        w.write_table(rg1)          # row group 1: stats for a and b
        w.write_table(rg2)          # row group 2: b is all-NULL
    e = _file_entry(path, "rel/two_rg.parquet")
    assert e["rows"] == 4
    assert e["stats"]["a"] == [1.0, 4.0]     # complete in both groups
    assert "b" not in e["stats"]             # partial range dropped


def test_fully_pruned_read_is_typed_empty_frame(spark, table):
    """When every file is skipped the read must come back as an empty
    frame with the pinned schema (column names AND types), not a
    zero-path reader error — the same contract an engine gives a
    partition-pruned-to-nothing scan."""
    df = table.read(spark, where={"close": (10_000.0, None)})
    assert df.count() == 0
    assert dict(df.dtypes) == {"ticker": "string",
                               "trade_date": "date", "close": "double"}


def test_stat_bounds_answers_minmax_without_scan(spark, table):
    """Table-wide MIN/MAX folded from footer stats (the freshness /
    incremental-cutoff probe) — exact vs a real scan, and None (never
    a wrong bound) when a live file lacks stats for the column."""
    assert table.stat_bounds("trade_date") == ("2024-01-02",
                                               "2024-01-04")
    assert table.stat_bounds("close") == (10.0, 22.0)
    assert table.stat_bounds("no_such_column") is None


def test_history_tracks_snapshots(spark, table):
    """history() lists every committed snapshot oldest-first with its
    physical footprint; vacuum trims it to the live one."""
    table.merge(spark, _mkdf(spark, UPDATES), KEYS)
    table.append_batch(_mkdf(spark, [("LLL", "2024-01-06", 9.0)]),
                       "s", 3)
    h = table.history()
    assert [x["version"] for x in h] == [1, 2, 3]
    assert h[0]["rows"] == 6          # base snapshot
    assert h[-1]["rows"] == 9         # 6 base + 2 merge inserts + 1 append
    assert h[-1]["streams"] == {"s": 3}
    assert h[-1]["files"] > h[0]["files"]
    table.vacuum(retention_seconds=0)
    assert [x["version"] for x in table.history()] == [3]


def test_numeric_partition_values_prune_numerically(spark, tmp_path):
    """Integer partition keys must compare numerically during pruning:
    lexicographic '99' > '100' would wrongly drop a matching
    partition (a missing-rows wrong answer, not an error)."""
    df = spark.createDataFrame(
        [(b, float(b)) for b in (7, 99, 100, 300)], "bucket int, v double")
    t = ManifestTable.create(df, str(tmp_path / "nt"), ts="bucket")
    plan = t.scan_plan({"bucket": (50, 150)})
    kept_rows = _snap(t.read(spark, where={"bucket": (50, 150)})
                      .where(F.col("bucket").between(50, 150)))
    assert [r[0] for r in kept_rows] == [99, 100]
    assert plan["partitions_pruned"] == 2        # 7 and 300 only


def test_escaped_or_null_partition_values_rejected(spark, tmp_path):
    """Values the writer would Hive-escape (or NULL) break the raw-key
    lookup the manifest depends on; the write boundary fails loudly
    instead of letting a later merge silently replace the partition."""
    from stock_market_data_pipeline_spark.manifest import SchemaMismatch

    ts_df = spark.createDataFrame(
        [("2024-01-02 10:30:00", 1.0)], "t string, v double"
    ).withColumn("t", F.col("t").cast("timestamp"))
    with pytest.raises(SchemaMismatch):
        ManifestTable.create(ts_df, str(tmp_path / "et"), ts="t")
    null_df = spark.createDataFrame([(None, 1.0)], "d string, v double")
    with pytest.raises(SchemaMismatch):
        ManifestTable.create(null_df, str(tmp_path / "nt2"), ts="d")


def test_empty_read_preserves_column_order(spark, table):
    """The typed empty frame must carry the SAME column order as a
    non-empty read, or unions/positional access break depending on
    which side happened to prune to zero."""
    empty = table.read(spark, where={"close": (10_000.0, None)})
    full = table.read(spark)
    assert empty.columns == full.columns
    assert empty.unionAll(full).count() == full.count()


def test_delete_where_partition_shaped_and_atomic(spark, table):
    """Transactional DELETE: rows matching the predicate disappear in
    one atomic commit; a partition whose rows all match is DROPPED
    without a write; match-free partitions are carried by shard ref;
    the pre-delete snapshot stays time-travelable."""
    # a partition entirely OUTSIDE the delete range: must be carried
    # by shard ref, never read or rewritten
    table.append(_mkdf(spark, [("ZZZ", "2024-01-06", 99.0)]))
    pre_name = f"manifest-{table.version():08d}.json"
    refs_before = {v: r["shard"]
                   for v, r in table._raw()["partitions"].items()}
    # close in [11,21] matches: 20 (01-02 BBB), 11+21 (ALL of 01-03),
    # 12 (01-04 AAA) -> two partitions rewritten, one dropped whole
    out = table.delete_where(
        spark, (F.col("close") >= 11.0) & (F.col("close") <= 21.0),
        where={"close": (11.0, 21.0)})
    assert out == {"rows_deleted": 4, "partitions_rewritten": 2,
                   "partitions_dropped": 1}
    got = {(r.ticker, str(r.trade_date)) for r in
           table.read(spark).collect()}
    assert got == {("AAA", "2024-01-02"), ("BBB", "2024-01-04"),
                   ("ZZZ", "2024-01-06")}
    after = table._raw()["partitions"]
    assert "2024-01-03" not in after                   # dropped whole
    assert after["2024-01-06"]["shard"] == refs_before["2024-01-06"]
    assert after["2024-01-02"]["shard"] != refs_before["2024-01-02"]
    assert after["2024-01-04"]["shard"] != refs_before["2024-01-04"]
    # pre-delete snapshot intact (time travel)
    assert len(_snap(table.read(spark, pre_name))) == 7


def test_delete_where_null_condition_keeps_rows(spark, tmp_path):
    """SQL DELETE three-valued logic (r8 ADVICE item 1): a row whose
    condition evaluates to NULL is KEPT — in every partition, whether
    or not that partition also holds TRUE-matching rows.  The old
    ``where(~cond)`` silently deleted NULL-condition rows, but only in
    partitions being rewritten — inconsistent AND undercounted."""
    df = spark.createDataFrame(
        [("a", "p1", 5.0), ("b", "p1", None), ("c", "p2", None),
         ("d", "p2", 1.0), ("e", "p3", None)],
        "k string, p string, v double")
    t = ManifestTable.create(df, str(tmp_path / "nullsdel"), ts="p")
    out = t.delete_where(spark, F.col("v") > 2.0)
    # only the TRUE row goes; both NULL-v rows in rewritten p1 and
    # untouched p2/p3 survive, and the count matches what was removed
    assert out["rows_deleted"] == 1
    kept = {r.k for r in t.read(spark).collect()}
    assert kept == {"b", "c", "d", "e"}


def test_delete_where_no_match_is_noop(spark, table):
    v = table.version()
    out = table.delete_where(spark, F.col("close") > 1000.0,
                             where={"close": (1000.0, None)})
    assert out["rows_deleted"] == 0
    assert table.version() == v                        # no commit


@BOTH_BACKENDS
def test_delete_where_crash_preserves_old_snapshot(spark, table):
    before = _snap(table.read(spark))
    with pytest.raises(CrashInjected):
        table.delete_where(spark, F.col("close") >= 11.0,
                           _crash_before_commit=True)
    assert table.version() == 1
    assert _snap(table.read(spark)) == before


def test_in_list_predicates_prune_and_skip(spark, table, tmp_path):
    """IN-list specs (the dashboard ``ticker IN (...)`` / key-lookup
    shape): partition pruning keeps exactly the named values
    (numeric-aware equality — '07' matches 7), zone maps skip files no
    listed value can hit, and the pruned read + residual filter equals
    the full-scan answer."""
    # partition IN-list on the date-partitioned fixture
    plan = table.scan_plan({"trade_date": ["2024-01-02", "2024-01-04"]})
    assert plan["partitions_pruned"] == 1         # 01-03 excluded
    assert plan["shards_opened"] == 2
    got = (table.read(spark,
                      where={"trade_date": ["2024-01-02", "2024-01-04"]})
           .where(F.col("trade_date").isin("2024-01-02", "2024-01-04")))
    want = table.read(spark).where(
        F.col("trade_date").isin("2024-01-02", "2024-01-04"))
    assert _snap(got) == _snap(want)
    # zone-map IN skipping on a NON-partition column: no file's
    # [min, max] contains 5.0 or 50.0 -> everything skipped unopened
    plan = table.scan_plan({"close": [5.0, 50.0]})
    assert plan["files"] == [] and plan["shards_opened"] == 0
    # a listed value inside one file's range keeps only that file
    plan = table.scan_plan({"close": [10.0]})
    assert len(plan["files"]) == 1
    # numeric-aware partition equality: int-keyed partitions match
    # numerically ('7' == 7), and a non-numeric probe never matches
    df = spark.createDataFrame([(7, 1.0), (99, 2.0)], "b int, v double")
    t = ManifestTable.create(df, str(tmp_path / "inq"), ts="b")
    plan = t.scan_plan({"b": [7]})
    assert plan["partitions_pruned"] == 1
    assert t.scan_plan({"b": ["abc"]})["partitions_pruned"] == 2


def test_zorder_compaction_skips_on_both_dimensions(spark, tmp_path):
    """OPTIMIZE ZORDER proper: after compact(zorder_by=[x, y]) the
    files tile BOTH dimensions, so a selective predicate on EITHER
    column skips most files — where a lexicographic cluster_by=[x]
    sort only ever tightens x.  Row-preserving, and the helper
    z-column must not leak into files or schema."""
    df = (spark.range(4096)
          .selectExpr("CAST(id % 64 AS DOUBLE) AS x",
                      "CAST(CAST(id / 64 AS INT) AS DOUBLE) AS y",
                      "'g' AS g"))
    t = ManifestTable.create(df, str(tmp_path / "zt"), ts="g")
    before = _snap(t.read(spark))

    t.compact(spark, cluster_by=["x"], max_records_per_file=256)
    lex_x = t.scan_plan({"x": (0.0, 7.0)})
    lex_y = t.scan_plan({"y": (0.0, 7.0)})
    nfiles = len(t.scan_plan()["files"])
    assert nfiles >= 8
    assert lex_x["skipped"] >= nfiles // 2       # leading col: tight
    assert lex_y["skipped"] == 0                 # trailing dim: blind

    t.compact(spark, zorder_by=["x", "y"], max_records_per_file=256)
    nfiles = len(t.scan_plan()["files"])
    z_x = t.scan_plan({"x": (0.0, 7.0)})
    z_y = t.scan_plan({"y": (0.0, 7.0)})
    assert z_x["skipped"] >= nfiles // 2         # BOTH dims skip
    assert z_y["skipped"] >= nfiles // 2
    assert _snap(t.read(spark)) == before        # row-preserving
    assert t.read(spark).columns == ["x", "y", "g"]   # no __z leak
    for es in t.manifest()["partitions"].values():
        for e in es:
            assert "__z" not in e["stats"]


def test_change_feed_appends_are_exact_and_ref_skipped(spark, table):
    """added_files/read_incremental: appended batches come back
    row-exactly; partitions untouched since the base version never
    open a shard (ref-equality short-circuit); a merged partition
    surfaces at file granularity (its full rewritten file set)."""
    v1 = table.version()
    table.append_batch(_mkdf(spark, [("NN", "2024-01-05", 5.0)]),
                       "s", 0)
    table.append_batch(_mkdf(spark, [("PP", "2024-01-06", 6.0)]),
                       "s", 1)
    inc = table.read_incremental(spark, v1)
    assert sorted((r.ticker, str(r.trade_date)) for r in inc.collect()) \
        == [("NN", "2024-01-05"), ("PP", "2024-01-06")]
    # no change -> typed empty frame
    empty = table.read_incremental(spark, table.version())
    assert empty.count() == 0
    assert empty.columns == ["ticker", "trade_date", "close"]
    # a merge rewrites one partition: the change feed carries that
    # partition's full rewritten file set (file granularity)
    v3 = table.version()
    table.merge(spark, _mkdf(spark, [("AAA", "2024-01-03", 99.0)]),
                KEYS)
    rows = {(r.ticker, r.close) for r in
            table.read_incremental(spark, v3).collect()}
    assert rows == {("AAA", 99.0), ("BBB", 21.0)}   # whole 01-03 part
    # appended-only history since v1 includes both batches + rewrite
    assert len(table.added_files(v1)) == 3


@BOTH_BACKENDS
def test_true_race_concurrent_stream_writers(spark, table):
    """Not an injected conflict — a REAL race: two threads each push 4
    batches through append_batch against the same table concurrently.
    Optimistic concurrency must absorb every collision (retry loop),
    no batch may be lost or doubled, and both ledgers must land at
    their high-water marks."""
    import threading

    rows = {
        "sA": [[("A%d" % i, "2024-01-0%d" % (i % 3 + 2), float(i))]
               for i in range(4)],
        "sB": [[("B%d" % i, "2024-01-0%d" % (i % 3 + 2), float(i))]
               for i in range(4)],
    }
    errors: list = []

    def writer(stream_id: str) -> None:
        try:
            t = _sibling(table)
            for bid, batch in enumerate(rows[stream_id]):
                assert t.append_batch(_mkdf(spark, batch),
                                      stream_id, bid) is True
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(s,))
               for s in rows]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errors == []
    got = {r.ticker for r in table.read(spark).collect()}
    assert {f"A{i}" for i in range(4)} <= got
    assert {f"B{i}" for i in range(4)} <= got
    assert table._raw()["streams"] == {"sA": 3, "sB": 3}
    assert table.version() == 9          # 1 base + 8 batch commits


def test_unpartitioned_table_single_pseudo_partition(spark, tmp_path):
    """ts=None: small dims / key-only marts live in one pseudo-
    partition; merge/append/delete/stat_bounds keep their contracts
    and zone-map skipping still works on the per-file stats."""
    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0)], "k string, v double")
    t = ManifestTable.create(df, str(tmp_path / "dim"), ts=None)
    assert list(t._raw()["partitions"]) == ["__all"]
    t.merge(spark, spark.createDataFrame([("b", 20.0), ("c", 3.0)],
                                         "k string, v double"), ["k"])
    got = {r.k: r.v for r in t.read(spark).collect()}
    assert got == {"a": 1.0, "b": 20.0, "c": 3.0}
    assert t.stat_bounds("v") == (1.0, 20.0)
    # zone maps: a disjoint predicate skips the file without opening it
    plan = t.scan_plan({"v": (100.0, None)})
    assert plan["files"] == [] and plan["shards_opened"] == 0
    out = t.delete_where(spark, F.col("v") >= 3.0,
                         where={"v": (3.0, None)})
    assert out["rows_deleted"] == 2
    assert {r.k for r in t.read(spark).collect()} == {"a"}
    t.append(spark.createDataFrame([("d", 9.0)], "k string, v double"))
    assert {r.k for r in t.read(spark).collect()} == {"a", "d"}


def test_overwrite_is_atomic_full_refresh(spark, table):
    """overwrite(): the dbt table materialization — one commit swaps
    the ENTIRE build (old partitions drop by omission), the schema
    re-pins from the new frame, the stream ledger carries forward,
    and the old build stays time-travelable."""
    table.append_batch(_mkdf(spark, [("EEE", "2024-01-02", 50.0)]),
                       "s", 7)
    pre = f"manifest-{table.version():08d}.json"
    rebuilt = spark.createDataFrame(
        [("XX", "2024-02-01", 1.0, "new")],
        "ticker string, trade_date string, close double, note string"
    ).withColumn("trade_date", F.col("trade_date").cast("date"))
    table.overwrite(rebuilt)
    got = [(r.ticker, str(r.trade_date), r.close, r.note)
           for r in table.read(spark).collect()]
    assert got == [("XX", "2024-02-01", 1.0, "new")]
    assert table._raw()["streams"] == {"s": 7}      # ledger survives
    assert table.append_batch(rebuilt, "s", 7) is False
    assert len(_snap(table.read(spark, pre))) == 7  # time travel


def test_restore_rolls_back_metadata_only(spark, table):
    """RESTORE: after a merge and a delete, restoring to v1 brings
    back the original rows without moving a byte (all refs carried),
    history keeps every version (the restore is itself a commit and
    can be rolled back), and the stream ledger travels with the
    restored snapshot."""
    base_rows = _snap(table.read(spark))
    table.append_batch(_mkdf(spark, [("EEE", "2024-01-02", 50.0)]),
                       "s", 0)
    table.merge(spark, _mkdf(spark, UPDATES), KEYS)
    table.delete_where(spark, F.col("close") >= 20.0,
                       where={"close": (20.0, None)})
    assert _snap(table.read(spark)) != base_rows
    table.restore(1)
    assert table.version() == 5               # restore is a new commit
    assert _snap(table.read(spark)) == base_rows
    # ledger travels with the snapshot: v1 predates batch 0, so the
    # batch is re-admittable (its data no longer exists)
    assert table._raw()["streams"] == {}
    assert table.append_batch(_mkdf(spark, [("EEE", "2024-01-02", 50.0)]),
                              "s", 0) is True
    # the restore itself can be rolled back (to the post-delete v4)
    table.restore(4)
    got = {r.close for r in table.read(spark).collect()}
    assert got and all(c < 20.0 for c in got)  # the delete state is back
    # a vacuumed-away version cannot be restored: clear failure, no
    # dangling refs
    table.vacuum(retention_seconds=0)
    with pytest.raises(FileNotFoundError):
        table.restore(2)
    # live snapshot unaffected by the failed restore
    assert all(c < 20.0 for c in
               {r.close for r in table.read(spark).collect()})


def test_add_columns_metadata_only_evolution(spark, table):
    """ALTER TABLE ADD COLUMNS semantics: one metadata commit, zero
    files touched; pre-evolution files read back with NULL in the new
    column; post-evolution writes must carry it; merges spanning old
    and new files reconcile through the pinned schema."""
    refs_before = {v: r["shard"]
                   for v, r in table._raw()["partitions"].items()}
    v = table.version()
    table.add_columns([("venue", "string")])
    assert table.version() == v + 1
    # metadata-only: every shard carried by ref
    assert {v2: r["shard"]
            for v2, r in table._raw()["partitions"].items()} == refs_before
    df = table.read(spark)
    assert df.columns == ["ticker", "trade_date", "close", "venue"]
    assert df.where(F.col("venue").isNotNull()).count() == 0
    # old-shape writes are now schema drift
    from stock_market_data_pipeline_spark.manifest import SchemaMismatch
    with pytest.raises(SchemaMismatch):
        table.append(_mkdf(spark, [("NEW", "2024-01-05", 1.0)]))
    # evolved-shape append lands; merge upserts ACROSS old/new files
    evolved = _mkdf(spark, [("NEW", "2024-01-05", 1.0)]) \
        .withColumn("venue", F.lit("XNYS"))
    table.append(evolved)
    table.merge(spark,
                _mkdf(spark, [("AAA", "2024-01-03", 77.0)])
                .withColumn("venue", F.lit("XNAS")), KEYS)
    got = {(r.ticker, str(r.trade_date)): (r.close, r.venue)
           for r in table.read(spark).collect()}
    assert got[("NEW", "2024-01-05")] == (1.0, "XNYS")
    assert got[("AAA", "2024-01-03")] == (77.0, "XNAS")
    assert got[("BBB", "2024-01-03")] == (21.0, None)  # old row, rewritten
    assert got[("AAA", "2024-01-02")] == (10.0, None)  # old file, untouched
    # duplicate add refused
    with pytest.raises(SchemaMismatch):
        table.add_columns([("venue", "string")])
    # time travel BEFORE the evolution shows the old shape
    pre = table.read(spark, f"manifest-{v:08d}.json")
    assert pre.columns == ["ticker", "trade_date", "close"]


# -- round 8: sharded metadata (format 3) ---------------------------


def test_commit_rewrites_only_touched_shards(spark, table):
    """The commit object carries one small REF per partition; a merge
    must write shards ONLY for partitions it changed and carry every
    other partition's shard by reference — the O(changed) metadata
    write that makes commits scale past the single-JSON ceiling."""
    before = {v: r["shard"]
              for v, r in table._raw()["partitions"].items()}
    table.merge(spark, _mkdf(spark, UPDATES), KEYS)
    after = {v: r["shard"]
             for v, r in table._raw()["partitions"].items()}
    assert after["2024-01-02"] == before["2024-01-02"]   # ref carried
    for v in ("2024-01-03", "2024-01-04", "2024-01-05"):
        assert after.get(v) != before.get(v)
    # commit object holds refs only — never inline file entries
    raw = table._raw()
    for r in raw["partitions"].values():
        assert isinstance(r, dict)
        assert {"shard", "files", "rows", "bytes", "stats"} <= set(r)


def test_sharded_scan_opens_only_matching_shards(
        spark, tmp_path, monkeypatch):
    """VERDICT r7 #4's done-criterion: ~10^3 partitions; a selective
    scan must open ONLY the shards its predicate cannot exclude —
    proven by spying shard loads, not just by the reported counter."""
    from stock_market_data_pipeline_spark import manifest as M

    df = spark.range(1000).select(
        F.col("id").cast("int").alias("bucket"),
        (F.col("id") * 2.0).alias("v"))
    t = ManifestTable.create(df, str(tmp_path / "big"), ts="bucket")
    assert len(t._raw()["partitions"]) == 1000

    calls: list[str] = []
    orig = M.ManifestTable._entries

    def spy(self, mf, value):
        calls.append(value)
        return orig(self, mf, value)

    monkeypatch.setattr(M.ManifestTable, "_entries", spy)
    # partition-value pruning: 5 of 1000 partitions survive
    plan = t.scan_plan({"bucket": (100, 104)})
    assert plan["partitions_pruned"] == 995
    assert plan["shards_opened"] == 5
    assert sorted(calls) == ["100", "101", "102", "103", "104"]
    assert len(plan["files"]) == 5
    # partition-level zone maps exclude shards on a NON-partition
    # column too, still without opening them (v = 2*bucket)
    calls.clear()
    plan = t.scan_plan({"v": (0.0, 10.0)})
    assert plan["shards_opened"] == len(calls) == 6     # buckets 0..5
    assert plan["partitions_pruned"] == 0               # stats, not pt
    assert plan["skipped"] == 994
    # the pruned read still answers exactly
    got = sorted(r.bucket for r in
                 t.read(spark, where={"v": (0.0, 10.0)})
                 .where(F.col("v") <= 10.0).collect())
    assert got == [0, 1, 2, 3, 4, 5]


def test_stream_ledger_commit_is_o_changed_metadata(spark, table):
    """append_batch on a many-partition table must not rewrite
    unchanged partitions' shards: the exactly-once ledger rides the
    same O(changed) commit object."""
    before = {v: r["shard"]
              for v, r in table._raw()["partitions"].items()}
    b = _mkdf(spark, [("EEE", "2024-01-04", 50.0)])
    assert table.append_batch(b, "s1", 0) is True
    after = table._raw()["partitions"]
    assert after["2024-01-02"]["shard"] == before["2024-01-02"]
    assert after["2024-01-03"]["shard"] == before["2024-01-03"]
    assert after["2024-01-04"]["shard"] != before["2024-01-04"]
    assert after["2024-01-04"]["files"] == 2            # old + appended


def test_one_sided_numeric_bound_never_prunes(spark, tmp_path):
    """A numeric bound against a NON-numeric partition value (month
    strings vs an int year) is incomparable: the partition must be
    KEPT, not compared lexicographically ('2024-01' vs '2024' would
    wrong-prune — silent missing rows, r7 ADVICE item 1)."""
    df = spark.createDataFrame(
        [("2024-0%d" % m, float(m)) for m in (1, 2, 3)],
        "month string, v double")
    t = ManifestTable.create(df, str(tmp_path / "mt"), ts="month")
    plan = t.scan_plan({"month": (2024, 2024)})
    assert plan["partitions_pruned"] == 0
    assert len(plan["files"]) == 3
    # string bounds on the same table still prune exactly
    plan = t.scan_plan({"month": ("2024-02", "2024-02")})
    assert plan["partitions_pruned"] == 2


def test_bigint_partition_values_prune_exactly(spark, tmp_path):
    """Partition values above 2^53 must compare as ints during pruning
    — a float round-trip would conflate adjacent ids and wrong-prune
    (r7 ADVICE item 1, second half)."""
    big = 9007199254740993                       # 2**53 + 1
    df = spark.createDataFrame(
        [(big, 1.0), (big - 2, 2.0)], "id long, v double")
    t = ManifestTable.create(df, str(tmp_path / "bp"), ts="id")
    plan = t.scan_plan({"id": (big, big)})
    assert plan["partitions_pruned"] == 1        # big-2 out, big kept
    assert len(plan["files"]) == 1


def test_timestamp_stats_normalize_to_iso_t_form(tmp_path):
    """Footer datetime stats and caller bounds both normalize to the
    ISO-8601 'T' form; a space-separated caller string canonicalizes
    the same way, so ' ' < 'T' lexicography can never wrong-skip a
    file (r7 ADVICE item 2)."""
    import datetime as dt

    from stock_market_data_pipeline_spark.manifest import (
        _norm,
        _ranges_disjoint,
    )

    d = dt.datetime(2024, 1, 2, 23, 59, 59)
    assert _norm(d) == "2024-01-02T23:59:59"
    assert _norm("2024-01-02 23:59:59") == "2024-01-02T23:59:59"
    stat = [_norm(dt.datetime(2024, 1, 2, 0, 0)), _norm(d)]
    # the r7 failure mode: lo='2024-01-02T00:00:00' vs str(datetime)
    # stats skipped this file; both forms must now keep it
    assert not _ranges_disjoint(stat, "2024-01-02T12:00:00", None)
    assert not _ranges_disjoint(stat, "2024-01-02 12:00:00", None)
    assert _ranges_disjoint(stat, "2024-01-03T00:00:00", None)


def test_string_canonicalization_is_anchored_and_stats_drop(
        spark, tmp_path):
    """r8 ADVICE item 3: the space→'T' rewrite applies ONLY to strings
    that fully match the timestamp shape — the loose prefix match
    rewrote '2024-01-02 5' → '2024-01-02T5', which is not order-
    preserving against unrewritten strings (' ' < 'T' spans other
    printable chars), wrong-skipping files.  And a string COLUMN whose
    raw footer bounds canonicalization would rewrite carries no zone
    map at all: plain strings that merely look timestampy can never
    mis-sort a skip decision."""
    from stock_market_data_pipeline_spark.manifest import _norm

    assert _norm("2024-01-02 5") == "2024-01-02 5"          # anchored
    assert _norm("2024-01-02 05:00:00") == "2024-01-02T05:00:00"
    # a string column holding space-form timestamps: no zone map
    df = spark.createDataFrame(
        [("2024-01-02 05:00:00", "g"), ("2024-01-02 09:00:00", "g")],
        "s string, g string")
    t = ManifestTable.create(df, str(tmp_path / "strstats"), ts="g")
    assert t.stat_bounds("s") is None
    # the r8 failure shape: a bound between ' ' and 'T' forms must not
    # skip the file now that the column carries no (rewritten) stats
    plan = t.scan_plan({"s": (None, "2024-01-02A")})
    assert len(plan["files"]) == 1                          # kept


def test_unsupported_manifest_format_rejected(spark, tmp_path, table):
    """A manifest whose format version this reader does not speak must
    raise a clear error up front — not a deep TypeError mid-iteration,
    and never a vacuum that computes an empty live set (r7 ADVICE
    item 3)."""
    import json

    mdir = os.path.join(table.root, "_manifests")
    name = sorted(m for m in os.listdir(mdir)
                  if m.startswith("manifest-"))[-1]
    path = os.path.join(mdir, name)
    body = json.load(open(path))
    body["format"] = 1
    body["partitions"] = {v: "some/dir/string"
                          for v in body["partitions"]}
    os.remove(path)
    json.dump(body, open(path, "w"))
    with pytest.raises(RuntimeError, match="format 1"):
        table.manifest()
    with pytest.raises(RuntimeError, match="format"):
        table.vacuum()
    with pytest.raises(RuntimeError, match="format"):
        table.scan_plan()


def test_bigint_stats_do_not_round(spark, tmp_path):
    """int64 stats above 2^53 must stay exact in the manifest — a
    float-rounded bound can wrong-skip a file whose true max matches
    the predicate."""
    big = 9007199254740993                      # 2**53 + 1
    df = spark.createDataFrame(
        [("a", big), ("a", 5)], "g string, id long")
    t = ManifestTable.create(df, str(tmp_path / "bt"), ts="g")
    lo, hi = t.stat_bounds("id")
    assert hi == big and isinstance(hi, int)
    plan = t.scan_plan({"id": (big, None)})
    assert len(plan["files"]) == 1               # kept, not skipped


def test_zorder_rejects_underivable_columns(spark, tmp_path):
    """A zorder column with no automatic rank derivation (here an
    array) must fail loudly — a silent NULL cast would rank every row
    0 and quietly produce an unclustered 'success'.  (Strings, dates
    and timestamps now DERIVE their rank — see the mixed-key test —
    so only genuinely rankless types reject.)"""
    df = spark.createDataFrame([("a", [1.0]), ("b", [2.0])],
                               "k string, v array<double>")
    t = ManifestTable.create(df, str(tmp_path / "zarr"), ts=None)
    with pytest.raises(ValueError, match="no automatic rank"):
        t.compact(spark, zorder_by=["v"], max_records_per_file=1)


def test_zorder_mixed_date_string_keys(spark, tmp_path):
    """VERDICT r8 #5: the reference's cluster key is (trade_date,
    ticker) — a DATE and a STRING (fct_trading_momentum.sql:5).
    compact(zorder_by=[date, string]) must (a) succeed via automatic
    rank derivation (unix_date / xxhash64 — no hand-derived numeric
    key), (b) stay row-preserving, and (c) make EQUALITY probes on
    the hashed string dimension and RANGE probes on the date
    dimension both skip files."""
    tickers = [f"T{i:02d}" for i in range(16)]
    df = (spark.range(4096).selectExpr(
        "date_add(DATE'2024-01-01', CAST(id % 64 AS INT)) AS trade_date",
        "CAST(id / 64 AS INT) AS tn", "'g' AS g")
        .selectExpr("trade_date",
                    "concat('T', lpad(CAST(tn % 16 AS STRING), 2, '0'))"
                    " AS ticker", "g"))
    t = ManifestTable.create(df, str(tmp_path / "zmix"), ts="g")
    before = _snap(t.read(spark))
    t.compact(spark, zorder_by=["trade_date", "ticker"],
              max_records_per_file=256)
    assert _snap(t.read(spark)) == before
    nfiles = len(t.scan_plan()["files"])
    assert nfiles >= 8
    # date dimension: range probe skips (ranks are order-preserving)
    d = t.scan_plan({"trade_date": ("2024-01-01", "2024-01-08")})
    assert d["skipped"] >= nfiles // 2
    # string dimension: equality (IN-list) probe skips — hash ranks
    # tile equal values together even though RANGES are scattered
    s = t.scan_plan({"ticker": [tickers[0]]})
    assert s["skipped"] > 0


def test_zvalue_bit_budget_never_reaches_sign_bit(spark, tmp_path):
    """r8 ADVICE item 5: with 4 z-order columns and the old fixed
    bits=16 the top source bit landed AT bit 63 (the sign bit),
    flipping half the z-values negative and inverting the Morton
    order.  The bit budget must cap at 63 // n_cols: all four
    dimensions still tile (every column's probe skips), which fails
    under sign-bit inversion because the highest-order dimension
    bit sorts backwards."""
    from stock_market_data_pipeline_spark.manifest import _zvalue_col

    df = (spark.range(4096).selectExpr(
        "CAST(id % 8 AS DOUBLE) AS a",
        "CAST(CAST(id / 8 AS INT) % 8 AS DOUBLE) AS b",
        "CAST(CAST(id / 64 AS INT) % 8 AS DOUBLE) AS c",
        "CAST(CAST(id / 512 AS INT) % 8 AS DOUBLE) AS d",
        "'g' AS g"))
    bounds = {k: (0.0, 7.0) for k in "abcd"}
    z = df.select(_zvalue_col(list("abcd"), bounds).alias("z"))
    mn, mx = z.agg(F.min("z"), F.max("z")).first()
    assert mn >= 0, "interleaved z-value leaked into the sign bit"
    assert mx < (1 << 63)
    t = ManifestTable.create(df, str(tmp_path / "z4"), ts="g")
    t.compact(spark, zorder_by=list("abcd"), max_records_per_file=128)
    nfiles = len(t.scan_plan()["files"])
    for colname in "abcd":
        plan = t.scan_plan({colname: (0.0, 1.0)})
        assert plan["skipped"] >= nfiles // 4, colname


def test_coordinator_backend_stale_claim_takeover(spark, tmp_path):
    """CoordinatorClaimBackend: a writer that died BETWEEN claim and
    body upload (the window the split protocol introduces) must not
    block the version forever — a later writer takes over a claim
    older than the grace whose manifest never appeared; a YOUNG claim
    is respected (CommitConflict, the in-flight writer may still
    publish)."""
    from stock_market_data_pipeline_spark.manifest import (
        CommitConflict,
        CoordinatorClaimBackend,
    )

    t = ManifestTable.create(_mkdf(spark, BASE),
                             str(tmp_path / "coord"), ts="trade_date",
                             backend=CoordinatorClaimBackend(
                                 claim_grace=3600.0))
    # simulate a claimer that died before uploading the body
    claim = os.path.join(t._mdir(), ".claim-manifest-00000002.json")
    os.close(os.open(claim, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
    with pytest.raises(CommitConflict, match="in-flight"):
        t.merge(spark, _mkdf(spark, UPDATES), KEYS)
    assert t.version() == 1                       # young claim respected
    # age the claim out: takeover succeeds, merge commits
    old = __import__("time").time() - 7200
    os.utime(claim, (old, old))
    t.merge(spark, _mkdf(spark, UPDATES), KEYS)
    assert t.version() == 2
    expect = {(tk, d): c for (tk, d, c) in BASE}
    expect.update({(tk, d): c for (tk, d, c) in UPDATES})
    got = {(r.ticker, str(r.trade_date)): r.close
           for r in t.read(spark).collect()}
    assert got == expect
    # vacuum clears the consumed claim marker
    t.vacuum(retention_seconds=0)
    assert not any(m.startswith(".claim-")
                   for m in os.listdir(t._mdir()))


def test_mixed_backend_writers_still_serialize(spark, tmp_path):
    """Backends INTEROPERATE on one table: a posix-linked maintenance
    job racing a coordinator-backed writer from the same base version
    still produces exactly one winner per version — every backend's
    publish is gated on the final name's absence."""
    from stock_market_data_pipeline_spark.manifest import (
        CommitConflict,
        CoordinatorClaimBackend,
        PosixLinkBackend,
    )

    root = str(tmp_path / "mixed")
    a = ManifestTable.create(_mkdf(spark, BASE), root, ts="trade_date",
                             backend=CoordinatorClaimBackend())
    b = ManifestTable(root, "trade_date", backend=PosixLinkBackend())

    def competing():
        b.merge(spark, _mkdf(spark, [("BBB", "2024-01-03", 77.0)]),
                KEYS)

    with pytest.raises(CommitConflict):
        a.merge(spark, _mkdf(spark, UPDATES), KEYS,
                _pre_commit_hook=competing)
    # b won version 2; a's staged attempt is fully invisible
    got = {(r.ticker, str(r.trade_date)): r.close
           for r in a.read(spark).collect()}
    assert got[("BBB", "2024-01-03")] == 77.0
    a.merge(spark, _mkdf(spark, UPDATES), KEYS)   # retry lands
    assert a.version() == 3


def test_merge_cdf_rows_classified_and_atomic(spark, table):
    """VERDICT r8 #6: merge(cdf=True) captures the row-level change
    feed (insert / update_preimage / update_postimage) in the SAME
    commit as the data; changes(version) serves it typed; a commit
    made without cdf raises a clear error instead of returning an
    empty (wrong) change set; vacuum retains the change files with
    the manifest that references them."""
    v1 = table.version()
    table.merge(spark, _mkdf(spark, UPDATES), KEYS, cdf=True)
    v2 = table.version()
    feed = table.changes(spark, v2)
    assert feed.columns == ["ticker", "trade_date", "close",
                            "_change_type"]
    got = {(r.ticker, str(r.trade_date), r.close, r._change_type)
           for r in feed.collect()}
    assert got == {
        ("AAA", "2024-01-03", 11.0, "update_preimage"),
        ("AAA", "2024-01-03", 99.0, "update_postimage"),
        ("CCC", "2024-01-04", 30.0, "insert"),
        ("AAA", "2024-01-05", 13.0, "insert"),
    }
    # the base commit captured no cdf: loud error, not empty frame
    with pytest.raises(FileNotFoundError, match="without cdf"):
        table.changes(spark, v1)
    # a routine vacuum keeps the feed readable (retention window)
    table.vacuum()
    assert feed.count() == 4
    # a cdf-less merge after: its version raises, earlier feed intact
    table.merge(spark, _mkdf(spark, [("DDD", "2024-01-02", 1.0)]),
                KEYS)
    with pytest.raises(FileNotFoundError, match="without cdf"):
        table.changes(spark, table.version())
    assert table.changes(spark, v2).count() == 4


def test_merge_batch_cdf_streaming_change_feed(spark, table):
    """Streaming CDF: a merge_batch(cdf=True) commits the batch's
    row-level change set atomically with the data + ledger; a replay
    is refused WITHOUT republishing a feed; a conflict retry
    re-classifies against the snapshot that actually landed."""
    b0 = _mkdf(spark, [("AAA", "2024-01-03", 55.0),
                       ("NEW", "2024-01-03", 7.0)])
    assert table.merge_batch(spark, b0, KEYS, "s", 0, cdf=True) is True
    v = table.version()
    feed = {(r.ticker, r.close, r._change_type)
            for r in table.changes(spark, v).collect()}
    assert feed == {("AAA", 11.0, "update_preimage"),
                    ("AAA", 55.0, "update_postimage"),
                    ("NEW", 7.0, "insert")}
    # replay: no new version, the committed feed unchanged
    assert table.merge_batch(spark, b0, KEYS, "s", 0, cdf=True) is False
    assert table.version() == v
    assert table.changes(spark, v).count() == 3


def test_ivm_apply_cdf_delta_semantics(spark, table):
    """IVM fold semantics over the CDF (operators/ivm.py): updates
    replace preimage contributions, inserts create groups, and a
    group whose row count reaches zero DROPS from the view — compared
    against a from-scratch rebuild after each merge."""
    from stock_market_data_pipeline_spark.operators.ivm import (
        apply_cdf_delta,
        sum_count_view,
    )

    keys, sums = ["ticker"], ["close"]
    view = sum_count_view(table.read(spark), keys, sums)
    table.merge(spark, _mkdf(spark, UPDATES), KEYS, cdf=True)
    v1 = apply_cdf_delta(view, table.changes(spark, table.version()),
                         keys, sums)
    rebuild = sum_count_view(table.read(spark), keys, sums)
    assert _snap(v1) == _snap(rebuild)
    # second fold on top of the first: still equals the rebuild
    table.merge(spark, _mkdf(spark, [("CCC", "2024-01-04", 31.0)]),
                KEYS, cdf=True)
    v2 = apply_cdf_delta(v1, table.changes(spark, table.version()),
                         keys, sums)
    assert _snap(v2) == _snap(sum_count_view(table.read(spark),
                                             keys, sums))


def test_count_where_metadata_answers_and_null_safety(spark, tmp_path):
    """count_where: interior partitions/files answer from manifest row
    counts (no read), boundary files are read exactly — and a file
    whose column carries NULLs is NEVER metadata-counted (min/max
    ignore NULLs; claiming containment would overcount), it is read
    and filtered instead."""
    df = spark.createDataFrame(
        [(d, "2024-%02d" % m, float(d))
         for m in (1, 2, 3) for d in range(1, 11)],
        "d int, mon string, v double")
    t = ManifestTable.create(df.withColumn(
        "key", F.concat(F.col("mon"), F.lit("-"), F.col("d"))),
        str(tmp_path / "cnt"), ts="mon")
    # range fully covering month 2, half of months 1 and 3 by d
    out = t.count_where(spark, "d", 1, 10)      # everything
    assert out["count"] == 30
    assert out["rows_from_metadata"] == 30      # all metadata
    assert out["files_read"] == 0
    out = t.count_where(spark, "d", 3, 7)
    assert out["count"] == 15                   # 5 per month
    # NULL conservatism: a partition whose column holds NULLs must be
    # READ (its rows with NULL d do not match), never metadata-counted
    extra = spark.createDataFrame(
        [(None, "2024-04", 1.0, "x"), (5, "2024-04", 2.0, "y")],
        "d int, mon string, v double, key string")
    t.append(extra)
    out = t.count_where(spark, "d", 1, 10)
    assert out["count"] == 31                   # NULL row not counted
    assert out["files_read"] >= 1               # the NULL file was read


def test_append_retries_through_conflict(spark, table, monkeypatch):
    """Blind appends commute with any concurrent commit: a competing
    writer landing between this append's read snapshot and its commit
    must trigger a REBASE onto the new snapshot (same staged files),
    not surface CommitConflict to the ingest caller — both writes
    land, nothing lost."""
    from stock_market_data_pipeline_spark import manifest as M

    competing = _mkdf(spark, [("XXX", "2024-01-05", 1.0)])
    fired = {"done": False}
    orig = M.ManifestTable._commit

    def racy_commit(self, partitions, base_version, streams=None,
                    schema=None, cdf=None, cdf_kind="classified",
                    **kw):
        if not fired["done"]:
            fired["done"] = True
            _sibling(table).merge(spark, competing, KEYS)
        return orig(self, partitions, base_version, streams=streams,
                    schema=schema, cdf=cdf, cdf_kind=cdf_kind, **kw)

    monkeypatch.setattr(M.ManifestTable, "_commit", racy_commit)
    table.append(_mkdf(spark, [("YYY", "2024-01-06", 2.0)]))
    tickers = {r.ticker for r in table.read(spark).collect()}
    assert {"XXX", "YYY"} <= tickers             # both writes live
    assert table.version() == 3                  # base + 2 commits


def test_compact_rebases_over_disjoint_writer(spark, table,
                                              monkeypatch):
    """OPTIMIZE-vs-writer conflict matrix, disjoint case: a competing
    append to a DIFFERENT partition lands mid-compaction — the
    compaction must rebase (carry the competitor's partition, keep its
    staged rewrites) and commit; nothing lost on either side."""
    from stock_market_data_pipeline_spark import manifest as M

    # make 2024-01-02 multi-file so compact() targets only it
    table.append(_mkdf(spark, [("CCC", "2024-01-02", 30.0)]))
    competing = _mkdf(spark, [("NEW", "2024-01-06", 9.0)])
    fired = {"done": False}
    orig = M.ManifestTable._commit

    def racy_commit(self, partitions, base_version, streams=None,
                    schema=None, cdf=None, cdf_kind="classified",
                    **kw):
        if not fired["done"]:
            fired["done"] = True
            _sibling(table).append(competing)    # disjoint partition
        return orig(self, partitions, base_version, streams=streams,
                    schema=schema, cdf=cdf, cdf_kind=cdf_kind, **kw)

    monkeypatch.setattr(M.ManifestTable, "_commit", racy_commit)
    out = table.compact(spark)
    monkeypatch.setattr(M.ManifestTable, "_commit", orig)
    assert out["partitions"] == 1
    got = {r.ticker for r in table.read(spark).collect()}
    assert {"CCC", "NEW"} <= got                 # both survived
    assert len(table.manifest()["partitions"]["2024-01-02"]) == 1


def test_compact_conflicts_when_writer_touches_same_partition(
        spark, table, monkeypatch):
    """OPTIMIZE-vs-writer conflict matrix, overlap case: a competitor
    REWRITING a partition the compaction also rewrote makes the staged
    compaction stale — it must raise CommitConflict (rebasing would
    silently drop the competitor's merge), and the competitor's write
    must stay fully live."""
    from stock_market_data_pipeline_spark import manifest as M
    from stock_market_data_pipeline_spark.manifest import CommitConflict

    table.append(_mkdf(spark, [("CCC", "2024-01-02", 30.0)]))
    competing = _mkdf(spark, [("AAA", "2024-01-02", 77.0)])
    fired = {"done": False}
    orig = M.ManifestTable._commit

    def racy_commit(self, partitions, base_version, streams=None,
                    schema=None, cdf=None, cdf_kind="classified",
                    **kw):
        if not fired["done"]:
            fired["done"] = True
            _sibling(table).merge(spark, competing, KEYS)
        return orig(self, partitions, base_version, streams=streams,
                    schema=schema, cdf=cdf, cdf_kind=cdf_kind, **kw)

    monkeypatch.setattr(M.ManifestTable, "_commit", racy_commit)
    with pytest.raises(CommitConflict, match="re-run compact"):
        table.compact(spark)
    monkeypatch.setattr(M.ManifestTable, "_commit", orig)
    got = {(r.ticker, str(r.trade_date)): r.close
           for r in table.read(spark).collect()}
    assert got[("AAA", "2024-01-02")] == 77.0    # competitor intact
    # the re-run against the new snapshot succeeds cleanly — and finds
    # nothing left to do, because the competitor's merge already
    # rewrote the multi-file partition into one file
    assert table.compact(spark)["partitions"] == 0
    assert len(table.manifest()["partitions"]["2024-01-02"]) == 1


def test_delete_where_rebases_over_disjoint_writer(spark, table,
                                                   monkeypatch):
    """DELETE joins the conflict matrix: a competing append to an
    untouched partition lands mid-delete — the delete rebases and
    commits; an overlap (competitor rewrote a partition the delete
    read) raises instead of silently resurrecting rows."""
    from stock_market_data_pipeline_spark import manifest as M
    from stock_market_data_pipeline_spark.manifest import CommitConflict

    competing = _mkdf(spark, [("NEW", "2024-01-06", 9.0)])
    fired = {"done": False}
    orig = M.ManifestTable._commit

    def racy_commit(self, partitions, base_version, streams=None,
                    schema=None, cdf=None, cdf_kind="classified",
                    **kw):
        if not fired["done"]:
            fired["done"] = True
            _sibling(table).append(competing)
        return orig(self, partitions, base_version, streams=streams,
                    schema=schema, cdf=cdf, cdf_kind=cdf_kind, **kw)

    monkeypatch.setattr(M.ManifestTable, "_commit", racy_commit)
    out = table.delete_where(spark, F.col("close") >= 20.0,
                             where={"close": (20.0, None)})
    monkeypatch.setattr(M.ManifestTable, "_commit", orig)
    assert out["rows_deleted"] == 3              # BBB x3 gone
    got = {(r.ticker, r.close) for r in table.read(spark).collect()}
    assert ("NEW", 9.0) in got                   # competitor landed
    assert not any(c >= 20.0 for _, c in got if _ != "NEW")

    # overlap: competitor merges INTO a partition the delete reads
    fired["done"] = False
    overlap = _mkdf(spark, [("AAA", "2024-01-03", 1.0)])

    def racy_commit2(self, partitions, base_version, streams=None,
                     schema=None, cdf=None, cdf_kind="classified",
                     **kw):
        if not fired["done"]:
            fired["done"] = True
            _sibling(table).merge(spark, overlap, KEYS)
        return orig(self, partitions, base_version, streams=streams,
                    schema=schema, cdf=cdf, cdf_kind=cdf_kind, **kw)

    monkeypatch.setattr(M.ManifestTable, "_commit", racy_commit2)
    with pytest.raises(CommitConflict, match="re-run delete_where"):
        table.delete_where(spark, F.col("close") >= 10.0,
                           where={"close": (10.0, None)})
    monkeypatch.setattr(M.ManifestTable, "_commit", orig)
    got = {(r.ticker, str(r.trade_date)): r.close
           for r in table.read(spark).collect()}
    assert got[("AAA", "2024-01-03")] == 1.0     # competitor intact


def test_full_crud_cdf_and_ivm(spark, table):
    """The row-level change feed across ALL write paths: an append's
    feed costs zero extra bytes (its entries reference the commit's
    own data files), a delete's feed carries the removed rows
    classified 'delete', and the IVM fold consumes every kind —
    matching a rebuild after merge, append AND delete."""
    from stock_market_data_pipeline_spark.operators.ivm import (
        apply_cdf_delta,
        sum_count_view,
    )

    keys, sums = ["ticker"], ["close"]
    view = sum_count_view(table.read(spark), keys, sums)
    # 1. append with zero-cost feed
    data_files_before = set(table.scan_plan()["files"])
    table.append(_mkdf(spark, [("NEW", "2024-01-06", 5.0)]), cdf=True)
    v_append = table.version()
    feed = table.changes(spark, v_append)
    assert {(r.ticker, r._change_type) for r in feed.collect()} \
        == {("NEW", "insert")}
    # the feed references LIVE data files — nothing extra was written
    mf = table._raw(f"manifest-{v_append:08d}.json")
    live_now = {e["path"].split("/")[-1] for es in
                [table._entries(mf, v) for v in mf["partitions"]]
                for e in es}
    assert all(e["path"].split("/")[-1] in live_now
               for e in mf["cdf"])
    view = apply_cdf_delta(view, feed, keys, sums)
    assert _snap(view) == _snap(sum_count_view(table.read(spark),
                                               keys, sums))
    # 2. merge feed (classified)
    table.merge(spark, _mkdf(spark, UPDATES), KEYS, cdf=True)
    view = apply_cdf_delta(view, table.changes(spark, table.version()),
                           keys, sums)
    assert _snap(view) == _snap(sum_count_view(table.read(spark),
                                               keys, sums))
    # 3. delete feed: removed rows, classified 'delete'
    out = table.delete_where(spark, F.col("close") >= 20.0,
                             where={"close": (20.0, None)}, cdf=True)
    feed = table.changes(spark, table.version())
    assert feed.where(F.col("_change_type") != "delete").count() == 0
    assert feed.count() == out["rows_deleted"] > 0
    view = apply_cdf_delta(view, feed, keys, sums)
    assert _snap(view) == _snap(sum_count_view(table.read(spark),
                                               keys, sums))


def test_decimal_columns_stage_without_zone_maps(spark, tmp_path):
    """Parquet decimal statistics are undecodable driver-side
    (pyarrow raises on access for FIXED_LEN_BYTE_ARRAY decimals):
    staging must still succeed — the column simply carries NO zone
    map (reads more, never skips wrong) while other columns keep
    theirs, and values round-trip exactly."""
    from pyspark.sql import functions as F

    from stock_market_data_pipeline_spark.manifest import (
        ManifestTable,
    )

    df = (spark.range(0, 40)
          .select(F.col("id"),
                  (F.col("id") % 2).cast("string").alias("pt"),
                  (F.col("id") * 7 / 4).cast("decimal(12, 2)")
                  .alias("px")))
    t = ManifestTable.create(df, str(tmp_path / "dec"), ts="pt")
    mf = t._raw()
    for v in mf["partitions"]:
        for e in t._entries(mf, v):
            assert "px" not in e["stats"]      # no unsafe zone map
            assert "id" in e["stats"]          # others keep theirs
            assert "px" in e["nn"]             # null-free is provable
    got = t.read(spark)
    assert dict(got.dtypes)["px"] == "decimal(12,2)"
    import decimal
    assert got.agg(F.sum("px")).collect()[0][0] == sum(
        (decimal.Decimal(i * 7) / 4).quantize(
            decimal.Decimal("0.01"),
            rounding=decimal.ROUND_HALF_UP) for i in range(40))


def test_plan_compact_spares_well_sized_partitions(spark, tmp_path):
    """plan_compact: fragmented partitions and DV'd partitions are
    flagged; a multi-file partition of WELL-SIZED files is spared —
    the write-amplification guard a bare file-count rule lacks."""
    df = spark.range(0, 900).select(
        F.col("id"),
        F.when(F.col("id") < 300, "a")
         .when(F.col("id") < 600, "b").otherwise("c").alias("pt"))
    # a: one 300-row file; b: two 150-row halves (healthy);
    # c: six 50-row slivers (streaming debris)
    t = ManifestTable.create(
        df.where((F.col("pt") == "a")
                 | ((F.col("pt") == "b") & (F.col("id") % 2 == 0))
                 | ((F.col("pt") == "c") & (F.col("id") % 6 == 0))),
        str(tmp_path / "t"), ts="pt")
    t.append(df.where((F.col("pt") == "b") & (F.col("id") % 2 == 1)))
    for k in range(1, 6):
        t.append(df.where((F.col("pt") == "c")
                          & (F.col("id") % 6 == k)))
    plan = t.plan_compact(target_rows=300, small_ratio=0.5)
    assert plan["partitions"] == ["c"]
    assert plan["files_before"] == 6 and plan["est_files_after"] == 1
    # a DV sidecar flags a partition regardless of layout
    t.delete_where(spark, (F.col("pt") == "b") & (F.col("id") < 310),
                   mode="dv")
    plan2 = t.plan_compact(target_rows=300, small_ratio=0.5)
    assert sorted(plan2["partitions"]) == ["b", "c"]
    res = t.compact(spark, partitions=plan2["partitions"],
                    max_records_per_file=300)
    assert res["files_after"] == plan2["est_files_after"]
    assert t.plan_compact(target_rows=300,
                          small_ratio=0.5)["partitions"] == []
    assert t.read(spark).count() == 890


def test_plan_compact_never_sees_all_dead_partitions(
        spark, tmp_path):
    """A fully-DV-dead partition cannot reach plan_compact:
    delete_where drops its ref at delete time, so the plan's
    per-victim projection (>= 1 file) is always achievable."""
    df = spark.range(0, 100).select(
        F.col("id"), F.when(F.col("id") < 50, "x").otherwise("y")
        .alias("pt"))
    t = ManifestTable.create(df, str(tmp_path / "t"), ts="pt")
    t.append(df.where(F.col("pt") == "x"))   # x: 2 files
    t.delete_where(spark, F.col("id") < 50, mode="dv")
    assert "x" not in t._raw()["partitions"]
    plan = t.plan_compact(target_rows=1000)
    assert plan["partitions"] == [] and plan["rows"] == 0
    assert t.read(spark).count() == 50
