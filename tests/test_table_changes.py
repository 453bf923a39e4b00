"""Range change feed — ManifestTable.table_changes plus its SQL
spelling ``table_changes('t', v1[, v2])`` through manifest_sql
(VERDICT r14 "Next round" #2): per-commit classified change sets
unioned with _commit_version stamped, metadata-only commits provably
skipped, non-cdf DATA commits refused loudly."""

import pytest
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.manifest import ManifestTable
from stock_market_data_pipeline_spark.manifest_datasource import (
    manifest_sql,
)


def _frame(spark, lo, hi):
    return (spark.range(lo, hi)
            .select(F.col("id"),
                    (F.col("id") % 3).cast("string").alias("pt"),
                    (F.col("id") * 2.0).alias("v")))


@pytest.fixture()
def t(spark, tmp_path):
    tab = ManifestTable.create(_frame(spark, 0, 30),
                               str(tmp_path / "t"), ts="pt")   # v1
    tab.append(_frame(spark, 30, 40), cdf=True)                # v2
    upd = _frame(spark, 20, 35).withColumn("v", F.col("v") * 10)
    tab.merge(spark, upd, ["id"], cdf=True, mode="dv")         # v3
    tab.analyze(spark, approx=True, columns=["v"])             # v4: meta
    tab.delete_where(spark, F.expr("id < 5"), mode="dv",
                     cdf=True)                                 # v5
    return tab


def test_range_feed_classifies_and_stamps_versions(spark, t):
    feed = t.table_changes(spark, 2, 5)
    counts = {(r["_commit_version"], r["_change_type"]): r["n"]
              for r in feed.groupBy("_commit_version", "_change_type")
              .agg(F.count("*").alias("n")).collect()}
    assert counts == {(2, "insert"): 10,
                      (3, "update_preimage"): 15,
                      (3, "update_postimage"): 15,
                      (5, "delete"): 5}
    # end defaults to the live head
    assert t.table_changes(spark, 2).count() == feed.count()


def test_metadata_only_commit_contributes_zero_rows(spark, t):
    # v4 is the ANALYZE commit: identical partitions map to v3, so
    # the range walk skips it rather than raising
    feed = t.table_changes(spark, 4, 4)
    assert feed.count() == 0
    # and the empty frame still carries the CDF schema
    assert feed.columns[-2:] == ["_change_type", "_commit_version"]


def test_non_cdf_data_commit_raises(spark, t):
    with pytest.raises(FileNotFoundError, match="without cdf=True"):
        t.table_changes(spark, 1, 3).count()


def test_range_validation(spark, t):
    with pytest.raises(ValueError, match="1 <= start <= end"):
        t.table_changes(spark, 0, 2)
    with pytest.raises(ValueError, match="1 <= start <= end"):
        t.table_changes(spark, 4, 2)
    with pytest.raises(ValueError, match="1 <= start <= end"):
        t.table_changes(spark, 2, 99)


def test_schema_evolution_inside_range_null_fills(spark, t):
    t.add_columns([("flag", "string")])                        # v6: meta
    t.append(_frame(spark, 40, 44).withColumn(
        "flag", F.lit("new")), cdf=True)                       # v7
    feed = t.table_changes(spark, 5, 7)
    assert "flag" in feed.columns
    rows = {r["_commit_version"]: r for r in
            feed.groupBy("_commit_version")
            .agg(F.count("*").alias("n"),
                 F.count("flag").alias("filled")).collect()}
    assert rows[5]["filled"] == 0          # pre-evolution: NULL-fill
    assert rows[7]["n"] == rows[7]["filled"] == 4


def test_sql_spelling_matches_dataframe_feed(spark, t):
    sql = manifest_sql(spark,
                       "SELECT * FROM table_changes('tc', 2, 5)",
                       {"tc": t})
    api = t.table_changes(spark, 2, 5).select(*sql.columns)
    assert sql.exceptAll(api).count() == 0
    assert api.exceptAll(sql).count() == 0
    # the two-arg form defaults v2 to the live head, and the
    # relation composes with ordinary SQL (aggregation on top)
    agg = manifest_sql(
        spark,
        "SELECT _change_type, COUNT(*) AS n "
        "FROM table_changes('tc', 2) GROUP BY 1",
        {"tc": t}).collect()
    assert {r["_change_type"]: r["n"] for r in agg} == {
        "insert": 10, "update_preimage": 15,
        "update_postimage": 15, "delete": 5}


def test_sql_unknown_table_passes_through(spark, t):
    # not ours: left verbatim for Spark to resolve (a real Delta
    # table_changes in a mixed session) or error — the same contract
    # as every other unknown name in the rewriters
    from pyspark.sql.utils import AnalysisException

    with pytest.raises(AnalysisException):
        manifest_sql(spark,
                     "SELECT * FROM table_changes('nope', 1)",
                     {"tc": t})


def test_commit_stamps_strictly_monotonic(spark, tmp_path):
    """ADVICE r14 #4, fixed at the mechanism: committed_at is
    ms-rounded, so back-to-back commits can land in one wall-clock
    millisecond — the stamp must still advance, or version_at(stamp)
    repoints every timestamp consumer at the later snapshot."""
    t = ManifestTable.create(_frame(spark, 0, 10),
                             str(tmp_path / "t"), ts=None)
    for _ in range(5):
        t.add_columns([])            # metadata-only: fastest commits
    stamps = [t._raw(t._mname(v)).get("committed_at")
              for v in range(1, t.version() + 1)]
    assert all(b > a for a, b in zip(stamps, stamps[1:])), stamps
    for v in range(1, t.version() + 1):
        assert t.version_at(stamps[v - 1]) == v


def test_drop_refuses_branch_handle(spark, tmp_path):
    import os

    root = str(tmp_path / "t")
    t = ManifestTable.create(_frame(spark, 0, 10), root, ts=None)
    b = t.create_branch("audit")
    with pytest.raises(RuntimeError, match="main table"):
        b.drop()
    assert os.path.exists(root)      # main untouched


@pytest.mark.parametrize("seed", [3, 11, 27])
def test_feed_replay_reconstructs_end_state(spark, tmp_path, seed):
    """The CDF algebra the range feed must satisfy: START state plus
    the replayed change rows (inserts and update_postimages added,
    deletes and update_preimages removed, in commit order) equals the
    END state, as multisets — for a seed-varied mix of appends,
    keyed DV merges and DV deletes.  This is the invariant every
    downstream incremental view stands on; a mis-classified or
    dropped change row breaks it immediately."""
    t = ManifestTable.create(_frame(spark, 0, 40),
                             str(tmp_path / "t"), ts="pt")
    v_start = t.version()
    ops = [("append", 40 + seed), ("merge", seed),
           ("delete", seed % 7 + 2), ("merge", seed * 2 + 5),
           ("append", 90 + seed), ("delete", seed % 5 + 11)]
    for kind, p in ops:
        if kind == "append":
            t.append(_frame(spark, p, p + 10), cdf=True)
        elif kind == "merge":
            upd = _frame(spark, p, p + 15).withColumn(
                "v", F.col("v") * 3 + 1)
            t.merge(spark, upd, ["id"], cdf=True, mode="dv")
        else:
            t.delete_where(spark, F.expr(f"pmod(id, {p}) = 1"),
                           mode="dv", cdf=True)
    start = t.read(spark, manifest_name=t._mname(v_start))
    cols = ["id", "pt", "v"]
    state = [tuple(r) for r in start.select(*cols).collect()]
    from collections import Counter
    bag = Counter(state)
    feed = (t.table_changes(spark, v_start + 1)
            .select(*cols, "_change_type", "_commit_version")
            .collect())
    for r in sorted(feed, key=lambda r: r["_commit_version"]):
        key = (r["id"], r["pt"], r["v"])
        if r["_change_type"] in ("insert", "update_postimage"):
            bag[key] += 1
        else:                       # delete / update_preimage
            bag[key] -= 1
            assert bag[key] >= 0, (key, r["_change_type"])
    live = Counter(tuple(r) for r in
                   t.read(spark).select(*cols).collect())
    assert bag == live


def test_row_preserving_maintenance_skipped_in_range(spark, tmp_path):
    """ADVICE r15 #1: compact/OPTIMIZE (and compact_dvs) rewrite
    files, so their partitions map DIFFERS from the base — the
    metadata-only identity proof can never apply.  They must still
    contribute zero rows to a spanning change feed (Delta skips
    dataChange=false commits); before the ``row_preserving`` stamp,
    one routine OPTIMIZE permanently broke every range over it."""
    t = ManifestTable.create(_frame(spark, 0, 30),
                             str(tmp_path / "t"), ts="pt")       # v1
    t.append(_frame(spark, 30, 40), cdf=True)                    # v2
    t.append(_frame(spark, 40, 50), cdf=True)                    # v3
    stats = t.compact(spark, min_files=2)                        # v4
    assert stats["partitions"] > 0
    t.delete_where(spark, F.expr("id < 5"), mode="dv",
                   cdf=True)                                     # v5
    assert t._raw(t._mname(4)).get("row_preserving") is True
    # the stamp is maintenance-only: data commits must never carry it
    assert "row_preserving" not in t._raw(t._mname(5))
    feed = t.table_changes(spark, 2, 5)
    by_v = {r["_commit_version"]: r["n"] for r in
            feed.groupBy("_commit_version")
            .agg(F.count("*").alias("n")).collect()}
    assert by_v == {2: 10, 3: 10, 5: 5}      # v4 contributes nothing
    # compact_dvs (sidecar consolidation) gets the same stamp
    t.delete_where(spark, F.expr("id >= 45"), mode="dv",
                   cdf=True)                                     # v6
    t.compact_dvs(spark, min_sidecars=2)                         # v7
    assert t._raw(t._mname(7)).get("row_preserving") is True
    assert t.table_changes(spark, 7, 7).count() == 0


def test_stream_cdf_survives_maintenance_commits(spark, tmp_path):
    """The readChangeFeed STREAM walk gets the same skips: a
    mid-stream ANALYZE (metadata-only) or compact (row-preserving)
    must not kill the stream — only a genuine uncaptured DATA commit
    raises."""
    import os

    root = str(tmp_path / "t")
    t = ManifestTable.create(_frame(spark, 0, 30), root, ts="pt")
    t.append(_frame(spark, 30, 40), cdf=True)
    t.analyze(spark, approx=True, columns=["v"])     # metadata-only
    t.compact(spark, min_files=1)                    # row-preserving
    t.append(_frame(spark, 40, 45), cdf=True)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    q = (spark.readStream.format("manifest")
         .option("path", root).option("startingVersion", 1)
         .option("readChangeFeed", "true").load()
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    by_v = {r["_commit_version"]: r["n"] for r in
            got.groupBy("_commit_version")
            .agg(F.count("*").alias("n")).collect()}
    assert by_v == {2: 10, 5: 5}
