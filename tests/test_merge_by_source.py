"""MERGE WHEN NOT MATCHED BY SOURCE (VERDICT r10 #3 — Delta's third
clause family, the reference's full-snapshot SCD-2 hard-delete
invalidation done table-natively): target rows whose key appears in
NO source row are deleted or close-out-updated in the SAME atomic
commit, in both rewrite and low-shuffle (dv) modes, with CDF
classification and partition drops."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.manifest import (
    ManifestTable,
    SchemaMismatch,
)
from tests.test_manifest import BASE, _mkdf, _snap

KEYS = ["ticker", "trade_date"]


@pytest.fixture()
def t(spark, tmp_path):
    return ManifestTable.create(
        _mkdf(spark, BASE), str(tmp_path / "t"), ts="trade_date")


# the "new full snapshot": AAA@01-03 updated, BBB@01-03 vanished,
# DDD@01-03 new; the whole 01-04 partition vanished from the source
SNAPSHOT = [
    ("AAA", "2024-01-02", 10.0), ("BBB", "2024-01-02", 20.0),
    ("AAA", "2024-01-03", 77.0), ("DDD", "2024-01-03", 40.0),
]


@pytest.mark.parametrize("mode", ["rewrite", "dv"])
def test_full_snapshot_sync_delete(spark, t, mode):
    """Upsert + unconditional by-source delete against a full source
    snapshot leaves the target EXACTLY equal to the source — the
    dimension-sync shape; the partition the source no longer covers
    drops from the table entirely."""
    t.merge(spark, _mkdf(spark, SNAPSHOT), KEYS,
            not_matched_by_source_delete=True, mode=mode)
    assert _snap(t.read(spark)) == _snap(_mkdf(spark, SNAPSHOT))
    assert "2024-01-04" not in t._raw()["partitions"]


@pytest.mark.parametrize("mode", ["rewrite", "dv"])
def test_by_source_delete_conditional(spark, t, mode):
    """A Column/SQL condition over the TARGET row gates the delete:
    only vanished rows matching it go; the rest survive untouched."""
    t.merge(spark, _mkdf(spark, SNAPSHOT), KEYS,
            not_matched_by_source_delete="ticker = 'BBB'", mode=mode)
    got = _snap(t.read(spark))
    # vanished AAA@01-04 and BBB@01-04: only BBB deleted; vanished
    # BBB@01-03 deleted; AAA@01-04 survives
    expect = _snap(_mkdf(spark, SNAPSHOT + [
        ("AAA", "2024-01-04", 12.0)]))
    assert got == expect


@pytest.mark.parametrize("mode", ["rewrite", "dv"])
def test_by_source_close_out_update(spark, t, mode):
    """Close-out form: vanished rows stay but take the assignments
    (the SCD-2 invalidation flag shape), pinned-type cast."""
    t.merge(spark, _mkdf(spark, SNAPSHOT), KEYS,
            not_matched_by_source_update={"close": "-1.0"}, mode=mode)
    got = _snap(t.read(spark))
    expect = _snap(_mkdf(spark, SNAPSHOT + [
        ("AAA", "2024-01-04", -1.0), ("BBB", "2024-01-04", -1.0),
        ("BBB", "2024-01-03", -1.0)]))
    assert got == expect
    # close-out never drops a partition
    assert "2024-01-04" in t._raw()["partitions"]


@pytest.mark.parametrize("mode", ["rewrite", "dv"])
def test_by_source_update_condition_gates(spark, t, mode):
    t.merge(spark, _mkdf(spark, SNAPSHOT), KEYS,
            not_matched_by_source_update={"close": "-1.0"},
            not_matched_by_source_condition="ticker = 'BBB'",
            mode=mode)
    got = _snap(t.read(spark))
    expect = _snap(_mkdf(spark, SNAPSHOT + [
        ("AAA", "2024-01-04", 12.0), ("BBB", "2024-01-04", -1.0),
        ("BBB", "2024-01-03", -1.0)]))
    assert got == expect


def test_dv_mode_writes_no_data_files(spark, t):
    """The scale claim: dv-mode by-source delete dead-marks, never
    rewrites — the pre-merge data files are all still live."""
    mf0 = t._raw()
    t.merge(spark, _mkdf(spark, SNAPSHOT), KEYS,
            not_matched_by_source_delete=True, mode="dv")
    mf1 = t._raw()
    # every SURVIVING partition keeps its pre-merge files intact
    # (dead rows are masked by sidecars, never rewritten); the
    # fully-emptied partition drops whole, also without a rewrite
    for v in set(mf0["partitions"]) & set(mf1["partitions"]):
        before = {e["path"] for e in t._entries(mf0, v)}
        after = {e["path"] for e in t._entries(mf1, v)}
        assert before <= after
    assert any(r.get("dv") for r in mf1["partitions"].values())


@pytest.mark.parametrize("mode", ["rewrite", "dv"])
def test_by_source_cdf_classification(spark, t, mode):
    t.merge(spark, _mkdf(spark, SNAPSHOT), KEYS, cdf=True,
            not_matched_by_source_delete=True, mode=mode)
    ch = t.changes(spark, t.version())
    by = {r["_change_type"]: r["n"] for r in
          ch.groupBy("_change_type").agg(
              F.count("*").alias("n")).collect()}
    # AAA@01-03 updated (pre+post), DDD@01-03 inserted, 3 vanished
    # rows deleted (BBB@01-03, AAA@01-04, BBB@01-04); the two
    # source rows equal to their live image still classify pre/post
    # (SQL MERGE updates them; no row-diffing is claimed)
    assert by["delete"] == 3
    assert by["insert"] == 1
    assert by["update_preimage"] == by["update_postimage"] == 3
    dels = sorted((r["ticker"], str(r["trade_date"])) for r in
                  ch.where("_change_type = 'delete'").collect())
    assert dels == [("AAA", "2024-01-04"), ("BBB", "2024-01-03"),
                    ("BBB", "2024-01-04")]


@pytest.mark.parametrize("mode", ["rewrite", "dv"])
def test_by_source_cdf_close_out(spark, t, mode):
    t.merge(spark, _mkdf(spark, SNAPSHOT), KEYS, cdf=True,
            not_matched_by_source_update={"close": "-1.0"}, mode=mode)
    ch = t.changes(spark, t.version())
    closed = _snap(ch.where("_change_type = 'update_postimage' "
                            "AND close = -1.0")
                   .select("ticker", "trade_date", "close"))
    assert len(closed) == 3


@pytest.mark.parametrize("mode", ["rewrite", "dv"])
def test_empty_source_unconditional_delete_wipes(spark, t, mode):
    """SQL MERGE's contract, loudly documented: an EMPTY source with
    an unconditional by-source delete empties the table."""
    empty = _mkdf(spark, BASE).limit(0)
    t.merge(spark, empty, KEYS,
            not_matched_by_source_delete=True, mode=mode)
    assert t.read(spark).count() == 0


@pytest.mark.parametrize("mode", ["rewrite", "dv"])
def test_by_source_composes_with_matched_delete(spark, t, mode):
    """All three clause families in one commit: tombstone rows route
    to WHEN MATCHED DELETE, live rows upsert, vanished rows close
    out by source."""
    src = _mkdf(spark, [("AAA", "2024-01-02", 0.0),   # tombstone
                        ("AAA", "2024-01-03", 77.0),  # upsert
                        ("DDD", "2024-01-03", 40.0)])  # insert
    t.merge(spark, src, KEYS, when_matched_delete="close = 0.0",
            not_matched_by_source_update={"close": "-1.0"}, mode=mode)
    got = _snap(t.read(spark))
    expect = _snap(_mkdf(spark, [
        ("AAA", "2024-01-03", 77.0), ("DDD", "2024-01-03", 40.0),
        ("BBB", "2024-01-02", -1.0), ("BBB", "2024-01-03", -1.0),
        ("AAA", "2024-01-04", -1.0), ("BBB", "2024-01-04", -1.0)]))
    assert got == expect


def test_rewrite_and_dv_agree(spark, tmp_path):
    a = ManifestTable.create(_mkdf(spark, BASE),
                             str(tmp_path / "a"), ts="trade_date")
    b = ManifestTable.create(_mkdf(spark, BASE),
                             str(tmp_path / "b"), ts="trade_date")
    src = _mkdf(spark, SNAPSHOT)
    a.merge(spark, src, KEYS, not_matched_by_source_update={
        "close": "close * 0.0 - 9.0"}, mode="rewrite")
    b.merge(spark, src, KEYS, not_matched_by_source_update={
        "close": "close * 0.0 - 9.0"}, mode="dv")
    assert _snap(a.read(spark)) == _snap(b.read(spark))


def test_by_source_param_validation(spark, t):
    src = _mkdf(spark, SNAPSHOT)
    with pytest.raises(ValueError, match="ONE of"):
        t.merge(spark, src, KEYS,
                not_matched_by_source_delete=True,
                not_matched_by_source_update={"close": "0.0"})
    with pytest.raises(ValueError, match="condition"):
        t.merge(spark, src, KEYS,
                not_matched_by_source_condition="1=1")
    with pytest.raises(SchemaMismatch, match="unknown"):
        t.merge(spark, src, KEYS,
                not_matched_by_source_update={"nope": "0.0"})
    with pytest.raises(ValueError, match="key/partition"):
        t.merge(spark, src, KEYS,
                not_matched_by_source_update={"ticker": "'X'"})


def test_by_source_exactly_once_merge_batch(spark, t):
    """The streaming form: the full-sync close-out and the stream
    high-water commit atomically; a replayed batch id refuses
    without touching the table."""
    src = _mkdf(spark, SNAPSHOT)
    assert t.merge_batch(spark, src, KEYS, "sync", 0,
                         not_matched_by_source_delete=True) is True
    v = t.version()
    assert _snap(t.read(spark)) == _snap(src)
    # replay: refused, no new version
    assert t.merge_batch(spark, src, KEYS, "sync", 0,
                         not_matched_by_source_delete=True) is False
    assert t.version() == v


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("mode", ["rewrite", "dv"])
def test_by_source_randomized_model(spark, tmp_path, seed, mode):
    """Randomized model check: for a random target and a random
    source snapshot, merge(upsert + by-source delete) must equal the
    model computed row-by-row in Python — matched keys take the
    source row, unmatched source keys insert, target-only keys
    delete.  Seeds are fixed (no RNG in-test beyond them) so failures
    replay."""
    import random

    rng = random.Random(seed)
    dates = [f"2024-02-{d:02d}" for d in range(1, 5)]
    tickers = ["AAA", "BBB", "CCC", "DDD", "EEE"]
    target = [(t, d, float(rng.randint(1, 99)))
              for t in tickers for d in dates if rng.random() < 0.7]
    source = [(t, d, float(rng.randint(100, 199)))
              for t in tickers for d in dates if rng.random() < 0.6]
    tab = ManifestTable.create(
        _mkdf(spark, target), str(tmp_path / f"m{seed}{mode}"),
        ts="trade_date")
    tab.merge(spark, _mkdf(spark, source), KEYS,
              not_matched_by_source_delete=True, mode=mode)
    # the model: final state IS the source (upserts replace whole
    # rows; target-only rows die)
    assert _snap(tab.read(spark)) == _snap(_mkdf(spark, source))


@pytest.mark.parametrize("seed", [7, 8])
def test_by_source_close_out_randomized_model(spark, tmp_path, seed):
    """Close-out form against the Python model: matched keys take the
    source row, source-only keys insert, target-only keys keep their
    close but flag to -1.0 — rewrite and dv modes must agree with the
    model AND each other."""
    import random

    rng = random.Random(seed)
    dates = [f"2024-03-{d:02d}" for d in range(1, 5)]
    tickers = ["AAA", "BBB", "CCC", "DDD"]
    target = [(t, d, float(rng.randint(1, 99)))
              for t in tickers for d in dates if rng.random() < 0.7]
    source = [(t, d, float(rng.randint(100, 199)))
              for t in tickers for d in dates if rng.random() < 0.6]
    expect = sorted(
        [tuple(r) for r in source]
        + [(t, d, -1.0) for (t, d, c) in target
           if (t, d) not in {(x, y) for (x, y, _) in source}])
    expect = _snap(_mkdf(spark, [(t, d, c) for t, d, c in expect]))
    for mode in ("rewrite", "dv"):
        tab = ManifestTable.create(
            _mkdf(spark, target), str(tmp_path / f"c{seed}{mode}"),
            ts="trade_date")
        tab.merge(spark, _mkdf(spark, source), KEYS,
                  not_matched_by_source_update={"close": "-1.0"},
                  mode=mode)
        assert _snap(tab.read(spark)) == expect, mode


def test_by_source_composes_with_column_mapping(spark, tmp_path):
    """Feature intersection: a RENAMED table (colmap active) driven
    through the full-snapshot sync — the by-source probe, the
    dead-marking and the close-out assignment all address the logical
    name while files stay physical."""
    t = ManifestTable.create(_mkdf(spark, BASE),
                             str(tmp_path / "cm"), ts="trade_date")
    t.rename_column("close", "px")
    src = (_mkdf(spark, SNAPSHOT)
           .withColumnRenamed("close", "px"))
    t.merge(spark, src, KEYS,
            not_matched_by_source_update={"px": "-1.0"}, mode="dv")
    got = _snap(t.read(spark))
    expect = _snap(_mkdf(spark, SNAPSHOT + [
        ("AAA", "2024-01-04", -1.0), ("BBB", "2024-01-04", -1.0),
        ("BBB", "2024-01-03", -1.0)])
        .withColumnRenamed("close", "px"))
    assert got == expect
    assert t.read(spark).columns == ["ticker", "trade_date", "px"]
