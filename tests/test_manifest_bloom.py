"""Per-file Bloom membership index (manifest.py set_bloom /
_attach_blooms / scan_plan probing).

The contract under test: for IN-list predicates on a bloom column,
scan_plan may skip files ONLY when the filter proves no probed value
is present — a probe for a value a file contains must ALWAYS hit (no
false negatives, the wrong-answer failure mode), while absent values
may occasionally hit (false positives merely read more).  The build
side hashes Spark's ``cast(col as string)`` rendering JVM-side; the
probe side reproduces it with hashlib.md5 — these tests pin that the
two sides agree bit-for-bit, which is the entire safety argument.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.manifest import (
    ManifestTable,
    SchemaMismatch,
    _bloom_canon,
    _bloom_excluded,
    _bloom_positions,
    _BLOOM_NOTHING,
)

M, K = 1 << 14, 7
SPEC = {"cols": ["doc_id"], "m": M, "k": K}


def _mkdocs(spark, n=400, sources=4):
    """doc_id hash-scattered across files: every file's [min, max]
    spans nearly the whole domain, so zone maps cannot skip and any
    observed skipping is the bloom's."""
    return (spark.range(0, n)
            .select(F.col("id").alias("doc_id"),
                    (F.col("id") % sources).cast("string").alias("src"),
                    F.md5(F.col("id").cast("string")).alias("body"))
            .orderBy("body"))


@pytest.fixture()
def btable(spark, tmp_path):
    return ManifestTable.create(
        _mkdocs(spark), str(tmp_path / "bloom"), ts="src",
        bloom=SPEC, max_records_per_file=50)


def _all_entries(t):
    return [e for v in t.manifest()["partitions"].values() for e in v]


def test_build_and_probe_sides_agree(spark, btable):
    """The safety property: every value actually present in a file
    probes POSITIVE against that file's own filter (zero false
    negatives), across the full table."""
    import pyarrow.parquet as pq

    for e in _all_entries(btable):
        vals = pq.read_table(
            os.path.join(btable.root, e["path"]),
            columns=["doc_id"])["doc_id"].to_pylist()
        assert vals, "test fixture wrote an empty file"
        bc = e["bloom"]["doc_id"]
        for v in vals:
            assert not _bloom_excluded(bc, [v], "bigint", M, K), (
                f"false negative: {v} present in {e['path']} but "
                f"probe missed")


def test_point_lookup_skips_where_zone_maps_cannot(spark, btable):
    """The value property: on hash-scattered ids a 2-id IN probe
    keeps a small fraction of files, all skips attributed to the
    bloom (zone maps span the domain and can prove nothing)."""
    plan_all = btable.scan_plan()
    total = len(plan_all["files"])
    assert total >= 8, "fixture should split into many files"
    # MID-domain ids: inside every file's [min, max] (hash-scattered
    # fixture), so the range check can exclude nothing — any skip is
    # the bloom's.  (Domain-EXTREME ids like 0/n-1 are the one case
    # zone maps handle: most files' min/max exclude them.)
    ids = [157, 250]
    plan = btable.scan_plan(where={"doc_id": ids})
    assert plan["bloom_skipped"] == plan["skipped"] > 0
    assert len(plan["files"]) * 2 <= total
    got = (btable.read(spark, where={"doc_id": ids})
           .where(F.col("doc_id").isin(ids)).count())
    assert got == 2


def test_false_positive_rate_is_small(btable):
    """Probes for 500 values NOT in the table: files may false-
    positively survive, but the observed FPR stays far below the
    no-filter baseline (every file kept)."""
    kept_files = 0
    probes = 0
    for e in _all_entries(btable):
        bc = e["bloom"]["doc_id"]
        for v in range(10_000, 10_500):
            probes += 1
            if not _bloom_excluded(bc, [v], "bigint", M, K):
                kept_files += 1
    assert kept_files / probes < 0.05


def test_range_specs_never_consult_the_bloom(btable):
    """Membership filters cannot answer range questions: a (lo, hi)
    tuple spec on the bloom column must not bloom-skip anything."""
    plan = btable.scan_plan(where={"doc_id": (0, 399)})
    assert plan["bloom_skipped"] == 0


def test_files_without_filters_are_never_bloom_skipped(spark, tmp_path):
    """set_bloom AFTER data exists: old files carry no filter and
    always survive the probe (read more, never wrong); files from
    writes after the spec carry filters and skip."""
    # EVEN ids only: odd mid-domain ids are absent yet inside every
    # file's [min, max], so only a membership filter can skip them
    even = _mkdocs(spark, n=100).withColumn(
        "doc_id", F.col("doc_id") * 2)
    t = ManifestTable.create(
        even, str(tmp_path / "late"), ts="src",
        max_records_per_file=25)
    t.set_bloom(["doc_id"], m=M, k=K)
    pre = t.scan_plan(where={"doc_id": [101]})
    assert pre["bloom_skipped"] == 0 and pre["files"], (
        "pre-spec files must all survive an absent-id probe")
    extra = _mkdocs(spark, n=100).withColumn(
        "doc_id", F.col("doc_id") * 2 + 1000)
    t.append(extra)
    post = t.scan_plan(where={"doc_id": [1101]})
    assert post["bloom_skipped"] > 0, (
        "post-spec files carry filters and must skip")
    # compaction rewrites old files WITH filters
    t.compact(spark)
    after = t.scan_plan(where={"doc_id": [101]})
    assert not after["files"], (
        "after compaction every live file has a filter; an absent "
        "in-range id must keep nothing (modulo FPR at 14 bits/key: "
        "deterministic here)")


def test_merge_rewrites_keep_filters_current(spark, btable):
    """A merge rewrites touched partitions: the rewritten files must
    carry filters reflecting the POST-merge contents (new keys probe
    positive)."""
    upd = (spark.createDataFrame([(9000, "0"), (9001, "1")],
                                 "doc_id bigint, src string")
           .withColumn("body", F.md5(F.col("doc_id").cast("string"))))
    btable.merge(spark, upd, ["doc_id", "src"])
    plan = btable.scan_plan(where={"doc_id": [9000, 9001]})
    assert plan["files"], "new keys must keep at least their file"
    got = (btable.read(spark, where={"doc_id": [9000, 9001]})
           .where(F.col("doc_id").isin([9000, 9001])).count())
    assert got == 2


def test_probe_canonicalization_matches_spark_cast(spark):
    """The cross-side hashing contract, property-style: for ints,
    strings and dates, the JVM's md5(cast(x as string)) h1/h2 equal
    the driver-side canon + hashlib path on every sampled value."""
    rows = (spark.range(0, 200)
            .select(F.col("id").cast("bigint").alias("i"),
                    F.concat(F.lit("s-"), F.col("id")).alias("s"),
                    F.date_add(F.lit("2024-01-01").cast("date"),
                               F.col("id").cast("int")).alias("d")))
    for col, dtype in [("i", "bigint"), ("s", "string"), ("d", "date")]:
        hexc = F.md5(F.col(col).cast("string"))
        got = rows.select(
            F.col(col),
            F.conv(F.substring(hexc, 1, 15), 16, 10).cast("long"),
            F.conv(F.substring(hexc, 17, 15), 16, 10).cast("long"),
        ).collect()
        for v, h1, h2 in got:
            canon = _bloom_canon(v, dtype)
            assert canon is not None and canon is not _BLOOM_NOTHING
            import hashlib
            hx = hashlib.md5(canon.encode()).hexdigest()
            assert int(hx[0:15], 16) == h1, (col, v)
            assert int(hx[16:31], 16) == h2, (col, v)


def test_numeric_leniency_cannot_become_a_wrong_skip(spark, btable):
    """The zone-map layer treats '07' == 7; the bloom layer must
    canonicalize through the pinned schema type so a string-typed
    probe of an int column still finds the file that holds 7."""
    loose = btable.scan_plan(where={"doc_id": ["007"]})
    strict = btable.scan_plan(where={"doc_id": [7]})
    assert sorted(loose["files"]) == sorted(strict["files"])
    # a probe value outside the int domain matches nothing: full skip
    none_plan = btable.scan_plan(where={"doc_id": ["not-a-number"]})
    assert not none_plan["files"]
    # ...but an unrenderable probe (None) conservatively keeps all
    keep_plan = btable.scan_plan(where={"doc_id": [None]})
    assert keep_plan["bloom_skipped"] == 0


def test_canon_domain_edges():
    assert _bloom_canon(7, "bigint") == "7"
    assert _bloom_canon("07", "bigint") == "7"
    assert _bloom_canon(7.0, "bigint") == "7"
    assert _bloom_canon(7.5, "bigint") is _BLOOM_NOTHING
    assert _bloom_canon("x", "bigint") is _BLOOM_NOTHING
    assert _bloom_canon(True, "bigint") is None
    assert _bloom_canon("2024-01-05", "date") == "2024-01-05"
    import datetime
    assert _bloom_canon(datetime.date(2024, 1, 5),
                        "date") == "2024-01-05"
    assert _bloom_canon("abc", "string") == "abc"
    assert _bloom_canon(1.5, "string") is None


def test_positions_are_in_range_and_spread():
    for v in ["a", "b", "7", "2024-01-05"]:
        pos = _bloom_positions(v, M, K)
        assert len(pos) == K
        assert all(0 <= p < M for p in pos)
    assert _bloom_positions("a", M, K) != _bloom_positions("b", M, K)


def test_set_bloom_validates_spec(spark, tmp_path):
    t = ManifestTable.create(
        _mkdocs(spark, n=20), str(tmp_path / "val"), ts="src")
    with pytest.raises(SchemaMismatch):
        t.set_bloom(["nope"])
    with pytest.raises(ValueError):
        t.set_bloom(["doc_id"], m=1000)        # not a power of two
    with pytest.raises(ValueError):
        t.set_bloom(["doc_id"], k=0)
    # float columns are out: cast-string rendering not reproducible
    t2 = ManifestTable.create(
        _mkdocs(spark, n=20).withColumn("f", F.lit(1.5)),
        str(tmp_path / "valf"), ts="src")
    with pytest.raises(SchemaMismatch):
        t2.set_bloom(["f"])


def test_spec_survives_unrelated_commits(spark, btable):
    """The bloom spec is table config: appends, schema evolution and
    restores carry it forward without naming it (the _commit carry
    default the monkeypatching test doubles also rely on)."""
    v0 = btable.version()
    btable.append(_mkdocs(spark, n=10).withColumn(
        "doc_id", F.col("doc_id") + 5000))
    btable.add_columns([("extra", "string")])
    assert btable._raw()["bloom"] == {
        "cols": ["doc_id"], "m": M, "k": K}
    btable.restore(v0)
    assert btable._raw()["bloom"] == {
        "cols": ["doc_id"], "m": M, "k": K}


def test_partition_coarse_bloom_prunes_shards_unopened(spark, tmp_path):
    """The metadata half: with KEY-SPARSE partitions (each partition
    holds a disjoint id slice), a point probe drops non-candidate
    partitions from the commit-object coarse bloom alone —
    shards_opened stays O(candidate partitions), not O(#partitions).
    Without the fold, a hash-scattered key forces EVERY shard open."""
    df = (spark.range(0, 400)
          .select(F.col("id").alias("doc_id"),
                  (F.col("id") % 8).cast("string").alias("src"),
                  F.md5(F.col("id").cast("string")).alias("body")))
    t = ManifestTable.create(df, str(tmp_path / "pb"), ts="src",
                             bloom=SPEC, max_records_per_file=25)
    # every ref carries a coarse bloom
    raw = t._raw()
    assert all("bloom" in r for r in raw["partitions"].values())
    # id 16 lives in src=0 only (16 % 8): ~50 ids/partition keeps the
    # 1024-bit fold far from saturation, so the other 7 shards prune
    plan = t.scan_plan(where={"doc_id": [16]})
    assert plan["pbloom_pruned"] >= 5
    assert plan["shards_opened"] <= 8 - plan["pbloom_pruned"]
    got = (t.read(spark, where={"doc_id": [16]})
           .where(F.col("doc_id") == 16).count())
    assert got == 1


def test_partition_fold_omitted_when_any_file_lacks_a_filter(
        spark, tmp_path):
    """A partition mixing pre-spec (filterless) and post-spec files
    must NOT carry a coarse bloom — a partial fold could wrong-skip.
    Its per-file filters still skip individually."""
    even = _mkdocs(spark, n=80).withColumn("doc_id",
                                           F.col("doc_id") * 2)
    t = ManifestTable.create(even, str(tmp_path / "mix"), ts="src",
                             max_records_per_file=20)
    t.set_bloom(["doc_id"], m=M, k=K)
    t.append(_mkdocs(spark, n=80).withColumn(
        "doc_id", F.col("doc_id") * 2 + 1000))
    raw = t._raw()
    assert all("bloom" not in r for r in raw["partitions"].values())
    # 1101: absent but inside the POST-spec files' id range, so zone
    # maps keep them and only their per-file filters can skip
    plan = t.scan_plan(where={"doc_id": [1101]})
    assert plan["pbloom_pruned"] == 0
    assert plan["bloom_skipped"] > 0                # per-file filters work


def test_empty_column_bloom_skips_but_absent_bloom_does_not(
        spark, tmp_path):
    """A file whose bloom column was entirely NULL stores an EMPTY
    filter — provably no non-NULL value, probes skip it.  Distinct
    from a file with NO filter, which always survives."""
    df = (spark.range(0, 30)
          .select(F.lit(None).cast("bigint").alias("doc_id"),
                  F.lit("0").alias("src"),
                  F.md5(F.col("id").cast("string")).alias("body")))
    t = ManifestTable.create(df, str(tmp_path / "nulls"), ts="src",
                             bloom=SPEC)
    [e] = _all_entries(t)
    assert e["bloom"]["doc_id"] == {}
    plan = t.scan_plan(where={"doc_id": [1]})
    assert not plan["files"] and plan["bloom_skipped"] == 1


def test_respec_probes_old_filters_under_their_build_params(
        spark, tmp_path):
    """r9 ADVICE item 1 (high), the exact reported repro: create with
    one spec, set_bloom a DIFFERENT m/k — a point lookup for a value
    that exists must still return it.  Every filter records the (m, k)
    it was built under and is probed with exactly those parameters;
    files appended after the respec build (and skip) under the new
    spec."""
    t = ManifestTable.create(
        _mkdocs(spark, n=200), str(tmp_path / "respec"), ts="src",
        bloom={"cols": ["doc_id"], "m": 1 << 16, "k": 7},
        max_records_per_file=50)
    pre = t.scan_plan(where={"doc_id": [157]})
    assert len(pre["files"]) >= 1 and pre["bloom_skipped"] > 0
    t.set_bloom(["doc_id"], m=1 << 10, k=5)
    # the reported failure: 0 rows after the respec (bloom_skipped
    # swallowed the live file).  Old filters now carry mk=[65536, 7]
    # and are probed under it — the lookup keeps exactly the same
    # files as before the respec.
    post = t.scan_plan(where={"doc_id": [157]})
    assert sorted(post["files"]) == sorted(pre["files"])
    got = (t.read(spark, where={"doc_id": [157]})
           .where(F.col("doc_id") == 157).count())
    assert got == 1
    # appends after the respec build under the NEW parameters...
    t.append(_mkdocs(spark, n=50).withColumn(
        "doc_id", F.col("doc_id") + 5000))
    for v in t.manifest()["partitions"]:
        for e in t._entries(t._raw(), v):
            assert e["mk"] in ([1 << 16, 7], [1 << 10, 5])
    # ...and an absent-id probe still skips via BOTH generations
    miss = t.scan_plan(where={"doc_id": [4999]})
    assert not miss["files"], "absent id must keep nothing"
    # a mixed-spec partition folds NO coarse bloom (a single-spec fold
    # could wrong-skip the other generation's files)
    raw = t._raw()
    for ref in raw["partitions"].values():
        rb = ref.get("bloom")
        if rb is not None:
            assert set(rb) == {"mk", "cols"}


def test_respec_refuses_legacy_filters_without_recorded_params(
        spark, tmp_path, monkeypatch):
    """A table whose filters predate the per-file (m, k) record (no
    ``mk`` key) cannot be re-parameterized: set_bloom must refuse
    loudly instead of letting scan_plan probe old words with new
    positions."""
    t = ManifestTable.create(
        _mkdocs(spark, n=100), str(tmp_path / "legacy"), ts="src",
        bloom=SPEC, max_records_per_file=50)
    # simulate a pre-record table: strip mk from every live entry
    mf = t._raw()
    parts = {v: [dict(e, **{}) for e in t._entries(mf, v)]
             for v in mf["partitions"]}
    for es in parts.values():
        for e in es:
            e.pop("mk", None)
    t._commit(parts, base_version=mf["version"],
              streams=mf.get("streams", {}), schema=mf.get("schema"))
    with pytest.raises(SchemaMismatch, match="compact"):
        t.set_bloom(["doc_id"], m=1 << 10, k=5)
    # same m/k (a pure column-list change) stays allowed
    t.set_bloom(["doc_id", "body"], m=M, k=K)


def test_coverage_gate_unaccounted_file_gets_no_filter(
        spark, tmp_path):
    """r9 ADVICE item 3: a staged file the build job could not match
    by path must end with NO filter (never bloom-skipped), not the
    pre-initialized empty filter (always skipped).  Simulated by
    handing _attach_blooms a staged entry whose path resolves outside
    the txn dir the job reads."""
    t = ManifestTable.create(
        _mkdocs(spark, n=50), str(tmp_path / "gate"), ts="src",
        bloom=SPEC, max_records_per_file=50)
    mf = t._raw()
    [v0] = list(mf["partitions"])[:1]
    real = t._entries(mf, v0)[0]
    txn_dir = os.path.dirname(os.path.dirname(
        os.path.join(t.root, real["path"])))
    ghost = {"path": "data/txn-nowhere/src=9/ghost.parquet",
             "rows": 10, "bytes": 100, "stats": {}}
    staged = {v0: [dict(real), ghost]}
    t._attach_blooms(spark, txn_dir, staged, SPEC)
    assert "bloom" in staged[v0][0] and staged[v0][0]["mk"] == [M, K]
    assert "bloom" not in ghost and "mk" not in ghost, (
        "an unaccounted file must fall back to never-skipped")


def test_coverage_gate_raises_on_systematic_path_mismatch(
        spark, tmp_path):
    """When the job accounts for NONE of the staged files, the build
    is structurally broken (scheme/normalization mismatch): refuse to
    commit an index that would never skip, instead of silently
    attaching nothing."""
    t = ManifestTable.create(
        _mkdocs(spark, n=50), str(tmp_path / "gate2"), ts="src",
        bloom=SPEC, max_records_per_file=50)
    mf = t._raw()
    [v0] = list(mf["partitions"])[:1]
    real = t._entries(mf, v0)[0]
    txn_dir = os.path.dirname(os.path.dirname(
        os.path.join(t.root, real["path"])))
    ghosts = [{"path": f"data/txn-nowhere/src=9/g{i}.parquet",
               "rows": 10, "bytes": 100, "stats": {}}
              for i in range(3)]
    with pytest.raises(RuntimeError, match="account"):
        t._attach_blooms(spark, txn_dir, {v0: ghosts}, SPEC)


def test_sketch_orders_probes_rarest_first(spark, tmp_path):
    """VERDICT r14 #4: with CMS sketches stored for every bloom
    column, scan_plan probes the estimated-rarest IN-list first —
    fewer probes, identical kept set; without sketches (or with any
    probed column unsketched) the declaration order stands."""
    from pyspark.sql import functions as F

    from stock_market_data_pipeline_spark.manifest import ManifestTable

    df = (spark.range(0, 20000)
          .select(F.col("id"),
                  (F.col("id") % 5).cast("string").alias("pt"),
                  (F.col("id") % 4000).cast("string").alias("key"),
                  (F.col("id") % 3).cast("string").alias("tag")))
    t = ManifestTable.create(
        df, str(tmp_path / "t"), ts="pt",
        bloom={"cols": ["key", "tag"], "m": 1 << 14, "k": 5},
        max_records_per_file=500)
    where = {"tag": ["1"], "key": ["7", "13"]}
    naive = t.scan_plan(where)
    assert naive["probe_order"] == ["tag", "key"]
    # partial stats (only one of two probed columns sketched) must
    # ALSO fall back whole — a half-ordered plan would be arbitrary
    t.analyze(spark, approx=True, columns=["key"],
              frequencies=["key"])
    assert t.scan_plan(where)["probe_order"] == ["tag", "key"]
    t.analyze(spark, approx=True, columns=["tag"],
              frequencies=["tag"])
    plan = t.scan_plan(where)
    assert plan["probe_order"] == ["key", "tag"]
    assert plan["bloom_probes"] < naive["bloom_probes"]
    assert sorted(plan["files"]) == sorted(naive["files"])
    assert plan["bloom_skipped"] == naive["bloom_skipped"] > 0
