"""Property tests over the round-9 features: metadata-answered counts
(NULL-safe containment), CDF-driven incremental view maintenance, the
baseline JPEG codec, per-file Bloom membership skipping, and the
three-clause MERGE — randomized inputs against exact oracles, because
each of these has a failure mode a single example can miss (an
overcounted NULL file, a sign error that cancels on one dataset, a
Huffman category only certain coefficients reach, a bloom false
negative on one unlucky hash, a clause routing that only breaks when
delete and upsert keys collide)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.manifest import ManifestTable


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(
    st.tuples(st.sampled_from(["p1", "p2", "p3"]),
              st.one_of(st.none(), st.integers(0, 50))),
    min_size=1, max_size=40),
    lo=st.integers(0, 50), span=st.integers(0, 50))
def test_count_where_matches_exact_count(spark, tmp_path_factory,
                                         rows, lo, span):
    """For ANY mix of partitions, NULLs and range bounds, count_where
    == the exact filtered count — the metadata fast path may never
    over- or under-claim."""
    hi = lo + span
    root = str(tmp_path_factory.mktemp("cntprop") / "t")
    df = spark.createDataFrame(
        [(p, v, i) for i, (p, v) in enumerate(rows)],
        "p string, v int, idx int")
    t = ManifestTable.create(df, root, ts="p")
    out = t.count_where(spark, "v", lo, hi)
    expect = sum(1 for (_, v) in rows if v is not None and lo <= v <= hi)
    assert out["count"] == expect
    assert out["rows_from_metadata"] + out["files_read"] >= 0


@settings(max_examples=3, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(batches=st.lists(
    st.lists(st.tuples(st.sampled_from(list("abcdef")),
                       st.sampled_from(["g1", "g2"]),
                       st.floats(-100, 100, allow_nan=False,
                                 width=32)),
             min_size=1, max_size=6),
    min_size=1, max_size=3))
def test_ivm_random_merge_sequences_match_rebuild(spark,
                                                  tmp_path_factory,
                                                  batches):
    """Any sequence of cdf-captured merges, folded batch-by-batch into
    the view, equals a from-scratch rebuild after every step — the
    delta algebra has no order- or sign-dependence to get lucky on."""
    from stock_market_data_pipeline_spark.operators.ivm import (
        apply_cdf_delta,
        sum_count_view,
    )

    root = str(tmp_path_factory.mktemp("ivmprop") / "t")
    base = [("a", "g1", 1.0), ("b", "g2", 2.0)]
    schema = "k string, g string, x double"
    t = ManifestTable.create(spark.createDataFrame(base, schema),
                             root, ts="g")
    view = sum_count_view(t.read(spark), ["g"], ["x"])
    for batch in batches:
        upd = spark.createDataFrame(
            [(k, g, float(x)) for (k, g, x) in
             {(k, g): (k, g, x) for (k, g, x) in batch}.values()],
            schema)
        # key-stability precondition: (k, g) is the merge key, g the
        # partition column — keys never move partitions
        t.merge(spark, upd, ["k", "g"], cdf=True)
        view = apply_cdf_delta(view, t.changes(spark, t.version()),
                               ["g"], ["x"])
        rebuild = sum_count_view(t.read(spark), ["g"], ["x"])
        assert sorted(map(tuple, view.collect())) \
            == sorted(map(tuple, rebuild.collect()))


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(present=st.lists(st.integers(0, 10_000), min_size=1,
                        max_size=60, unique=True),
       absent=st.lists(st.integers(10_001, 20_000), min_size=1,
                       max_size=30, unique=True))
def test_bloom_membership_never_false_negative(spark, tmp_path_factory,
                                               present, absent):
    """For ANY id set, a scan_plan probe for present ids keeps at
    least the files that hold them (the read result is exact), and
    probes never bloom-skip a file containing a probed value — the
    one failure mode that would lose rows."""
    root = str(tmp_path_factory.mktemp("bloomprop") / "t")
    df = spark.createDataFrame([(v, "p") for v in present],
                               "doc_id bigint, src string")
    t = ManifestTable.create(
        df, root, ts="src",
        bloom={"cols": ["doc_id"], "m": 1 << 12, "k": 5},
        max_records_per_file=8)
    got = sorted(r.doc_id for r in
                 t.read(spark, where={"doc_id": present})
                 .where(F.col("doc_id").isin(present)).collect())
    assert got == sorted(present)
    miss = t.scan_plan(where={"doc_id": absent})
    # absent probes may keep files (FPR) but never lose correctness:
    # reading the kept set and filtering yields zero rows
    if miss["files"]:
        n = (t.read(spark, where={"doc_id": absent})
             .where(F.col("doc_id").isin(absent)).count())
        assert n == 0


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(base=st.lists(st.tuples(st.sampled_from(list("abcdefgh")),
                               st.sampled_from(["p1", "p2"])),
                     min_size=1, max_size=12, unique=True),
       upd=st.lists(st.tuples(st.sampled_from(list("abcdefgh")),
                              st.sampled_from(["p1", "p2"]),
                              st.booleans()),
                    min_size=1, max_size=12))
def test_merge_delete_matches_model(spark, tmp_path_factory,
                                    base, upd):
    """Any base table x any update batch with per-row delete flags:
    the three-clause merge equals the dict-model composition
    (delete matched-and-marked, then upsert the unmarked)."""
    root = str(tmp_path_factory.mktemp("mdelprop") / "t")
    upd = list({(k, g): (k, g, d) for (k, g, d) in upd}.values())
    t = ManifestTable.create(
        spark.createDataFrame([(k, g, 1.0) for k, g in base],
                              "k string, g string, x double"),
        root, ts="g")
    batch = spark.createDataFrame(
        [(k, g, -1.0 if d else 2.0) for (k, g, d) in upd],
        "k string, g string, x double")
    t.merge(spark, batch, ["k", "g"],
            when_matched_delete=F.col("x") < 0)
    model = {(k, g): 1.0 for k, g in base}
    for (k, g, d) in upd:
        if d:
            model.pop((k, g), None)          # matched deletes only
        else:
            model[(k, g)] = 2.0              # upsert
    got = sorted((r.k, r.g, r.x) for r in t.read(spark).collect())
    assert got == sorted((k, g, x) for (k, g), x in model.items())


@settings(max_examples=25, deadline=None)
@given(w8=st.integers(1, 4), h8=st.integers(1, 3),
       seed=st.integers(0, 10_000),
       kind=st.sampled_from(["noise", "flat", "stripes", "extreme"]))
def test_jpeg_roundtrip_property(w8, h8, seed, kind):
    """Any dims (multiples of 8) x any content class roundtrips within
    tolerance; flat images roundtrip exactly (DC-only blocks)."""
    from stock_market_data_pipeline_spark.llm.multimodal import (
        JPEG_TOL,
        _decode_jpeg,
        _jpeg_encode_gray,
    )

    h, w = 8 * h8, 8 * w8
    rng = np.random.default_rng(seed)
    if kind == "noise":
        px = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
    elif kind == "flat":
        px = np.full((h, w), int(rng.integers(0, 256)), dtype=np.uint8)
    elif kind == "stripes":
        px = np.tile(np.where(np.arange(w) % 2 == 0, 0, 255),
                     (h, 1)).astype(np.uint8)
    else:  # extreme: corner deltas hit the widest DC-diff categories
        px = np.zeros((h, w), dtype=np.uint8)
        px[::8, ::8] = 255
    dec = _decode_jpeg(_jpeg_encode_gray(px))
    assert dec.size == h * w
    err = np.abs(dec - px.reshape(-1).astype(np.int64)).max()
    assert err <= JPEG_TOL, (kind, int(err))
    if kind == "flat":
        assert err == 0


def test_jpeg_rejects_truncated_entropy_segment():
    """Chopping the entropy stream mid-block must raise, not return a
    short pixel array."""
    px = (np.arange(24 * 16) % 251).astype(np.uint8).reshape(16, 24)
    from stock_market_data_pipeline_spark.llm.multimodal import (
        _decode_jpeg,
        _jpeg_encode_gray,
    )

    blob = _jpeg_encode_gray(px)
    with pytest.raises(ValueError):
        _decode_jpeg(blob[:len(blob) // 2])


def test_ivm_null_keys_fold_into_one_row(spark):
    """r9 ADVICE item 4: groupBy puts NULL keys in ONE group, so the
    delta fold must join null-safely — a NULL-keyed view row and its
    NULL-keyed delta must merge into one folded row, not a stale row
    plus a delta-only row."""
    from pyspark.sql import functions as F

    from stock_market_data_pipeline_spark.operators.ivm import (
        apply_cdf_delta,
        sum_count_view,
    )

    base = spark.createDataFrame(
        [(None, 10.0), (None, 5.0), ("a", 1.0)],
        "k string, x double")
    view = sum_count_view(base, ["k"], ["x"])
    cdf = spark.createDataFrame(
        [(None, 2.0, "insert"), ("a", 1.0, "delete")],
        "k string, x double, _change_type string")
    out = apply_cdf_delta(view, cdf, ["k"], ["x"]).collect()
    # 'a' count reached zero and dropped; NULL folded into ONE row
    assert len(out) == 1
    [r] = out
    assert r["k"] is None
    assert r["n_rows"] == 3
    assert r["sum_x_micros"] == 17_000_000
