"""Property tests over the round-9 features: metadata-answered counts
(NULL-safe containment), CDF-driven incremental view maintenance, and
the baseline JPEG codec — randomized inputs against exact oracles,
because each of these has a failure mode a single example can miss
(an overcounted NULL file, a sign error that cancels on one dataset, a
Huffman category only certain coefficients reach)."""

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


@settings(max_examples=5, deadline=None,
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
