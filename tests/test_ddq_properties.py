"""Property tests for the deterministic log-histogram quantile
sketch (functions/sketches.py ddq_*) — driver-side math only, no
Spark session needed: bucket bounds tile the line, keys are monotone
in value, the Python bucketing round-trips containment for arbitrary
finite doubles, and merge is exact under any split."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from stock_market_data_pipeline_spark.functions.sketches import (
    DDQ_LINEAR,
    ddq_bounds_py,
    ddq_merge_py,
    ddq_quantile_py,
    ddq_rep_py,
)


def _key_py(x: float, scale: float) -> int:
    """Reference bucketing: the same integer recipe the Spark column
    expression and the DuckDB twin implement."""
    q = math.floor(x * scale)
    a = abs(q)
    if a < DDQ_LINEAR:
        k = a
    else:
        bl = a.bit_length()
        k = DDQ_LINEAR + (bl - 8) * 32 + ((a >> (bl - 6)) - 32)
    return -k if q < 0 else k


@given(st.floats(min_value=-1e15, max_value=1e15,
                 allow_nan=False, allow_infinity=False),
       st.sampled_from([1.0, 10.0, 100.0]))
@settings(max_examples=500, deadline=None)
def test_value_always_inside_its_buckets_bounds(x, scale):
    k = _key_py(x, scale)
    lo, hi = ddq_bounds_py(k, scale)
    assert lo <= x < hi or math.isclose(x, hi, rel_tol=1e-15), \
        (x, scale, k, lo, hi)
    rep = ddq_rep_py(k, scale)
    assert lo <= rep < hi


@given(st.lists(st.floats(min_value=-1e12, max_value=1e12,
                          allow_nan=False, allow_infinity=False),
                min_size=2, max_size=50))
@settings(max_examples=200, deadline=None)
def test_keys_monotone_in_value(xs):
    pairs = sorted((x, _key_py(x, 1.0)) for x in xs)
    keys = [k for _, k in pairs]
    assert keys == sorted(keys), pairs


@given(st.lists(st.floats(min_value=-1e9, max_value=1e9,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=200),
       st.integers(min_value=2, max_value=5))
@settings(max_examples=100, deadline=None)
def test_merge_of_any_split_equals_whole(xs, nparts):
    def build(vals):
        counts: dict[int, int] = {}
        for v in vals:
            k = _key_py(v, 1.0)
            counts[k] = counts.get(k, 0) + 1
        return sorted([k, c] for k, c in counts.items())

    whole = build(xs)
    parts = [build(xs[i::nparts]) for i in range(nparts)]
    merged = parts[0]
    for p in parts[1:]:
        merged = ddq_merge_py(merged, p)
    assert merged == whole


@given(st.lists(st.floats(min_value=-1e9, max_value=1e9,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=300),
       st.floats(min_value=0.0, max_value=1.0))
@settings(max_examples=200, deadline=None)
def test_quantile_estimate_rank_contained(xs, q):
    counts: dict[int, int] = {}
    for v in xs:
        k = _key_py(v, 1.0)
        counts[k] = counts.get(k, 0) + 1
    pairs = sorted([k, c] for k, c in counts.items())
    est = ddq_quantile_py(pairs, q, 1.0)
    n = len(xs)
    target = min(n, max(1, math.ceil(q * n)))
    exact = sorted(xs)[target - 1]
    # the estimate's bucket must contain a true value at the rank
    k = _key_py(est, 1.0)
    lo, hi = ddq_bounds_py(k, 1.0)
    assert lo <= exact < hi or math.isclose(exact, hi,
                                            rel_tol=1e-12), \
        (q, est, exact, lo, hi)
