"""Incremental ANALYZE via stored HLL sketches (VERDICT r12 "Next
round" #7): analyze(approx=True) records per-column register arrays in
the commit object; analyze_incremental sketches ONLY files appended
since, and merges — union-of-sketches == sketch-of-union EXACTLY for a
shared deterministic hash, so the merged registers (and hence NDV)
must equal a fresh full analyze bit-for-bit, at O(new rows) cost."""

from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.manifest import ManifestTable


def _batch(spark, lo, hi):
    return (spark.range(lo, hi)
            .select(F.col("id"),
                    (F.col("id") % 5).cast("string").alias("pt"),
                    (F.col("id") % 97).alias("grp"),
                    F.when(F.col("id") % 11 == 0, None)
                     .otherwise(F.col("id") * 1.5).alias("v")))


def test_incremental_equals_full_exactly(spark, tmp_path):
    t = ManifestTable.create(_batch(spark, 0, 400),
                             str(tmp_path / "t"), ts="pt")
    first = t.analyze(spark, approx=True)
    assert all("hll" in s for s in first["columns"].values())
    t.append(_batch(spark, 400, 700))
    inc = t.analyze_incremental(spark)
    # the incremental proof: only the appended files were read
    new_files = 5                       # one per pt value in the append
    assert inc["scanned_files"] == new_files
    # twin table holding the SAME total content, analyzed fresh
    twin = ManifestTable.create(_batch(spark, 0, 700),
                                str(tmp_path / "twin"), ts="pt")
    full = twin.analyze(spark, approx=True)
    for c in ("id", "grp", "v", "pt"):
        assert inc["columns"][c]["hll"] == full["columns"][c]["hll"], c
        assert inc["columns"][c]["ndv"] == full["columns"][c]["ndv"], c
        assert inc["columns"][c]["nulls"] == full["columns"][c]["nulls"]
        assert inc["columns"][c]["min"] == full["columns"][c]["min"]
        assert inc["columns"][c]["max"] == full["columns"][c]["max"]
    # approx NDV lands within HLL error (~6.5% at p=8) of the truth
    truth = {"id": 700, "grp": 97, "pt": 5}
    for c, n in truth.items():
        assert abs(inc["columns"][c]["ndv"] - n) <= max(3, 0.15 * n), c
    # and meta_column_stats reads back NON-stale at the analyze commit
    meta = {r["column"]: r for r in
            t.meta_column_stats(spark).collect()}
    assert meta["id"]["stale"] is False
    assert meta["id"]["ndv"] == inc["columns"]["id"]["ndv"]


def test_incremental_noop_when_fresh(spark, tmp_path):
    t = ManifestTable.create(_batch(spark, 0, 100),
                             str(tmp_path / "t"), ts="pt")
    t.analyze(spark, approx=True)
    v = t.version()
    out = t.analyze_incremental(spark)
    assert out["scanned_files"] == 0
    assert t.version() == v             # no no-op version bump


def test_incremental_falls_back_after_delete(spark, tmp_path):
    """HLL cannot subtract: any row removal since the analyzed
    version forces a full re-analyze, loudly (scanned_files == -1)."""
    t = ManifestTable.create(_batch(spark, 0, 300),
                             str(tmp_path / "t"), ts="pt")
    t.analyze(spark, approx=True)
    t.delete_where(spark, F.expr("pmod(id, 7) = 0"), mode="dv")
    out = t.analyze_incremental(spark)
    assert out["scanned_files"] == -1
    twin = t.read(spark)
    assert out["columns"]["id"]["nulls"] == 0
    # post-delete NDV reflects the surviving rows, not the original
    import math
    survivors = twin.select("id").distinct().count()
    assert abs(out["columns"]["id"]["ndv"] - survivors) \
        <= max(3, 0.15 * survivors)


def test_incremental_falls_back_without_prior_sketch(spark, tmp_path):
    t = ManifestTable.create(_batch(spark, 0, 100),
                             str(tmp_path / "t"), ts="pt")
    t.analyze(spark, approx=False)       # exact stats: no registers
    t.append(_batch(spark, 100, 150))
    out = t.analyze_incremental(spark)
    assert out["scanned_files"] == -1
    assert all("hll" in s for s in out["columns"].values())


def test_cms_frequency_sketch_and_incremental_merge(spark, tmp_path):
    """Count-Min sketches stored by analyze(frequencies=[...]) answer
    key-frequency probes from the commit object (never an
    undercount), and merge through analyze_incremental EXACTLY —
    counters are pure sums, so merged == rebuilt-over-union bit for
    bit."""
    t = ManifestTable.create(_batch(spark, 0, 400),
                             str(tmp_path / "t"), ts="pt")
    t.analyze(spark, approx=True, frequencies=["grp"])
    truth = {r["grp"]: r["n"] for r in
             (t.read(spark).groupBy("grp")
              .agg(F.count("*").alias("n")).collect())}
    for k in (0, 7, 42, 96):
        est = t.estimate_frequency("grp", k)
        assert est >= truth[k], (k, est, truth[k])
        assert est <= truth[k] * 2 + 8, (k, est, truth[k])
    t.append(_batch(spark, 400, 700))
    inc = t.analyze_incremental(spark)
    assert inc["scanned_files"] == 5
    twin = ManifestTable.create(_batch(spark, 0, 700),
                                str(tmp_path / "twin"), ts="pt")
    full = twin.analyze(spark, approx=True, frequencies=["grp"])
    assert inc["columns"]["grp"]["cms"] == full["columns"]["grp"]["cms"]
    # the skew-probe decision input: hot key frequency vs mean
    total = 700
    mean = total / 97
    est_hot = t.estimate_frequency("grp", 0)
    assert est_hot >= total // 97          # >= its true count


def test_estimate_frequency_requires_sketch(spark, tmp_path):
    t = ManifestTable.create(_batch(spark, 0, 50),
                             str(tmp_path / "t"), ts="pt")
    t.analyze(spark, approx=True)
    import pytest
    with pytest.raises(RuntimeError, match="no frequency sketch"):
        t.estimate_frequency("grp", 3)


# -- quantile sketches (VERDICT r13 "Next round" #5) ------------------


def test_ddq_merged_equals_fresh_exactly(spark, tmp_path):
    """The stored-stats determinism property for the quantile
    sketch: incremental merge over an append == a fresh full build
    over the union, bucket for bucket, count for count."""
    t = ManifestTable.create(_batch(spark, 0, 400),
                             str(tmp_path / "t"), ts="pt")
    t.analyze(spark, approx=True, quantiles=["v", "grp"],
              quantile_scale=10.0)
    t.append(_batch(spark, 400, 700))
    inc = t.analyze_incremental(spark)
    assert inc["scanned_files"] == 5    # only the appended files
    twin = ManifestTable.create(_batch(spark, 0, 700),
                                str(tmp_path / "twin"), ts="pt")
    full = twin.analyze(spark, approx=True, quantiles=["v", "grp"],
                        quantile_scale=10.0)
    for c in ("v", "grp"):
        assert inc["columns"][c]["ddq"] == full["columns"][c]["ddq"], c


def test_ddq_quantile_rank_containment_and_value_error(spark,
                                                      tmp_path):
    """The sketch's accuracy contract, asserted exactly: the bucket
    the estimate comes from CONTAINS the target rank (zero rank
    error at bucket granularity), and the midpoint is within the
    documented value error of an exact percentile."""
    from stock_market_data_pipeline_spark.functions import sketches

    t = ManifestTable.create(_batch(spark, 0, 1000),
                             str(tmp_path / "t"), ts="pt")
    t.analyze(spark, approx=True, quantiles=["v"],
              quantile_scale=10.0)
    vals = sorted(r["v"] for r in t.read(spark)
                  .where(F.col("v").isNotNull()).collect())
    n = len(vals)
    ddq = t._raw()["colstats"]["columns"]["v"]["ddq"]
    assert sum(c for _, c in ddq["buckets"]) == n
    import math
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = t.estimate_quantile("v", q)
        target = min(n, max(1, math.ceil(q * n)))
        exact = vals[target - 1]
        # rank containment: the estimate's bucket bounds straddle a
        # true value at the target rank
        key = next(k for k, _ in sorted(ddq["buckets"])
                   if abs(sketches.ddq_rep_py(k, 10.0) - est) < 1e-9)
        lo, hi = sketches.ddq_bounds_py(key, 10.0)
        assert lo <= exact < hi, (q, est, exact, lo, hi)
        # value error: half a bucket width
        assert abs(est - exact) <= max(abs(exact) / 32, 1 / 10.0), \
            (q, est, exact)


def test_ddq_incremental_fallback_rebuilds_sketch(spark, tmp_path):
    """A DV delete invalidates union-only sketches: the fallback
    full analyze must REBUILD the quantile sketch too (not drop it),
    at the stored scale."""
    t = ManifestTable.create(_batch(spark, 0, 300),
                             str(tmp_path / "t"), ts="pt")
    t.analyze(spark, approx=True, quantiles=["v"],
              quantile_scale=10.0)
    t.delete_where(spark, F.expr("pmod(id, 9) = 0"), mode="dv")
    out = t.analyze_incremental(spark)
    assert out["scanned_files"] == -1   # documented full fallback
    ddq = out["columns"]["v"]["ddq"]
    assert ddq["scale"] == 10.0
    live_n = t.read(spark).where(F.col("v").isNotNull()).count()
    assert sum(c for _, c in ddq["buckets"]) == live_n


def test_estimate_quantile_requires_sketch(spark, tmp_path):
    import pytest

    t = ManifestTable.create(_batch(spark, 0, 50),
                             str(tmp_path / "t"), ts="pt")
    t.analyze(spark, approx=True)
    with pytest.raises(RuntimeError, match="no quantile sketch"):
        t.estimate_quantile("v", 0.5)


def test_ddq_heterogeneous_scales_survive_fallback(spark, tmp_path):
    """Two columns analyzed at DIFFERENT quantile scales coexist;
    both the incremental path and the full fallback (per-scale
    rebuild groups) must preserve both sketches at their own
    scales."""
    t = ManifestTable.create(_batch(spark, 0, 200),
                             str(tmp_path / "t"), ts="pt")
    t.analyze(spark, approx=True, columns=["v"], quantiles=["v"],
              quantile_scale=10.0)
    t.analyze(spark, approx=True, columns=["grp"],
              quantiles=["grp"], quantile_scale=1.0)
    # incremental path: each column merges under its OWN scale
    t.append(_batch(spark, 200, 300))
    inc = t.analyze_incremental(spark, columns=["v", "grp"])
    assert inc["scanned_files"] > 0
    assert inc["columns"]["v"]["ddq"]["scale"] == 10.0
    assert inc["columns"]["grp"]["ddq"]["scale"] == 1.0
    # full fallback (DV delete invalidates union-only sketches):
    # per-scale rebuild groups keep BOTH sketches alive
    t.delete_where(spark, F.expr("pmod(id, 11) = 0"), mode="dv")
    out = t.analyze_incremental(spark, columns=["v", "grp"])
    assert out["scanned_files"] == -1
    assert out["columns"]["v"]["ddq"]["scale"] == 10.0
    assert out["columns"]["grp"]["ddq"]["scale"] == 1.0
    live = t.read(spark)
    assert sum(c for _, c in out["columns"]["grp"]["ddq"]["buckets"]) \
        == live.where(F.col("grp").isNotNull()).count()


def test_ddq_excludes_nan_and_inf(spark, tmp_path):
    """Non-finite doubles have no oracle-replayable bucket (Spark's
    non-ANSI long cast buckets NaN at 0, DuckDB errors on the same
    cast): they are excluded like NULLs, so the sketch total counts
    finite rows only and quantiles stay uncorrupted."""
    from stock_market_data_pipeline_spark.functions.sketches import (
        ddq_buckets,
    )

    df = spark.sql("""
        SELECT CASE WHEN id % 5 = 0 THEN double('NaN')
                    WHEN id % 7 = 0 THEN double('Infinity')
                    WHEN id % 11 = 0 THEN double('-Infinity')
                    ELSE CAST(id AS DOUBLE) END AS x
        FROM range(0, 1000)""")
    pairs = ddq_buckets(df, "x", scale=1.0)
    finite = df.where("NOT isnan(x) AND abs(x) != double('Infinity')"
                      ).count()
    assert sum(c for _, c in pairs) == finite
    assert not any(k == 0 and c > 1 for k, c in pairs)


def test_estimate_quantile_empty_sketch_raises(spark, tmp_path):
    import pytest

    t = ManifestTable.create(
        _batch(spark, 0, 50).withColumn(
            "v", F.lit(None).cast("double")),
        str(tmp_path / "t"), ts="pt")
    t.analyze(spark, approx=True, columns=["v"], quantiles=["v"])
    assert t._raw()["colstats"]["columns"]["v"]["ddq"]["buckets"] == []
    with pytest.raises(RuntimeError, match="empty"):
        t.estimate_quantile("v", 0.5)

def test_fallback_keeps_cms_on_nonminimum_scale_column(spark,
                                                       tmp_path):
    """ADVICE r14 #1 regression: a column carrying BOTH a CMS and a
    ddq sketch at a NON-minimum scale must keep its CMS through the
    full fallback's per-scale rebuild calls (analyze() replaces each
    column's stats dict wholesale, so each rebuild call must
    re-thread the frequencies it covers)."""
    t = ManifestTable.create(_batch(spark, 0, 200),
                             str(tmp_path / "t"), ts="pt")
    t.analyze(spark, approx=True, columns=["grp"],
              quantiles=["grp"], quantile_scale=1.0)
    # v: cms + ddq at scale 10.0 — NOT the minimum across columns,
    # so its rebuild happens in a scales[1:] call
    t.analyze(spark, approx=True, columns=["v"], frequencies=["v"],
              quantiles=["v"], quantile_scale=10.0)
    t.delete_where(spark, F.expr("pmod(id, 9) = 0"), mode="dv")
    out = t.analyze_incremental(spark, columns=["v", "grp"])
    assert out["scanned_files"] == -1          # full fallback taken
    assert out["columns"]["v"].get("cms"), \
        "CMS stripped by per-scale fallback rebuild"
    assert out["columns"]["v"]["ddq"]["scale"] == 10.0
    assert out["columns"]["grp"]["ddq"]["scale"] == 1.0
    # the preserved sketch still serves probes (no 'no frequency
    # sketch' raise) and covers only live rows
    assert t.estimate_frequency("v", 3.0) >= 0

def test_ddq_excludes_magnitudes_beyond_double_exact_range(
        spark, tmp_path):
    """ADVICE r14 #3 regression: |x*scale| >= 2**53 has no
    oracle-replayable bucket (double precision diverges from DuckDB
    integer math above 2^53; Spark's non-ANSI long cast clamps at
    2^63 where DuckDB's CAST errors) — excluded like NaN/Inf, so the
    sketch total counts replayable rows only."""
    from stock_market_data_pipeline_spark.functions.sketches import (
        ddq_buckets,
    )

    df = spark.sql("""
        SELECT CASE WHEN id = 0 THEN 9.3e18
                    WHEN id = 1 THEN -9.3e18
                    WHEN id = 2 THEN 1.0e16
                    WHEN id = 3 THEN double('NaN')
                    ELSE CAST(id AS DOUBLE) END AS x
        FROM range(0, 100)""")
    # scale=1.0: ids 0-3 excluded (two beyond-2^63 clamps, one
    # beyond-2^53 precision loss, one NaN), 96 plain rows kept
    pairs = ddq_buckets(df, "x", scale=1.0)
    assert sum(c for _, c in pairs) == 96
    # the guard applies to x*scale, not x alone: a modest value at a
    # huge scale is just as non-replayable
    pairs = ddq_buckets(df, "x", scale=1.0e15)
    kept = sum(c for _, c in pairs)
    assert kept == sum(1 for i in range(4, 100) if i * 1.0e15 < 2**53)

# -- stats-driven salting decision (VERDICT r14 #4, 2nd consumer) ----


def test_plan_salt_flags_whale_and_spares_uniform(spark, tmp_path):
    """plan_salt reads hottest-key bound (CMS row-max fold) vs mean
    frequency (rows/NDV) from the commit object: a whale key is
    flagged with a fan-out ~ hot/mean; a uniform column is not; an
    unsketched column returns None (no guessed fan-out)."""
    df = (spark.range(0, 6000)
          .select(F.col("id"),
                  (F.col("id") % 3).cast("string").alias("pt"),
                  F.when(F.col("id") % 2 == 0, F.lit(-1))
                   .otherwise(F.col("id")).alias("whale"),
                  (F.col("id") % 5).cast("string").alias("uniform"),
                  (F.col("id") * 1.5).alias("v")))
    t = ManifestTable.create(df, str(tmp_path / "t"), ts="pt")
    t.analyze(spark, approx=True, columns=["whale", "uniform"],
              frequencies=["whale", "uniform"])
    hot = t.plan_salt("whale")
    # truth: hot key holds 3000 rows, ~3001 keys, mean ~2 — a
    # massive ratio; CMS only ever overcounts, HLL NDV is within
    # ~15%, so the flag is robust
    assert hot["skewed"] and hot["n_salts"] > 1
    assert hot["est_hot"] >= 3000          # CMS never undercounts
    uni = t.plan_salt("uniform")
    assert not uni["skewed"] and uni["n_salts"] == 1
    assert t.plan_salt("v") is None
    # n_salts clamps to max_salts even for extreme ratios
    assert t.plan_salt("whale", max_salts=8)["n_salts"] == 8


def test_cms_max_frequency_upper_bounds_true_max(spark):
    from stock_market_data_pipeline_spark.functions import sketches

    df = (spark.range(0, 5000)
          .select(F.when(F.col("id") % 4 == 0, F.lit(0))
                  .otherwise(F.col("id")).alias("k")))
    grid = sketches.cms_counters(df, "k")
    true_max = 1250                        # id % 4 == 0 bucket
    est = sketches.cms_max_frequency_py(grid)
    assert est >= true_max                 # never an undercount
    assert est <= 5000                     # and bounded by total
    assert sketches.cms_max_frequency_py([[0] * 8] * 4) == 0
