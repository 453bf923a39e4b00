"""Skew-salting equivalence tests + hypothesis property tests for the
indicator column factories (engine invariants on generated series)."""

from __future__ import annotations

from datetime import date, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


# ----------------------------------------------------------- salting

def test_salted_agg_matches_plain(spark):
    """Salting must change distribution only, never results."""
    from stock_market_data_pipeline_spark.operators.salt import salted_agg

    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    plain = (o.groupBy("o_custkey")
             .agg(F.sum("o_totalprice").alias("total"),
                  F.count(F.lit(1)).alias("n"))
             )
    salted = salted_agg(
        o, ["o_custkey"],
        partial_aggs=[F.sum("o_totalprice").alias("s"),
                      F.count(F.lit(1)).alias("c")],
        final_aggs=[F.sum("s").alias("total"), F.sum("c").alias("n")],
        n_salts=8)
    # compare counts exactly; sums via round (salting reorders the FP
    # sum, which is exactly the order-sensitivity the engine's decimal
    # rule exists for — counts prove row routing is lossless)
    a = {(r.o_custkey, r.n, round(r.total, 2)) for r in plain.collect()}
    b = {(r.o_custkey, r.n, round(r.total, 2)) for r in salted.collect()}
    assert a == b


def test_salted_broadcast_left_matches_plain(spark):
    from stock_market_data_pipeline_spark.operators.salt import (
        salted_broadcast_left,
    )

    c = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    n = spark.read.parquet(f"{SF_SMALL}/nation.parquet") \
        .withColumnRenamed("n_nationkey", "c_nationkey")
    plain = c.join(n, "c_nationkey").select("c_custkey", "n_name")
    salted = salted_broadcast_left(c, n, "c_nationkey", n_salts=4) \
        .select("c_custkey", "n_name")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_runner_partitioned_table_layout(spark):
    """partition_by yields a value-partitioned ManifestTable (the
    runner's path sinks are manifest-committed since round 8) and the
    key+range query prunes: partition values drop whole partitions at
    plan time, and the residual filter is pushed to the scan."""
    import os
    import tempfile

    from stock_market_data_pipeline_spark.manifest import ManifestTable
    from stock_market_data_pipeline_spark.runner import Model, Runner

    wh = tempfile.mkdtemp(prefix="runner_part_")
    r = Runner(spark, wh)
    r.register(Model(
        "daily_orders",
        lambda s, b: (s.read.parquet(f"{SF_SMALL}/orders.parquet")
                      .withColumn("od", F.col("o_orderdate").cast("date"))
                      .withColumn("year", F.year("od"))),
        materialization="table",
        partition_by=["year"]))
    out = r.run()["daily_orders"]
    table = ManifestTable(os.path.join(wh, "daily_orders"), "year")
    parts = list(table._raw()["partitions"])
    assert len(parts) > 1                      # one partition per year
    plan = table.scan_plan({"year": (1995, 1995)})
    assert plan["partitions_pruned"] == len(parts) - 1
    assert plan["shards_opened"] == 1
    pruned = out.where(F.col("year") == 1995)
    pplan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(year), EqualTo(year,1995)]"         in pplan


# -------------------------------------------- indicator properties

def _series_df(spark, closes):
    base = date(1995, 1, 1)
    rows = [("T", base + timedelta(days=i), float(c))
            for i, c in enumerate(closes)]
    return spark.createDataFrame(rows, "ticker string, trade_date date, close double")


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(closes=st.lists(
    st.floats(min_value=1.0, max_value=1e5, allow_nan=False,
              allow_infinity=False),
    min_size=1, max_size=40))
def test_guarded_sma_null_until_n(spark, closes):
    """W1 invariant: NULL for the first n-1 rows, defined after."""
    from stock_market_data_pipeline_spark.functions import indicators as ind

    n = 5
    df = _series_df(spark, closes)
    w = ind.rolling_window("ticker", "trade_date", n)
    out = (df.withColumn("sma", ind.guarded_sma(F.col("close"), w, n))
           .orderBy("trade_date").collect())
    # guarded_sma sums through the documented DEC quantization (the
    # cross-engine determinism discipline, SURVEY §8.6 rule 1), so
    # the reference value must quantize the SAME way: raw-float
    # expectations diverge at the decimal's last digit for inputs
    # carrying more fractional digits than DEC's scale (hypothesis
    # found closes=[1,1,1,1,1.2265625] -> 1.0453126 vs 1.0453125)
    from decimal import ROUND_HALF_UP, Decimal

    scale = Decimal(1).scaleb(
        -int(str(ind.DEC).split(",")[1].rstrip(")")))
    q = [float(Decimal(repr(c)).quantize(scale, ROUND_HALF_UP))
         for c in closes]
    for i, row in enumerate(out):
        if i < n - 1:
            assert row.sma is None, (i, row)
        else:
            expect = sum(q[i - n + 1:i + 1]) / n
            assert row.sma == pytest.approx(expect, rel=1e-9)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(closes=st.lists(
    st.floats(min_value=1.0, max_value=1e4, allow_nan=False,
              allow_infinity=False),
    min_size=2, max_size=40))
def test_crossover_mutually_exclusive(spark, closes):
    """W7 invariant: bullish and bearish crossovers of the same pair
    can never fire on the same row."""
    from stock_market_data_pipeline_spark.functions import indicators as ind
    from pyspark.sql import Window

    df = _series_df(spark, closes)
    w = Window.partitionBy("ticker").orderBy("trade_date")
    sma = ind.guarded_sma(F.col("close"), ind.rolling_window(
        "ticker", "trade_date", 3), 3)
    out = (df.withColumn("sma", sma)
           .withColumn("bull", ind.crossover(F.col("close"), F.col("sma"), w))
           .withColumn("bear", ind.crossover(F.col("sma"), F.col("close"), w)))
    assert out.where((F.col("bull") == 1) & (F.col("bear") == 1)).count() == 0


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.data())
def test_merge_upsert_algebra(spark, data):
    """MERGE invariants on generated tables: output keys = union of
    keys; update wins on intersection; no duplicates."""
    from stock_market_data_pipeline_spark.incremental import merge_upsert

    t_keys = data.draw(st.sets(st.integers(0, 30), min_size=1, max_size=15))
    u_keys = data.draw(st.sets(st.integers(0, 30), min_size=1, max_size=15))
    target = spark.createDataFrame(
        [(k, "old") for k in sorted(t_keys)], "k int, v string")
    updates = spark.createDataFrame(
        [(k, "new") for k in sorted(u_keys)], "k int, v string")
    out = {(r.k, r.v) for r in merge_upsert(target, updates, ["k"]).collect()}
    expect = {(k, "new") for k in u_keys} | {
        (k, "old") for k in t_keys - u_keys}
    assert out == expect


def test_approx_count_distinct_error_bound(spark):
    """approx_count_distinct (HyperLogLog++) is the scale path where
    exact distinct state won't fit (streaming, running distincts);
    calibrate its error against exact on two cardinality regimes.
    rsd=0.02 gives a ~2% standard error — assert within 3 sigma."""
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMALL

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    for df, col in ((ev, "user_id"), (li, "l_partkey")):
        exact, approx = df.agg(
            F.countDistinct(col).alias("e"),
            F.approx_count_distinct(col, rsd=0.02).alias("a"),
        ).first()
        assert abs(approx - exact) <= max(3, 0.06 * exact), \
            (col, exact, approx)


def test_plan_broadcast_decides_per_side(spark, tmp_path):
    """plan_broadcast (VERDICT r15 #4): the broadcast-or-shuffle
    decision from the commit object alone — live bytes (DV-adjusted)
    vs threshold — with no ANALYZE required."""
    from stock_market_data_pipeline_spark.manifest import ManifestTable

    big = spark.range(0, 20000).select(
        F.col("id"), (F.col("id") * 1.5).alias("v"))
    small = spark.range(0, 10).select(
        F.col("id"), F.lit("x").alias("tag"))
    bt = ManifestTable.create(big, str(tmp_path / "big"), ts=None)
    st_ = ManifestTable.create(small, str(tmp_path / "small"),
                               ts=None)
    thr = 16 * 1024
    assert st_.plan_broadcast(thr)["broadcast"] is True
    pb = bt.plan_broadcast(thr)
    assert pb["broadcast"] is False and pb["live_rows"] == 20000
    # DV-dead rows shrink the estimate proportionally
    bt.delete_where(spark, F.expr("id >= 2000"), mode="dv")
    pb2 = bt.plan_broadcast(thr)
    assert pb2["live_rows"] == 2000
    assert pb2["est_bytes"] < pb["est_bytes"] // 5


def test_salted_broadcast_left_keep_salt(spark):
    from stock_market_data_pipeline_spark.operators.salt import (
        salted_broadcast_left,
    )

    fact = spark.range(0, 2000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v"))
    dim = spark.range(0, 3).select(
        F.col("id").alias("k"), F.lit("d").alias("tag"))
    out = salted_broadcast_left(fact, dim, "k", n_salts=8,
                                keep_salt=True)
    assert "__salt" in out.columns
    assert out.count() == 2000
    # every key's rows spread across multiple salts at this volume
    spread = (out.groupBy("k")
              .agg(F.countDistinct("__salt").alias("s")).collect())
    assert all(r["s"] > 1 for r in spread)
    # and dropping the salt reproduces the plain join exactly
    plain = fact.join(dim, "k")
    assert out.drop("__salt").exceptAll(plain).count() == 0
    assert plain.exceptAll(out.drop("__salt")).count() == 0


def test_plan_broadcast_range_selectivity_from_ddq(spark, tmp_path):
    """plan_broadcast(where=...) — the DDQ quantile sketch's planning
    consumer (VERDICT r15 #2): without a sketch the filtered-side
    decision falls back to the UNFILTERED size (selectivity None,
    conservative); with one, the estimate scales by range selectivity
    and can flip the decision."""
    from stock_market_data_pipeline_spark.manifest import ManifestTable

    df = spark.range(0, 10000).select(
        F.col("id"), (F.col("id") % 1000).cast("double").alias("v"))
    t = ManifestTable.create(df, str(tmp_path / "t"), ts=None)
    full = t.plan_broadcast()["est_bytes"]
    thr = full // 2
    rng = ("v", None, 100.0)          # ~10% of rows
    ns = t.plan_broadcast(threshold_bytes=thr, where=rng)
    assert ns["selectivity"] is None
    assert ns["est_bytes"] == full and not ns["broadcast"]
    t.analyze(spark, approx=True, columns=["v"], quantiles=["v"])
    pb = t.plan_broadcast(threshold_bytes=thr, where=rng)
    assert pb["broadcast"] and 0.05 <= pb["selectivity"] <= 0.2
    # a range covering everything keeps the full size
    allr = t.plan_broadcast(threshold_bytes=thr,
                            where=("v", None, None))
    assert allr["selectivity"] == 1.0
    assert allr["est_bytes"] == full


def test_plan_backfill_sizes_from_range_selectivity(spark, tmp_path):
    """plan_backfill — the DDQ sketch's second planning consumer: a
    per-run ROW budget becomes a per-run FILE budget, scaled up by
    the replay filter's range selectivity when the sketch exists,
    conservative (selectivity None, 1.0 assumed) when it does not."""
    from stock_market_data_pipeline_spark.manifest import ManifestTable

    df = spark.range(0, 8000).select(
        F.col("id"), (F.col("id") % 1000).cast("double").alias("v"))
    t = ManifestTable.create(df.where(F.col("id") < 2000),
                             str(tmp_path / "t"), ts=None)
    for k in range(1, 4):             # 4 same-sized files, v1..v4
        t.append(df.where((F.col("id") >= 2000 * k)
                          & (F.col("id") < 2000 * (k + 1))))
    raw = t._raw()
    files = sum(r["files"] for r in raw["partitions"].values())
    assert files >= 2
    avg = 8000 / files
    rng = ("v", None, 100.0)          # ~10% of rows
    step = int(2 * avg)
    ns = t.plan_backfill(step, where=rng)
    assert ns["selectivity"] is None
    assert ns["step_files"] == 2      # floor(2*avg / avg)
    assert ns["files"] == files and ns["live_rows"] == 8000
    t.analyze(spark, approx=True, columns=["v"], quantiles=["v"])
    pb = t.plan_backfill(step, where=rng)
    assert pb["selectivity"] is not None
    assert 0.05 <= pb["selectivity"] <= 0.2
    # ~10x more files per run for a ~10%-selective replay
    assert pb["step_files"] > 2 * ns["step_files"]
    # the estimated per-run delivery stays near the row budget
    assert pb["est_rows_per_run"] <= 2 * step
    # no `where` => plain rows/avg sizing even with the sketch stored
    plain = t.plan_backfill(step)
    assert plain["selectivity"] is None
    assert plain["step_files"] == ns["step_files"]


def test_plan_backfill_clamps_and_empty_table(spark, tmp_path):
    from stock_market_data_pipeline_spark.manifest import ManifestTable

    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 10).cast("double").alias("v"))
    t = ManifestTable.create(df, str(tmp_path / "t"), ts=None)
    # budget below one file's rows still admits one file per run
    assert t.plan_backfill(1)["step_files"] == 1
    # a huge budget clamps at max_step_files
    big = t.plan_backfill(10**9, max_step_files=64)
    assert big["step_files"] == 64
    # a DV-emptied table has zero effective rows per file: the walk
    # degenerates to max_step_files (nothing to deliver, one run)
    t.delete_where(spark, F.lit(True), mode="dv")
    gone = t.plan_backfill(50, max_step_files=16)
    assert gone["live_rows"] == 0 and gone["step_files"] == 16


def test_plan_backfill_since_version_scopes_the_average(spark,
                                                        tmp_path):
    """since_version scopes the rows/file average to the replayed
    range: a big compacted base must not inflate the per-file
    estimate for a slivered streaming tail (and the whole-table mean
    stays the fallback when the range diff is not append-shaped)."""
    from stock_market_data_pipeline_spark.manifest import ManifestTable

    base = spark.range(0, 10000).select(
        F.col("id"), (F.col("id") % 100).cast("double").alias("v"))
    t = ManifestTable.create(base, str(tmp_path / "t"), ts=None)
    for k in range(4):                    # v2..v5: 100-row slivers
        t.append(base.where((F.col("id") >= 10000 + 0) &
                            F.lit(False)).unionAll(
            spark.range(10000 + k * 100, 10000 + (k + 1) * 100)
            .select(F.col("id"),
                    (F.col("id") % 100).cast("double").alias("v"))))
    whole = t.plan_backfill(800)
    scoped = t.plan_backfill(800, since_version=1)
    # whole-table mean ~= 2080 rows/file -> 0 floors to 1 file/run;
    # the replayed range's mean is 100 -> 8 files/run
    assert scoped["avg_rows_per_file"] == 100.0
    assert scoped["step_files"] == 8
    assert whole["step_files"] < scoped["step_files"]
    # a non-append-shaped range diff (compaction shrank file count)
    # falls back to the whole-table mean rather than a bogus delta
    t.compact(spark)
    fb = t.plan_backfill(800, since_version=t.version() - 1)
    assert fb["avg_rows_per_file"] == fb["live_rows"] / fb["files"]


def test_plan_compact_rejects_min_files_below_two(spark, tmp_path):
    from stock_market_data_pipeline_spark.manifest import ManifestTable

    df = spark.range(0, 10).select(F.col("id"), F.lit("a").alias("pt"))
    t = ManifestTable.create(df, str(tmp_path / "t"), ts="pt")
    try:
        t.plan_compact(target_rows=100, min_files=1)
    except ValueError as e:
        assert "min_files" in str(e)
    else:
        raise AssertionError("min_files=1 must be rejected")
