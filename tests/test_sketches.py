"""HyperLogLog sketch properties: deterministic registers, merge
algebra, estimator accuracy, and the cross-engine hash contract."""

import zlib  # noqa: F401  (parity tests below use md5, not crc)

import pytest
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.functions import sketches as S


def _ids(spark, n, tag="u"):
    return spark.range(n).select(
        F.concat(F.lit(tag), F.col("id")).alias("k"),
        (F.col("id") % 3).alias("g"))


def test_registers_deterministic_and_dense(spark):
    df = _ids(spark, 500)
    a = S.hll_registers(df, ["g"], "k", p=8).collect()
    b = S.hll_registers(df, ["g"], "k", p=8).collect()
    assert {r["g"]: r["hll"] for r in a} \
        == {r["g"]: r["hll"] for r in b}
    for r in a:
        assert len(r["hll"]) == 256
        assert all(v >= 0 for v in r["hll"])


def test_registers_match_python_reference(spark):
    """The Spark column math must reproduce the md5-based reference
    implementation bit-for-bit — the same contract the DuckDB oracle
    relies on."""
    import hashlib

    vals = [f"user{i}" for i in range(300)]
    df = spark.createDataFrame([(v,) for v in vals], "k string") \
        .withColumn("g", F.lit(1))
    got = S.hll_registers(df, ["g"], "k", p=8).collect()[0]["hll"]
    regs = [0] * 256
    for v in vals:
        hv = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        b, w = hv % 256, hv >> 8
        rank = 53 if w == 0 else 52 - w.bit_length() + 1
        regs[b] = max(regs[b], rank)
    assert list(got) == regs


def test_merge_is_union(spark):
    """merge(sketch(A), sketch(B)) == sketch(A ∪ B) — the property
    that makes daily rollups exact at the register level."""
    a = _ids(spark, 400, "a").withColumn("g", F.lit(0))
    b = _ids(spark, 400, "b").withColumn("g", F.lit(0))
    sa = S.hll_registers(a, ["g"], "k", p=8)
    sb = S.hll_registers(b, ["g"], "k", p=8).withColumnRenamed(
        "hll", "hll2")
    merged = (sa.join(sb, "g")
              .select(S.hll_merge(F.col("hll"), F.col("hll2"))
                      .alias("hll")).collect()[0]["hll"])
    union = S.hll_registers(a.unionByName(b), ["g"], "k",
                            p=8).collect()[0]["hll"]
    assert list(merged) == list(union)


@pytest.mark.parametrize("n", [10, 100, 2000])
def test_estimate_within_published_error(spark, n):
    df = _ids(spark, n).withColumn("g", F.lit(0))
    sk = S.hll_registers(df, ["g"], "k", p=8)
    est = sk.select(S.hll_estimate(F.col("hll"), p=8)
                    .alias("e")).collect()[0]["e"]
    # 1.04/sqrt(256) = 6.5% std error; allow 4 sigma + small-n slack
    assert abs(est - n) <= 0.26 * n + 3, (n, est)


def test_merge_agg_rolls_up_groups(spark):
    df = _ids(spark, 900)
    daily = S.hll_registers(df, ["g"], "k", p=8)
    rolled = (daily.agg(S.hll_merge_agg("hll").alias("hll"))
              .select(S.hll_estimate(F.col("hll"), p=8).alias("e"))
              .collect()[0]["e"])
    assert abs(rolled - 900) <= 0.26 * 900 + 3


def test_merge_null_passthrough(spark):
    df = _ids(spark, 50).withColumn("g", F.lit(0))
    sk = S.hll_registers(df, ["g"], "k", p=8)
    out = sk.select(
        S.hll_merge(F.col("hll"),
                    F.lit(None).cast("array<int>")).alias("m"),
        F.col("hll")).collect()[0]
    assert list(out["m"]) == list(out["hll"])


def test_zeros_and_register_sum_witness(spark):
    df = _ids(spark, 200).withColumn("g", F.lit(0))
    row = (S.hll_registers(df, ["g"], "k", p=8)
           .select(S.hll_zeros(F.col("hll")).alias("z"),
                   S.hll_register_sum(F.col("hll")).alias("s"),
                   F.col("hll")).collect()[0])
    assert row["z"] == sum(1 for v in row["hll"] if v == 0)
    assert row["s"] == sum(row["hll"])


def test_boilerplate_scrub_reassembles_in_order(spark):
    """Docs sharing a 2-word segment lose exactly that segment; the
    survivors' md5 equals the md5 of the expected cleaned string."""
    import hashlib

    from stock_market_data_pipeline_spark.llm import textops

    common = "click here"
    rows = [(i, f"w{i}a w{i}b {common} w{i}c w{i}d") for i in range(10)]
    rows.append((99, common))   # fully-boilerplate doc: must drop out
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           textops.boilerplate_scrub(docs, chunk_words=2,
                                     df_frac=0.5).collect()}
    assert 99 not in out
    for i in range(10):
        exp = f"w{i}a w{i}b w{i}c w{i}d"
        assert out[i]["clean_md5"] \
            == hashlib.md5(exp.encode()).hexdigest()
        assert out[i]["n_removed"] == 1
        assert out[i]["clean_words"] == 4


# -- deterministic log-histogram quantile sketch (DDQ) ----------------


def test_ddq_keys_monotone_and_exact_linear():
    from stock_market_data_pipeline_spark.functions.sketches import (
        ddq_bounds_py,
        ddq_rep_py,
    )

    # linear region is EXACT: bucket [k, k+1) at scale 1
    for k in (0, 1, 77, 127):
        lo, hi = ddq_bounds_py(k)
        assert (lo, hi) == (k, k + 1)
    # log region: bounds tile the line with no gap/overlap and
    # relative width <= 1/32
    prev_hi = 128
    for key in range(128, 128 + 56 * 32):
        lo, hi = ddq_bounds_py(key)
        assert lo == prev_hi, key
        assert hi > lo and (hi - lo) <= lo / 32 + 1e-9, key
        assert lo <= ddq_rep_py(key) < hi
        prev_hi = hi


def test_ddq_negative_mirror_buckets(spark):
    """Negative values flow through the sign mirror: buckets tile
    floor-quantized ranges with no gap or overlap over the whole
    signed domain, and quantiles come back signed."""
    from stock_market_data_pipeline_spark.functions.sketches import (
        ddq_bounds_py,
        ddq_buckets,
        ddq_quantile_py,
    )

    df = spark.range(-500, 500).select(
        (F.col("id") * 1.7).alias("x"))
    pairs = ddq_buckets(df, "x", scale=1.0)
    assert sum(c for _, c in pairs) == 1000
    # every bucket's bounds contain only values that map to it
    vals = sorted(r["x"] for r in df.collect())
    covered = 0
    for k, c in pairs:
        lo, hi = ddq_bounds_py(k, 1.0)
        covered += sum(1 for v in vals if lo <= v < hi)
    assert covered == 1000
    med = ddq_quantile_py(pairs, 0.5, 1.0)
    assert abs(med - vals[499]) <= max(abs(vals[499]) / 32, 1.0)
    p01 = ddq_quantile_py(pairs, 0.01, 1.0)
    assert p01 < 0


def test_ddq_duckdb_parity_with_negatives(spark):
    """The cross-engine determinism contract: DuckDB rebuilds the
    SAME sparse (key, count) pairs via the documented twin SQL,
    including the sign mirror and both linear/log regions."""
    import duckdb

    from stock_market_data_pipeline_spark.functions.sketches import (
        ddq_buckets,
    )

    pdf = spark.range(-3000, 3000).select(
        (F.col("id") * 0.37).alias("x")).toPandas()
    df = spark.createDataFrame(pdf)
    pairs = ddq_buckets(df, "x", scale=10.0)
    con = duckdb.connect()
    con.register("src", pdf)
    rows = con.execute("""
WITH q AS (
  SELECT CAST(FLOOR(CAST(x AS DOUBLE) * 10.0) AS BIGINT) AS q
  FROM src WHERE x IS NOT NULL
), k AS (
  SELECT CASE WHEN q < 0 THEN -kk ELSE kk END AS key FROM (
    SELECT q, CASE WHEN a < 128 THEN a
           ELSE 128 + (bl-8)*32 + ((a >> (bl-6)) - 32) END AS kk
    FROM (SELECT q, abs(q) AS a, length(bin(abs(q))) AS bl FROM q))
)
SELECT key, COUNT(*) AS n FROM k GROUP BY 1
""").fetchall()
    assert sorted([int(k), int(n)] for k, n in rows) == pairs


def test_ddq_merge_associative_and_exact(spark):
    from stock_market_data_pipeline_spark.functions.sketches import (
        ddq_buckets,
        ddq_merge_py,
    )

    df = spark.range(0, 900).select((F.col("id") * 2.3).alias("x"))
    full = ddq_buckets(df, "x", 1.0)
    parts = [ddq_buckets(df.where(f"id % 3 = {i}"), "x", 1.0)
             for i in range(3)]
    m1 = ddq_merge_py(ddq_merge_py(parts[0], parts[1]), parts[2])
    m2 = ddq_merge_py(parts[0], ddq_merge_py(parts[1], parts[2]))
    assert m1 == m2 == full
