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
