"""Unit tests for the LLM-pipeline operators beyond oracle parity:
multimodal feature extraction against a pure-numpy reference, LSH
recall against exact Jaccard, and plan-shape assertions (no cartesian
products in the bucketed paths)."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_SMALL


def _docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def test_multimodal_features_match_numpy(spark):
    from stock_market_data_pipeline_spark.llm import multimodal

    payloads = multimodal.payload_table(_docs(spark))
    feats = multimodal.extract_features(payloads).orderBy("doc_id")
    sample = feats.limit(5).collect()
    raw = {r.doc_id: r.text for r in
           _docs(spark).orderBy("doc_id").limit(5).collect()}
    assert len(sample) == 5
    for row in sample:
        arr = np.frombuffer(raw[row.doc_id].encode(), dtype=np.uint8)
        assert row.n_bytes == arr.size
        assert row.byte_mean == pytest.approx(float(arr.mean()))
        assert row.byte_std == pytest.approx(float(arr.std()))
        assert row.byte_min == int(arr.min())
        assert row.byte_max == int(arr.max())
        assert len(row.grid_means) == multimodal.GRID_CELLS
        bounds = np.linspace(0, arr.size, multimodal.GRID_CELLS + 1,
                             dtype=np.int64)
        expect = [float(arr[bounds[i]:bounds[i + 1]].mean())
                  for i in range(multimodal.GRID_CELLS)]
        assert row.grid_means == pytest.approx(expect)


def test_multimodal_unknown_codec_raises(spark):
    from stock_market_data_pipeline_spark.llm.multimodal import _decode

    with pytest.raises(NotImplementedError):
        _decode(b"\x00\x01", codec="jpeg")


def test_minhash_lsh_recall_vs_exact(spark):
    """LSH candidates must recover the exact-Jaccard pair set at this
    corpus's separation (near-dups ~0.8+, noise <0.25)."""
    from stock_market_data_pipeline_spark.llm import dedup

    docs = _docs(spark)
    exact = {(r.doc_a, r.doc_b) for r in
             dedup.ngram_jaccard_pairs(docs, tau=0.5).collect()}
    lsh = {(r.doc_a, r.doc_b) for r in
           dedup.minhash_lsh_pairs(docs, tau=0.5).collect()}
    assert lsh == exact
    assert len(exact) > 0


def test_lsh_plan_has_no_cartesian(spark):
    """The LSH and IVF paths must plan equi-joins, never a cartesian /
    broadcast-nested-loop product."""
    from stock_market_data_pipeline_spark.llm import dedup, similarity

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    for df in [dedup.minhash_lsh_pairs(_docs(spark), tau=0.5),
               similarity.ivf_topk(emb)]:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, plan[:2000]


def test_dedup_exact_groups(spark):
    """Canonical groups: every group of size n has exactly one
    canonical row; singleton docs are their own canonical."""
    from pyspark.sql import functions as F

    from stock_market_data_pipeline_spark.llm import dedup

    out = dedup.dedup_exact(_docs(spark))
    bad = (out.groupBy("canon_md5")
           .agg(F.sum("is_canonical").alias("n_canon"),
                F.max("dup_group_size").alias("sz"),
                F.count("*").alias("n"))
           .where((F.col("n_canon") != 1) | (F.col("sz") != F.col("n"))))
    assert bad.count() == 0
    assert out.where(F.col("dup_group_size") > 1).count() > 0
