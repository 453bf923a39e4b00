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
        # the implementation derives every float from exact integer
        # moments — the numpy reference values must match EXACTLY,
        # not approximately (cross-engine determinism, SURVEY §8.6)
        assert row.byte_mean == float(arr.mean())
        assert row.byte_std == pytest.approx(float(arr.std()), abs=1e-12)
        assert row.byte_min == int(arr.min())
        assert row.byte_max == int(arr.max())
        assert len(row.grid_means) == multimodal.GRID_CELLS
        cells = (np.arange(arr.size) * multimodal.GRID_CELLS) // arr.size
        expect = [float(arr[cells == i].mean())
                  for i in range(multimodal.GRID_CELLS)]
        assert row.grid_means == expect


def test_multimodal_unknown_codec_raises(spark):
    from stock_market_data_pipeline_spark.llm.multimodal import _decode

    # jpeg graduated to a real decoder in r9; mp3 remains the honest
    # NotImplementedError boundary (no audio libs in this container)
    with pytest.raises(NotImplementedError):
        _decode(b"\x00\x01", codec="mp3")


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


def test_scd2_handles_null_check_columns(spark):
    """A snapshot row whose first check column is NULL must still count
    as present (regression: presence was inferred from a data column's
    NULL-ness)."""
    from stock_market_data_pipeline_spark.snapshots import scd2_apply

    snap1 = spark.createDataFrame(
        [(1, None, "Tech"), (2, "B Corp", "Energy")],
        "ticker int, company string, sector string")
    hist = scd2_apply(None, snap1, "ticker", ["company", "sector"],
                      "1996-01-01")
    # same snapshot again: nothing changes (NULL <=> NULL is true)
    hist2 = scd2_apply(hist, snap1, "ticker", ["company", "sector"],
                       "1997-01-01")
    rows = {(r.ticker, r.company, r.dbt_valid_to)
            for r in hist2.collect()}
    assert rows == {(1, None, None), (2, "B Corp", None)}


def test_screener_like_escaping(spark):
    """LIKE metacharacters in the search term match literally."""
    from stock_market_data_pipeline_spark.serve import _escape_like

    assert _escape_like("1%3") == "1\\%3"
    assert _escape_like("a_b") == "a\\_b"
    assert _escape_like("a\\b") == "a\\\\b"


def test_simhash_candidates_complete_for_threshold(spark):
    """Pigeonhole check: with max_hamming+1 chunks, a pair differing in
    exactly max_hamming bits spread one-per-chunk must still be found."""
    from pyspark.sql import functions as F

    from stock_market_data_pipeline_spark.llm.dedup import (
        SIMHASH_CHUNK_BITS,
    )

    assert len(SIMHASH_CHUNK_BITS) == 5 and sum(SIMHASH_CHUNK_BITS) == 32
    # adversarial pair: 4 differing bits, one in each of 4 chunks —
    # chunk 5 must still match
    offsets, off = [], 0
    for b in SIMHASH_CHUNK_BITS:
        offsets.append(off)
        off += b
    sig_a = 0
    sig_b = sum(1 << offsets[i] for i in range(4))   # flip 4 chunks
    chunks_a = [(sig_a >> o) & ((1 << b) - 1)
                for o, b in zip(offsets, SIMHASH_CHUNK_BITS)]
    chunks_b = [(sig_b >> o) & ((1 << b) - 1)
                for o, b in zip(offsets, SIMHASH_CHUNK_BITS)]
    shared = [i for i in range(5) if chunks_a[i] == chunks_b[i]]
    assert shared, "a 4-bit-diff pair must share at least one chunk"


def test_codec_payloads_survive_non_ascii_text(spark):
    """The PPM/WAV builders count CHARACTERS (rpad, the oracle's
    substr/ascii walk) while the decoders validate BYTES; both sides
    sanitize non-ASCII to '?' so one char is one byte by construction.
    Pre-sanitization, a multi-byte char made the PPM pixel section
    overflow its declared w*h*3 and the WAV sample stream diverge
    from the oracle."""
    from stock_market_data_pipeline_spark.llm.multimodal import (
        _decode_ppm,
        _decode_wav,
        ppm_payload_table,
        wav_payload_table,
    )

    docs = spark.createDataFrame(
        [(9, "café au lait — 50¢ déjà"), (10, "plain ascii")],
        "doc_id long, text string")
    for row in ppm_payload_table(docs).collect():
        pixels = _decode_ppm(bytes(row.payload))     # raises on overflow
        assert len(pixels) == row.meta_width * row.meta_height * 3
        assert max(pixels) <= 127                    # pure ASCII bytes
    for row in wav_payload_table(docs).collect():
        samples = _decode_wav(bytes(row.payload))
        assert len(samples) == row.meta_width
        # every sample is a little-endian pair of ASCII bytes
        assert all(0 <= (s & 0xFF) <= 127 and
                   0 <= ((s >> 8) & 0xFF) <= 127 for s in samples)


def test_png_codec_roundtrip_filters_and_crc(spark):
    """The PNG builder/decoder pair: every scanline filter type
    (None/Sub/Up/Average/Paeth — row r uses r % 5, so any image with
    h >= 5 exercises all five) must reverse to the exact source pixel
    stream; a corrupted chunk must fail the CRC check loudly instead
    of decoding garbage; non-ASCII text sanitizes to one-byte chars
    exactly like the PPM/WAV builders."""
    import numpy as np

    from stock_market_data_pipeline_spark.llm.multimodal import (
        _decode_png,
        png_payload_table,
    )

    docs = spark.createDataFrame(
        [(9, "café au lait — 50¢ déjà"), (10, "plain ascii"),
         (31, "The quick brown fox jumps over the lazy dog")],
        "doc_id long, text string")
    rows = png_payload_table(docs).collect()
    assert max(r.meta_height for r in rows) >= 5  # all 5 filters hit
    for row in rows:
        raw = None
        for d, t in [(9, "café au lait — 50¢ déjà"), (10, "plain ascii"),
                     (31, "The quick brown fox jumps over the lazy dog")]:
            if d == row.doc_id:
                raw = t.encode("ascii", errors="replace")
        n = row.meta_width * row.meta_height
        want = np.frombuffer(raw, dtype=np.uint8)[np.arange(n) % len(raw)]
        got = _decode_png(bytes(row.payload))
        assert np.array_equal(got, want.astype(np.int64)), row.doc_id
        # container really is compressed + framed: flipping one IDAT
        # byte must raise, not shift pixels
        bad = bytearray(row.payload)
        bad[45] ^= 0xFF
        with pytest.raises(ValueError, match="CRC|PNG"):
            _decode_png(bytes(bad))


def test_chunk_documents_coverage_and_stride(spark):
    """Every token is covered, consecutive chunks overlap by exactly
    window - stride (except a shorter final chunk), and no chunk is
    fully contained in its predecessor — on documents shorter than,
    equal to, and much longer than the window."""
    from stock_market_data_pipeline_spark.llm.curation import (
        chunk_documents,
    )

    W, S = 8, 6
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(3))),     # < W: 1 chunk
         (2, " ".join(f"t{i}" for i in range(8))),     # == W: 1 chunk
         (3, " ".join(f"t{i}" for i in range(9))),     # W+1: 2 chunks
         (4, " ".join(f"t{i}" for i in range(25)))],   # long: several
        "doc_id bigint, text string")
    out = chunk_documents(docs, window=W, stride=S).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 1 and by_doc[1][0]["n_tokens"] == 3
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_tokens"] == 8
    assert len(by_doc[3]) == 2
    # chunks = 1 + ceil((25-8)/6) = 1 + 3 = 4
    assert len(by_doc[4]) == 4
    for doc_id, n_total in [(3, 9), (4, 25)]:
        chunks = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        seen = []
        for k, r in enumerate(chunks):
            toks = r["chunk_text"].split(" ")
            assert toks[0] == f"t{k * S}", "stride start"
            assert len(toks) == r["n_tokens"] <= W
            seen.extend(toks)
        assert set(seen) == {f"t{i}" for i in range(n_total)}, (
            "every token covered")
        # the final chunk reaches the end of the document
        assert chunks[-1]["chunk_text"].split(" ")[-1] == \
            f"t{n_total - 1}"
