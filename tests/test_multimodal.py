

def test_jpeg_roundtrip_within_tolerance():
    """Baseline JPEG codec (encoder + decoder, stdlib/numpy): random
    8-bit noise roundtrips within the IDCT rounding tolerance; a flat
    image (DC-only blocks) roundtrips EXACTLY; dims survive."""
    import numpy as np

    from stock_market_data_pipeline_spark.llm.multimodal import (
        JPEG_TOL,
        _decode_jpeg,
        _jpeg_encode_gray,
    )

    rng = np.random.default_rng(11)
    for _ in range(5):
        h, w = 8 * int(rng.integers(1, 4)), 8 * int(rng.integers(1, 5))
        px = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
        dec = _decode_jpeg(_jpeg_encode_gray(px))
        assert dec.size == h * w
        assert np.abs(dec - px.reshape(-1).astype(np.int64)).max() \
            <= JPEG_TOL
    flat = np.full((16, 24), 201, dtype=np.uint8)
    assert (_decode_jpeg(_jpeg_encode_gray(flat)) == 201).all()


def test_jpeg_corrupt_stream_fails_loudly():
    """A truncated entropy segment or a wrong magic must raise, not
    decode garbage."""
    import numpy as np
    import pytest

    from stock_market_data_pipeline_spark.llm.multimodal import (
        _decode_jpeg,
        _jpeg_encode_gray,
    )

    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    blob = _jpeg_encode_gray(px)
    with pytest.raises(ValueError, match="not a JPEG"):
        _decode_jpeg(b"PK" + blob[2:])
    # drop the DHT segments: decoder must refuse, not guess tables
    import struct
    pos, out = 2, bytearray(blob[:2])
    while pos < len(blob):
        (marker,) = struct.unpack(">H", blob[pos:pos + 2])
        if marker == 0xFFDA:
            out += blob[pos:]
            break
        (ln,) = struct.unpack(">H", blob[pos + 2:pos + 4])
        if marker != 0xFFC4:
            out += blob[pos:pos + 2 + ln]
        pos += 2 + ln
    with pytest.raises(ValueError, match="missing"):
        _decode_jpeg(bytes(out))


def test_jpeg_spark_roundtrip_report(spark):
    """The Arrow-batched end-to-end report over real documents: every
    doc decodes to its declared pixel count within tolerance."""
    from tests.conftest import SF_SMALL

    from stock_market_data_pipeline_spark.llm.multimodal import (
        JPEG_TOL,
        jpeg_roundtrip_report,
    )

    docs = spark.read.parquet(SF_SMALL + "/documents.parquet").limit(40)
    rep = jpeg_roundtrip_report(docs)
    rows = rep.collect()
    assert len(rows) == 40
    for r in rows:
        assert r.n_pixels == r.meta_width * r.meta_height
        assert r.max_abs_err <= JPEG_TOL


def test_zigzag_matches_itu_t81_known_vector():
    """Interop anchor (r9 ADVICE item 5): the scan order is pinned to
    ITU T.81 Figure 5 itself, not merely to 'whatever the encoder and
    decoder share' — the r9 table was the spec's TRANSPOSE, which
    roundtripped in-repo while emitting files external decoders render
    with transposed AC detail.  The first diagonals move RIGHT first
    ((0,0) -> (0,1) -> (1,0) -> (2,0) -> (1,1) -> (0,2) ...), and the
    flat row-major permutation equals the widely-published table."""
    from stock_market_data_pipeline_spark.llm.multimodal import _ZIGZAG

    assert _ZIGZAG[:10] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
        (0, 2), (0, 3), (1, 2), (2, 1), (3, 0)]
    assert _ZIGZAG[-3:] == [(6, 7), (7, 6), (7, 7)]
    # the standard flat form: position of row-major coefficient r*8+c
    # in scan order (ITU T.81 / libjpeg's jpeg_natural_order inverse)
    flat = [0] * 64
    for k, (r, c) in enumerate(_ZIGZAG):
        flat[r * 8 + c] = k
    assert flat == [
        0,  1,  5,  6,  14, 15, 27, 28,
        2,  4,  7,  13, 16, 26, 29, 42,
        3,  8,  12, 17, 25, 30, 41, 43,
        9,  11, 18, 24, 31, 40, 44, 53,
        10, 19, 23, 32, 39, 45, 52, 54,
        20, 22, 33, 38, 46, 51, 55, 60,
        21, 34, 37, 47, 50, 56, 59, 61,
        35, 36, 48, 49, 57, 58, 62, 63]
    assert sorted(flat) == list(range(64))


def test_jpeg_color_roundtrip_and_structure():
    """Color baseline JPEG: the emitted container really is 3-component
    4:2:0 (SOF says so), the decoder reconstructs within the pure-codec
    tolerance on a chroma-smooth image, and grayscale files still
    decode unchanged through the generalized path."""
    import struct

    import numpy as np

    from stock_market_data_pipeline_spark.llm.multimodal import (
        JPEG_COLOR_TOL,
        _decode_jpeg,
        _jpeg_encode_color,
        _jpeg_encode_gray,
    )

    rng = np.random.default_rng(11)
    h, w = 48, 32
    y = rng.integers(80, 177, size=(h, w)).astype(np.float64)
    cb = np.repeat(np.repeat(rng.integers(112, 145, size=(h // 2, w // 2))
                             .astype(np.float64), 2, 0), 2, 1)
    cr = np.repeat(np.repeat(rng.integers(112, 145, size=(h // 2, w // 2))
                             .astype(np.float64), 2, 0), 2, 1)
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    rgb = np.rint(np.stack([r, g, b], -1)).astype(np.uint8)
    blob = _jpeg_encode_color(rgb)
    # SOF0 declares 3 components with 2x2 luma sampling
    pos = 2
    sof = None
    while pos < len(blob):
        (marker,) = struct.unpack(">H", blob[pos:pos + 2])
        (ln,) = struct.unpack(">H", blob[pos + 2:pos + 4])
        if marker == 0xFFC0:
            sof = blob[pos + 4:pos + 2 + ln]
            break
        pos += 2 + ln
    prec, hh, ww, ncomp = struct.unpack(">BHHB", sof[:6])
    assert (prec, hh, ww, ncomp) == (8, h, w, 3)
    assert sof[6:9] == bytes([1, 0x22, 0])        # Y 2x2, quant 0
    assert sof[9:12] == bytes([2, 0x11, 1])       # Cb 1x1, quant 1
    dec = _decode_jpeg(blob)
    assert dec.size == h * w * 3
    err = int(np.abs(dec - rgb.reshape(-1).astype(np.int64)).max())
    assert err <= JPEG_COLOR_TOL, err
    # grayscale unchanged through the generalized decoder
    px = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    gdec = _decode_jpeg(_jpeg_encode_gray(px))
    assert gdec.size == 256
    assert int(np.abs(gdec - px.reshape(-1).astype(np.int64)).max()) <= 4


def test_jpeg_color_spark_report(spark):
    from pyspark.sql import functions as F

    from stock_market_data_pipeline_spark.llm.multimodal import (
        JPEG_COLOR_TOL,
        jpeg_color_roundtrip_report,
    )

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .limit(40))
    rep = jpeg_color_roundtrip_report(docs)
    rows = rep.collect()
    assert len(rows) == 40
    assert all(r["n_pixels"] == r["meta_width"] * r["meta_height"] * 3
               for r in rows)
    assert rep.agg(F.max("max_abs_err")).first()[0] <= JPEG_COLOR_TOL
