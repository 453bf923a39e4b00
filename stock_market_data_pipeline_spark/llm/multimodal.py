"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted through Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so ``decode`` ships a
deterministic fake (byte-level "pixels") and a clearly marked
``NotImplementedError`` path for real codecs — the Spark-side plumbing
(binary column, metadata struct, Arrow batch shape, output schema,
partition behavior) is real and tested.

Scale design:
- payloads stay opaque ``binary`` cells; Spark shuffles/stores them
  without Python round-trips until the single mapInPandas stage;
- mapInPandas streams Arrow record batches (bounded by
  spark.sql.execution.arrow.maxRecordsPerBatch), so executor memory
  is batch-bounded regardless of corpus size — the pattern a real
  decode/resize/frame-sample stage uses at 100 TB;
- feature extraction is embarrassingly parallel: no shuffle at all.

Reference parity note: the reference has no multimodal surface; this
is the north-star extension (BASELINE.json) — cite-level analog is the
pandas normalization stage shape of src/load.py:36-76 (column-wise
driver pandas), here distributed as executor-side Arrow batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

#: schema of the multimodal payload table (what an ingest job writes)
PAYLOAD_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("modality", StringType()),
    StructField("payload", BinaryType()),
    StructField("meta_width", IntegerType()),
    StructField("meta_height", IntegerType()),
    StructField("meta_channels", IntegerType()),
])

#: schema produced by extract_features
FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("modality", StringType()),
    StructField("n_bytes", LongType()),
    StructField("byte_mean", DoubleType()),
    StructField("byte_std", DoubleType()),
    StructField("byte_min", IntegerType()),
    StructField("byte_max", IntegerType()),
    StructField("grid_means", ArrayType(DoubleType())),
])

GRID_CELLS = 16


def payload_table(docs: DataFrame) -> DataFrame:
    """Documents -> multimodal payload table: the text bytes stand in
    for an opaque media blob; metadata derives deterministically from
    doc_id (a real ingest records true dims at write time)."""
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video")).alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        (F.col("doc_id") % 64 + 16).cast("int").alias("meta_width"),
        (F.col("doc_id") % 48 + 16).cast("int").alias("meta_height"),
        F.lit(3).cast("int").alias("meta_channels"),
    )


def ppm_payload_table(docs: DataFrame) -> DataFrame:
    """Documents -> REAL binary-PPM (P6) payloads, built entirely with
    JVM-side column functions: header ``P6\\n{w} {h}\\n255\\n`` +
    exactly w*h*3 pixel bytes cycled from the doc text (``rpad`` with
    the string itself as pad = truncated infinite repeat — the same
    v(j) = text[j % len] stream the DuckDB oracle enumerates).
    Dimensions derive from doc_id so every header differs."""
    w = (F.col("doc_id") % 8 + 4).cast("int")
    h = (F.col("doc_id") % 6 + 4).cast("int")
    npix = (w * h * 3).cast("int")
    header = F.concat(F.lit("P6\n"), w.cast("string"), F.lit(" "),
                      h.cast("string"), F.lit("\n255\n"))
    # non-ASCII -> '?' so one char == one payload byte: rpad counts
    # CHARACTERS and the oracle walks substr/ascii, while the decoder
    # validates BYTE length — a multi-byte char would diverge the two
    # (the oracle mirrors this replace)
    ascii_text = F.regexp_replace("text", "[^\\x00-\\x7f]", "?")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.lit("image").alias("modality"),
        F.encode(F.concat(header, F.rpad(ascii_text, npix,
                                         ascii_text)),
                 "UTF-8").alias("payload"),
        w.alias("meta_width"), h.alias("meta_height"),
        F.lit(3).cast("int").alias("meta_channels"),
    )


def wav_payload_table(docs: DataFrame) -> DataFrame:
    """Documents -> REAL 16-bit PCM WAV payloads (stdlib ``wave``
    writer inside an Arrow-batched mapInPandas — container formats
    with binary length fields can't be built with string functions).
    Sample j is the little-endian int16 from text-byte pair
    (b(2j), b(2j+1)) cycled — SQL-expressible, so the decode path has
    a per-sample oracle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                # one char -> one byte, mirroring the oracle's
                # char-walk (non-ASCII becomes '?' on both sides)
                raw = text.encode("ascii", errors="replace")
                n_samples = int(doc_id) % 64 + 32
                idx = np.arange(n_samples * 2) % len(raw)
                pcm = np.frombuffer(raw, dtype=np.uint8)[idx] \
                    .astype(np.uint8).tobytes()
                buf = io.BytesIO()
                with wave.open(buf, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(8000)
                    wf.writeframes(pcm)
                rows.append({"doc_id": int(doc_id), "modality": "audio",
                             "payload": buf.getvalue(),
                             "meta_width": n_samples, "meta_height": 1,
                             "meta_channels": 1})
            yield pd.DataFrame(
                rows, columns=[f.name for f in PAYLOAD_SCHEMA])

    return (docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                        "text")
            .mapInPandas(batches, schema=PAYLOAD_SCHEMA))


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6): pick the neighbor (left,
    up, up-left) closest to the linear estimate a + b - c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_payload_table(docs: DataFrame) -> DataFrame:
    """Documents -> REAL 8-bit grayscale PNG payloads (stdlib only:
    ``zlib`` for the IDAT deflate stream and the chunk CRCs,
    ``struct`` for the big-endian chunk framing).  Pixel j is the
    cycled text byte v(j) = text[j % len] — the SAME SQL-enumerable
    stream as the PPM builder, so the decode path has a per-pixel
    oracle — but unlike PPM the bytes pass through a COMPRESSED
    container: scanline filtering (each row r uses filter type r % 5,
    exercising None/Sub/Up/Average/Paeth), zlib, CRC-framed chunks.
    Dimensions derive from doc_id so every IHDR differs."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        import numpy as np

        def chunk(tag: bytes, data: bytes) -> bytes:
            return (struct.pack(">I", len(data)) + tag + data
                    + struct.pack(">I", zlib.crc32(tag + data)))

        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = text.encode("ascii", errors="replace")
                w = int(doc_id) % 8 + 4
                h = int(doc_id) % 6 + 4
                idx = np.arange(w * h) % len(raw)
                px = np.frombuffer(raw, dtype=np.uint8)[idx] \
                    .reshape(h, w).astype(np.int64)
                scanlines = bytearray()
                for r in range(h):
                    f = r % 5
                    cur = px[r]
                    up = px[r - 1] if r else np.zeros(w, dtype=np.int64)
                    out = np.empty(w, dtype=np.int64)
                    for i in range(w):
                        left = cur[i - 1] if i else 0
                        ul = up[i - 1] if i else 0
                        pred = (0 if f == 0 else
                                left if f == 1 else
                                up[i] if f == 2 else
                                (left + up[i]) // 2 if f == 3 else
                                _paeth(int(left), int(up[i]), int(ul)))
                        out[i] = (int(cur[i]) - int(pred)) & 0xFF
                    scanlines.append(f)
                    scanlines.extend(out.astype(np.uint8).tobytes())
                ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
                payload = (b"\x89PNG\r\n\x1a\n"
                           + chunk(b"IHDR", ihdr)
                           + chunk(b"IDAT", zlib.compress(bytes(scanlines)))
                           + chunk(b"IEND", b""))
                rows.append({"doc_id": int(doc_id), "modality": "image",
                             "payload": payload,
                             "meta_width": w, "meta_height": h,
                             "meta_channels": 1})
            yield pd.DataFrame(
                rows, columns=[f.name for f in PAYLOAD_SCHEMA])

    return (docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                        "text")
            .mapInPandas(batches, schema=PAYLOAD_SCHEMA))


def _decode_png(payload: bytes) -> "object":
    """REAL image decode for 8-bit grayscale PNG — stdlib ``zlib``
    only, no PIL.  Validates the signature, walks the CRC-framed
    chunks (every CRC is VERIFIED — a corrupted container must fail
    loudly, not decode garbage), reads IHDR, inflates the
    concatenated IDAT stream, and reverses per-scanline filtering
    (all five filter types).  Returns the pixel array; the per-pixel
    oracle (mm_decode_png) proves filter reversal and inflate
    reproduced the exact source byte stream."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError(f"not a PNG: signature {payload[:8]!r}")
    pos, ihdr, idat = 8, None, bytearray()
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(tag + data) != crc:
            raise ValueError(f"PNG chunk {tag!r}: CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG without IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if (depth, color, comp, filt, interlace) != (8, 0, 0, 0, 0):
        raise ValueError(
            f"only 8-bit non-interlaced grayscale supported, got "
            f"depth={depth} color={color} interlace={interlace}")
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (w + 1):
        raise ValueError(
            f"IDAT inflates to {len(raw)}B != {h}x({w}+1)")
    out = np.zeros((h, w), dtype=np.int64)
    for r in range(h):
        line = raw[r * (w + 1):(r + 1) * (w + 1)]
        f, data = line[0], line[1:]
        prior = out[r - 1] if r else np.zeros(w, dtype=np.int64)
        for i in range(w):
            left = out[r, i - 1] if i else 0
            ul = prior[i - 1] if i else 0
            pred = (0 if f == 0 else
                    left if f == 1 else
                    prior[i] if f == 2 else
                    (left + prior[i]) // 2 if f == 3 else
                    _paeth(int(left), int(prior[i]), int(ul)))
            out[r, i] = (data[i] + int(pred)) & 0xFF
    return out.reshape(-1)


def _decode_ppm(payload: bytes) -> "object":
    """REAL image decode for binary PPM (P6) — stdlib-only, no PIL.

    Parses the three whitespace-delimited header tokens (magic, dims,
    maxval) byte-wise, validates the pixel section length against the
    declared dimensions, and returns the raw RGB samples. Any header
    off-by-one would shift every returned byte, so the per-byte oracle
    (mm_decode_ppm) proves the parser consumed EXACTLY the header."""
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError(f"not a P6 PPM: magic {payload[:2]!r}")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":          # comment line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1                                      # single ws after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM supported, maxval={maxval}")
    pixels = payload[pos:]
    if len(pixels) != width * height * 3:
        raise ValueError(
            f"PPM pixel section {len(pixels)}B != {width}x{height}x3")
    return np.frombuffer(pixels, dtype=np.uint8)


def _decode_wav(payload: bytes) -> "object":
    """REAL audio decode for 16-bit PCM WAV via the stdlib ``wave``
    module: returns the sample stream as int64 (features are computed
    over SAMPLES, not container bytes — byte-level stats would count
    the RIFF header)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(f"only 16-bit PCM, got {w.getsampwidth()*8}")
        frames = w.readframes(w.getnframes())
    return np.frombuffer(frames, dtype="<i2").astype(np.int64)


#: zigzag scan order for an 8x8 coefficient block (ITU T.81 Figure 5):
#: _ZIGZAG[k] = (row, col) of the k-th coefficient in scan order.
#: Parity per the spec (r9 ADVICE item 5): the scan moves RIGHT first,
#: so ODD diagonal sums run top-right -> bottom-left (index 1 is
#: (0, 1), then (1, 0)) and EVEN sums run bottom-left -> top-right —
#: the transpose of this table is NOT spec-conformant even though an
#: encoder/decoder pair sharing it roundtrips (the r9 bug: emitted
#: files rendered transposed AC detail in external decoders).
def _zigzag_order() -> list:
    order = []
    for s in range(15):
        diag = [(s - j, j) for j in range(s + 1)
                if 0 <= s - j < 8 and 0 <= j < 8]   # (s, 0) .. (0, s)
        order.extend(diag[::-1] if s % 2 else diag)
    return order


_ZIGZAG = _zigzag_order()

#: canonical Huffman tables for the baseline entropy coder.  JPEG's
#: DHT segment carries the table, so ANY legal table works — these are
#: fixed-length canonical codes (12 DC symbols at 4 bits, 162 AC
#: run/size symbols at 8 bits), generated rather than transcribed from
#: Annex K: simpler, impossible to mistype, and the all-ones code the
#: spec reserves is never assigned (12 < 15, 162 < 255).
_JPEG_DC_SYMS = list(range(12))
_JPEG_AC_SYMS = ([0x00, 0xF0]                      # EOB, ZRL
                 + [(r << 4) | s for r in range(16)
                    for s in range(1, 11)])


def _dct_matrix():
    import numpy as np

    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2
    c[0] /= np.sqrt(2)
    return c


def _jpeg_emit_block(app, zz: list, prev_dc: int,
                     dc_strs: list, ac_strs: dict) -> int:
    """Emit one quantized-zigzag block's DC-difference + AC run-length
    Huffman symbols (as bit strings via ``app``); returns the block's
    DC for the caller's per-component predictor.  Shared by the gray
    and the interleaved-color encoders."""
    diff = zz[0] - prev_dc
    s = int(diff).bit_length() if diff else 0
    app(dc_strs[s])
    if s:
        app(format(diff if diff >= 0
                   else diff + (1 << s) - 1, f"0{s}b"))
    run = 0
    zrl_str, eob_str = ac_strs[0xF0], ac_strs[0x00]
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run >= 16:
            app(zrl_str)                      # ZRL
            run -= 16
        s = v.bit_length() if v > 0 else (-v).bit_length()
        app(ac_strs[(run << 4) | s]
            + format(v if v >= 0 else v + (1 << s) - 1, f"0{s}b"))
        run = 0
    if last_nz < 63:
        app(eob_str)                          # EOB
    return zz[0]


def _jpeg_encode_gray(px, quant: int = 1) -> bytes:
    """Minimal-but-REAL baseline JFIF encoder for one 8-bit grayscale
    image whose dims are multiples of 8 (ITU T.81 baseline DCT):
    level shift, per-block 2-D DCT, uniform quantization (``quant``),
    zigzag, DC-difference + AC run-length Huffman coding with byte
    stuffing, framed as SOI/DQT/SOF0/DHT/SOS/EOI.  Exists so the
    DECODER has an entropy-coded container to prove itself against —
    the same builder-role the PNG/PPM/WAV writers play."""
    import struct

    import numpy as np

    h, w = px.shape
    assert h % 8 == 0 and w % 8 == 0
    C = _dct_matrix()
    # precomputed BIT STRINGS per symbol: emitting a symbol is one
    # string concat, not a format() call per code + per value
    dc_strs = [format(i, "04b") for i in range(len(_JPEG_DC_SYMS))]
    ac_strs = {s: format(i, "08b")
               for i, s in enumerate(_JPEG_AC_SYMS)}

    # bit writer: collect per-symbol bit strings, then one C-level
    # join + int() + to_bytes + stuffing pass at the end — no per-bit
    # or per-8-bit Python flush loop, and no quadratic big-int growth
    parts: list[str] = []
    prev_dc = 0
    shifted = px.astype(np.float64) - 128.0
    # ALL blocks transformed/quantized in one einsum (C @ b @ C.T per
    # block), zigzagged by one fancy-index + tolist — per-element
    # numpy scalar reads in a Python loop were the encoder's real cost
    blocks = (shifted.reshape(h // 8, 8, w // 8, 8)
              .transpose(0, 2, 1, 3).reshape(-1, 8, 8))
    coefs = np.einsum("ij,njk,lk->nil", C, blocks, C)
    qblocks = np.clip(np.rint(coefs / quant), -1023, 1023) \
        .astype(np.int64)                     # AC category <= 10
    zz_idx = [r * 8 + c_ for r, c_ in _ZIGZAG]
    app = parts.append
    for zz in qblocks.reshape(-1, 64)[:, zz_idx].tolist():
        prev_dc = _jpeg_emit_block(app, zz, prev_dc, dc_strs, ac_strs)
    bitstr = "".join(parts)
    pad = (-len(bitstr)) % 8
    bitstr += "1" * pad                       # spec: pad with 1-bits
    raw = int(bitstr, 2).to_bytes(len(bitstr) // 8, "big") \
        if bitstr else b""
    bits = raw.replace(b"\xff", b"\xff\x00")  # byte stuffing, one pass

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    dqt = seg(0xFFDB, bytes([0]) + bytes([quant] * 64))
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1)
              + bytes([1, 0x11, 0]))
    dht_dc = seg(0xFFC4, bytes([0x00])
                 + bytes(12 if i == 3 else 0 for i in range(16))
                 + bytes(_JPEG_DC_SYMS))
    dht_ac = seg(0xFFC4, bytes([0x10])
                 + bytes(162 if i == 7 else 0 for i in range(16))
                 + bytes(_JPEG_AC_SYMS))
    sos = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos
            + bytes(bits) + b"\xff\xd9")


#: JFIF YCbCr <-> RGB (ITU T.871) coefficient sets, shared by the
#: color encoder and decoder so the roundtrip error is pure codec
_YCC_FWD = ((0.299, 0.587, 0.114),
            (-0.168736, -0.331264, 0.5),
            (0.5, -0.418688, -0.081312))


def _jpeg_encode_color(rgb, quant: int = 1,
                       chroma_quant: int = 2) -> bytes:
    """REAL baseline JFIF COLOR encoder (ITU T.81/T.871): RGB ->
    YCbCr, 4:2:0 chroma subsampling (2x2 mean), per-component quant
    tables (id 0 luma / id 1 chroma), and the interleaved MCU scan
    the grayscale path never exercises — each 16x16 MCU emits four Y
    blocks then Cb then Cr, with independent per-component DC
    predictors.  Dims must be multiples of 16 (one full MCU grid)."""
    import struct

    import numpy as np

    h, w, _ = rgb.shape
    assert h % 16 == 0 and w % 16 == 0
    f = rgb.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    (a1, a2, a3), (b1, b2, b3), (c1, c2, c3) = _YCC_FWD
    y = a1 * r + a2 * g + a3 * b
    cb = b1 * r + b2 * g + b3 * b + 128.0
    cr = c1 * r + c2 * g + c3 * b + 128.0
    cb2 = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    cr2 = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    C = _dct_matrix()
    zz_idx = [rr * 8 + cc for rr, cc in _ZIGZAG]

    def plane_zz(p, q):
        hh, ww = p.shape
        blocks = ((p - 128.0).reshape(hh // 8, 8, ww // 8, 8)
                  .transpose(0, 2, 1, 3).reshape(-1, 8, 8))
        coefs = np.einsum("ij,njk,lk->nil", C, blocks, C)
        qb = np.clip(np.rint(coefs / q), -1023, 1023).astype(np.int64)
        return (qb.reshape(-1, 64)[:, zz_idx]
                .reshape(hh // 8, ww // 8, 64))

    yz = plane_zz(y, quant)
    cbz = plane_zz(cb2, chroma_quant)
    crz = plane_zz(cr2, chroma_quant)
    dc_strs = [format(i, "04b") for i in range(len(_JPEG_DC_SYMS))]
    ac_strs = {s: format(i, "08b")
               for i, s in enumerate(_JPEG_AC_SYMS)}
    parts: list[str] = []
    app = parts.append
    prev = {1: 0, 2: 0, 3: 0}
    for my in range(h // 16):
        for mx in range(w // 16):
            for v, h_ in ((0, 0), (0, 1), (1, 0), (1, 1)):
                prev[1] = _jpeg_emit_block(
                    app, yz[my * 2 + v, mx * 2 + h_].tolist(),
                    prev[1], dc_strs, ac_strs)
            prev[2] = _jpeg_emit_block(app, cbz[my, mx].tolist(),
                                       prev[2], dc_strs, ac_strs)
            prev[3] = _jpeg_emit_block(app, crz[my, mx].tolist(),
                                       prev[3], dc_strs, ac_strs)
    bitstr = "".join(parts)
    pad = (-len(bitstr)) % 8
    bitstr += "1" * pad
    raw = int(bitstr, 2).to_bytes(len(bitstr) // 8, "big") \
        if bitstr else b""
    bits = raw.replace(b"\xff", b"\xff\x00")

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    dqt = seg(0xFFDB, bytes([0x00]) + bytes([quant] * 64)
              + bytes([0x01]) + bytes([chroma_quant] * 64))
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 3)
              + bytes([1, 0x22, 0])          # Y: 2x2 sampling, qt 0
              + bytes([2, 0x11, 1])          # Cb: 1x1, qt 1
              + bytes([3, 0x11, 1]))         # Cr: 1x1, qt 1
    dht_dc = seg(0xFFC4, bytes([0x00])
                 + bytes(12 if i == 3 else 0 for i in range(16))
                 + bytes(_JPEG_DC_SYMS))
    dht_ac = seg(0xFFC4, bytes([0x10])
                 + bytes(162 if i == 7 else 0 for i in range(16))
                 + bytes(_JPEG_AC_SYMS))
    sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    return (b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos
            + bytes(bits) + b"\xff\xd9")


def _decode_jpeg(payload: bytes) -> "object":
    """REAL baseline JPEG decode (ITU T.81 baseline DCT, 8-bit
    grayscale, single scan) — stdlib/numpy only, no PIL: marker walk,
    DQT/SOF0/DHT/SOS parse, Huffman entropy decode (tables built from
    the DHT segment's canonical bits/values — NOT assumed), byte
    destuffing, DC prediction, dequantization, dezigzag, 2-D IDCT,
    level shift and clamp.  This is the entropy-coded codec class the
    PNG path (zlib) doesn't exercise.  Lossy by nature: the roundtrip
    oracle checks per-pixel error within IDCT rounding tolerance
    (mm_decode_jpeg), unlike the exact PPM/PNG/WAV oracles."""
    import struct

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError(f"not a JPEG: {payload[:2]!r}")
    pos, dims, huff = 2, None, {}
    qtabs: dict[int, "np.ndarray"] = {}
    comps = scan = data = None
    while pos < len(payload):
        (marker,) = struct.unpack(">H", payload[pos:pos + 2])
        if marker == 0xFFD9:
            break
        if len(payload) < pos + 4:
            raise ValueError("truncated JPEG: marker without length")
        (ln,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        body = payload[pos + 4:pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError(
                f"truncated JPEG segment {marker:#06x}: declared "
                f"{ln - 2}B, {len(body)}B present")
        pos += 2 + ln
        if marker == 0xFFDB:
            i = 0
            while i < len(body):      # a DQT may carry several tables
                if body[i] & 0xF0:
                    raise ValueError("only 8-bit quant tables supported")
                qtabs[body[i] & 0x0F] = np.array(
                    list(body[i + 1:i + 65]), dtype=np.int64)
                i += 65
        elif marker == 0xFFC0:
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8 or ncomp not in (1, 3):
                raise ValueError(
                    f"only 8-bit baseline with 1 (grayscale) or 3 "
                    f"(YCbCr) components, got precision={prec} "
                    f"components={ncomp}")
            comps = []
            for ci in range(ncomp):
                cid, samp, qid = body[6 + 3 * ci:9 + 3 * ci]
                comps.append((cid, samp >> 4, samp & 0x0F, qid))
            dims = (h, w)
        elif marker == 0xFFC4:
            i = 0
            while i < len(body):      # a DHT may carry several tables
                tclass, tid = body[i] >> 4, body[i] & 0x0F
                counts = list(body[i + 1:i + 17])
                nsym = sum(counts)
                syms = list(body[i + 17:i + 17 + nsym])
                # canonical table grouped BY CODE LENGTH: decode peeks
                # one whole length-group at a time (one int() per
                # group, not one dict probe per bit)
                table: dict[int, dict[int, int]] = {}
                code, j = 0, 0
                for bit_len in range(1, 17):
                    if counts[bit_len - 1]:
                        group = table.setdefault(bit_len, {})
                        for _ in range(counts[bit_len - 1]):
                            group[code] = syms[j]
                            code += 1
                            j += 1
                    code <<= 1
                huff[(tclass, tid)] = sorted(table.items())
                i += 17 + nsym
        elif marker == 0xFFDA:
            ns = body[0]
            scan = {}
            for ci in range(ns):
                cid, sel = body[1 + 2 * ci], body[2 + 2 * ci]
                scan[cid] = (sel >> 4, sel & 0x0F)
            data = payload[pos:]
            break
    if (not qtabs or dims is None or comps is None or scan is None
            or not any(k[0] == 0 for k in huff)
            or not any(k[0] == 1 for k in huff)):
        raise ValueError("missing DQT/SOF0/DHT/SOS")
    for cid, _, _, qid in comps:
        if qid not in qtabs or cid not in scan:
            raise ValueError(
                f"component {cid} references missing quant table or "
                f"scan selector")
        dc_t, ac_t = scan[cid]
        if (0, dc_t) not in huff or (1, ac_t) not in huff:
            raise ValueError(
                f"component {cid} references missing Huffman table")
    h, w = dims

    # bit reader with byte destuffing, stopping at EOI.  The destuffed
    # stream is expanded ONCE to a '0'/'1' string: every read is then a
    # slice + int(s, 2) — C-speed — instead of a Python-loop bit walk
    # (measured ~5x on the roundtrip entry, which is pure codec CPU).
    stream = bytearray()
    i = 0
    while i < len(data):
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < len(data) else 0xD9
            if nxt == 0x00:
                stream.append(0xFF)
                i += 2
                continue
            break                               # a real marker (EOI)
        stream.append(b)
        i += 1
    nbits = len(stream) * 8
    bits = (bin(int.from_bytes(bytes(stream), "big"))[2:].zfill(nbits)
            if stream else "")
    bitpos = 0

    def read_huff(tbl) -> int:
        nonlocal bitpos
        for bit_len, group in tbl:
            code = int(bits[bitpos:bitpos + bit_len], 2)
            sym = group.get(code)
            if sym is not None:
                bitpos += bit_len
                return sym
        raise ValueError("invalid Huffman code (corrupt stream)")

    def read_val(size: int) -> int:
        nonlocal bitpos
        if not size:
            return 0
        v = int(bits[bitpos:bitpos + size], 2)
        bitpos += size
        return v if v >= (1 << (size - 1)) else v - (1 << size) + 1

    C = _dct_matrix()
    zz_flat = [r * 8 + c for r, c in _ZIGZAG]
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    mcus_x = -(-w // (hmax * 8))
    mcus_y = -(-h // (vmax * 8))
    planes = {cid: np.zeros((mcus_y * vs * 8, mcus_x * hs * 8),
                            dtype=np.int64)
              for cid, hs, vs, _ in comps}
    prev_dc = {cid: 0 for cid, _, _, _ in comps}

    def decode_block(dc_tbl, ac_tbl, q, prev: int):
        coef = np.zeros(64, dtype=np.int64)
        s = read_huff(dc_tbl)
        dc = prev + read_val(s)               # DC prediction
        coef[0] = dc
        k = 1
        while k < 64:
            sym = read_huff(ac_tbl)
            if sym == 0x00:                     # EOB
                break
            if sym == 0xF0:                     # ZRL
                k += 16
                continue
            k += sym >> 4
            if k > 63:
                raise ValueError("AC run past block end")
            coef[k] = read_val(sym & 0x0F)
            k += 1
        deq = np.zeros(64, dtype=np.float64)
        deq[zz_flat] = coef * q
        return dc, C.T @ deq.reshape(8, 8) @ C + 128.0

    # the scan is MCU-interleaved in SOF component order (T.81 A.2.3;
    # with one component this degenerates to the plain block raster)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for cid, hs, vs, qid in comps:
                dc_tbl = huff[(0, scan[cid][0])]
                ac_tbl = huff[(1, scan[cid][1])]
                q = qtabs[qid]
                for v in range(vs):
                    for h_ in range(hs):
                        prev_dc[cid], block = decode_block(
                            dc_tbl, ac_tbl, q, prev_dc[cid])
                        by = (my * vs + v) * 8
                        bx = (mx * hs + h_) * 8
                        planes[cid][by:by + 8, bx:bx + 8] = np.clip(
                            np.rint(block), 0, 255).astype(np.int64)

    def comp_plane(cid, hs, vs):
        cw = -(-w * hs // hmax)
        ch = -(-h * vs // vmax)
        p = planes[cid][:ch, :cw]
        if hs != hmax or vs != vmax:
            if hmax % hs or vmax % vs:
                raise ValueError(
                    f"unsupported sampling ratio {hs}x{vs} vs "
                    f"{hmax}x{vmax}")
            p = p.repeat(vmax // vs, axis=0).repeat(hmax // hs, axis=1)
        return p[:h, :w].astype(np.float64)

    if len(comps) == 1:
        cid, hs, vs, _ = comps[0]
        return comp_plane(cid, hs, vs).astype(np.int64).reshape(-1)
    (yid, yh, yv, _), (cbid, ch_, cv, _), (crid, rh, rv, _) = comps
    y = comp_plane(yid, yh, yv)
    cb = comp_plane(cbid, ch_, cv) - 128.0
    cr = comp_plane(crid, rh, rv) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.int64).reshape(-1)


def jpeg_payload_table(docs: DataFrame) -> DataFrame:
    """Documents -> REAL baseline JPEG payloads (grayscale, dims
    multiples of 8 derived from doc_id, pixel j = cycled text byte
    v(j) — the same SQL-enumerable stream as the PPM/PNG builders, so
    the roundtrip has a known source to measure error against)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = text.encode("ascii", errors="replace")
                w = (int(doc_id) % 3 + 2) * 8
                h = (int(doc_id) % 2 + 2) * 8
                idx = np.arange(w * h) % len(raw)
                px = np.frombuffer(raw, dtype=np.uint8)[idx] \
                    .reshape(h, w)
                rows.append({"doc_id": int(doc_id), "modality": "image",
                             "payload": _jpeg_encode_gray(px),
                             "meta_width": w, "meta_height": h,
                             "meta_channels": 1})
            yield pd.DataFrame(
                rows, columns=[f.name for f in PAYLOAD_SCHEMA])

    return (docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                        "text")
            .mapInPandas(batches, schema=PAYLOAD_SCHEMA))


#: max tolerated |decoded - source| per pixel for the quant=1
#: roundtrip: quantization rounds each of 64 float coefficients by
#: <= 0.5, the IDCT folds those into <= a few counts of pixel error,
#: plus the final integer rounding.  Measured max on the synthetic
#: corpus is 1; 4 leaves headroom without letting a real defect
#: (filter desync, wrong dequant, DC drift) hide — those move pixels
#: by tens to hundreds.
JPEG_TOL = 4


def jpeg_roundtrip_report(docs: DataFrame) -> DataFrame:
    """Per-doc JPEG encode->decode roundtrip report: dims, decoded
    pixel count, and the max |decoded - source| error — Arrow-batched
    end-to-end (encode and decode both run inside the task; nothing
    driver-side)."""
    schema = ("doc_id long, modality string, meta_width int, "
              "meta_height int, n_pixels long, max_abs_err long")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = text.encode("ascii", errors="replace")
                w = (int(doc_id) % 3 + 2) * 8
                h = (int(doc_id) % 2 + 2) * 8
                idx = np.arange(w * h) % len(raw)
                px = np.frombuffer(raw, dtype=np.uint8)[idx] \
                    .reshape(h, w)
                decoded = _decode_jpeg(_jpeg_encode_gray(px))
                err = int(np.abs(decoded
                                 - px.reshape(-1).astype(np.int64)).max())
                rows.append({"doc_id": int(doc_id), "modality": "image",
                             "meta_width": w, "meta_height": h,
                             "n_pixels": int(decoded.size),
                             "max_abs_err": err})
            yield pd.DataFrame(rows, columns=[
                "doc_id", "modality", "meta_width", "meta_height",
                "n_pixels", "max_abs_err"])

    # codec work is pure CPU at milliseconds/doc: a single-file corpus
    # arrives as ONE input split, which would run the whole roundtrip
    # SERIAL inside one task (measured: 259 s for 50k docs at sf1 —
    # ~exactly the serial per-doc cost).  Repartition to the session's
    # parallelism first; this is THE lesson for every per-row-expensive
    # mapInPandas stage at 100 TB: partition count, not codec
    # micro-optimization, is the first-order term.
    spark = docs.sparkSession
    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    return (docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                        "text")
            .repartition(n_parts)
            .mapInPandas(batches, schema=schema))


#: color-roundtrip tolerance: the fixture is chroma-SMOOTH (one Cb/Cr
#: per 2x2 pixel block, ranges chosen so the RGB construction never
#: clips), so 4:2:0 subsampling loses nothing by construction and the
#: measured error is pure codec (two quantization/IDCT passes + two
#: color conversions).  Measured max on the synthetic corpus is 5;
#: 8 leaves headroom while still catching real defects (an MCU
#: interleave or upsample bug shears whole blocks, error in the
#: hundreds).
JPEG_COLOR_TOL = 8


def jpeg_color_roundtrip_report(docs: DataFrame) -> DataFrame:
    """Per-doc COLOR JPEG encode->decode roundtrip (ITU T.81 baseline
    + T.871 YCbCr, 4:2:0): dims, decoded sample count (w*h*3 RGB) and
    max |decoded - source|.  The fixture derives a chroma-smooth RGB
    image from the text bytes (luma varies per pixel, chroma per 2x2
    block, ranges clip-free), so subsampling is exactly invertible and
    the tolerance gate measures the CODEC — the interleaved-MCU scan,
    per-component DC predictors, dual quant tables and chroma
    upsampling the grayscale path never exercises."""
    schema = ("doc_id long, modality string, meta_width int, "
              "meta_height int, n_pixels long, max_abs_err long")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = np.frombuffer(
                    text.encode("ascii", errors="replace"),
                    dtype=np.uint8).astype(np.float64)
                n = len(raw)
                w = (int(doc_id) % 2 + 1) * 16
                h = (int(doc_id) % 3 + 1) * 16
                y = (80 + raw[np.arange(h * w) % n] % 97) \
                    .reshape(h, w)
                nsub = (h // 2) * (w // 2)
                cb = np.repeat(np.repeat(
                    (112 + raw[(np.arange(nsub) + 13) % n] % 33)
                    .reshape(h // 2, w // 2), 2, 0), 2, 1)
                cr = np.repeat(np.repeat(
                    (112 + raw[(np.arange(nsub) + 29) % n] % 33)
                    .reshape(h // 2, w // 2), 2, 0), 2, 1)
                r = y + 1.402 * (cr - 128)
                g = (y - 0.344136 * (cb - 128)
                     - 0.714136 * (cr - 128))
                b = y + 1.772 * (cb - 128)
                rgb = np.rint(np.stack([r, g, b], -1)) \
                    .astype(np.uint8)
                decoded = _decode_jpeg(_jpeg_encode_color(rgb))
                err = int(np.abs(
                    decoded - rgb.reshape(-1).astype(np.int64)).max())
                rows.append({"doc_id": int(doc_id),
                             "modality": "image",
                             "meta_width": w, "meta_height": h,
                             "n_pixels": int(decoded.size),
                             "max_abs_err": err})
            yield pd.DataFrame(rows, columns=[
                "doc_id", "modality", "meta_width", "meta_height",
                "n_pixels", "max_abs_err"])

    spark = docs.sparkSession
    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    return (docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                        "text")
            .repartition(n_parts)
            .mapInPandas(batches, schema=schema))


def _decode(payload: bytes, codec: str = "fake") -> "object":
    """Decode a payload to a 1-D sample array.

    ``fake`` treats the raw bytes as pixels/samples — deterministic and
    codec-free. ``ppm``, ``png``, ``jpeg`` and ``wav`` are REAL
    stdlib/numpy-only decoders (binary PPM header parse;
    zlib-inflated, CRC-checked, unfiltered grayscale PNG;
    entropy-coded baseline-DCT grayscale JPEG; RIFF/wave 16-bit PCM).
    Codecs needing non-stdlib libs (MP3/video — no ffmpeg in this
    container) stay intentionally unimplemented; their call site and
    Arrow batch plumbing are identical.
    """
    import numpy as np

    if codec == "fake":
        return np.frombuffer(payload, dtype=np.uint8)
    if codec == "ppm":
        return _decode_ppm(payload)
    if codec == "png":
        return _decode_png(payload)
    if codec == "jpeg":
        return _decode_jpeg(payload)
    if codec == "wav":
        return _decode_wav(payload)
    raise NotImplementedError(
        f"codec {codec!r}: real media decoding needs audio/video libs "
        "not present in this environment; plug a decoder in here")


def extract_features(payloads: DataFrame, codec: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Per payload: byte stats + GRID_CELLS equal-width segment means (the
    'resize to fixed grid' shape of an image featurizer). Pure numpy
    per batch; deterministic for the fake codec.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np

        for pdf in it:
            rows = []
            for doc_id, modality, payload in zip(
                    pdf["doc_id"], pdf["modality"], pdf["payload"]):
                arr = _decode(bytes(payload), codec).astype(np.int64)
                n = int(arr.size)
                # all statistics flow through EXACT integer moments
                # (Σx, Σx²): the derived doubles are then single
                # correctly-rounded operations on exactly-representable
                # integers, so any engine computing the same moments
                # (e.g. the DuckDB oracle) reproduces them bit-for-bit
                # — SURVEY §8.6 determinism rules.
                s = int(arr.sum())
                ssq = int((arr * arr).sum())
                # fixed-cell segment means ~ resize-to-grid; cell(j) =
                # j*G//n, the standard integer bucketing (invertible in
                # SQL as (j*G)//n, unlike linspace bounds)
                cells = (np.arange(n) * GRID_CELLS) // max(n, 1)
                grid = []
                for i in range(GRID_CELLS):
                    seg = arr[cells == i]
                    grid.append(float(int(seg.sum()) / seg.size)
                                if seg.size else 0.0)
                rows.append({
                    "doc_id": doc_id,
                    "modality": modality,
                    "n_bytes": n,
                    "byte_mean": s / n if n else 0.0,
                    "byte_std": (math.sqrt(n * ssq - s * s) / n
                                 if n else 0.0),
                    "byte_min": int(arr.min()) if n else 0,
                    "byte_max": int(arr.max()) if n else 0,
                    "grid_means": grid,
                })
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA])

    return payloads.mapInPandas(batches, schema=FEATURE_SCHEMA)
