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


def _decode(payload: bytes, codec: str = "fake") -> "object":
    """Decode a payload to a 1-D uint8 sample array.

    ``fake`` treats the raw bytes as pixels/samples — deterministic and
    codec-free. Real codecs are intentionally unimplemented in this
    container (no PIL/ffmpeg); the call site and batch plumbing are
    identical when they exist.
    """
    import numpy as np

    if codec == "fake":
        return np.frombuffer(payload, dtype=np.uint8)
    raise NotImplementedError(
        f"codec {codec!r}: real media decoding needs image/audio libs "
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
