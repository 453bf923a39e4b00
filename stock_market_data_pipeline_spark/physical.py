"""Parquet physical-layout detection + loud schema-drift assertions.

Round-5 lesson: the test-data generator regenerated the events table
with ``ts`` as TIMESTAMP(MICROS) where it had been TIMESTAMP(NANOS);
readers that hard-coded the old layout (explicit ``ts BIGINT`` schema +
``div 1000``) silently compressed every timestamp 1000x and returned
*wrong answers* instead of errors. Readers now sniff the parquet footer
(one pyarrow footer read, driver-side — no Spark job) and branch on the
observed physical type; any layout this engine does NOT know how to
read exactly raises :class:`SchemaDriftError` naming observed vs
expected types. Wrong answers are never the failure mode again.

The reference pipeline pins its physical layout at the warehouse level
(Snowflake DDL, src/extract_load_stocks.py CREATE TABLE); an engine
reading third-party parquet has no such guarantee, so the layout check
lives at the read boundary instead.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class SchemaDriftError(RuntimeError):
    """A table's physical parquet layout is not one this engine knows
    how to read exactly. Raised at read time instead of silently
    mis-scaling values."""


def _one_parquet_file(path: str) -> str:
    """``path`` may be a single parquet file or a directory of them
    (a staged streaming source); return one footer-readable file."""
    if os.path.isfile(path):
        return path
    if os.path.isdir(path):
        for f in sorted(os.listdir(path)):
            if f.endswith(".parquet"):
                return os.path.join(path, f)
    raise SchemaDriftError(f"no parquet file found at {path!r}")


def arrow_types(path: str) -> dict[str, str]:
    """Column name -> arrow type string from the parquet footer(s).
    A directory source (staged streaming dir) is checked for footer
    HOMOGENEITY rather than assumed: footer reads are driver-side and
    cheap, and a mixed-layout dir read under one file's DDL would be
    exactly the silent mis-read this module exists to prevent."""
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(".parquet"))
        if not files:
            raise SchemaDriftError(f"no parquet file found at {path!r}")
        first = {f.name: str(f.type) for f in pq.read_schema(files[0])}
        for other in files[1:]:
            got = {f.name: str(f.type) for f in pq.read_schema(other)}
            if got != first:
                drift = {k: (first.get(k), got.get(k))
                         for k in set(first) | set(got)
                         if first.get(k) != got.get(k)}
                raise SchemaDriftError(
                    f"{path}: mixed physical layouts within one "
                    f"directory source — {os.path.basename(files[0])} "
                    f"vs {os.path.basename(other)} differ on {drift}")
        return first
    schema = pq.read_schema(_one_parquet_file(path))
    return {field.name: str(field.type) for field in schema}


def assert_columns(path: str, expected: dict[str, set[str]]) -> dict[str, str]:
    """Assert every column in ``expected`` exists in ``path``'s footer
    with one of the allowed arrow types. Returns the observed mapping;
    raises :class:`SchemaDriftError` naming every drifted column."""
    observed = arrow_types(path)
    bad = {
        col: (observed.get(col), sorted(allowed))
        for col, allowed in expected.items()
        if observed.get(col) not in allowed
    }
    if bad:
        raise SchemaDriftError(
            f"{path}: physical schema drift — "
            + "; ".join(
                f"column {col!r} observed {obs!r}, expected one of {exp}"
                for col, (obs, exp) in sorted(bad.items())
            )
        )
    return observed


#: the two events-table layouts this engine reads exactly; anything
#: else (e.g. a future regeneration to millis or a string ts) fails
#: loudly at the read boundary
EVENTS_EXPECTED = {
    "event_id": {"int64"},
    # tz=UTC is how Spark annotates its own TIMESTAMP_MICROS output
    # (isAdjustedToUTC=true) — same micros-since-epoch payload
    "ts": {"timestamp[ns]", "timestamp[us]", "timestamp[us, tz=UTC]"},
    "user_id": {"int64"},
    "event_type": {"string", "large_string"},
    "value": {"double"},
    "props": {"string", "large_string"},
}

#: reader DDL per physical ts layout. NANOS parquet is read under an
#: EXPLICIT BIGINT schema (raw nanos, no session conf) then truncated
#: to micros — the same floor DuckDB applies. MICROS parquet is read
#: as TIMESTAMP directly (bit-identical to DuckDB's epoch_us under a
#: UTC session zone — probed, not assumed).
EVENTS_DDL = {
    "ns": ("event_id BIGINT, ts BIGINT, user_id BIGINT, "
           "event_type STRING, value DOUBLE, props STRING"),
    "us": ("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
           "event_type STRING, value DOUBLE, props STRING"),
}


#: semantically-loaded physical types of the other generator tables:
#: a silent re-type here would change results without an error —
#: embeddings to float64 would shift every cosine hash, a re-typed
#: length column would shift the percentile filters — so the loader
#: asserts these footers like the events reader asserts its own.
#: Integer-width and string-width relaxations that Spark reads with
#: identical VALUES are allowed; payload-precision changes are not.
TABLE_EXPECTED = {
    "documents": {
        "doc_id": {"int64"},
        "text": {"string", "large_string"},
        "lang": {"string", "large_string"},
        "source": {"string", "large_string"},
        "n_chars": {"int32", "int64"},
    },
    "embeddings": {
        "vec_id": {"int64"},
        "embedding": {"list<element: float>", "list<item: float>",
                      "large_list<element: float>"},
        "label": {"int32", "int64"},
    },
    "events": EVENTS_EXPECTED,
}


def assert_table(path: str, name: str) -> None:
    """Footer-assert a generator table's physical layout if it is one
    whose semantics depend on physical types (no-op otherwise)."""
    expected = TABLE_EXPECTED.get(name)
    if expected:
        assert_columns(path, expected)


def events_ts_unit(events_path: str) -> str:
    """``'ns'`` or ``'us'``: the events table's physical ``ts`` layout
    (asserting the full expected column set as a side effect)."""
    observed = assert_columns(events_path, EVENTS_EXPECTED)
    if observed["ts"] == "timestamp[ns]":
        # INT96 (legacy Spark/Hive writer) also surfaces as arrow
        # timestamp[ns] but cannot be read under a BIGINT schema —
        # reject it explicitly rather than mis-read it.
        pf = pq.ParquetFile(_one_parquet_file(events_path))
        for i in range(len(pf.schema)):
            col = pf.schema.column(i)
            if col.name == "ts" and col.physical_type == "INT96":
                raise SchemaDriftError(
                    f"{events_path}: ts is INT96 (legacy layout) — "
                    "not readable as raw nanos; re-write with "
                    "TIMESTAMP_MICROS/NANOS output")
        return "ns"
    return "us"


def normalize_event_ts(df: DataFrame, unit: str) -> DataFrame:
    """Bring ``ts`` to TimestampType at microsecond precision whatever
    the physical layout: nanos arrive as raw BIGINT (floor-divide, the
    same truncation DuckDB applies reading TIMESTAMP(NANOS)); micros
    arrive as TIMESTAMP already."""
    if unit == "ns":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
