"""Physical-layout detection (physical.py): the round-5 regression
class — a regenerated table silently changing its parquet timestamp
unit — must surface as a loud SchemaDriftError (or a correct branch),
never as silently mis-scaled values."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from stock_market_data_pipeline_spark.physical import (
    EVENTS_DDL,
    SchemaDriftError,
    arrow_types,
    assert_columns,
    events_ts_unit,
)


def _write_events(path, ts_array):
    table = pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "ts": ts_array,
        "user_id": pa.array([10, 20], pa.int64()),
        "event_type": pa.array(["view", "click"]),
        "value": pa.array([1.5, 2.5], pa.float64()),
        "props": pa.array(["{}", "{}"]),
    })
    pq.write_table(table, str(path))
    return str(path)


def test_detects_micros_layout(tmp_path):
    p = _write_events(tmp_path / "e.parquet",
                      pa.array([1, 2], pa.timestamp("us")))
    assert events_ts_unit(p) == "us"
    assert "ts TIMESTAMP," in EVENTS_DDL["us"]


def test_detects_nanos_layout(tmp_path):
    p = _write_events(tmp_path / "e.parquet",
                      pa.array([1, 2], pa.timestamp("ns")))
    assert events_ts_unit(p) == "ns"
    assert "ts BIGINT," in EVENTS_DDL["ns"]


def test_directory_source_uses_first_file(tmp_path):
    d = tmp_path / "staged"
    d.mkdir()
    _write_events(d / "chunk_0.parquet",
                  pa.array([1, 2], pa.timestamp("us")))
    assert events_ts_unit(str(d)) == "us"


def test_directory_source_homogeneous_ok(tmp_path):
    d = tmp_path / "staged"
    d.mkdir()
    for i in range(3):
        _write_events(d / f"chunk_{i}.parquet",
                      pa.array([1, 2], pa.timestamp("us")))
    assert events_ts_unit(str(d)) == "us"


def test_directory_source_mixed_layout_fails_loudly(tmp_path):
    """A staged dir mixing ts layouts must refuse, not read every file
    under the first file's DDL (which would mis-scale the others by
    1000x — the exact silent failure class this module eliminates)."""
    d = tmp_path / "staged"
    d.mkdir()
    _write_events(d / "chunk_0.parquet",
                  pa.array([1, 2], pa.timestamp("us")))
    _write_events(d / "chunk_1.parquet",
                  pa.array([1, 2], pa.timestamp("ns")))
    with pytest.raises(SchemaDriftError, match="mixed physical layouts"):
        events_ts_unit(str(d))


@pytest.mark.parametrize("ts_array, fragment", [
    # a future regeneration to millis must NOT silently hit either
    # branch (the round-5 failure mode was exactly a silent re-scale)
    (pa.array([1, 2], pa.timestamp("ms")), "timestamp[ms]"),
    # raw integer ts is ambiguous (nanos? micros?) — refuse to guess
    (pa.array([1, 2], pa.int64()), "int64"),
])
def test_unknown_ts_layout_fails_loudly(tmp_path, ts_array, fragment):
    p = _write_events(tmp_path / "e.parquet", ts_array)
    with pytest.raises(SchemaDriftError) as exc:
        events_ts_unit(p)
    msg = str(exc.value)
    assert fragment in msg and "expected one of" in msg


def test_column_type_drift_fails_loudly(tmp_path):
    # value re-typed double -> float32: every reader would silently
    # widen; the assertion names the drifted column instead
    table = pa.table({
        "event_id": pa.array([1], pa.int64()),
        "ts": pa.array([1], pa.timestamp("us")),
        "user_id": pa.array([1], pa.int64()),
        "event_type": pa.array(["view"]),
        "value": pa.array([1.5], pa.float32()),
        "props": pa.array(["{}"]),
    })
    p = str(tmp_path / "e.parquet")
    pq.write_table(table, p)
    with pytest.raises(SchemaDriftError, match="'value'"):
        events_ts_unit(p)


def test_missing_file_fails_loudly(tmp_path):
    with pytest.raises(SchemaDriftError, match="no parquet file"):
        arrow_types(str(tmp_path / "nope"))


def test_assert_columns_passes_and_returns_observed(tmp_path):
    p = _write_events(tmp_path / "e.parquet",
                      pa.array([1, 2], pa.timestamp("us")))
    obs = assert_columns(p, {"event_id": {"int64"}})
    assert obs["ts"] == "timestamp[us]"


def test_assert_table_guards_embeddings_precision(tmp_path):
    # embeddings re-typed float32 -> float64 would silently shift every
    # cosine hash — the guard must refuse the read instead
    from stock_market_data_pipeline_spark.physical import assert_table

    table = pa.table({
        "vec_id": pa.array([1], pa.int64()),
        "embedding": pa.array([[1.0, 2.0]], pa.list_(pa.float64())),
        "label": pa.array([0], pa.int32()),
    })
    p = str(tmp_path / "embeddings.parquet")
    pq.write_table(table, p)
    with pytest.raises(SchemaDriftError, match="'embedding'"):
        assert_table(p, "embeddings")


def test_assert_table_accepts_current_testdata():
    from stock_market_data_pipeline_spark.physical import assert_table
    from tests.conftest import SF_SMALL

    for name in ("documents", "embeddings", "events"):
        assert_table(f"{SF_SMALL}/{name}.parquet", name)


def test_assert_table_noop_for_unregistered_tables(tmp_path):
    from stock_market_data_pipeline_spark.physical import assert_table

    assert_table(str(tmp_path / "does_not_exist.parquet"), "lineitem")
