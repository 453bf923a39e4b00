"""Table CHECK / NOT NULL constraints on manifest tables.

Contract (manifest.py): Delta's ``ALTER TABLE ADD CONSTRAINT ...
CHECK`` / ``SET NOT NULL`` shape — adopting a constraint validates
EXISTING data once, then every write path (append, overwrite, merge,
update_where, the DSv2 ``df.write.format("manifest")``) enforces it
on the NEW rows before its commit, so the table can never transition
to a violating state.  Enforcement is metadata-first: range checks
and NOT NULL are proven (or disproven) per staged file from parquet
footer zone maps / null counts with zero data I/O; only free-form SQL
checks (and stats-less files) scan, and then only the staged files.
A violating write raises :class:`ConstraintViolation` BEFORE the
manifest commit — the table version and data are untouched.

Reference parity: the reference's dbt tests declare not_null /
accepted-range checks post-hoc (dbt schema.yml tests); this layer
enforces the same predicates transactionally at write time.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.manifest import (
    ConstraintViolation,
    ManifestTable,
)


def _mkdf(spark, rows):
    df = spark.createDataFrame(
        rows, "ticker string, trade_date string, close double")
    return df.withColumn("trade_date",
                         F.col("trade_date").cast("date"))


BASE = [
    ("AAA", "2024-01-02", 10.0), ("BBB", "2024-01-02", 20.0),
    ("AAA", "2024-01-03", 11.0), ("BBB", "2024-01-03", 21.0),
]


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "t")
    t = ManifestTable.create(_mkdf(spark, BASE), root, "trade_date")
    return t


def _snap(df):
    return sorted(tuple(r) for r in df.collect())


def test_range_check_enforces_on_append(spark, table):
    table.add_range_check(spark, "px_positive", "close", lo=0.0)
    v = table.version()
    table.append(_mkdf(spark, [("CCC", "2024-01-04", 5.0)]))
    assert table.version() == v + 1
    before = _snap(table.read(spark))
    with pytest.raises(ConstraintViolation, match="px_positive"):
        table.append(_mkdf(spark, [("DDD", "2024-01-05", -1.0)]))
    # nothing committed: version and data unchanged
    assert table.version() == v + 1
    assert _snap(table.read(spark)) == before


def test_range_violation_is_footer_proven(spark, table):
    """A range break is detected from the staged file's footer min —
    the error says so explicitly (no scan happened)."""
    table.add_range_check(spark, "px_positive", "close", lo=0.0)
    with pytest.raises(ConstraintViolation, match="footer stats"):
        table.append(_mkdf(spark, [("DDD", "2024-01-05", -1.0)]))


def test_sql_check_scans_staged_files_only(spark, table):
    table.add_check(spark, "ticker_caps", "ticker = upper(ticker)")
    table.append(_mkdf(spark, [("CCC", "2024-01-04", 5.0)]))
    with pytest.raises(ConstraintViolation, match="ticker_caps"):
        table.append(_mkdf(spark, [("ddd", "2024-01-05", 1.0)]))


def test_null_passes_sql_check_but_not_null_rejects(spark, table):
    """SQL-standard CHECK semantics: NULL expression = pass; NOT NULL
    is its own declaration, enforced from footer null counts."""
    table.add_check(spark, "px_sane", "close < 1e9")
    nulls = _mkdf(spark, [("EEE", "2024-01-06", None)])
    table.append(nulls)          # NULL close passes the CHECK
    table.set_not_null(spark, "ticker")
    assert "not_null_ticker" in table.constraints_spec()
    bad = spark.createDataFrame(
        [(None, "2024-01-07", 1.0)],
        "ticker string, trade_date string, close double"
    ).withColumn("trade_date", F.col("trade_date").cast("date"))
    with pytest.raises(ConstraintViolation, match="not_null_ticker"):
        table.append(bad)


def test_adopting_validates_existing_data(spark, table):
    table.append(_mkdf(spark, [("CCC", "2024-01-04", -3.0)]))
    with pytest.raises(ConstraintViolation, match="existing rows"):
        table.add_range_check(spark, "px_positive", "close", lo=0.0)
    # the failed adoption left no constraint behind
    assert table.constraints_spec() == {}


def test_drop_constraint_reopens_the_state(spark, table):
    table.add_range_check(spark, "px_positive", "close", lo=0.0)
    table.drop_constraint("px_positive")
    table.append(_mkdf(spark, [("DDD", "2024-01-05", -1.0)]))
    assert table.constraints_spec() == {}
    with pytest.raises(ValueError, match="no constraint"):
        table.drop_constraint("px_positive")


def test_merge_and_update_enforce(spark, table):
    table.add_range_check(spark, "px_positive", "close", lo=0.0)
    # merge whose inserted rows violate
    with pytest.raises(ConstraintViolation):
        table.merge(spark, _mkdf(spark, [("ZZZ", "2024-01-05", -9.0)]),
                    keys=["ticker", "trade_date"])
    # update_where whose SET result violates
    with pytest.raises(ConstraintViolation):
        table.update_where(
            spark, {"close": "close - 100"},
            F.col("ticker") == "AAA")
    # both aborted pre-commit
    assert _snap(table.read(spark)) == _snap(_mkdf(spark, BASE))


def test_constraints_carry_across_commits(spark, table):
    table.add_range_check(spark, "px_positive", "close", lo=0.0)
    table.append(_mkdf(spark, [("CCC", "2024-01-04", 5.0)]))
    table.compact(spark)
    assert set(table.constraints_spec()) == {"px_positive"}
    with pytest.raises(ConstraintViolation):
        table.append(_mkdf(spark, [("DDD", "2024-01-05", -1.0)]))


def test_meta_constraints_inspection(spark, table):
    table.add_range_check(spark, "px_hi", "close", hi=1000.0)
    table.set_not_null(spark, "ticker")
    rows = {r["name"]: r for r in
            table.meta_constraints(spark).collect()}
    assert rows["px_hi"]["kind"] == "range"
    assert rows["px_hi"]["column"] == "close"
    assert "1000.0" in rows["px_hi"]["predicate"]
    assert rows["not_null_ticker"]["kind"] == "not_null"


def test_dsv2_write_enforces(spark, table):
    from stock_market_data_pipeline_spark.manifest_datasource import (
        ManifestDataSource,
    )

    spark.dataSource.register(ManifestDataSource)
    table.add_range_check(spark, "px_positive", "close", lo=0.0)
    v = table.version()
    good = _mkdf(spark, [("CCC", "2024-01-04", 5.0)]) \
        .repartition("trade_date")
    (good.write.format("manifest").mode("append")
     .option("path", table.root).option("partitionColumn",
                                        "trade_date").save())
    assert table.version() == v + 1
    bad = _mkdf(spark, [("DDD", "2024-01-05", -2.0)]) \
        .repartition("trade_date")
    with pytest.raises(Exception, match="px_positive"):
        (bad.write.format("manifest").mode("append")
         .option("path", table.root).option("partitionColumn",
                                            "trade_date").save())
    assert table.version() == v + 1


def test_violating_txn_is_vacuumable_orphan(spark, table):
    table.add_range_check(spark, "px_positive", "close", lo=0.0)
    with pytest.raises(ConstraintViolation):
        table.append(_mkdf(spark, [("DDD", "2024-01-05", -1.0)]))
    removed = table.vacuum(retention_seconds=0.0)
    assert removed, "the aborted write's staged files reclaim"
    assert _snap(table.read(spark)) == _snap(_mkdf(spark, BASE))
