"""Hidden partitioning (Iceberg-style partition transforms).

The reference's consumers filter raw Snowflake columns and lean on
micro-partition pruning (data-viz/pages/2_Universe_Screener.py's
date-range WHERE clauses); the engine analog is a partition TRANSFORM
declared at create time — directories hold fn(ts), no derived column
is materialized, and scan_plan floors raw-column predicates through
the same transform, so every consumer's predicate keeps pruning.

Correctness invariant under test: the Spark-side write expression
(_pt_expr) and the Python-side planner twin (_pt_value) MUST floor
identically, and transformed-bound pruning must NEVER drop a
partition holding a matching row (superset discipline)."""

import os
import zlib

import pytest
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.manifest import (
    ManifestTable,
    SchemaMismatch,
    _pt_norm_spec,
    _pt_value,
    _pt_where_spec,
)


def _bars(spark):
    rows = [(f"2024-{m:02d}-{d:02d}", f"T{i % 5}", float(i))
            for i, (m, d) in enumerate(
                (m, d) for m in range(1, 7) for d in (1, 8, 15, 22))]
    return spark.createDataFrame(
        rows, "trade_date string, ticker string, px double")


def test_month_transform_layout_and_range_pruning(spark, tmp_path):
    df = _bars(spark)
    t = ManifestTable.create(df, str(tmp_path / "t"), "trade_date",
                             partition="month")
    mf = t._raw()
    assert mf["pt"] == {"fn": "month"}
    assert sorted(mf["partitions"]) == [
        f"2024-{m:02d}" for m in range(1, 7)]
    plan = t.scan_plan({"trade_date": ("2024-02-01", "2024-03-31")})
    assert plan["partitions"] == ["2024-02", "2024-03"]
    assert plan["partitions_pruned"] == 4
    got = (t.read(spark, where={"trade_date": ("2024-02-01",
                                               "2024-03-31")})
           .where(F.col("trade_date").between("2024-02-01",
                                              "2024-03-31")))
    exp = df.where(F.col("trade_date").between("2024-02-01",
                                               "2024-03-31"))
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, exp.collect()))


def test_month_in_list_prunes_to_single_partition(spark, tmp_path):
    t = ManifestTable.create(_bars(spark), str(tmp_path / "t"),
                             "trade_date", partition="month")
    plan = t.scan_plan({"trade_date": ["2024-05-15", "2024-05-22"]})
    assert plan["partitions"] == ["2024-05"]


def test_pruning_never_drops_a_matching_row(spark, tmp_path):
    """Superset discipline, swept over every (lo, hi) month-boundary
    combination: a partition pruned by the floored bounds must hold
    zero rows matching the raw predicate."""
    df = _bars(spark)
    t = ManifestTable.create(df, str(tmp_path / "t"), "trade_date",
                             partition="month")
    dates = [r[0] for r in df.select("trade_date").collect()]
    bounds = ["2024-01-01", "2024-02-15", "2024-03-22", "2024-06-22",
              None]
    for lo in bounds:
        for hi in bounds:
            got = {r[0] for r in
                   t.read(spark,
                          where={"trade_date": (lo, hi)})
                   .select("trade_date").collect()}
            exp = {d for d in dates
                   if (lo is None or d >= lo)
                   and (hi is None or d <= hi)}
            assert exp <= got, (lo, hi)


def test_bucket_transform_crc32_parity_and_equality_prune(
        spark, tmp_path):
    df = _bars(spark)
    t = ManifestTable.create(df, str(tmp_path / "t"), "ticker",
                             partition=("bucket", 8))
    mf = t._raw()
    # the JVM writer (crc32 over cast-string bytes) and the Python
    # planner (zlib.crc32) must agree bucket-for-bucket
    exp_parts = {str(zlib.crc32(f"T{i}".encode()) % 8)
                 for i in range(5)}
    assert set(mf["partitions"]) == exp_parts
    plan = t.scan_plan({"ticker": ["T3"]})
    assert plan["partitions"] == [
        str(zlib.crc32(b"T3") % 8)]
    got = (t.read(spark, where={"ticker": ["T3"]})
           .where("ticker = 'T3'").count())
    assert got == df.where("ticker = 'T3'").count()
    # ranges cannot prune a hash bucket: every partition survives
    plan = t.scan_plan({"ticker": ("T0", "T1")})
    assert plan["partitions_pruned"] == 0


def test_bucket_on_integer_column(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(40)], "k int, v string")
    t = ManifestTable.create(df, str(tmp_path / "t"), "k",
                             partition=("bucket", 4))
    # Spark cast('42' form) and Python str(42) canonicalize alike
    assert set(t._raw()["partitions"]) == {
        str(zlib.crc32(str(i).encode()) % 4) for i in range(40)}
    plan = t.scan_plan({"k": [7]})
    assert plan["partitions"] == [str(zlib.crc32(b"7") % 4)]


def test_truncate_int_and_string(spark, tmp_path):
    di = spark.createDataFrame(
        [(i, "x") for i in range(0, 50, 3)], "k int, v string")
    ti = ManifestTable.create(di, str(tmp_path / "i"), "k",
                              partition=("truncate", 10))
    assert sorted(ti._raw()["partitions"], key=int) == [
        "0", "10", "20", "30", "40"]
    plan = ti.scan_plan({"k": (12, 27)})
    assert plan["partitions"] == ["10", "20"]
    ds = spark.createDataFrame(
        [("AAPL", 1.0), ("AMZN", 2.0), ("MSFT", 3.0)],
        "ticker string, px double")
    ts_ = ManifestTable.create(ds, str(tmp_path / "s"), "ticker",
                               partition=("truncate", 2))
    assert sorted(ts_._raw()["partitions"]) == ["AA", "AM", "MS"]
    plan = ts_.scan_plan({"ticker": ["AMZN"]})
    assert plan["partitions"] == ["AM"]


def test_hour_transform_is_filesystem_plain(spark, tmp_path):
    df = spark.createDataFrame(
        [("2024-03-01 09:30:00", 1.0), ("2024-03-01 15:45:00", 2.0),
         ("2024-03-02 09:31:00", 3.0)],
        "event_ts string, v double").withColumn(
            "event_ts", F.col("event_ts").cast("timestamp"))
    t = ManifestTable.create(df, str(tmp_path / "t"), "event_ts",
                             partition="hour")
    assert sorted(t._raw()["partitions"]) == [
        "2024-03-01-09", "2024-03-01-15", "2024-03-02-09"]
    plan = t.scan_plan(
        {"event_ts": ("2024-03-01 10:00:00", "2024-03-02 09:00:00")})
    # floored bounds keep the boundary hours, drop 09:30's hour? no —
    # floor(lo)=…-01-10 > …-01-09, so the 09h partition IS pruned;
    # 15h and next-day 09h survive (superset of matching rows)
    assert plan["partitions"] == ["2024-03-01-15", "2024-03-02-09"]


def test_merge_update_delete_on_transformed_table(spark, tmp_path):
    df = _bars(spark)
    t = ManifestTable.create(df, str(tmp_path / "t"), "trade_date",
                             partition="month")
    up = spark.createDataFrame(
        [("2024-01-08", "T1", 101.0), ("2024-09-01", "T0", 900.0)],
        df.schema)
    t.merge(spark, up, keys=["ticker", "trade_date"])
    r = t.read(spark)
    assert r.count() == df.count() + 1
    assert r.where("trade_date='2024-01-08' and ticker='T1'"
                   ).first()["px"] == 101.0
    assert "2024-09" in t._raw()["partitions"]
    res = t.update_where(spark, {"px": F.col("px") + 1000.0},
                         "ticker = 'T0'")
    assert res["rows_updated"] == r.where("ticker='T0'").count()
    res = t.delete_where(spark, "trade_date >= '2024-09-01'")
    assert res["rows_deleted"] == 1
    assert "2024-09" not in t._raw()["partitions"]


def test_transform_survives_commits_and_time_travel(spark, tmp_path):
    df = _bars(spark)
    t = ManifestTable.create(df, str(tmp_path / "t"), "trade_date",
                             partition="month")
    t.append(spark.createDataFrame(
        [("2024-07-01", "T0", 7.0)], df.schema))
    mf = t._raw()
    assert mf["pt"] == {"fn": "month"} and mf["version"] == 2
    old = t.scan_plan({"trade_date": ("2024-07-01", None)},
                      manifest_name=t._mname(1))
    assert old["partitions"] == []      # v1 predates the July append
    new = t.scan_plan({"trade_date": ("2024-07-01", None)})
    assert new["partitions"] == ["2024-07"]


def test_dsv2_read_prunes_and_write_lands_transformed(spark, tmp_path):
    df = _bars(spark)
    root = str(tmp_path / "t")
    t = ManifestTable.create(df, root, "trade_date",
                             partition="month")
    t.register(spark, "hp_sql_t")
    got = spark.sql(
        "SELECT count(*) AS c FROM hp_sql_t "
        "WHERE trade_date >= '2024-05-01'").first()["c"]
    assert got == df.where("trade_date >= '2024-05-01'").count()
    # the DSv2 write stages under the SAME transform the planner
    # prunes with — new rows land in their month directory
    extra = spark.createDataFrame(
        [("2024-08-09", "T7", 7.0), ("2024-08-10", "T7", 8.0)],
        df.schema)
    extra.write.format("manifest").mode("append").save(root)
    mf = t._raw()
    assert "2024-08" in mf["partitions"]
    assert mf["partitions"]["2024-08"]["rows"] == 2
    plan = t.scan_plan({"trade_date": ("2024-08-01", None)})
    assert plan["partitions"] == ["2024-08"]
    assert t.read(spark).count() == df.count() + 2
    spark.catalog.dropTempView("hp_sql_t")


def test_dsv2_write_bucket_and_truncate_match_planner(spark, tmp_path):
    import zlib

    df = _bars(spark)
    root = str(tmp_path / "b")
    t = ManifestTable.create(df, root, "ticker",
                             partition=("bucket", 8))
    more = spark.createDataFrame(
        [("2024-09-01", "ZZZ", 1.0)], df.schema)
    more.write.format("manifest").mode("append").save(root)
    want = str(zlib.crc32(b"ZZZ") % 8)
    plan = t.scan_plan({"ticker": ["ZZZ"]})
    assert plan["partitions"] == [want]
    assert (t.read(spark, where={"ticker": ["ZZZ"]})
            .where("ticker = 'ZZZ'").count()) == 1


def test_dsv2_write_timestamp_days_renders_session_zone(
        spark, tmp_path):
    """Both write paths must file a timestamp row under the SAME
    session-local day directory under a non-UTC session: the JVM path
    renders via date_format in the session zone; the Arrow stager
    recovers the wall clock with pc.local_timestamp (Spark stamps the
    batches' timestamp type with the session zone)."""
    prior = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = spark.createDataFrame(
            [("2024-03-01 23:30:00", 1.0)],
            "event_ts string, v double").withColumn(
            "event_ts", F.col("event_ts").cast("timestamp"))
        root = str(tmp_path / "tz")
        t = ManifestTable.create(df, root, "event_ts",
                                 partition="days")
        assert sorted(t._raw()["partitions"]) == ["2024-03-01"]
        more = spark.createDataFrame(
            [("2024-03-02 08:00:00", 2.0)], "event_ts string, v double"
        ).withColumn("event_ts", F.col("event_ts").cast("timestamp"))
        more.write.format("manifest").mode("append").save(root)
        assert sorted(t._raw()["partitions"]) == [
            "2024-03-01", "2024-03-02"]
        assert t.read(spark).count() == 2
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior)


def test_ctor_mismatch_and_retrofit_raise(spark, tmp_path):
    df = _bars(spark)
    root = str(tmp_path / "t")
    ManifestTable.create(df, root, "trade_date", partition="month")
    # reads are governed by the manifest alone (the ctor hint is not
    # consulted); a WRITE under a contradicting spec must refuse
    bad = ManifestTable(root, "trade_date", partition="days")
    with pytest.raises(ValueError, match="opened declaring"):
        bad.append(df.limit(1))
    plain_root = str(tmp_path / "plain")
    ManifestTable.create(df, plain_root, "trade_date")
    retro = ManifestTable(plain_root, "trade_date", partition="month")
    with pytest.raises(ValueError, match="retrofitted"):
        retro.append(df.limit(1))


def test_count_where_metadata_path_on_transformed_table(
        spark, tmp_path):
    df = _bars(spark)
    t = ManifestTable.create(df, str(tmp_path / "t"), "trade_date",
                             partition="month")
    res = t.count_where(spark, "trade_date",
                        "2024-02-01", "2024-03-31")
    assert res["count"] == df.where(
        F.col("trade_date").between("2024-02-01", "2024-03-31")
    ).count()
    # whole-month containment answers from metadata, zero files read
    assert res["files_read"] == 0 and res["rows_from_metadata"] > 0


def test_bucket_and_truncate_reject_bad_source_types(spark, tmp_path):
    df = spark.createDataFrame([(1.5, "x")], "k double, v string")
    with pytest.raises(SchemaMismatch, match="string/integer"):
        ManifestTable.create(df, str(tmp_path / "t"), "k",
                             partition=("bucket", 4))
    with pytest.raises(ValueError, match="positive integer"):
        _pt_norm_spec(("truncate", 0))
    with pytest.raises(ValueError, match="unknown partition"):
        _pt_norm_spec("weekly")


def test_pt_value_twin_properties():
    assert _pt_value({"fn": "month"}, "2024-03-15") == "2024-03"
    assert _pt_value({"fn": "days"}, "2024-03-15 12:00:01"
                     ) == "2024-03-15"
    assert _pt_value({"fn": "hour"}, "2024-03-15 09:30:00"
                     ) == "2024-03-15-09"
    assert _pt_value({"fn": "hour"}, "2024-03-15") == "2024-03-15-00"
    assert _pt_value({"fn": "truncate", "n": 10}, 27,
                     "int") == "20"
    assert _pt_value({"fn": "truncate", "n": 3}, "AAPL") == "AAP"
    # bucket range spec is unprunable — where-spec says so
    assert _pt_where_spec({"fn": "bucket", "n": 8},
                          ("a", "z")) is None
    assert _pt_where_spec({"fn": "month"}, ("2024-03-15", None)) \
        == ("2024-03", None)


def test_commit_never_drops_pt_when_base_manifest_unreadable(
        spark, tmp_path):
    """ADVICE r12 (low): an unreadable BASE manifest at commit time
    (vacuumed mid-write) must not publish a spec-less snapshot — the
    carry re-reads through the live manifest, so `pt` survives and
    later writes keep staging transformed values."""
    df = spark.createDataFrame(
        [("2024-01-05", "A", 1.0), ("2024-02-07", "B", 2.0)],
        "trade_date string, ticker string, px double")
    t = ManifestTable.create(df, str(tmp_path / "t"), "trade_date",
                             partition="month")
    base = t._raw()["version"]
    orig_raw = t._raw

    def flaky_raw(name=None):
        if name == t._mname(base):
            raise FileNotFoundError(name)
        return orig_raw(name)

    t._raw = flaky_raw
    try:
        t.append(spark.createDataFrame(
            [("2024-03-09", "C", 3.0)], df.schema))
    finally:
        t._raw = orig_raw
    mf = t._raw()
    assert mf["pt"] == {"fn": "month"}
    assert sorted(mf["partitions"]) == ["2024-01", "2024-02",
                                        "2024-03"]
