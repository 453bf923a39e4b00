"""`df.write.format("manifest")` / `writeStream.format("manifest")`:
the DSv2 two-phase write driven through the manifest commit protocol —
create-on-first-write, blind append (DV-carrying, conflict-rebasing),
atomic overwrite, schema gate, and the exactly-once streaming sink."""

from __future__ import annotations

import os
import shutil
import tempfile
import threading

import pytest

from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.manifest import (
    ManifestTable,
    SchemaMismatch,
)
from stock_market_data_pipeline_spark.manifest_datasource import (
    ManifestBatchWriter,
    ManifestDataSource,
    _commit_staged,
    _stage_arrow_batches,
)


PUSH = "spark.sql.python.filterPushdown.enabled"


@pytest.fixture()
def sink(spark):
    spark.dataSource.register(ManifestDataSource)
    prior = spark.conf.get(PUSH, "false")
    spark.conf.set(PUSH, "true")
    yield
    spark.conf.set(PUSH, prior)


def _df(spark, lo=0, hi=1000):
    # repartition by the partition column: the engine-owned layout
    # rule (write_manifest's injected shuffle) — an unrepartitioned
    # multi-task frame now RAISES at commit (sliver-spray guard)
    return (spark.range(lo, hi)
            .select(F.col("id"),
                    (F.col("id") % 7).cast("string").alias("pt"),
                    (F.col("id") * 2).alias("v"))
            .repartition(F.col("pt")))


def test_create_on_first_write_pins_schema_and_ts(spark, sink):
    root = tempfile.mkdtemp(prefix="dsw_c_")
    _df(spark).write.format("manifest").option("ts", "pt") \
        .mode("append").save(root)
    t = ManifestTable(root, "pt")
    assert t.version() == 1
    mf = t._raw()
    assert mf["ts"] == "pt"
    assert mf["schema"] == [["id", "bigint"], ["pt", "string"],
                            ["v", "bigint"]]
    assert sorted(r["id"] for r in t.read(spark).collect()) == \
        list(range(1000))
    # and the round trip through the read side of the same format
    assert spark.read.format("manifest").load(root).count() == 1000


def test_append_accumulates_files_not_rewrites(spark, sink):
    root = tempfile.mkdtemp(prefix="dsw_a_")
    _df(spark).write.format("manifest").option("ts", "pt") \
        .mode("append").save(root)
    t = ManifestTable(root, "pt")
    before = {e["path"] for v in t._raw()["partitions"]
              for e in t._entries(t._raw(), v)}
    _df(spark, 1000, 1300).write.format("manifest") \
        .mode("append").save(root)
    mf = t._raw()
    after = {e["path"] for v in mf["partitions"]
             for e in t._entries(mf, v)}
    assert before < after            # blind append: old files all kept
    assert t.version() == 2
    assert t.read(spark).count() == 1300


def test_overwrite_is_atomic_full_refresh_and_repins(spark, sink):
    root = tempfile.mkdtemp(prefix="dsw_o_")
    _df(spark).write.format("manifest").option("ts", "pt") \
        .mode("append").save(root)
    new = (spark.range(0, 50)
           .select(F.col("id"),
                   (F.col("id") % 3).cast("string").alias("pt"),
                   F.lit("x").alias("tag"))        # different schema
           .repartition(F.col("pt")))
    new.write.format("manifest").mode("overwrite").save(root)
    t = ManifestTable(root, "pt")
    assert t.version() == 2
    assert t._raw()["schema"] == [["id", "bigint"], ["pt", "string"],
                                  ["tag", "string"]]
    assert t.read(spark).count() == 50


def test_append_schema_mismatch_fails_loudly(spark, sink):
    root = tempfile.mkdtemp(prefix="dsw_s_")
    _df(spark).write.format("manifest").option("ts", "pt") \
        .mode("append").save(root)
    with pytest.raises(Exception, match="pinned schema"):
        _df(spark).withColumn("extra", F.lit(1)) \
            .write.format("manifest").mode("append").save(root)
    # the failed job published nothing
    assert ManifestTable(root, "pt").version() == 1


def test_merge_schema_evolves_pin_in_same_commit(spark, sink):
    """option('mergeSchema', 'true'): genuinely NEW columns evolve
    the pinned schema in the SAME commit (add_columns' append-only
    rule); old files NULL-fill on read; retypes still raise."""
    root = tempfile.mkdtemp(prefix="dsw_ms_")
    _df(spark).write.format("manifest").option("ts", "pt") \
        .mode("append").save(root)
    _df(spark, 1000, 1100).withColumn("w", F.lit(1.5)) \
        .write.format("manifest").option("mergeSchema", "true") \
        .mode("append").save(root)
    t = ManifestTable(root, "pt")
    assert t.version() == 2            # ONE commit evolved + appended
    assert t._raw()["schema"] == [["id", "bigint"], ["pt", "string"],
                                  ["v", "bigint"], ["w", "double"]]
    got = t.read(spark)
    assert got.where(F.col("w").isNull()).count() == 1000
    assert got.where(F.col("w") == 1.5).count() == 100
    # a retyped column is never an evolution
    bad = _df(spark).withColumn("v", F.col("v").cast("double"))
    with pytest.raises(Exception, match="pinned schema"):
        bad.write.format("manifest").option("mergeSchema", "true") \
            .mode("append").save(root)


def test_append_carries_deletion_vectors(spark, sink):
    root = tempfile.mkdtemp(prefix="dsw_dv_")
    t = ManifestTable.create(_df(spark), root, ts="pt")
    t.delete_where(spark, F.expr("pmod(id, 10) = 0"), mode="dv")
    dead = [i for i in range(1000) if i % 10 == 0]
    _df(spark, 1000, 1100).write.format("manifest") \
        .mode("append").save(root)
    got = sorted(r["id"] for r in t.read(spark).collect())
    assert got == [i for i in range(1100)
                   if not (i < 1000 and i % 10 == 0)]
    assert not set(dead) & set(got)


def test_partition_value_gate_null_and_escaped(spark, sink):
    root = tempfile.mkdtemp(prefix="dsw_n_")
    bad = spark.createDataFrame([(1, None)], "id bigint, pt string")
    with pytest.raises(Exception, match="partition value"):
        bad.write.format("manifest").option("ts", "pt") \
            .mode("append").save(root)
    bad2 = spark.createDataFrame([(1, "a/b")], "id bigint, pt string")
    with pytest.raises(Exception, match="partition value"):
        bad2.write.format("manifest").option("ts", "pt") \
            .mode("append").save(root)


def test_ts_option_conflict_fails(spark, sink):
    root = tempfile.mkdtemp(prefix="dsw_t_")
    _df(spark).write.format("manifest").option("ts", "pt") \
        .mode("append").save(root)
    with pytest.raises(Exception, match="partitioned by"):
        _df(spark).write.format("manifest").option("ts", "v") \
            .mode("append").save(root)


def test_unpartitioned_write_lands_in_all(spark, sink):
    root = tempfile.mkdtemp(prefix="dsw_u_")
    _df(spark, 0, 100).drop("pt").write.format("manifest") \
        .mode("append").save(root)
    t = ManifestTable(root, None)
    assert list(t._raw()["partitions"]) == ["__all"]
    assert t.read(spark).count() == 100


def test_concurrent_appends_both_commit(spark, sink):
    """Blind appends commute: two concurrent DSv2 writes from the
    same base both land (one rebases through CommitConflict), no
    lost update, monotonic versions."""
    root = tempfile.mkdtemp(prefix="dsw_r_")
    _df(spark, 0, 100).write.format("manifest").option("ts", "pt") \
        .mode("append").save(root)
    errs = []

    def w(lo, hi):
        try:
            # fresh py4j threads carry no JVM active-session
            # thread-local, and Spark looks the PYTHON datasource
            # registry up through it — harness detail, not engine
            spark._jvm.org.apache.spark.sql.SparkSession \
                .setActiveSession(spark._jsparkSession)
            _df(spark, lo, hi).write.format("manifest") \
                .mode("append").save(root)
        except Exception as e:          # pragma: no cover
            errs.append(e)

    a = threading.Thread(target=w, args=(100, 200))
    b = threading.Thread(target=w, args=(200, 300))
    a.start(); b.start(); a.join(); b.join()
    assert not errs
    t = ManifestTable(root, "pt")
    assert t.version() == 3
    assert sorted(r["id"] for r in t.read(spark).collect()) == \
        list(range(300))


def test_abort_reclaims_the_txn_dir(spark, sink):
    root = tempfile.mkdtemp(prefix="dsw_ab_")
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    w = ManifestBatchWriter(root, None, False,
                            [["id", "bigint"]])
    import pyarrow as pa

    msg = w.write(iter([pa.record_batch({"id": [1, 2, 3]})]))
    assert msg.files
    assert os.path.isdir(os.path.join(root, "data", w.txn))
    w.abort([msg])
    assert not os.path.exists(os.path.join(root, "data", w.txn))


def test_stream_sink_exactly_once(spark, sink):
    """Two availableNow runs against one checkpoint: batch ids land
    in the manifest's stream ledger atomically with the files; a
    direct replay of an already-committed batch id is dropped."""
    root = tempfile.mkdtemp(prefix="dss_")
    srcdir = tempfile.mkdtemp(prefix="dss_src_")
    ckpt = os.path.join(tempfile.mkdtemp(prefix="dss_ck_"), "ck")

    def run():
        q = (spark.readStream.schema("id bigint, pt string")
             .parquet(srcdir + "/*")
             .writeStream.format("manifest")
             .option("path", root).option("ts", "pt")
             .option("streamId", "s1")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(300)
        if q.exception():
            raise RuntimeError(str(q.exception()))

    (spark.range(0, 500)
     .select("id", (F.col("id") % 5).cast("string").alias("pt"))
     .write.parquet(srcdir + "/b1"))
    run()
    t = ManifestTable(root, "pt")
    assert t.version() == 1
    assert t._raw()["streams"] == {"s1": 0}
    assert t.read(spark).count() == 500

    (spark.range(500, 700)
     .select("id", (F.col("id") % 5).cast("string").alias("pt"))
     .write.parquet(srcdir + "/b2"))
    run()
    assert t._raw()["streams"] == {"s1": 1}
    assert t.read(spark).count() == 700

    # replayed batch id: recognized from the ledger, nothing published
    assert _commit_staged(root, "pt", {}, t._raw()["schema"], False,
                          stream=("s1", 1)) is False
    assert t.version() == 2


def test_stream_sink_ledger_keys_by_checkpoint_when_unnamed(spark,
                                                            sink):
    """Without option('streamId') the ledger keys by the checkpoint
    location (Spark always requires one for DSv2 sinks), so distinct
    queries never share a ledger key by accident."""
    root = tempfile.mkdtemp(prefix="dss_k_")
    srcdir = tempfile.mkdtemp(prefix="dss_k_src_")
    ckpt = os.path.join(tempfile.mkdtemp(prefix="dss_k_ck_"), "ck")
    (spark.range(0, 100)
     .select("id", (F.col("id") % 5).cast("string").alias("pt"))
     .write.parquet(srcdir + "/b1"))
    q = (spark.readStream.schema("id bigint, pt string")
         .parquet(srcdir + "/*")
         .writeStream.format("manifest")
         .option("path", root).option("ts", "pt")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    assert q.exception() is None
    t = ManifestTable(root, "pt")
    assert t._raw()["streams"] == {ckpt: 0}
    assert t.read(spark).count() == 100


def test_dsv2_append_publishes_change_feed(spark, sink):
    """option('cdf', 'true'): the DSv2 append commits its row-level
    change feed atomically with the data at zero extra bytes (the
    insert_files kind — entries reference the commit's own files)."""
    root = tempfile.mkdtemp(prefix="dsw_cdf_")
    t = ManifestTable.create(_df(spark), root, ts="pt")      # v1
    _df(spark, 1000, 1200).write.format("manifest") \
        .option("cdf", "true").mode("append").save(root)     # v2
    ch = t.changes(spark, 2)
    assert set(r["_change_type"] for r in
               ch.select("_change_type").distinct().collect()) == \
        {"insert"}
    assert sorted(r["id"] for r in ch.collect()) == \
        list(range(1000, 1200))


def test_stream_sink_publishes_change_feed_per_batch(spark, sink):
    root = tempfile.mkdtemp(prefix="dss_cdf_")
    srcdir = tempfile.mkdtemp(prefix="dss_cdf_src_")
    ckpt = os.path.join(tempfile.mkdtemp(prefix="dss_cdf_ck_"), "ck")
    (spark.range(0, 300)
     .select("id", (F.col("id") % 5).cast("string").alias("pt"))
     .write.parquet(srcdir + "/b1"))
    q = (spark.readStream.schema("id bigint, pt string")
         .parquet(srcdir + "/*")
         .writeStream.format("manifest")
         .option("path", root).option("ts", "pt")
         .option("streamId", "s1").option("cdf", "true")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    assert q.exception() is None
    t = ManifestTable(root, "pt")
    ch = t.changes(spark, 1)
    assert ch.where(F.col("_change_type") != "insert").count() == 0
    assert ch.count() == 300


def test_stream_sink_complete_mode_overwrites_per_batch(spark, sink):
    """outputMode('complete') — the aggregate-query sink shape: each
    micro-batch atomically REPLACES the table with the full current
    aggregate, still exactly-once through the ledger."""
    root = tempfile.mkdtemp(prefix="dss_cm_")
    srcdir = tempfile.mkdtemp(prefix="dss_cm_src_")
    ckpt = os.path.join(tempfile.mkdtemp(prefix="dss_cm_ck_"), "ck")

    def run():
        q = (spark.readStream.schema("id bigint, pt string")
             .parquet(srcdir + "/*")
             .groupBy("pt").agg(F.count("*").alias("n"))
             .writeStream.format("manifest")
             .option("path", root).option("ts", "pt")
             .option("streamId", "agg")
             .option("checkpointLocation", ckpt)
             .outputMode("complete")
             .trigger(availableNow=True).start())
        q.awaitTermination(300)
        assert q.exception() is None

    (spark.range(0, 300)
     .select("id", (F.col("id") % 3).cast("string").alias("pt"))
     .write.parquet(srcdir + "/b1"))
    run()
    t = ManifestTable(root, "pt")
    assert {r["pt"]: r["n"] for r in t.read(spark).collect()} == \
        {"0": 100, "1": 100, "2": 100}
    (spark.range(300, 400)
     .select("id", (F.col("id") % 3).cast("string").alias("pt"))
     .write.parquet(srcdir + "/b2"))
    run()
    # the SECOND batch REPLACED the table with the new full aggregate
    got = {r["pt"]: r["n"] for r in t.read(spark).collect()}
    assert got == {"0": 134, "1": 133, "2": 133}
    assert t._raw()["streams"] == {"agg": 1}


def test_dsv2_bloom_words_match_jvm_builder(spark, sink):
    """The executor-side (pure Python md5) filter build is
    BIT-IDENTICAL to the JVM builder: the same rows staged through
    ManifestTable._stage and through the DSv2 writer produce the same
    sparse word maps — including signed-long word encoding and date
    canon rendering."""
    import pyarrow as pa

    spec = {"cols": ["id", "d"], "m": 1 << 12, "k": 5}
    root = tempfile.mkdtemp(prefix="dswb_jvm_")
    df = (spark.range(0, 500)
          .select(F.col("id"), F.lit("0").alias("pt"),
                  F.date_add(F.lit("1997-01-01").cast("date"),
                             F.col("id").cast("int")).alias("d")))
    t = ManifestTable.create(df, root, ts="pt", bloom=spec)
    (e_jvm,) = t._entries(t._raw(), "0")
    assert e_jvm["bloom"]["id"]          # non-trivial filter

    import datetime

    root2 = tempfile.mkdtemp(prefix="dswb_py_")
    os.makedirs(os.path.join(root2, "data"))
    base = datetime.date(1997, 1, 1)
    batch = pa.record_batch({
        "id": pa.array(list(range(500)), pa.int64()),
        "pt": ["0"] * 500,
        "d": [base + datetime.timedelta(days=i) for i in range(500)]})
    ((_, _, index),) = _stage_arrow_batches(
        root2, "txn-x", "pt", iter([batch]), bloom=spec,
        dtypes={"id": "bigint", "pt": "string", "d": "date"})
    assert index["mk"] == e_jvm["mk"] == [spec["m"], spec["k"]]
    assert index["bloom"]["id"] == e_jvm["bloom"]["id"]
    assert index["bloom"]["d"] == e_jvm["bloom"]["d"]


def test_dsv2_append_builds_real_bloom_filters(spark, sink):
    """A DSv2 append to a bloom-indexed table builds real per-file
    filters executor-side: a mid-domain ABSENT key skips the appended
    files (zone maps cannot — the appended range spans it), and a
    present key is found through the source."""
    root = tempfile.mkdtemp(prefix="dsw_b_")
    df = (spark.range(0, 1000)
          .select((F.col("id") * 2).alias("id"),
                  (F.col("id") % 4).cast("string").alias("pt"))
          .repartition(F.col("pt")))
    t = ManifestTable.create(df, root, ts="pt",
                             bloom={"cols": ["id"], "m": 1 << 14,
                                    "k": 5})
    (spark.range(1000, 3000)
     .select((F.col("id") * 2).alias("id"),
             (F.col("id") % 4).cast("string").alias("pt"))
     .repartition(F.col("pt"))
     .write.format("manifest").mode("append").save(root))
    mf = t._raw()
    assert all("bloom" in e and e["mk"] == [1 << 14, 5]
               for v in mf["partitions"] for e in t._entries(mf, v))
    # 4001 is odd: inside the appended files' [2000, 5998] zone-map
    # range, absent from the even domain — only the bloom can skip
    plan = t.scan_plan({"id": [4001]})
    assert plan["files"] == [] and plan["bloom_skipped"] > 0
    # an appended present key reads back through the source
    got = (spark.read.format("manifest").load(root)
           .where(F.col("id") == 4002).collect())
    assert [r["id"] for r in got] == [4002]


def test_sprayed_layout_raises_with_fix_named(spark, sink):
    """The ENGINE owns the DSv2 layout rule (VERDICT r10 #4): an
    unrepartitioned 32-task × 12-value write is refused at commit —
    driver-side, metadata-only — with the remediation named, and
    publishes nothing."""
    import os

    root = tempfile.mkdtemp(prefix="dsw_spray_")
    df = (spark.range(0, 1200, 1, 32)
          .select(F.col("id"),
                  (F.col("id") % 12).cast("string").alias("pt")))
    with pytest.raises(Exception, match="write_manifest"):
        df.write.format("manifest").option("ts", "pt") \
            .mode("append").save(root)
    assert not os.path.isdir(os.path.join(root, "_manifests"))


def test_write_manifest_injects_layout(spark, sink):
    """write_manifest: the same 32-task × 12-value frame, written
    through the engine's own path, lands ≤1 file per partition
    value — the shuffle the DSv2 seam cannot inject, injected."""
    from stock_market_data_pipeline_spark.manifest_datasource import (
        write_manifest,
    )

    root = tempfile.mkdtemp(prefix="dsw_wm_")
    df = (spark.range(0, 1200, 1, 32)
          .select(F.col("id"),
                  (F.col("id") % 12).cast("string").alias("pt")))
    t = write_manifest(df, root, ts="pt")
    mf = t._raw()
    assert len(mf["partitions"]) == 12
    assert all(len(t._entries(mf, v)) <= 1 for v in mf["partitions"])
    assert t.read(spark).count() == 1200
    # append through the helper resolves the LIVE table's partition
    # column itself (no ts needed) and keeps the layout
    df2 = (spark.range(1200, 1800, 1, 32)
           .select(F.col("id"),
                   (F.col("id") % 12).cast("string").alias("pt")))
    write_manifest(df2, root)
    mf2 = t._raw()
    assert all(len(t._entries(mf2, v)) <= 2 for v in mf2["partitions"])
    assert t.read(spark).count() == 1800


def test_sprayed_layout_opt_in_and_exemptions(spark, sink):
    """Deliberate salted layouts opt in; single-value and
    unpartitioned writes are exempt (parallelism IS their file
    count)."""
    root = tempfile.mkdtemp(prefix="dsw_optin_")
    df = (spark.range(0, 1200, 1, 32)
          .select(F.col("id"),
                  (F.col("id") % 12).cast("string").alias("pt")))
    df.write.format("manifest").option("ts", "pt") \
        .option("acceptSprayedLayout", "true") \
        .mode("append").save(root)
    t = ManifestTable(root, "pt")
    assert t.read(spark).count() == 1200
    # unpartitioned: many tasks, one value, no guard
    root2 = tempfile.mkdtemp(prefix="dsw_unp_")
    spark.range(0, 1000, 1, 16).write.format("manifest") \
        .mode("append").save(root2)
    assert ManifestTable(root2, None).read(spark).count() == 1000
