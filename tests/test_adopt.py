"""Zero-copy parquet adoption (VERDICT r15 "Next round" #3 — the
``CONVERT TO DELTA`` / ``add_files`` analog): ManifestTable.adopt
harvests an existing lake's footers into one metadata commit, moves
zero data bytes, and every subsequent operation (scan pruning, DV
delete, append, merge, compact, vacuum, time travel, SQL) works
unchanged on the adopted snapshot."""

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.manifest import (
    ManifestTable,
    SchemaMismatch,
)


def _frame(spark, lo, hi):
    return (spark.range(lo, hi)
            .select(F.col("id"),
                    (F.col("id") % 4).cast("string").alias("pt"),
                    (F.col("id") * 2.0).alias("v")))


def _lake_fingerprint(root: str) -> dict:
    return {p: (os.path.getsize(p), os.path.getmtime(p))
            for p in glob.glob(os.path.join(root, "**", "*.parquet"),
                               recursive=True)}


@pytest.fixture()
def hive_root(spark, tmp_path):
    root = str(tmp_path / "lake")
    _frame(spark, 0, 1000).write.partitionBy("pt").parquet(root)
    return root


def test_adopt_moves_zero_bytes_and_reads_exactly(spark, hive_root):
    before = _lake_fingerprint(hive_root)
    t = ManifestTable.adopt(spark, hive_root, ts="pt")
    assert _lake_fingerprint(hive_root) == before   # ZERO data I/O
    assert t.version() == 1
    live = t.read(spark)
    # the partition column reconstructs from the directory names,
    # typed by the same inference a direct read would use
    direct = spark.read.parquet(hive_root)
    assert sorted(live.columns) == sorted(direct.columns)
    a = {tuple(r) for r in
         live.select("id", "v", F.col("pt").cast("string")).collect()}
    b = {tuple(r) for r in
         direct.select("id", "v",
                       F.col("pt").cast("string")).collect()}
    assert a == b
    assert live.filter("pt IS NULL").count() == 0


def test_adopt_scan_plan_prunes_partitions_and_files(spark, hive_root):
    t = ManifestTable.adopt(spark, hive_root, ts="pt")
    plan = t.scan_plan({"pt": ["2"]})
    assert plan["partitions"] == ["2"]
    assert plan["partitions_pruned"] == 3
    # zone maps harvested from the adopted footers skip on data cols
    plan2 = t.scan_plan({"id": (5000, None)})
    assert plan2["files"] == []          # nothing reaches id >= 5000


def test_adopt_then_dv_delete_append_merge_timetravel(spark,
                                                     hive_root):
    t = ManifestTable.adopt(spark, hive_root, ts="pt")
    out = t.delete_where(spark, F.expr("id < 100"), mode="dv")
    assert out["rows_deleted"] == 100
    assert t.read(spark).count() == 900
    # the delete wrote SIDECARS only — adopted data files untouched
    # (fingerprint of the adopted files, not the new data/ txn area)
    adopted = {p: s for p, s in _lake_fingerprint(hive_root).items()
               if "/data/" not in p}
    assert len(adopted) >= 4
    dfi = (_frame(spark, 5000, 5010)
           .withColumn("pt", F.col("pt").cast("int"))
           .select("id", "v", "pt"))
    t.append(dfi)
    assert t.read(spark).count() == 910
    assert t.read(spark).filter("pt IS NULL").count() == 0
    upd = (spark.range(500, 520)
           .select(F.col("id"), F.lit(99.0).alias("v"),
                   (F.col("id") % 4).cast("int").alias("pt")))
    t.merge(spark, upd, ["id"], mode="dv")
    got = t.read(spark).filter("id BETWEEN 500 AND 519")
    assert got.count() == 20
    assert got.filter("v = 99.0").count() == 20
    # time travel back to the adopted snapshot
    assert t.read(spark, manifest_name=t._mname(1)).count() == 1000


def test_adopt_flat_file_aligned_lake(spark, tmp_path):
    root = str(tmp_path / "flat")
    os.makedirs(root)
    df = _frame(spark, 0, 1000)
    for v in range(4):
        scratch = str(tmp_path / f"s{v}")
        df.filter(F.col("pt") == str(v)).coalesce(1) \
            .write.parquet(scratch)
        shutil.move(glob.glob(scratch + "/*.parquet")[0],
                    os.path.join(root, f"chunk-{v}.parquet"))
        shutil.rmtree(scratch)
    t = ManifestTable.adopt(spark, root, ts="pt")
    assert t.read(spark).count() == 1000
    plan = t.scan_plan({"pt": ["1"]})
    assert len(plan["files"]) == 1 and plan["partitions_pruned"] == 3
    o = t.delete_where(spark, F.expr("id % 10 = 0"), mode="dv")
    assert t.read(spark).count() == 1000 - o["rows_deleted"]


def test_adopt_flat_refuses_value_spanning_file(spark, tmp_path):
    root = str(tmp_path / "span")
    _frame(spark, 0, 100).coalesce(1).write.parquet(root)
    with pytest.raises(SchemaMismatch, match="FILE-ALIGNED"):
        ManifestTable.adopt(spark, root, ts="pt")


def test_adopt_unpartitioned(spark, tmp_path):
    root = str(tmp_path / "flatn")
    _frame(spark, 0, 500).write.parquet(root)
    t = ManifestTable.adopt(spark, root)
    assert t.read(spark).count() == 500
    o = t.delete_where(spark, F.expr("id < 10"), mode="dv")
    assert o["rows_deleted"] == 10
    assert t.read(spark).count() == 490


def test_adopt_refuses_existing_table_and_empty_lake(spark,
                                                    tmp_path,
                                                    hive_root):
    ManifestTable.adopt(spark, hive_root, ts="pt")
    with pytest.raises(ValueError, match="already holds"):
        ManifestTable.adopt(spark, hive_root, ts="pt")
    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    with pytest.raises(FileNotFoundError):
        ManifestTable.adopt(spark, empty)


def test_adopt_vacuum_never_reclaims_adopted_files(spark, hive_root):
    t = ManifestTable.adopt(spark, hive_root, ts="pt")
    t.append((_frame(spark, 5000, 5100)
              .withColumn("pt", F.col("pt").cast("int"))
              .select("id", "v", "pt")))
    removed = t.vacuum(retention_seconds=0.0)
    assert all("/data/" in p or os.sep + "data" + os.sep in p
               or not p.endswith(".parquet") for p in removed), removed
    assert t.read(spark).count() == 1100


def test_adopt_compact_migrates_and_feed_skips_it(spark, hive_root):
    """compact() re-stages adopted files into engine-owned txn dirs
    (materializing the reconstructed partition column into the new
    files) without changing visible rows — and its commit is
    row-preserving, so a CDF range spanning it stays walkable."""
    t = ManifestTable.adopt(spark, hive_root, ts="pt")          # v1
    t.delete_where(spark, F.expr("id < 50"), mode="dv",
                   cdf=True)                                    # v2
    stats = t.compact(spark, min_files=1)                       # v3
    assert stats["partitions"] == 4
    assert t.read(spark).count() == 950
    assert t.read(spark).filter("pt IS NULL").count() == 0
    t.append((_frame(spark, 6000, 6010)
              .withColumn("pt", F.col("pt").cast("int"))
              .select("id", "v", "pt")), cdf=True)              # v4
    by_v = {r["_commit_version"]: r["n"] for r in
            t.table_changes(spark, 2, 4)
            .groupBy("_commit_version")
            .agg(F.count("*").alias("n")).collect()}
    assert by_v == {2: 50, 4: 10}        # v3 contributes nothing


def test_adopt_sql_register_and_describe_detail(spark, hive_root):
    from stock_market_data_pipeline_spark.manifest_datasource import (
        manifest_sql,
    )

    t = ManifestTable.adopt(spark, hive_root, ts="pt")
    got = manifest_sql(
        spark, "SELECT pt, COUNT(*) AS n, SUM(v) AS s FROM lake "
               "WHERE pt = 2 GROUP BY pt", {"lake": t}).collect()
    assert len(got) == 1 and got[0]["n"] == 250
    detail = manifest_sql(spark, "DESCRIBE DETAIL lake",
                          {"lake": t}).collect()[0]
    assert detail["num_files"] >= 4
    assert detail["live_rows"] == 1000


def test_sql_convert_to_manifest(spark, hive_root):
    """Delta's ``CONVERT TO DELTA`` spelling: CONVERT TO MANIFEST
    adopts the lake at the name's root in one metadata commit, and
    the converted table serves SQL immediately."""
    from stock_market_data_pipeline_spark.manifest_datasource import (
        manifest_sql,
    )

    out = manifest_sql(
        spark, "CONVERT TO MANIFEST lake PARTITIONED BY (pt)",
        {"lake": hive_root}).collect()
    assert out[0]["table_name"] == "lake" and out[0]["version"] == 1
    got = manifest_sql(
        spark, "SELECT COUNT(*) AS n FROM lake WHERE pt = 3",
        {"lake": hive_root}).collect()
    assert got[0]["n"] == 250
    # re-converting an adopted table refuses (it is already a table)
    with pytest.raises(ValueError, match="already holds"):
        manifest_sql(spark, "CONVERT TO MANIFEST lake",
                     {"lake": hive_root})


def test_adopt_files_incremental(spark, hive_root, tmp_path):
    """adopt_files — Iceberg's repeatable add_files: an external
    writer keeps landing files under the lake layout; one metadata
    commit absorbs only the not-yet-referenced ones, idempotently,
    with the feed recorded at zero extra bytes."""
    t = ManifestTable.adopt(spark, hive_root, ts="pt")          # v1
    assert t.adopt_files() == {"files_added": 0, "rows_added": 0,
                               "partitions_touched": 0}
    # external writer drops a NEW partition directory + extra files
    # into an existing one (classic daily-landing shape)
    extra = _frame(spark, 2000, 2100).withColumn(
        "pt", F.when(F.col("id") < 2050, "7").otherwise("2"))
    staging = str(tmp_path / "staging")
    extra.write.partitionBy("pt").parquet(staging)
    import glob as g
    for d in ("pt=7", "pt=2"):
        os.makedirs(os.path.join(hive_root, d), exist_ok=True)
        for i, f in enumerate(g.glob(os.path.join(staging, d,
                                                  "*.parquet"))):
            shutil.copy(f, os.path.join(hive_root, d,
                                        f"ext-{i}-{os.path.basename(f)}"))
    before = _lake_fingerprint(hive_root)
    out = t.adopt_files(cdf=True)                               # v2
    assert out["files_added"] >= 2
    assert out["rows_added"] == 100
    assert out["partitions_touched"] == 2
    assert _lake_fingerprint(hive_root) == before   # zero data I/O
    live = t.read(spark)
    assert live.count() == 1100
    assert live.filter("pt = 7").count() == 50
    assert live.filter("pt IS NULL").count() == 0
    # the feed classifies the adoption as pure inserts
    feed = t.changes(spark, 2)
    assert feed.count() == 100
    assert feed.select("_change_type").distinct().collect()[0][0] \
        == "insert"
    # idempotent re-walk
    assert t.adopt_files()["files_added"] == 0
    # DVs carried: delete in an absorbed partition, then absorb more
    t.delete_where(spark, F.expr("pt = 7 AND id < 2010"),
                   mode="dv")                                   # v3
    assert t.read(spark).filter("pt = 7").count() == 40
    more = _frame(spark, 3000, 3010).withColumn("pt", F.lit("7"))
    staging2 = str(tmp_path / "staging2")
    more.write.partitionBy("pt").parquet(staging2)
    for i, f in enumerate(g.glob(os.path.join(staging2, "pt=7",
                                              "*.parquet"))):
        shutil.copy(f, os.path.join(hive_root, "pt=7",
                                    f"ext2-{i}-{os.path.basename(f)}"))
    t.adopt_files()                                             # v4
    got = t.read(spark).filter("pt = 7")
    assert got.count() == 50            # 40 live + 10 new, DVs held
    # schema safety: an unknown column refuses
    bad = more.withColumn("rogue", F.lit(1))
    staging3 = str(tmp_path / "staging3")
    bad.write.partitionBy("pt").parquet(staging3)
    for f in g.glob(os.path.join(staging3, "pt=7", "*.parquet")):
        shutil.copy(f, os.path.join(hive_root, "pt=7",
                                    "rogue-" + os.path.basename(f)))
    with pytest.raises(SchemaMismatch, match="rogue"):
        t.adopt_files()


def test_adopt_distributed_harvest_matches_driver_loop(
        spark, tmp_path, monkeypatch):
    """Above _HARVEST_DISTRIBUTE_OVER new files the footer harvest
    runs as one Spark job (the 100 TB onboarding path) — the commit
    object must be IDENTICAL to the driver-loop build."""
    from stock_market_data_pipeline_spark import manifest as M

    root_a = str(tmp_path / "a")
    root_b = str(tmp_path / "b")
    df = _frame(spark, 0, 2000).repartition(8)
    df.write.partitionBy("pt").parquet(root_a)
    shutil.copytree(root_a, root_b)
    ta = ManifestTable.adopt(spark, root_a, ts="pt")   # driver loop
    monkeypatch.setattr(M, "_HARVEST_DISTRIBUTE_OVER", 4)
    tb = ManifestTable.adopt(spark, root_b, ts="pt")   # Spark job
    ma, mb = ta.manifest(), tb.manifest()
    assert set(ma["partitions"]) == set(mb["partitions"])
    for v in ma["partitions"]:
        ea = sorted(ma["partitions"][v], key=lambda e: e["path"])
        eb = sorted(mb["partitions"][v], key=lambda e: e["path"])
        assert [(e["path"], e["rows"], e["stats"], e["nn"])
                for e in ea] \
            == [(e["path"], e["rows"], e["stats"], e["nn"])
                for e in eb]
    assert tb.read(spark).count() == 2000
    # incremental path through the distributed harvest too
    extra = _frame(spark, 9000, 9020).withColumn("pt", F.lit("9"))
    staging = str(tmp_path / "st")
    extra.write.partitionBy("pt").parquet(staging)
    import glob as g
    os.makedirs(os.path.join(root_b, "pt=9"))
    for f in g.glob(os.path.join(staging, "pt=9", "*.parquet")):
        shutil.copy(f, os.path.join(root_b, "pt=9",
                                    os.path.basename(f)))
    out = tb.adopt_files(spark=spark)
    assert out["rows_added"] == 20
    assert tb.read(spark).count() == 2020


def _land_extra(spark, hive_root, tmp_path, lo, hi, pt_value):
    extra = _frame(spark, lo, hi).withColumn("pt", F.lit(pt_value))
    staging = str(tmp_path / f"staging_{lo}")
    extra.write.partitionBy("pt").parquet(staging)
    d = f"pt={pt_value}"
    os.makedirs(os.path.join(hive_root, d), exist_ok=True)
    for i, f in enumerate(glob.glob(os.path.join(staging, d,
                                                 "*.parquet"))):
        shutil.copy(f, os.path.join(hive_root, d,
                                    f"ext-{lo}-{i}.parquet"))


def test_stream_cdf_fills_adopted_partition_column(spark, hive_root,
                                                   tmp_path):
    """The CDF STREAM path reconstructs the adopted partition column
    exactly like batch changes()/table_changes(): insert_files
    change sets from adopt_files(cdf=True) on a dirs-adopted table
    must not stream the column as NULL."""
    from stock_market_data_pipeline_spark.manifest_datasource import (
        ManifestDataSource,
    )

    t = ManifestTable.adopt(spark, hive_root, ts="pt")          # v1
    _land_extra(spark, hive_root, tmp_path, 3000, 3050, "9")
    assert t.adopt_files(cdf=True)["files_added"] >= 1          # v2
    spark.dataSource.register(ManifestDataSource)
    out = str(tmp_path / "cdf_out")
    ck = str(tmp_path / "cdf_ck")
    q = (spark.readStream.format("manifest")
         .option("readChangeFeed", "true")
         .option("startingVersion", 1)
         .load(hive_root)
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() == 50
    assert got.filter("pt IS NULL").count() == 0
    assert {str(r["pt"]) for r in got.select("pt").distinct()
            .collect()} == {"9"}
    assert {r["_change_type"] for r in
            got.select("_change_type").distinct().collect()} == \
        {"insert"}


def test_stream_incremental_fills_adopted_partition_column(
        spark, hive_root, tmp_path):
    """The INCREMENTAL (s>0) file-stream branch applies the same
    adopted-dirs fill as the catch-up branch: files absorbed by
    adopt_files must not stream the partition column as NULL."""
    from stock_market_data_pipeline_spark.manifest_datasource import (
        ManifestDataSource,
    )

    t = ManifestTable.adopt(spark, hive_root, ts="pt")          # v1
    _land_extra(spark, hive_root, tmp_path, 4000, 4040, "8")
    assert t.adopt_files()["files_added"] >= 1                  # v2
    spark.dataSource.register(ManifestDataSource)
    out = str(tmp_path / "inc_out")
    ck = str(tmp_path / "inc_ck")
    q = (spark.readStream.format("manifest")
         .option("startingVersion", 1)      # start AFTER v1: s>0
         .load(hive_root)
         .writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() == 40
    assert got.filter("pt IS NULL").count() == 0
    assert {str(r["pt"]) for r in got.select("pt").distinct()
            .collect()} == {"8"}


def test_adopt_flat_refuses_hive_layout(spark, hive_root):
    """ts=None on a hive-partitioned lake must REFUSE, not silently
    adopt flat with the partition column NULL on every read."""
    with pytest.raises(SchemaMismatch, match="PARTITIONED BY"):
        ManifestTable.adopt(spark, hive_root)


def test_adopt_dirs_refuses_stray_data(spark, hive_root, tmp_path):
    """dirs-mode adoption walks ONLY ts=value/ directories; loose
    parquet at the root or a non-hive subdir with data must refuse
    rather than silently omit rows from the adopted snapshot."""
    stray = str(tmp_path / "stray")
    _frame(spark, 5000, 5010).drop("pt").coalesce(1) \
        .write.parquet(stray)
    f = glob.glob(os.path.join(stray, "*.parquet"))[0]
    shutil.copy(f, os.path.join(hive_root, "loose.parquet"))
    with pytest.raises(SchemaMismatch, match="outside"):
        ManifestTable.adopt(spark, hive_root, ts="pt")
    os.remove(os.path.join(hive_root, "loose.parquet"))
    os.makedirs(os.path.join(hive_root, "misc"))
    shutil.copy(f, os.path.join(hive_root, "misc", "x.parquet"))
    with pytest.raises(SchemaMismatch, match="outside"):
        ManifestTable.adopt(spark, hive_root, ts="pt")


def test_adopt_descends_nested_data_named_dirs(spark, hive_root,
                                               tmp_path):
    """Only the ROOT-level engine-owned data/ dir is pruned from the
    harvest walk: a user directory named 'data' inside a partition
    is real data and must be adopted."""
    nested = str(tmp_path / "nested")
    _frame(spark, 6000, 6020).where(F.col("pt") == "0") \
        .drop("pt").coalesce(1).write.parquet(nested)
    f = glob.glob(os.path.join(nested, "*.parquet"))[0]
    os.makedirs(os.path.join(hive_root, "pt=0", "data"))
    shutil.copy(f, os.path.join(hive_root, "pt=0", "data",
                                "chunk.parquet"))
    t = ManifestTable.adopt(spark, hive_root, ts="pt")
    direct = spark.read.option("basePath", hive_root) \
        .parquet(hive_root).count()
    assert t.read(spark).count() == direct


def test_adopt_file_aligned_refuses_divergent_key_types(spark,
                                                        tmp_path):
    """Shape-A keys come from str(footer stat) while later DV
    addressing renders via Spark's cast-to-string; timestamp /
    boolean / double keys diverge between the two, so adoption
    refuses them up front rather than mis-address deletes later."""
    root = str(tmp_path / "tskeyed")
    os.makedirs(root)
    key = "spark.sql.parquet.outputTimestampType"
    prior = spark.conf.get(key)
    try:
        # INT96 (the Spark default) writes no decodable footer
        # stats, which trips the FILE-ALIGNED raise before the type
        # guard; micros timestamps carry stats, so the guard itself
        # is what must refuse here
        spark.conf.set(key, "TIMESTAMP_MICROS")
        for v in ("2020-01-01 12:00:00", "2020-01-02 06:30:00"):
            scratch = str(tmp_path / f"ts_{v[8:10]}")
            (spark.range(0, 50)
             .select(F.col("id"),
                     F.lit(v).cast("timestamp").alias("load_ts"))
             .coalesce(1).write.parquet(scratch))
            shutil.move(glob.glob(scratch + "/*.parquet")[0],
                        os.path.join(root, f"chunk-{v[8:10]}.parquet"))
    finally:
        spark.conf.set(key, prior)
    with pytest.raises(SchemaMismatch, match="renderings diverge"):
        ManifestTable.adopt(spark, root, ts="load_ts")
