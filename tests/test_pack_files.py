"""r16: opt-in byte-budget file packing on the Python DSv2 read paths
(``option("packFiles", "auto" | <bytes>)``) — fewer JVM<->Python
crossings over small-file snapshots, one-task-per-file (the documented
default and the pruning-gate contract) when the option is absent.
Packing must change scheduling ONLY: same rows, same DV masking, and
a file at/over the budget must close its own bin so a compacted lake
degrades to exactly the unpacked plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _bars(spark):
    from stock_market_data_pipeline_spark import tables
    from stock_market_data_pipeline_spark.models.mapping import (
        bars_from_lineitem)

    return bars_from_lineitem(
        tables.load(spark, SF_SMALL, "lineitem")).withColumn(
        "trade_month", F.date_format("trade_date", "yyyy-MM"))


def _table(spark):
    from stock_market_data_pipeline_spark.manifest import ManifestTable
    from stock_market_data_pipeline_spark.scratch import scratch_dir

    t = ManifestTable.create(_bars(spark), scratch_dir("packt_"),
                             ts="trade_month")
    t.delete_where(spark, F.expr("pmod(ticker, 9) = 4"), mode="dv")
    return t


def test_pack_unit_bins_and_degradation():
    from stock_market_data_pipeline_spark.manifest_datasource import (
        ManifestFilePartition, ManifestPackedPartition,
        _pack_file_partitions)

    parts = [ManifestFilePartition(f"/t/{i}", f"r{i}", [])
             for i in range(6)]
    sizes = {"r0": 10, "r1": 10, "r2": 10,   # pack (30 <= 32)
             "r3": 40,                        # over budget: own bin
             "r4": 10, "r5": None}            # unknown size: own bin
    out = _pack_file_partitions(parts, sizes, budget=32)
    kinds = [type(p).__name__ for p in out]
    assert kinds == ["ManifestPackedPartition", "ManifestFilePartition",
                     "ManifestFilePartition", "ManifestFilePartition"]
    assert [q.rel for q in out[0].files] == ["r0", "r1", "r2"]
    assert out[1].rel == "r3" and out[3].rel == "r5"
    # big files everywhere -> exactly the unpacked plan
    big = {f"r{i}": 100 for i in range(6)}
    assert all(isinstance(p, ManifestFilePartition)
               for p in _pack_file_partitions(parts, big, budget=32))


def test_packed_batch_read_identical_and_fewer_tasks(spark):
    from stock_market_data_pipeline_spark.manifest_datasource import (
        ManifestDataSource)

    table = _table(spark)
    spark.dataSource.register(ManifestDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    plain = (spark.read.format("manifest")
             .option("packFiles", "0").load(table.root))
    packed = (spark.read.format("manifest")
              .option("packFiles", "auto").load(table.root))
    assert packed.rdd.getNumPartitions() < plain.rdd.getNumPartitions()
    # r17: packing is the DEFAULT — an option-less read plans exactly
    # the auto bin count, and never more tasks than files
    dflt = spark.read.format("manifest").load(table.root)
    assert (dflt.rdd.getNumPartitions()
            == packed.rdd.getNumPartitions())
    a = plain.orderBy("ticker", "trade_date").toPandas()
    b = packed.orderBy("ticker", "trade_date").toPandas()
    assert a.equals(b)
    # DV masking survived packing: the deleted residue class is gone
    assert b[(b.ticker % 9) == 4].empty and len(b) > 0


def test_packed_stream_replays_identically(spark, tmp_path):
    from stock_market_data_pipeline_spark.manifest_datasource import (
        ManifestDataSource)
    from stock_market_data_pipeline_spark.manifest import ManifestTable
    from stock_market_data_pipeline_spark.scratch import scratch_dir

    bars = _bars(spark)
    table = ManifestTable.create(bars, scratch_dir("packs_"),
                                 ts="trade_month")
    spark.dataSource.register(ManifestDataSource)
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    q = (spark.readStream.format("manifest")
         .option("packFiles", "auto").load(table.root)
         .writeStream.format("parquet").option("path", sink)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    assert q.exception() is None
    got = spark.read.parquet(sink)
    assert got.count() == bars.count()
    assert (got.select(F.sum(F.col("ticker").cast("bigint"))).first()[0]
            == bars.select(
                F.sum(F.col("ticker").cast("bigint"))).first()[0])


def test_auto_pack_budget_parses_two_letter_byte_suffixes(spark):
    # r17 (ADVICE r16): '128mb'/'1gb' are standard Spark byte strings;
    # the old parser stripped only one of g/m/k/b and crashed plan
    # time with int('128m').  Unparseable values fall back to the
    # 128 MB default instead of raising.
    from stock_market_data_pipeline_spark.manifest_datasource import (
        _auto_pack_budget)

    key = "spark.sql.files.maxPartitionBytes"
    prior = spark.conf.get(key)
    big = 10 << 40  # total bytes large enough that the cap binds
    try:
        for raw, cap in (("128mb", 128 << 20), ("1gb", 1 << 30),
                         ("64m", 64 << 20), ("134217728", 128 << 20),
                         ("2097152b", 2 << 20)):
            spark.conf.set(key, raw)
            assert _auto_pack_budget(big) == cap, raw
    finally:
        spark.conf.set(key, prior)


def test_pack_opt_rejects_negative_budget():
    # r17 (ADVICE r16): '-5' is neither off nor the internal auto
    # sentinel; silently reinterpreting it as auto hides the typo.
    import pytest

    from stock_market_data_pipeline_spark.manifest_datasource import (
        _pack_opt)

    assert _pack_opt({"packFiles": "auto"}) == -1
    assert _pack_opt({"packFiles": "0"}) == 0
    assert _pack_opt({"packFiles": "false"}) == 0
    assert _pack_opt({}) == -1       # r17: absent means auto
    assert _pack_opt({"packFiles": "1048576"}) == 1 << 20
    with pytest.raises(ValueError):
        _pack_opt({"packFiles": "-5"})
