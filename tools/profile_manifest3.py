#!/usr/bin/env python
"""Phase-level wall-clock breakdown of the three manifest-layer
headline bench entries (guide §1: measure first, find where the time
actually goes before touching anything).  Mirrors the entry bodies in
catalog.py with a timer around each phase; prints one line per phase.

Run on an idle host:  python tools/profile_manifest3.py [SF_DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


class T:
    def __init__(self, label: str):
        self.label = label

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        print(f"    {self.label:45s} {time.perf_counter() - self.t0:7.2f}s",
              file=sys.stderr, flush=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from stock_market_data_pipeline_spark.catalog import QUERIES
    from stock_market_data_pipeline_spark.models.mapping import (
        bars_from_lineitem)
    from stock_market_data_pipeline_spark.manifest import ManifestTable
    from stock_market_data_pipeline_spark.scratch import scratch_dir
    from stock_market_data_pipeline_spark.session import get_spark
    from stock_market_data_pipeline_spark import tables

    spark = get_spark("profile_manifest3")

    # warm the JVM the way bench.py does
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")) \
        .write.format("noop").mode("overwrite").save()
    for wname in ("fct_trading_momentum", "dedup_minhash_lsh"):
        QUERIES[wname](spark, "/root/testdata/sf0.001") \
            .write.format("noop").mode("overwrite").save()

    def bars():
        return bars_from_lineitem(
            tables.load(spark, sf_dir, "lineitem")).withColumn(
            "trade_month", F.date_format("trade_date", "yyyy-MM"))

    # ---- manifest_merge_dv ------------------------------------------
    print("manifest_merge_dv:", file=sys.stderr)
    with T("bars (count only, reference)"):
        b = bars()
        b.count()
    with T("ManifestTable.create"):
        table = ManifestTable.create(
            b, scratch_dir("prof_mdv_"), ts="trade_month")
    with T("upd frame + files_before metadata"):
        upd = (table.read(spark)
               .where(F.expr("pmod(ticker, 13) = 3"))
               .withColumn("close", F.col("close") + F.lit(5.0)))
        mf = table._raw()
        files_before = {e["path"] for v in mf["partitions"]
                        for e in table._entries(mf, v)}
    with T("merge(mode='dv')"):
        out = table.merge(spark, upd, ["ticker", "trade_date"], mode="dv")
    with T("post gates (metadata)"):
        mf2 = table._raw()
        files_after = {e["path"] for v in mf2["partitions"]
                       for e in table._entries(mf2, v)}
        assert files_before <= files_after
        n_dv = sum(r.get("dv_rows", 0) for r in mf2["partitions"].values())
        assert n_dv == out["rows_dead"]
    with T("final read -> noop"):
        table.read(spark).drop("trade_month").write.format(
            "noop").mode("overwrite").save()

    # ---- manifest_time_travel ---------------------------------------
    print("manifest_time_travel:", file=sys.stderr)
    with T("bars + count"):
        b = bars()
        n_total = b.count()
    with T("ManifestTable.create"):
        table = ManifestTable.create(
            b, scratch_dir("prof_tt_"), ts="trade_month")
    with T("create_tag"):
        table.create_tag("pre_delete")
    with T("delete_where dv"):
        out = table.delete_where(spark, F.expr("pmod(ticker, 9) = 4"),
                                 mode="dv")
    with T("add_columns + vacuum + tags"):
        table.add_columns([("adjusted", "double")])
        table.vacuum(retention_seconds=0.0)
        assert table.tags() == {"pre_delete": {"version": 1}}
    from stock_market_data_pipeline_spark.manifest_datasource import (
        ManifestDataSource)
    spark.dataSource.register(ManifestDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    with T("tag read plan (lazy)"):
        tagged = (spark.read.format("manifest")
                  .option("tag", "pre_delete").load(table.root))
    with T("live.count()"):
        live = spark.read.format("manifest").load(table.root)
        assert live.count() == n_total - out["rows_deleted"]
    with T("versionAsOf=1 count"):
        assert (spark.read.format("manifest").option("versionAsOf", 1)
                .load(table.root).count()) == n_total
    with T("localCheckpoint(tagged)"):
        out_df = tagged.drop("trade_month").localCheckpoint(eager=True)
    with T("final noop"):
        out_df.write.format("noop").mode("overwrite").save()

    # ---- stream_manifest_source --------------------------------------
    print("stream_manifest_source:", file=sys.stderr)
    with T("bars + 3 slices + base.count"):
        b = bars()
        base = b.where(F.col("trade_month") < "1997-01")
        slice2 = b.where(F.col("trade_month").between("1997-01", "1997-06"))
        slice3 = b.where(F.col("trade_month") > "1997-06")
        n_base_expect = base.count()
    with T("ManifestTable.create(base)"):
        table = ManifestTable.create(
            base, scratch_dir("prof_ss_"), ts="trade_month")
    ckpt, sink = scratch_dir("prof_ss_ck_"), scratch_dir("prof_ss_out_")

    def run_once() -> int:
        q_ = (spark.readStream.format("manifest").load(table.root)
              .writeStream.format("parquet").option("path", sink)
              .option("checkpointLocation", ckpt)
              .trigger(availableNow=True).start())
        q_.awaitTermination(300)
        if q_.exception():
            raise RuntimeError(str(q_.exception()))
        return spark.read.parquet(sink).count()

    with T("stream run 1 (replay base)"):
        n_base = run_once()
        assert n_base == n_base_expect
    with T("append slice2 + slice3 (+counts)"):
        table.append(slice2)
        table.append(slice3)
        n23 = slice2.count() + slice3.count()
    with T("stream run 2 (incremental)"):
        n_after = run_once()
        assert n_after - n_base == n23
    with T("stream run 3 (empty)"):
        assert run_once() == n_after
    with T("final read sink -> noop"):
        spark.read.parquet(sink).drop("trade_month").write.format(
            "noop").mode("overwrite").save()
    return 0


if __name__ == "__main__":
    sys.exit(main())
