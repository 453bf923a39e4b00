#!/usr/bin/env python
"""Phase breakdown of the three sf1-flagged entries (VERDICT r16 #6):
text_boilerplate_scrub, sketch_cms_key_skew, manifest_zorder_scan.
Times each internal phase at the given SF_DIR, mirroring the entry
bodies; fractions (not absolutes) are the signal on this host.

Usage: python tools/profile_outliers.py [SF_DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


class T:
    def __init__(self, label):
        self.label = label

    def __enter__(self):
        self.t0 = time.perf_counter()

    def __exit__(self, *exc):
        print(f"    {self.label:48s} {time.perf_counter() - self.t0:7.2f}s",
              file=sys.stderr, flush=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from stock_market_data_pipeline_spark import tables
    from stock_market_data_pipeline_spark.llm import textops
    from stock_market_data_pipeline_spark.manifest import ManifestTable
    from stock_market_data_pipeline_spark.scratch import scratch_dir
    from stock_market_data_pipeline_spark.session import get_spark

    spark = get_spark("prof_outliers")
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")) \
        .write.format("noop").mode("overwrite").save()

    print(f"== text_boilerplate_scrub @ {sf_dir}", file=sys.stderr)
    docs = tables.load(spark, sf_dir, "documents")
    with T("full scrub -> noop"):
        textops.boilerplate_scrub(docs).write.format("noop") \
            .mode("overwrite").save()
    # decomposition: segment explode only, then df table only
    from stock_market_data_pipeline_spark.llm.textops import (
        hex_id, words_col)
    w = words_col()
    n_chunks = F.floor(F.size(w) / 2).cast("int")
    chunks = F.when(n_chunks >= 1, F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda c: F.concat_ws(" ", F.slice(w, c * 2 + 1, 2)))
    ).otherwise(F.array().cast("array<string>"))
    seg = docs.select("doc_id",
                      F.posexplode(chunks).alias("pos", "segment"))
    seg = seg.withColumn("seg_id", hex_id(F.col("segment")))
    with T("segment explode -> noop"):
        seg.write.format("noop").mode("overwrite").save()
    df_tbl = (seg.select("seg_id", "doc_id").distinct()
              .groupBy("seg_id").agg(F.count("*").alias("seg_df")))
    with T("df table (distinct+agg) -> noop"):
        df_tbl.write.format("noop").mode("overwrite").save()
    flagged = seg.join(df_tbl, "seg_id")
    with T("seg JOIN df_tbl -> noop"):
        flagged.write.format("noop").mode("overwrite").save()

    print(f"== sketch_cms_key_skew @ {sf_dir}", file=sys.stderr)
    ev = tables.load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value")
    with T("ManifestTable.create(events)"):
        t = ManifestTable.create(ev, scratch_dir("prof_cms_"), ts=None)
    with T("analyze(frequencies 2 cols)"):
        t.analyze(spark, approx=True, columns=["user_id", "event_type"],
                  frequencies=["user_id", "event_type"])
    with T("exact user_id groupBy collect"):
        ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    with T("exact event_type groupBy collect"):
        ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()

    print(f"== manifest_zorder_scan @ {sf_dir}", file=sys.stderr)
    from stock_market_data_pipeline_spark.models.mapping import (
        bars_from_lineitem)
    bars = bars_from_lineitem(tables.load(spark, sf_dir, "lineitem"))
    with T("ManifestTable.create(bars, ts=None)"):
        t2 = ManifestTable.create(bars, scratch_dir("prof_zo_"), ts=None)
    n_rows = sum(r["rows"] for r in t2._raw()["partitions"].values())
    with T("compact(zorder close,volume -> ~16 tiles)"):
        t2.compact(spark, zorder_by=["close", "volume"],
                   max_records_per_file=max(1, -(-n_rows // 16)))
    c_lo, c_hi = t2.stat_bounds("close")
    cutoff = c_lo + (c_hi - c_lo) * 0.1
    with T("pruned read -> noop"):
        (t2.read(spark, where={"close": (None, cutoff)})
         .where(F.col("close") <= cutoff)
         .write.format("noop").mode("overwrite").save())
    return 0


if __name__ == "__main__":
    sys.exit(main())
