#!/usr/bin/env python
"""Sub-phase breakdown of merge(mode='dv') at sf0.1 (VERDICT r16 #8):
reproduce the entry's table + update frame, then time each internal
job the way manifest.merge sequences them, and dump the _stage_dv
write job's input plan to check column pruning reached the scan.

Run on an idle host:  python tools/profile_merge_dv.py [SF_DIR]
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

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
    from stock_market_data_pipeline_spark import tables
    from stock_market_data_pipeline_spark.manifest import (
        ManifestTable, _owning_pt)
    from stock_market_data_pipeline_spark.models.mapping import (
        bars_from_lineitem)
    from stock_market_data_pipeline_spark.scratch import scratch_dir
    from stock_market_data_pipeline_spark.session import get_spark

    spark = get_spark("profile_merge_dv")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")) \
        .write.format("noop").mode("overwrite").save()

    bars = bars_from_lineitem(
        tables.load(spark, sf_dir, "lineitem")).withColumn(
        "trade_month", F.date_format("trade_date", "yyyy-MM"))
    table = ManifestTable.create(bars, scratch_dir("prof_mdv_"),
                                 ts="trade_month")
    upd = (table.read(spark)
           .where(F.expr("pmod(ticker, 13) = 3"))
           .withColumn("close", F.col("close") + F.lit(5.0)))
    keys = ["ticker", "trade_date"]
    mf = table._raw()
    live = list(mf["partitions"])
    prior_files = [os.path.join(table.root, e["path"])
                   for v in live for e in table._entries(mf, v)]

    print("merge(dv) sub-phases:", file=sys.stderr)
    with T("_era_touched (updates distinct months)"):
        table._era_touched(upd, mf, None)
    with T("match_keys distinct (count action)"):
        upd.select(*keys).distinct().write.format("noop") \
            .mode("overwrite").save()
    current = table._read_files(spark, prior_files, mf,
                                keep_pos=True, partitions=live)
    match_keys = upd.select(*keys).distinct()
    hits = current.join(match_keys, keys, "left_semi")
    addr = hits.select(_owning_pt(mf).alias("__pt"), "__rel", "__ri")
    buf = io.StringIO()
    with redirect_stdout(buf):
        addr.explain(mode="formatted")
    with open("plans/r17/merge_dv_stage_dv_input.txt", "w") as f:
        f.write(buf.getvalue())
    with T("addr noop (semi join, no write)"):
        addr.write.format("noop").mode("overwrite").save()
    with T("_stage_dv (repartition + partitioned write)"):
        table._stage_dv(addr)
    with T("_stage(upserts) equivalent: full merge for reference"):
        pass
    t0 = time.perf_counter()
    out = table.merge(spark, upd, keys, mode="dv")
    print(f"    whole merge(dv) {time.perf_counter() - t0:7.2f}s "
          f"(dead={out['rows_dead']})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
