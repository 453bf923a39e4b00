#!/usr/bin/env python
"""Capture the AQE-FINAL (post-execution) physical plan of a catalog
entry (VERDICT r16 #5: static plans show conservative SortMergeJoins
that AQE may or may not convert at runtime — only an executed plan
settles it).

    python tools/runtime_plan.py <query> [SF_DIR] [OUT.txt]

Executes the entry's returned frame with collect() (its OWN
QueryExecution, so the DataFrame's cached plan is the executed one —
a noop write would execute a sibling command plan instead), then
dumps explain("formatted"); with AQE the dump shows
`AdaptiveSparkPlan isFinalPlan=true` and the runtime join strategies.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = (sys.argv[3] if len(sys.argv) > 3 else
           f"plans/r17/{name}_runtime_{os.path.basename(sf_dir)}.txt")

    from stock_market_data_pipeline_spark.catalog import QUERIES
    from stock_market_data_pipeline_spark.session import get_spark

    spark = get_spark("runtime_plan")
    spark.sparkContext.setJobDescription(f"runtime_plan: {name}")
    df = QUERIES[name](spark, sf_dir)
    n = len(df.collect())
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    with open(out, "w") as f:
        f.write(f"-- {name} @ {sf_dir}, executed rows={n}\n")
        f.write(buf.getvalue())
    print(f"wrote {out} (rows={n})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
