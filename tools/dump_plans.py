#!/usr/bin/env python
"""Dump .explain("formatted") for headline queries into plans/$SPARK_GRAFT_PLANS_DIR (default r17)/
(<query>_<suffix>.txt).  Usage:

    python tools/dump_plans.py before [name ...]
    python tools/dump_plans.py after  [name ...]

Default name set = bench.py HEADLINE.  For entries whose value is an
in-entry pipeline (manifest scratch-table builds), the dumped plan is
the RETURNED frame's plan — the timing evidence for those lives in
tools/profile_manifest3.py phase breakdowns instead.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench
    from stock_market_data_pipeline_spark.catalog import QUERIES
    from stock_market_data_pipeline_spark.session import get_spark

    spark = get_spark("dump_plans")
    names = names or bench.HEADLINE
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLANS_DIR", "r17"))
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"skip {name}", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(outdir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {path}", file=sys.stderr)
        except Exception as exc:
            print(f"FAIL {name}: {exc!r:.300}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
