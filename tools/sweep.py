#!/usr/bin/env python
"""Standalone replica of the driver's correctness gate.

Runs every ``catalog.QUERIES`` entry on Spark AND its DuckDB oracle at
an arbitrary scale-factor directory (default sf0.01 — the driver's
gate scale), comparing row count, column names, and order-insensitive
exact values. Prints one status line per query and a final summary.

Usage:  python tools/sweep.py [SF_DIR] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_oracle_parity import compare  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args

    from stock_market_data_pipeline_spark.catalog import ORACLES, QUERIES
    from stock_market_data_pipeline_spark.session import get_spark

    spark = get_spark("sweep")
    todo = names or sorted(ORACLES)
    bad = []
    for name in todo:
        t0 = time.perf_counter()
        try:
            compare(spark, name, QUERIES[name], ORACLES[name], sf_dir)
            print(f"  ok    {name:35s} {time.perf_counter() - t0:6.1f}s")
        except AssertionError as exc:
            bad.append(name)
            print(f"  FAIL  {name:35s} {str(exc)[:160]}")
        except Exception as exc:  # noqa: BLE001
            bad.append(name)
            print(f"  ERR   {name:35s} {exc!r:.160}")
        sys.stdout.flush()
    print(f"sweep: {len(todo) - len(bad)}/{len(todo)} green at {sf_dir}"
          + (f"; failed: {bad}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
