#!/usr/bin/env python
"""Standalone replica of the driver's correctness gate.

Runs every ``catalog.QUERIES`` entry on Spark AND its DuckDB oracle at
an arbitrary scale-factor directory (default sf0.01 — the driver's
gate scale), comparing row count, column names, and order-insensitive
exact values. Prints one status line per query and a final summary.

Usage:  python tools/sweep.py [--json OUT.json] [SF_DIR] [name ...]

``--json OUT.json`` additionally writes a per-entry result artifact
(the per-round ``SWEEP_r{N}.json``) — the round-5 lesson was that the
driver's 50-entry window can miss regressions in the other entries, so
every round now records a FULL catalog sweep.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_oracle_parity import compare  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args) or not args[i + 1].endswith(".json"):
            print("usage: sweep.py [--json OUT.json] [SF_DIR] [name ...]")
            return 2
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args

    from stock_market_data_pipeline_spark.catalog import ORACLES, QUERIES
    from stock_market_data_pipeline_spark.session import get_spark

    spark = get_spark("sweep")
    todo = names or sorted(ORACLES)
    bad = []
    results: dict[str, dict] = {}
    if json_out and os.path.exists(json_out):
        # refresh in place: keep prior rows when only a subset is
        # re-run (overwriting with the subset silently DISCARDED a
        # full-catalog artifact once — round-7 lesson).  Merged rows
        # must still DESCRIBE this artifact: drop names no longer in
        # the catalog (renamed/removed entries would otherwise persist
        # forever and inflate green/total), and refuse to mix scale
        # factors — a row measured at another sf_dir under a summary
        # claiming one sf is a lie (r7 ADVICE item 4).
        prior = json.load(open(json_out))
        prior_sf = prior.get("summary", {}).get("sf_dir")
        if prior_sf not in (None, sf_dir):
            print(f"refusing to merge into {json_out}: it was swept at "
                  f"{prior_sf}, this run is {sf_dir}; use a fresh "
                  f"--json path")
            return 2
        results = {n: r for n, r in prior.get("entries", {}).items()
                   if n in ORACLES}
    for name in todo:
        t0 = time.perf_counter()
        try:
            compare(spark, name, QUERIES[name], ORACLES[name], sf_dir)
            secs = round(time.perf_counter() - t0, 1)
            results[name] = {"ok": True, "secs": secs, "err": None}
            print(f"  ok    {name:35s} {secs:6.1f}s")
        except AssertionError as exc:
            bad.append(name)
            results[name] = {"ok": False,
                             "secs": round(time.perf_counter() - t0, 1),
                             "err": str(exc)[:300]}
            print(f"  FAIL  {name:35s} {str(exc)[:160]}")
        except Exception as exc:  # noqa: BLE001
            bad.append(name)
            results[name] = {"ok": False,
                             "secs": round(time.perf_counter() - t0, 1),
                             "err": repr(exc)[:300]}
            print(f"  ERR   {name:35s} {exc!r:.160}")
        sys.stdout.flush()
    all_bad = [n for n, r in results.items() if not r.get("ok")]
    summary = {"sf_dir": sf_dir, "green": len(results) - len(all_bad),
               "total": len(results), "failed": all_bad}
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"summary": summary, "entries": results}, f,
                      indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    print(f"sweep: {summary['green']}/{summary['total']} green at {sf_dir}"
          + (f"; failed: {bad}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
