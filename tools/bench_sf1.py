#!/usr/bin/env python
"""sf1 BENCH harness (VERDICT r7 "Next round" #5): wall-time the heavy
entry families at 10x bench scale under the SAME timing discipline as
bench.py (noop-sink execution, JVM warmup outside the timed region,
min-of-2 reps), and record the sf1/sf0.1 ratio shape so SCALE
regressions become visible the way hash regressions already are —
``SWEEP_r*_sf1.json`` proves 6M-row correctness, this proves 6M-row
cost.

The entry list is tools/sweep_sf1.py's ENTRIES (the momentum chain,
the dedup family, curation/packing/contamination, and one
representative per other scale-sensitive family) — one list, imported,
so the bench and the correctness sweep can never quietly diverge.

Reading the ratio column: a linear-in-rows operator should sit near
10x (input is a 10x replication); sub-linear ratios mean fixed
overheads still dominate at sf1 (fine); a ratio far ABOVE 10x flags a
super-linear stage (shuffle spill, all-pairs blowup, driver-side
metadata) — exactly the 100-TB smell this artifact exists to catch.

Usage: python tools/bench_sf1.py [--json OUT.json] [SF1_DIR] [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sweep_sf1 import ENTRIES  # noqa: E402  (tools/ sibling)

SF01 = "/root/testdata/sf0.1"


def _time_entry(spark, fn, sf_dir: str, reps: int = 2) -> list[float]:
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out.append(round(time.perf_counter() - t0, 3))
    return out


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf1_dir = "/root/repo/sf1data"
    if args and os.path.isdir(args[0]):
        sf1_dir, args = args[0], args[1:]
    selected = args or ENTRIES

    from stock_market_data_pipeline_spark.catalog import QUERIES
    from stock_market_data_pipeline_spark.session import get_spark

    spark = get_spark("bench_sf1")
    # warmup outside the timed region (same rationale as bench.py)
    spark.read.parquet(os.path.join(sf1_dir, "lineitem.parquet")) \
        .write.format("noop").mode("overwrite").save()
    warm = "/root/testdata/sf0.01"
    for wname in ("fct_trading_momentum", "dedup_minhash_lsh"):
        try:
            QUERIES[wname](spark, warm).write.format("noop") \
                .mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            print(f"warmup {wname} failed: {exc!r:.200}", file=sys.stderr)

    rows: dict[str, dict] = {}
    if json_out and os.path.exists(json_out):
        prior = json.load(open(json_out))
        if prior.get("sf1_dir") == sf1_dir:
            rows = {n: r for n, r in prior.get("entries", {}).items()
                    if n in ENTRIES}
    for name in selected:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"skip {name}: not registered", file=sys.stderr)
            continue
        try:
            r1 = _time_entry(spark, fn, sf1_dir)
            r01 = _time_entry(spark, fn, SF01)
            row = {"sf1_secs": min(r1), "sf1_reps": r1,
                   "sf01_secs": min(r01), "sf01_reps": r01,
                   "ratio": round(min(r1) / max(min(r01), 1e-9), 1),
                   "err": None}
        except Exception as exc:  # noqa: BLE001
            row = {"err": repr(exc)[:300]}
        rows[name] = row
        print(f"  {name:32s} sf1 {row.get('sf1_secs', '-'):>8} "
              f"sf0.1 {row.get('sf01_secs', '-'):>8} "
              f"x{row.get('ratio', '-')}"
              + (f"  ERR {row['err'][:80]}" if row.get("err") else ""))
        sys.stdout.flush()
    ok = {n: r for n, r in rows.items() if not r.get("err")}
    import subprocess
    try:
        head = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))).stdout.strip() or "unknown"
    except OSError:
        head = "unknown"
    summary = {
        "sf1_dir": sf1_dir,
        # single-vintage is machine-checkable (VERDICT r14 #6): every
        # row in this artifact was timed at this HEAD in this run; an
        # in-place refresh that merges rows from a prior artifact must
        # overwrite this field with a "mixed (<r>+<r>)" marker
        "vintage": f"single ({head})",
        "entries_timed": len(ok),
        "sf1_total": round(sum(r["sf1_secs"] for r in ok.values()), 1),
        "sf01_total": round(sum(r["sf01_secs"] for r in ok.values()), 1),
        "failed": sorted(n for n, r in rows.items() if r.get("err")),
    }
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"summary": summary, "sf1_dir": sf1_dir,
                       "entries": rows}, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    print(json.dumps(summary))
    return 1 if summary["failed"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
