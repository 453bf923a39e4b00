#!/usr/bin/env python
"""Interleaved A/B bench protocol, machine-readable (VERDICT r16 #4).

The sandbox host's effective core speed flaps ~2x within minutes
(BENCHNOISE.md), so single before/after pairs are useless: the only
valid evidence is alternating fresh-process runs of a baseline tree
(A) and the working tree (B), compared pairwise / by median.  This
tool runs that protocol and appends ONE JSON line per run to
BENCHNOISE_raw.jsonl so the next judge can recompute every claimed
median from an artifact instead of prose:

    {"_tag": "<tag>-<round><A|B>", "tree": "<head sha or WORKING>",
     "order": <seq>, "wall_sec": ..., "load_before": "...",
     "load_after": "...", ...bench.py's own JSON line...}

Usage:
    python tools/ab.py --baseline <git-ref> [--rounds 3]
        [--tag r17-ab] [--queries q1,q2] [--out BENCHNOISE_raw.jsonl]

The baseline ref is materialized once as a git worktree under
/tmp/ab_baseline_<ref>; both trees run the SAME bench.py contract
(fresh process, $SPARK_GRAFT_SF_DIR, $SPARK_GRAFT_CPUS, min-of-2
reps).  --queries sets SPARK_GRAFT_BENCH_QUERIES for BOTH trees —
comparable subsets, cheaper rounds; per-query values stay comparable
to full runs, the subset total is not a headline total.  If the
baseline tree's bench.py predates that env var it simply runs the
full roster — per-query comparisons still hold.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def loadavg() -> str:
    with open("/proc/loadavg") as f:
        return " ".join(f.read().split()[:3])


def run_bench(tree: str, env: dict) -> dict:
    t0, lb = time.perf_counter(), loadavg()
    p = subprocess.run([sys.executable, "bench.py"], cwd=tree,
                       env=env, capture_output=True, text=True,
                       timeout=1800)
    wall, la = time.perf_counter() - t0, loadavg()
    line = (p.stdout.strip().splitlines() or [""])[-1]
    try:
        d = json.loads(line)
    except json.JSONDecodeError:
        raise RuntimeError(
            f"bench in {tree} emitted no JSON (rc={p.returncode}): "
            f"{p.stderr[-2000:]}")
    d["wall_sec"] = round(wall, 1)
    d["load_before"], d["load_after"] = lb, la
    return d


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", required=True,
                    help="git ref for the A tree")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--tag", default="r17-ab")
    ap.add_argument("--queries", default="",
                    help="comma-separated bench subset for both trees")
    ap.add_argument("--out",
                    default=os.path.join(REPO, "BENCHNOISE_raw.jsonl"))
    args = ap.parse_args()

    sha = subprocess.run(["git", "rev-parse", "--short",
                          args.baseline], cwd=REPO, check=True,
                         capture_output=True, text=True).stdout.strip()
    base_dir = f"/tmp/ab_baseline_{sha}"
    if not os.path.isdir(base_dir):
        subprocess.run(["git", "worktree", "add", "--detach",
                        base_dir, sha], cwd=REPO, check=True)
        log(f"ab: baseline worktree {base_dir} @ {sha}")

    env = dict(os.environ)
    if args.queries:
        env["SPARK_GRAFT_BENCH_QUERIES"] = args.queries
    else:
        env.pop("SPARK_GRAFT_BENCH_QUERIES", None)

    seq = 0
    rows = []
    with open(args.out, "a") as f:
        for rnd in range(1, args.rounds + 1):
            # alternate which arm runs first each round: a host whose
            # speed drifts WITHIN a round (quota replenishment,
            # thermal) otherwise systematically penalizes the
            # second-run arm — observed as ±15-20% scatter on
            # UNTOUCHED queries when A always ran first
            arms = [("A", base_dir, sha), ("B", REPO, "WORKING")]
            if rnd % 2 == 0:
                arms.reverse()
            for label, tree, tid in arms:
                seq += 1
                d = run_bench(tree, env)
                d["_tag"] = f"{args.tag}-{rnd}{label}"
                d["tree"] = tid
                d["order"] = seq
                f.write(json.dumps(d) + "\n")
                f.flush()
                rows.append((label, d))
                log(f"ab: {d['_tag']} total={d['value']} "
                    f"wall={d['wall_sec']}s")

    # per-query medians over each arm, printed as ONE summary line
    def med(vals):
        s = sorted(vals)
        n = len(s)
        return round((s[n // 2] if n % 2 else
                      (s[n // 2 - 1] + s[n // 2]) / 2), 3)

    names = sorted({q for _, d in rows for q in d["queries"]})
    summary = {"tag": args.tag, "rounds": args.rounds,
               "baseline": sha, "queries": {}}
    for q in names:
        a = [d["queries"][q] for l, d in rows
             if l == "A" and q in d["queries"]]
        b = [d["queries"][q] for l, d in rows
             if l == "B" and q in d["queries"]]
        if a and b:
            summary["queries"][q] = {
                "A_median": med(a), "B_median": med(b),
                "speedup": round(med(a) / med(b), 3) if med(b) else None}
    summary["total"] = {
        "A_median": med([d["value"] for l, d in rows if l == "A"]),
        "B_median": med([d["value"] for l, d in rows if l == "B"])}
    print(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
