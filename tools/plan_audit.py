#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans of the headline
queries with the scale-relevant properties called out. Run after any
planner-visible change:

    python tools/plan_audit.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDITED = {
    "fct_trading_momentum": (
        "ONE Exchange on ticker feeds every W1-W8 window column "
        "(cluster_by analog); constituents broadcast; bars groupBy is "
        "the only other shuffle."),
    "agg_daily_market_breadth": (
        "Day-grain HashAggregate BELOW the single-partition global "
        "windows: the unpartitioned sort carries ~250 rows/year at any "
        "fact scale."),
    "dim_securities_current": (
        "Fact consumed ONCE: latest-row values + trailing metrics + "
        "signal dates fused into a single per-ticker aggregate; the "
        "global-latest-date filter and percent_rank windows run over "
        "the ticker-grain output."),
    "dedup_minhash_lsh": (
        "All equi-joins (band signature, shingle, candidate semi-join); "
        "no cartesian products; verification shingles semi-joined to "
        "LSH candidates before the pair join."),
    "ann_ivf_topk": (
        "Cell equi-join instead of crossJoin — scans 1/n_cells; "
        "rank via per-query window."),
    "serving_ticker_range": (
        "Key + date-range predicates pushed to the scan "
        "(PushedFilters); with a date-partitioned table this becomes "
        "partition pruning."),
    "tpch_q3_topk_revenue": (
        "Selective dims broadcast; TakeOrderedAndProject for the "
        "bounded sort."),
    "tpch_q2_min_cost_supplier": (
        "Correlated-min decorrelated: per-(part,supplier) mins and "
        "per-part minima derive from ONE shuffled grain, then an "
        "equality self-join — no per-part rescan; every dim "
        "broadcasts."),
    "tpch_q21_waiting_suppliers": (
        "EXISTS + NOT EXISTS pair reduced to one order-grain "
        "aggregate (n_supp / n_late_supp) joined back — two "
        "orderkey exchanges total, no correlated rescans."),
    "tpch_q17_small_qty_revenue": (
        "Per-part scalar-average subquery decorrelated: limits from "
        "one grouped agg over the SAME broadcast-filtered lines, "
        "then a hash join — never O(lines x parts)."),
    "sessionize_events": (
        "ONE Exchange on user_id serves the LAG flag, the running "
        "session counter, and the per-session rollup (grouping keys "
        "are a superset of the window partitioning)."),
    "asof_prior_view": (
        "Backward as-of via union-window: NO join operator between "
        "clicks and views — one Exchange on user_id + the views-dedup "
        "aggregate; an inequality join here would explode at scale."),
    "cube_order_stats": (
        "All four grouping sets in one Expand + one aggregate "
        "exchange over a single scan."),
    "band_range_join": (
        "Interval join broadcasts the 10-row band dim (BNLJ "
        "BuildRight); the fact side streams map-side, then a "
        "band-grain left join restores empty bands."),
    "dedup_clusters": (
        "Min-label propagation: per iteration one equi-join + one "
        "keyed min-aggregate, lineage truncated via localCheckpoint; "
        "iterations = component diameter."),
    "docs_length_band_filter": (
        "Per-lang percentile bounds: ONE stratum-grain aggregate "
        "(map-side partials) broadcast back onto a single fact scan — "
        "no second pass, no corpus-wide window."),
    "docs_unigram_logprob": (
        "Vocabulary-grain frequency aggregate broadcast onto the "
        "token stream (inverted-index shape); the 1-row grand total "
        "rides along broadcast; both keyed aggregates have map-side "
        "partials — linear in corpus size."),
    "dedup_minhash_edges_capped": (
        "NO pair join anywhere (r9): the candidate self-join is "
        "replaced by one window min per (band, signature) bucket — "
        "shuffle key is the hash-uniform band signature — so both the "
        "edge relation and the plan are O(docs); components then run "
        "over <= bands*docs edges instead of a quadratic pair set."),
    "dedup_embedding_edges_capped": (
        "One window min per IVF cell + an equi-join against the "
        "1-row-per-cell representative frame (broadcast-sized at any "
        "corpus scale); exactly one Arrow-vectorized cosine per "
        "member — O(vectors) dot products where the all-pairs "
        "baseline is quadratic in cell size."),
    "manifest_delete_dv": (
        "Merge-on-read read path (r10): the snapshot scan carries "
        "exactly ONE BroadcastHashJoin LeftAnti against the DV "
        "sidecar relation (bounded by deleted-row count, loaded only "
        "from touched partitions' refs) — no shuffle added to the "
        "read; the delete itself rewrote zero data files "
        "(test_dv_read_is_one_broadcast_anti_join pins the shape)."),
    "manifest_ivm_from_cdf": (
        "IVM consumer plan (r9): ONE aggregate over the CHANGE SET "
        "(signed micros sums) full-outer-joined onto the "
        "aggregate-sized view — no scan of the base table anywhere "
        "in the update path; update cost O(changes) + O(view)."),
    "tpch_q4_priority_semijoin": (
        "LEFT SEMI hash join on orderkey (r12) — not a "
        "dedup-then-inner-join double shuffle; the quarter filter is "
        "pushed to the orders scan so the probe side is already "
        "bounded before the join."),
    "tpch_q13_order_distribution": (
        "LEFT OUTER preserving zero-order customers (r12): the "
        "priority filter rides the join's streamed side, COUNT(col) "
        "ignores the null row; second aggregate runs over the "
        "customer-grain output of the first."),
    "tpch_q19_disjunctive_rev": (
        "Disjunctive OR-of-ANDs across both join sides (r12): part "
        "broadcasts, the cross-side disjunction stays a residual "
        "filter after the BHJ — no cartesian product, no "
        "OR-expansion into a union of scans."),
    "embedding_kmeans_clusters": (
        "Deterministic k-means (r12): assignment is a MAP-SIDE "
        "expression over broadcast k*d integer centroids — no cross "
        "join, no shuffle; the update aggregates at (cluster, dim) "
        "grain (k*d rows out) with map-side partials."),
}


def main() -> int:
    from stock_market_data_pipeline_spark.catalog import QUERIES
    from stock_market_data_pipeline_spark.session import get_spark

    spark = get_spark("plan_audit",
                      extra_conf={"spark.sql.shuffle.partitions": "8"})
    sf = "/root/testdata/sf0.001"
    out = ["# PLANS — physical-plan audit of the headline queries",
           "",
           "Generated by `tools/plan_audit.py` at sf0.001 (plan shape is",
           "scale-invariant; AQE may further coalesce at runtime). The",
           "invariants below are enforced by `tests/test_plan_shapes.py`.",
           ""]
    for name, note in AUDITED.items():
        df = QUERIES[name](spark, sf)
        plan = df._jdf.queryExecution().executedPlan().toString()
        plan = re.sub(r"#\d+L?", "", plan)          # strip expr ids
        plan = "\n".join(plan.splitlines()[:40])    # head is the shape
        out += [f"## {name}", "", note, "", "```", plan, "```", ""]
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PLANS.md")
    # hand-written audits (write paths, sink contracts, reshapes) live
    # below the marker and MUST survive regeneration
    marker = ("<!-- MANUAL SECTIONS BELOW — preserved by "
              "tools/plan_audit.py -->")
    manual = ""
    if os.path.exists(path):
        prior = open(path).read()
        if marker in prior:
            manual = prior[prior.index(marker):]
    with open(path, "w") as f:
        f.write("\n".join(out))
        if manual:
            f.write("\n" + manual)
    print("wrote PLANS.md (manual tail preserved)"
          if manual else "wrote PLANS.md")
    return 0


if __name__ == "__main__":
    sys.exit(main())
