#!/usr/bin/env python
"""sf1 stress sweep (VERDICT r6 "Next round" #7): run the heavy entry
families at 10x bench scale — 6M lineitem rows / 200k tickers / 1M
events / 50k docs — with FULL oracle parity, not just completion.

Inputs come from tools/gen_sf1.py (deterministic 10x replication of
the read-only driver sf0.1 — see that file's header for construction);
DuckDB runs each entry's oracle SQL against the SAME parquet files, so
hash parity is available at this scale.  The compare is vectorized
(pandas column-wise exact equality after a full sort) because the
pytest-path multiset compare is Python-tuple-speed and two entries
return ~6M rows.

Usage: python tools/sweep_sf1.py [--json OUT.json] [SF1_DIR] [name ...]

Naming entries re-runs ONLY those; with --json pointing at an existing
artifact their rows are updated in place (the refresh path after an
entry-targeted fix — e.g. re-timing one entry on new code without
re-paying the full sweep).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

#: the heavy families the verdict names (momentum chain, dedup family,
#: packing, contamination) plus one representative per other
#: scale-sensitive family (scan+agg, top-k join, sessionization,
#: tf-idf, streaming replay, similarity, source-grain curation, the
#: manifest MERGE). Light dim/serving entries are excluded ON PURPOSE
#: — they are sf-invariant; naming the exclusion here is the "no
#: silent caps" rule.
ENTRIES = [
    # momentum chain (6M-row fact, 200k-ticker windows)
    "universe_daily", "fct_trading_momentum", "agg_daily_market_breadth",
    "dim_securities_current", "manifest_momentum_merge",
    # round-8: TWO successive transactional merges through the
    # now-default manifest write path
    "fct_momentum_incremental",
    # dedup family
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_ngram_jaccard", "dedup_clusters", "dedup_survivors_by_quality",
    "dedup_embedding_cosine",
    # curation / packing / contamination
    "docs_pack_sequences", "benchmark_contamination",
    "docs_source_quality_filter",
    # representatives
    "tpch_q1_pricing_summary", "tpch_q3_topk_revenue",
    "sessionize_events", "text_tfidf_top_terms",
    "stream_hourly_rollup", "stream_dedup_events",
    # round-7 manifest family: stats-pruned scan over ~6M bars,
    # exactly-once streaming append over 1M events
    "manifest_pruned_scan", "stream_manifest_append",
    # round-8 manifest family: partition-shaped transactional DELETE
    # and metadata-only schema evolution, both over ~6M bars
    "manifest_delete_where", "manifest_schema_evolution",
    "manifest_restore", "manifest_change_feed",
    "manifest_zorder_scan", "serving_manifest_ticker_range",
    # round-8: the streaming MERGE upsert through the default
    # transactional path (merge_batch), 1M events x duplicate delivery
    "stream_upsert_rollup",
    # round-7 text family addition (50k docs, map-side regex scan)
    "docs_pii_scrub",
    # round-9: the star-edge capped near-dup relation (the entry
    # asserts edges <= bands*docs AT THIS SCALE — the O(docs)-not-
    # O(pairs) claim is only meaningful where pairs explode), the
    # row-level CDF merge, the mixed (date, string) z-order
    # compaction over ~6M bars, and the entropy-coded JPEG roundtrip
    # over 50k docs
    "dedup_minhash_edges_capped", "dedup_embedding_edges_capped",
    "dedup_simhash_edges_capped",
    "manifest_cdf_rows", "manifest_ivm_from_cdf",
    "manifest_count_pushdown",
    "manifest_zorder_mixed", "mm_decode_jpeg",
    # round-9 late additions: per-file Bloom membership skipping on a
    # hash-scattered 50k-doc id domain (the skip zone maps cannot
    # make; the entry asserts the bloom did the skipping), and the
    # three-clause MERGE (WHEN MATCHED DELETE) over ~6M bars with its
    # four-kind CDF reconciliation guard
    "manifest_bloom_pointlookup", "manifest_merge_delete",
    # round-10: the deletion-vector family over ~6M bars — merge-on-
    # read DELETE/UPDATE and the low-shuffle MERGE (each entry asserts
    # zero partition rewrites and exact dv_rows accounting AT THIS
    # SCALE, where a rewrite-mode plan would re-stage every month)
    "manifest_delete_dv", "manifest_update_dv", "manifest_merge_dv",
    # round-10 additions: context-window chunking (50k docs -> ~14x
    # chunk rows), the exactly-once LOW-SHUFFLE streaming merge over
    # 1M events x duplicate delivery, and the color-JPEG roundtrip
    # (3x the pixel volume of the grayscale entry, interleaved MCUs)
    "docs_chunk_overlap", "stream_upsert_dv", "mm_decode_jpeg_color",
    # round-10 late additions: write-audit-publish through a branch
    # (branch cut + publish stay metadata-sized while the backfill is
    # ~6M-row months), the runner's blocking audit stage driving the
    # same flow twice (one refused, one published), the inspection
    # tables whose per-partition numbers must stay physically true at
    # ~6M rows with DVs attached, and the pushdown DataSource whose
    # task count must equal the pruned file list at 80+ partitions
    "manifest_wap_publish", "runner_wap_audit",
    "manifest_meta_tables", "datasource_manifest_scan",
    # round-10 final additions: the table as a streaming SOURCE
    # (version offsets over ~80 month-commits of 6M rows), time
    # travel + tags (the pinned read must resurrect ~6M pre-delete
    # rows after vacuum(0) reclaimed untagged history), and the DSv2
    # WRITE paths — batch create+append of the full 6M-row fact and
    # the exactly-once streaming sink over the same volume
    "stream_manifest_source", "manifest_time_travel",
    "datasink_manifest_write", "stream_manifest_sink",
    # the row-level change-feed stream: the feed relation itself is
    # ~6M insert rows + the deleted residue class, oracled exactly
    "stream_change_feed",
    # streaming IVM: the fold consumes ~5M backfill inserts + the
    # update's pre/post images per trigger, never rescanning the base
    "stream_ivm_view",
    # CDC replication: the replica applies ~5M change rows through
    # the exactly-once tombstone merge and must hash-match the source
    "stream_apply_changes",
    # round-11: the full-snapshot sync (by-source clause probes +
    # dead-marks across ~80 month-partitions of 6M rows — the entry
    # asserts merge-on-read shape AT THIS SCALE), raw-SQL serving
    # through the registered DSv2 view (pushdown task count == pruned
    # files at 80+ partitions), the metadata-only rename+widen over
    # the same table (entry asserts zero files touched), the chunked
    # backfill (6 month-commits of ~70k rows each through a bounded
    # version walk), and the engine-owned write layout (the sprayed
    # 32-task frame must land exactly one file per month)
    "manifest_merge_full_sync", "manifest_sql_select",
    "manifest_column_mapping", "stream_backfill_chunked",
    "datasink_auto_layout",
    # round-12: hidden partitioning over 1M events (days-transform
    # directories + bucket hash lookups — partition-grade pruning
    # must hold at 30 day-dirs / 8 hash buckets of 1M rows),
    # partition-spec evolution over ~85 day-partitions of bars with
    # a cross-era delete migration, the TPC-H shape batch over 6M
    # lineitem, the mergeable-HLL register parity over 1M events
    # (15k distinct users — the sketch's error envelope is asserted
    # in-entry at this scale), the boilerplate scrub's order-exact
    # reassembly over 50k docs, and the deterministic k-means over
    # 5k vectors (the oracle replays both Lloyd passes exactly)
    "manifest_hidden_partitioning", "manifest_bucket_transform",
    "manifest_partition_evolution",
    "tpch_q4_priority_semijoin", "tpch_q7_volume_shipping",
    "tpch_q8_market_share", "tpch_q13_order_distribution",
    "tpch_q15_top_supplier", "tpch_q16_supplier_cnt",
    "tpch_q18_large_orders", "tpch_q19_disjunctive_rev",
    "tpch_q22_anti_join",
    "sketch_hll_daily_users", "text_boilerplate_scrub",
    "embedding_kmeans_clusters",
    # round-13: DSv2 append onto a partition-EVOLVED ~6M-bar table
    # (cross-era pruning asserted in-entry), SQL MERGE/DML over the
    # same volume through the manifest_sql rewrite, incremental
    # ANALYZE (merged sketches must equal a fresh full twin at ~2M
    # rows scanned incrementally), the CMS skew probe over 1M
    # events, and the seven TPC-H shapes completing the 22-query
    # roster over 6M lineitem
    "datasink_evolved_write", "manifest_sql_merge",
    "manifest_sql_dml", "manifest_analyze_incremental",
    "sketch_cms_key_skew",
    "tpch_q17_small_qty_revenue", "tpch_q20_excess_suppliers",
    "tpch_q21_waiting_suppliers", "tpch_q2_min_cost_supplier",
    "tpch_q6_forecast_revenue", "tpch_q9_product_profit",
    "tpch_q10_returned_items", "tpch_q11_important_stock",
    "tpch_q12_priority_by_flag", "tpch_q14_promo_effect",
    # round-14: metadata-only DROP COLUMN + fresh-physical re-add
    # over ~6M bars (entry asserts zero files touched and NULL-fill
    # at scale), the SQL DDL lifecycle + both literal time-travel
    # forms over the same table, the SQL maintenance cycle
    # (OPTIMIZE/VACUUM/ANALYZE/HISTORY) on a fragmented 3-month
    # table, and the quantile-sketch pair over 1M events (bit-exact
    # bucket-state parity + rank containment asserted in-entry)
    "manifest_drop_column", "manifest_sql_ddl",
    "manifest_sql_maintenance", "sketch_ddq_quantiles",
    "sketch_ddq_range_estimate",
    # round-15: the SQL range change feed consumed across an
    # append + DV-merge + delete sequence over ~6M bars (the feed is
    # bounded by change volume, asserted ≡ the DataFrame API), the
    # SQL catalog surface (DETAIL ≡ partitions ≡ files folds over
    # 80+ month-partitions with DVs), sketch-ordered bloom probes
    # (probe count must strictly drop at ~120 clustered files), and
    # the stats-driven salt decision over 1M events
    "manifest_sql_table_changes", "manifest_sql_catalog",
    "manifest_sketch_probe_order", "manifest_salt_decision",
    # round-16: zero-copy adoption of a ~6M-row hive lake (entry
    # asserts zero data bytes moved + partition pruning + DV delete
    # on adopted files), both stored-stats join decisions over 1M
    # events (broadcast-vs-shuffle per side + CMS/HLL salt fan-out
    # with whale-spread proof), and the DDQ range-selectivity
    # broadcast flip over 600k orders
    "manifest_adopt_parquet", "manifest_join_plan",
    "manifest_range_broadcast",
    # round-16 late: the DDQ-sized chunked backfill (6 month-commits
    # of ~70k bars replayed through a range-filtered bounded walk;
    # the sketch-shortened schedule is entry-asserted), and the
    # commit-object OPTIMIZE victim selection over ~350k H1-1997
    # lineitems (8-way fragmented months + a spared 2-file month)
    "manifest_backfill_sized", "manifest_compact_plan",
]


def compare_frames(sk, dk) -> tuple[bool, str | None]:
    import pandas as pd  # noqa: F401

    sk = sk.sort_index(axis=1)
    dk = dk.sort_index(axis=1)
    if list(sk.columns) != list(dk.columns):
        return False, f"columns {list(sk.columns)} != {list(dk.columns)}"
    if len(sk) != len(dk):
        return False, f"rows {len(sk)} != {len(dk)}"
    cols = list(sk.columns)
    sk = sk.sort_values(cols).reset_index(drop=True)
    dk = dk.sort_values(cols).reset_index(drop=True)
    for c in cols:
        a, b = sk[c], dk[c]
        bad = ~((a == b) | (a.isna() & b.isna()))
        if bad.any():
            i = int(bad.idxmax())
            return False, (f"col {c}: {int(bad.sum())} diffs, first at "
                           f"row {i}: {a[i]!r} vs {b[i]!r}")
    return True, None


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = "/root/repo/sf1data"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    selected = args or ENTRIES

    from stock_market_data_pipeline_spark.catalog import ORACLES, QUERIES
    from stock_market_data_pipeline_spark.session import get_spark

    spark = get_spark("sweep_sf1")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    results: dict[str, dict] = {}
    if json_out and os.path.exists(json_out):
        # refresh in place: always start from the existing rows — a
        # subset-only guard here silently DISCARDED prior rows when a
        # name outside ENTRIES (or the full list, spelled out) was
        # selected
        results = json.load(open(json_out))["entries"]
    for name in selected:
        t0 = time.perf_counter()
        try:
            sdf = QUERIES[name](spark, sf_dir)
            sk = sdf.toPandas()
            t_spark = time.perf_counter() - t0
            t1 = time.perf_counter()
            dk = con.execute(ORACLES[name]).df()
            t_duck = time.perf_counter() - t1
            ok, err = compare_frames(sk, dk)
            results[name] = {
                "ok": ok, "err": err, "rows": len(sk),
                "spark_secs": round(t_spark, 1),
                "duckdb_secs": round(t_duck, 1),
            }
        except Exception as exc:
            results[name] = {
                "ok": False, "err": f"{type(exc).__name__}: {exc}"[:400],
                "rows": None,
                "spark_secs": round(time.perf_counter() - t0, 1),
                "duckdb_secs": None,
            }
        r = results[name]
        print(f"{name}: {'OK' if r['ok'] else 'FAIL'} rows={r['rows']} "
              f"spark={r['spark_secs']}s duck={r['duckdb_secs']}s"
              + (f" err={r['err']}" if r["err"] else ""),
              file=sys.stderr, flush=True)

    failed = [n for n, r in results.items() if not r["ok"]]
    out = {
        "entries": results,
        "summary": {
            "sf_dir": sf_dir, "sf": 1.0,
            "total": len(results), "green": len(results) - len(failed),
            "failed": failed,
            "note": ("sf1 = deterministic 10x replication of driver "
                     "sf0.1 (tools/gen_sf1.py); heavy families with "
                     "full DuckDB oracle parity at 6M lineitem / 1M "
                     "events / 50k docs. Light dim/serving entries "
                     "excluded as sf-invariant (run at sf0.1 in "
                     "SWEEP artifacts)."),
        },
    }
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out["summary"]))
    return 0 if not failed else 1


if __name__ == "__main__":
    sys.exit(main())
