"""Physical-plan regression tests: the properties that make these
queries scale are asserted, not assumed — a refactor that silently
adds a shuffle, drops a broadcast, or un-pushes a filter fails CI.

(The 100 TB design rests on these invariants: one window exchange for
the whole indicator set, broadcast as-of dim join, scan-level filter
pushdown, top-k as TakeOrderedAndProject, no cartesian products.)"""

from __future__ import annotations

import re

from tests.conftest import SF_SMALL


def plan_str(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _q(name):
    from stock_market_data_pipeline_spark.catalog import QUERIES
    return QUERIES[name]


def test_momentum_single_window_exchange(spark):
    """All W1-W8 indicator columns must evaluate after ONE exchange on
    ticker (the cluster_by analog) — plus the bars-grain groupBy
    exchange. A third exchange means a window spec stopped being
    shared."""
    p = plan_str(_q("fct_trading_momentum")(spark, SF_SMALL))
    keys = re.findall(r"Exchange hashpartitioning\((\w+)", p)
    assert len(keys) == 2, f"expected 2 exchanges, got {keys}"
    assert sorted(set(keys)) == sorted({"ticker", "l_partkey"}), keys


def test_momentum_broadcasts_constituents(spark):
    """J1 as-of join must broadcast the dimension: the fact side never
    shuffles for the join."""
    p = plan_str(_q("fct_trading_momentum")(spark, SF_SMALL))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_screener_filters_reach_scan(spark):
    """P8 predicates must push to the parquet scan (partition/row-group
    pruning at scale)."""
    p = plan_str(_q("screener_filter")(spark, SF_SMALL))
    m = re.search(r"PushedFilters: \[([^\]]*)", p)
    assert m, "no PushedFilters in scan"
    pushed = m.group(1)
    assert "In(p_size" in pushed
    assert "IsNotNull(p_retailprice)" in pushed


def test_topk_plans_take_ordered(spark):
    """O2/O3 and entry(): bounded sorts must plan TakeOrderedAndProject,
    never a full global sort."""
    import __spark_entry__ as E

    for df in [_q("topk_by_metric")(spark, SF_SMALL), E.entry(spark)]:
        assert "TakeOrderedAndProject" in plan_str(df)


def test_no_cartesian_anywhere_but_bruteforce(spark):
    """Only the brute-force ANN baseline may contain a cartesian-style
    join; every bucketed/LSH path must be an equi-join."""
    for name in ["dedup_minhash_lsh", "dedup_ngram_jaccard",
                 "dedup_simhash", "ann_ivf_topk",
                 "dedup_embedding_cosine"]:
        p = plan_str(_q(name)(spark, SF_SMALL))
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name


def test_breadth_global_windows_after_day_grain(spark):
    """W12/W13 single-partition windows must sit above the day-grain
    aggregate: the single-partition exchange carries ~rows/day, not the
    fact table."""
    p = plan_str(_q("agg_daily_market_breadth")(spark, SF_SMALL))
    # a global ordered window needs Exchange SinglePartition; it must
    # appear after (above) a HashAggregate on trade_date
    assert "Exchange SinglePartition" in p
    agg_pos = p.find("HashAggregate")
    single_pos = p.find("Exchange SinglePartition")
    assert agg_pos != -1 and single_pos < agg_pos, \
        "single-partition window should consume the day-grain aggregate"


def test_sessionize_single_exchange(spark):
    """Sessionization (LAG + running flag-sum + per-session rollup)
    must run on ONE exchange over user_id: the rollup's grouping keys
    (user_id, session_seq) are a superset of the window partitioning,
    so the subset rule reuses it."""
    p = plan_str(_q("sessionize_events")(spark, SF_SMALL))
    keys = re.findall(r"Exchange hashpartitioning\((\w+)", p)
    assert keys and all(k == "user_id" for k in keys), keys
    assert len(keys) == 1, f"expected 1 exchange, got {keys}"


def test_backward_asof_no_join_operator(spark):
    """The as-of entry is the union-window plan: no join operator at
    all between clicks and views (an inequality join here would
    explode at scale); the views-dedup aggregate is the only extra
    exchange."""
    p = plan_str(_q("asof_prior_view")(spark, SF_SMALL))
    assert "Join" not in p
    assert "CartesianProduct" not in p


def test_cube_single_shuffle(spark):
    """CUBE computes all four grouping sets in one expand + one
    aggregate exchange — not four scans."""
    p = plan_str(_q("cube_order_stats")(spark, SF_SMALL))
    assert p.count("Expand") >= 1
    assert p.count("FileScan") == 1
    assert p.count("Exchange hashpartitioning") == 1


def test_unpivot_is_map_side(spark):
    """UNPIVOT adds no shuffle beyond its input query: melt happens
    in place (Expand/Generate), never via self-union re-scans."""
    dim_p = plan_str(_q("dim_securities_current")(spark, SF_SMALL))
    unp_p = plan_str(_q("unpivot_dim_metrics")(spark, SF_SMALL))
    assert "Expand" in unp_p
    # no extra work vs the input query — column pruning may even DROP
    # dim branches feeding unmelted columns, so <= not ==
    assert unp_p.count("FileScan") <= dim_p.count("FileScan"), \
        "unpivot re-scanned its input"
    assert unp_p.count("Exchange") <= dim_p.count("Exchange")


def test_band_join_broadcasts_bands_fact_streams(spark):
    """The interval join must broadcast the band dim under the fact
    (BroadcastNestedLoopJoin BuildRight on the inner pass) — the fact
    side must NOT appear under any Exchange before the join."""
    p = plan_str(_q("band_range_join")(spark, SF_SMALL))
    assert "BroadcastNestedLoopJoin BuildRight, Inner" in p
    join_pos = p.find("BroadcastNestedLoopJoin")
    scan_pos = p.find("FileScan parquet [p_partkey")
    assert scan_pos > join_pos, "fact scan should stream into the join"
    between = p[join_pos:scan_pos]
    assert "Exchange hashpartitioning" not in between


def test_tpch_q5_broadcasts_dims_no_cartesian(spark):
    """Q5's six-way join: selective dims must broadcast (the fact side
    shuffles at most for the orderkey join + final aggregate); the
    nation-correlation predicate must ride join conditions, never a
    cartesian."""
    p = plan_str(_q("tpch_q5_local_supplier")(spark, SF_SMALL))
    assert p.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_pairwise_correlation_equi_join_on_date(spark):
    """The correlation pair join must be an equi-join on trade_date
    (pairs form within a date) — the ticker inequality rides as a
    residual, never a cartesian."""
    p = plan_str(_q("pairwise_correlation")(spark, SF_SMALL))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_length_band_broadcasts_bounds(spark):
    """The per-lang percentile bounds must broadcast back onto the
    fact: one lang-grain exchange for the aggregate, no fact-side
    shuffle, no sort-merge join."""
    p = plan_str(_q("docs_length_band_filter")(spark, SF_SMALL))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    keys = re.findall(r"Exchange hashpartitioning\((\w+)", p)
    assert set(keys) == {"lang"}, keys


def test_unigram_logprob_broadcast_freq_partial_aggs(spark):
    """The vocabulary-grain frequency table and the 1-row grand total
    must broadcast onto the token stream (inverted-index shape), and
    both keyed aggregates must have map-side partials — the invariants
    that keep the score join linear in corpus size."""
    p = plan_str(_q("docs_unigram_logprob")(spark, SF_SMALL))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "partial_count" in p and "partial_sum" in p
    keys = re.findall(r"Exchange hashpartitioning\((\w+)", p)
    assert set(keys) == {"tok", "doc_id"}, keys


def test_source_quality_filter_map_side_scoring(spark):
    """Per-doc TTR must be map-side column math (array_distinct on the
    token array — NO explode / generator), with only the tiny
    source-grain aggregate shuffling.  Asserted on the scoring stage
    directly: the entry checkpoints this frame, which hides its
    lineage from the final plan."""
    from stock_market_data_pipeline_spark import tables
    from stock_market_data_pipeline_spark.llm.curation import (
        source_ttr_means,
    )

    docs = tables.load(spark, SF_SMALL, "documents")
    p = plan_str(source_ttr_means(docs))
    assert "Generate" not in p, "token explode crept into TTR scoring"
    keys = re.findall(r"Exchange hashpartitioning\((\w+)", p)
    assert set(keys) == {"source"}, keys


def test_source_quality_filter_scalar_cutoff_no_global_window(spark):
    """The percentile cutoff must be a scalar aggregate cross-joined
    back as a broadcast 1-row frame — NEVER an unpartitioned window,
    which would single-partition-sort every source row (10^7+ domains
    at web scale). Survivors broadcast onto the fact scan."""
    p = plan_str(_q("docs_source_quality_filter")(spark, SF_SMALL))
    assert "Window" not in p, "global window crept into the cutoff"
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_pii_scrub_is_pure_map_side(spark):
    """PII redaction is a single projection over the scan: any
    Exchange in its plan means a join/agg crept into what must stay a
    map-side regex pass (at 100 TB this op IS the corpus scan)."""
    p = plan_str(_q("docs_pii_scrub")(spark, SF_SMALL))
    assert "Exchange" not in p, "shuffle crept into the PII scrub"
    assert "Join" not in p


def test_manifest_pinned_schema_read_keeps_pushdown(spark, tmp_path):
    """The pinned-schema manifest read (schema evolution's NULL-fill
    mechanism) must not cost the scan its scale properties: a
    projection+filter over `table.read()` still reaches the parquet
    scan as PushedFilters with a pruned ReadSchema — an explicit
    reader schema that broke either would quietly turn every evolved
    table into a full-column scan."""
    from pyspark.sql import functions as F

    from stock_market_data_pipeline_spark.manifest import ManifestTable

    df = spark.createDataFrame(
        [("a", "2024-01-0%d" % (i % 3 + 1), float(i)) for i in range(9)],
        "ticker string, trade_date string, close double",
    ).withColumn("trade_date", F.col("trade_date").cast("date"))
    t = ManifestTable.create(df, str(tmp_path / "pp"), ts="trade_date")
    t.add_columns([("venue", "string")])        # evolved: schema forced
    p = plan_str(t.read(spark).where(F.col("close") > 5.0)
                 .select("close"))
    m = re.search(r"PushedFilters: \[([^\]]*)", p)
    assert m and "GreaterThan(close,5.0)" in m.group(1), p[-800:]
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m and m.group(1) == "close:double", m.group(1) if m else p[-400:]


def test_star_edge_relations_have_no_pair_join(spark):
    """r9 pair-explosion caps: the star-edge relations must contain NO
    self-join at all on their edge paths — the minhash form is a
    window min per LSH bucket (zero joins), the embedding form's only
    join is the equi-join against the 1-row-per-cell representative
    frame. A refactor that reintroduces a candidate pair join turns
    O(docs) back into O(pairs) and fails here."""
    from stock_market_data_pipeline_spark.llm import dedup, similarity

    docs = spark.read.parquet(SF_SMALL + "/documents.parquet")
    p = plan_str(dedup.minhash_lsh_star_edges(docs))
    assert "Join" not in p            # no join operator of any kind
    assert "CartesianProduct" not in p

    p = plan_str(dedup.simhash_star_edges(docs))
    assert "Join" not in p            # window min + map-side bit_count
    assert "CartesianProduct" not in p

    emb = spark.read.parquet(SF_SMALL + "/embeddings.parquet")
    p = plan_str(similarity.embedding_star_edges(emb))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert len(re.findall(r"\bSortMergeJoin\b|\bBroadcastHashJoin\b|"
                          r"\bShuffledHashJoin\b", p)) <= 1


def test_dv_read_is_one_broadcast_anti_join(spark, tmp_path):
    """The merge-on-read read tax is exactly ONE BroadcastHashJoin
    LeftAnti against the (bounded-by-deleted-rows) DV relation — no
    shuffle added to the snapshot scan.  A refactor that turns the
    anti-join into a shuffled join (or adds an exchange to the scan
    side) silently re-prices every read of a DV'd table at 100 TB."""
    from pyspark.sql import functions as F

    from stock_market_data_pipeline_spark.manifest import ManifestTable

    df = spark.createDataFrame(
        [("T%d" % (i % 5), "2024-01-0%d" % (i % 3 + 1), float(i))
         for i in range(30)],
        "ticker string, trade_date string, close double",
    ).withColumn("trade_date", F.col("trade_date").cast("date"))
    t = ManifestTable.create(df, str(tmp_path / "dvplan"),
                             ts="trade_date")
    t.delete_where(spark, "close >= 25.0", mode="dv")
    p = plan_str(t.read(spark))
    assert len(re.findall(r"BroadcastHashJoin .*LeftAnti", p)) == 1, p
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p
    # the scan side reaches the anti-join without an added exchange
    assert "Exchange hashpartitioning" not in p, p
    # and a DV-free table's read plan carries NO join at all
    t2 = ManifestTable.create(df, str(tmp_path / "clean"),
                              ts="trade_date")
    assert "Join" not in plan_str(t2.read(spark))


def test_tpch_decorrelated_shapes_no_cartesian(spark):
    """The round-13 TPC-H additions must keep their hand-decorrelated
    plans: no CartesianProduct anywhere; q11's one
    BroadcastNestedLoopJoin is the 1-row scalar-threshold join (the
    q22 pattern) and must stay the ONLY nested-loop site."""
    for name in ("tpch_q2_min_cost_supplier",
                 "tpch_q17_small_qty_revenue",
                 "tpch_q20_excess_suppliers",
                 "tpch_q21_waiting_suppliers",
                 "tpch_q9_product_profit",
                 "tpch_q10_returned_items"):
        p = plan_str(_q(name)(spark, SF_SMALL))
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name
    p = plan_str(_q("tpch_q11_important_stock")(spark, SF_SMALL))
    assert "CartesianProduct" not in p
    assert p.count("BroadcastNestedLoopJoin") == 1


def test_tpch_q21_single_order_grain_aggregate(spark):
    """q21's EXISTS + NOT EXISTS pair must stay reduced to ONE
    order-grain aggregate joined back — a correlated rewrite would
    show as extra semi/anti joins over lineitem."""
    p = plan_str(_q("tpch_q21_waiting_suppliers")(spark, SF_SMALL))
    assert "LeftSemi" not in p and "LeftAnti" not in p
    # lines->join, lines->per_order, per_order->join back: three
    # orderkey exchanges over ONE logical grain (AQE may reuse at
    # runtime); a correlated rewrite would add lineitem rescans
    # beyond this
    assert len(re.findall(r"Exchange hashpartitioning\(l_orderkey",
                          p)) <= 3
    # `lines` (lineitem JOIN orders) evaluates twice — once for the
    # order-grain aggregate, once for the late-line probe: 2x2 scans
    # + supplier.  A correlated rewrite adds scans beyond this.
    assert p.count("FileScan parquet") <= 5


def test_tpch_q6_all_predicates_pushed(spark):
    """q6 is the pushdown litmus: discount and quantity must reach the
    parquet scan as PushedFilters."""
    p = plan_str(_q("tpch_q6_forecast_revenue")(spark, SF_SMALL))
    m = re.search(r"PushedFilters: \[([^\]]*)", p)
    assert m, "no PushedFilters in scan"
    assert "l_discount" in m.group(1) and "l_quantity" in m.group(1)
