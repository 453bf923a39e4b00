"""TPC-H-shaped relational operators beyond q1/q3/q5 (catalog.py):
the semi-join, outer-join-distribution, scalar-max, anti-join,
disjunctive-predicate and market-share query shapes, adapted to the
driver's simplified TPC-H-ish schema (no partsupp/comment columns —
lineitem is the part↔supplier bridge where the original uses
partsupp).

Why these shapes matter for the engine: each exercises a distinct
Catalyst plan family a 100 TB user will hit — LeftSemi pushed below an
aggregate (q4/q18), a selective dim broadcast under a disjunctive OR
that must NOT collapse to a cross join (q19), a left-outer fact count
preserving zero groups (q13), a scalar aggregate reused as a filter
(q15), NOT IN/NOT EXISTS anti joins (q16/q22), and a two-sided
conditional national flow (q7/q8).  All money math goes through
DECIMAL(18,4) partial sums (association-order-independent) and is cast
to double only at the boundary — the repo-wide float-parity rule.

Reference parity: the reference's dbt marts express the same shapes in
Snowflake SQL (conditional aggregation over joined facts —
models/marts/agg_daily_market_breadth.sql; key-correlated subqueries —
analyses/*.sql); these entries prove the engine handles them at
TPC-H cardinalities with the plans Spark should pick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import _t, q

_REV_DEC = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))"


def _rev():
    return (F.col("l_extendedprice")
            * (1 - F.col("l_discount"))).cast("decimal(18,4)")


@q("tpch_q4_priority_semijoin", f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'
  AND o_orderkey IN (SELECT l_orderkey FROM lineitem
                     WHERE {_REV_DEC} > 90000)
GROUP BY o_orderpriority
""")
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-style semi join — orders in a quarter
    having at least one high-value line, counted by priority (the
    original's commit<receipt predicate has no column here; a
    high-value-line predicate keeps the selectivity).  The Spark plan
    must be a LEFT SEMI hash join on orderkey (one shuffle, no
    dedup-then-inner-join double shuffle), with the date filter pushed
    to the orders scan so the semi probe side is already a quarter,
    not seven years."""
    orders = _t(spark, sf_dir, "orders").where(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01"))
        & (F.to_date("o_orderdate") < F.lit("1996-04-01")))
    hot = _t(spark, sf_dir, "lineitem").where(
        _rev() > 90000).select("l_orderkey")
    return (orders.join(hot, orders.o_orderkey == hot.l_orderkey,
                        "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("order_count")))


@q("tpch_q7_volume_shipping", f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year,
         {_REV_DEC} AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01'
                                     AND DATE '1997-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""")
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: volume shipped between two specific nations by
    year — the two-sided national-flow join where the nation dim joins
    the fact TWICE under different roles (supplier's vs customer's
    nation) and the pair predicate couples them.  Both nation joins
    broadcast; the pair filter applies after both are attached (a
    residual, not a join key), so the only shuffles are the
    orderkey/custkey fact joins."""
    n = _t(spark, sf_dir, "nation")
    li = _t(spark, sf_dir, "lineitem").where(
        F.to_date("l_shipdate").between("1996-01-01", "1997-12-31"))
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = n.select(F.col("n_nationkey").alias("s_nkey"),
                  F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nkey"),
                  F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1")
        & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2")
        & (F.col("cust_nation") == "NATION_1")
    )
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
            .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
            .where(pair)
            .withColumn("l_year", F.year("l_shipdate").cast("bigint"))
            .groupBy("supp_nation", "cust_nation", "l_year")
            .agg(F.sum(_rev()).cast("double").alias("revenue")))


@q("tpch_q8_market_share", f"""
SELECT o_year,
       CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         {_REV_DEC} AS volume,
         n1.n_name AS nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region   ON n2.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
) flows
GROUP BY o_year
""")
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's market share inside a region by
    year — conditional aggregation (share = conditional sum / total
    sum) over an 8-table join.  The division happens ONCE per group on
    already-exact DECIMAL partials cast to double, so the ratio is
    bit-stable against the oracle regardless of row order.  Every dim
    broadcasts; lineitem→orders is the only large shuffle pair."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    n2 = (n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
          .select(F.col("n_nationkey").alias("c_nkey")))
    n1 = n.select(F.col("n_nationkey").alias("s_nkey"),
                  F.col("n_name").alias("nation"))
    flows = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
             .join(o, li.l_orderkey == o.o_orderkey)
             .join(c, o.o_custkey == c.c_custkey)
             .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
             .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
             .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey")))
    vol = _rev()
    zero = F.lit(0).cast("decimal(18,4)")
    return (flows
            .withColumn("o_year", F.year("o_orderdate").cast("bigint"))
            .groupBy("o_year")
            .agg((F.sum(F.when(F.col("nation") == "NATION_3", vol)
                        .otherwise(zero)).cast("double")
                  / F.sum(vol).cast("double")).alias("mkt_share")))


@q("tpch_q13_order_distribution", """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
""")
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count with
    a join-condition filter — the LEFT OUTER + COUNT(col) idiom where
    customers with zero qualifying orders must appear as c_count = 0
    (an inner join silently drops them; COUNT(*) would wrongly count
    the null row as 1).  Two aggregations, the second over the first's
    output — tiny, but the first one's shuffle is the honest cost."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_outer")
            .groupBy("c_custkey")
            .agg(F.count("o_orderkey").alias("c_count"))
            .groupBy("c_count")
            .agg(F.count("*").alias("custdist")))


@q("tpch_q15_top_supplier", f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM({_REV_DEC}) AS total_rev
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
    AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       CAST(total_rev AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
""")
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the top-revenue supplier in a quarter — a
    derived aggregate reused twice (once as the join input, once
    reduced to a scalar MAX that filters it).  The equality comparison
    runs on the EXACT decimal totals (never on doubles, where two
    different addition orders could split a tie); the cast to double
    happens only in the output.  Spark caches nothing: the revenue agg
    is tiny (one row per supplier) and AQE reuses the exchange."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1996-04-01")))
    rev = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
           .agg(F.sum(_rev()).alias("total_rev")))
    mx = rev.agg(F.max("total_rev").alias("mx"))
    s = _t(spark, sf_dir, "supplier")
    return (s.join(rev, s.s_suppkey == rev.supplier_no)
            .join(F.broadcast(mx), F.col("total_rev") == F.col("mx"))
            .select("s_suppkey", "s_name",
                    F.col("total_rev").cast("double")
                    .alias("total_revenue")))


@q("tpch_q16_supplier_cnt", """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""")
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    with a NOT IN supplier exclusion (the original's partsupp bridge
    and comment LIKE become the lineitem bridge and a negative-balance
    exclusion — same plan shape: anti join against a subquery, then
    COUNT(DISTINCT) over a selective dim join).  The exclusion list is
    scalar-small → broadcast LEFT ANTI; the part filter broadcasts;
    the distinct count is the only shuffle of fact grain."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15))
    bad = _t(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0).select("s_suppkey")
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .join(F.broadcast(bad),
                  li.l_suppkey == bad.s_suppkey, "left_anti")
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


@q("tpch_q18_large_orders", """
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey
                     HAVING SUM(l_quantity) > 250)
GROUP BY c_name, c_custkey, o_orderkey, order_date, o_totalprice
""")
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders — the aggregate-HAVING
    subquery as a semi-join filter.  The quantity rollup runs ONCE and
    serves both the HAVING filter and the output sum (self-semi-join
    on the aggregated frame, not a second lineitem scan); at 100 TB
    the orderkey aggregate is the natural pre-shuffle combine and the
    >250 filter cuts it to a sliver before the customer join, which
    then broadcasts the sliver side."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    per_order = (li.groupBy("l_orderkey")
                 .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                      .alias("qty")))
    big = per_order.where(F.col("qty") > 250)
    return (o.join(big, o.o_orderkey == big.l_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .select("c_name", "c_custkey", "o_orderkey",
                    F.to_date("o_orderdate").alias("order_date"),
                    "o_totalprice",
                    F.col("qty").cast("double").alias("sum_qty")))


@q("tpch_q19_disjunctive_rev", f"""
SELECT CAST(SUM({_REV_DEC}) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity >= 10 AND l_quantity <= 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity >= 20 AND l_quantity <= 40)
""")
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive (OR-of-ANDs) predicates spanning
    BOTH join sides — the optimizer trap where a naive plan evaluates
    the OR after a full join.  Catalyst extracts the common
    brand-membership as a pushable part filter
    (p_brand IN Brand#1/2/3 implied by the disjunction) and keeps the
    cross-side conjuncts as join residuals; the part side broadcasts.
    Single-row output: exact decimal sum cast once."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    d1 = ((F.col("p_brand") == "Brand#1")
          & F.col("p_size").between(1, 15)
          & F.col("l_quantity").between(1, 20))
    d2 = ((F.col("p_brand") == "Brand#2")
          & F.col("p_size").between(10, 30)
          & F.col("l_quantity").between(10, 30))
    d3 = ((F.col("p_brand") == "Brand#3")
          & F.col("p_size").between(20, 50)
          & F.col("l_quantity").between(20, 40))
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .where(d1 | d2 | d3)
            .agg(F.sum(_rev()).cast("double").alias("revenue"),
                 F.count("*").alias("n_items")))


@q("tpch_q22_anti_join", """
WITH pool AS (
  SELECT * FROM customer WHERE c_nationkey < 10
),
avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
           / COUNT(*) AS a
  FROM pool WHERE c_acctbal > 0
)
SELECT c_nationkey AS nation_key, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
         AS totacctbal
FROM pool
WHERE c_acctbal > (SELECT a FROM avg_bal)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND CAST(o_orderdate AS DATE) >= DATE '2000-01-01')
GROUP BY c_nationkey
""")
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with NO recent
    orders — a scalar aggregate filter plus a NOT EXISTS anti join
    (the original's phone-prefix pool becomes a nationkey pool; the
    no-orders-at-all clause becomes no-orders-since-2000, because this
    synthetic workload gives every customer historic orders).  The
    scalar avg is computed from exact decimal partials THEN divided
    once (both engines do the identical division); the anti join
    probes only the recent-orders slice, not the whole orders table."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_nationkey") < 10)
    recent = _t(spark, sf_dir, "orders").where(
        F.to_date("o_orderdate") >= F.lit("2000-01-01")
    ).select("o_custkey")
    avg_bal = (c.where(F.col("c_acctbal") > 0)
               .agg((F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                     .cast("double") / F.count("*")).alias("a")))
    return (c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("a"))
            .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
            .groupBy(F.col("c_nationkey").alias("nation_key"))
            .agg(F.count("*").alias("numcust"),
                 F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                 .cast("double").alias("totacctbal")))


@q("tpch_q17_small_qty_revenue", """
WITH sel AS (
  SELECT p_partkey FROM part
  WHERE p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15
),
part_avg AS (
  SELECT l_partkey, 0.2 * AVG(CAST(l_quantity AS DOUBLE)) AS lim
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM sel)
  GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
         / 7.0 AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part_avg ON lineitem.l_partkey = part_avg.l_partkey
WHERE CAST(l_quantity AS DOUBLE) < lim
""")
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: the per-key CORRELATED SCALAR-AVERAGE
    subquery — revenue lost to small-quantity orders of one brand's
    small parts, where "small quantity" is defined per part as 20%
    of ITS OWN average (no p_container in this schema; the brand +
    size band keeps the selectivity).  The scale-correct plan is the
    decorrelation Catalyst should pick and this entry hand-declares:
    ONE grouped aggregate over the selected parts' lines builds the
    per-part limits, then a broadcast/hash join filters the same
    lines against their own part's limit — never a per-row rescan of
    lineitem (the naive correlated plan is O(lines × parts) at
    100 TB).  Money through DECIMAL partials, one double division at
    the boundary (rev parity rule)."""
    li = _t(spark, sf_dir, "lineitem")
    sel = (_t(spark, sf_dir, "part")
           .where((F.col("p_brand") == "Brand#2")
                  & F.col("p_size").between(1, 15))
           .select("p_partkey"))
    lines = li.join(F.broadcast(sel),
                    li.l_partkey == F.col("p_partkey")).drop("p_partkey")
    lim = (lines.groupBy("l_partkey")
           .agg((F.avg(F.col("l_quantity").cast("double")) * 0.2)
                .alias("lim")))
    return (lines.join(lim, "l_partkey")
            .where(F.col("l_quantity").cast("double") < F.col("lim"))
            .agg((F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
                  .cast("double") / 7.0).alias("avg_yearly"),
                 F.count("*").alias("n_lines")))


@q("tpch_q20_excess_suppliers", """
WITH green AS (
  SELECT p_partkey FROM part WHERE p_name LIKE '%red%'
),
part_half AS (
  SELECT l_partkey,
         0.5 * CAST(SUM(l_quantity) AS DOUBLE) AS half_total
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
    AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
    AND l_partkey IN (SELECT p_partkey FROM green)
  GROUP BY l_partkey
),
heavy AS (
  SELECT l_suppkey FROM lineitem
  JOIN part_half ON lineitem.l_partkey = part_half.l_partkey
  WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
    AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
  GROUP BY l_suppkey, lineitem.l_partkey
  HAVING CAST(SUM(l_quantity) AS DOUBLE) > MAX(half_total)
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_nationkey < 5
  AND s_suppkey IN (SELECT l_suppkey FROM heavy)
""")
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: the NESTED IN-CHAIN (supplier IN (pairs over
    parts IN (name-filtered parts)) with a correlated half-of-total
    threshold) — suppliers in a nation band who shipped MORE THAN
    HALF of some red part's 1997 volume (this schema has no
    partsupp/availqty; lineitem is the part-supplier bridge, and
    "excess stock" becomes "dominant shipper", which preserves every
    planner shape: two stacked semi joins, a grouped HAVING against a
    correlated per-part scalar).  The scale plan: the red-part
    filter broadcasts into the 1997 lineitem slice ONCE, per-part
    halves and per-(supplier,part) sums come off the SAME shuffled
    grain, and suppliers semi-join the surviving pairs — no rescan,
    no correlated re-aggregation."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.to_date("l_shipdate") >= F.lit("1997-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1998-01-01")))
    green = (_t(spark, sf_dir, "part")
             .where(F.col("p_name").like("%red%"))
             .select("p_partkey"))
    gl = li.join(F.broadcast(green),
                 li.l_partkey == F.col("p_partkey")).drop("p_partkey")
    pair = (gl.groupBy("l_suppkey", "l_partkey")
            .agg(F.sum("l_quantity").cast("double").alias("qty")))
    half = (pair.groupBy("l_partkey")
            .agg((F.sum("qty") * 0.5).alias("half_total")))
    heavy = (pair.join(half, "l_partkey")
             .where(F.col("qty") > F.col("half_total"))
             .select("l_suppkey"))
    s = _t(spark, sf_dir, "supplier").where(F.col("s_nationkey") < 5)
    return (s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
            .select("s_suppkey", "s_name"))


@q("tpch_q21_waiting_suppliers", """
WITH lines AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN CAST(l_shipdate AS DATE)
                   > CAST(o_orderdate AS DATE) + INTERVAL 60 DAY
              THEN 1 ELSE 0 END AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
)
SELECT s_name, COUNT(*) AS numwait
FROM lines l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE s_nationkey = 3
  AND l1.is_late = 1
  AND EXISTS (SELECT 1 FROM lines l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lines l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.is_late = 1)
GROUP BY s_name
""")
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the EXISTS + NOT EXISTS pair over the SAME
    relation — suppliers in one nation who were the ONLY late shipper
    on a finished multi-supplier order (no receipt/commit dates in
    this schema: late = shipped >60 days after the order date).  The
    scale-correct plan avoids BOTH correlated rescans by reducing the
    order grain ONCE: per (orderkey) count suppliers and late
    suppliers, then join the late lines against that one aggregate —
    EXISTS becomes n_supp > 1, NOT-EXISTS-other-late becomes
    n_late_supp == 1 (this supplier being the late one), each a
    single shuffle on orderkey, no double semi-join rescan of a
    100 TB fact."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    lines = (li.join(o, li.l_orderkey == o.o_orderkey)
             .select("l_orderkey", "l_suppkey",
                     (F.to_date("l_shipdate")
                      > F.date_add(F.to_date("o_orderdate"), 60))
                     .cast("int").alias("is_late")))
    per_order = (lines.groupBy("l_orderkey")
                 .agg(F.countDistinct("l_suppkey").alias("n_supp"),
                      F.countDistinct(F.when(F.col("is_late") == 1,
                                             F.col("l_suppkey")))
                      .alias("n_late_supp")))
    s = _t(spark, sf_dir, "supplier").where(F.col("s_nationkey") == 3)
    return (lines.where(F.col("is_late") == 1)
            .join(per_order, "l_orderkey")
            .where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
            .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy("s_name")
            .agg(F.count("*").alias("numwait")))


@q("tpch_q6_forecast_revenue", f"""
SELECT CAST(SUM(CAST(l_extendedprice * l_discount
                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""")
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the pure scan-and-aggregate revenue forecast — the
    predicate-pushdown litmus (date + discount + quantity all reach
    the parquet scan as PushedFilters; the plan is one
    WholeStageCodegen span over a pruned scan, zero shuffles beyond
    the final 1-row agg).  Money through DECIMAL partials."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.where(
        (F.to_date("l_shipdate") >= F.lit("1997-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1998-01-01"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24))
        .agg(F.sum((F.col("l_extendedprice") * F.col("l_discount"))
                   .cast("decimal(18,4)"))
             .cast("double").alias("revenue"),
             F.count("*").alias("n_lines")))


@q("tpch_q14_promo_effect", f"""
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                             THEN {_REV_DEC} ELSE CAST(0 AS
                             DECIMAL(18,4)) END) AS DOUBLE)
            / CAST(SUM({_REV_DEC}) AS DOUBLE) AS promo_pct,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE CAST(l_shipdate AS DATE) >= DATE '1997-03-01'
  AND CAST(l_shipdate AS DATE) < DATE '1997-04-01'
""")
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promotion-revenue share for one month — the
    conditional-numerator / total-denominator single-agg shape over a
    broadcast part join (the month slice of lineitem is the probe
    side; part is the broadcast build side at any scale where part
    fits executor memory, and a shuffled hash join beyond).  BOTH
    sums are exact DECIMAL partials, cast to double BEFORE the
    100.0-multiply and the division in the same left-to-right order
    on both engines (a decimal-side multiply drifts 1 ulp)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.to_date("l_shipdate") >= F.lit("1997-03-01"))
        & (F.to_date("l_shipdate") < F.lit("1997-04-01")))
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    zero = F.lit(0).cast("decimal(18,4)")
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .agg((F.lit(100.0)
                  * F.sum(F.when(F.col("p_type") == "PROMO", _rev())
                          .otherwise(zero)).cast("double")
                  / F.sum(_rev()).cast("double")).alias("promo_pct"),
                 F.count("*").alias("n_lines")))


@q("tpch_q12_priority_by_flag", """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
  AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 30
GROUP BY l_returnflag
""")
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: slow shipments split by priority class — a
    fact-fact join with a CROSS-TABLE residual predicate (shipdate >
    orderdate + 30: it cannot push to either scan, only to the join
    residual) feeding conditional counts grouped by a lineitem
    attribute (l_returnflag stands in for the absent l_shipmode).
    One shuffle on orderkey, one on the group key — at 100 TB the
    orderkey exchange dominates and AQE's skew split is the relief
    valve."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.to_date("l_shipdate") >= F.lit("1997-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1998-01-01")))
    o = _t(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .where(F.to_date("l_shipdate")
                   > F.date_add(F.to_date("o_orderdate"), 30))
            .groupBy("l_returnflag")
            .agg(F.sum(hi.cast("long")).alias("high_line_count"),
                 F.sum((~hi).cast("long")).alias("low_line_count")))


@q("tpch_q10_returned_items", f"""
SELECT c_custkey, c_name, n_name,
       CAST(SUM({_REV_DEC}) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
  AND CAST(o_orderdate AS DATE) < DATE '1997-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""")
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by lost (returned) revenue in a
    quarter — the classic snowflake join into a grouped top-k.  The
    scale plan: the quarter filter pushes to the ORDERS scan (the
    small side after pruning), returnflag pushes to lineitem, nation
    broadcasts, and the final ORDER BY ... LIMIT is
    TakeOrderedAndProject (never a global sort).  Deterministic
    tie-break on c_custkey so both engines cut the same 20."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.to_date("o_orderdate") >= F.lit("1997-01-01"))
        & (F.to_date("o_orderdate") < F.lit("1997-04-01")))
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("c_custkey", "c_name", "n_name")
            .agg(F.sum(_rev()).cast("double").alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("c_custkey"))
            .limit(20))


@q("tpch_q9_product_profit", f"""
SELECT n_name AS nation, EXTRACT(year FROM l_shipdate) AS o_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     - 0.5 * p_retailprice * l_quantity
                     AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%blue%'
GROUP BY 1, 2
""")
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by supplier nation and
    year — the widest join tree in the roster (fact + 3 dims; the
    original's partsupp.ps_supplycost has no table here, so cost =
    0.5 * p_retailprice * quantity, which preserves the
    profit-expression-over-joined-columns shape).  Part filters on
    name BEFORE the join (column-pruned broadcast); profit is ONE
    DECIMAL expression so partial aggregation stays
    association-order-free."""
    li = _t(spark, sf_dir, "lineitem")
    p = (_t(spark, sf_dir, "part")
         .where(F.col("p_name").like("%blue%"))
         .select("p_partkey", "p_retailprice"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey",
                                             "s_nationkey")
    n = _t(spark, sf_dir, "nation")
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
              ).cast("decimal(18,4)")
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("l_shipdate").alias("o_year"))
            .agg(F.sum(profit).cast("double").alias("sum_profit")))


@q("tpch_q11_important_stock", f"""
WITH pairvals AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice * (1 - l_discount)
                  AS DECIMAL(18,4))) AS val
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey = 7
  GROUP BY l_partkey
)
SELECT l_partkey AS partkey, CAST(val AS DOUBLE) AS value
FROM pairvals
WHERE val > (SELECT CAST(SUM(val) * 0.001 AS DECIMAL(18,4))
             FROM pairvals)
""")
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts holding an outsized share of one
    nation's supply value — a grouped aggregate compared against a
    SCALAR FRACTION OF ITS OWN TOTAL (the HAVING-subquery form; no
    partsupp, so value = that nation's shipped revenue per part).
    The plan computes the per-part grain ONCE, derives the global
    threshold from the SAME grain (a 1-row broadcast), and filters —
    never two scans of the fact.  Both the per-part values and the
    threshold stay DECIMAL until the boundary so the > comparison is
    exact on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    s = (_t(spark, sf_dir, "supplier")
         .where(F.col("s_nationkey") == 7).select("s_suppkey"))
    vals = (li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .groupBy("l_partkey")
            .agg(F.sum(_rev()).alias("val")))
    thresh = vals.agg((F.sum("val") * 0.001)
                      .cast("decimal(18,4)").alias("cut"))
    return (vals.join(F.broadcast(thresh),
                      F.col("val") > F.col("cut"))
            .select(F.col("l_partkey").alias("partkey"),
                    F.col("val").cast("double").alias("value")))


@q("tpch_q2_min_cost_supplier", """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(l_extendedprice AS DOUBLE)
             / CAST(l_quantity AS DOUBLE)) AS unit_cost
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE' AND l_quantity > 0
  GROUP BY 1, 2
),
best AS (
  SELECT l_partkey, MIN(unit_cost) AS best_cost
  FROM cost GROUP BY 1
)
SELECT p_partkey, s_name, n_name, best_cost AS unit_cost
FROM cost
JOIN best ON cost.l_partkey = best.l_partkey
         AND cost.unit_cost = best.best_cost
JOIN part     ON cost.l_partkey = p_partkey
JOIN supplier ON cost.l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_size BETWEEN 10 AND 25 AND p_type = 'LARGE'
""")
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the CORRELATED-MIN supplier pick — for each
    sized/typed part, the European supplier(s) offering exactly the
    regional minimum unit cost (no partsupp: unit cost = the
    supplier's best observed price-per-unit from lineitem).  The
    decorrelated plan this entry declares is the one that survives
    100 TB: per-(part,supplier) mins on ONE shuffled grain, per-part
    minima derived from that SAME grain, then an equality self-join
    — Catalyst's rewrite of the original's correlated subquery,
    hand-written so no per-part rescan can sneak in.  Unit cost stays
    DOUBLE end-to-end: a single IEEE division is bit-identical on
    both engines (no sum-order exposure), where a DECIMAL(18,6)
    rounding of the same ratio sits on half-boundaries."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 0)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = (_t(spark, sf_dir, "region")
         .where(F.col("r_name") == "EUROPE"))
    eu_sup = (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
              .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
              .select("s_suppkey", "s_name", "n_name"))
    cost = (li.join(F.broadcast(eu_sup.select("s_suppkey")),
                    li.l_suppkey == F.col("s_suppkey"))
            .groupBy("l_partkey", "l_suppkey")
            .agg(F.min(F.col("l_extendedprice").cast("double")
                       / F.col("l_quantity").cast("double"))
                 .alias("unit_cost")))
    best = (cost.groupBy("l_partkey")
            .agg(F.min("unit_cost").alias("best_cost"))
            .withColumnRenamed("l_partkey", "best_partkey"))
    p = (_t(spark, sf_dir, "part")
         .where(F.col("p_size").between(10, 25)
                & (F.col("p_type") == "LARGE"))
         .select("p_partkey"))
    return (cost.join(best,
                      (F.col("l_partkey") == F.col("best_partkey"))
                      & (F.col("unit_cost") == F.col("best_cost")))
            .drop("best_partkey")
            .join(F.broadcast(p), cost.l_partkey == p.p_partkey)
            .join(F.broadcast(eu_sup),
                  cost.l_suppkey == eu_sup.s_suppkey)
            .select("p_partkey", "s_name", "n_name",
                    F.col("best_cost").alias("unit_cost")))
