"""Catalog entries for reshaping / multi-level-aggregate relational
operators: PIVOT, CUBE + GROUPING(), UNPIVOT, fixed-width histogram,
and a broadcast band (interval) join.

All value sums follow the exact-decimal determinism rule
(SURVEY.md §8.6); bucket/band boundaries are computed with the same
single double division on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .catalog import _t, q

PIVOT_YEARS = list(range(1992, 1999))

_Y_CASES = "\n".join(
    f"       CAST(SUM(CASE WHEN year(CAST(o_orderdate AS DATE)) = {y} "
    f"THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS y{y},"
    for y in PIVOT_YEARS
).rstrip(",")

PIVOT_SQL = f"""
SELECT o_orderpriority AS priority,
{_Y_CASES}
FROM orders
GROUP BY o_orderpriority
""".strip()

CUBE_SQL = """
SELECT o_orderpriority AS priority, o_orderstatus AS status,
       CAST(2 * GROUPING(o_orderpriority) + GROUPING(o_orderstatus)
            AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_price
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
""".strip()


def _unpivot_sql() -> str:
    from . import oracles
    from .models.marts import SMALL
    metrics = ["close", "rsi", "return_m", "volatility_ann"]
    arms = "\nUNION ALL\n".join(
        f"SELECT ticker, '{m}' AS metric, {m} AS value FROM dim"
        for m in metrics)
    return f"WITH dim AS ({oracles.securities_dim_sql(SMALL)})\n{arms}"


HISTOGRAM_SQL = """
WITH b AS (
  SELECT CAST(FLOOR(l_extendedprice / 5000.0) AS BIGINT) AS bucket,
         l_extendedprice AS p
  FROM lineitem
)
SELECT bucket, bucket * 5000.0 AS bucket_lo,
       (bucket + 1) * 5000.0 AS bucket_hi,
       COUNT(*) AS n, MIN(p) AS min_price, MAX(p) AS max_price,
       CAST(COUNT(*) AS DOUBLE)
         / CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS share
FROM b
GROUP BY bucket
""".strip()

BAND_JOIN_SQL = """
WITH bands AS (
  SELECT i AS band_id, i * 250.0 AS lo, (i + 1) * 250.0 AS hi
  FROM (SELECT unnest(generate_series(0, 9)) AS i)
)
SELECT CAST(band_id AS BIGINT) AS band_id, lo, hi,
       COUNT(p_partkey) AS n_parts,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_price
FROM bands LEFT JOIN part
  ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band_id, lo, hi
""".strip()


@q("pivot_priority_year", PIVOT_SQL)
def pivot_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order totals reshaped to one column per year with an
    EXPLICIT pivot value list — without it Spark must run an extra
    distinct-collect job to discover columns (a full scan before the
    real one), which is the difference between one pass and two at
    100 TB. Exact-decimal sums; empty cells are NULL on both engines
    (SUM over no rows)."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.year(F.col("o_orderdate").cast("date")).alias("yr"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("tp"))
    piv = (o.groupBy("priority").pivot("yr", PIVOT_YEARS)
           .agg(F.sum("tp").cast("double")))
    return piv.select(
        "priority", *[F.col(str(y)).alias(f"y{y}") for y in PIVOT_YEARS])


@q("cube_order_stats", CUBE_SQL)
def cube_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (priority, status) with a GROUPING() id so consumers
    can tell a real NULL from a subtotal row — all four grouping sets
    in ONE shuffle (Spark expands the cube map-side and aggregates
    once), vs four separate GROUP BYs = four scans + four shuffles."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube(F.col("o_orderpriority").alias("priority"),
               F.col("o_orderstatus").alias("status"))
        .agg(F.grouping_id().cast("long").alias("gid"),
             F.count("*").alias("n_orders"),
             F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
             .cast("double").alias("total_price"))
    )


@q("unpivot_dim_metrics", _unpivot_sql())
def unpivot_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide->long melt) of the securities dim's metric
    columns — pure map-side reshape, zero shuffle: each row expands to
    K (metric, value) rows in place (the oracle's UNION ALL re-scans
    the input K times instead; Spark's unpivot reads it once)."""
    from .catalog import QUERIES

    dim = QUERIES["dim_securities_current"](spark, sf_dir)
    return dim.unpivot(
        ["ticker"], ["close", "rsi", "return_m", "volatility_ann"],
        "metric", "value")


@q("histogram_prices", HISTOGRAM_SQL)
def histogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of extended prices: bucket = one shared
    double division + floor (bit-identical cross-engine), per-bucket
    count/min/max plus global share via a single-partition window over
    the ~25 bucket rows (scale-safe: the window input is bucket-grain,
    not row-grain)."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_extendedprice") / F.lit(5000.0)).cast("long")
        .alias("bucket"),
        F.col("l_extendedprice").alias("p"))
    agg = (li.groupBy("bucket")
           .agg(F.count("*").alias("n"), F.min("p").alias("min_price"),
                F.max("p").alias("max_price")))
    return agg.select(
        "bucket",
        (F.col("bucket") * 5000.0).alias("bucket_lo"),
        ((F.col("bucket") + 1) * 5000.0).alias("bucket_hi"),
        "n", "min_price", "max_price",
        (F.col("n").cast("double")
         / F.sum("n").over(Window.partitionBy()).cast("double"))
        .alias("share"),
    )


@q("band_range_join", BAND_JOIN_SQL)
def band_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band (interval) join: parts matched to price bands on a pure
    range predicate. The 10-row band dim is explicitly broadcast, so
    the plan is a BroadcastNestedLoopJoin where the FACT side streams
    map-side — the only scale-safe shape for a non-equi join with a
    tiny interval table (never shuffle the fact). LEFT keeps empty
    bands (count 0, NULL sum) on both engines."""
    bands = spark.createDataFrame(
        [(i, i * 250.0, (i + 1) * 250.0) for i in range(10)],
        "band_id long, lo double, hi double")
    part = _t(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_retailprice").alias("pr"))
    # fact INNER-joins the broadcast bands (fact streams map-side);
    # empty bands come back via a tiny band-grain left join AFTER the
    # aggregate — never an outer join against the fact itself
    hit = (part.join(F.broadcast(bands),
                     (part.pr >= bands.lo) & (part.pr < bands.hi))
           .groupBy("band_id")
           .agg(F.count("p_partkey").alias("n_parts"),
                F.sum(F.col("pr").cast("decimal(18,2)")).cast("double")
                .alias("total_price")))
    return (bands.join(F.broadcast(hit), "band_id", "left")
            .select("band_id", "lo", "hi",
                    F.coalesce("n_parts", F.lit(0)).alias("n_parts"),
                    "total_price"))


QUANTILES_SQL = """
SELECT p_brand AS brand,
       COUNT(*) AS n,
       quantile_cont(p_retailprice, 0.25) AS q1,
       quantile_cont(p_retailprice, 0.50) AS q2,
       quantile_cont(p_retailprice, 0.75) AS q3,
       quantile_cont(p_retailprice, 0.75)
         - quantile_cont(p_retailprice, 0.25) AS iqr
FROM part
GROUP BY p_brand
""".strip()

SETOPS_SQL = """
WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE year(CAST(o_orderdate AS DATE)) = 1995),
y96 AS (SELECT DISTINCT o_custkey FROM orders
        WHERE year(CAST(o_orderdate AS DATE)) = 1996)
SELECT 'both_years' AS op, o_custkey
FROM (SELECT o_custkey FROM y95 INTERSECT SELECT o_custkey FROM y96)
UNION ALL
SELECT 'only_1995' AS op, o_custkey
FROM (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y96)
UNION ALL
SELECT 'only_1996' AS op, o_custkey
FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y95)
""".strip()


@q("quantiles_by_brand", QUANTILES_SQL)
def quantiles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped quantiles (percentile_cont semantics, linear
    interpolation — verified bit-identical to DuckDB's quantile_cont).
    Exact percentile needs the full per-group value multiset, so at
    very large per-group cardinality switch to approx_percentile (the
    t-digest sketch, mergeable map-side); here groups are bounded so
    exact is both correct and cheap."""
    pt = _t(spark, sf_dir, "part")
    qt = (pt.groupBy(F.col("p_brand").alias("brand"))
          .agg(F.count("*").alias("n"),
               F.percentile("p_retailprice", 0.25).alias("q1"),
               F.percentile("p_retailprice", 0.50).alias("q2"),
               F.percentile("p_retailprice", 0.75).alias("q3")))
    return qt.withColumn("iqr", F.col("q3") - F.col("q1"))


@q("except_intersect_keys", SETOPS_SQL)
def setops_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators (INTERSECT / EXCEPT, distinct semantics) over
    year-sliced customer key sets, tagged and stacked. Spark plans
    these as hash semi/anti joins on the key — co-partitioned, no
    row explosion."""
    o = _t(spark, sf_dir, "orders")
    yr = F.year(F.col("o_orderdate").cast("date"))
    y95 = o.where(yr == 1995).select("o_custkey").distinct()
    y96 = o.where(yr == 1996).select("o_custkey").distinct()
    tag = lambda df, t: df.select(F.lit(t).alias("op"), "o_custkey")  # noqa: E731
    return (tag(y95.intersect(y96), "both_years")
            .unionByName(tag(y95.exceptAll(y96.select("o_custkey")), "only_1995"))
            .unionByName(tag(y96.exceptAll(y95.select("o_custkey")), "only_1996")))


BUCKETED_JOIN_SQL = """
SELECT l_orderkey AS order_id, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
         AS total_qty,
       CAST(MAX(o_totalprice) AS DOUBLE) AS order_total
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_orderkey
""".strip()


@q("bucketed_join_revenue", BUCKETED_JOIN_SQL)
def bucketed_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-time bucketing as the shuffle eliminator: both sides are
    written `bucketBy(8, key)` into a scratch-LOCATION database, and
    the join + per-key aggregate then plan with ZERO Exchange (the
    shuffle was pre-paid once at write) — asserted here, not assumed.
    The values must still match a plain oracle join, proving bucketing
    changed the PLAN and not the result."""
    from .operators.layout import write_bucketed
    from .scratch import scratch_dir

    db = "bucketed_cat"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} "
              f"LOCATION '{scratch_dir('bucketed_wh_')}'")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice")
    write_bucketed(li, f"{db}.li_b", "l_orderkey", n_buckets=8)
    write_bucketed(o, f"{db}.ord_b", "l_orderkey", n_buckets=8)

    joined = (
        spark.table(f"{db}.li_b")
        .join(spark.table(f"{db}.ord_b"), "l_orderkey")
        .groupBy(F.col("l_orderkey").alias("order_id"))
        .agg(F.count("*").alias("n_items"),
             F.sum(F.col("l_quantity").cast("decimal(18,2)"))
             .cast("double").alias("total_qty"),
             F.max("o_totalprice").cast("double").alias("order_total"))
    )
    # no SHUFFLE exchange anywhere: the bucketed scan's partitioning
    # satisfies both the join and the per-key aggregate. (A broadcast
    # exchange may appear if AQE broadcasts the small side — that
    # moves bytes once, it does not repartition the fact.)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, \
        "bucketed join/agg must not shuffle"
    assert "Exchange SinglePartition" not in plan
    return joined
