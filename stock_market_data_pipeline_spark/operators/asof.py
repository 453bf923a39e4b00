"""Point-in-time (as-of interval) join — J1/J2 in SURVEY.md §2.3.

The reference joins facts to an interval-versioned dimension on an
equi-key plus a date-range predicate
(models/intermediate/int_russell3000__daily.sql:48-51):

    fact INNER JOIN dim
      ON fact.key = dim.key
     AND fact.ts BETWEEN dim.valid_from AND dim.valid_to

Spark strategy: express exactly that — Catalyst hash-joins the equi part
and applies the range predicate as a post-join filter. With a small
dimension (universe snapshots ~10k rows) we broadcast, so at 100 TB the
fact side never shuffles for this join. If the dimension ever outgrows
broadcast, pre-bucket both sides on the key (bucketed sort-merge join)
— the range residual stays a streaming filter either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_interval_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "inner",
    broadcast_dim: bool = True,
    extra_cond: Column | None = None,
    bucket_partitions: int | None = None,
) -> DataFrame:
    """Join ``fact`` to the dimension version valid at the fact timestamp.

    Interval bounds are INCLUSIVE on both ends (reference BETWEEN
    semantics). ``how='inner'`` doubles as universe-membership filtering
    (J2): non-member fact rows drop out.

    Strategy ladder (pick per dim size):
    - ``broadcast_dim=True`` (default): dim ships to every executor,
      the fact never shuffles — right while the dim fits broadcast
      (the reference's ~10k constituents always do).
    - ``broadcast_dim=False, bucket_partitions=N``: both sides
      repartition on the key first, so Catalyst plans a co-located
      sort-merge join with the interval predicate as a streamed
      residual filter — the beyond-broadcast scale path (an interval-
      versioned dim has a handful of rows per key, so the residual
      evaluates on tiny per-key groups).
    - ``broadcast_dim=False`` alone: let AQE pick (skew-join eligible).
    """
    if broadcast_dim:
        d = F.broadcast(dim)
    elif bucket_partitions:
        fact = fact.repartition(bucket_partitions, key)
        d = dim.repartition(bucket_partitions, key)
    else:
        d = dim
    d = d.alias("dim")
    f = fact.alias("fact")
    cond = (
        (F.col(f"fact.{key}") == F.col(f"dim.{key}"))
        & F.col(f"fact.{ts}").between(
            F.col(f"dim.{valid_from}"), F.col(f"dim.{valid_to}")
        )
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    dim_cols = [c for c in dim.columns if c not in (key, valid_from, valid_to)]
    return f.join(d, cond, how).select(
        "fact.*", *[F.col(f"dim.{c}") for c in dim_cols]
    )


def asof_backward_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    prefix: str = "matched_",
) -> DataFrame:
    """Backward as-of join: for each left row, attach the payload of
    the LATEST right row of the same key with ``right_ts <= left_ts``
    (DuckDB ``ASOF JOIN`` / pandas ``merge_asof`` semantics, LEFT
    outer: unmatched left rows keep NULL payloads).

    Spark strategy — the union-window trick, NOT a range join: tag
    both sides, union, and take ``last(payload, ignorenulls=True)``
    over ``(key ORDER BY ts, side)``. One Exchange on the key, one
    sort, zero join — at 100 TB this is a single shuffle of
    left+right, where the naive join-then-max-per-left-row plan is an
    exploding inequality join. Right rows sort BEFORE left rows at
    equal timestamps, giving inclusive ``<=`` semantics.

    ``right`` must be unique per ``(key, right_ts)`` (dedupe first —
    ties inside one timestamp would be resolved arbitrarily).
    """
    pay = F.struct(
        F.col(right_ts).alias(f"{prefix}{right_ts}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in payload_cols],
    )
    l_cols = left.columns
    l = left.select(
        F.col(left_ts).alias("_ats"), F.lit(1).alias("_side"),
        F.lit(None).cast(
            right.select(pay.alias("_rpay")).schema["_rpay"].dataType
        ).alias("_rpay"),
        *l_cols,
    )
    r = right.select(
        F.col(right_ts).alias("_ats"), F.lit(0).alias("_side"),
        pay.alias("_rpay"),
        *[
            (F.col(key) if c == key else F.lit(None).cast(
                dict(left.dtypes)[c]).alias(c))
            for c in l_cols
        ],
    )
    w = (
        Window.partitionBy(key)
        .orderBy("_ats", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        l.unionByName(r)
        .withColumn("_m", F.last("_rpay", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
        .select(*l_cols, "_m.*")
    )
