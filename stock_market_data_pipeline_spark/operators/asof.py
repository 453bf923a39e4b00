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
