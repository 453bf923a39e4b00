"""Skew mitigation: key salting for aggregations and joins.

At 100 TB a handful of hot keys (one ticker on a crash day, one hot
shingle, one whale user) can pin a single reducer while the rest of
the cluster idles. AQE's skew-join handling covers sort-merge joins;
these helpers cover the remaining cases explicitly:

- salted_agg: two-phase aggregation — partial aggregate on
  (key, salt), then final aggregate on key. The hot key's rows spread
  over ``n_salts`` reducers in phase one; phase two combines
  ``n_salts`` partials per key. Works for any algebraic aggregate
  (sum/count/min/max — pass the merge expressions).
- salted_broadcast_left: replicate the (small) right side per salt so
  a skewed equi-join spreads the hot key's probe rows. (For two large
  sides, prefer AQE skew-join or range-bucketing.)

Salting changes physical distribution only — results are identical,
which the unit tests assert.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, col_name: str = "__salt") -> DataFrame:
    """Uniform random-ish salt derived from a stable row hash (not
    rand(): deterministic under retries/speculative execution, which
    matters for exactly-once sinks)."""
    return df.withColumn(
        col_name,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
               F.lit(n_salts)).cast("int"))


def salted_agg(df: DataFrame, keys: list[str],
               partial_aggs: list[Column],
               final_aggs: list[Column],
               n_salts: int = 16) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial_aggs``: aggregates over (keys + salt), each aliased;
    ``final_aggs``: aggregates combining the partials per key (refer
    to the partial aliases), each aliased to the output name.

    Example — skew-safe sum/count:
        salted_agg(df, ["k"],
                   [F.sum("v").alias("s"), F.count("*").alias("c")],
                   [F.sum("s").alias("total"), F.sum("c").alias("n")])
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_broadcast_left(fact: DataFrame, dim: DataFrame, key: str,
                          n_salts: int = 16,
                          keep_salt: bool = False) -> DataFrame:
    """Skewed fact ⋈ small dim: salt the fact's key, explode the dim
    across all salts, join on (key, salt). The hot key's probe work
    spreads over ``n_salts`` tasks; the dim (already broadcast-sized)
    replicates n_salts-fold, which is free relative to the skew.

    ``keep_salt=True`` leaves the ``__salt`` column in the output so
    a caller can PROVE the hot key's rows actually spread across
    salts (the manifest_join_plan entry's RAISE gate) — semantics are
    unchanged, the column is simply not dropped."""
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(key), F.monotonically_increasing_id()),
                         F.lit(n_salts)).cast("int"))
    dim_rep = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = salted_fact.join(F.broadcast(dim_rep), [key, "__salt"])
    return out if keep_salt else out.drop("__salt")
