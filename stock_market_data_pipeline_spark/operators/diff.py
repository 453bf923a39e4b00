"""Keyed table diff — change-data-feed between two relation versions.

The operational primitive behind incremental validation, snapshot
comparison, and CDC emission: given OLD and NEW versions of a keyed
table, classify every key as added / removed / changed / unchanged
(with the column values that moved). One full outer join on the key —
co-partitioned, no row explosion; at 100 TB both sides shuffle once on
the key (or zero times if both are bucketed on it — operators/layout).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def table_diff(old: DataFrame, new: DataFrame, keys: list[str],
               compare: list[str] | None = None) -> DataFrame:
    """Full-outer keyed diff. Returns key columns + ``change_type``
    (added/removed/changed/unchanged) + old_/new_ value columns for
    the compared set. NULL-safe comparison (``<=>``), so a NULL->value
    transition counts as changed, not unchanged."""
    compare = compare or [c for c in new.columns if c not in keys]
    o = old.alias("o")
    n = new.alias("n")
    cond = None
    for k in keys:
        c = F.col(f"o.{k}") == F.col(f"n.{k}")
        cond = c if cond is None else cond & c
    joined = o.join(n, cond, "full_outer")

    in_old = F.col(f"o.{keys[0]}").isNotNull()
    in_new = F.col(f"n.{keys[0]}").isNotNull()
    same: Column = F.lit(True)
    for c in compare:
        same = same & F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    change = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    key_cols = [
        F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k)
        for k in keys
    ]
    val_cols = []
    for c in compare:
        val_cols.append(F.col(f"o.{c}").alias(f"old_{c}"))
        val_cols.append(F.col(f"n.{c}").alias(f"new_{c}"))
    return joined.select(*key_cols, change.alias("change_type"),
                         *val_cols)
