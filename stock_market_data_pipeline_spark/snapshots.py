"""SCD-2 snapshot MERGE — the reference's dbt snapshot
(snapshots/russell3000_constituents_snapshot.sql:4-12): ``check``
strategy on a column list, with hard-delete invalidation.

Semantics per applied snapshot (effective date D):
- new key                      -> open row  [D, NULL)
- open row, check cols equal   -> unchanged
- open row, check cols changed -> close old at D, open new [D, NULL)
- key missing from snapshot    -> close old at D  (invalidate_hard_deletes)

On Delta this is one MERGE INTO with matched/not-matched-by-source
clauses; expressed here as joins + union so it runs on any store. The
join is keyed on the natural key — broadcast for dimension-sized
inputs, hash-partitioned beyond that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(current: DataFrame | None, snapshot: DataFrame, key: str,
               check_cols: list[str], effective_date) -> DataFrame:
    """Apply one snapshot to the SCD-2 history table.

    ``current`` columns: key, *check_cols, dbt_valid_from, dbt_valid_to
    (None bootstraps from the first snapshot). ``snapshot`` columns:
    key, *check_cols.
    """
    eff = F.lit(effective_date).cast("date")
    if current is None:
        return snapshot.select(
            key, *check_cols,
            eff.alias("dbt_valid_from"),
            F.lit(None).cast("date").alias("dbt_valid_to"),
        )

    closed = current.where(F.col("dbt_valid_to").isNotNull())
    open_rows = current.where(F.col("dbt_valid_to").isNull())

    # explicit presence markers: deciding membership from a data
    # column's NULL-ness would misclassify rows whose first check
    # column is legitimately NULL
    snap = snapshot.select(
        F.col(key),
        F.lit(1).alias("__in_snap"),
        *[F.col(c).alias(f"__new_{c}") for c in check_cols])
    open_marked = open_rows.withColumn("__in_open", F.lit(1))
    joined = open_marked.join(snap, key, "full_outer")

    in_snap = F.col("__in_snap").isNotNull()
    in_open = F.col("__in_open").isNotNull()
    changed = in_open & in_snap & ~F.expr(
        " AND ".join(
            f"({c} <=> __new_{c})" for c in check_cols))

    # survivors: unchanged open rows stay open
    unchanged = joined.where(in_open & in_snap & ~changed).select(
        key, *check_cols, "dbt_valid_from", "dbt_valid_to")
    # closed by change or hard delete
    closed_now = joined.where(in_open & (~in_snap | changed)).select(
        key, *check_cols, "dbt_valid_from",
        eff.alias("dbt_valid_to"))
    # opened by change or new key
    opened = joined.where(in_snap & (~in_open | changed)).select(
        key,
        *[F.col(f"__new_{c}").alias(c) for c in check_cols],
        eff.alias("dbt_valid_from"),
        F.lit(None).cast("date").alias("dbt_valid_to"))

    return closed.unionByName(unchanged) \
                 .unionByName(closed_now) \
                 .unionByName(opened)
