"""QUALIFY emulation — W11 in SURVEY.md §2.5.

Snowflake's ``QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY o) = 1``
(dim_securities_current.sql:38,82) has no direct Spark keyword; the
canonical emulation is row_number -> filter -> drop. One shuffle on the
partition key; at scale prefer ordering columns that are
partition-pruning friendly so the scan below stays narrow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_n_per_group(
    df: DataFrame,
    partition_by: list[str] | str,
    order_by: list[Column] | Column,
    n: int = 1,
) -> DataFrame:
    """Keep the first ``n`` rows per group under the given ordering.

    Tie-break determinism is the caller's job: include a unique column in
    ``order_by`` when the primary sort key can tie (needed for
    oracle-stable results).
    """
    if isinstance(partition_by, str):
        partition_by = [partition_by]
    if isinstance(order_by, Column):
        order_by = [order_by]
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )
