"""Test-table loaders for the driver's TPC-H-ish parquet directories.

TESTDATA.md: tables region nation customer supplier part orders lineitem
events documents embeddings, one parquet file each under
/root/testdata/sf{0.001,0.01,0.1}/.

At 100 TB these would be partitioned/bucketed table scans; the loader
keeps the read declarative (``spark.read.parquet``) so filter pushdown
and column pruning reach the scan unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from .physical import assert_table

    if name == "events":
        # events MUST go through the layout-branching reader: a plain
        # inferred read of a TIMESTAMP(NANOS) regeneration would (with
        # the session's nanosAsLong backstop) surface ts as raw BIGINT
        # nanos to every generic consumer — the silent-mis-scale class
        # physical.py exists to eliminate.
        from .operators.events_ops import read_events
        return read_events(spark, sf_dir)

    path = os.path.join(sf_dir, f"{name}.parquet")
    # loud SchemaDriftError if a semantically-loaded table was
    # re-typed by a testdata regeneration (one footer read, no job)
    assert_table(path, name)
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view (mirrors the DuckDB oracle
    environment, where the same names are pre-registered)."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
