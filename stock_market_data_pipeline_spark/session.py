"""SparkSession factory tuned for both local test runs and cluster scale.

The reference delegates execution to Snowflake (SURVEY.md §4); here the
equivalent "warehouse" is a properly configured SparkSession: AQE for
runtime re-planning (skew joins, partition coalescing), Arrow for any
pandas interchange, UTC session time zone to match the reference's
TIMESTAMP_NTZ semantics (src/snowflake_client.py:73-75).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_LOCAL_DEFAULTS = {
    # Shuffle partitions sized for local cores; on a real cluster this is
    # overridden (AQE coalesces anyway).
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parity with the reference's fixed-schema discipline (SURVEY.md §1.2):
    # fail fast rather than silently coerce.
    "spark.sql.parquet.mergeSchema": "false",
    # local test files are single small parquets; the 128 MB default
    # would scan them on 1-3 cores while 32 idle. 4 MB splits keep the
    # map side parallel at bench scale; cluster deployments (many
    # 100 MB+ files) should override back to the default.
    "spark.sql.files.maxPartitionBytes": os.environ.get(
        "SPARK_GRAFT_MAX_PARTITION_BYTES", "4m"),
    # backstop for TIMESTAMP(NANOS) parquet, which Spark rejects by
    # default on INFERRED reads: surface nanos as long instead of
    # erroring. The events readers don't depend on this — they sniff
    # the footer and read under an explicit per-layout schema
    # (physical.py) — but schema-inferred reads (temp views, ad-hoc
    # spark.read.parquet) stay usable if the generator ever reverts
    # the table to nanos.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.ui.enabled": "false",
    # NOTE: only effective when THIS builder launches the JVM; a later
    # getOrCreate on an existing session silently ignores it. Set
    # SPARK_GRAFT_DRIVER_MEM (or spark-submit --driver-memory) before
    # first session creation to size the driver. The default is modest
    # so session startup never fails on small hosts.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"),
}


def get_spark(app_name: str = "stock_market_data_pipeline_spark",
              master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) the session. ``master`` defaults to local[$SPARK_GRAFT_CPUS]."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in _LOCAL_DEFAULTS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
