"""Incremental materialization: upsert-on-key MERGE with the
reference's trailing-lookback reprocess semantics.

Reference analogs:
- dbt ``incremental`` with ``unique_key=['ticker','trade_date']``
  (int_russell3000__daily.sql:3-7, fct_trading_momentum.sql:2-7)
- the trailing-4-day late-data window:
  ``WHERE trade_date >= DATEADD(day,-4,(SELECT MAX(trade_date) FROM this))``
  (int_russell3000__daily.sql:19-26, fct_trading_momentum.sql:209-214)

Design: Delta Lake's MERGE INTO is the natural sink on a real cluster;
this module expresses the same algebra engine-agnostically as
anti-join + union, so it runs on plain parquet too. The key decision
for correctness is the WARMUP: the reference recomputes indicator
windows over only the reprocessed slice (accepting NULL warmups); we
instead carry the preceding ``warmup_rows`` rows per key into the
window stage and drop them after, so incremental output is
bit-identical to a full rebuild — verified by the
``fct_momentum_incremental`` catalog entry hash-matching the
full-rebuild oracle.

Scale notes: the MERGE touches only (keys in the update slice); with
the target partitioned by trade_date, the anti-join prunes to the
trailing partitions (dynamic partition pruning does this for free on
Delta/parquet partitioned tables). The warmup selection is one
row_number window over the trailing rows per ticker — the same single
shuffle the indicator stage needs anyway.

WRITE GRANULARITY (the 100 TB half of MERGE): the physical target is
a ``partitionBy("trade_date")`` parquet table, and an incremental run
rewrites ONLY the trailing ``trade_date`` partitions via dynamic
partition overwrite (the writer-level ``partitionOverwriteMode=dynamic``
option — no session-conf mutation).  The reference's incremental run
touches exactly the trailing-4-day slice
(fct_trading_momentum.sql:209-214); a full-table rewrite at 100 TB
would turn a 4-partition write into a 2,500-partition write.  Because
the recomputed slice contains EVERY row for the dates it covers
(recomputed from the full source, not a delta of changed keys),
whole-partition overwrite is exactly delete+insert MERGE for those
dates.  For arbitrary keyed updates that do NOT cover whole
partitions, :func:`merge_into_partitioned` reads back only the touched
partitions (partition-pruned scan), merges within that slice, and
rewrites just those partitions.  Untouched partitions' files are
byte-identical after a run (tests/test_incremental_write.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame,
                 keys: list[str]) -> DataFrame:
    """Batch MERGE: rows of ``target`` whose key is absent from
    ``updates``, plus all of ``updates`` (update wins on match —
    WHEN MATCHED THEN UPDATE, WHEN NOT MATCHED THEN INSERT)."""
    kept = target.join(updates.select(*keys).distinct(), keys, "left_anti")
    return kept.unionByName(updates)


def trailing_slice(universe: DataFrame, as_of_max, lookback_days: int,
                   warmup_rows: int,
                   key: str = "ticker", ts: str = "trade_date"):
    """Split the source into (reprocess slice, warmup rows).

    ``cutoff`` = as_of_max - lookback_days (calendar days, matching the
    reference's DATEADD over trading-day rows — SURVEY §4 gotcha 1).
    Warmup = the last ``warmup_rows`` rows per key strictly before the
    cutoff; they feed the window stage but are dropped from the output.
    """
    cutoff = F.date_sub(F.lit(as_of_max), lookback_days)
    slice_df = universe.where(F.col(ts) >= cutoff)
    w_desc = Window.partitionBy(key).orderBy(F.col(ts).desc())
    warmup = (
        universe.where(F.col(ts) < cutoff)
        .withColumn("__rn", F.row_number().over(w_desc))
        .where(F.col("__rn") <= warmup_rows)
        .drop("__rn")
    )
    return slice_df, warmup, cutoff


def write_partitioned(df: DataFrame, target_path: str,
                      ts: str = "trade_date") -> None:
    """Initial materialization of a date-partitioned parquet target
    (the ``cluster_by=['ticker']`` + daily-grain analog of
    fct_trading_momentum.sql:2-7 on a file-based table)."""
    df.write.mode("overwrite").partitionBy(ts).parquet(target_path)


def overwrite_trailing(updates: DataFrame, target_path: str,
                       ts: str = "trade_date") -> None:
    """Rewrite ONLY the partitions present in ``updates`` (dynamic
    partition overwrite), leaving every other partition's files
    untouched.  Correct as a MERGE whenever ``updates`` carries the
    complete row set for each date it contains — which the incremental
    recompute does by construction (it recomputes the whole trailing
    slice from source).  Writer-level option, so no session conf is
    mutated and concurrent writers with static overwrite semantics are
    unaffected."""
    (updates.write
     .option("partitionOverwriteMode", "dynamic")
     .mode("overwrite")
     .partitionBy(ts)
     .parquet(target_path))


def merge_into_partitioned(spark: SparkSession, target_path: str,
                           updates: DataFrame, keys: list[str],
                           ts: str = "trade_date",
                           validate_partition_stability: bool = False,
                           ) -> None:
    """Partition-scoped keyed MERGE into a date-partitioned parquet
    target: prune the read to the touched partitions, merge within
    that slice, rewrite just those partitions.  This is the plain-
    parquet expression of Delta/Iceberg ``MERGE INTO`` with partition
    pruning; on a transactional format the localCheckpoint staging hop
    disappears (the format's snapshot isolation handles read-own-
    target).

    PRECONDITION (the partition-pruning contract): a key NEVER moves
    between ``ts`` partitions — every update row's ``ts`` equals the
    ``ts`` of the existing row for that key, if one exists.  Touched
    partitions are derived from ``updates`` alone, so if an update
    re-dated a key, the stale row in the old partition would survive
    and the target would hold the key twice.  This matches the
    pipeline's keys: (ticker, trade_date) *contains* the partition
    column, and the streaming replay's event_id -> ts mapping is
    stable (streaming/events.py upsert_replay), so the precondition
    holds by construction there.  Full Delta/Iceberg ``MERGE INTO``
    does not need this precondition only because it scans the whole
    target for key matches — the exact full-table read this function
    exists to avoid.

    ``validate_partition_stability=True`` (debug/test builds) verifies
    the precondition with one full-target anti-scan: it raises if any
    updated key exists outside the touched partitions.  Leave it off
    in production — the check costs the full-table read the pruning
    saves.

    ATOMICITY CONTRACT (design boundary, stated not hidden): on plain
    parquet this MERGE is atomic only *per partition directory* — the
    dynamic overwrite stages files then swaps each touched partition's
    directory contents, so a reader sees each partition either whole-
    old or whole-new, but a query spanning several touched partitions
    can observe a mix of old and new mid-write, and a crash between
    partition swaps leaves a partially-applied merge (re-running the
    same merge heals it — the operation is idempotent on its inputs).
    There is no table-level transaction and no snapshot isolation
    against a CONCURRENT writer.  The reference gets the stronger
    contract from Snowflake's transactional MERGE
    (dbt/stock_analytics/models/marts/fct_trading_momentum.sql:2-7,
    snapshots/russell3000_constituents_snapshot.sql:4-12).  On a real
    deployment, pointing this same call shape at Delta/Iceberg adds
    exactly the missing pieces — an atomic multi-partition commit via
    the table log/snapshot, serializable writer conflict detection,
    and time-travel reads — with no change to the merge logic here,
    which is why the partition-pruned write granularity (the part a
    format does NOT give you for free) is what this function
    implements."""
    touched = [r[0] for r in updates.select(ts).distinct().collect()]
    if not touched:
        return
    target = spark.read.parquet(target_path)
    if validate_partition_stability:
        key_cols = [k for k in keys if k != ts]
        strays = (target.where(~F.col(ts).isin(touched))
                  .join(updates.select(*key_cols).distinct(),
                        key_cols, "left_semi"))
        n = strays.count()
        if n:
            raise ValueError(
                f"merge_into_partitioned precondition violated: {n} "
                f"row(s) carry an updated key in a partition outside "
                f"the update's {ts} set {sorted(touched)} — a key moved "
                f"partitions; use a full-table merge_upsert instead")
    current = target.where(F.col(ts).isin(touched))
    merged = merge_upsert(current, updates, keys)
    # cut lineage: Spark refuses to overwrite a path its plan reads
    merged = merged.localCheckpoint(eager=True)
    overwrite_trailing(merged, target_path, ts)


def recompute_trailing(universe: DataFrame, as_of, params,
                       lookback_days: int = 4) -> DataFrame:
    """The trailing-slice recompute every incremental momentum path
    shares (imperative run, MERGE-on-frame, manifest MERGE): slice the
    last ``lookback_days`` sessions at/after ``as_of`` plus a
    window-sufficient warmup, rebuild the indicators over warmup+slice,
    and return only the slice rows.  ONE home for the warmup math —
    longest frame plus one, because crossover columns LAG an
    already-windowed SMA, so the first recomputed row needs its
    predecessor's full frame too (an off-by-one that a
    frame-length-only warmup misses)."""
    from .models.marts import fct_trading_momentum

    warmup_rows = max(params.sma_l, params.high_low, params.ret_year) + 1
    slice_df, warmup, cutoff = trailing_slice(
        universe, as_of, lookback_days, warmup_rows)
    return (fct_trading_momentum(warmup.unionByName(slice_df), params)
            .where(F.col("trade_date") >= cutoff))


def incremental_momentum_run(spark: SparkSession, universe: DataFrame,
                             target_path: str, params,
                             lookback_days: int = 4) -> DataFrame:
    """One incremental run against a MATERIALIZED date-partitioned
    target: recompute the trailing slice with window-sufficient warmup,
    then dynamic-overwrite only the trailing ``trade_date`` partitions.
    Only the scalar ``as_of`` is read from the target before the write,
    so the write plan never reads its own output path."""
    prior = spark.read.parquet(target_path)
    as_of = prior.agg(F.max("trade_date")).first()[0]
    recomputed = recompute_trailing(universe, as_of, params,
                                    lookback_days)
    overwrite_trailing(recomputed, target_path)
    return spark.read.parquet(target_path)


def incremental_momentum(universe: DataFrame, prior_fct: DataFrame,
                         params, lookback_days: int = 4) -> DataFrame:
    """One incremental run of fct_trading_momentum.

    ``prior_fct``: the existing materialized fact (yesterday's table).
    ``universe``: the full current source (with late corrections).
    Output: prior_fct MERGEd with the recomputed trailing slice —
    bit-identical to a full rebuild given window-sufficient warmup.
    """
    as_of = prior_fct.agg(F.max("trade_date")).first()[0]
    recomputed = recompute_trailing(universe, as_of, params,
                                    lookback_days)
    return merge_upsert(prior_fct, recomputed, ["ticker", "trade_date"])
