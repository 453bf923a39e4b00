"""Manifest-committed partitioned table: ATOMIC multi-partition MERGE
on plain parquet.

Closes the atomicity gap that :func:`incremental.merge_into_partitioned`
documents (incremental.py:142-161): dynamic partition overwrite is
atomic only per partition directory, so a crash between partition swaps
leaves a torn table.  The reference gets table-level transactionality
from Snowflake's MERGE (dbt/stock_analytics/models/marts/
fct_trading_momentum.sql:2-7, snapshots/
russell3000_constituents_snapshot.sql:4-12); this module supplies the
same contract on plain files with a Delta/Iceberg-style (but minimal)
manifest commit:

Layout::

    <root>/
      _manifests/
        manifest-00000001.json   # immutable: {partition value -> data dir}
        manifest-00000002.json
        CURRENT                  # text: name of the live manifest
      data/
        txn-<uuid>/              # one dir per write transaction
          __pt=<value>/part-*.parquet

Protocol:

1. A writer stages ALL new partition directories under a fresh
   ``data/txn-<uuid>/`` — nothing it writes is visible to readers.
2. It writes the next ``manifest-N.json`` (old mapping, with the
   touched partitions re-pointed at the new txn dirs).  Still invisible.
3. THE COMMIT POINT: it replaces ``_manifests/CURRENT`` with the new
   manifest's name via write-to-temp + ``os.replace`` — a single atomic
   rename on POSIX.  Readers resolve ``CURRENT`` first, so they see
   either the entire old snapshot or the entire new one; a crash at any
   earlier step leaves only orphan files that ``vacuum()`` reclaims.

Two deliberate simplifications vs a full table format, stated not
hidden: (a) ``CURRENT`` is last-writer-wins — two concurrent committers
don't corrupt the table (each manifest is self-contained) but one
overwrites the other's commit; real deployments want Delta/Iceberg's
optimistic conflict check.  (b) the manifest maps partition VALUES to
directories rather than listing files — file-level listing, stats and
data-skipping belong to the real formats.  Everything else — snapshot
isolation for readers, atomic multi-partition commit, time travel via
old manifests — works, and ``tests/test_manifest.py`` crash-injects
between stage and commit to prove the reader contract.

Partition-column handling: the staging write partitions by a STRING
duplicate ``__pt`` of the partition column, so the parquet files keep
the original typed column and readers need no partition-value parsing
— ``read()`` is a plain ``spark.read.parquet(*live_dirs)``.  The
duplicate costs nothing on disk (dictionary/RLE-encoded constant).

Scale: the manifest is O(#partitions) driver-side JSON (2,500 entries
for a 10-year daily table — trivial); data movement is identical to
``merge_into_partitioned`` (partition-pruned read, touched-partition
write).  The same key-stability precondition applies: a key never
moves between partition values (keys contain the partition column
here, so it holds by construction).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_PT = "__pt"
_MANIFEST_DIR = "_manifests"
_CURRENT = "CURRENT"


class CrashInjected(RuntimeError):
    """Raised by test hooks to simulate a writer dying pre-commit."""


class ManifestTable:
    """A partitioned parquet table whose live files are resolved
    through an atomically-swapped manifest."""

    def __init__(self, root: str, ts: str):
        self.root = root
        self.ts = ts

    # -- manifest plumbing -------------------------------------------

    def _mdir(self) -> str:
        return os.path.join(self.root, _MANIFEST_DIR)

    def _current_name(self) -> str:
        with open(os.path.join(self._mdir(), _CURRENT)) as f:
            return f.read().strip()

    def manifest(self, name: str | None = None) -> dict:
        """The live manifest (or a named historical one — time travel)."""
        name = name or self._current_name()
        with open(os.path.join(self._mdir(), name)) as f:
            return json.load(f)

    def version(self) -> int:
        return self.manifest()["version"]

    def _commit(self, partitions: dict[str, str], version: int) -> None:
        """Steps 2+3 of the protocol. The os.replace of CURRENT is the
        single atomic commit point."""
        mdir = self._mdir()
        os.makedirs(mdir, exist_ok=True)
        name = f"manifest-{version:08d}.json"
        body = {"version": version, "ts": self.ts, "partitions": partitions}
        path = os.path.join(mdir, name)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(json.dumps(body, sort_keys=True))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)           # manifest file in place, not live
        cur_tmp = os.path.join(mdir, _CURRENT + ".tmp")
        with open(cur_tmp, "w") as f:
            f.write(name)
            f.flush()
            os.fsync(f.fileno())
        os.replace(cur_tmp, os.path.join(mdir, _CURRENT))   # COMMIT

    # -- data staging ------------------------------------------------

    def _stage(self, df: DataFrame) -> dict[str, str]:
        """Stage a txn directory; returns {partition value -> relpath}.
        Nothing staged is reader-visible until _commit.

        The repartition on the partition column is load-bearing at
        scale: without it every shuffle task writes a sliver into
        every partition directory (2,500 dates x 32 tasks = 80k files
        for a 10-year daily table — the sf1 sweep hit exactly this),
        and the read side pays one task per sliver.  Hash-clustering
        by partition value first yields ONE file per partition
        directory; a production variant adds maxRecordsPerFile to cap
        file size for fat partitions."""
        txn = f"txn-{uuid.uuid4().hex[:12]}"
        txn_dir = os.path.join(self.root, "data", txn)
        (df.withColumn(_PT, F.col(self.ts).cast("string"))
         .repartition(F.col(_PT))
         .write.partitionBy(_PT).parquet(txn_dir))
        out: dict[str, str] = {}
        for d in os.listdir(txn_dir):
            if d.startswith(_PT + "="):
                value = d[len(_PT) + 1:]
                out[value] = os.path.join("data", txn, d)
        return out

    # -- public API --------------------------------------------------

    @classmethod
    def create(cls, df: DataFrame, root: str, ts: str) -> "ManifestTable":
        """Initial materialization: stage everything, commit v1."""
        t = cls(root, ts)
        parts = t._stage(df)
        t._commit(parts, version=1)
        return t

    def read(self, spark: SparkSession,
             manifest_name: str | None = None) -> DataFrame:
        """Snapshot read through the manifest. Every listed dir is a
        leaf (part files only), so this is plain parquet with the typed
        partition column already in the files."""
        mf = self.manifest(manifest_name)
        dirs = [os.path.join(self.root, rel)
                for rel in mf["partitions"].values()]
        return spark.read.parquet(*dirs)

    def merge(self, spark: SparkSession, updates: DataFrame,
              keys: list[str],
              _crash_before_commit: bool = False) -> None:
        """Keyed MERGE (WHEN MATCHED UPDATE / NOT MATCHED INSERT),
        partition-pruned exactly like merge_into_partitioned, but
        committed atomically across ALL touched partitions: stage every
        rewritten partition, then one CURRENT swap.  A reader never
        observes a mix of old and new partitions, and a crash anywhere
        before the swap leaves the old snapshot fully live."""
        from .incremental import merge_upsert

        touched = [str(r[0]) for r in
                   updates.select(F.col(self.ts).cast("string"))
                   .distinct().collect()]
        if not touched:
            return
        mf = self.manifest()
        live = mf["partitions"]
        prior_dirs = [os.path.join(self.root, live[v])
                      for v in touched if v in live]
        if prior_dirs:
            current = spark.read.parquet(*prior_dirs)
            merged = merge_upsert(current, updates, keys)
        else:
            merged = updates
        staged = self._stage(merged)
        if _crash_before_commit:
            raise CrashInjected("writer died after staging, before commit")
        self._commit({**live, **staged}, version=mf["version"] + 1)

    def vacuum(self) -> list[str]:
        """Remove data directories not referenced by the LIVE manifest
        (orphans from crashed writers, partitions replaced by later
        merges) and historical manifest files.  Returns removed paths.
        Safe any time no writer is mid-stage; reclaim unit is the leaf
        partition dir because one txn's partitions can be superseded
        independently."""
        import shutil

        live_rel = set(self.manifest()["partitions"].values())
        removed: list[str] = []
        data_dir = os.path.join(self.root, "data")
        for txn in sorted(os.listdir(data_dir)):
            txn_dir = os.path.join(data_dir, txn)
            any_live = False
            for leaf in sorted(os.listdir(txn_dir)):
                full = os.path.join(txn_dir, leaf)
                if not (os.path.isdir(full)
                        and leaf.startswith(_PT + "=")):
                    continue  # _SUCCESS / .crc markers ride with the txn
                rel = os.path.join("data", txn, leaf)
                if rel in live_rel:
                    any_live = True
                else:
                    shutil.rmtree(full)
                    removed.append(rel)
            if not any_live:
                shutil.rmtree(txn_dir)
                removed.append(os.path.join("data", txn))
        current = self._current_name()
        for m in sorted(os.listdir(self._mdir())):
            if m.startswith("manifest-") and m != current:
                os.remove(os.path.join(self._mdir(), m))
                removed.append(os.path.join(_MANIFEST_DIR, m))
        return removed
