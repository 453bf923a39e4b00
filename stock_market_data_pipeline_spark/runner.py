"""Model runner — the `dbt run` analog (SURVEY.md §3.2, S11).

A model is (name, builder, materialization); the runner topologically
orders models by declared dependencies and materializes each:

  view         createOrReplaceTempView        (staging layer,
                                               dbt_project.yml:57-59)
  table        full refresh into the model's catalog namespace
               (saveAsTable) or into a path-based ManifestTable
               (atomic overwrite — one commit swaps the entire
               build; marts, :63-65)
  incremental  MERGE on unique_key (int + fct configs); path-based
               targets go through ManifestTable.merge (one atomic
               multi-partition commit, partition-pruned read-back);
               catalog-table targets use dynamic partition overwrite
               on the touched partitions (the Spark-catalog sink — a
               deployment swaps in Delta for the same transactional
               contract there)

NAMESPACES (S11): the reference materializes each layer into its own
schema — ``raw_staging`` / ``raw_intermediate`` / ``raw_marts``
(dbt_project.yml:55-65).  A model with ``schema=`` set lands as a
catalog table ``schema.name`` (``CREATE DATABASE IF NOT EXISTS`` +
``saveAsTable``); an unqualified temp-view alias is kept so
downstream models and ad-hoc SQL resolve the bare name either way.
Staging views stay session-scoped temp views: Spark persistent views
require SQL text and may not reference temp state, and dbt's staging
views are likewise ephemeral contracts rather than data.  Models
without ``schema`` keep the path-based parquet warehouse (useful for
scratch runs with no metastore).

Layer ordering matches the reference DAG: staging -> intermediate ->
marts -> checks (daily_stock_pipeline_dag.py:30-55); independent
models at the same depth could run concurrently from a thread pool —
Spark's scheduler interleaves their jobs (profiles.yml threads: 4).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: layer -> schema mapping, the dbt_project.yml:55-65 analog
LAYER_SCHEMAS = {
    "staging": "raw_staging",
    "intermediate": "raw_intermediate",
    "marts": "raw_marts",
}


class AuditFailed(RuntimeError):
    """A model's audit returned violations: the build was NOT
    published.  Carries {audit_name: violation_count} for every
    failing audit (all audits run before the verdict, so one run
    reports every broken invariant, not just the first)."""

    def __init__(self, model: str, failures: dict[str, int]):
        self.model, self.failures = model, failures
        super().__init__(
            f"model {model!r} failed audit(s) "
            + ", ".join(f"{k} ({v} violations)"
                        for k, v in sorted(failures.items())))


@dataclass
class Model:
    name: str
    build: Callable[[SparkSession, dict[str, DataFrame]], DataFrame]
    materialization: str = "view"          # view | table | incremental
    depends_on: list[str] = field(default_factory=list)
    unique_key: list[str] | None = None    # incremental only
    #: WRITE-AUDIT-PUBLISH (the `dbt test` stage, but BLOCKING — the
    #: reference's Airflow DAG runs `dbt run` then `dbt test`
    #: (daily_stock_pipeline_dag.py:30-55), so a failed test leaves
    #: the bad build already live; here a failed audit publishes
    #: NOTHING).  Each audit is a checks.py-shaped predicate:
    #: df -> violations DataFrame, empty == pass.  Path-based
    #: table/incremental models audit on an isolated manifest BRANCH
    #: (the full post-write state, invisible to readers) and publish
    #: by atomic fast-forward; view/catalog sinks audit the candidate
    #: frame before any write (no branch layer there — the audit
    #: still gates every publish, it just can't see sidecar state).
    audits: dict[str, Callable[[DataFrame], DataFrame]] = field(
        default_factory=dict)
    #: layout for table/incremental sinks — date partitioning gives the
    #: dashboards' key+range predicates (P9) partition pruning, the
    #: Spark analog of cluster_by=['ticker'] + date micro-partitions
    #: (fct_trading_momentum.sql:5; SURVEY §1.4)
    partition_by: list[str] = field(default_factory=list)
    #: catalog namespace (e.g. LAYER_SCHEMAS["marts"]); None keeps the
    #: path-based parquet warehouse
    schema: str | None = None


class Runner:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        self.models: dict[str, Model] = {}

    def register(self, model: Model) -> None:
        self.models[model.name] = model

    def _order(self) -> list[Model]:
        for m in self.models.values():
            unknown = [d for d in m.depends_on if d not in self.models]
            if unknown:
                raise ValueError(
                    f"model {m.name!r} depends on unregistered "
                    f"model(s) {unknown}")
        done: list[str] = []
        remaining = dict(self.models)
        while remaining:
            ready = [m for m in remaining.values()
                     if all(d in done for d in m.depends_on)]
            if not ready:
                raise ValueError(
                    f"dependency cycle among {sorted(remaining)}")
            for m in sorted(ready, key=lambda m: m.name):
                done.append(m.name)
                del remaining[m.name]
        return [self.models[n] for n in done]

    def _table_path(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def _audit(self, model: Model, df: DataFrame) -> None:
        """Run every audit against ``df`` (the would-be-published
        state); raise :class:`AuditFailed` naming ALL failing audits.
        One Spark action per audit — each violations frame is a
        filter over the already-built state, so the audit stage costs
        reads, never a rebuild."""
        failures = {name: n for name, fn in model.audits.items()
                    if (n := fn(df).count())}
        if failures:
            raise AuditFailed(model.name, failures)

    # ------------------------------------------ catalog-table sinks

    def _materialize_catalog(self, model: Model,
                             df: DataFrame) -> DataFrame:
        """saveAsTable into the model's namespace (S11 proper): the
        dbt ``schema: raw_marts`` analog.  Incremental runs against a
        partitioned target rewrite ONLY the touched partitions
        (writer-level dynamic partition overwrite through
        ``insertInto`` — partition columns are last in a saved table's
        schema, so rows are re-ordered to match before the positional
        insert)."""
        spark = self.spark
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {model.schema}")
        qualified = f"{model.schema}.{model.name}"

        def create(frame: DataFrame) -> None:
            if model.partition_by:
                # hash-distribute by the partition columns before the
                # partitioned write (guide §6; Iceberg's hash
                # write.distribution-mode): without it one task can
                # hold EVERY partition value (a day-grain model at
                # test scale = 2000+ directories written serially by
                # one task) and every task of a wide frame writes a
                # file into every directory it touches
                frame = frame.repartition(
                    spark.sparkContext.defaultParallelism,
                    *[F.col(c) for c in model.partition_by])
            w = frame.write.mode("overwrite").format("parquet")
            if model.partition_by:
                w = w.partitionBy(*model.partition_by)
            w.saveAsTable(qualified)

        exists = spark.catalog.tableExists(qualified)
        if model.materialization == "table" or not exists:
            # audit the candidate BEFORE the write: catalog sinks have
            # no branch layer, but a failed audit still publishes
            # nothing (vs dbt, where the bad table is already live)
            self._audit(model, df)
            create(df)
        else:  # incremental into an existing table
            from .incremental import merge_upsert
            keys = model.unique_key or ["id"]
            if model.partition_by:
                parts = model.partition_by
                touched = df.select(*parts).distinct().collect()
                # ONE flat In expression (never a chained OR — a deep
                # boolean tree overflows the analyzer on wide backfills)
                if len(parts) == 1:
                    # plain column isin: statically partition-prunable
                    pred = F.col(parts[0]).isin(
                        [row[0] for row in touched])
                else:
                    pred = F.struct(*parts).isin(*[
                        F.struct(*[F.lit(row[c]) for c in parts])
                        for row in touched])
                # partition-pruned read of only the touched slice
                current = spark.table(qualified).where(pred)
                merged = merge_upsert(current, df, keys)
                # audit the merged slice pre-insert (untouched
                # partitions passed their own audit when published)
                self._audit(model, merged)
                # cut lineage: the insert overwrites partitions the
                # merge plan reads
                merged = merged.localCheckpoint(eager=True)
                # dynamic partition overwrite into a v1 catalog table:
                # the writer-level partitionOverwriteMode option is
                # silently IGNORED by insertInto, and the v2 writer
                # (writeTo().overwritePartitions()) rejects v1 tables —
                # the session conf is the only working API, so set it
                # save/restore-scoped to this one insert
                key = "spark.sql.sources.partitionOverwriteMode"
                prior = spark.conf.get(key)
                spark.conf.set(key, "dynamic")
                try:
                    (merged.select(*spark.table(qualified).columns)
                     .repartition(spark.sparkContext.defaultParallelism,
                                  *[F.col(c) for c in parts])
                     .write.mode("overwrite").insertInto(qualified))
                finally:
                    spark.conf.set(key, prior)
            else:
                merged = merge_upsert(spark.table(qualified), df, keys)
                self._audit(model, merged)
                merged = merged.localCheckpoint(eager=True)
                create(merged)
        out = spark.table(qualified)
        # unqualified alias so downstream models / ad-hoc SQL resolve
        # the bare name too
        out.createOrReplaceTempView(model.name)
        return out

    # ------------------------------------------ path-based sinks

    def _materialize(self, model: Model, df: DataFrame) -> DataFrame:
        if model.materialization not in ("view", "table", "incremental"):
            raise ValueError(model.materialization)
        if model.materialization == "view":
            self._audit(model, df)   # fail -> view never registered
            df.createOrReplaceTempView(model.name)
            return df
        if model.schema:
            return self._materialize_catalog(model, df)
        path = self._table_path(model.name)
        # path-based sinks are ManifestTables (round 8: the engine's
        # DEFAULT transactional write path — the previous staging-dir
        # double-write left a torn target if the writer died between
        # the two writes). Partitioned models use their single
        # partition column as the table's ts; multi-column/none fall
        # back to the unpartitioned single-pseudo-partition layout
        # (merge is then a full-table rewrite, exactly what a keyed
        # merge without partition pruning costs anywhere).
        #
        # INCREMENTAL models only get a partitioned layout when the
        # partition column is part of the unique key (r8 ADVICE item
        # 2): ManifestTable.merge is partition-pruned and requires
        # that a key never moves between partition values — for an
        # arbitrary model partitioned by a MUTABLE attribute, an
        # update that changes the partition value would leave the
        # stale row alive in its old partition (silent duplicate
        # keys).  A key-stable column (key contains it) cannot move by
        # construction; anything else falls back to the unpartitioned
        # layout, where merge is a full rewrite — the honest cost of a
        # keyed merge with no prunable dimension.
        from .manifest import ManifestTable

        ts = (model.partition_by[0]
              if model.partition_by and len(model.partition_by) == 1
              else None)
        if (model.materialization == "incremental" and ts is not None
                and ts not in (model.unique_key or [])):
            ts = None
        exists = os.path.isdir(os.path.join(path, "_manifests"))
        if not exists:
            # first build: nothing is live yet, so there is nothing to
            # isolate — audit the candidate, then create (fail ->
            # no table at all)
            self._audit(model, df)
            table = ManifestTable.create(df, path, ts=ts)
        else:
            table = ManifestTable(path, ts)
            if model.audits:
                self._materialize_wap(model, table, df)
            elif model.materialization == "table":
                table.overwrite(df)               # atomic full refresh
            else:
                table.merge(self.spark, df, model.unique_key or ["id"])
        out = table.read(self.spark)
        out.createOrReplaceTempView(model.name)
        return out

    def _materialize_wap(self, model: Model, table, df: DataFrame) -> None:
        """WRITE-AUDIT-PUBLISH for an existing path-based model: the
        refresh/merge lands on an invisible ``wap`` manifest branch,
        audits read the branch's FULL post-write state (DV sidecars,
        schema evolution and all — what a reader would actually see
        after publish), and only a clean verdict fast-forwards main.
        A failed audit drops the branch: main's snapshot, version and
        change feed are untouched, and the branch's staged files age
        out through vacuum like any crashed writer's.  A ``wap``
        branch left by a run that died mid-audit is dropped and
        re-cut — its half-audited state is stale by definition.

        Cost at 100 TB: the branch cut and the publish are one small
        JSON file each; the write itself costs exactly what the
        unaudited write costs.  The audit stage re-reads only what
        the audits scan."""
        if "wap" in table.branches():
            table.drop_branch("wap")
        branch = table.create_branch("wap")
        try:
            if model.materialization == "table":
                branch.overwrite(df)
            else:
                branch.merge(self.spark, df, model.unique_key or ["id"])
            self._audit(model, branch.read(self.spark))
        except BaseException:
            table.drop_branch("wap")
            raise
        table.publish_branch("wap")
        table.drop_branch("wap")

    def run(self) -> dict[str, DataFrame]:
        """Build every model in dependency order; returns name -> df."""
        built: dict[str, DataFrame] = {}
        for model in self._order():
            df = model.build(self.spark, built)
            built[model.name] = self._materialize(model, df)
        return built
