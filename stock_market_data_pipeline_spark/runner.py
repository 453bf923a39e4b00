"""Model runner — the `dbt run` analog (SURVEY.md §3.2, S11).

A model is (name, builder, materialization); the runner topologically
orders models by declared dependencies and materializes each:

  view         createOrReplaceTempView        (staging layer,
                                               dbt_project.yml:57-59)
  table        overwrite parquet + temp view  (marts, :63-65)
  incremental  MERGE on unique_key with the trailing-lookback
               reprocess (int + fct configs; incremental.py)

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


@dataclass
class Model:
    name: str
    build: Callable[[SparkSession, dict[str, DataFrame]], DataFrame]
    materialization: str = "view"          # view | table | incremental
    depends_on: list[str] = field(default_factory=list)
    unique_key: list[str] | None = None    # incremental only
    #: layout for table/incremental sinks — date partitioning gives the
    #: dashboards' key+range predicates (P9) partition pruning, the
    #: Spark analog of cluster_by=['ticker'] + date micro-partitions
    #: (fct_trading_momentum.sql:5; SURVEY §1.4)
    partition_by: list[str] = field(default_factory=list)


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

    def _materialize(self, model: Model, df: DataFrame) -> DataFrame:
        if model.materialization == "view":
            df.createOrReplaceTempView(model.name)
            return df
        path = self._table_path(model.name)

        def write(frame: DataFrame, target: str) -> None:
            w = frame.write.mode("overwrite")
            if model.partition_by:
                w = w.partitionBy(*model.partition_by)
            w.parquet(target)

        if model.materialization == "table":
            write(df, path)
        elif model.materialization == "incremental":
            import shutil

            from .incremental import merge_upsert
            if os.path.isdir(path) and any(
                    not f.startswith(("_", ".")) for f in os.listdir(path)):
                current = self.spark.read.parquet(path)
                merged = merge_upsert(current, df,
                                      model.unique_key or ["id"])
                staging = path + "__staging"
                write(merged, staging)
                write(self.spark.read.parquet(staging), path)
                shutil.rmtree(staging, ignore_errors=True)
            else:
                write(df, path)
        else:
            raise ValueError(model.materialization)
        out = self.spark.read.parquet(path)
        out.createOrReplaceTempView(model.name)
        return out

    def run(self) -> dict[str, DataFrame]:
        """Build every model in dependency order; returns name -> df."""
        built: dict[str, DataFrame] = {}
        for model in self._order():
            df = model.build(self.spark, built)
            built[model.name] = self._materialize(model, df)
        return built
