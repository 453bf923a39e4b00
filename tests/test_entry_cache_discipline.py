"""r16 optimization guard: entries that persist an intermediate for
multi-consumer reuse (stream_manifest_source's bar build feeds six
consumers, manifest_time_travel's feeds two) must UNPERSIST before
returning — a leaked cache block would both hold executor memory
across catalog entries in a shared session and amount to cross-run
result caching, which the bench contract forbids.

The assertion is on the session's RDD storage info (empty after the
entry returns), not on internals: any future persist added to an
entry without a matching unpersist fails here.
"""

from __future__ import annotations

from tests.conftest import SF_SMALL


def _cached_rdd_ids(spark) -> set[int]:
    jsc = spark.sparkContext._jsc.sc()
    return {i.id() for i in jsc.getRDDStorageInfo()}


def test_stream_manifest_source_unpersists(spark):
    """No NEW storage block may survive the entry — a delta check,
    not an empty-session check, because the shared test session may
    legitimately carry other suites' caches (e.g. reuse_input=True
    paths) when the full suite runs in one session."""
    from stock_market_data_pipeline_spark.catalog import QUERIES

    before = _cached_rdd_ids(spark)
    out = QUERIES["stream_manifest_source"](spark, SF_SMALL)
    out.write.format("noop").mode("overwrite").save()
    assert _cached_rdd_ids(spark) - before == set()


def test_manifest_time_travel_unpersists(spark, monkeypatch):
    """The entry's returned frame is localCheckpoint()ed (pre-r16
    semantics: it must be pinned before a conf scope exits), so one
    storage block legitimately lives as long as the returned frame —
    the strict empty-storage check of the stream test cannot apply.
    Instead pin the pairing directly: every DataFrame.persist() the
    entry issues must have received its unpersist() by the time the
    entry returns (localCheckpoint does not route through persist,
    so the checkpoint block is invisible here by construction)."""
    from pyspark.sql import DataFrame

    from stock_market_data_pipeline_spark.catalog import QUERIES

    live: set[int] = set()
    orig_persist, orig_unpersist = DataFrame.persist, DataFrame.unpersist

    def persist(self, *a, **kw):
        live.add(id(self._jdf))
        return orig_persist(self, *a, **kw)

    def unpersist(self, *a, **kw):
        live.discard(id(self._jdf))
        return orig_unpersist(self, *a, **kw)

    monkeypatch.setattr(DataFrame, "persist", persist)
    monkeypatch.setattr(DataFrame, "unpersist", unpersist)
    out = QUERIES["manifest_time_travel"](spark, SF_SMALL)
    assert live == set(), "entry returned with a persist not unpersisted"
    out.write.format("noop").mode("overwrite").save()
