"""Custom Python DataSource (Spark 4 DataSource API) for the
grouped-daily bars feed — the idiomatic Spark packaging of S1-S3.

Where `ingest/loader.py` drives the fetch loop imperatively (the
reference's extract_load_stocks.py shape), this exposes the same feed
as a first-class `spark.read.format("grouped_daily")` source:

- `partitions()` returns ONE InputPartition PER TRADING DATE, so a
  multi-date backfill parallelizes across executors (each date is an
  independent REST fetch — precisely the reference's serial
  oldest->newest loop, src/extract_load_stocks.py:64-78, turned into
  a distributed scan).
- each partition's `read()` runs the retry/backoff fetch
  (`source.fetch_grouped_daily`) executor-side and yields normalized
  rows; a failed date fails only its partition (Spark task retry =
  per-date retry).

The transport is the deterministic network-free generator, so the
DuckDB oracle reproduces the exact rows (same arithmetic as
catalog_ext.INGEST_BARS_SQL).
"""

from __future__ import annotations

from datetime import date, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

#: target schema — the reference's normalized bar columns (P5/P6)
BARS_SCHEMA = ("T string, V double, VW double, O double, C double, "
               "H double, L double, N bigint, DATE date")


def weekdays(start: date, end: date) -> list[date]:
    """Mon-Fri dates in [start, end] — the pure-Python calendar for
    partition planning (driver-side; holiday lists plug in here)."""
    out, d = [], start
    while d <= end:
        if d.isoweekday() <= 5:
            out.append(d)
        d += timedelta(days=1)
    return out


class GroupedDailyDataSource(DataSource):
    """`spark.read.format("grouped_daily")` — options:
    start, end (ISO dates), n_tickers (default 50)."""

    @classmethod
    def name(cls) -> str:
        return "grouped_daily"

    def schema(self) -> str:
        return BARS_SCHEMA

    def reader(self, schema) -> "GroupedDailyReader":
        return GroupedDailyReader(self.options)


class GroupedDailyReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.start = date.fromisoformat(options["start"])
        self.end = date.fromisoformat(options["end"])
        self.n_tickers = int(options.get("n_tickers", "50"))

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(d.isoformat())
                for d in weekdays(self.start, self.end)]

    def read(self, partition: InputPartition):
        # executor-side: fetch one date with retry/backoff, normalize
        from .source import fetch_with_retry, synthetic_grouped_daily

        api_date = partition.value
        d = date.fromisoformat(api_date)
        rows = fetch_with_retry(
            api_date,
            transport=lambda ad: synthetic_grouped_daily(
                ad, n_tickers=self.n_tickers))
        for r in rows:
            yield (r["T"], r["v"], r["vw"], r["o"], r["c"], r["h"],
                   r["l"], int(r["n"]), d)


def register(spark) -> None:
    """Idempotent registration of the source with a session."""
    try:
        spark.dataSource.register(GroupedDailyDataSource)
    except Exception:
        pass  # already registered
