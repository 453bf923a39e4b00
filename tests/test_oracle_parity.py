"""Local replica of the driver's correctness gate: run every catalog
query on Spark AND its DuckDB oracle on sf0.001, compare row count,
column names, and order-insensitive values.

This is the first test to run after touching any catalog entry.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from tests.conftest import SF_SMALL

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def canon(val):
    """Canonicalize a cell for cross-engine comparison."""
    import datetime
    import decimal

    if val is None:
        return None
    if isinstance(val, decimal.Decimal):
        return float(val)
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        # exact — the driver hash-compares values bit-for-bit, so a
        # lenient local compare would hide 1-ulp cross-engine drift
        # (round 1's three hash failures passed locally at round 9)
        return val
    if isinstance(val, datetime.datetime):
        return val.replace(tzinfo=None).isoformat()
    if isinstance(val, datetime.date):
        return val.isoformat()
    return val


def rows_to_multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(canon(r[i]) for i in idx) for r in rows),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    ), [cols[i] for i in idx]


def compare(spark, name, fn, sql, sf_dir):
    sdf = fn(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns

    con = duck_con(sf_dir)
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    con.close()

    assert sorted(scols) == sorted([c.lower() for c in dcols]) or \
        sorted(scols) == sorted(dcols), \
        f"{name}: column mismatch spark={sorted(scols)} duck={sorted(dcols)}"
    assert len(srows) == len(drows), \
        f"{name}: row count spark={len(srows)} duck={len(drows)}"

    sset, _ = rows_to_multiset(scols, [tuple(r) for r in srows])
    dset, _ = rows_to_multiset(dcols, drows)
    mismatches = [
        (a, b) for a, b in zip(sset, dset) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first 3: "
        f"{mismatches[:3]}")


def _catalog():
    from stock_market_data_pipeline_spark.catalog import ORACLES, QUERIES
    return QUERIES, ORACLES


def test_every_query_has_oracle_or_is_flagged():
    queries, oracles = _catalog()
    missing = set(queries) - set(oracles)
    # non-SQL-expressible ops are allowed to omit an oracle; keep the
    # list explicit so additions are deliberate
    allowed_no_oracle = {n for n in missing if n.startswith(("stream_", "mm_"))}
    assert missing == allowed_no_oracle, (
        f"queries without oracle: {missing - allowed_no_oracle}")


@pytest.mark.parametrize("name", sorted(_catalog()[1]))
def test_oracle_parity(spark, name):
    queries, oracles = _catalog()
    compare(spark, name, queries[name], oracles[name], SF_SMALL)
