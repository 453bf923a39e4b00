#!/usr/bin/env python
"""Generate sf1 stress data as a deterministic 10x replication of the
driver's READ-ONLY sf0.1 testdata (TESTDATA.md forbids regeneration,
and no sf1 directory ships with the container).

Construction (seedless, fully determined by sf0.1):
- every int64 entity key (orderkey/custkey/suppkey/partkey/event_id/
  user_id/doc_id/vec_id) is offset by replica*10_000_000 — referential
  integrity holds within each replica, and the offset is divisible by
  every modulus the engine derives semantics from (10 for snapshot
  churn, 8 for pack shards) so per-replica distributions match sf0.1;
- region/nation stay fixed (fixed-size dims, as in TPC-H);
- dates/timestamps keep the sf0.1 range: 10x density on the same
  calendar = a 10x-bigger market, which is how this workload scales;
- document text gets a per-replica suffix token (replicas are NEAR
  duplicates — realistic web-scale near-dup clusters — instead of
  exact byte duplicates that would degenerate the dedup family);
  n_chars is recomputed from the new text;
- embeddings perturb element 0 by replica*1e-3 (breaks exact-duplicate
  degeneracy in the cosine/ANN family, keeps clusters).

Correctness at sf1 is still oracle-checked: the sweep runs DuckDB on
these same parquet files, so hash parity is available at 10x bench
scale — this generator only manufactures inputs, never expected
outputs.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/sf1data"
REPLICAS = 10
K = 10_000_000

PLAIN = {  # table -> per-replica SELECT (k = replica index)
    "region": None,    # fixed dim, copied once
    "nation": None,
    "customer": """
        SELECT c_custkey + k * {K} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment FROM src CROSS JOIN ks
    """,
    "supplier": """
        SELECT s_suppkey + k * {K} AS s_suppkey, s_name, s_nationkey,
               s_acctbal FROM src CROSS JOIN ks
    """,
    "part": """
        SELECT p_partkey + k * {K} AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice FROM src CROSS JOIN ks
    """,
    "orders": """
        SELECT o_orderkey + k * {K} AS o_orderkey,
               o_custkey + k * {K} AS o_custkey, o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority
        FROM src CROSS JOIN ks
    """,
    "lineitem": """
        SELECT l_orderkey + k * {K} AS l_orderkey,
               l_partkey + k * {K} AS l_partkey,
               l_suppkey + k * {K} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM src CROSS JOIN ks
    """,
    "events": """
        SELECT event_id + k * {K} AS event_id, ts,
               user_id + k * {K} AS user_id, event_type, value, props
        FROM src CROSS JOIN ks
    """,
    "documents": """
        SELECT doc_id + k * {K} AS doc_id,
               CASE WHEN k = 0 THEN text
                    ELSE text || ' r' || CAST(k AS VARCHAR) END AS text,
               lang, source,
               CAST(length(CASE WHEN k = 0 THEN text
                    ELSE text || ' r' || CAST(k AS VARCHAR) END)
                    AS BIGINT) AS n_chars
        FROM src CROSS JOIN ks
    """,
    "embeddings": """
        SELECT vec_id + k * {K} AS vec_id,
               CAST(list_prepend(embedding[1] + k * CAST(0.001 AS FLOAT),
                                 embedding[2:]) AS FLOAT[]) AS embedding,
               label
        FROM src CROSS JOIN ks
    """,
}


def main() -> int:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE ks AS SELECT unnest(range({REPLICAS})) AS k")
    for name, sql in PLAIN.items():
        src = os.path.join(SRC, f"{name}.parquet")
        dst = os.path.join(DST, f"{name}.parquet")
        con.execute(f"CREATE OR REPLACE VIEW src AS "
                    f"SELECT * FROM read_parquet('{src}')")
        body = (f"SELECT * FROM src" if sql is None
                else sql.format(K=K))
        con.execute(f"COPY ({body}) TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{dst}')") \
            .fetchone()[0]
        print(f"{name}: {n} rows -> {dst}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
