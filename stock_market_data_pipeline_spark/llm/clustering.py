"""Semantic clustering over embeddings: deterministic quantized
k-means (Lloyd's algorithm), Catalyst-native.

Why quantized: float k-means is not reproducible across engines (sum
order changes every centroid bit pattern), so this implementation
quantizes each float32 coordinate to a 64-bit integer (floor(x * 1e6)
— the same scaled-int trick the embedding_centroids oracle uses) and
runs Lloyd's iterations ENTIRELY in integer arithmetic: squared-
distance sums are exact, argmin ties break on the smaller centroid
id, and centroid updates use floored integer division.  Every engine
that follows the recipe produces the identical clustering — which is
what lets a DuckDB oracle replay it and hash-match.

Scale shape (100 TB): each iteration is one broadcast of k×d integer
centroids (a few KB) into a map-side distance expression — NO
cross join, NO shuffle for assignment — plus one (cluster, dim)-grain
aggregation for the update (k*d rows out).  The only driver-side data
is the k×d centroid matrix.  Iterations are a fixed, small count
(semantic bucketing for dedup/curation, not convergence-chasing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def quantize(col) -> "F.Column":
    """float32 embedding -> exact BIGINT coordinates:
    floor(double(x) * 1e6).  float->double widening is exact; the
    product rounds identically under IEEE754 on every engine."""
    return F.transform(
        col, lambda x: F.floor(x.cast("double") * SCALE).cast("long"))


def _dist(vm, centroid: list) -> "F.Column":
    """Exact integer squared distance between the quantized vector
    column and one Python-side centroid (k*d literals — tiny)."""
    carr = F.array(*[F.lit(int(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(vm, carr, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def assign(df: DataFrame, vm_col: str,
           centroids: list[list[int]]) -> DataFrame:
    """Add ``cluster``: argmin over exact distances to each centroid,
    ties to the SMALLER centroid id (array_min on (dist, cid) structs
    orders lexicographically — exact integers, no float ties)."""
    pairs = F.array(*[
        F.struct(_dist(F.col(vm_col), c).alias("d"),
                 F.lit(i).alias("cid"))
        for i, c in enumerate(centroids)])
    return df.withColumn("cluster",
                         F.array_min(pairs)["cid"].cast("int"))


def update(df: DataFrame, vm_col: str, k: int,
           prev: list[list[int]]) -> list[list[int]]:
    """New centroids: per-(cluster, dim) floored integer mean —
    (sum - pmod(sum, n)) is exactly divisible by n, and SQL ``div``
    keeps the quotient in BIGINT end-to-end (no double round-trip),
    so the result is bit-exact for the full int64 sum domain and
    matches DuckDB's integer ``//`` on the oracle side.  A cluster
    that captured no vectors keeps its previous centroid (standard
    Lloyd stance, deterministic)."""
    agg = (df.select("cluster",
                     F.posexplode(F.col(vm_col)).alias("pos", "v"))
           .groupBy("cluster", "pos")
           .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
           .withColumn("c", F.expr("(s - pmod(s, n)) div n"))
           .collect())
    out = [list(c) for c in prev]
    dims: dict[int, dict[int, int]] = {}
    for r in agg:
        dims.setdefault(r["cluster"], {})[r["pos"]] = r["c"]
    for cid, bydim in dims.items():
        out[cid] = [bydim[i] for i in range(len(prev[cid]))]
    return out


def kmeans_quantized(df: DataFrame, vec_col: str, id_col: str,
                     k: int = 8, iters: int = 2) -> DataFrame:
    """Deterministic k-means over an embedding column.  Init: the
    quantized vectors of the k smallest ``id_col`` values (no RNG —
    reruns and oracles agree row-for-row).  ``iters`` assignment
    passes with ``iters - 1`` centroid updates between them (fixed
    work, the curation-pipeline shape).  Returns the input plus
    ``cluster``."""
    vm = df.select(id_col, quantize(F.col(vec_col)).alias("vm"))
    seed_rows = (vm.orderBy(id_col).limit(k).collect())
    centroids = [list(r["vm"]) for r in seed_rows]
    cur = assign(vm, "vm", centroids)
    for _ in range(iters - 1):
        centroids = update(cur, "vm", k, centroids)
        cur = assign(vm, "vm", centroids)
    return df.join(cur.select(id_col, "cluster"), id_col)
