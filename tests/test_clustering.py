"""Deterministic quantized k-means properties."""

from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.llm import clustering


def _vecs(spark):
    """Three tight blobs around distinct corners — k-means with k=3
    must recover them exactly regardless of iteration details."""
    import itertools

    rows = []
    blobs = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0)]
    for b, (bx, by) in enumerate(blobs):
        for j, (dx, dy) in enumerate(
                itertools.product((-0.1, 0.0, 0.1), repeat=2)):
            # interleave ids so the k-smallest-id init picks one seed
            # per blob (the documented deterministic-init contract:
            # seeding is the caller's lever, not hidden RNG)
            rows.append((j * 3 + b, [bx + dx, by + dy], b))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, blob int")


def test_kmeans_recovers_separated_blobs(spark):
    df = _vecs(spark)
    out = clustering.kmeans_quantized(df, "embedding", "vec_id",
                                      k=3, iters=3)
    # every blob maps to exactly one cluster and vice versa
    m = (out.groupBy("blob")
         .agg(F.countDistinct("cluster").alias("k"),
              F.count("*").alias("n")).collect())
    assert all(r["k"] == 1 and r["n"] == 9 for r in m)
    assert out.select("cluster").distinct().count() == 3


def test_kmeans_is_deterministic(spark):
    df = _vecs(spark)
    a = {r["vec_id"]: r["cluster"] for r in
         clustering.kmeans_quantized(df, "embedding", "vec_id",
                                     k=3, iters=2).collect()}
    b = {r["vec_id"]: r["cluster"] for r in
         clustering.kmeans_quantized(df, "embedding", "vec_id",
                                     k=3, iters=2).collect()}
    assert a == b


def test_kmeans_matches_python_reference(spark):
    """The Spark column math must replay the integer recipe exactly
    (the same contract the DuckDB oracle leans on)."""
    import math

    df = _vecs(spark)
    rows = sorted(
        ((r["vec_id"], list(r["embedding"]))
         for r in df.select("vec_id", "embedding").collect()))
    vm = {i: [math.floor(float(x) * 1_000_000) for x in v]
          for i, v in rows}
    cents = [vm[i] for i, _ in rows[:3]]

    def _assign(c):
        out = {}
        for i, v in vm.items():
            d = [(sum((a - b) ** 2 for a, b in zip(v, cc)), j)
                 for j, cc in enumerate(c)]
            out[i] = min(d)[1]
        return out

    a1 = _assign(cents)
    for cid in range(3):
        members = [vm[i] for i, c in a1.items() if c == cid]
        if members:
            n = len(members)
            cents[cid] = [
                (s - (s % n + n) % n) // n
                for s in (sum(col) for col in zip(*members))]
    exp = _assign(cents)
    got = {r["vec_id"]: r["cluster"] for r in
           clustering.kmeans_quantized(df, "embedding", "vec_id",
                                       k=3, iters=2).collect()}
    assert got == exp


def test_empty_cluster_keeps_previous_centroid(spark):
    """k larger than the natural cluster count: seeds 4-9 collapse
    onto the blob winners and some clusters stay empty — the update
    must keep their previous centroids instead of crashing or
    emitting NULL rows."""
    df = _vecs(spark)
    out = clustering.kmeans_quantized(df, "embedding", "vec_id",
                                      k=9, iters=2)
    assert out.count() == 27
    assert out.where(F.col("cluster").isNull()).count() == 0


def test_update_mean_is_exact_beyond_double_precision(spark):
    """ADVICE r12 (low): the floored integer mean must never route
    through a double — 2**53 + 1 is the first BIGINT a double cannot
    hold, so a single-member cluster there exposes any float path
    (the old (s - pmod) / n cast lost the trailing 1)."""
    big = (1 << 53) + 1
    df = spark.createDataFrame(
        [(0, [big]), (1, [2]), (1, [4])],
        "cluster int, vm array<long>")
    got = clustering.update(df, "vm", 2, [[0], [0]])
    assert got == [[big], [3]]
