"""Mergeable distinct-count sketches (HyperLogLog), Catalyst-native.

Why a table engine needs these at 100 TB: COUNT(DISTINCT) over a year
of events re-shuffles the raw key space every time the window moves.
A per-partition (per-day) HLL register array is a few hundred bytes,
MERGEABLE by element-wise max — so "distinct users last 90 days" is a
fold over 90 stored sketch rows instead of a re-scan, and backfilling
one late day only rebuilds that day's sketch.  This is the published
HyperLogLog construction (Flajolet/Fusy/Gandouet/Meunier 2007, the
same algorithm behind Spark's own approx_count_distinct), implemented
deterministically: md5-based 60-bit hashing (the repo-wide
cross-engine hash idiom — manifest.py's Bloom filters and
llm/dedup.py's shingle ids use the same 15-hex-char fold), so a DuckDB
oracle can rebuild byte-identical registers.

Everything is built-in-function column math — explode-free, UDF-free:
one shuffle to (keys, bucket) grain, one to keys grain for the dense
array.  The estimator uses the standard bias-corrected formula with
the small-range linear-counting correction; its output is a double and
is NOT claimed bit-stable across engines (libm ln/pow differ) — exact
integer register state is the parity surface, the estimate is the
serving surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_hash(col: Column) -> Column:
    """Deterministic 60-bit hash: first 15 hex chars of md5 of the
    value's canonical string.  DuckDB twin:
    ``CAST('0x' || substring(md5(CAST(x AS VARCHAR)), 1, 15) AS
    BIGINT)``."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15),
                  16, 10).cast("long")


def hll_registers(df: DataFrame, keys: list[str], col: str,
                  p: int = 8) -> DataFrame:
    """Per-group HLL register arrays: ``keys + [hll: array<int>]``
    with 2**p registers.  bucket = low p bits of the hash; rank =
    leading-zero count of the remaining (60-p) bits + 1, computed
    EXACTLY via binary-string length (no float log2 — a log2(2^k)
    rounding down at a power of two would understate ranks on both
    engines differently)."""
    m = 1 << p
    width = 60 - p
    h = hll_hash(F.col(col))
    # high 60-p bits via shiftright — a float division here would
    # round through double's 53-bit mantissa and corrupt low bits
    w = F.shiftright(h, p)
    msb = F.length(F.conv(w.cast("string"), 10, 2))
    rank = (F.when(w == 0, width + 1)
            .otherwise(width - msb + 1)).cast("int")
    per_bucket = (df
                  .withColumn("__b", (h % m).cast("int"))
                  .withColumn("__r", rank)
                  .groupBy(*keys, "__b")
                  .agg(F.max("__r").alias("__mr")))
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("__map"), i.cast("int")), F.lit(0)))
    return (per_bucket
            .groupBy(*keys)
            .agg(F.map_from_entries(
                F.collect_list(F.struct("__b", "__mr")))
                .alias("__map"))
            .select(*keys, dense.cast("array<int>").alias("hll")))


def hll_merge(a: Column, b: Column) -> Column:
    """Element-wise register max — the HLL union.  Associative and
    commutative, so daily sketches roll up to months/years in any
    order; NULL-safe (a missing side passes the other through)."""
    return (F.when(a.isNull(), b).when(b.isNull(), a)
            .otherwise(F.zip_with(a, b, lambda x, y: F.greatest(x, y))))


def hll_merge_agg(col: str) -> Column:
    """Aggregate form of the union: fold register arrays grouped
    under one key into a single sketch (collect + sequential
    zip_with fold — the group's sketch count is the ROLLUP grain,
    days-per-month scale, never row scale)."""
    return F.aggregate(
        F.collect_list(col),
        F.lit(None).cast("array<int>"),
        lambda acc, x: F.when(acc.isNull(), x).otherwise(
            F.zip_with(acc, x, lambda a, b: F.greatest(a, b))))


def hll_estimate(hll: Column, p: int = 8) -> Column:
    """Cardinality estimate: alpha_m * m^2 / sum(2^-reg) with the
    small-range linear-counting correction (E <= 2.5m and empty
    registers present -> m * ln(m / zeros)).  Standard error is
    ~1.04/sqrt(m) (6.5% at p=8)."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    inv = F.aggregate(
        hll, F.lit(0.0),
        lambda acc, x: acc + F.pow(F.lit(2.0), -x.cast("double")))
    raw = F.lit(alpha * m * m) / inv
    zeros = F.size(F.filter(hll, lambda x: x == 0))
    return F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros))\
        .otherwise(raw)


def hll_zeros(hll: Column) -> Column:
    """Count of never-hit registers (exact integer — part of the
    cross-engine parity surface)."""
    return F.size(F.filter(hll, lambda x: x == 0)).cast("long")


def hll_register_sum(hll: Column) -> Column:
    """Sum of register values (exact integer — with :func:`hll_zeros`
    a compact equality witness for the whole register array)."""
    return F.aggregate(hll, F.lit(0).cast("long"),
                       lambda acc, x: acc + x)


def hll_estimate_py(regs: list[int]) -> int:
    """Driver-side twin of :func:`hll_estimate` (same formula, same
    corrections) for register arrays stored in COMMIT OBJECTS —
    ANALYZE keeps per-column sketches a few hundred bytes each in the
    manifest (manifest.py:analyze), so merging statistics across
    appends/versions is pure metadata math, no Spark job at all."""
    import math

    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / sum(2.0 ** -r for r in regs)
    zeros = regs.count(0)
    if raw <= 2.5 * m and zeros:
        return int(round(m * math.log(m / zeros)))
    return int(round(raw))


def hll_merge_py(a: list[int], b: list[int]) -> list[int]:
    """Driver-side register union (element-wise max) — the metadata
    half of incremental ANALYZE."""
    return [x if x >= y else y for x, y in zip(a, b)]


# -- Count-Min frequency sketches ------------------------------------
#
# Why a table engine wants these at 100 TB: join-key SKEW is the
# single most common scale killer (one hot key -> one straggler
# task), and deciding "salt this join" requires key frequencies —
# which normally costs a full groupBy scan of the fact.  A Count-Min
# sketch (Cormode & Muthukrishnan 2005) is a d x w grid of counters,
# updated by pure addition, so it is (a) order-independent — the same
# rows in any distribution give the SAME integers, (b) mergeable
# across appends/partitions by element-wise add, and (c) a few KB —
# it lives in the commit object next to the HLL registers, and
# "how hot is key K?" becomes d array lookups against stored stats,
# never a scan.  Estimates OVERCOUNT only (min over d rows bounds the
# error by ~e/w of total rows); an under-estimate is impossible, the
# property that makes "skip salting" decisions safe.
#
# Hashing is the repo-wide md5 idiom (row index salted into the
# digest), so a DuckDB oracle rebuilds byte-identical counters.

CMS_D, CMS_W = 4, 256


def cms_bucket(col: Column, row: int, w: int = CMS_W) -> Column:
    """Counter index of ``col`` in CMS row ``row``: first 15 hex
    chars of md5('<row>|' || value), mod w.  DuckDB twin:
    ``CAST('0x' || substring(md5('<row>|' || CAST(x AS VARCHAR)),
    1, 15) AS BIGINT) % w``."""
    return (F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{row}|"), col.cast("string"))),
        1, 15), 16, 10).cast("long") % w).cast("int")


def cms_counters(df: DataFrame, col: str,
                 d: int = CMS_D, w: int = CMS_W) -> list[list[int]]:
    """Build the d x w counter grid over ``df[col]`` (NULLs excluded,
    matching NDV semantics) with ONE Spark job at (row, bucket)
    grain — d*w <= 1024 result rows regardless of input size.
    Returns plain ints (the commit-object payload)."""
    src = df.where(F.col(col).isNotNull())
    buckets = F.array(*[cms_bucket(F.col(col), i, w)
                        for i in range(d)])
    grid = (src.select(F.posexplode(buckets).alias("i", "b"))
            .groupBy("i", "b").agg(F.count("*").alias("n"))
            .collect())
    out = [[0] * w for _ in range(d)]
    for r in grid:
        out[r["i"]][r["b"]] = int(r["n"])
    return out


def cms_merge_py(a: list[list[int]],
                 b: list[list[int]]) -> list[list[int]]:
    """Element-wise add — the CMS union (exact: counters are pure
    sums, so merged == rebuilt-over-union, bit for bit)."""
    return [[x + y for x, y in zip(ra, rb)] for ra, rb in zip(a, b)]


# -- Deterministic log-histogram quantile sketches --------------------
#
# Why a table engine wants these at 100 TB: range-predicate
# selectivity and "what does p99 latency look like this month" both
# need QUANTILES, and exact percentile_cont is a full sort-shuffle of
# the fact — per query.  A mergeable quantile sketch stored next to
# the HLL/CMS state in the commit object answers from metadata.
#
# Construction: the DDSketch bucket family (Masson/Rim/Lee, VLDB
# 2019 — log-spaced buckets, counts exact, value error relative) on
# INTEGER-EXACT bucketing, deliberately chosen over KLL: KLL's
# randomized compaction violates this repo's determinism rule
# (SURVEY §8.6 — every stored sketch must be bit-replayable by a
# DuckDB oracle), while log-bucket indices are pure integer math —
# order-independent, identical on any engine with 64-bit shifts.
#
#   quantize    q  = CAST(FLOOR(x * scale) AS BIGINT), a = |q|
#   linear      a < 128           -> key = a          (exact)
#   log         a >= 128: bl = bit_length(a)
#               key = 128 + (bl-8)*32 + ((a >> (bl-6)) - 32)
#   sign        key = -key when q < 0
#
# 32 sub-buckets per octave -> relative value error <= 1/32 from a
# bucket bound (±1/64 from the midpoint representative); values
# |q| < 128 are EXACT.  Keys are monotone in the value, so quantile
# lookup is a cumulative walk; counts are pure sums, so the merge is
# element-wise addition and merged == rebuilt-over-union, bit for
# bit (the analyze_incremental property).  Rank error is ZERO at
# bucket granularity: the returned bucket provably contains the
# target rank.

DDQ_LINEAR = 128        #: |quantized| below this -> exact bucket
DDQ_SUB_BITS = 5        #: 2^5 sub-buckets per octave


def ddq_buckets(df: DataFrame, col: str,
                scale: float = 1.0) -> list[list[int]]:
    """Build the sparse [bucket_key, count] pairs over ``df[col]``
    (NULLs excluded, matching NDV semantics; NaN and +/-Infinity are
    excluded too — Spark's non-ANSI long cast would silently bucket
    NaN at 0 and Inf at the extreme key while DuckDB ERRORS on the
    same cast, so non-finite values have no replayable bucket and a
    sketch that counted them could never be oracle-verified) with
    ONE Spark job at bucket grain — <= ~3.8k result rows regardless
    of input size (56 octaves x 32 sub-buckets + 128 linear, per
    sign).  Magnitudes with ``|x*scale| >= 2**53`` are excluded like
    the non-finite values (ADVICE r14 #3): above 2^53 double
    precision already diverges from DuckDB's integer math, and at
    2^63 Spark's non-ANSI long cast CLAMPS where DuckDB's CAST
    errors — either way the cross-engine bit-replay contract breaks,
    so such values have no replayable bucket.  DuckDB twin of the
    key formula (add ``AND isfinite(x) AND abs(x*scale) <
    9007199254740992`` to the WHERE when the data may carry
    non-finite or astronomically-scaled doubles)::

        q  = CAST(FLOOR(CAST(x AS DOUBLE) * scale) AS BIGINT)
        a  = abs(q);  bl = length(bin(a))
        k  = CASE WHEN a < 128 THEN a
             ELSE 128 + (bl-8)*32 + ((a >> (bl-6)) - 32) END
        key = CASE WHEN q < 0 THEN -k ELSE k END

    Returns plain ints sorted by key (the commit-object payload)."""
    xd = F.col(col).cast("double")
    src = df.where(xd.isNotNull() & ~F.isnan(xd)
                   & (xd > float("-inf")) & (xd < float("inf"))
                   & (F.abs(xd * F.lit(float(scale)))
                      < F.lit(float(2 ** 53))))
    rows = (src
            .select(F.floor(F.col(col).cast("double")
                            * F.lit(float(scale)))
                    .cast("long").alias("__q"))
            .withColumn("__a", F.abs(F.col("__q")))
            .withColumn("__bl", F.length(
                F.conv(F.col("__a").cast("string"), 10, 2)))
            .withColumn("__k", F.when(
                F.col("__a") < DDQ_LINEAR, F.col("__a"))
                .otherwise(F.lit(DDQ_LINEAR)
                           + (F.col("__bl") - 8) * 32
                           + F.expr("shiftright(__a, __bl - 6) - 32")))
            .withColumn("__k", F.when(F.col("__q") < 0,
                                      -F.col("__k"))
                        .otherwise(F.col("__k")).cast("long"))
            .groupBy("__k").agg(F.count("*").alias("n"))
            .collect())
    return sorted([int(r["__k"]), int(r["n"])] for r in rows)


def ddq_merge_py(a: list[list[int]],
                 b: list[list[int]]) -> list[list[int]]:
    """Per-key count addition — the sketch union (exact: counts are
    pure sums, so merged == rebuilt-over-union, bit for bit)."""
    out: dict[int, int] = {}
    for k, n in list(a) + list(b):
        out[k] = out.get(k, 0) + n
    return sorted([k, n] for k, n in out.items())


def ddq_bounds_py(key: int, scale: float = 1.0) -> tuple:
    """[lower, upper) value bounds of a bucket key, unscaled — the
    rank-containment surface a test can assert exactly."""
    s, k = (-1, -key) if key < 0 else (1, key)
    if k < DDQ_LINEAR:
        lo, hi = k, k + 1
    else:
        bl = 8 + (k - DDQ_LINEAR) // 32
        sub = (k - DDQ_LINEAR) % 32
        lo = (32 + sub) << (bl - 6)
        hi = lo + (1 << (bl - 6))
    if s < 0:
        lo, hi = -hi + 1, -lo + 1   # floor-quantized mirror
    # q = floor(x*scale) = v covers x in [v/scale, (v+1)/scale)
    return lo / scale, (hi) / scale


def ddq_rep_py(key: int, scale: float = 1.0) -> float:
    """Representative (midpoint) value of a bucket key, unscaled."""
    lo, hi = ddq_bounds_py(key, scale)
    return (lo + hi) / 2.0


def ddq_quantile_py(buckets: list[list[int]], q: float,
                    scale: float = 1.0):
    """Quantile estimate from stored pairs: cumulative walk to the
    bucket containing rank ceil(q*n), return its midpoint.  The rank
    is EXACTLY contained (counts are exact); the value error is the
    bucket width — relative <= 1/32 in the log region, absolute
    <= 1/scale in the linear region.  None on an empty sketch."""
    import math

    n = sum(c for _, c in buckets)
    if not n:
        return None
    target = min(n, max(1, math.ceil(q * n)))
    cum = 0
    for k, c in sorted(buckets):
        cum += c
        if cum >= target:
            return ddq_rep_py(k, scale)
    raise AssertionError(
        "unreachable: target <= n, so the cumulative walk must "
        "cross it")


def cms_estimate_py(grid: list[list[int]], value,
                    w: int = CMS_W) -> int:
    """Frequency estimate of ``value``: min over rows of the value's
    counter.  Never an undercount; overcount bounded by ~e/w of the
    total count per row.  Uses the same canonical-string md5 as the
    build (ints render without sign/width decoration; floats must be
    queried with the exact stored rendering)."""
    import hashlib

    est = None
    for i, row in enumerate(grid):
        h = int(hashlib.md5(
            f"{i}|{value}".encode()).hexdigest()[:15], 16)
        c = row[h % w]
        est = c if est is None else min(est, c)
    return est or 0


def cms_max_frequency_py(grid: list[list[int]]) -> int:
    """Upper-bound estimate of the HOTTEST key's frequency WITHOUT
    knowing the key: the hottest key lands in some cell of every row,
    so each row's max cell >= its true count, and the min over rows
    is the tightest such bound the sketch offers.  Never an
    undercount of the true max; overcount only when other keys share
    the hot key's cell in every row.  This is the skew probe the
    salting decision needs when no candidate key is known upfront."""
    return min((max(row) for row in grid), default=0)
