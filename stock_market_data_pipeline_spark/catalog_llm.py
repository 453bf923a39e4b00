"""Catalog entries for the LLM-data-pipeline operators (llm/*).

Oracle SQL is generated from the same constants the Spark operators
use (MINHASH_P / MINHASH_AB / FINGERPRINT_P), so both engines run the
identical integer math. See llm/dedup.py for the determinism contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import _t, q
from .llm import curation, dedup, multimodal, similarity, textops
from .llm.dedup import MINHASH_AB, MINHASH_P
from .llm.textops import FINGERPRINT_P

# ---------------------------------------------------------------- SQL
# shared fragments

def _shingle_cte(k: int = 3) -> str:
    """words -> distinct k-word shingles per doc (matches
    llm.dedup.shingle_table boundary semantics)."""
    return f"""
words AS (SELECT doc_id, str_split(text, ' ') AS w FROM documents),
idx AS (SELECT doc_id, w,
               unnest(generate_series(1, greatest(len(w) - {k - 1}, 1))) AS i
        FROM words),
sh AS (SELECT DISTINCT doc_id,
              array_to_string(w[i:i+{k - 1}], ' ') AS shingle
       FROM idx)""".strip()


_JACCARD_TAIL = """
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)""".strip()


def _jaccard_select(tau: float, candidate_join: str = "") -> str:
    return f"""
SELECT c.doc_a, c.doc_b, c.n_common,
       c.n_common / (sa.n + sb.n - c.n_common) AS jaccard
FROM common c
{candidate_join}
JOIN sizes sa ON c.doc_a = sa.doc_id
JOIN sizes sb ON c.doc_b = sb.doc_id
WHERE c.n_common / (sa.n + sb.n - c.n_common) >= {tau}""".strip()


DEDUP_EXACT_SQL = """
WITH h AS (
  SELECT doc_id, md5(text) AS content_md5,
         md5(array_to_string(list_sort(list_distinct(str_split(text, ' '))),
             ' ')) AS canon_md5
  FROM documents
)
SELECT doc_id, content_md5, canon_md5,
       COUNT(*) OVER (PARTITION BY canon_md5) AS dup_group_size,
       CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY canon_md5)
            THEN 1 ELSE 0 END AS is_canonical
FROM h
""".strip()

NGRAM_JACCARD_SQL = f"""
WITH {_shingle_cte(3)},
{_JACCARD_TAIL}
{_jaccard_select(0.5)}
""".strip()


def _minhash_sql(bands: int = 4, tau: float = 0.5) -> str:
    n_perm = len(MINHASH_AB)
    r = n_perm // bands
    mins = ",\n       ".join(
        f"MIN(({a} * x + {b}) % {MINHASH_P}) AS h{j}"
        for j, (a, b) in enumerate(MINHASH_AB))
    band_selects = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, concat_ws('-', "
        + ", ".join(f"h{b * r + i}" for i in range(r))
        + ") AS sig FROM sig"
        for b in range(bands))
    return f"""
WITH {_shingle_cte(3)},
ids AS (
  SELECT doc_id,
         CAST('0x' || substring(md5(shingle), 1, 15) AS BIGINT)
           % {MINHASH_P} AS x
  FROM sh
),
sig AS (
  SELECT doc_id,
       {mins}
  FROM ids GROUP BY doc_id
),
bands_long AS (
{band_selects}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands_long a
  JOIN bands_long b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
),
{_JACCARD_TAIL}
{_jaccard_select(tau, candidate_join="JOIN cand ON c.doc_a = cand.doc_a AND c.doc_b = cand.doc_b")}
""".strip()


TEXT_STATS_SQL = """
SELECT doc_id, lang, source,
       length(text) AS n_chars,
       len(str_split(text, ' ')) AS n_words,
       len(list_distinct(str_split(text, ' '))) AS n_unique_words,
       len(list_filter(str_split(text, ' '),
           x -> x = 'a' OR x = 'the')) AS n_stopwords,
       len(list_distinct(str_split(text, ' ')))
         / len(str_split(text, ' ')) AS uniq_ratio,
       len(list_filter(str_split(text, ' '), x -> x = 'a' OR x = 'the'))
         / len(str_split(text, ' ')) AS stop_ratio,
       (length(text) - (len(str_split(text, ' ')) - 1))
         / len(str_split(text, ' ')) AS avg_word_len,
       len(regexp_extract_all(text, '[aeiou]+')) AS n_vowel_groups
FROM documents
""".strip()

QUALITY_SCORE_SQL = """
WITH s AS (
  SELECT doc_id, lang,
         len(str_split(text, ' ')) AS n_words,
         len(list_distinct(str_split(text, ' ')))
           / len(str_split(text, ' ')) AS uniq_ratio,
         len(list_filter(str_split(text, ' '), x -> x = 'a' OR x = 'the'))
           / len(str_split(text, ' ')) AS stop_ratio
  FROM documents
)
SELECT doc_id, lang, n_words, uniq_ratio, stop_ratio,
       least(n_words / 50.0, 1.0) AS length_prior,
       0.4 * uniq_ratio + 0.3 * (1.0 - stop_ratio)
         + 0.3 * least(n_words / 50.0, 1.0) AS quality_score
FROM s
""".strip()

LANG_ID_SQL = """
WITH s AS (
  SELECT doc_id, lang,
         len(list_filter(str_split(text, ' '), x -> x = 'a' OR x = 'the'))
           / len(str_split(text, ' ')) AS stopword_rate
  FROM documents
)
SELECT doc_id, lang, stopword_rate,
       CASE WHEN stopword_rate >= 0.02 THEN 'en' ELSE 'und' END
         AS predicted_lang,
       CASE WHEN (CASE WHEN stopword_rate >= 0.02 THEN 'en' ELSE 'und' END)
                 = lang THEN 1 ELSE 0 END AS agrees_with_label
FROM s
""".strip()

FINGERPRINT_SQL = f"""
SELECT doc_id,
       len(list_distinct(str_split(text, ' '))) AS n_unique_words,
       CAST(list_sum(list_transform(
              list_distinct(str_split(text, ' ')),
              x -> CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)
                   % {FINGERPRINT_P}))
            % {FINGERPRINT_P} AS BIGINT) AS fingerprint
FROM documents
""".strip()

def _simhash_sql(bits: int = 32, k: int = 3) -> str:
    """Per-doc SimHash signature over k-word shingles — mirrors
    llm.dedup.simhash_signatures bit-for-bit."""
    hexid = (f"CAST('0x' || substring(md5(shingle), 1, 15) AS BIGINT)"
             f" % {MINHASH_P}")
    bit_sums = ",\n       ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(bits))
    sig = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {2 ** j} ELSE 0 END)"
        for j in range(bits))
    return f"""
WITH {_shingle_cte(k)},
ids AS (SELECT doc_id, {hexid} AS h FROM sh),
sums AS (
  SELECT doc_id,
       {bit_sums}
  FROM ids GROUP BY doc_id
)
SELECT doc_id, CAST({sig} AS BIGINT) AS simhash
FROM sums
""".strip()


def _simhash_pairs_sql(max_hamming: int = 4) -> str:
    from .llm.dedup import SIMHASH_CHUNK_BITS
    sig = _simhash_sql()
    idxs, vals, off = [], [], 0
    for i, b in enumerate(SIMHASH_CHUNK_BITS):
        idxs.append(str(i))
        vals.append(
            f"CAST((simhash >> {off}) & {(1 << b) - 1} AS BIGINT)")
        off += b
    idx_list = ", ".join(idxs)
    val_list = ",\n           ".join(vals)
    return f"""
WITH sigt AS ({sig}),
chunks AS (
  SELECT doc_id, simhash,
         unnest([{idx_list}]) AS chunk_idx,
         unnest([
           {val_list}
         ]) AS chunk_val
  FROM sigt
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sim_a, b.simhash AS sim_b
  FROM chunks a
  JOIN chunks b ON a.chunk_idx = b.chunk_idx
               AND a.chunk_val = b.chunk_val
               AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, sim_a, sim_b,
       CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(sim_a, sim_b)) <= {max_hamming}
""".strip()


# dot product / norm fragments for the embedding oracles: strict
# left-to-right double fold, mirroring Spark's sequential aggregate()
# (see llm.similarity.dot_exact)
_DOT = ("list_reduce(list_transform(list_zip({a}, {b}), "
        "z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), "
        "(acc, x) -> acc + x)")
_NORM = ("sqrt(list_reduce(list_transform({v}, "
         "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
         "(acc, x) -> acc + x))")


def _ann_sql(n_queries: int, k: int, ivf: bool) -> str:
    cell_sel = ", label AS cell" if ivf else ""
    join = ("JOIN c ON q.cell = c.cell AND c.cand_id != q.query_id"
            if ivf else "CROSS JOIN c")
    where = "" if ivf else "WHERE c.cand_id != q.query_id"
    cell_out = "cell, " if ivf else ""
    return f"""
WITH e AS (
  SELECT vec_id, embedding{cell_sel},
         {_NORM.format(v='embedding')} AS norm
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, embedding AS q_vec, norm AS q_norm
             {', cell' if ivf else ''}
      FROM e WHERE vec_id < {n_queries}),
c AS (SELECT vec_id AS cand_id, embedding AS c_vec, norm AS c_norm
             {', cell' if ivf else ''}
      FROM e),
scored AS (
  SELECT q.query_id, {('q.cell AS cell, ' if ivf else '')}c.cand_id,
         CASE WHEN q.q_norm > 0 AND c.c_norm > 0 THEN
           {_DOT.format(a='q.q_vec', b='c.c_vec')} / (q.q_norm * c.c_norm)
         END AS cosine
  FROM q {join}
  {where}
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id
      ORDER BY cosine DESC NULLS LAST, cand_id) AS rank
  FROM scored
)
SELECT query_id, {cell_out}cand_id, cosine, rank FROM ranked
WHERE rank <= {k}
""".strip()


EMB_NEAR_DUP_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding, label AS cell,
         {_NORM.format(v='embedding')} AS norm
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CASE WHEN a.norm > 0 AND b.norm > 0 THEN
         {_DOT.format(a='a.embedding', b='b.embedding')} / (a.norm * b.norm)
       END AS cosine
FROM e a JOIN e b ON a.cell = b.cell AND a.vec_id < b.vec_id
WHERE (CASE WHEN a.norm > 0 AND b.norm > 0 THEN
         {_DOT.format(a='a.embedding', b='b.embedding')} / (a.norm * b.norm)
       END) >= 0.3
""".strip()


# ------------------------------------------------------------- entries

@q("dedup_exact", DEDUP_EXACT_SQL)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact + canonical-form dedup (hash-partitioned digest groupBy);
    survivor = min doc_id per canonical group."""
    return dedup.dedup_exact(_t(spark, sf_dir, "documents"))


@q("dedup_ngram_jaccard", NGRAM_JACCARD_SQL)
def dedup_ngram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact 3-word-shingle Jaccard >= 0.5 via
    inverted-index bucket join (never all-pairs)."""
    return dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), k=3, tau=0.5)


@q("dedup_minhash_lsh", _minhash_sql(bands=4, tau=0.5))
def dedup_minhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (16 perms) + 4-band LSH candidates, exact-Jaccard
    verified at tau=0.5. Integer-exact in both engines."""
    return dedup.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), k=3, bands=4, tau=0.5)


@q("dedup_simhash", _simhash_pairs_sql(max_hamming=4))
def dedup_simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates: Hamming <= 4 over 32-bit 3-shingle
    signatures, candidates via 8-bit chunk-equality buckets."""
    return dedup.simhash_pairs(_t(spark, sf_dir, "documents"),
                               max_hamming=4, k=3)


def _simhash_star_sql(max_hamming: int = 4) -> str:
    """Star edges per SimHash chunk bucket: member -> bucket min-id
    rep, Hamming-verified — mirrors llm.dedup.simhash_star_edges."""
    from .llm.dedup import SIMHASH_CHUNK_BITS
    sig = _simhash_sql()
    idxs, vals, off = [], [], 0
    for i, b in enumerate(SIMHASH_CHUNK_BITS):
        idxs.append(str(i))
        vals.append(
            f"CAST((simhash >> {off}) & {(1 << b) - 1} AS BIGINT)")
        off += b
    idx_list = ", ".join(idxs)
    val_list = ",\n           ".join(vals)
    return f"""
WITH sigt AS ({sig}),
chunks AS (
  SELECT doc_id, simhash,
         unnest([{idx_list}]) AS chunk_idx,
         unnest([
           {val_list}
         ]) AS chunk_val
  FROM sigt
),
reps AS (
  SELECT chunk_idx, chunk_val, MIN(doc_id) AS rep
  FROM chunks GROUP BY chunk_idx, chunk_val
),
star AS (
  SELECT DISTINCT r.rep AS doc_a, c.doc_id AS doc_b,
         rs.simhash AS sim_a, c.simhash AS sim_b
  FROM chunks c
  JOIN reps r ON c.chunk_idx = r.chunk_idx
             AND c.chunk_val = r.chunk_val
             AND c.doc_id != r.rep
  JOIN sigt rs ON rs.doc_id = r.rep
)
SELECT doc_a, doc_b, sim_a, sim_b,
       CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
FROM star
WHERE bit_count(xor(sim_a, sim_b)) <= {max_hamming}
""".strip()


@q("dedup_simhash_edges_capped", _simhash_star_sql(max_hamming=4))
def dedup_simhash_star_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pair-explosion cap on the SIMHASH family (VERDICT r8 #4,
    the SimHash-bucket half): per chunk-equality bucket, one
    Hamming-VERIFIED edge per member against the bucket's min-id
    representative — at most 5 candidate edges per doc by
    construction, where the all-pairs bucket join
    (`dedup_simhash`, kept as the exactness baseline) is quadratic in
    bucket size.  Verification is mandatory here: a 6-7 bit chunk
    collides at ~1/64 for unrelated docs, so an unverified star would
    weld the corpus.  The entry RAISES unless the candidate volume
    honors the cap."""
    from .llm.dedup import SIMHASH_CHUNK_BITS

    docs = _t(spark, sf_dir, "documents")
    edges = dedup.simhash_star_edges(docs, max_hamming=4, k=3)
    n_docs = docs.count()
    n_edges = edges.count()
    cap = len(SIMHASH_CHUNK_BITS) * n_docs
    if n_edges > cap:
        raise RuntimeError(
            f"simhash star cap violated: {n_edges} edges for {n_docs} "
            f"docs (bound {cap})")
    return edges


@q("text_stats", TEXT_STATS_SQL)
def text_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token statistics (counts, ratios, vowel-group subword
    proxy) — scan+map, no shuffle."""
    return textops.text_stats(_t(spark, sf_dir, "documents"))


@q("text_quality_score", QUALITY_SCORE_SQL)
def quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite pre-training quality filter score."""
    return textops.quality_score(_t(spark, sf_dir, "documents"))


@q("text_lang_id", LANG_ID_SQL)
def lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-rate language-ID heuristic + label agreement flag."""
    return textops.lang_id(_t(spark, sf_dir, "documents"))


PII_SCRUB_SQL = """
WITH injected AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CASE
           WHEN doc_id % 3 = 0 THEN
             text || ' reach user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or 415-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || ' today'
           WHEN doc_id % 3 = 1 THEN
             text || ' server 10.' || CAST(doc_id % 256 AS VARCHAR)
                  || '.0.1 logged'
           ELSE text
         END AS raw
  FROM documents
)
SELECT doc_id,
       CAST(length(regexp_extract_all(raw,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
            AS INTEGER) AS n_emails,
       CAST(length(regexp_extract_all(raw,
            '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS INTEGER) AS n_phones,
       CAST(length(regexp_extract_all(raw,
            '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}'))
            AS INTEGER) AS n_ips,
       regexp_replace(regexp_replace(regexp_replace(raw,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
            '[EMAIL]', 'g'),
            '[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
            '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}',
            '[IP]', 'g') AS scrubbed_text
FROM injected
""".strip()


@q("docs_pii_scrub", PII_SCRUB_SQL)
def pii_scrub_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (the compliance pass before tokenization): count
    and mask emails / phone numbers / IPv4 addresses with JVM-side
    regex column functions — map-side scan, no shuffle, no UDF.
    Deterministic PII is injected into 2/3 of the docs first (the
    corpus is word-salad) with arithmetic the oracle reproduces, so
    the counts are observably nonzero and the full scrubbed text
    hash-checks. Patterns are dialect-neutral (no lookaround, no \\b)
    so Java regex and RE2 agree; one definition in
    llm/textops.py:PII_*_RE."""
    return textops.pii_scrub(_t(spark, sf_dir, "documents"))


@q("text_fingerprint", FINGERPRINT_SQL)
def fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent bag-of-words fingerprint mod p."""
    return textops.fingerprints(_t(spark, sf_dir, "documents"))


def _clusters_sql() -> str:
    """Connected components over the MinHash-LSH pair graph as a
    RECURSIVE min-label reachability CTE (UNION-dedup recursion
    terminates; label = min doc_id of the component)."""
    return f"""
WITH RECURSIVE pairs AS (
{_minhash_sql(bands=4, tau=0.5)}
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach AS (
  SELECT doc_id AS node, doc_id AS label FROM documents
  UNION
  SELECT e.dst AS node, r.label AS label
  FROM reach r JOIN edges e ON e.src = r.node
),
cc AS (SELECT node AS doc_id, MIN(label) AS cluster_id
       FROM reach GROUP BY node)
SELECT doc_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       CASE WHEN doc_id = cluster_id THEN 1 ELSE 0 END AS is_kept
FROM cc
""".strip()


HASH_SPLIT_SQL = """
WITH b AS (
  SELECT doc_id, lang,
         CAST('0x' || substring(md5('doc-' || CAST(doc_id AS VARCHAR)),
                                1, 15) AS BIGINT) % 100 AS bucket
  FROM documents
)
SELECT doc_id, lang, bucket,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
       CASE WHEN (lang = 'en' AND bucket % 2 = 0) OR lang != 'en'
            THEN 1 ELSE 0 END AS in_sample
FROM b
""".strip()


#: cluster-frame memo: dedup_clusters and dedup_survivors_by_quality
#: share the LSH + label-propagation result; the driver runs entries
#: sequentially in one session, so computing components twice (~13s at
#: sf0.01) is pure waste. Keyed by (session, sf_dir); the cached frame
#: is doc-grain (hundreds of rows), negligible memory.
_CC_MEMO: dict = {}


def _clusters(spark: SparkSession, sf_dir: str):
    key = (id(spark), sf_dir)
    if key not in _CC_MEMO:
        # doc-grain computation throughout; no session conf is touched.
        # An untuned session's 200 shuffle partitions would fan the LSH
        # self-join stages into near-empty tasks, but AQE partition
        # coalescing (on in session.py and any modern deployment)
        # collapses those at runtime, and connected_components
        # explicitly key-partitions its own loop frames.
        docs = _t(spark, sf_dir, "documents")
        prs = dedup.minhash_lsh_pairs(docs).select("doc_a", "doc_b")
        cc = dedup.connected_components(
            prs, docs.select("doc_id")).cache()
        cc.count()  # materialize under the cache (doc-grain, tiny)
        _CC_MEMO[key] = cc
    return _CC_MEMO[key]


def _survivors_sql() -> str:
    """Per-cluster survivor = the highest-quality member (ties -> min
    doc_id): recursive-CTE components joined to the quality scores."""
    cc = _clusters_sql()
    # reuse the clusters query verbatim as a CTE (strip its trailing
    # SELECT: it already ends with the cc projection)
    return f"""
WITH RECURSIVE qs AS ({QUALITY_SCORE_SQL}),
clusters AS ({cc})
SELECT c.cluster_id, c.doc_id, q.quality_score, c.cluster_size,
       CASE WHEN ROW_NUMBER() OVER (
                PARTITION BY c.cluster_id
                ORDER BY q.quality_score DESC, c.doc_id) = 1
            THEN 1 ELSE 0 END AS is_survivor
FROM clusters c JOIN qs q ON c.doc_id = q.doc_id
""".strip()


@q("dedup_survivors_by_quality", _survivors_sql())
def dedup_survivors_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor POLICY on top of the dedup clusters: keep the highest
    QUALITY member of each near-dup cluster (real curation pipelines
    keep the best copy, not the smallest id; ties break to min
    doc_id). Quality scores ride in on a doc-grain equi-join; the
    ranking window runs per cluster."""
    from .functions.indicators import flag

    docs = _t(spark, sf_dir, "documents")
    cc = _clusters(spark, sf_dir)
    w = Window.partitionBy("cluster_id")
    cc = cc.withColumn("cluster_size", F.count("*").over(w))
    qs = textops.quality_score(docs).select("doc_id", "quality_score")
    rk = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality_score"), F.asc("doc_id"))
    return (cc.join(qs, "doc_id")
            .withColumn("is_survivor",
                        flag(F.row_number().over(rk) == 1))
            .select("cluster_id", "doc_id", "quality_score",
                    "cluster_size", "is_survivor"))


@q("dedup_clusters", _clusters_sql())
def dedup_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs -> CLUSTERS: connected components over the LSH near-dup
    graph via iterative min-label propagation (near-dup is not
    transitive, so survivor selection needs components, not pairs);
    one kept doc per cluster = the min doc_id. Verified against a
    recursive-CTE reachability oracle."""
    from .functions.indicators import flag

    cc = _clusters(spark, sf_dir)
    w = Window.partitionBy("cluster_id")
    return cc.select(
        "doc_id", "cluster_id",
        F.count("*").over(w).alias("cluster_size"),
        flag(F.col("doc_id") == F.col("cluster_id")).alias("is_kept"))


def _star_clusters_sql(bands: int = 4) -> str:
    """Clusters from the O(docs) STAR-EDGE relation: per LSH bucket,
    every member links to the bucket's min-id representative (a
    window min — no pair join at all), then the same recursive
    min-label reachability as ``_clusters_sql``."""
    n_perm = len(MINHASH_AB)
    r = n_perm // bands
    mins = ",\n       ".join(
        f"MIN(({a} * x + {b}) % {MINHASH_P}) AS h{j}"
        for j, (a, b) in enumerate(MINHASH_AB))
    band_selects = "\nUNION ALL\n".join(
        f"SELECT doc_id, {b} AS band, concat_ws('-', "
        + ", ".join(f"h{b * r + i}" for i in range(r))
        + ") AS sig FROM sig"
        for b in range(bands))
    return f"""
WITH RECURSIVE {_shingle_cte(3)},
ids AS (
  SELECT doc_id,
         CAST('0x' || substring(md5(shingle), 1, 15) AS BIGINT)
           % {MINHASH_P} AS x
  FROM sh
),
sig AS (
  SELECT doc_id,
       {mins}
  FROM ids GROUP BY doc_id
),
bands_long AS (
{band_selects}
),
stars AS (
  SELECT doc_id AS member,
         MIN(doc_id) OVER (PARTITION BY band, sig) AS rep
  FROM bands_long
),
star_edges AS (
  SELECT DISTINCT rep AS doc_a, member AS doc_b
  FROM stars WHERE member != rep
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM star_edges
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM star_edges
),
reach AS (
  SELECT doc_id AS node, doc_id AS label FROM documents
  UNION
  SELECT e.dst AS node, r.label AS label
  FROM reach r JOIN edges e ON e.src = r.node
),
cc AS (SELECT node AS doc_id, MIN(label) AS cluster_id
       FROM reach GROUP BY node)
SELECT doc_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       CASE WHEN doc_id = cluster_id THEN 1 ELSE 0 END AS is_kept
FROM cc
""".strip()


@q("dedup_minhash_edges_capped", _star_clusters_sql())
def dedup_minhash_edges_capped_q(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """The 100 TB pair-explosion cap (VERDICT r8 #4): cluster
    assignment from STAR edges — every LSH bucket member links to the
    bucket's min-id representative, so the edge relation is bounded
    by ``bands * |docs|`` BY CONSTRUCTION while the all-pairs relation
    grows quadratically in cluster size (BENCH_SF1.md measured pairs
    x971 at rows x10; a 10^5-replica boilerplate cluster at 100 TB
    makes the pair relation itself the scale-killer even with every
    join bucketed).  Survivor selection only needs cluster
    MEMBERSHIP, which star edges preserve bucket-by-bucket.

    The entry RAISES unless (a) the edge count actually honors the
    O(docs) cap and (b) the star-edge cluster assignment EQUALS the
    exact-Jaccard-verified all-pairs clustering (`dedup_clusters`) —
    the one semantic delta (a sub-tau bucket collision) must not have
    occurred, making the equivalence a tested fact, not an
    assumption.  Oracle: the same star construction as a recursive-
    CTE reachability in DuckDB."""
    from .functions.indicators import flag

    docs = _t(spark, sf_dir, "documents")
    edges = dedup.minhash_lsh_star_edges(docs)
    n_docs = docs.count()
    n_edges = edges.count()
    if n_edges > 4 * n_docs:
        raise RuntimeError(
            f"star-edge cap violated: {n_edges} edges for {n_docs} "
            f"docs (bound is bands*docs = {4 * n_docs})")
    cc = dedup.connected_components(edges, docs.select("doc_id"))
    ref = _clusters(spark, sf_dir)
    if (cc.exceptAll(ref).count() or ref.exceptAll(cc).count()):
        raise RuntimeError(
            "star-edge clustering diverged from the exact-Jaccard-"
            "verified all-pairs clustering (sub-tau bucket collision)")
    w = Window.partitionBy("cluster_id")
    return cc.select(
        "doc_id", "cluster_id",
        F.count("*").over(w).alias("cluster_size"),
        flag(F.col("doc_id") == F.col("cluster_id")).alias("is_kept"))


@q("sample_hash_split", HASH_SPLIT_SQL)
def hash_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash bucketing: reproducible train/val/test
    assignment + per-language stratified sample flag from the SHARED
    md5 bucket — no RNG, so re-runs (and both engines) agree row-for-
    row; at scale this is a pure map with no shuffle and no state."""
    from .functions.indicators import flag

    docs = _t(spark, sf_dir, "documents")
    bucket = (dedup.hex_id(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string"))) % 100)
    return docs.select(
        "doc_id", "lang", bucket.alias("bucket"),
        F.when(bucket < 80, "train").when(bucket < 90, "val")
        .otherwise("test").alias("split"),
        flag(((F.col("lang") == "en") & (bucket % 2 == 0))
             | (F.col("lang") != "en")).alias("in_sample"))


#: GPT-2-style pre-tokenizer pattern (simplified to the classes the
#: corpus can contain): a token is an optionally-space-prefixed letter
#: run, digit run, or punctuation run. Same pattern string compiles
#: identically under Java regex (Spark) and RE2 (DuckDB).
BPE_PATTERN = " ?[a-z]+| ?[0-9]+| ?[^ a-z0-9]+"

BPE_TOKENS_SQL = f"""
SELECT doc_id, lang,
       length(text) AS n_chars,
       len(regexp_extract_all(text, '{BPE_PATTERN}')) AS n_tokens,
       CAST(length(text) AS DOUBLE)
         / len(regexp_extract_all(text, '{BPE_PATTERN}'))
         AS chars_per_token
FROM documents
""".strip()


@q("text_bpe_tokens", BPE_TOKENS_SQL)
def bpe_tokens_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: a GPT-2-style pre-tokenizer regex
    (space-prefixed letter/digit/punct runs) counted per doc — the
    cheap token-budget estimator a curation pipeline runs before the
    real tokenizer; pure map, regexp_count is codegen'd JVM-side."""
    docs = _t(spark, sf_dir, "documents")
    n_tok = F.regexp_count(F.col("text"), F.lit(BPE_PATTERN)).cast("long")
    n_chars = F.length("text").cast("long")
    return docs.select(
        "doc_id", "lang", n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        (n_chars.cast("double") / n_tok).alias("chars_per_token"))


ROLLING_HASH_SQL = f"""
SELECT doc_id,
       len(str_split(text, ' ')) AS n_words,
       CAST(list_reduce(list_transform(
              str_split(text, ' '),
              x -> CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)
                   % {FINGERPRINT_P}),
            (acc, x) -> (acc * 1000003 + x) % {FINGERPRINT_P})
            AS BIGINT) AS rolling_hash
FROM documents
""".strip()

TFIDF_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM documents
),
tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1),
nd AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, word, tf, df,
         ROUND(CAST(tf AS DOUBLE)
           * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS tfidf
  FROM tf JOIN df USING (word) CROSS JOIN nd
)
SELECT doc_id, term_rank, word, tf, df, tfidf
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, word) AS term_rank
      FROM scored)
WHERE term_rank <= 3
""".strip()


@q("text_rolling_hash", ROLLING_HASH_SQL)
def rolling_hash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-DEPENDENT Rabin-Karp rolling hash per doc (same words,
    different order => different hash) — strict left fold, map-only."""
    return textops.rolling_hash(_t(spark, sf_dir, "documents"))


REPETITION_SQL = """
WITH t AS (
  SELECT doc_id, str_split(text, ' ') AS w,
         len(str_split(text, ' ')) AS nw
  FROM documents
),
g AS (
  SELECT doc_id, nw,
         CASE WHEN nw >= 3 THEN
           list_transform(generate_series(1, nw - 2),
                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
         ELSE [] END AS grams
  FROM t
)
SELECT doc_id,
       CAST(nw AS BIGINT) AS n_words,
       CAST(len(grams) AS BIGINT) AS n_ngrams,
       CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct_ngrams,
       CASE WHEN len(grams) > 0 THEN
         CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
         / len(grams)
       END AS rep_ratio
FROM g
""".strip()


@q("text_repetition_ratio", REPETITION_SQL)
def repetition_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style duplicate-3-gram fraction per document — the
    intra-doc repetition quality gate. Pure higher-order-function
    scan+map, zero shuffles."""
    return textops.repetition_ratio(_t(spark, sf_dir, "documents"), n=3)


BOILERPLATE_SQL = """
WITH t AS (
  SELECT doc_id, str_split(text, ' ') AS w,
         len(str_split(text, ' ')) // 2 AS nc
  FROM documents
),
seg AS (
  SELECT doc_id,
         unnest(CASE WHEN nc >= 1 THEN
           list_transform(generate_series(0, nc - 1),
             c -> array_to_string(list_slice(w, c*2 + 1, c*2 + 2), ' '))
         ELSE [] END) AS segment
  FROM t
),
seg_h AS (
  SELECT doc_id,
         CAST('0x' || substring(md5(segment), 1, 15) AS BIGINT) AS seg_id
  FROM seg
),
df AS (
  SELECT seg_id, COUNT(*) AS seg_df
  FROM (SELECT DISTINCT seg_id, doc_id FROM seg_h) GROUP BY 1
),
nd AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(CASE WHEN CAST(seg_df AS DOUBLE) >= 0.04 * n_docs
                     THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boilerplate_segments,
       CAST(SUM(CASE WHEN CAST(seg_df AS DOUBLE) >= 0.04 * n_docs
                     THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         AS boilerplate_ratio
FROM seg_h JOIN df USING (seg_id) CROSS JOIN nd
GROUP BY doc_id, n_docs
""".strip()


@q("text_boilerplate_segments", BOILERPLATE_SQL)
def boilerplate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/C4-style corpus-frequent segment detection: aligned
    2-word segments whose document frequency reaches 4% of the corpus
    are boilerplate; doc-grain ratio output. Relative threshold keeps
    behavior identical across scale factors."""
    return textops.boilerplate_segments(
        _t(spark, sf_dir, "documents"), chunk_words=2, df_frac=0.04)


@q("text_tfidf_top_terms", TFIDF_SQL)
def tfidf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per doc: explode -> (doc,word) grain ->
    vocabulary-grain df join -> per-doc ranking window; N docs rides
    in as a broadcast 1-row aggregate, not a driver collect."""
    return textops.tfidf_top_terms(_t(spark, sf_dir, "documents"), k=3)


CENTROIDS_SQL = """
WITH ex AS (
  SELECT label,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) AS pos,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
              AS BIGINT) AS vm
  FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label, pos, COUNT(*) AS n,
       CAST(CAST(SUM(vm) AS BIGINT) AS DOUBLE)
         / CAST(COUNT(*) * 1000000 AS DOUBLE) AS centroid
FROM ex
GROUP BY label, pos
""".strip()


@q("embedding_centroids", CENTROIDS_SQL)
def centroids_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids (IVF training step): map-side
    posexplode + one keyed aggregate; components floored to integer
    micros so the cross-row sum is association-order-free."""
    return similarity.label_centroids(_t(spark, sf_dir, "embeddings"))


@q("ann_cosine_topk", _ann_sql(n_queries=8, k=5, ivf=False))
def ann_brute_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for 8 query vectors — the exactness
    baseline for ANN."""
    return similarity.cosine_topk(
        _t(spark, sf_dir, "embeddings"), n_queries=8, k=5)


@q("ann_ivf_topk", _ann_sql(n_queries=8, k=5, ivf=True))
def ann_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-partitioned ANN: equi-join on the cell id instead of a
    crossJoin — the scale path."""
    return similarity.ivf_topk(
        _t(spark, sf_dir, "embeddings"), n_queries=8, k=5)


#: byte stats over the UTF-8 payload, recomputed per char in DuckDB
#: (the corpus is pure ASCII — octet_length == length on every doc —
#: so ascii(substr(..)) IS the payload byte). Every float is a single
#: correctly-rounded op on exact integer moments, matching the
#: mapInPandas side bit-for-bit.
MM_FEATURES_SQL = """
WITH pos AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
         unnest(range(1, length(text) + 1)) AS i
  FROM documents
), b AS (
  SELECT doc_id,
         CAST(ascii(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT) AS v
  FROM pos
), m AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS BIGINT) AS s, CAST(SUM(v * v) AS BIGINT) AS ssq,
         MIN(v) AS mn, MAX(v) AS mx
  FROM b GROUP BY doc_id
)
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS modality,
       n AS n_bytes,
       CAST(s AS DOUBLE) / n AS byte_mean,
       SQRT(CAST(n * ssq - s * s AS DOUBLE)) / n AS byte_std,
       CAST(mn AS INTEGER) AS byte_min,
       CAST(mx AS INTEGER) AS byte_max
FROM m
""".strip()


@q("mm_payload_features", MM_FEATURES_SQL)
def mm_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary payload column + typed metadata ->
    Arrow-batched mapInPandas feature extraction (byte stats from
    exact integer moments). Value-checked against a per-byte DuckDB
    oracle; the fixed-grid array surface is oracled separately
    (mm_payload_grid)."""
    payloads = multimodal.payload_table(_t(spark, sf_dir, "documents"))
    return multimodal.extract_features(payloads).select(
        "doc_id", "modality", "n_bytes", "byte_mean", "byte_std",
        "byte_min", "byte_max")


MM_GRID_SQL = """
WITH pos AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
         unnest(range(1, length(text) + 1)) AS i
  FROM documents
), b AS (
  SELECT doc_id,
         CAST(ascii(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT) AS v,
         CAST(i - 1 AS BIGINT) AS j,
         CAST(length(text) AS BIGINT) AS n
  FROM pos
)
SELECT doc_id, CAST((j * 16) // n AS INTEGER) AS cell,
       CAST(CAST(SUM(v) AS BIGINT) AS DOUBLE) / COUNT(*) AS cell_mean
FROM b
GROUP BY doc_id, (j * 16) // n
""".strip()


@q("mm_payload_grid", MM_GRID_SQL)
def mm_grid_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resize-to-fixed-grid surface of the featurizer: per-doc
    16-cell segment means (cell(j) = j*G//n integer bucketing),
    exploded to (doc_id, cell, cell_mean) rows so the driver's
    order-insensitive hash covers the array values. Every doc is
    >= GRID_CELLS bytes in this corpus, so all cells are nonempty."""
    payloads = multimodal.payload_table(_t(spark, sf_dir, "documents"))
    feats = multimodal.extract_features(payloads)
    return feats.select(
        "doc_id",
        F.posexplode("grid_means").alias("cell", "cell_mean"))


@q("dedup_embedding_cosine", EMB_NEAR_DUP_SQL)
def emb_near_dup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (>= 0.3), IVF-cell bucketed."""
    return similarity.embedding_near_dup(
        _t(spark, sf_dir, "embeddings"), tau=0.3)


EMB_STAR_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding, label AS cell,
         {_NORM.format(v='embedding')} AS norm
  FROM embeddings
),
r AS (SELECT cell, MIN(vec_id) AS rep FROM e GROUP BY cell)
SELECT e.cell, r.rep AS vec_a, e.vec_id AS vec_b,
       CASE WHEN re.norm > 0 AND e.norm > 0 THEN
         {_DOT.format(a='re.embedding', b='e.embedding')}
           / (re.norm * e.norm)
       END AS cosine
FROM e
JOIN r ON e.cell = r.cell AND e.vec_id != r.rep
JOIN e re ON re.cell = r.cell AND re.vec_id = r.rep
WHERE (CASE WHEN re.norm > 0 AND e.norm > 0 THEN
         {_DOT.format(a='re.embedding', b='e.embedding')}
           / (re.norm * e.norm)
       END) >= 0.3
""".strip()


@q("dedup_embedding_edges_capped", EMB_STAR_SQL)
def emb_star_edges_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pair-explosion cap on the EMBEDDING family (VERDICT r8 #4;
    BENCH_SF1.md measured this family's pair output growing x162 at
    10x rows): per IVF cell, one verified edge per member against the
    cell's min-id representative — O(vectors) edges and O(vectors)
    cosines BY CONSTRUCTION, where the all-pairs relation
    (`dedup_embedding_cosine`, kept as the labeled exactness
    baseline) is quadratic in cell size.  The entry RAISES unless the
    edge count honors the cap.  Cells are disjoint, so rep-groups ARE
    the clusters — survivor selection consumes this relation with no
    connected-components pass."""
    emb = _t(spark, sf_dir, "embeddings")
    edges = similarity.embedding_star_edges(emb, tau=0.3)
    n_vec = emb.count()
    n_edges = edges.count()
    if n_edges > n_vec:
        raise RuntimeError(
            f"star-edge cap violated: {n_edges} edges for {n_vec} "
            "vectors (bound is one edge per non-representative member)")
    return edges


# -------------------------------------------------------------- round 4
# corpus-assembly / curation operators (llm/curation.py)

PACK_CTX = 256
PACK_SHARDS = 8

PACK_SQL = f"""
WITH t AS (
  SELECT doc_id, doc_id % {PACK_SHARDS} AS shard_id,
         CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, shard_id, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY shard_id ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM t
)
SELECT doc_id, CAST(shard_id AS BIGINT) AS shard_id, n_tokens,
       CAST(cum_tokens AS BIGINT) AS cum_tokens,
       CAST((cum_tokens - n_tokens) // {PACK_CTX} AS BIGINT) AS start_pack,
       CAST((cum_tokens - n_tokens) % {PACK_CTX} AS BIGINT) AS start_offset,
       CAST((cum_tokens - 1) // {PACK_CTX} AS BIGINT) AS end_pack
FROM c
""".strip()


@q("docs_pack_sequences", PACK_SQL)
def pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing into fixed context windows,
    per-shard so the running sum never serializes on one partition."""
    return curation.pack_sequences(
        _t(spark, sf_dir, "documents"),
        ctx_len=PACK_CTX, n_shards=PACK_SHARDS)


CHUNK_W, CHUNK_S = 64, 48

CHUNK_SQL = f"""
WITH t AS (
  SELECT doc_id, str_split(text, ' ') AS ts FROM documents
), nz AS (
  SELECT * FROM t WHERE len(ts) > 0
)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       array_to_string(ts[i * {CHUNK_S} + 1 : i * {CHUNK_S} + {CHUNK_W}],
                       ' ') AS chunk_text,
       CAST(len(ts[i * {CHUNK_S} + 1 : i * {CHUNK_S} + {CHUNK_W}])
            AS BIGINT) AS n_tokens
FROM nz, LATERAL (
  SELECT unnest(generate_series(0, greatest(0,
      CAST(ceil((len(ts) - {CHUNK_W}) / {float(CHUNK_S)}) AS INT)))) AS i
) g
""".strip()


@q("docs_chunk_overlap", CHUNK_SQL)
def chunk_documents_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking with stride (RAG indexing / long-doc
    SFT shape): fixed token windows, 25% overlap, every token covered,
    no fully-redundant trailing chunk.  Pure map-side — sequence +
    transform + posexplode over the token array, no shuffle, no UDF;
    a skewed 10 GB document becomes many bounded-width rows instead of
    one unsplittable record."""
    return curation.chunk_documents(
        _t(spark, sf_dir, "documents"), window=CHUNK_W, stride=CHUNK_S)


CONTAM_N = 8
CONTAM_MOD = 10

CONTAM_SQL = f"""
WITH t AS (
  SELECT doc_id, str_split(text, ' ') AS w,
         len(str_split(text, ' ')) AS nw
  FROM documents
),
g AS (
  SELECT doc_id, doc_id % {CONTAM_MOD} = 0 AS is_bench,
         unnest(list_distinct(CASE WHEN nw >= {CONTAM_N} THEN
           list_transform(generate_series(1, nw - {CONTAM_N - 1}),
                          i -> array_to_string(w[i:i+{CONTAM_N - 1}], ' '))
         ELSE [] END)) AS gram
  FROM t
),
bench AS (SELECT DISTINCT gram FROM g WHERE is_bench),
train AS (SELECT doc_id, gram FROM g WHERE NOT is_bench),
tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_ngrams
        FROM train GROUP BY 1),
hit AS (SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated
        FROM train t JOIN bench b USING (gram) GROUP BY 1)
SELECT tot.doc_id, tot.n_ngrams,
       COALESCE(hit.n_contaminated, 0) AS n_contaminated,
       CAST(COALESCE(hit.n_contaminated, 0) AS DOUBLE) / tot.n_ngrams
         AS contamination_ratio
FROM tot LEFT JOIN hit ON tot.doc_id = hit.doc_id
""".strip()


@q("benchmark_contamination", CONTAM_SQL)
def contamination_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-leak scan: distinct 8-gram overlap of the training split
    against the benchmark split (doc_id % 10 == 0), inverted-index
    equi-join — never doc x doc."""
    return curation.benchmark_contamination(
        _t(spark, sf_dir, "documents"), n=CONTAM_N, bench_mod=CONTAM_MOD)


STRATIFIED_SQL = """
WITH sizes AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
k AS (SELECT MIN(n) AS k FROM sizes),
r AS (
  SELECT doc_id, lang,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
           AS pick_rank
  FROM documents
)
SELECT doc_id, lang, pick_rank
FROM r CROSS JOIN k
WHERE pick_rank <= k
""".strip()


@q("stratified_balance_lang", STRATIFIED_SQL)
def stratified_balance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-balanced deterministic downsample: keep min(stratum
    sizes) docs per lang, chosen by md5 order (engine-portable
    seedless shuffle)."""
    return curation.stratified_balance(
        _t(spark, sf_dir, "documents"), stratum="lang")


# -------------------------------------------------------------- round 6
# quality-filtering curation operators (llm/curation.py)

LENGTH_BAND_SQL = """
WITH b AS (
  SELECT lang, quantile_cont(n_chars, 0.1) AS lo_chars,
         quantile_cont(n_chars, 0.9) AS hi_chars
  FROM documents GROUP BY 1
)
SELECT doc_id, d.lang, n_chars, lo_chars, hi_chars
FROM documents d JOIN b USING (lang)
WHERE n_chars BETWEEN lo_chars AND hi_chars
""".strip()


@q("docs_length_band_filter", LENGTH_BAND_SQL)
def length_band_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language [p10, p90] length-band filter: the curation step
    that drops stubs and runaway concatenations per stratum; bounds
    are one lang-grain aggregate broadcast back onto a single fact
    scan."""
    return curation.length_band_filter(
        _t(spark, sf_dir, "documents"), lo=0.1, hi=0.9)


UNIGRAM_LOGPROB_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents
),
t2 AS (SELECT doc_id, tok FROM toks WHERE tok != ''),
freq AS (SELECT tok, COUNT(*) AS cnt FROM t2 GROUP BY 1),
tot AS (SELECT COUNT(*) AS n_total FROM t2),
scored AS (
  SELECT doc_id,
         CAST(ROUND(LN(CAST(cnt AS DOUBLE) / n_total), 9)
              AS DECIMAL(18,9)) AS logp
  FROM t2 JOIN freq USING (tok) CROSS JOIN tot
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(logp) AS DOUBLE) / COUNT(*), 6) AS avg_logprob
FROM scored GROUP BY doc_id
""".strip()


@q("docs_unigram_logprob", UNIGRAM_LOGPROB_SQL)
def unigram_logprob_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM average log-prob per doc (the CCNet-style perplexity
    proxy for quality filtering): vocabulary-grain frequency agg +
    token-keyed inverted-index join; per-token log-probs rounded once
    and summed as exact decimals."""
    return curation.unigram_logprob(_t(spark, sf_dir, "documents"))


SOURCE_QUALITY_SQL = """
WITH per_doc AS (
  SELECT doc_id, source,
         CAST(ROUND(CAST(len(list_distinct(str_split(text, ' ')))
                         AS DOUBLE)
                    / len(str_split(text, ' ')), 9)
              AS DECIMAL(18,9)) AS ttr
  FROM documents
),
per_source AS (
  SELECT source, CAST(SUM(ttr) AS DOUBLE) / COUNT(*) AS source_mean_ttr
  FROM per_doc GROUP BY 1
),
cut AS (SELECT quantile_cont(source_mean_ttr, 0.5) AS cutoff
        FROM per_source)
SELECT d.doc_id, d.source, ROUND(s.source_mean_ttr, 6) AS source_mean_ttr
FROM documents d JOIN per_source s USING (source) CROSS JOIN cut
WHERE s.source_mean_ttr >= cutoff
""".strip()


@q("docs_source_quality_filter", SOURCE_QUALITY_SQL)
def source_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-source (domain-grain) quality filter: drop every doc of
    the sources whose mean type-token ratio falls below the corpus
    median — removal decided at source grain, map-side TTR, tiny
    broadcast aggregates."""
    return curation.source_quality_filter(
        _t(spark, sf_dir, "documents"), quantile=0.5)


# -------------------------------------------------------------- round 7
# REAL codec decode paths (stdlib-only: binary PPM parse, RIFF/wave
# PCM) — the non-fake branch of the multimodal featurizer, per-byte /
# per-sample oracled (VERDICT r6 "What's missing" #3)

MM_DECODE_PPM_SQL = """
WITH dims AS (
  -- non-ASCII chars -> '?' on BOTH engines: the Spark builder cycles
  -- BYTES while substr/ascii walk CHARACTERS, identical only when
  -- every char is one byte
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         regexp_replace(text, '[^\\x00-\\x7f]', '?', 'g') AS text,
         CAST(doc_id % 8 + 4 AS BIGINT) AS w,
         CAST(doc_id % 6 + 4 AS BIGINT) AS h
  FROM documents
), pos AS (
  SELECT doc_id, text, w, h, unnest(range(0, w * h * 3)) AS j
  FROM dims
), b AS (
  SELECT doc_id, w, h,
         CAST(ascii(substr(text,
                    CAST(j % length(text) AS INTEGER) + 1, 1))
              AS BIGINT) AS v
  FROM pos
), m AS (
  SELECT doc_id, ANY_VALUE(w) AS w, ANY_VALUE(h) AS h,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS BIGINT) AS s, CAST(SUM(v * v) AS BIGINT) AS ssq,
         MIN(v) AS mn, MAX(v) AS mx
  FROM b GROUP BY doc_id
)
SELECT doc_id, 'image' AS modality,
       CAST(w AS INTEGER) AS meta_width, CAST(h AS INTEGER) AS meta_height,
       n AS n_bytes,
       CAST(s AS DOUBLE) / n AS byte_mean,
       SQRT(CAST(n * ssq - s * s AS DOUBLE)) / n AS byte_std,
       CAST(mn AS INTEGER) AS byte_min,
       CAST(mx AS INTEGER) AS byte_max
FROM m
""".strip()


@q("mm_decode_ppm", MM_DECODE_PPM_SQL)
def mm_decode_ppm_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: JVM-built binary PPM payloads
    (header + exactly w*h*3 pixel bytes) -> stdlib P6 parser inside the
    Arrow-batched featurizer -> byte stats. The oracle enumerates the
    pixel stream v(j) = text[j % len] per doc, so a header off-by-one
    (consuming one pixel byte too many/few) shifts every stat and
    hash-fails — this pins that the parser consumed EXACTLY the
    header."""
    docs = _t(spark, sf_dir, "documents")
    payloads = multimodal.ppm_payload_table(docs)
    feats = multimodal.extract_features(payloads, codec="ppm")
    return (feats.join(payloads.select("doc_id", "meta_width",
                                       "meta_height"), "doc_id")
            .select("doc_id", "modality", "meta_width", "meta_height",
                    "n_bytes", "byte_mean", "byte_std",
                    "byte_min", "byte_max"))


MM_DECODE_WAV_SQL = """
WITH base AS (
  -- same ASCII sanitization as the WAV builder (bytes == chars)
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         regexp_replace(text, '[^\\x00-\\x7f]', '?', 'g') AS text,
         CAST(doc_id % 64 + 32 AS BIGINT) AS ns
  FROM documents
), pos AS (
  SELECT doc_id, text, ns, unnest(range(0, ns)) AS j
  FROM base
), pair AS (
  SELECT doc_id,
         CAST(ascii(substr(text,
                    CAST((2 * j) % length(text) AS INTEGER) + 1, 1))
              AS BIGINT)
         + 256 * CAST(ascii(substr(text,
                      CAST((2 * j + 1) % length(text) AS INTEGER) + 1, 1))
                 AS BIGINT) AS u
  FROM pos
), s AS (
  SELECT doc_id, u - CASE WHEN u >= 32768 THEN 65536 ELSE 0 END AS v
  FROM pair
), m AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS BIGINT) AS sv, CAST(SUM(v * v) AS BIGINT) AS ssq,
         MIN(v) AS mn, MAX(v) AS mx
  FROM s GROUP BY doc_id
)
SELECT doc_id, 'audio' AS modality, n AS n_samples,
       CAST(sv AS DOUBLE) / n AS sample_mean,
       SQRT(CAST(n * ssq - sv * sv AS DOUBLE)) / n AS sample_std,
       CAST(mn AS INTEGER) AS sample_min,
       CAST(mx AS INTEGER) AS sample_max
FROM m
""".strip()


MM_DECODE_PNG_SQL = """
WITH dims AS (
  -- same ASCII sanitization as the PNG builder (bytes == chars)
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         regexp_replace(text, '[^\\x00-\\x7f]', '?', 'g') AS text,
         CAST(doc_id % 8 + 4 AS BIGINT) AS w,
         CAST(doc_id % 6 + 4 AS BIGINT) AS h
  FROM documents
), pos AS (
  SELECT doc_id, text, w, h, unnest(range(0, w * h)) AS j
  FROM dims
), b AS (
  SELECT doc_id, w, h,
         CAST(ascii(substr(text,
                    CAST(j % length(text) AS INTEGER) + 1, 1))
              AS BIGINT) AS v
  FROM pos
), m AS (
  SELECT doc_id, ANY_VALUE(w) AS w, ANY_VALUE(h) AS h,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS BIGINT) AS s, CAST(SUM(v * v) AS BIGINT) AS ssq,
         MIN(v) AS mn, MAX(v) AS mx
  FROM b GROUP BY doc_id
)
SELECT doc_id, 'image' AS modality,
       CAST(w AS INTEGER) AS meta_width, CAST(h AS INTEGER) AS meta_height,
       n AS n_pixels,
       CAST(s AS DOUBLE) / n AS pixel_mean,
       SQRT(CAST(n * ssq - s * s AS DOUBLE)) / n AS pixel_std,
       CAST(mn AS INTEGER) AS pixel_min,
       CAST(mx AS INTEGER) AS pixel_max
FROM m
""".strip()


@q("mm_decode_png", MM_DECODE_PNG_SQL)
def mm_decode_png_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-image decode end-to-end (the codec path PPM
    can't exercise: the pixel bytes pass through scanline filtering —
    every row a different filter type, None/Sub/Up/Average/Paeth — a
    zlib deflate stream, and CRC-framed chunks): stdlib-built
    grayscale PNGs -> stdlib zlib/struct parser inside the
    Arrow-batched featurizer -> pixel stats.  The oracle enumerates
    the source pixel stream v(j) = text[j % len] per doc, so ANY
    defect in chunk walking, inflate, or filter reversal perturbs
    some pixel and hash-fails."""
    docs = _t(spark, sf_dir, "documents")
    payloads = multimodal.png_payload_table(docs)
    feats = multimodal.extract_features(payloads, codec="png")
    return (feats.join(payloads.select("doc_id", "meta_width",
                                       "meta_height"), "doc_id")
            .select("doc_id", "modality", "meta_width", "meta_height",
                    F.col("n_bytes").alias("n_pixels"),
                    F.col("byte_mean").alias("pixel_mean"),
                    F.col("byte_std").alias("pixel_std"),
                    F.col("byte_min").alias("pixel_min"),
                    F.col("byte_max").alias("pixel_max")))


MM_DECODE_JPEG_SQL = """
SELECT CAST(doc_id AS BIGINT) AS doc_id, 'image' AS modality,
       CAST((doc_id % 3 + 2) * 8 AS INTEGER) AS meta_width,
       CAST((doc_id % 2 + 2) * 8 AS INTEGER) AS meta_height,
       CAST((doc_id % 3 + 2) * 8 * (doc_id % 2 + 2) * 8 AS BIGINT)
         AS n_pixels,
       CAST(1 AS INTEGER) AS within_tolerance
FROM documents
""".strip()


@q("mm_decode_jpeg", MM_DECODE_JPEG_SQL)
def mm_decode_jpeg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL entropy-coded image decode end-to-end (VERDICT r8 #8 —
    the codec class the PNG path's zlib doesn't exercise): baseline
    JFIF grayscale JPEGs built in-task (DCT, quantization, zigzag,
    canonical-Huffman DC/AC coding, byte stuffing) -> the stdlib/
    numpy baseline decoder (marker walk, DHT-built Huffman tables,
    destuffed bit reader, DC prediction, dequant, IDCT).  JPEG is
    LOSSY, so unlike PPM/PNG/WAV there is no exact per-pixel oracle;
    instead the roundtrip error is measured per doc against the known
    source stream v(j) = text[j % len] and the entry RAISES unless
    EVERY doc's max |decoded - source| stays within the IDCT rounding
    tolerance (JPEG_TOL=4; a Huffman desync, dequant or DC-drift
    defect moves pixels by tens to hundreds, and a structural defect
    changes n_pixels or crashes).  The oracle pins the exactly-
    predictable facts: per-doc dims, decoded pixel count, and the
    tolerance verdict."""
    docs = _t(spark, sf_dir, "documents")
    report = multimodal.jpeg_roundtrip_report(docs)
    worst = report.agg(F.max("max_abs_err")).first()[0]
    if worst is None or worst > multimodal.JPEG_TOL:
        raise RuntimeError(
            f"JPEG roundtrip error {worst} exceeds tolerance "
            f"{multimodal.JPEG_TOL} — decoder defect")
    return report.select(
        "doc_id", "modality", "meta_width", "meta_height", "n_pixels",
        (F.col("max_abs_err") <= F.lit(multimodal.JPEG_TOL))
        .cast("int").alias("within_tolerance"))


MM_DECODE_JPEG_COLOR_SQL = """
SELECT CAST(doc_id AS BIGINT) AS doc_id, 'image' AS modality,
       CAST((doc_id % 2 + 1) * 16 AS INTEGER) AS meta_width,
       CAST((doc_id % 3 + 1) * 16 AS INTEGER) AS meta_height,
       CAST((doc_id % 2 + 1) * 16 * (doc_id % 3 + 1) * 16 * 3
            AS BIGINT) AS n_pixels,
       CAST(1 AS INTEGER) AS within_tolerance
FROM documents
""".strip()


@q("mm_decode_jpeg_color", MM_DECODE_JPEG_COLOR_SQL)
def mm_decode_jpeg_color_q(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """REAL COLOR JPEG decode end-to-end (ITU T.81 baseline + T.871
    YCbCr, 4:2:0 chroma subsampling) — everything the grayscale entry
    cannot exercise: the interleaved MCU scan (four Y blocks + Cb +
    Cr per 16x16), per-component DC predictors, multi-table DQT/DHT
    parsing with per-component selectors, chroma upsampling and color
    conversion.  The fixture is chroma-smooth (one Cb/Cr per 2x2,
    clip-free ranges), so 4:2:0 loses nothing by construction and the
    in-entry RAISE gates on pure codec error (JPEG_COLOR_TOL=8;
    an interleave/upsample defect shears whole blocks — error in the
    hundreds).  The oracle pins the exactly-predictable facts: dims,
    RGB sample count (w*h*3), tolerance verdict."""
    docs = _t(spark, sf_dir, "documents")
    report = multimodal.jpeg_color_roundtrip_report(docs)
    worst = report.agg(F.max("max_abs_err")).first()[0]
    if worst is None or worst > multimodal.JPEG_COLOR_TOL:
        raise RuntimeError(
            f"color JPEG roundtrip error {worst} exceeds tolerance "
            f"{multimodal.JPEG_COLOR_TOL} — decoder defect")
    return report.select(
        "doc_id", "modality", "meta_width", "meta_height", "n_pixels",
        (F.col("max_abs_err") <= F.lit(multimodal.JPEG_COLOR_TOL))
        .cast("int").alias("within_tolerance"))


@q("mm_decode_wav", MM_DECODE_WAV_SQL)
def mm_decode_wav_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end: stdlib wave-writer payloads
    (RIFF header + little-endian int16 PCM from cycled text-byte
    pairs) -> stdlib wave parser -> SAMPLE stats (not container
    bytes — byte-level stats would count the 44-byte header). The
    oracle reconstructs each int16 sample from its two source bytes
    including the sign fold, pinning endianness and the header skip."""
    docs = _t(spark, sf_dir, "documents")
    payloads = multimodal.wav_payload_table(docs)
    feats = multimodal.extract_features(payloads, codec="wav")
    return feats.select(
        "doc_id", "modality",
        F.col("n_bytes").alias("n_samples"),
        F.col("byte_mean").alias("sample_mean"),
        F.col("byte_std").alias("sample_std"),
        F.col("byte_min").alias("sample_min"),
        F.col("byte_max").alias("sample_max"))


BOILERPLATE_SCRUB_SQL = """
WITH t AS (
  SELECT doc_id, str_split(text, ' ') AS w,
         len(str_split(text, ' ')) // 2 AS nc
  FROM documents
),
seg AS (
  SELECT doc_id, u.pos AS pos, u.segment AS segment FROM (
    SELECT doc_id,
           unnest(CASE WHEN nc >= 1 THEN
             list_transform(generate_series(0, nc - 1),
               c -> {'pos': c,
                     'segment': array_to_string(
                         list_slice(w, c*2 + 1, c*2 + 2), ' ')})
           ELSE [] END) AS u
    FROM t)
),
seg_h AS (
  SELECT doc_id, pos, segment,
         CAST('0x' || substring(md5(segment), 1, 15) AS BIGINT)
           AS seg_id
  FROM seg
),
df AS (
  SELECT seg_id, COUNT(*) AS seg_df
  FROM (SELECT DISTINCT seg_id, doc_id FROM seg_h) GROUP BY 1
),
nd AS (SELECT COUNT(*) AS n_docs FROM documents),
flagged AS (
  SELECT doc_id, pos, segment,
         CAST(seg_df AS DOUBLE) >= 0.04 * n_docs AS is_bp
  FROM seg_h JOIN df USING (seg_id) CROSS JOIN nd
),
agg AS (
  SELECT doc_id,
         SUM(CASE WHEN is_bp THEN 1 ELSE 0 END) AS n_bp,
         array_to_string(list(segment ORDER BY pos)
                         FILTER (WHERE NOT is_bp), ' ') AS clean_text,
         COUNT(*) FILTER (WHERE NOT is_bp) AS n_kept
  FROM flagged GROUP BY doc_id
)
SELECT doc_id, md5(clean_text) AS clean_md5,
       CAST(n_kept * 2 AS BIGINT) AS clean_words,
       CAST(n_kept AS BIGINT) AS n_kept_segments,
       CAST(n_bp AS BIGINT) AS n_removed
FROM agg WHERE n_kept > 0
""".strip()


@q("text_boilerplate_scrub", BOILERPLATE_SCRUB_SQL)
def boilerplate_scrub_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/C4-style boilerplate REMOVAL with reassembly (the apply
    step after text_boilerplate_segments' detect step): corpus-
    frequent 2-word segments are dropped and the survivors stitched
    back in original order — the md5 of the cleaned text is the
    oracle's equality witness that ordering survived the shuffle.
    Fully-scrubbed and too-short docs drop out (nothing left to
    train on).  posexplode -> vocabulary-grain df shuffle ->
    doc-grain array_sort reassembly; no window, no driver state."""
    return textops.boilerplate_scrub(
        _t(spark, sf_dir, "documents"), chunk_words=2, df_frac=0.04)


KMEANS_SQL = """
WITH e AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))
           AS vm
  FROM embeddings
),
init AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER)
           AS cid, vm AS c
  FROM (SELECT * FROM e ORDER BY vec_id LIMIT 8)
),
d1 AS (
  SELECT e.vec_id, init.cid,
         list_sum(list_transform(generate_series(1, 64),
           i -> (e.vm[i] - init.c[i]) * (e.vm[i] - init.c[i])))
           AS dist
  FROM e CROSS JOIN init
),
a1 AS (
  SELECT vec_id, cid AS cluster FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, cid) AS rn
    FROM d1) WHERE rn = 1
),
ex AS (
  SELECT a1.cluster,
         CAST(generate_subscripts(e.vm, 1) AS BIGINT) AS pos,
         unnest(e.vm) AS v
  FROM e JOIN a1 USING (vec_id)
),
upd AS (
  SELECT cluster, pos,
         CAST((SUM(v) - ((SUM(v) % COUNT(*) + COUNT(*)) % COUNT(*)))
              // COUNT(*) AS BIGINT) AS c
  FROM ex GROUP BY cluster, pos
),
c2 AS (
  SELECT init.cid, COALESCE(u.c, init.c) AS c
  FROM init LEFT JOIN (
    SELECT cluster AS cid, list(c ORDER BY pos) AS c
    FROM upd GROUP BY cluster) u USING (cid)
),
d2 AS (
  SELECT e.vec_id, c2.cid,
         list_sum(list_transform(generate_series(1, 64),
           i -> (e.vm[i] - c2.c[i]) * (e.vm[i] - c2.c[i]))) AS dist
  FROM e CROSS JOIN c2
),
a2 AS (
  SELECT vec_id, cid AS cluster FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, cid) AS rn
    FROM d2) WHERE rn = 1
)
SELECT CAST(cluster AS INTEGER) AS cluster,
       COUNT(*) AS n_vectors,
       CAST(SUM(e.vm[1]) AS BIGINT) AS sum_dim0
FROM e JOIN a2 USING (vec_id)
GROUP BY cluster
""".strip()


@q("embedding_kmeans_clusters", KMEANS_SQL)
def embedding_kmeans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC CLUSTERING: deterministic quantized k-means (Lloyd's,
    k=8, two assignment passes) over the embedding column — the
    bucketing step a curation pipeline runs before per-cluster dedup
    or balanced sampling.  Coordinates quantize to exact BIGINTs
    (floor(x*1e6)), distances and centroid means stay in integer
    arithmetic with deterministic tie-breaks, so the DuckDB oracle
    REPLAYS the full iteration bit-for-bit — an iterative ML
    algorithm under the same exact-hash gate as every SQL entry.
    Scale shape: assignment broadcasts a k x d integer matrix into a
    map-side expression (no cross join on the Spark side, no shuffle);
    the update aggregates to (cluster, dim) grain — k*d rows."""
    from .llm import clustering

    emb = _t(spark, sf_dir, "embeddings")
    out = clustering.kmeans_quantized(emb, "embedding", "vec_id",
                                      k=8, iters=2)
    vm0 = clustering.quantize(F.col("embedding"))[0]
    return (out.select("cluster", vm0.alias("vm0"))
            .groupBy("cluster")
            .agg(F.count("*").alias("n_vectors"),
                 F.sum("vm0").alias("sum_dim0")))
