"""Text-analysis operators over document tables.

quality/stats/token-count/fingerprint/language-ID, all Catalyst-native
column expressions (no Python UDFs — each is a scan + map, trivially
100 TB-parallel with zero shuffles except where grouped).

Determinism contract for the DuckDB oracles: ratios are single IEEE
divisions of exact integers; the fingerprint is an order-independent
integer sum mod p; every expression is structured identically on both
engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _spill, hex_id, words_col

#: tiny function-word list — the synthetic corpus' only English
#: function words. Real pipelines plug in per-language lists.
STOPWORDS = ("a", "the")

FINGERPRINT_P = 1_000_000_007


def _is_stop(w: Column) -> Column:
    cond = F.lit(False)
    for s in STOPWORDS:
        cond = cond | (w == s)
    return cond


def text_stats(docs: DataFrame) -> DataFrame:
    """Per-doc token statistics: counts, unique ratio, stopword ratio,
    average word length, vowel-group (BPE-ish subword proxy) count."""
    w = words_col()
    n_words = F.size(w)
    n_unique = F.size(F.array_distinct(w))
    n_stop = F.size(F.filter(w, _is_stop))
    n_chars = F.length(F.col("text"))
    # counts cast to long: DuckDB length()/len() are BIGINT
    return docs.select(
        "doc_id", "lang", "source",
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        n_unique.cast("long").alias("n_unique_words"),
        n_stop.cast("long").alias("n_stopwords"),
        (n_unique / n_words).alias("uniq_ratio"),
        (n_stop / n_words).alias("stop_ratio"),
        # single-space corpus: total word chars = chars - (words - 1)
        ((n_chars - (n_words - F.lit(1))) / n_words).alias("avg_word_len"),
        F.regexp_count(F.col("text"), F.lit("[aeiou]+")).cast("long")
        .alias("n_vowel_groups"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Composite quality score — the standard pre-training filter shape
    (lexical diversity + function-word plausibility + length prior).
    Weights are fixed; the expression tree matches the oracle SQL
    term-for-term so the doubles are bit-identical.
    """
    stats = text_stats(docs)
    length_prior = F.least(F.col("n_words") / F.lit(50.0), F.lit(1.0))
    score = (F.lit(0.4) * F.col("uniq_ratio")
             + F.lit(0.3) * (F.lit(1.0) - F.col("stop_ratio"))
             + F.lit(0.3) * length_prior)
    return stats.select(
        "doc_id", "lang", "n_words", "uniq_ratio", "stop_ratio",
        length_prior.alias("length_prior"),
        score.alias("quality_score"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Heuristic language-ID: function-word rate thresholding (the
    classic cheap n-gram/stopword detector). On this corpus the lang
    label is independent of the vocabulary, so the operator reports
    its prediction plus an agreement flag rather than claiming
    accuracy — the *shape* (detector + label comparison column) is
    what a curation pipeline runs at scale."""
    from ..functions.indicators import flag

    w = words_col()
    stop_rate = F.size(F.filter(w, _is_stop)) / F.size(w)
    predicted = F.when(stop_rate >= 0.02, F.lit("en")).otherwise(F.lit("und"))
    return docs.select(
        "doc_id", "lang",
        stop_rate.alias("stopword_rate"),
        predicted.alias("predicted_lang"),
        flag(predicted == F.col("lang")).alias("agrees_with_label"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Order-independent 60-bit-ish document fingerprint:
    sum of distinct-word hashes mod p (bag-of-words MinHash cousin;
    equal fingerprints => near-certain same vocabulary set).

    The sum is over <= |doc| ints < 1e9+7, far from int64 overflow, and
    order-independent — safe under any partitioning."""
    word_ids = F.transform(
        F.array_distinct(words_col()),
        lambda x: hex_id(x) % FINGERPRINT_P,
    )
    fp = F.aggregate(
        word_ids, F.lit(0).cast("long"), lambda acc, x: acc + x
    ) % FINGERPRINT_P
    return docs.select(
        "doc_id",
        F.size(F.array_distinct(words_col())).cast("long")
        .alias("n_unique_words"),
        fp.alias("fingerprint"),
    )


#: Rabin-Karp base for the order-DEPENDENT rolling hash; with values
#: < FINGERPRINT_P (~1e9) the fold term acc*B + x stays < ~1e15,
#: far inside int64 — no overflow at any doc length
ROLLING_B = 1_000_003


def rolling_hash(docs: DataFrame) -> DataFrame:
    """Order-dependent polynomial (Rabin-Karp) rolling hash over the
    word sequence: h = fold(h * B + word_id mod p). Unlike
    :func:`fingerprints` (bag-of-words, order-free), two docs with the
    same words in different ORDER fingerprint differently.

    Strict left-to-right ``F.aggregate`` fold ≡ DuckDB ``list_reduce``
    (SURVEY.md §8.6 rule 2); the first fold step reduces to word_id[0]
    on both engines, so the missing-initial-value semantics of
    list_reduce agree with aggregate's zero init."""
    word_ids = F.transform(
        words_col(), lambda x: hex_id(x) % FINGERPRINT_P)
    h = F.aggregate(
        word_ids, F.lit(0).cast("long"),
        lambda acc, x: (acc * ROLLING_B + x) % FINGERPRINT_P)
    return docs.select(
        "doc_id",
        F.size(words_col()).cast("long").alias("n_words"),
        h.alias("rolling_hash"),
    )


def repetition_ratio(docs: DataFrame, n: int = 3) -> DataFrame:
    """Gopher-style intra-document repetition filter: the fraction of
    word n-grams that are duplicates of an earlier n-gram in the SAME
    document (Rae et al. 2021 §A1.1 use duplicate 2-/3-/4-gram
    fractions as pre-training quality gates; highly repetitive docs
    are templated/spam).

    Entirely Catalyst higher-order functions over the per-row token
    array — a pure scan+map with ZERO shuffles, so it runs at
    100 TB as fast as the parquet scan itself. The ratio is one IEEE
    division of two exact integer counts — bit-identical on any
    engine.
    """
    w = words_col()
    n_words = F.size(w)
    # n-gram i = words[i..i+n-1], 1-based element_at; guarded because
    # sequence(0, negative) would produce a DESCENDING range
    grams = F.when(
        n_words >= n,
        F.transform(
            F.sequence(F.lit(1), n_words - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, i + j) for j in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        total.cast("long").alias("n_ngrams"),
        distinct.cast("long").alias("n_distinct_ngrams"),
        F.when(total > 0,
               (total - distinct).cast("double") / total)
        .alias("rep_ratio"),
    )


def boilerplate_segments(docs: DataFrame, chunk_words: int = 2,
                         df_frac: float = 0.04) -> DataFrame:
    """Corpus-frequent segment (boilerplate) detection — the CCNet /
    C4 pattern of dropping lines shared by many pages (headers,
    cookie banners), adapted to this corpus' lineless text by cutting
    each document into aligned ``chunk_words``-word segments.

    A segment type is boilerplate when its document frequency reaches
    ``df_frac`` of the corpus (relative threshold, so the operator
    behaves identically at every scale factor). Output is doc-grain:
    segment counts and the boilerplate ratio a curation filter would
    threshold on.

    Scale: segments explode map-side; ONE shuffle to segment-hash
    grain for the df count (vocabulary-bounded — far smaller than the
    corpus); n_docs is a broadcast 1-row aggregate (never a collect);
    the df table joins back on the hash. No stage is quadratic and
    nothing is driver-side.
    """
    # spread docs before the CPU-heavy explode (see boilerplate_scrub)
    sc = docs.sparkSession.sparkContext
    docs = docs.repartition(sc.defaultParallelism, "doc_id")
    w = words_col()
    n_chunks = F.floor(F.size(w) / chunk_words).cast("int")
    chunks = F.when(
        n_chunks >= 1,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda c: F.concat_ws(
                " ", F.slice(w, c * chunk_words + 1, chunk_words)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    seg = docs.select(
        "doc_id", F.explode(chunks).alias("segment"))
    # consumed by the df count AND the flag join — one explode, not
    # two (see boilerplate_scrub's scale note)
    seg = _spill(seg.withColumn("seg_id", hex_id(F.col("segment"))),
                 "bp_seg_detect_")
    # document frequency at segment-type grain (distinct doc first so
    # within-doc repeats count once)
    df_tbl = (seg.select("seg_id", "doc_id").distinct()
              .groupBy("seg_id").agg(F.count("*").alias("seg_df")))
    nd = docs.agg(F.count("*").alias("n_docs"))
    flagged = (
        seg.join(df_tbl, "seg_id")
        .join(F.broadcast(nd))
        .withColumn(
            "is_boilerplate",
            (F.col("seg_df").cast("double")
             >= F.lit(df_frac) * F.col("n_docs")).cast("int"))
    )
    return (
        flagged.groupBy("doc_id").agg(
            F.count("*").cast("long").alias("n_segments"),
            F.sum("is_boilerplate").cast("long")
            .alias("n_boilerplate_segments"),
        )
        .withColumn(
            "boilerplate_ratio",
            F.col("n_boilerplate_segments").cast("double")
            / F.col("n_segments"))
    )


def boilerplate_scrub(docs: DataFrame, chunk_words: int = 2,
                      df_frac: float = 0.04) -> DataFrame:
    """Corpus-frequent segment REMOVAL with document reassembly — the
    step CCNet/C4 actually apply after detection
    (:func:`boilerplate_segments` only flags): boilerplate segments
    are dropped and the surviving segments are stitched back in
    original order, so downstream training data carries the cleaned
    text, not a ratio.

    Output is doc-grain: the cleaned text's md5 (a strong equality
    witness that the reassembly order is exact), surviving word
    count, and how many segments were removed.  Documents whose
    every segment was boilerplate (or that were too short to segment)
    drop out — there is nothing left to train on.

    Scale: segments explode map-side WITH their position; the df
    count is one vocabulary-grain shuffle; reassembly is one shuffle
    back to doc grain where ``array_sort`` over (pos, segment)
    structs restores order executor-side — no window, no driver
    involvement, and skew is bounded because a document's segment
    count is bounded by its own length.  The segment table feeds BOTH
    the df count and the join's probe side, so it is materialized
    ONCE to scratch parquet (r17, the same ``_spill`` discipline the
    minhash pipeline uses for its shingle table): re-running the
    tokenize+slice+concat+md5 explode per consumer was the dominant
    phase at sf1 (~2x the whole-pipeline cost of one pass)."""
    # a document table often arrives as few large files -> few input
    # partitions, which would serialize the CPU-heavy slice+concat+md5
    # explode; spread docs across the cluster first (same rule as
    # shingle_table — the shuffle moves only the raw docs)
    sc = docs.sparkSession.sparkContext
    docs = docs.repartition(sc.defaultParallelism, "doc_id")
    w = words_col()
    n_chunks = F.floor(F.size(w) / chunk_words).cast("int")
    chunks = F.when(
        n_chunks >= 1,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda c: F.concat_ws(
                " ", F.slice(w, c * chunk_words + 1, chunk_words)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    seg = docs.select(
        "doc_id", F.posexplode(chunks).alias("pos", "segment"))
    seg = _spill(seg.withColumn("seg_id", hex_id(F.col("segment"))),
                 "bp_segments_")
    df_tbl = (seg.select("seg_id", "doc_id").distinct()
              .groupBy("seg_id").agg(F.count("*").alias("seg_df")))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    flagged = (seg.join(df_tbl, "seg_id")
               .join(F.broadcast(n_docs))
               .withColumn(
                   "is_bp",
                   (F.col("seg_df").cast("double")
                    >= F.lit(df_frac) * F.col("n_docs"))))
    # collect_list drops the NULLs the when() leaves on boilerplate
    # rows; array_sort on (pos, segment) structs restores document
    # order executor-side
    kept = F.array_sort(F.collect_list(
        F.when(~F.col("is_bp"), F.struct("pos", "segment"))))
    return (flagged
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_total"),
                 F.sum(F.col("is_bp").cast("long")).alias("n_bp"),
                 kept.alias("kept"))
            .where(F.size("kept") > 0)
            .select(
                "doc_id",
                F.md5(F.concat_ws(
                    " ", F.transform(F.col("kept"),
                                     lambda x: x["segment"])))
                .alias("clean_md5"),
                (F.size("kept") * chunk_words).cast("long")
                .alias("clean_words"),
                (F.col("n_total") - F.col("n_bp")).cast("long")
                .alias("n_kept_segments"),
                F.col("n_bp").cast("long").alias("n_removed")))


def tfidf_top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Top-k TF-IDF terms per document: tf from an exploded token
    table, document frequency from the distinct (doc, word) grain,
    idf = ln(N/df) with N supplied as a broadcast 1-row aggregate
    (never a driver-side collect).

    Scale: tokenize explodes map-side; ONE shuffle to (doc_id, word)
    grain; the df table is vocabulary-grain (small — Zipf) and joins
    back on word; ranking windows over per-doc groups. Deterministic
    tiebreak (score desc, word asc) so top-k is a stable set."""
    tok = docs.select("doc_id", F.explode(words_col()).alias("word"))
    tf = tok.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("word").agg(F.count("*").alias("df"))
    nd = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "word")
        .join(F.broadcast(nd))
        .withColumn(
            "tfidf",
            # ROUND(6) on both engines: ln() is the one place the two
            # libms drift by 1 ulp, and transcendental outputs are not
            # constructed half-boundary values (unlike money/20), so
            # rounding is safe here — and ranking uses the ROUNDED
            # score so the top-k set can't differ either
            F.round(F.col("tf").cast("double")
                    * F.log(F.col("n_docs").cast("double")
                            / F.col("df").cast("double")), 6))
    )
    from pyspark.sql.window import Window
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("word"))
    return (scored
            .withColumn("term_rank", F.row_number().over(w))
            .where(F.col("term_rank") <= k)
            .select("doc_id", "term_rank", "word", "tf", "df", "tfidf"))


#: PII patterns shared by the scrubber and its oracle twin: simple
#: character-class regexes chosen to mean the SAME thing in Java
#: regex (Spark) and RE2 (DuckDB) — no lookaround, no \b, no
#: dialect-specific escapes.
PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
PII_IPV4_RE = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"


def pii_scrub(docs: DataFrame) -> DataFrame:
    """PII redaction — the compliance pass every pre-training corpus
    goes through before the tokenizer sees it: count and mask emails,
    phone numbers, and IPv4 addresses, entirely with JVM-side regex
    column functions (map-side, no shuffle, no UDF — scales to any
    corpus size as a pure scan).

    The synthetic corpus is word-salad with no PII, so the entry
    INJECTS deterministic PII into two thirds of the docs first (an
    email+phone tail on doc_id%3==0, an IP tail on doc_id%3==1) with
    arithmetic the DuckDB oracle reproduces — counts are then
    observably nonzero and the scrubbed text hash-checks end-to-end.
    Replacement order matters only in that the patterns are disjoint
    by construction (phones use dashes, IPs use dots)."""
    did = F.col("doc_id").cast("long")
    injected = (
        F.when(did % 3 == 0,
               F.concat(F.col("text"), F.lit(" reach user"),
                        did.cast("string"), F.lit("@example.com or 415-555-"),
                        F.lpad((did % 10000).cast("string"), 4, "0"),
                        F.lit(" today")))
        .when(did % 3 == 1,
              F.concat(F.col("text"), F.lit(" server 10."),
                       (did % 256).cast("string"), F.lit(".0.1 logged")))
        .otherwise(F.col("text")))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(injected, PII_EMAIL_RE, "[EMAIL]"),
            PII_PHONE_RE, "[PHONE]"),
        PII_IPV4_RE, "[IP]")
    return docs.select(
        did.alias("doc_id"),
        F.regexp_count(injected, F.lit(PII_EMAIL_RE)).cast("int")
        .alias("n_emails"),
        F.regexp_count(injected, F.lit(PII_PHONE_RE)).cast("int")
        .alias("n_phones"),
        F.regexp_count(injected, F.lit(PII_IPV4_RE)).cast("int")
        .alias("n_ips"),
        scrubbed.alias("scrubbed_text"),
    )
