"""Training-data curation operators: sequence packing, benchmark
contamination, and stratified class balancing.

These are the corpus-assembly steps that sit between dedup/quality
filtering (llm/dedup.py, llm/textops.py) and the training job itself:

- pack_sequences    concat-then-chunk document packing into fixed
                    context windows (the GPT-style pretraining layout)
- benchmark_contamination
                    n-gram overlap of the training split against a
                    held-out benchmark split (eval-leak detection)
- stratified_balance
                    per-stratum deterministic downsampling to the
                    smallest class (language balancing)

Determinism contract (SURVEY.md §8.6): every ratio is a single IEEE
division of exact integers; ordering ties are broken by md5 hex text
(identical lexicographic order on both engines); no floats are
aggregated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import words_col


def pack_sequences(docs: DataFrame, ctx_len: int = 256,
                   n_shards: int = 8) -> DataFrame:
    """Concat-then-chunk sequence packing: lay documents end-to-end in
    doc_id order and cut the token stream into ``ctx_len``-token
    context windows, reporting for each document the pack it starts
    in, the offset within that pack, and the pack it ends in (a doc
    whose span crosses a boundary contributes to two or more packs —
    exactly the standard pretraining layout, where attention masks
    handle the seam).

    Scale: a GLOBAL running sum would serialize on one partition, so
    packing is per-shard — ``shard = doc_id % n_shards`` (at 100 TB:
    one shard per output file, thousands of shards) and the running
    sum is a window PARTITIONED by shard. Each shard's token stream
    is independent, which is also what a multi-file training layout
    wants: readers consume shards in parallel with no cross-file
    offsets. ONE hash shuffle to shard grain; the window sort is
    per-shard, bounded by shard size, never global.
    """
    n_tokens = F.size(words_col()).cast("long")
    w = (Window.partitionBy("shard_id").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        docs.select(
            "doc_id",
            (F.col("doc_id") % n_shards).cast("long").alias("shard_id"),
            n_tokens.alias("n_tokens"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .select(
            "doc_id", "shard_id", "n_tokens", "cum_tokens",
            F.floor((F.col("cum_tokens") - F.col("n_tokens"))
                    / ctx_len).cast("long").alias("start_pack"),
            ((F.col("cum_tokens") - F.col("n_tokens")) % ctx_len)
            .cast("long").alias("start_offset"),
            F.floor((F.col("cum_tokens") - 1) / ctx_len).cast("long")
            .alias("end_pack"),
        )
    )


def chunk_documents(docs: DataFrame, window: int = 64,
                    stride: int = 48) -> DataFrame:
    """Context-window CHUNKING with overlap — the per-document
    counterpart of :func:`pack_sequences` (RAG indexing and
    long-document SFT both consume this shape: fixed-size token
    windows with a stride, so every token appears in at least one
    chunk and boundary context is preserved in the overlap).

    Chunk starts are 0, stride, 2·stride, …; the LAST start is the
    first multiple of ``stride`` whose window reaches the document
    end (``1 + ceil((n - window)/stride)`` chunks for ``n > window``,
    one chunk otherwise), so no fully-redundant trailing chunk is
    emitted and every token is covered.  Token-empty documents emit
    nothing.

    Scale: pure map-side — one ``sequence``/``transform``/
    ``posexplode`` over the token array, no shuffle, no UDF; output
    rows ≈ input tokens / stride regardless of document skew (a
    single 10 GB document becomes many rows of one bounded width, not
    one unsplittable record)."""
    return (docs
            .select("doc_id", words_col().alias("__ts"))
            .where(F.size("__ts") > 0)
            .select(
                "doc_id",
                F.posexplode(F.expr(
                    f"transform(sequence(0, greatest(0, "
                    f"cast(ceil((size(__ts) - {window}) / "
                    f"{float(stride)}) as int))), "
                    f"i -> slice(__ts, i * {stride} + 1, {window}))"))
                .alias("chunk_idx", "__chunk"))
            .select(
                "doc_id",
                F.col("chunk_idx").cast("long").alias("chunk_idx"),
                F.array_join("__chunk", " ").alias("chunk_text"),
                F.size("__chunk").cast("long").alias("n_tokens")))


def benchmark_contamination(docs: DataFrame, n: int = 8,
                            bench_mod: int = 10) -> DataFrame:
    """Eval-contamination scan: flag training documents sharing any
    word ``n``-gram with the benchmark split (here: every
    ``bench_mod``-th doc_id — the deterministic stand-in for a real
    benchmark table, which would be a second DataFrame input).

    The industry-standard leak check (GPT-3 appendix C / PaLM §7 use
    8-13-gram overlap): a training doc that reproduces a benchmark
    n-gram verbatim inflates eval scores and must be dropped.

    Scale: n-grams explode map-side on BOTH sides; the join is an
    equi-join on the n-gram string via its distinct benchmark set —
    an inverted-index probe, never doc × doc. The benchmark side is
    the small side by construction (one distinct row per benchmark
    n-gram type), so AQE broadcasts it when it fits. Output is
    train-doc grain with exact integer hit counts.
    """
    n_words = F.size(words_col())
    grams = F.when(
        n_words >= n,
        F.transform(
            F.sequence(F.lit(1), n_words - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(words_col(), i + j)
                       for j in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    is_bench = (F.col("doc_id") % bench_mod) == 0
    # inner explode: a doc shorter than n words has no n-grams and
    # cannot be contaminated, so it carries no output row (grain =
    # train docs with >= 1 distinct n-gram)
    exploded = docs.select(
        "doc_id", is_bench.alias("is_bench"),
        F.explode(F.array_distinct(grams)).alias("gram"))
    bench_grams = (exploded.where("is_bench")
                   .select("gram").distinct())
    train = exploded.where(~F.col("is_bench"))
    hits = (train.join(bench_grams, "gram", "left_semi")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_contaminated")))
    totals = (train.groupBy("doc_id")
              .agg(F.count("*").cast("long").alias("n_ngrams")))
    return (
        totals.join(hits, "doc_id", "left")
        .select(
            "doc_id", "n_ngrams",
            F.coalesce("n_contaminated", F.lit(0)).cast("long")
            .alias("n_contaminated"),
            (F.coalesce("n_contaminated", F.lit(0)).cast("double")
             / F.col("n_ngrams")).alias("contamination_ratio"),
        )
    )


def stratified_balance(docs: DataFrame,
                       stratum: str = "lang") -> DataFrame:
    """Class-balanced deterministic downsample: keep exactly
    ``min(stratum sizes)`` documents per stratum, selected by md5
    order of the doc id (a seedless, engine-portable shuffle), so
    every class ends up the same size — the language-balancing step
    of multilingual corpus assembly.

    Scale: stratum sizes are ONE tiny aggregate (stratum-grain,
    broadcast back); ranking is a window per stratum — the same
    single hash shuffle the grouped count needs. The md5 sort key is
    computed map-side; nothing is driver-side and no stage depends on
    corpus-order.
    """
    sizes = docs.groupBy(stratum).agg(F.count("*").alias("n_stratum"))
    k = sizes.agg(F.min("n_stratum").alias("k"))
    rank_w = (Window.partitionBy(stratum)
              .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id"))
    return (
        docs.select("doc_id", stratum)
        .withColumn("pick_rank",
                    F.row_number().over(rank_w).cast("long"))
        .join(F.broadcast(k))
        .where(F.col("pick_rank") <= F.col("k"))
        .select("doc_id", stratum, "pick_rank")
    )


def length_band_filter(docs: DataFrame, lo: float = 0.1,
                       hi: float = 0.9,
                       length_col: str = "n_chars",
                       stratum: str = "lang") -> DataFrame:
    """Per-stratum length-band filter: keep documents whose length sits
    inside the stratum's [p_lo, p_hi] percentile band — the standard
    corpus-curation step that drops boilerplate stubs and runaway
    concatenations per LANGUAGE (a length that is normal in German is
    an outlier in Chinese, so global cutoffs misfilter).

    Scale: the bounds are ONE stratum-grain aggregate (map-side
    partials, stratum cardinality ~ languages) broadcast back onto
    the fact, which scans once — no second pass, no window over the
    corpus. Exact interpolated percentile needs the per-stratum value
    multiset; at extreme per-stratum cardinality switch to
    ``approx_percentile`` (t-digest, mergeable map-side) with the
    same call shape.
    """
    bounds = docs.groupBy(stratum).agg(
        F.percentile(length_col, lo).alias("lo_chars"),
        F.percentile(length_col, hi).alias("hi_chars"))
    return (
        docs.join(F.broadcast(bounds), stratum)
        .where(F.col(length_col).between(F.col("lo_chars"),
                                         F.col("hi_chars")))
        .select("doc_id", stratum, length_col, "lo_chars", "hi_chars")
    )


def unigram_logprob(docs: DataFrame) -> DataFrame:
    """Unigram-LM average log-probability per document — the cheap
    perplexity proxy used for corpus quality filtering (the CCNet /
    Gopher recipe scores documents with a small LM and drops the
    worst tail; a unigram model over the corpus itself is its
    degenerate, fully-SQL-expressible form). Low avg_logprob = the
    document is built from corpus-rare tokens (gibberish, encoding
    noise); implausibly high = degenerate repetition of the most
    common tokens.

    Determinism: each token's log-probability is ROUND()ed to 9 dp
    and summed as DECIMAL(18,9) — association-order-free, so the
    per-doc mean is bit-identical across engines and partitionings
    (SURVEY §8.6 rule 2: round the genuinely inexact scalar once,
    identically, on both sides; never sum raw doubles).

    Scale: token frequencies are one keyed aggregate at vocabulary
    grain (multiple orders smaller than the corpus); the score join
    is token-keyed — the inverted-index shape — and AQE broadcasts
    the frequency side when it fits. The grand total rides along as
    a broadcast 1-row frame. Nothing is driver-side.
    """
    toks = (docs.select("doc_id", F.explode(words_col()).alias("tok"))
            .where(F.col("tok") != ""))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    # grand total from the vocabulary-grain table, NOT a third corpus
    # explode — same exact BIGINT, orders of magnitude fewer rows
    total = freq.agg(F.sum("cnt").alias("n_total"))
    scored = (
        toks.join(freq, "tok")
        .join(F.broadcast(total))
        .select(
            "doc_id",
            F.round(F.log(F.col("cnt").cast("double") / F.col("n_total")),
                    9).cast("decimal(18,9)").alias("logp"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"),
             F.round(F.sum("logp").cast("double") / F.count(F.lit(1)),
                     6).alias("avg_logprob"))
    )


def source_ttr_means(docs: DataFrame) -> DataFrame:
    """Source-grain mean type-token ratio: per-doc TTR as map-side
    column math (``array_distinct`` on the token array — no explode,
    no generator) feeding one tiny domain-grain aggregate.  Split out
    so the plan-shape tests can assert the scoring stage's invariants
    directly (the caller checkpoints this frame, which hides its
    lineage from the final plan)."""
    toks = words_col()
    ttr = (F.round(F.size(F.array_distinct(toks)).cast("double")
                   / F.size(toks), 9).cast("decimal(18,9)"))
    return (
        docs.select("source", ttr.alias("ttr"))
        .groupBy("source")
        .agg((F.sum("ttr").cast("double") / F.count(F.lit(1)))
             .alias("source_mean_ttr")))


def source_quality_filter(docs: DataFrame,
                          quantile: float = 0.5) -> DataFrame:
    """Whole-SOURCE quality filter: score every source (domain) by the
    mean lexical diversity (type-token ratio) of its documents and
    drop every document of the sources below the corpus ``quantile``
    cutoff — the C4/RefinedWeb-style curation step where the REMOVAL
    decision is made at domain grain, not document grain (a boiler-
    plate farm's individually-plausible pages all go at once).

    Determinism: each doc's TTR is one IEEE division of exact integers
    ROUND()ed once to 9 dp and summed as DECIMAL(18,9); the source
    mean is one further division; the cutoff is the exact interpolated
    percentile over source-grain means (bit-identical to DuckDB's
    quantile_cont — same guarantee quantiles_by_brand pins).

    Scale: per-doc TTR is pure map-side column math (``array_distinct``
    on the token array — no explode, no shuffle); sources are ONE tiny
    aggregate (domain grain).  The cutoff is a SCALAR aggregate over
    the source-grain rows, cross-joined back as a broadcast 1-row
    frame — never an unpartitioned window, which would force every
    source row through a single-partition sort (at web scale #domains
    is 10^7+).  ``per_source`` is localCheckpoint-ed first so the
    corpus-wide TTR lineage runs exactly once even though two
    consumers (the cutoff aggregate and the survivor filter) read it;
    at extreme domain cardinality swap ``F.percentile`` for
    ``F.approx_percentile`` (sketch-mergeable, no single-reducer
    gather) at the cost of oracle bit-exactness — the same documented
    switch as length_band_filter.
    """
    per_source = source_ttr_means(docs).localCheckpoint(eager=True)
    cutoff = per_source.agg(
        F.percentile("source_mean_ttr", quantile).alias("cutoff"))
    surviving = (
        per_source
        .join(F.broadcast(cutoff))
        .where(F.col("source_mean_ttr") >= F.col("cutoff"))
        .select("source",
                F.round("source_mean_ttr", 6).alias("source_mean_ttr")))
    return (docs.join(F.broadcast(surviving), "source")
            .select("doc_id", "source", "source_mean_ttr"))
