"""LLM-training-data pipeline operators (the 100 TB north star).

dedup       — exact (content hash), n-gram Jaccard (inverted-index
              bucket join), MinHash+LSH banding, SimHash, connected-
              components clustering (pairs -> survivor selection)
textops     — language-ID heuristic, quality scoring, token counting
              (incl. BPE-style regex), bag-of-words and rolling-hash
              fingerprints, TF-IDF top terms
similarity  — brute-force cosine top-k baseline, IVF-partitioned ANN,
              per-label centroids (IVF training step)
multimodal  — opaque binary payload columns + Arrow-batched feature
              extraction via mapInPandas

Everything is expressed with Catalyst-native column functions (zero
row-at-a-time Python UDFs; multimodal uses Arrow-batched mapInPandas by
necessity). Cross-engine determinism for the DuckDB oracles rests on
two primitives verified bit-identical between engines: md5 hex →
15-hex-digit → BIGINT shingle ids, and exact integer/decimal sums.
"""
