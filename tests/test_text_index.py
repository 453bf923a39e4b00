"""Word-level text search index on manifest tables.

Contract (manifest.py build_text_index / search_text): one Spark job
folds each live file's distinct lowercased words into a per-file Bloom
filter (the module hashing contract, replayed bit-for-bit by the
driver probe); sidecar JSONs ride the partition refs.  A term search
then drops whole files whose filter proves a query word absent and
applies the exact whole-word predicate to the survivors — the index
is an accelerator, never the answer.  Conservative everywhere: files
appended after the build are unindexed and always read; rewrites drop
the stale map; vacuum keeps live sidecars.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.manifest import ManifestTable

DOCS = [
    # lang, doc_id, text — 'zebra' appears in exactly one row/file
    ("en", 1, "the quick brown fox jumps over the lazy dog"),
    ("en", 2, "pack my box with five dozen liquor jugs"),
    ("en", 3, "a zebra grazes beside the watering hole"),
    ("en", 4, "sphinx of black quartz judge my vow"),
    ("de", 5, "der schnelle braune fuchs springt hoch"),
    ("de", 6, "ein zebra steht am wasserloch still"),
    ("fr", 7, "portez ce vieux whisky au juge blond"),
    ("fr", 8, "le renard brun saute par dessus le chien"),
]


def _mkdf(spark, rows):
    return spark.createDataFrame(
        rows, "lang string, doc_id bigint, text string")


@pytest.fixture()
def table(spark, tmp_path):
    df = (_mkdf(spark, DOCS)
          .repartition(1).sortWithinPartitions("doc_id"))
    # max_records_per_file=1: every row is its own file, so per-file
    # pruning is observable row by row
    return ManifestTable.create(df, str(tmp_path / "docs"), "lang",
                                max_records_per_file=1)


def test_search_prunes_files_and_matches_exactly(spark, table):
    stats = table.build_text_index(spark, "text")
    assert stats["indexed"] == 8
    df, s = table.search_text(spark, "text", "zebra")
    got = sorted(r["doc_id"] for r in df.collect())
    assert got == [3, 6]
    assert s["files"] == 8 and s["files_pruned"] == 6


def test_search_is_whole_word(spark, table):
    """'jug' must not match 'jugs' or 'juge' — word boundaries, and
    the filter is exact even where the bloom kept a file."""
    table.build_text_index(spark, "text")
    df, _ = table.search_text(spark, "text", "jug")
    assert df.count() == 0
    df, _ = table.search_text(spark, "text", "jugs")
    assert [r["doc_id"] for r in df.collect()] == [2]


def test_multi_word_is_and_semantics(spark, table):
    table.build_text_index(spark, "text")
    df, s = table.search_text(spark, "text", ["brown", "fox"])
    assert [r["doc_id"] for r in df.collect()] == [1]
    assert s["files_pruned"] >= 6


def test_appended_files_searched_conservatively(spark, table):
    table.build_text_index(spark, "text")
    table.append(_mkdf(spark,
                       [("en", 9, "a second zebra arrives late")]))
    df, s = table.search_text(spark, "text", "zebra")
    assert sorted(r["doc_id"] for r in df.collect()) == [3, 6, 9]
    # the old files still prune; only the unindexed append always reads
    assert s["files_pruned"] == 6 and s["files"] == 9


def test_vacuum_keeps_live_index_sidecars(spark, table):
    table.build_text_index(spark, "text")
    table.vacuum(retention_seconds=0.0)
    df, s = table.search_text(spark, "text", "quartz")
    assert [r["doc_id"] for r in df.collect()] == [4]
    assert s["files_pruned"] == 7


def test_rewrite_drops_stale_map_search_stays_exact(spark, table):
    table.build_text_index(spark, "text")
    table.compact(spark, min_files=2)      # rewrites every partition
    df, s = table.search_text(spark, "text", "zebra")
    assert sorted(r["doc_id"] for r in df.collect()) == [3, 6]
    assert s["files_pruned"] == 0          # stale index gone, no skip
    table.build_text_index(spark, "text")  # refresh restores pruning
    df, s = table.search_text(spark, "text", "zebra")
    assert sorted(r["doc_id"] for r in df.collect()) == [3, 6]
    assert s["files_pruned"] >= 1


def test_index_survives_the_clone(spark, table, tmp_path):
    table.build_text_index(spark, "text")
    c = table.clone(str(tmp_path / "c"))
    df, s = c.search_text(spark, "text", "zebra")
    assert sorted(r["doc_id"] for r in df.collect()) == [3, 6]
    assert s["files_pruned"] == 6
