"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference pipeline (KevDev7/stock_market_data_pipeline).

The reference is a Snowflake/dbt batch ELT pipeline (see SURVEY.md); this
package re-expresses its full operator surface — staging projections,
point-in-time joins, guarded rolling-window indicators, market-breadth
aggregates, SCD-2 snapshots, incremental upserts, idempotent ingest — as
idiomatic PySpark DataFrame/SQL programs, plus the large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal plumbing) the reference lacks.

Design principles (100 TB north star):
- DataFrame/SQL first: every operator is declarative so Catalyst gets
  predicate pushdown, column pruning, and join planning for free.
- No row-at-a-time Python in hot paths; Pandas UDFs only where built-in
  functions genuinely cannot express the semantics.
- Shuffle-aware: windows repartition by their partition key once and
  reuse the partitioning; small dimensions broadcast; AQE on.
"""

__version__ = "0.1.0"
