"""Structured Streaming layer (SURVEY.md §2.9).

The reference encodes streaming semantics manually in batch (per-date
replay with a checkpoint ledger); here the same contracts run on real
Structured Streaming:

- exactly-once:     checkpointLocation + idempotent foreachBatch MERGE
- late data:        watermark + tumbling event-time windows
- ordered replay:   Trigger.AvailableNow over a file source
- upsert on key:    foreachBatch merge_upsert (same algebra as the
                    incremental runner)
"""
