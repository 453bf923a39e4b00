"""Ingestion layer — the reference's src/ pipeline re-expressed
Spark-first (SURVEY.md §2.1 S1-S8, §3.1):

calendar  — S4 trading-calendar dimension
ledger    — S7/S8 checkpoint ledger (exactly-once-per-date idempotency)
source    — S1/S2/S3 REST source shape: fetch + retry/backoff + rate
            limiter (network-free deterministic generator stands in
            for the Polygon endpoint)
loader    — S5/S6 + P5/P6: normalization, schema-subset guard, DDL
            ensure-exists, bulk append, orchestrated per-date loop
"""
