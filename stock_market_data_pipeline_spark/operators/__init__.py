"""Reusable relational operators the built-in DataFrame API lacks as
one-liners:

asof       — point-in-time interval join (broadcast or bucketed SMJ)
             and the backward as-of join (union-window, zero-join plan)
qualify    — QUALIFY emulation (top-n per group)
resample   — calendar gap-fill/forward-fill, OHLC downsampling
events_ops — sessionization, hopping windows, session funnel, JSON
             property extraction over event streams
salt       — skew salting for hot-key aggregates and joins
layout     — bucketed-table writes (shuffle-free joins), small-file
             compaction
diff       — keyed table diff / CDC classification

The dedup / similarity / text / multimodal families live in ``..llm``.
"""
