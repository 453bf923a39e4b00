"""Reusable relational operators the built-in DataFrame API lacks as
one-liners: point-in-time (as-of interval) joins and QUALIFY emulation.
The dedup / similarity / multimodal families live in ``..llm``."""
