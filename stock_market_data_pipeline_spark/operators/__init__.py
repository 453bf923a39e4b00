"""Reusable relational operators the built-in DataFrame API lacks as
one-liners: point-in-time joins, QUALIFY emulation, dedup families,
similarity search, multimodal column plumbing."""
