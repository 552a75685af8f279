"""Structured Streaming surface (SURVEY §2.9).

The reference is batch-only but encodes streaming concerns: a late-data
guard (reference ufload/cloud.py:129-133 — ignore files newer than 900 s)
and incremental idempotence (reference ufload/db.py:695-711). This package
expresses them natively: ``readStream`` file sources, event-time watermarks,
tumbling-window aggregation, streaming deduplication, and a custom stateful
operator via ``applyInPandasWithState``.
"""
