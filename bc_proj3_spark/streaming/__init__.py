"""Structured Streaming variants of the incremental layer.

The reference's "streaming" is a batch high-water-mark cursor
(silver_arxiv.py:43-50 — SURVEY.md §2.11 explicitly notes no true
streaming); this package is the idiomatic Spark upgrade path:
file-stream sources, event-time watermarks, windowed aggregation,
streaming dedup, and foreachBatch upserts with Trigger.AvailableNow —
the exactly-once batch-boundary equivalent of the cursor contract.
"""
