"""Structured Streaming operators (SURVEY.md §2B "Streaming").

The reference has no streaming surface; this family covers the declared
target set: tumbling/sliding window aggregation, session windows,
watermarked late-data handling, stateful dedup, and a ``foreachBatch``
sink. Batch/stream parity: every transformation here is written against
a plain DataFrame so the same code serves ``read`` and ``readStream``.
"""
