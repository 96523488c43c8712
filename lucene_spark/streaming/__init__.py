"""Structured-Streaming surface: the NRT (near-real-time) indexing
pipeline — Lucene's SearcherManager/refresh model mapped to
foreachBatch micro-batch segment appends."""
