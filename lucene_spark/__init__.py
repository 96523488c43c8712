"""lucene_spark — a PySpark-native inverted-index build + BM25 query engine.

A from-scratch rebuild of the indexing and search core of Apache Lucene
(reference: hanbj/lucene fork of apache/lucene, surveyed in SURVEY.md),
re-expressed Spark-first:

- the index is a set of Parquet tables (``docs``, ``postings``,
  ``term_stats``, ``field_stats``) plus a two-phase-committed JSON
  manifest (the ``segments_N`` analog,
  lucene/core/src/java/org/apache/lucene/index/SegmentInfos.java:55-64);
- segment building is a per-partition ``mapInPandas`` pass (the DWPT
  analogy, lucene/core/.../index/DocumentsWriter.java:52-58);
- BM25 scoring replicates BM25Similarity.java:101-262 bit-for-bit in
  numpy float32, with block-max (WAND-style) pruning that never changes
  surviving scores (WANDScorer.java:31-58 safety argument).
"""

__version__ = "0.1.0"

from lucene_spark.session import get_spark  # noqa: F401
