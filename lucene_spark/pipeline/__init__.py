"""Training-data pipeline operators over document / embedding tables.

These are the large-scale data-curation operations a 100 TB training
pipeline needs on top of the fulltext index core: text statistics,
deduplication (exact / n-gram Jaccard / MinHash-LSH / SimHash /
embedding-cosine), and similarity search (brute-force + LSH-bucketed
ANN). Every operator is expressed JVM-side (pyspark.sql.functions,
whole-stage codegen) and pairs with a DuckDB-runnable ANSI-SQL oracle
generator defined in the same module.
"""
