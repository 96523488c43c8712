from lucene_spark.analysis.analyzer import (  # noqa: F401
    Analyzer,
    SimpleAnalyzer,
    StandardAnalyzer,
    WhitespaceAnalyzer,
    get_analyzer,
)
