from lucene_spark.analysis.analyzer import (  # noqa: F401
    Analyzer,
    CodeAnalyzer,
    SimpleAnalyzer,
    StandardAnalyzer,
    WhitespaceAnalyzer,
    get_analyzer,
)
