from lucene_spark.memory.memindex import MemoryIndex

__all__ = ["MemoryIndex"]
