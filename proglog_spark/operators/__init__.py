from proglog_spark.operators import dedup, similarity, text, topk, windows

__all__ = ["dedup", "similarity", "text", "topk", "windows"]
