from proglog_spark.operators import dedup, rank, similarity, text, topk, windows

__all__ = ["dedup", "rank", "similarity", "text", "topk", "windows"]
