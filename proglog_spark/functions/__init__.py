from proglog_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
    quantized_dot,
)

__all__ = ["cosine_similarity", "dot_product", "l2_norm", "quantized_dot"]
