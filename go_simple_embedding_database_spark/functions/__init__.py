from go_simple_embedding_database_spark.functions.kernels import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = ["cosine_similarity", "dot_product", "l2_norm"]
