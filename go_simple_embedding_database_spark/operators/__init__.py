from go_simple_embedding_database_spark.operators.topk import (
    topk_by_similarity,
    batch_topk,
    similarity_join,
)

__all__ = ["topk_by_similarity", "batch_topk", "similarity_join"]
