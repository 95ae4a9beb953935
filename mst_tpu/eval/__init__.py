from mst_tpu.eval.retrieval import (
    compute_embeddings,
    build_embedding_cache,
    retrieve_top_k,
    evaluate_retrieval_accuracy,
    save_embedding_cache,
    load_embedding_cache,
)

__all__ = [
    "compute_embeddings",
    "build_embedding_cache",
    "retrieve_top_k",
    "evaluate_retrieval_accuracy",
    "save_embedding_cache",
    "load_embedding_cache",
]
