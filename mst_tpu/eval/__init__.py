from mst_tpu.eval.per_pair import optimize_pair, optimize_pairs, CONVERGENCE_IMPROVEMENT
from mst_tpu.eval.transfer_eval import StyleTransferEvaluator
from mst_tpu.eval.audio_quality import audio_quality_report
from mst_tpu.eval.inlp import fit_identity_nullspace, apply_projection
from mst_tpu.eval.retrieval import (
    compute_embeddings,
    compute_track_embedding,
    build_embedding_cache,
    retrieve_top_k,
    evaluate_retrieval_accuracy,
    save_embedding_cache,
    load_embedding_cache,
)

__all__ = [
    "optimize_pair",
    "optimize_pairs",
    "CONVERGENCE_IMPROVEMENT",
    "StyleTransferEvaluator",
    "audio_quality_report",
    "fit_identity_nullspace",
    "apply_projection",
    "compute_embeddings",
    "compute_track_embedding",
    "build_embedding_cache",
    "retrieve_top_k",
    "evaluate_retrieval_accuracy",
    "save_embedding_cache",
    "load_embedding_cache",
]
