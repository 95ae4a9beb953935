from mst_tpu.features.mixing_features import (
    extract_mixing_features,
    feature_dim,
    FEATURE_ORDER,
)

__all__ = ["extract_mixing_features", "feature_dim", "FEATURE_ORDER"]
