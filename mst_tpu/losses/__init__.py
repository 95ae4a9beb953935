from mst_tpu.losses.infonce import info_nce_loss, nt_xent_loss
from mst_tpu.losses.mrstft import multi_resolution_stft_loss
from mst_tpu.losses.uncertainty import UncertaintyWeightedMSE, feature_group_slices

__all__ = [
    "info_nce_loss",
    "nt_xent_loss",
    "multi_resolution_stft_loss",
    "UncertaintyWeightedMSE",
    "feature_group_slices",
]
