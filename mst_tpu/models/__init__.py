from mst_tpu.models.encoder import (
    MelFrontend,
    SubBandCNN,
    AttentionPooling,
    BandSplitEncoder,
    MixingFeatureEncoder,
    MixingStyleEncoder,
)
from mst_tpu.models.discriminator import SongIdentityDiscriminator
from mst_tpu.models.grl import (
    gradient_reversal,
    compute_grl_lambda,
    compute_adversarial_lambda,
)
from mst_tpu.models.tcn import TCNMixer, TCNFiLMGenerator, create_tcn_config
from mst_tpu.models.cqtnet import CQTNet
from mst_tpu.models.fx_encoder import FxEncoder, make_fx_embed_fn

__all__ = [
    "MelFrontend",
    "SubBandCNN",
    "AttentionPooling",
    "BandSplitEncoder",
    "MixingFeatureEncoder",
    "MixingStyleEncoder",
    "SongIdentityDiscriminator",
    "gradient_reversal",
    "compute_grl_lambda",
    "compute_adversarial_lambda",
    "TCNMixer",
    "TCNFiLMGenerator",
    "create_tcn_config",
    "CQTNet",
    "FxEncoder",
    "make_fx_embed_fn",
]
