"""mst_tpu — a TPU-native (JAX/XLA/Pallas/pjit) mixing-style-transfer framework.

Re-implementation of the capabilities of barry-mir/mixing-style-transfer
(reference layout: src/, inference/, scripts/) as an idiomatic TPU stack:

- ``mst_tpu.ops``        — STFT / mel / biquad / fft-conv DSP kernels (XLA + Pallas)
- ``mst_tpu.features``   — batched 64-d mixing-feature extractor (ref: src/mixing_utils.py)
- ``mst_tpu.augment``    — on-device negative-pair augmentation chain
- ``mst_tpu.models``     — band-split encoder, TCN mixer, discriminator, GRL
- ``mst_tpu.losses``     — InfoNCE / NT-Xent / MR-STFT / uncertainty-weighted MSE
- ``mst_tpu.separation`` — SCNet 4-stem source separation (JAX)
- ``mst_tpu.train``      — Stage-1 contrastive + style-transfer trainers (pjit DP)
- ``mst_tpu.parallel``   — mesh / sharding helpers (ICI collectives)
- ``mst_tpu.data``       — host input pipeline (wav io, datasets, collation)
- ``mst_tpu.eval``       — retrieval validation + transfer evaluation
- ``mst_tpu.checkpoints``— orbax checkpointing + torch .pt compatibility
- ``mst_tpu.cli``        — public entry points mirroring the reference scripts

Canonical stem order is ``('vocals', 'bass', 'drums', 'other')`` and stems are
carried as a single array of shape ``(B, 4, 2, T)`` (stem, stereo-channel, time)
so that every transform vmaps/shards; dict APIs exist only at the CLI edge.
"""

__version__ = "0.1.0"

STEMS = ("vocals", "bass", "drums", "other")
N_STEMS = len(STEMS)
N_CHANNELS = 2  # stereo

from mst_tpu.config import (  # noqa: E402,F401
    AudioConfig,
    EncoderConfig,
    TCNConfig,
    Stage1Config,
    StyleTransferConfig,
    DEFAULT_AUDIO,
    TRAINED_AUDIO,
    DEFAULT_ENCODER,
    TRAINED_ENCODER,
)
