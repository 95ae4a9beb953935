"""Single source of truth for every hyperparameter.

The reference keeps *two* live configs that drift apart (SURVEY.md §2.6):
``src/params.py`` defaults (n_fft 1024 / hop 256 / mel 128 / split 20/10 /
embed 768) and the actually-trained config hard-coded into every inference
script (``scripts/train_baseline.sh``: n_fft 2048 / hop 512 / mel 80 /
split 16/8 / embed 512 / feature_dim 64).  Here both are first-class frozen
dataclasses; everything downstream takes a config object, nothing is
hard-coded twice.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple


def _asdict(cfg) -> dict:
    return dataclasses.asdict(cfg)


@dataclass(frozen=True)
class AudioConfig:
    """Front-end / DSP parameters (ref: src/params.py:24-30, src/model.py:25-39)."""

    sample_rate: int = 44100
    clip_duration: float = 10.0
    n_fft: int = 1024
    hop_length: int = 256
    n_mels: int = 128
    #: 'rfft' = bit-parity path; 'gemm' = DFT-as-GEMM on the MXU (~2x faster
    #: on TPU, bf16 noise at the log floor; ops.stft.spectrogram_gemm).
    #: INTENTIONAL default split: the *library* defaults to 'rfft' so that
    #: programmatic use (and the golden-parity test suite) is bit-faithful to
    #: torch.stft, while every *CLI* defaults to 'gemm' (cli/_common.py:21)
    #: because end users run on TPU where gemm is ~2x faster at embedding
    #: cosine 0.999999.  Pass --mel_method rfft to any CLI for the parity path.
    mel_method: str = "rfft"

    @property
    def clip_samples(self) -> int:
        return int(self.clip_duration * self.sample_rate)

    @property
    def num_frames(self) -> int:
        # torch.stft with center=True produces 1 + T // hop frames.
        return 1 + self.clip_samples // self.hop_length


@dataclass(frozen=True)
class EncoderConfig:
    """Band-split encoder (ref: src/model.py:214-542).

    ``n_subbands`` is derived exactly as the reference does
    (model.py:257-261): count i from 0 while overlap*i <= n_mels - split_size.
    """

    audio: AudioConfig = field(default_factory=AudioConfig)
    split_size: int = 20
    overlap: int = 10
    channels: int = 8  # 4 stems x 2 stereo channels
    embed_dim: int = 768
    cnn_out_channels: int = 64
    cnn_mid_channels: int = 32
    attn_hidden_dim: int = 256
    feature_dim: int = 64  # mixing-feature vector length fed to the FiLM MLP
    film_hidden_dim: int = 256
    dropout: float = 0.3
    #: compute dtype of the conv/dense stack ('float32' | 'bfloat16');
    #: params stay float32 either way
    compute_dtype: str = "float32"

    @property
    def n_subbands(self) -> int:
        n, i = 0, 0
        while self.overlap * i <= self.audio.n_mels - self.split_size:
            n += 1
            i += 1
        return n

    @property
    def sub_pool(self) -> int:
        # vertical pooling of the first conv block (ref: model.py:111)
        return max(1, self.split_size // 10)


@dataclass(frozen=True)
class FeatureConfig:
    """Mixing-feature extractor (ref: src/mixing_utils.py:16-69)."""

    audio: AudioConfig = field(default_factory=AudioConfig)
    use_detailed_spectral: bool = False
    n_spectral_bins: int = 32

    @property
    def dynamics_dim(self) -> int:
        return 6

    @property
    def spectral_dim(self) -> int:
        return 5 if not self.use_detailed_spectral else self.n_spectral_bins + 2

    @property
    def stereo_dim(self) -> int:
        return 3

    @property
    def feature_dim(self) -> int:
        # 4 stems x per-stem + 4 rel_loudness + 4 masking (ref: mixing_utils.py:53-69)
        return 4 * (self.dynamics_dim + self.spectral_dim + self.stereo_dim) + 4 + 4


@dataclass(frozen=True)
class TCNConfig:
    """TCN style-transfer mixer (ref: src/tcn_mixer.py:219-283)."""

    in_channels: int = 8
    hidden_channels: int = 128
    num_blocks: int = 14
    kernel_size: int = 15
    causal: bool = False
    use_film: bool = True
    film_embed_dim: int = 1536  # concat(input_emb, target_emb)
    film_hidden_dim: int = 512
    # rematerialize block activations in backward (10 s clips: ~56 GB ->
    # fits on one v5e chip; see models/tcn.py)
    remat: bool = False

    @property
    def receptive_field(self) -> int:
        return 1 + sum(2**i * (self.kernel_size - 1) for i in range(self.num_blocks))


@dataclass(frozen=True)
class Stage1Config:
    """Stage-1 contrastive training (ref: src/params.py, src/train.py)."""

    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    features: FeatureConfig = field(default_factory=FeatureConfig)
    batch_size: int = 24
    num_segments: int = 2
    num_epochs: int = 100
    learning_rate: float = 2e-4
    weight_decay: float = 0.01
    temperature: float = 0.1
    warmup_steps: int = 2000
    seed: int = 42
    # adversarial song-identity removal (ref: params.py:76-97)
    use_adversarial: bool = False
    adversarial_lambda: float = 1.0
    initial_adversarial_lambda: float = 0.0
    adversarial_warmup_steps: int = 2000
    fixed_grl_lambda: float | None = None
    discriminator_hidden_dim: int = 512
    discriminator_dropout: float = 0.3
    discriminator_noise: float = 0.0
    # Train the discriminator on DETACHED embeddings in addition to the
    # GRL path.  In plain DANN (the reference's design, grl.py) the head's
    # only learning signal passes through the reversal, so it chases a
    # moving target and stays weak — measured: zero identity-probe drop at
    # lambda up to 10 while InfoNCE converges.  With a full-strength head
    # the reversed gradient actually points at the content subspace.
    disc_detach_train: bool = False
    # Separate constant-LR Adam for the discriminator.  None = share the
    # encoder's warmup-cosine AdamW (legacy/ref behavior, train.py:586-644)
    # — which on short runs (max_steps << warmup_steps) keeps the adversary's
    # LR near zero the whole time: measured disc cosine fit 0.30 after 500
    # steps while a ridge probe decodes the same embeddings at 0.90.
    disc_learning_rate: Optional[float] = None
    # Inner discriminator updates per train step (k-1 extra Adam steps on the
    # detached embedding after the joint update).  >1 keeps the adversary
    # near-converged so the reversed gradient points at the true identity
    # subspace (alternating-update GAN/DANN practice).
    disc_steps: int = 1
    song_id_dim: int = 512
    # on-device augmentation chain for negative pairs
    use_augmentation: bool = False
    augment_prob: float = 0.5
    # parallelism
    mesh_shape: Tuple[int, ...] = (1,)
    mesh_axes: Tuple[str, ...] = ("data",)


@dataclass(frozen=True)
class StyleTransferConfig:
    """Style-transfer (TCN) training (ref: src/train_style_transfer.py)."""

    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    features: FeatureConfig = field(default_factory=FeatureConfig)
    tcn: TCNConfig = field(default_factory=TCNConfig)
    batch_size: int = 1
    grad_accum_steps: int = 32
    grad_clip: float = 1.0
    learning_rate: float = 2e-4
    num_epochs: int = 50
    use_cycle_consistency: bool = True
    cycle_weight: float = 0.1
    # recompute the output-embedding encoder pass in backward instead of
    # storing its mel/CNN activations (pairs with TCNConfig.remat)
    remat_embed: bool = False
    seed: int = 42
    mesh_shape: Tuple[int, ...] = (1,)
    mesh_axes: Tuple[str, ...] = ("data",)


# ---------------------------------------------------------------------------
# Canonical fingerprints (SURVEY.md §2.6)
# ---------------------------------------------------------------------------

#: params.py defaults: used by docs/tests in the reference.
DEFAULT_AUDIO = AudioConfig(n_fft=1024, hop_length=256, n_mels=128)
DEFAULT_ENCODER = EncoderConfig(
    audio=DEFAULT_AUDIO, split_size=20, overlap=10, embed_dim=768, feature_dim=64
)

#: The configuration the reference model was actually trained with
#: (scripts/train_baseline.sh:36-57; hard-coded in validate_retrieval.py:42-52).
TRAINED_AUDIO = AudioConfig(n_fft=2048, hop_length=512, n_mels=80)
TRAINED_ENCODER = EncoderConfig(
    audio=TRAINED_AUDIO, split_size=16, overlap=8, embed_dim=512, feature_dim=64
)


def config_to_json(cfg: Any) -> str:
    return json.dumps(_asdict(cfg), indent=2, default=str)


def config_from_dict(cls, d: dict):
    """Rebuild a (possibly nested) frozen config dataclass from a dict."""
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        if dataclasses.is_dataclass(f.type) and isinstance(v, dict):
            kwargs[f.name] = config_from_dict(f.type, v)
        elif f.name in ("audio", "encoder", "features", "tcn") and isinstance(v, dict):
            sub = {"audio": AudioConfig, "encoder": EncoderConfig,
                   "features": FeatureConfig, "tcn": TCNConfig}[f.name]
            kwargs[f.name] = config_from_dict(sub, v)
        elif isinstance(v, list):
            kwargs[f.name] = tuple(v)
        else:
            kwargs[f.name] = v
    return cls(**kwargs)
