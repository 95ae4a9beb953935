"""Mixture-level effects encoder (the reference's ``fx_encoder`` option).

The reference style-transfer trainer can condition the TCN on a
mixture-level 128-d "Fx" embedding instead of the stem-based 512-d
mixing-style embedding (ref: src/train_style_transfer.py:421-426,543-556 —
it loads the external Fx-Encoder++ package and calls
``encoder.get_fx_embedding(mixture)``; inference counterpart
inference/inference_e2e_style_transfer.py:7).  The external package's
weights cannot ship here, so this module provides the tpu-native
equivalent role: a compact mixture -> L2-normalized embedding CNN whose
checkpoints drop into the same ``--encoder_type fx_encoder`` CLI slot.

Architecture (NHWC, static shapes, MXU-friendly):

    mixture (B, 2, T) -> log-mel (B, n_mels, frames, 2)
    -> [Conv 3x3 + BN + GELU + stride-2 pool] x len(channels)
    -> mean over time -> flatten freq x ch -> Dense -> L2 normalize

All convs are NHWC so XLA tiles them straight onto the MXU; pooling is
static so the whole embed is one fused program under jit.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mst_tpu.config import AudioConfig
from mst_tpu.ops.mel import mel_spectrogram


class FxEncoder(nn.Module):
    """Mixture (B, 2, T) -> L2-normalized (B, embed_dim) effects embedding."""

    audio: AudioConfig
    embed_dim: int = 128
    channels: tuple = (32, 64, 128, 128)

    @nn.compact
    def __call__(self, mixture: jax.Array, *, train: bool = False) -> jax.Array:
        a = self.audio
        mel = mel_spectrogram(
            mixture, a.sample_rate, a.n_fft, a.hop_length, a.n_mels,
            power=2.0, method=getattr(a, "mel_method", "rfft"),
        )  # (B, 2, M, F)
        x = jnp.log(mel + 1e-10)
        x = jnp.transpose(x, (0, 2, 3, 1))  # (B, M, F, 2) NHWC

        for i, ch in enumerate(self.channels):
            x = nn.Conv(ch, (3, 3), padding="SAME", name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn{i}")(x)
            x = nn.gelu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))

        x = jnp.mean(x, axis=2)          # pool time -> (B, M', C)
        x = x.reshape(x.shape[0], -1)    # flatten freq x ch
        x = nn.Dense(self.embed_dim, name="proj")(x)
        norm = jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        return x / norm


def make_fx_embed_fn(model: FxEncoder, variables: dict):
    """``embed_fn(stems (B, 4, 2, T)) -> (B, embed_dim)`` adapter for the
    style-transfer trainer: sums stems to the mixture first
    (ref: train_style_transfer.py:176-182)."""

    def embed(stems: jax.Array) -> jax.Array:
        return model.apply(variables, jnp.sum(stems, axis=1))

    return embed
