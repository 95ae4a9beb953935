"""TCN mixing processor for style transfer (ref: src/tcn_mixer.py).

Dilated residual conv blocks with optional FiLM conditioning, operating on
8-channel stem audio.  TPU-first layout: audio is channel-last ``(B, T, 8)``
(``lax.conv`` on TPU prefers feature-minor), with helpers to/from the
stacked-stem layout ``(B, 4, 2, T)``.

Semantics preserved from the reference:
- non-causal: symmetric 'SAME' padding (effective kernel (k-1)d+1 is odd)
  (ref: tcn_mixer.py:39-57)
- causal: left pad (k-1)*d (ref: tcn_mixer.py:16-36)
- block: conv-BN-[FiLM]-LeakyReLU(0.2) x2 + residual (ref: 60-145)
- 1x1 in/out projections; out projection init N(0, 1e-3), zero bias, global
  residual out + x => near-identity at init (ref: 258-275, 316-321)
- FiLM generator MLP 512-512 with N(0, 0.01)/zero init (ref: 148-216)
- receptive field 1 + sum(2^i (k-1)) (ref: 278-283)
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from mst_tpu.config import TCNConfig


def stems_to_nlc(stems: jax.Array) -> jax.Array:
    """(B, 4, 2, T) -> (B, T, 8), channel order [voc_L, voc_R, bass_L, ...]."""
    B, S, C, T = stems.shape
    return jnp.transpose(stems.reshape(B, S * C, T), (0, 2, 1))


def nlc_to_stems(x: jax.Array) -> jax.Array:
    """(B, T, 8) -> (B, 4, 2, T)."""
    B, T, SC = x.shape
    return jnp.transpose(x, (0, 2, 1)).reshape(B, SC // 2, 2, T)


class _DilatedConv(nn.Module):
    channels: int
    kernel_size: int
    dilation: int
    causal: bool

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.causal:
            pad = (self.kernel_size - 1) * self.dilation
            x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
            return nn.Conv(
                self.channels, (self.kernel_size,),
                kernel_dilation=(self.dilation,), padding="VALID",
            )(x)
        return nn.Conv(
            self.channels, (self.kernel_size,),
            kernel_dilation=(self.dilation,), padding="SAME",
        )(x)


class TCNBlock(nn.Module):
    """Residual block, optionally FiLM-conditioned (ref: tcn_mixer.py:60-145)."""

    channels: int
    kernel_size: int
    dilation: int
    causal: bool = False
    use_film: bool = False

    @nn.compact
    def __call__(self, x, film=None, train: bool = False):
        # NOTE: ``train`` is positional so nn.remat can mark it static.
        residual = x
        h = _DilatedConv(self.channels, self.kernel_size, self.dilation,
                         self.causal, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(h)
        if self.use_film:
            g1, b1, g2, b2 = film
            h = g1[:, None, :] * h + b1[:, None, :]
            h = nn.leaky_relu(h, 0.2)
            h = _DilatedConv(self.channels, self.kernel_size, self.dilation,
                             self.causal, name="conv2")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name="bn2")(h)
            h = g2[:, None, :] * h + b2[:, None, :]
            h = nn.leaky_relu(h, 0.2)
            return h + residual
        else:
            h = nn.leaky_relu(h, 0.2)
            h = _DilatedConv(self.channels, self.kernel_size, self.dilation,
                             self.causal, name="conv2")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name="bn2")(h)
            # ref ResidualBlock applies the activation to (h + residual)
            return nn.leaky_relu(h + residual, 0.2)


class TCNMixer(nn.Module):
    """TCN over (B, T, 8) audio (ref: tcn_mixer.py:219-321).

    ``film`` (when cfg.use_film): tuple of 4 arrays (B, num_blocks, H) =
    (gamma1, beta1, gamma2, beta2), typically from :class:`TCNFiLMGenerator`.
    """

    cfg: TCNConfig

    @nn.compact
    def __call__(self, x, film=None, *, train: bool = False):
        c = self.cfg
        if c.use_film and film is None:
            raise ValueError("film params required when use_film=True")
        h = nn.Conv(c.hidden_channels, (1,), name="input_conv")(x)
        # remat: recompute block activations in the backward pass instead of
        # storing them — at 10 s / 44.1 kHz each block holds a (B, 441k, H)
        # activation, and without remat the style-transfer train step wants
        # ~56 GB of HBM (jax.checkpoint trades those for FLOPs; the MXU has
        # them to spare)
        # static_argnums indexes the remat-traced (module, x, film, train)
        Block = nn.remat(TCNBlock, static_argnums=(3,)) if c.remat else TCNBlock
        for i in range(c.num_blocks):
            blk_film = None
            if c.use_film:
                blk_film = tuple(f[:, i, :] for f in film)
            h = Block(
                c.hidden_channels, c.kernel_size, 2**i, c.causal,
                c.use_film, name=f"block_{i}",
            )(h, blk_film, train)
        out = nn.Conv(
            c.in_channels, (1,),
            kernel_init=nn.initializers.normal(1e-3),
            bias_init=nn.initializers.zeros,
            name="output_conv",
        )(h)
        return out + x  # global residual: near-identity at init

    @property
    def receptive_field(self) -> int:
        return self.cfg.receptive_field


class TCNFiLMGenerator(nn.Module):
    """concat(input_emb, target_emb) -> per-block FiLM params
    (ref: tcn_mixer.py:148-216).  Returns (gamma1, beta1, gamma2, beta2),
    each (B, num_blocks, hidden_channels)."""

    cfg: TCNConfig

    @nn.compact
    def __call__(self, concat_embeddings, *, train: bool = False):
        c = self.cfg
        init = nn.initializers.normal(0.01)
        h = nn.Dense(c.film_hidden_dim, kernel_init=init,
                     bias_init=nn.initializers.zeros, name="fc1")(concat_embeddings)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Dropout(0.1, deterministic=not train)(h)
        h = nn.Dense(c.film_hidden_dim, kernel_init=init,
                     bias_init=nn.initializers.zeros, name="fc2")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Dropout(0.1, deterministic=not train)(h)
        out = nn.Dense(c.num_blocks * 4 * c.hidden_channels, kernel_init=init,
                       bias_init=nn.initializers.zeros, name="fc3")(h)
        out = out.reshape(-1, c.num_blocks, 4, c.hidden_channels)
        return out[:, :, 0], out[:, :, 1], out[:, :, 2], out[:, :, 3]


def create_tcn_config(
    receptive_field_seconds: float = 5.2,
    sample_rate: int = 44100,
    use_film: bool = False,
    hidden_channels: int = 8,
    kernel_size: int = 15,
    causal: bool = False,
    film_embed_dim: int = 1536,
) -> TCNConfig:
    """Solve num_blocks for a target receptive field, clamped to [6, 16]
    (ref: tcn_mixer.py:357-400)."""
    target = int(receptive_field_seconds * sample_rate)
    n = math.ceil(math.log2((target - 1) / (kernel_size - 1) + 1))
    n = max(6, min(n, 16))
    return TCNConfig(
        in_channels=8,
        hidden_channels=hidden_channels,
        num_blocks=n,
        kernel_size=kernel_size,
        causal=causal,
        use_film=use_film,
        film_embed_dim=film_embed_dim,
    )
