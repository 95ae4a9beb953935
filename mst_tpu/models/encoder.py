"""Band-split CNN mixing-style encoder with FiLM conditioning.

Re-design of the reference encoder stack (ref: src/model.py:17-542) as
flax modules, TPU-first:

- Stems are one array ``(B, 4, 2, T)``; the mel front-end produces NHWC
  ``(B, n_mels, frames, 8)`` so convolutions run channel-last (the layout
  XLA:TPU prefers).
- The reference loops its ``n_subbands`` per-band CNNs sequentially
  (ref: model.py:345-362).  Here one ``SubBandCNN`` is ``nn.vmap``-ped over
  a stacked band axis — per-band parameters are stacked on axis 0 and the
  whole band ensemble runs as single batched convolutions on the MXU.
- FiLM parameters are dense tensors ``(B, n_subbands, C)`` instead of
  string-keyed dicts (ref: model.py:447-464).

Semantics preserved exactly: band extraction offsets (overlap * i while
overlap*i <= n_mels - split_size, model.py:257-261), conv(k7, SAME) + BN +
FiLM + ReLU + MaxPool((sub,5)/(4,4)) + Dropout(0.3) blocks (model.py:97-157),
channelxfreq flatten then temporal attention pooling (model.py:160-211,
364-375), log(mel + 1e-10) front-end (model.py:65).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mst_tpu.config import EncoderConfig
from mst_tpu.ops.mel import mel_spectrogram


class MelFrontend(nn.Module):
    """Stems (B, 4, 2, T) -> log-mel (B, n_mels, frames, 8) [NHWC].

    Channel order matches the reference's stacking [voc_L, voc_R, bass_L,
    bass_R, drums_L, drums_R, other_L, other_R] (ref: model.py:52-62).
    """

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, stems: jax.Array, mel_pow: jax.Array | None = None) -> jax.Array:
        a = self.cfg.audio
        B, S = stems.shape[:2]
        if mel_pow is None:
            mel_pow = mel_spectrogram(
                stems, a.sample_rate, a.n_fft, a.hop_length, a.n_mels,
                power=2.0, method=getattr(a, "mel_method", "rfft"),
            )  # (B, 4, 2, M, F)
        mel = jnp.log(mel_pow + 1e-10)
        mel = mel.reshape(B, S * 2, a.n_mels, -1)  # (B, 8, M, F)
        return jnp.transpose(mel, (0, 2, 3, 1))  # NHWC


class SubBandCNN(nn.Module):
    """Two conv blocks over one sub-band (ref: model.py:97-157).

    Input (B, split, T, C_in) NHWC; output (B, H', W', out_channels).
    """

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, gamma1, beta1, gamma2, beta2, train: bool = False):
        # NOTE: ``train`` is positional — nn.vmap drops keyword arguments.
        c = self.cfg
        dt = jnp.dtype(c.compute_dtype)
        x = nn.Conv(c.cnn_mid_channels, (7, 7), padding="SAME", dtype=dt,
                    name="conv1")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=dt, name="bn1",
        )(x)
        if gamma1 is not None:
            x = gamma1[:, None, None, :] * x + beta1[:, None, None, :]
        x = nn.relu(x)
        x = nn.max_pool(
            x, (c.sub_pool, 5), strides=(c.sub_pool, 5), padding="VALID"
        )
        x = nn.Dropout(c.dropout, deterministic=not train)(x)

        x = nn.Conv(c.cnn_out_channels, (7, 7), padding="SAME", dtype=dt,
                    name="conv2")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=dt, name="bn2",
        )(x)
        if gamma2 is not None:
            x = gamma2[:, None, None, :] * x + beta2[:, None, None, :]
        x = nn.relu(x)
        x = nn.max_pool(x, (4, 4), strides=(4, 4), padding="VALID")
        x = nn.Dropout(c.dropout, deterministic=not train)(x)
        return x


class AttentionPooling(nn.Module):
    """Temporal attention pooling (ref: model.py:160-211).

    (B, T, C) -> (B, output_dim): softmax(MLP(x)) weights over T, weighted
    sum, then Linear+ReLU+Dropout projection.
    """

    hidden_dim: int
    output_dim: int
    dropout: float = 0.3

    def setup(self):
        self.attn_in = nn.Dense(self.hidden_dim, name="attn_in")
        self.attn_out = nn.Dense(1, name="attn_out")
        self.proj = nn.Dense(self.output_dim, name="proj")
        self.drop = nn.Dropout(self.dropout)

    def attention_weights(self, x: jax.Array) -> jax.Array:
        scores = self.attn_out(jnp.tanh(self.attn_in(x)))  # (B, T, 1)
        return jax.nn.softmax(scores, axis=1)

    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        weights = self.attention_weights(x)
        pooled = jnp.sum(x * weights, axis=1)  # (B, C)
        out = nn.relu(self.proj(pooled))
        return self.drop(out, deterministic=not train)


class BandSplitEncoder(nn.Module):
    """Band-split CNN over 8-channel log-mels (ref: model.py:214-382).

    The per-band CNN ensemble is vmapped: parameters get a leading
    (n_subbands,) axis, and all bands are processed as one batched conv.
    """

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, stems, film=None, *, train: bool = False,
                 mel_pow=None):
        c = self.cfg
        x = MelFrontend(c, name="mel")(stems, mel_pow)  # (B, M, F, 8)
        B = x.shape[0]

        # extract overlapping bands -> (B, nb, split, F, 8)
        starts = [i * c.overlap for i in range(c.n_subbands)]
        bands = jnp.stack(
            [x[:, s : s + c.split_size] for s in starts], axis=1
        )

        if film is None:
            g1 = b1 = jnp.zeros((B, c.n_subbands, c.cnn_mid_channels))
            g2 = b2 = jnp.zeros((B, c.n_subbands, c.cnn_out_channels))
            g1 = g1 + 1.0
            g2 = g2 + 1.0
        else:
            g1, b1, g2, b2 = film

        BandEnsemble = nn.vmap(
            SubBandCNN,
            in_axes=(1, 1, 1, 1, 1, None),
            out_axes=1,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True, "dropout": True},
            methods=["__call__"],
        )
        feats = BandEnsemble(c, name="bands")(
            bands, g1, b1, g2, b2, train
        )  # (B, nb, H', W', C_out)
        feats = feats.astype(jnp.float32)  # pooling/projection stay f32

        # flatten (band, freq, channel) -> feature axis, keep time
        _, nb, Hp, Wp, Cout = feats.shape
        # reference layout: concat bands on channel axis then reshape
        # (B, nb*C, F', T') -> (B, nb*C*F', T'); replicate that exact order
        feats = jnp.transpose(feats, (0, 1, 4, 2, 3))  # (B, nb, C, H', W')
        feats = feats.reshape(B, nb * Cout * Hp, Wp)
        feats = jnp.transpose(feats, (0, 2, 1))  # (B, T', features)

        return AttentionPooling(
            hidden_dim=c.attn_hidden_dim,
            output_dim=c.embed_dim,
            dropout=c.dropout,
            name="attention_pooling",
        )(feats, train=train)


class MixingFeatureEncoder(nn.Module):
    """Mixing features -> FiLM parameters (ref: model.py:385-464).

    Returns dense (B, n_subbands, C) tensors (gamma1, beta1, gamma2, beta2)
    instead of a string-keyed dict; parse order per band matches the
    reference slicing g1(32) b1(32) g2(64) b2(64) (model.py:447-464).
    """

    cfg: EncoderConfig
    mlp_dropout: float = 0.2

    @nn.compact
    def __call__(self, features: jax.Array, *, train: bool = False):
        c = self.cfg
        h = nn.Dense(c.film_hidden_dim, name="mlp1")(features)
        h = nn.relu(h)
        h = nn.Dropout(self.mlp_dropout, deterministic=not train)(h)
        h = nn.Dense(c.film_hidden_dim, name="mlp2")(h)
        h = nn.relu(h)

        mid, out = c.cnn_mid_channels, c.cnn_out_channels
        per_band = 2 * mid + 2 * out
        flat = nn.Dense(c.n_subbands * per_band, name="film_head")(h)
        flat = flat.reshape(-1, c.n_subbands, per_band)
        g1 = flat[..., :mid]
        b1 = flat[..., mid : 2 * mid]
        g2 = flat[..., 2 * mid : 2 * mid + out]
        b2 = flat[..., 2 * mid + out :]
        return g1, b1, g2, b2


class MixingStyleEncoder(nn.Module):
    """Full encoder: FiLM generator + band-split encoder (ref: model.py:467-542)."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, stems, mixing_features, *, train: bool = False,
                 mel_pow=None):
        film = MixingFeatureEncoder(self.cfg, name="film_encoder")(
            mixing_features, train=train
        )
        return BandSplitEncoder(self.cfg, name="audio_encoder")(
            stems, film, train=train, mel_pow=mel_pow
        )
