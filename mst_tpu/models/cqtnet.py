"""CQTNet song-identity embedder (Discogs-VINet configuration).

The reference extracts 512-d song-identity embeddings with the external
Discogs-VINet CQTNet (ref: scripts/extract_song_identity_embeddings.py:37-58
— ch_in=40, ch_out=512, norm='bn', pool='adaptive_max', l2_normalize=True,
projection='linear'); the submodule carrying the architecture is not
vendored in the reference checkout.  This is the published CQTNet topology
(Yu et al. 2020, "Learning a Representation for Cover Song Identification
Using CNN") with Discogs-VINet's configurable base width:

    conv0  1   -> c    (12,3) dil (1,1) pad (6,0)
    conv1  c   -> 2c   (13,3) dil (1,2)         + maxpool (1,2) pad (0,1)
    conv2  2c  -> 2c   (13,3) dil (1,1)
    conv3  2c  -> 2c   (3,3)  dil (1,2)         + maxpool
    conv4  2c  -> 4c   (3,3)  dil (1,1)
    conv5  4c  -> 4c   (3,3)  dil (1,2)         + maxpool
    conv6  4c  -> 8c   (3,3)  dil (1,1)
    conv7  8c  -> 8c   (3,3)  dil (1,2)         + maxpool
    conv8  8c  -> 16c  (3,3)  dil (1,1)
    conv9  16c -> 16c  (3,3)  dil (1,2)
    adaptive max pool -> (16c,) -> linear -> ch_out, L2 normalize

every conv is bias-free and followed by BatchNorm + ReLU.  Inference-only
here (the weights come from a converted upstream checkpoint); inputs are
NHWC ``(B, n_bins, frames, 1)`` preprocessed CQTs
(cli/extract_song_identity.py:preprocess_cqt).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

# (kernel_h, kernel_w, dilation_w, out_channels multiple of ch_in, pool after)
_LAYERS = (
    (12, 3, 1, 1, False),
    (13, 3, 2, 2, True),
    (13, 3, 1, 2, False),
    (3, 3, 2, 2, True),
    (3, 3, 1, 4, False),
    (3, 3, 2, 4, True),
    (3, 3, 1, 8, False),
    (3, 3, 2, 8, True),
    (3, 3, 1, 16, False),
    (3, 3, 2, 16, False),
)


class CQTNet(nn.Module):
    """512-d L2-normalized song-identity embedding from a CQT image."""

    ch_in: int = 40     # base conv width (CONV_CHANNEL)
    ch_out: int = 512   # embedding size (EMBEDDING_SIZE)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """x: (B, n_bins, frames, 1) -> (B, ch_out)."""
        for i, (kh, kw, dw, mult, pool) in enumerate(_LAYERS):
            pad = [(6, 6), (0, 0)] if i == 0 else "VALID"
            x = nn.Conv(
                self.ch_in * mult, (kh, kw), kernel_dilation=(1, dw),
                padding=pad, use_bias=False, name=f"conv{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name=f"bn{i}",
            )(x)
            x = nn.relu(x)
            if pool:
                # torch MaxPool2d((1,2), stride (1,2), padding (0,1)):
                # W_out = floor(W/2) + 1
                x = nn.max_pool(x, (1, 2), strides=(1, 2),
                                padding=[(0, 0), (1, 1)])
        x = jnp.max(x, axis=(1, 2))  # adaptive max pool -> (B, 16c)
        x = nn.Dense(self.ch_out, name="projection")(x)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
