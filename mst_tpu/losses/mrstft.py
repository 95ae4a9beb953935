"""Multi-resolution STFT loss (ref: src/loss.py:332-448).

Spectral convergence (Frobenius ratio) + log-magnitude L1 at FFT sizes
{1024, 2048, 512} / hops {256, 512, 128}, averaged.  Used for style-transfer
cycle consistency (ref: train_style_transfer.py:229-249).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mst_tpu.ops.stft import stft

DEFAULT_RESOLUTIONS = ((1024, 256), (2048, 512), (512, 128))


def multi_resolution_stft_loss(
    x: jax.Array,
    y: jax.Array,
    resolutions=DEFAULT_RESOLUTIONS,
    per_item: bool = False,
) -> jax.Array:
    """x, y: (..., T) predicted / target audio (any leading batch dims).

    ``per_item=True`` computes the spectral-convergence ratio per leading
    item (Frobenius norms over each item's own (F, frames) plane) instead of
    one global ratio — quiet items then count equally instead of being
    drowned by loud ones (used by the balanced separation loss)."""
    total = 0.0
    for n_fft, hop in resolutions:
        xs = stft(x, n_fft, hop)
        ys = stft(y, n_fft, hop)
        x_mag = jnp.abs(xs)
        y_mag = jnp.abs(ys)
        if per_item:
            num = jnp.linalg.norm(y_mag - x_mag, axis=(-2, -1))
            den = jnp.linalg.norm(y_mag, axis=(-2, -1))
            sc = jnp.mean(num / (den + 1e-2))
        else:
            # Frobenius norm over the whole tensor, as torch.norm(p='fro') does
            sc = jnp.linalg.norm((y_mag - x_mag).ravel()) / (
                jnp.linalg.norm(y_mag.ravel()) + 1e-8
            )
        log_mag = jnp.mean(jnp.abs(jnp.log(x_mag + 1e-5) - jnp.log(y_mag + 1e-5)))
        total = total + sc + log_mag
    return total / len(resolutions)
