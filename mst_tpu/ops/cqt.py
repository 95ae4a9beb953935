"""Constant-Q transform as one GEMM (for song-identity embeddings).

The reference computes CQT on CPU with librosa for the Discogs-VINet
song-identity pipeline (ref: scripts/extract_song_identity_embeddings.py:
113-119: 84 bins, hop 512, 22.05 kHz).  On TPU the CQT is a natural matmul:
frames (F, N) x complex CQT kernel (N, n_bins) -> (F, n_bins) — one MXU
call, no per-bin filterbanks.

Kernels are librosa-style: per-bin complex exponentials windowed with Hann,
length Q * sr / f_k (Q = 1/(2^(1/bins_per_octave) - 1)), zero-padded to a
common power-of-two frame, L1-normalized.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mst_tpu.ops.stft import frame_signal


@functools.lru_cache(maxsize=8)
def _cqt_kernel_np(
    sample_rate: int,
    n_bins: int = 84,
    bins_per_octave: int = 12,
    fmin: float = 32.703195,  # C1
) -> tuple[np.ndarray, int]:
    q = 1.0 / (2.0 ** (1.0 / bins_per_octave) - 1.0)
    freqs = fmin * 2.0 ** (np.arange(n_bins) / bins_per_octave)
    lengths = np.ceil(q * sample_rate / freqs).astype(int)
    n_frame = 1 << int(np.ceil(np.log2(lengths.max())))
    kernel = np.zeros((n_frame, n_bins), np.complex64)
    for k, (f, L) in enumerate(zip(freqs, lengths)):
        L = min(L, n_frame)
        t = np.arange(L)
        win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(L) / max(L - 1, 1))
        w = win * np.exp(2j * np.pi * f * t / sample_rate) / L
        start = (n_frame - L) // 2  # center the atom in the frame
        kernel[start : start + L, k] = w
    return kernel, n_frame


def cqt(
    x: jax.Array,
    sample_rate: int,
    hop_length: int = 512,
    n_bins: int = 84,
    bins_per_octave: int = 12,
    fmin: float = 32.703195,
) -> jax.Array:
    """Magnitude CQT of ``x`` (..., T) -> (..., n_bins, frames)."""
    kernel, n_frame = _cqt_kernel_np(sample_rate, n_bins, bins_per_octave, fmin)
    pad = n_frame // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = frame_signal(xp, n_frame, hop_length)  # (..., F, n_frame)
    kr = jnp.asarray(np.real(kernel))
    ki = jnp.asarray(np.imag(kernel))
    re = frames @ kr  # (..., F, n_bins)
    im = frames @ ki
    mag = jnp.sqrt(re**2 + im**2 + 1e-12)
    return jnp.swapaxes(mag, -1, -2)  # (..., n_bins, F)
