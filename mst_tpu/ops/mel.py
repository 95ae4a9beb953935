"""Mel filterbank and mel spectrogram matching torchaudio defaults.

torchaudio.transforms.MelSpectrogram defaults replicated (ref:
src/model.py:33-39, src/mixing_utils.py:45-51): HTK mel scale
(m = 2595 log10(1 + f/700)), f_min=0, f_max=sr/2, triangular filters,
``norm=None``, power=2.0 spectrogram.

The mel projection is a single (freq, n_mels) matmul over the stacked
(batch*channel*frame, freq) power spectrogram — MXU-friendly by
construction; XLA fuses the log into the matmul epilogue.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mst_tpu.ops.stft import spectrogram


def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


@functools.lru_cache(maxsize=32)
def _mel_fb_np(n_freqs: int, n_mels: int, sample_rate: int,
               f_min: float = 0.0, f_max: float | None = None) -> np.ndarray:
    """(n_freqs, n_mels) triangular HTK filterbank, torchaudio layout."""
    f_max = f_max if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0.0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(_hz_to_mel(np.array(f_min)), _hz_to_mel(np.array(f_max)), n_mels + 2)
    f_pts = _mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def mel_filterbank(n_freqs: int, n_mels: int, sample_rate: int,
                   f_min: float = 0.0, f_max: float | None = None) -> jax.Array:
    return jnp.asarray(_mel_fb_np(n_freqs, n_mels, sample_rate, f_min, f_max))


def mel_spectrogram(
    x: jax.Array,
    sample_rate: int,
    n_fft: int,
    hop_length: int,
    n_mels: int,
    power: float = 2.0,
    method: str = "rfft",
) -> jax.Array:
    """Mel spectrogram of ``x`` (..., T) -> (..., n_mels, num_frames).

    ``method='gemm'`` computes the DFT as MXU matmuls (~2x faster on TPU,
    quiet-bin bf16 noise; see ops.stft.spectrogram_gemm)."""
    if method == "gemm":
        from mst_tpu.ops.stft import spectrogram_gemm

        spec = spectrogram_gemm(x, n_fft, hop_length, power=power)
    else:
        spec = spectrogram(x, n_fft, hop_length, power=power)  # (..., freq, F)
    fb = mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate)
    # (..., freq, F) x (freq, n_mels) -> (..., n_mels, F)
    mel = jnp.einsum("...ft,fm->...mt", spec, fb)
    return mel


def log_mel_spectrogram(
    x: jax.Array,
    sample_rate: int,
    n_fft: int,
    hop_length: int,
    n_mels: int,
    eps: float = 1e-10,
    log_fn: str = "ln",
) -> jax.Array:
    """log(mel + eps).  ``log_fn='ln'`` is the encoder front-end
    (ref: model.py:65); ``'db'`` is 10*log10 used by the feature extractor
    (ref: mixing_utils.py:160)."""
    mel = mel_spectrogram(x, sample_rate, n_fft, hop_length, n_mels)
    if log_fn == "ln":
        return jnp.log(mel + eps)
    elif log_fn == "db":
        return 10.0 * jnp.log10(mel + eps)
    raise ValueError(f"unknown log_fn {log_fn}")
