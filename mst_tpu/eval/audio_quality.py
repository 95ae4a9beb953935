"""Audio quality metrics for transfer evaluation
(ref: src/style_transfer_eval.py:233-275).

The reference's evaluator wraps the external st-ito/pedalboard/pyloudnorm
stack; the QA metrics themselves (integrated LUFS, RMS dB, crest factor,
spectral centroid) are reimplemented here in jnp, including a proper
BS.1770 K-weighting pre-filter (2-stage biquad) instead of pyloudnorm's —
the reference's *training* loudness stays the simplified version in
mst_tpu.features for parity.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from mst_tpu.ops.biquad import sosfilt_scan
from mst_tpu.ops.stft import spectrogram


def _k_weighting_sos(fs: float) -> jnp.ndarray:
    """BS.1770 K-weighting: shelving + high-pass biquads at sample rate fs."""
    # stage 1: high-shelf (pre-filter), BS.1770-4 table coefficients via
    # analog prototype bilinear transform
    db = 3.999843853973347
    f0 = 1681.974450955533
    Q = 0.7071752369554196
    K = np.tan(np.pi * f0 / fs)
    Vh = 10.0 ** (db / 20.0)
    Vb = Vh**0.4996667741545416
    a0 = 1.0 + K / Q + K * K
    b = np.array([
        (Vh + Vb * K / Q + K * K) / a0,
        2.0 * (K * K - Vh) / a0,
        (Vh - Vb * K / Q + K * K) / a0,
    ])
    a = np.array([1.0, 2.0 * (K * K - 1.0) / a0, (1.0 - K / Q + K * K) / a0])
    shelf = np.concatenate([b, a])

    f0 = 38.13547087602444
    Q = 0.5003270373238773
    K = np.tan(np.pi * f0 / fs)
    denom = 1.0 + K / Q + K * K
    b = np.array([1.0, -2.0, 1.0])
    a = np.array([
        1.0,
        2.0 * (K * K - 1.0) / denom,
        (1.0 - K / Q + K * K) / denom,
    ])
    hp = np.concatenate([b, a])
    return jnp.asarray(np.stack([shelf, hp]), jnp.float32)


def integrated_lufs(audio: jax.Array, sample_rate: int = 44100) -> jax.Array:
    """BS.1770 integrated loudness (without gating blocks shorter than the
    clip) of (..., C, T) audio."""
    sos = _k_weighting_sos(sample_rate)
    w = sosfilt_scan(sos, audio)
    ms = jnp.mean(w**2, axis=-1)  # (..., C)
    loud = -0.691 + 10.0 * jnp.log10(jnp.sum(ms, axis=-1) + 1e-12)
    return loud


def rms_db(audio: jax.Array) -> jax.Array:
    return 20.0 * jnp.log10(jnp.sqrt(jnp.mean(audio**2, axis=(-2, -1))) + 1e-12)


def crest_factor_db(audio: jax.Array) -> jax.Array:
    peak = jnp.max(jnp.abs(audio), axis=(-2, -1))
    rms = jnp.sqrt(jnp.mean(audio**2, axis=(-2, -1)))
    return 20.0 * jnp.log10(peak / (rms + 1e-12) + 1e-12)


def spectral_centroid_hz(audio: jax.Array, sample_rate: int = 44100,
                         n_fft: int = 2048, hop: int = 512) -> jax.Array:
    mag = spectrogram(audio, n_fft, hop, power=1.0)  # (..., C, F, T)
    freqs = jnp.linspace(0.0, sample_rate / 2.0, mag.shape[-2])
    num = jnp.sum(mag * freqs[:, None], axis=-2)
    cent = num / (jnp.sum(mag, axis=-2) + 1e-12)
    return jnp.mean(cent, axis=(-2, -1))


@functools.lru_cache(maxsize=8)
def _report_fn(sample_rate: int):
    # one jitted program per sample rate: eager per-primitive dispatch is
    # pathologically slow on the remote-compile axon backend (and eager
    # scans can be UNIMPLEMENTED there outright)
    @jax.jit
    def report(audio):
        return (integrated_lufs(audio, sample_rate), rms_db(audio),
                crest_factor_db(audio),
                spectral_centroid_hz(audio, sample_rate))

    return report


def audio_quality_report(audio: jax.Array, sample_rate: int = 44100) -> dict:
    """All QA metrics for (C, T) audio -> python floats
    (ref layout: style_transfer_eval.py:233-275)."""
    lufs, rms, crest, cent = _report_fn(int(sample_rate))(audio)
    return {
        "lufs": float(lufs),
        "rms_db": float(rms),
        "crest_factor_db": float(crest),
        "spectral_centroid_hz": float(cent),
    }
