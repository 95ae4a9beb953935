"""GEMM-DFT spectrogram path: parity with the rfft path."""

import dataclasses

import numpy as np

import jax.numpy as jnp

from mst_tpu.config import AudioConfig, FeatureConfig
from mst_tpu.features import extract_mixing_features
from mst_tpu.ops.mel import mel_spectrogram
from mst_tpu.ops.stft import spectrogram, spectrogram_gemm


def test_spectrogram_gemm_matches_rfft(rng):
    x = jnp.asarray(rng.standard_normal((2, 22050)).astype(np.float32) * 0.3)
    a = np.asarray(spectrogram(x, 1024, 256))
    b = np.asarray(spectrogram_gemm(x, 1024, 256))
    assert a.shape == b.shape
    # on CPU both paths are exact f32; on TPU the GEMM uses bf16 passes
    np.testing.assert_allclose(b, a, atol=1e-3, rtol=1e-3)


def test_mel_method_flag(rng):
    x = jnp.asarray(rng.standard_normal((22050,)).astype(np.float32) * 0.3)
    a = np.asarray(mel_spectrogram(x, 44100, 1024, 256, 80, method="rfft"))
    b = np.asarray(mel_spectrogram(x, 44100, 1024, 256, 80, method="gemm"))
    np.testing.assert_allclose(b, a, atol=1e-3, rtol=1e-3)


def test_features_with_gemm_mel(rng):
    stems = jnp.asarray(rng.standard_normal((4, 2, 22050)).astype(np.float32) * 0.2)
    base = AudioConfig(n_fft=1024, hop_length=256, n_mels=128)
    f_r = extract_mixing_features(stems, FeatureConfig(audio=base))
    f_g = extract_mixing_features(
        stems, FeatureConfig(audio=dataclasses.replace(base, mel_method="gemm"))
    )
    np.testing.assert_allclose(np.asarray(f_g), np.asarray(f_r), atol=1e-2)
