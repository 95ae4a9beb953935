"""Pallas kernel parity (interpret mode on CPU) vs the jnp reference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mst_tpu.ops.mel import mel_filterbank, log_mel_spectrogram
from mst_tpu.ops.pallas_kernels import logmel_from_stft, log_mel_frontend_pallas


def test_logmel_kernel_matches_reference(rng):
    rows, freq, n_mels = 300, 1025, 80
    re = rng.standard_normal((rows, freq)).astype(np.float32)
    im = rng.standard_normal((rows, freq)).astype(np.float32)
    fb = mel_filterbank(freq, n_mels, 44100)

    expected = np.log((re**2 + im**2) @ np.asarray(fb) + 1e-10)
    got = np.asarray(
        logmel_from_stft(jnp.asarray(re), jnp.asarray(im), fb, n_mels,
                         interpret=True)
    )
    assert got.shape == (rows, n_mels)
    np.testing.assert_allclose(got, expected, atol=1e-4, rtol=1e-4)


def test_logmel_frontend_matches_jnp_path(rng):
    x = rng.standard_normal((2, 22050)).astype(np.float32) * 0.3
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(x), 44100, 1024, 256, 128))
    got = np.asarray(
        log_mel_frontend_pallas(jnp.asarray(x), 44100, 1024, 256, 128,
                                interpret=True)
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)
