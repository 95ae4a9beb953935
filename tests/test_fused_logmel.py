"""Fully-fused Pallas log-mel kernel parity (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mst_tpu.ops.mel import log_mel_spectrogram
from mst_tpu.ops.pallas_kernels import fused_logmel


@pytest.mark.parametrize("n_fft,hop,n_mels", [(512, 128, 64), (2048, 512, 80)])
def test_fused_logmel_matches_reference(n_fft, hop, n_mels):
    rng = np.random.default_rng(2024)  # self-seeded: order-independent
    x = rng.standard_normal((2, 3, 44100)).astype(np.float32) * 0.3
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(x), 44100, n_fft, hop, n_mels))
    got = np.asarray(
        fused_logmel(jnp.asarray(x), 44100, n_fft, hop, n_mels, interpret=True)
    )
    assert got.shape == ref.shape
    # the kernel's DFT runs in true bf16 (same rounding XLA uses on TPU for
    # f32 matmuls); near the log floor that shows as ~0.2 log-units on a
    # handful of near-silent bins
    diff = np.abs(got - ref)
    assert np.quantile(diff, 0.995) < 2e-2  # overwhelming majority tight
    assert diff.max() < 0.5  # worst case bounded (near-null cancellation)
    # global agreement: downstream embeddings are insensitive at this level
    a, b = got.ravel(), ref.ravel()
    cos = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.99999


def test_fused_logmel_1d(rng):
    x = rng.standard_normal((22050,)).astype(np.float32)
    got = fused_logmel(jnp.asarray(x), 44100, 1024, 256, 128, interpret=True)
    assert got.shape == (128, 1 + 22050 // 256)


def test_fused_logmel_rejects_bad_hop():
    with pytest.raises(ValueError):
        fused_logmel(jnp.zeros(4096), 44100, 1000, 300, 64, interpret=True)
