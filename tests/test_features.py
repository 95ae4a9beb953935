"""Mixing-feature extractor parity vs the torch oracle (reference formulas)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mst_tpu.config import AudioConfig, FeatureConfig
from mst_tpu.features import extract_mixing_features, feature_dim, FEATURE_ORDER
from tests.reference_features import RefFeatureExtractor, STEMS


def _make_stems(rng, T=44100 * 2, scale=(0.3, 0.5, 0.4, 0.2)):
    """Synthetic 4-stem stereo clip with distinct per-stem character."""
    t = np.arange(T) / 44100.0
    vocals = np.stack([np.sin(2 * np.pi * 440 * t), np.sin(2 * np.pi * 442 * t)])
    bass = np.stack([np.sin(2 * np.pi * 60 * t)] * 2)
    drums = rng.standard_normal((2, T)) * np.exp(-((t * 4) % 1) * 8)
    other = rng.standard_normal((2, T)) * 0.5 + np.sin(2 * np.pi * 1000 * t)
    stems = np.stack([vocals, bass, drums, other]).astype(np.float32)
    return stems * np.asarray(scale, np.float32)[:, None, None]


@pytest.fixture(scope="module")
def stems(rng):
    return _make_stems(rng)


def test_feature_dim():
    assert feature_dim() == 64
    assert len(FEATURE_ORDER) == 17  # 4 stems x 4 blocks + masking


@pytest.mark.parametrize("cfgname", ["default", "trained"])
def test_features_match_reference(stems, cfgname):
    if cfgname == "default":
        audio = AudioConfig(n_fft=1024, hop_length=256, n_mels=128)
    else:
        audio = AudioConfig(n_fft=2048, hop_length=512, n_mels=80)
    cfg = FeatureConfig(audio=audio)

    ref = RefFeatureExtractor(44100, audio.n_fft, audio.hop_length, audio.n_mels)
    stems_dict = {name: torch.from_numpy(stems[i]) for i, name in enumerate(STEMS)}
    expected = ref.extract(stems_dict)

    got = np.asarray(extract_mixing_features(jnp.asarray(stems), cfg))
    assert got.shape == (64,)
    np.testing.assert_allclose(got, expected, atol=2e-3, rtol=1e-3)


def test_features_detailed_spectral_matches_reference(stems):
    """Detailed mode: n_spectral_bins curve + tilt + flatness
    (ref: mixing_utils.py:202-236)."""
    audio = AudioConfig(n_fft=1024, hop_length=256, n_mels=128)
    cfg = FeatureConfig(audio=audio, use_detailed_spectral=True,
                        n_spectral_bins=32)
    assert cfg.feature_dim == 4 * (6 + 34 + 3) + 8  # 180

    ref = RefFeatureExtractor(44100, 1024, 256, 128,
                              use_detailed_spectral=True, n_spectral_bins=32)
    stems_dict = {name: torch.from_numpy(stems[i]) for i, name in enumerate(STEMS)}
    expected = ref.extract(stems_dict)

    got = np.asarray(extract_mixing_features(jnp.asarray(stems), cfg))
    assert got.shape == (cfg.feature_dim,)
    # curve entries are dB values down to ~-100; near the log floor the jnp
    # and torch STFT accumulation orders differ by ~0.1 dB
    np.testing.assert_allclose(got, expected, atol=0.2, rtol=1e-3)


def test_features_batched(stems, rng):
    cfg = FeatureConfig(audio=AudioConfig(n_fft=1024, hop_length=256, n_mels=128))
    batch = np.stack([stems, _make_stems(rng, scale=(0.1, 0.9, 0.2, 0.6))])
    got = np.asarray(extract_mixing_features(jnp.asarray(batch), cfg))
    assert got.shape == (2, 64)
    single0 = np.asarray(extract_mixing_features(jnp.asarray(batch[0]), cfg))
    np.testing.assert_allclose(got[0], single0, atol=1e-5)


def test_features_silent_audio_finite():
    """All-silent stems: NaN -> 0 / clamping semantics (ref: mixing_utils.py:337-356)."""
    cfg = FeatureConfig()
    feats = np.asarray(extract_mixing_features(jnp.zeros((4, 2, 44100)), cfg))
    assert np.isfinite(feats).all()
    assert (np.abs(feats) <= 100.0).all()


def test_features_differentiable(stems):
    """Gradients flow for per-pair TCN optimization (ref: test_tcn_style_transfer.py:84-201)."""
    cfg = FeatureConfig(audio=AudioConfig(n_fft=1024, hop_length=256, n_mels=128))
    x = jnp.asarray(stems[..., :16384])

    def loss(s):
        return jnp.sum(extract_mixing_features(s, cfg) ** 2)

    g = jax.grad(loss)(x)
    assert g.shape == x.shape
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0


def test_features_jit_and_constant_input(stems):
    cfg = FeatureConfig()
    f = jax.jit(lambda s: extract_mixing_features(s, cfg))
    # constant (DC) stems trigger the flat-spectrum tilt guard
    const = jnp.ones((4, 2, 44100)) * 0.1
    feats = f(const)
    assert bool(jnp.isfinite(feats).all())
