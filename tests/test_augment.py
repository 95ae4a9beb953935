"""On-device augmentation chain tests (ref semantics: mixing_utils.py:364-479)."""

import numpy as np

import jax
import jax.numpy as jnp

from mst_tpu.augment import AugmentConfig, augment_stems


def _stems(rng, B=2, T=16384):
    return jnp.asarray(rng.standard_normal((B, 4, 2, T)).astype(np.float32) * 0.3)


def test_prob_zero_is_identity(rng):
    x = _stems(rng)
    y = augment_stems(jax.random.key(0), x, AugmentConfig(prob=0.0))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_prob_one_changes_everything(rng):
    x = _stems(rng)
    y = augment_stems(jax.random.key(0), x, AugmentConfig(prob=1.0))
    assert y.shape == x.shape
    assert bool(jnp.isfinite(y).all())
    diff = np.abs(np.asarray(y) - np.asarray(x)).max(axis=(-2, -1))
    assert (diff > 1e-4).all()  # every (batch, stem) degraded


def test_deterministic_per_key(rng):
    x = _stems(rng)
    y1 = augment_stems(jax.random.key(7), x, AugmentConfig(prob=0.7))
    y2 = augment_stems(jax.random.key(7), x, AugmentConfig(prob=0.7))
    y3 = augment_stems(jax.random.key(8), x, AugmentConfig(prob=0.7))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    assert not np.allclose(np.asarray(y1), np.asarray(y3))


def test_jit_and_unbatched(rng):
    x = _stems(rng)[0]  # (4, 2, T)
    f = jax.jit(lambda k, s: augment_stems(k, s, AugmentConfig(prob=0.5)))
    y = f(jax.random.key(0), x)
    assert y.shape == x.shape


def test_compression_reduces_crest(rng):
    """Compression should reduce peak-to-rms ratio of loud material."""
    cfg = AugmentConfig(prob=0.0)
    from mst_tpu.augment.chain import _compress

    x = jnp.asarray(rng.standard_normal((2, 16384)).astype(np.float32))
    y = _compress(x, cfg.comp_threshold_db, cfg.comp_ratio)
    crest = lambda a: float(jnp.max(jnp.abs(a)) / jnp.sqrt(jnp.mean(a**2)))
    assert crest(y) < crest(x)


def test_bandlimit_kills_high_freq(rng):
    """Force bandlimiting; high-frequency energy must drop."""
    t = np.arange(16384) / 44100.0
    hf = np.sin(2 * np.pi * 15000 * t).astype(np.float32)
    x = jnp.asarray(np.broadcast_to(hf, (1, 4, 2, 16384)).copy())
    cfg = AugmentConfig(prob=1.0, gain_range_db=0.0, reverb_wet=0.0,
                        comp_ratio=1.0000001)
    # run several keys; bandlimit applies w.p. 1 -> energy above 12 kHz gone
    y = augment_stems(jax.random.key(3), x, cfg)
    def hf_energy(sig):
        spec = np.abs(np.fft.rfft(np.asarray(sig)[0, 0, 0]))
        freqs = np.fft.rfftfreq(16384, 1 / 44100)
        return spec[freqs > 13000].sum()
    assert hf_energy(y) < 0.1 * hf_energy(x)
