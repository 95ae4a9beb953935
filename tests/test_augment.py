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


def _scipy_oracle(x, cfg, dec):
    """Reference AudioAugmenter re-derived in numpy/scipy with pinned
    decisions (ref: mixing_utils.py:364-479): exact IIR sosfilt where the
    chain uses the truncated-FIR approximation."""
    from scipy.signal import butter, sosfilt

    x = np.array(x, np.float64)
    B, S, C, T = x.shape
    sos_hi = butter(2, cfg.tilt_high_cutoff, btype="high", fs=cfg.sample_rate,
                    output="sos")
    sos_lo = butter(2, cfg.tilt_low_cutoff, btype="low", fs=cfg.sample_rate,
                    output="sos")
    for b in range(B):
        for s in range(S):
            a = x[b, s]
            if dec["apply_gain"][b, s]:
                a = a * 10.0 ** (dec["gain_db"][b, s] / 20.0)
            if dec["apply_tilt"][b, s]:
                a = sosfilt(sos_hi if dec["use_high"][b, s] else sos_lo, a,
                            axis=-1)
            if dec["apply_comp"][b, s]:
                db = 20 * np.log10(np.abs(a) + 1e-8)
                cdb = np.where(db > cfg.comp_threshold_db,
                               cfg.comp_threshold_db
                               + (db - cfg.comp_threshold_db) / cfg.comp_ratio,
                               db)
                a = np.sign(a) * 10.0 ** (cdb / 20.0)
            if dec["apply_band"][b, s]:
                sos = butter(4, float(dec["cutoffs"][b, s]), btype="low",
                             fs=cfg.sample_rate, output="sos")
                a = sosfilt(sos, a, axis=-1)
            x[b, s] = a
    imp = np.asarray(dec["impulse"], np.float64)
    K = imp.shape[0]
    p = K // 2
    for b in range(B):
        if not dec["apply_reverb"][b]:
            continue
        mix = x[b].sum(axis=0)  # (2, T)
        # torch F.conv1d(padding=K//2) = cross-correlation, crop to T
        # (ref: mixing_utils.py:466-479)
        wet = np.stack([
            np.correlate(np.pad(ch, (p, p)), imp, mode="valid")[:T]
            for ch in mix
        ])
        mix_rev = mix * (1 - cfg.reverb_wet) + wet * cfg.reverb_wet
        energies = (x[b] ** 2).mean(axis=(-2, -1))
        prop = energies / (energies.sum() + 1e-8)
        x[b] = x[b] + mix_rev[None] * prop[:, None, None] * cfg.reverb_wet
    return x.astype(np.float32)


def test_full_chain_matches_scipy_oracle(rng):
    """End-to-end golden test: pinned decisions through the jnp chain ==
    the scipy/numpy re-derivation of the reference chain, to within the
    documented FIR truncation error."""
    B, T = 2, 16384
    x = _stems(rng, B=B, T=T)
    cfg = AugmentConfig()
    r = np.random.default_rng(99)
    dec = {
        "apply_gain": r.random((B, 4)) < 0.5,
        "gain_db": r.uniform(-9, 9, (B, 4)).astype(np.float32),
        "apply_tilt": r.random((B, 4)) < 0.5,
        "use_high": r.random((B, 4)) < 0.5,
        "apply_comp": r.random((B, 4)) < 0.5,
        "apply_band": r.random((B, 4)) < 0.5,
        "cutoffs": r.uniform(4000, 12000, (B, 4)).astype(np.float32),
        "apply_reverb": np.array([True, False]),
        "impulse": (np.exp(-np.linspace(0, 0.5, 22050) / 0.125)
                    * r.standard_normal(22050) * 0.1).astype(np.float32),
    }
    # every augmentation exercised at least once
    for k in ("apply_gain", "apply_tilt", "apply_comp", "apply_band"):
        dec[k].flat[0] = True
    y = np.asarray(augment_stems(None, x, cfg, decisions=dec))
    ref = _scipy_oracle(np.asarray(x), cfg, dec)
    np.testing.assert_allclose(y, ref, rtol=1e-3, atol=2e-4)


def test_fir_truncation_tail_is_negligible():
    """Quantify the 4096-tap truncation of the slowest-decaying filter in
    the chain (order-2 low-pass @500 Hz): relative tail energy must be
    far below float32 noise, so sosfilt_fir == sosfilt for our purposes."""
    from scipy.signal import butter, sosfilt

    sos = butter(2, 500, btype="low", fs=44100, output="sos")
    imp = np.zeros(1 << 18)
    imp[0] = 1.0
    h = sosfilt(sos, imp)
    tail = float((h[4096:] ** 2).sum() / (h ** 2).sum())
    assert tail < 1e-12, tail  # measured ~0: IR decays in ~2k samples


def test_bandlimit_kills_hf():
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
