"""synth_v2 corpus tests: determinism, layout, and the properties that make
it *harder* than v1 — overlapping stem spectra and mixing style as a real
latent factor (round-2 verdict item 1)."""

import numpy as np

import jax
import jax.numpy as jnp

from mst_tpu.separation.synth_v2 import (
    apply_style,
    draw_style_params,
    interpolate_style,
    render_style,
    synth_batch_v2,
    synth_confuser_batch_v2,
    synth_dry_song,
    synth_two_crop_batch_v2,
)

SR = 8000.0
T = 8000


def test_shapes_finite_deterministic():
    f = jax.jit(lambda k: synth_batch_v2(k, 3, T, SR))
    x = f(jax.random.key(0))
    assert x.shape == (3, 4, 2, T)
    assert bool(jnp.isfinite(x).all())
    assert float(jnp.abs(x).max()) < 2.0  # sane levels
    np.testing.assert_array_equal(np.asarray(x), np.asarray(f(jax.random.key(0))))
    assert not np.allclose(np.asarray(x), np.asarray(f(jax.random.key(1))))


def test_two_crop_layout():
    stems, labels = jax.jit(
        lambda k: synth_two_crop_batch_v2(k, 3, T, SR))(jax.random.key(2))
    assert stems.shape == (6, 4, 2, T)
    np.testing.assert_array_equal(np.asarray(labels), [0, 0, 1, 1, 2, 2])
    # crops of one song differ (time progresses) but share the song/mix
    assert not np.allclose(np.asarray(stems[0]), np.asarray(stems[1]))


def test_spectral_overlap_between_stem_families():
    """v1's failure mode was disjoint stem bands; v2 stems must overlap:
    every stem puts non-trivial energy into the shared mid band."""
    x = np.asarray(jax.jit(lambda k: synth_batch_v2(k, 4, 2 * T, SR))(
        jax.random.key(3)))
    spec = np.abs(np.fft.rfft(x.mean(axis=2), axis=-1)) ** 2  # (B, 4, F)
    freqs = np.fft.rfftfreq(2 * T, 1 / SR)
    mid = (freqs >= 150) & (freqs < 2000)
    frac_mid = spec[..., mid].sum(-1) / np.maximum(spec.sum(-1), 1e-12)
    # averaged over songs, every family overlaps the mid band
    assert (frac_mid.mean(axis=0) > 0.05).all(), frac_mid.mean(axis=0)


def test_mixing_style_is_a_shared_latent():
    """The property stage-1 training needs: two crops rendered with the SAME
    style are closer in mixing-feature space than the same content rendered
    with a DIFFERENT style (style = the thing the encoder must embed)."""
    from mst_tpu.config import AudioConfig, FeatureConfig
    from mst_tpu.features import extract_mixing_features

    fcfg = FeatureConfig(audio=AudioConfig(
        sample_rate=int(SR), n_fft=256, hop_length=64, n_mels=32,
        clip_duration=T / SR))

    @jax.jit
    def feats_for(key):
        kd, ks1, ks2 = jax.random.split(key, 3)
        dry = synth_dry_song(kd, 2 * T, SR)
        same = render_style(ks1, dry, SR)          # one style, whole song
        other = render_style(ks2, dry[..., :T], SR)  # different style, crop A
        a = same[..., :T][None]
        b = same[..., T:][None]
        f = lambda s: extract_mixing_features(s, fcfg)[0]
        return f(a), f(b), f(other[None])

    d_same, d_diff = [], []
    for i in range(6):
        fa, fb, fo = (np.asarray(v) for v in feats_for(jax.random.key(100 + i)))
        scale = np.abs(fa) + np.abs(fb) + 1e-6
        d_same.append(np.mean(np.abs(fa - fb) / scale))
        d_diff.append(np.mean(np.abs(fa - fo) / (np.abs(fa) + np.abs(fo) + 1e-6)))
    assert np.mean(d_same) < np.mean(d_diff), (np.mean(d_same), np.mean(d_diff))


def test_explicit_style_params_match_fused_render():
    """draw_style_params + apply_style must reproduce render_style exactly
    (same key-split order) — trained v2 artifacts' eval streams depend on
    render_style being bit-stable across the refactor."""
    key = jax.random.key(7)
    dry = jax.jit(lambda k: synth_dry_song(k, T, SR))(jax.random.key(8))

    @jax.jit
    def both(k, stems):
        fused = render_style(k, stems, SR)
        p = draw_style_params(k, 1, stems.shape[0], SR)
        explicit = apply_style(p, stems[None], SR)[0]
        return fused, explicit

    fused, explicit = both(key, dry)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(explicit))


def test_interpolate_style_endpoints_and_discretes():
    p1 = draw_style_params(jax.random.key(1), 2, 4, SR)
    p2 = draw_style_params(jax.random.key(2), 2, 4, SR)
    at0 = interpolate_style(p1, p2, 0.0)
    at1 = interpolate_style(p1, p2, 1.0)
    for name in ("gain_db", "pan", "tilt_amt", "thresh", "ratio", "decay",
                 "wet_amt"):
        np.testing.assert_allclose(np.asarray(at0[name]), np.asarray(p1[name]))
        np.testing.assert_allclose(np.asarray(at1[name]), np.asarray(p2[name]))
    # discrete switches and reverb noise always stay at base
    for name in ("use_high", "apply_c", "reverb_noise"):
        np.testing.assert_array_equal(np.asarray(at1[name]),
                                      np.asarray(p1[name]))


def test_confuser_batch_layout_and_alpha():
    """[A,B,C] per song; A/B share a mix (crops), C is the same content
    under an alpha-close style — near-identical at alpha=0, increasingly
    different with alpha."""
    f = jax.jit(lambda k, a: synth_confuser_batch_v2(k, 2, T, SR,
                                                     confuser_alpha=a))
    x0 = np.asarray(f(jax.random.key(5), 0.0))
    assert x0.shape == (6, 4, 2, T)
    # alpha=0: confuser render == key render (same style params, discretes
    # and reverb noise from base)
    np.testing.assert_allclose(x0[2], x0[1], atol=1e-5)
    np.testing.assert_allclose(x0[5], x0[4], atol=1e-5)
    x_small = np.asarray(f(jax.random.key(5), 0.02))
    x_big = np.asarray(f(jax.random.key(5), 0.5))
    d_small = np.abs(x_small[2] - x_small[1]).mean()
    d_big = np.abs(x_big[2] - x_big[1]).mean()
    assert 0.0 < d_small < d_big, (d_small, d_big)
