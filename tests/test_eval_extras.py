"""Audio QA metrics, effect-chain search, retrieval eval."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mst_tpu.eval.audio_quality import (
    audio_quality_report,
    integrated_lufs,
    crest_factor_db,
    spectral_centroid_hz,
)
from mst_tpu.eval.effects_search import (
    PARAM_SPACE,
    apply_effect_chain,
    cma_es_search,
    gradient_search,
)
from mst_tpu.eval import retrieve_top_k, evaluate_retrieval_accuracy


def test_audio_quality_report(rng):
    audio = jnp.asarray(rng.standard_normal((2, 44100)).astype(np.float32) * 0.1)
    rep = audio_quality_report(audio, 44100)
    assert set(rep) == {"lufs", "rms_db", "crest_factor_db", "spectral_centroid_hz"}
    assert -70 < rep["lufs"] < 0
    assert rep["crest_factor_db"] > 0


def test_lufs_tracks_gain(rng):
    audio = jnp.asarray(rng.standard_normal((2, 44100)).astype(np.float32) * 0.1)
    l1 = float(integrated_lufs(audio))
    l2 = float(integrated_lufs(audio * 2.0))
    np.testing.assert_allclose(l2 - l1, 20 * np.log10(2), atol=0.1)


def test_centroid_orders_tones():
    t = np.arange(22050) / 44100.0
    low = jnp.asarray(np.stack([np.sin(2 * np.pi * 200 * t)] * 2).astype(np.float32))
    high = jnp.asarray(np.stack([np.sin(2 * np.pi * 8000 * t)] * 2).astype(np.float32))
    assert float(spectral_centroid_hz(low)) < float(spectral_centroid_hz(high))


def test_effect_chain_param_bounds(rng):
    audio = jnp.asarray(rng.standard_normal((2, 16384)).astype(np.float32) * 0.2)
    out = apply_effect_chain(audio, jnp.full((len(PARAM_SPACE),), 0.5), 44100)
    assert out.shape == audio.shape
    assert bool(jnp.isfinite(out).all())


def test_gradient_search_reduces_distance(rng):
    """Match a darker, louder target by optimizing the chain (the lowpass
    and gain can realize it, so the embedding distance must shrink)."""
    audio = jnp.asarray(rng.standard_normal((2, 8192)).astype(np.float32) * 0.05)

    def embed(x):  # toy embedding: per-STFT-band log-RMS levels
        spec = jnp.abs(jnp.fft.rfft(x.reshape(2, 16, 512), axis=-1))[..., 1:]
        bands = spec.reshape(2, 16, 8, -1)
        return jnp.log(
            jnp.sqrt(jnp.mean(bands**2, axis=(1, 3))).ravel() + 1e-6)

    # target: louder with the top bands cut — reachable via gain + lowpass
    shaped = embed(audio * 3.0) + jnp.tile(
        jnp.array([0.0] * 5 + [-2.0] * 3), 2)
    out, params, losses = gradient_search(embed, audio, shaped,
                                          num_steps=40, lr=0.1,
                                          sample_rate=44100)
    # the best iterate (what gradient_search returns) must improve on the
    # initial distance and the chain must stay stable
    assert losses.min() < 0.7 * losses[0], (losses[0], losses.min())
    assert bool(jnp.isfinite(out).all())
    for (name, lo, hi) in PARAM_SPACE:
        assert lo - 1e-6 <= float(params[name]) <= hi + 1e-6


def test_cma_es_minimizes_quadratic():
    target = np.linspace(0.2, 0.8, len(PARAM_SPACE))
    best_u, best_f, hist = cma_es_search(
        lambda u: float(((u - target) ** 2).sum()),
        num_generations=60, popsize=10, seed=1,
    )
    assert best_f < 1e-2
    np.testing.assert_allclose(best_u, target, atol=0.15)


def test_retrieval_eval_perfect_case(rng):
    embs = rng.standard_normal((10, 16)).astype(np.float32)
    idx = np.arange(10)
    metrics = evaluate_retrieval_accuracy(embs, idx, embs, idx, ks=(1, 5))
    assert metrics["top1_accuracy"] == 1.0
    top, sims = retrieve_top_k(embs, embs, k=3)
    np.testing.assert_array_equal(top[:, 0], idx)


def _u(**kw):
    """[0,1]^N chain params: 0.5 everywhere except the named overrides
    (values given in PHYSICAL units, converted to unit range)."""
    space = {n: (lo, hi) for n, lo, hi in PARAM_SPACE}
    u = np.full(len(PARAM_SPACE), 0.5)
    for i, (name, lo, hi) in enumerate(PARAM_SPACE):
        if name in kw:
            u[i] = (kw[name] - lo) / (hi - lo)
    assert set(kw) <= set(space)
    return jnp.asarray(u)


def _no_dynamics(**kw):
    """Neutral compressor/limiter (threshold above signal) + dry reverb."""
    base = dict(comp_threshold_db=-5.0, comp_ratio=1.5, reverb_wet=0.0,
                limiter_threshold_db=-0.5, gain_db=0.0)
    base.update(kw)
    return _u(**base)


def test_compressor_release_time_constant(rng):
    """A longer release holds gain reduction after a burst: the tail right
    after a loud burst must come out QUIETER with release=500ms than with
    release=50ms (the gain has not yet recovered)."""
    sr = 44100
    burst = np.zeros((2, 3 * 8192), np.float32)
    burst[:, :8192] = 0.9 * rng.standard_normal((2, 8192))
    burst[:, 8192:] = 0.02 * rng.standard_normal((2, 2 * 8192))
    x = jnp.asarray(burst)
    kw = dict(comp_threshold_db=-20.0, comp_ratio=10.0, comp_attack_ms=1.0,
              reverb_wet=0.0, limiter_threshold_db=-0.5, gain_db=0.0)
    slow = apply_effect_chain(x, _u(comp_release_ms=500.0, **kw), sr)
    fast = apply_effect_chain(x, _u(comp_release_ms=50.0, **kw), sr)
    seg = slice(8192 + 2048, 8192 + 8192)  # early tail, while gains differ
    rms_slow = float(jnp.sqrt(jnp.mean(slow[:, seg] ** 2)))
    rms_fast = float(jnp.sqrt(jnp.mean(fast[:, seg] ** 2)))
    assert rms_slow < 0.8 * rms_fast, (rms_slow, rms_fast)


def test_limiter_caps_level(rng):
    """The limiter must pull sustained level above threshold down to ~the
    threshold (frame-envelope limiter: sustained, not single-sample,
    peaks)."""
    sr = 44100
    x = jnp.asarray(0.9 * np.sign(rng.standard_normal((2, 32768))).astype(np.float32))
    out = apply_effect_chain(
        x, _no_dynamics(limiter_threshold_db=-6.0, lowpass_hz=20000.0,
                        highpass_hz=20.0), sr)
    peak_db = 20 * np.log10(float(jnp.abs(out[:, 4096:]).max()) + 1e-9)
    assert peak_db < -3.0, peak_db  # ~-6 dB target, tolerance for envelope
    assert peak_db > -12.0, peak_db


def test_reverb_damping_darkens_tail(rng):
    """Higher damping must lower the wet signal's spectral centroid."""
    from mst_tpu.eval.audio_quality import spectral_centroid_hz

    sr = 44100
    x = jnp.asarray(rng.standard_normal((2, 32768)).astype(np.float32) * 0.1)
    bright = apply_effect_chain(x, _no_dynamics(reverb_wet=0.3,
                                                reverb_damping=0.2), sr)
    dark = apply_effect_chain(x, _no_dynamics(reverb_wet=0.3,
                                              reverb_damping=0.8), sr)
    assert float(spectral_centroid_hz(dark, sr)) < float(
        spectral_centroid_hz(bright, sr))


def test_chain_differentiable_in_all_params(rng):
    """d(output RMS)/du must be finite and nonzero for every parameter.
    Evaluated at a point where both dynamics stages are ACTIVE (mild
    compression, hot signal above the limiter threshold) — a gradient can
    only flow through max/min hinges that are engaged."""
    x = jnp.asarray(rng.standard_normal((2, 16384)).astype(np.float32) * 0.5)

    def f(u):
        return jnp.sqrt(jnp.mean(apply_effect_chain(x, u, 44100) ** 2))

    g = jax.grad(f)(_u(comp_threshold_db=-8.0, comp_ratio=2.0,
                       limiter_threshold_db=-6.0))
    assert bool(jnp.isfinite(g).all()), g
    nz = np.flatnonzero(np.abs(np.asarray(g)) > 1e-10)
    names = [PARAM_SPACE[i][0] for i in nz]
    for must in ("gain_db", "comp_threshold_db", "comp_release_ms",
                 "lowpass_hz", "reverb_wet", "reverb_damping",
                 "limiter_threshold_db"):
        assert must in names, (must, names)
