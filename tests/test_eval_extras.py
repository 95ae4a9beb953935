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
    """Match a louder target by optimizing the chain's gain."""
    audio = jnp.asarray(rng.standard_normal((2, 8192)).astype(np.float32) * 0.05)

    def embed(x):  # toy embedding: per-band RMS levels
        bands = x.reshape(2, 8, -1)
        return jnp.log(jnp.sqrt(jnp.mean(bands**2, axis=-1)).ravel() + 1e-6)

    # target: band-limited version of the input (high bands quieter)
    target_emb = embed(audio * 4.0)
    out, params, losses = gradient_search(embed, audio, target_emb,
                                          num_steps=40, lr=0.1,
                                          sample_rate=44100)
    # cosine distance must shrink and the chain must stay stable
    assert losses[-1] < losses[0]
    assert bool(jnp.isfinite(out).all())
    for (name, lo, hi) in PARAM_SPACE:
        assert lo - 1e-6 <= float(params[name]) <= hi + 1e-6


def test_cma_es_minimizes_quadratic():
    target = np.linspace(0.2, 0.8, len(PARAM_SPACE))
    best_u, best_f, hist = cma_es_search(
        lambda u: float(((u - target) ** 2).sum()),
        num_generations=25, popsize=10, seed=1,
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
