"""StyleTransferEvaluator harness (CMA-ES + gradient modes)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mst_tpu.eval import StyleTransferEvaluator


def _toy_embed(x):
    bands = x.reshape(x.shape[0], 16, -1)
    return jnp.log(jnp.sqrt(jnp.mean(bands**2, axis=-1)).ravel() + 1e-6)


@pytest.mark.parametrize("method", ["gradient", "cma"])
def test_run_style_transfer(method, rng):
    inp = rng.standard_normal((2, 8192)).astype(np.float32) * 0.1
    # target: band-limited, louder version of a different noise
    tgt = rng.standard_normal((2, 8192)).astype(np.float32) * 0.4

    ev = StyleTransferEvaluator(
        _toy_embed, sample_rate=44100, method=method,
        num_steps=30, cma_generations=8, cma_popsize=8,
    )
    out, metrics = ev.run_style_transfer(inp, tgt)
    assert out.shape == inp.shape
    assert np.isfinite(out).all()
    assert metrics["final_distance"] <= metrics["initial_distance"] + 1e-6
    assert "lufs" in metrics["output_quality"]
    from mst_tpu.eval.effects_search import PARAM_SPACE

    assert set(metrics["effect_params"]) == {n for n, _, _ in PARAM_SPACE}


def test_evaluate_transfer_quality_fields(rng):
    """Feature-diff quality metrics (ref: style_transfer_eval.py:277-318):
    identical audio -> zero diffs; louder output -> positive RMS/LUFS
    diffs; all fields present and finite."""
    ev = StyleTransferEvaluator(_toy_embed, sample_rate=44100)
    tgt = rng.standard_normal((2, 8192)).astype(np.float32) * 0.2

    same = ev.evaluate_transfer_quality(tgt, tgt)
    for k in ("loudness_diff_lufs", "rms_db_diff", "crest_factor_diff",
              "spectral_centroid_diff", "spectral_centroid_diff_norm"):
        assert same[k] == pytest.approx(0.0, abs=1e-5), k
    assert same["target_features"] == same["output_features"]

    louder = ev.evaluate_transfer_quality(tgt, 4.0 * tgt)
    assert louder["rms_db_diff"] == pytest.approx(20 * np.log10(4.0), abs=0.1)
    assert louder["loudness_diff_lufs"] == pytest.approx(
        20 * np.log10(4.0), abs=0.1)
    # pure gain leaves crest factor and centroid unchanged
    assert louder["crest_factor_diff"] < 0.1
    assert louder["spectral_centroid_diff_norm"] < 0.01
