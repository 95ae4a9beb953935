"""Batched per-pair TCN optimization: mesh-sharded == unsharded; shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mst_tpu.config import AudioConfig, EncoderConfig, FeatureConfig, TCNConfig
from mst_tpu.eval.per_pair import optimize_pair, optimize_pairs
from mst_tpu.models import MixingStyleEncoder
from mst_tpu.parallel import make_mesh

TINY_AUDIO = AudioConfig(n_fft=512, hop_length=128, n_mels=64, clip_duration=0.25)
ENC_CFG = EncoderConfig(
    audio=TINY_AUDIO, split_size=16, overlap=8, embed_dim=32,
    feature_dim=64, attn_hidden_dim=16, film_hidden_dim=16,
)
FCFG = FeatureConfig(audio=TINY_AUDIO)
TCN_CFG = TCNConfig(hidden_channels=8, num_blocks=3, kernel_size=5, use_film=False)


@pytest.fixture(scope="module")
def setup(rng):
    enc = MixingStyleEncoder(ENC_CFG)
    T = TINY_AUDIO.clip_samples
    stems = jnp.asarray(rng.standard_normal((1, 4, 2, T)).astype(np.float32) * 0.1)
    enc_vars = enc.init(jax.random.key(0), stems, jnp.zeros((1, 64)))
    enc_apply = lambda s, f: enc.apply(enc_vars, s, f, train=False)
    inputs = jnp.asarray(rng.standard_normal((3, 4, 2, T)).astype(np.float32) * 0.2)
    targets = jnp.asarray(rng.standard_normal((3, 4, 2, T)).astype(np.float32) * 0.4)
    return enc_apply, inputs, targets


def test_optimize_pairs_shapes_and_identity(setup):
    enc_apply, inputs, targets = setup
    out, res = optimize_pairs(enc_apply, FCFG, inputs, targets, TCN_CFG,
                              num_steps=4, learning_rate=1e-3,
                              rng=jax.random.key(7))
    assert out.shape == inputs.shape
    assert res["losses"].shape == (3, 4)
    assert res["improvement"].shape == (3,)
    assert res["converged"].dtype == bool
    assert np.all(res["identity_init_error"] < 0.1)
    assert np.isfinite(res["final_distance"]).all()


@pytest.mark.slow
def test_mesh_sharded_matches_unsharded(setup):
    """Pair axis sharded on 'data' (with padding 3 -> 8) == plain vmap.

    Tolerances are deliberately loose on TCN-derived quantities: XLA's
    partitioned convolutions are not bitwise-identical to unpartitioned
    ones (~1e-5 relative), and the near-identity cosine distance amplifies
    that by catastrophic cancellation (measured ~4e-4 absolute on a ~0.017
    loss).  One step with a tiny LR keeps Adam's sign(g)-scaled first step
    from amplifying it further.
    """
    enc_apply, inputs, targets = setup
    mesh = make_mesh()
    kw = dict(num_steps=1, learning_rate=1e-5, rng=jax.random.key(7))
    out_m, res_m = optimize_pairs(enc_apply, FCFG, inputs, targets, TCN_CFG,
                                  mesh=mesh, **kw)
    out_u, res_u = optimize_pairs(enc_apply, FCFG, inputs, targets, TCN_CFG,
                                  **kw)
    # no cancellation: encoder-only distance of well-separated inputs
    np.testing.assert_allclose(res_m["initial_distance"],
                               res_u["initial_distance"], rtol=1e-3, atol=1e-4)
    # cancellation-amplified: TCN(x) ~ x at init
    np.testing.assert_allclose(res_m["losses"], res_u["losses"], atol=1e-3)
    np.testing.assert_allclose(res_m["final_distance"], res_u["final_distance"],
                               atol=2e-3)
    np.testing.assert_allclose(out_m, out_u, atol=5e-3)


def test_mesh_accepts_committed_inputs(setup):
    """Inputs already committed under a DIFFERENT sharding (e.g. slices of
    a batch-sharded array, as in __graft_entry__.dryrun_multichip) must not
    conflict with the pair sharding: optimize_pairs re-places them."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    enc_apply, inputs, targets = setup
    mesh = make_mesh()
    repl = NamedSharding(mesh, P())  # replicated != P('data')
    inp = jax.device_put(inputs[:2], repl)
    tgt = jax.device_put(targets[:2], repl)
    _, res = optimize_pairs(enc_apply, FCFG, inp, tgt, TCN_CFG,
                            num_steps=1, mesh=mesh, rng=jax.random.key(9))
    assert np.isfinite(res["final_distance"]).all()


def test_single_pair_wrapper_matches_batched(setup):
    enc_apply, inputs, targets = setup
    out1, res1 = optimize_pair(enc_apply, FCFG, inputs[0], targets[0], TCN_CFG,
                               num_steps=4, rng=jax.random.key(3))
    outB, resB = optimize_pairs(enc_apply, FCFG, inputs[:1], targets[:1],
                                TCN_CFG, num_steps=4, rng=jax.random.key(3))
    np.testing.assert_array_equal(out1, outB[0])
    assert res1["final_distance"] == float(resB["final_distance"][0])
    assert isinstance(res1["converged"], bool)


def test_adamw_optimizer_dimension(setup):
    """Ref grid sweeps Adam vs AdamW (grid_search_tcn.py:205-211)."""
    enc_apply, inputs, targets = setup
    _, res = optimize_pairs(enc_apply, FCFG, inputs[:1], targets[:1], TCN_CFG,
                            num_steps=3, rng=jax.random.key(5),
                            optimizer="adamw")
    assert np.isfinite(res["losses"]).all()
    with pytest.raises(ValueError):
        optimize_pairs(enc_apply, FCFG, inputs[:1], targets[:1], TCN_CFG,
                       num_steps=1, optimizer="sgd")
