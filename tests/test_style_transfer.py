"""Style-transfer trainer: loss decreases, accumulation, inference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mst_tpu.config import (
    AudioConfig, EncoderConfig, FeatureConfig, StyleTransferConfig, TCNConfig,
)
from mst_tpu.models import MixingStyleEncoder
from mst_tpu.train import (
    create_style_transfer_state,
    make_style_transfer_step,
    apply_style_transfer,
)

TINY_AUDIO = AudioConfig(n_fft=512, hop_length=128, n_mels=64, clip_duration=0.25)
TINY_CFG = StyleTransferConfig(
    encoder=EncoderConfig(
        audio=TINY_AUDIO, split_size=16, overlap=8, embed_dim=32,
        feature_dim=64, attn_hidden_dim=16, film_hidden_dim=16,
    ),
    features=FeatureConfig(audio=TINY_AUDIO),
    tcn=TCNConfig(hidden_channels=8, num_blocks=3, kernel_size=5,
                  use_film=True, film_embed_dim=64, film_hidden_dim=32),
    grad_accum_steps=2,
    learning_rate=1e-3,
    use_cycle_consistency=True,
    cycle_weight=0.1,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(777)  # self-seeded: order-independent
    enc = MixingStyleEncoder(TINY_CFG.encoder)
    T = TINY_AUDIO.clip_samples
    stems = jnp.asarray(rng.standard_normal((1, 4, 2, T)).astype(np.float32) * 0.1)
    enc_vars = enc.init(jax.random.key(0), stems, jnp.zeros((1, 64)))
    batch = {
        "input_stems": jnp.asarray(
            rng.standard_normal((2, 4, 2, T)).astype(np.float32) * 0.2
        ),
        "target_stems": jnp.asarray(
            rng.standard_normal((2, 4, 2, T)).astype(np.float32) * 0.4
        ),
    }
    return enc, enc_vars, batch


def test_style_transfer_step_runs_and_improves(setup):
    enc, enc_vars, batch = setup
    state, tcn, gen, tx = create_style_transfer_state(
        TINY_CFG, jax.random.key(1), total_steps=50
    )
    step_fn = make_style_transfer_step(TINY_CFG, enc, enc_vars, tcn, gen, tx)
    rng = jax.random.key(2)
    losses = []
    for _ in range(12):
        state, metrics = step_fn(state, batch, rng)
        losses.append(float(metrics["style_loss"]))
    assert np.isfinite(losses).all()
    assert min(losses[6:]) < losses[0], losses
    assert float(metrics["cycle_loss"]) >= 0.0


def test_grad_accumulation_only_updates_every_k(setup):
    enc, enc_vars, batch = setup
    state, tcn, gen, tx = create_style_transfer_state(
        TINY_CFG, jax.random.key(1), total_steps=50
    )
    step_fn = make_style_transfer_step(TINY_CFG, enc, enc_vars, tcn, gen, tx)
    p0 = state.tcn_params["output_conv"]["kernel"]
    state, _ = step_fn(state, batch, jax.random.key(0))
    # first of 2 accumulation microsteps: params unchanged
    np.testing.assert_array_equal(
        np.asarray(state.tcn_params["output_conv"]["kernel"]), np.asarray(p0)
    )
    state, _ = step_fn(state, batch, jax.random.key(0))
    assert not np.allclose(
        np.asarray(state.tcn_params["output_conv"]["kernel"]), np.asarray(p0)
    )


@pytest.mark.slow
def test_meshed_step_matches_unsharded(setup):
    """Explicit shardings (state replicated, batch on 'data') == plain jit."""
    from mst_tpu.parallel import make_mesh

    enc, enc_vars, _ = setup
    rng = np.random.default_rng(1234)
    T = TINY_AUDIO.clip_samples
    batch = {
        "input_stems": jnp.asarray(
            rng.standard_normal((8, 4, 2, T)).astype(np.float32) * 0.2),
        "target_stems": jnp.asarray(
            rng.standard_normal((8, 4, 2, T)).astype(np.float32) * 0.4),
    }
    mesh = make_mesh()
    results = []
    for m in (None, mesh):
        state, tcn, gen, tx = create_style_transfer_state(
            TINY_CFG, jax.random.key(1), total_steps=50
        )
        step_fn = make_style_transfer_step(TINY_CFG, enc, enc_vars, tcn, gen,
                                           tx, mesh=m)
        losses = []
        for _ in range(2):  # accum 2: one applied optimizer update
            state, metrics = step_fn(state, batch, jax.random.key(2))
            losses.append(float(metrics["total_loss"]))
        results.append((losses, state.tcn_params["output_conv"]["kernel"]))
    # both microsteps evaluate the initial params -> tight loss parity;
    # the applied AdamW update is sign(g)-scaled, so partitioning noise can
    # flip a near-zero gradient's sign: params bounded by 2*lr elementwise
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(results[0][1]), np.asarray(results[1][1]),
        atol=2.1 * TINY_CFG.learning_rate, rtol=0)


def test_apply_style_transfer_inference(setup):
    enc, enc_vars, batch = setup
    state, tcn, gen, _ = create_style_transfer_state(
        TINY_CFG, jax.random.key(1), total_steps=50
    )
    out, metrics = apply_style_transfer(
        TINY_CFG, enc, enc_vars, tcn, gen, state,
        batch["input_stems"], batch["target_stems"],
    )
    assert out.shape == batch["input_stems"].shape
    assert metrics["initial_distance"].shape == (2,)
    assert bool(jnp.isfinite(metrics["final_distance"]).all())


def test_fx_encoder_mode(setup):
    """Mixture-level FxEncoder conditioning (ref train_style_transfer.py:543-556):
    128-d-style embeddings from the summed mixture drive FiLM; loss decreases
    and inference accepts the same embed_fn."""
    import dataclasses

    from mst_tpu.models import FxEncoder, make_fx_embed_fn

    enc, enc_vars, batch = setup
    fx = FxEncoder(audio=TINY_AUDIO, embed_dim=16, channels=(8, 16))
    fx_vars = fx.init(jax.random.key(7),
                      jnp.zeros((1, 2, TINY_AUDIO.clip_samples)))
    embed_fn = make_fx_embed_fn(fx, fx_vars)

    emb = embed_fn(batch["input_stems"])
    assert emb.shape == (2, 16)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb), axis=1), 1.0, atol=1e-4)

    cfg = dataclasses.replace(
        TINY_CFG,
        tcn=dataclasses.replace(TINY_CFG.tcn, film_embed_dim=32),
        use_cycle_consistency=False,
    )
    state, tcn, gen, tx = create_style_transfer_state(
        cfg, jax.random.key(1), total_steps=50
    )
    step_fn = make_style_transfer_step(cfg, enc, enc_vars, tcn, gen, tx,
                                       embed_fn=embed_fn)
    rng = jax.random.key(2)
    losses = []
    for _ in range(12):
        state, metrics = step_fn(state, batch, rng)
        losses.append(float(metrics["style_loss"]))
    assert np.isfinite(losses).all()
    assert min(losses[6:]) < losses[0], losses

    out, m = apply_style_transfer(
        cfg, enc, enc_vars, tcn, gen, state,
        batch["input_stems"], batch["target_stems"], embed_fn=embed_fn,
    )
    assert out.shape == batch["input_stems"].shape
    assert np.isfinite(np.asarray(m["final_distance"])).all()


@pytest.mark.slow
def test_trained_tcn_artifact_improves_fresh_pairs():
    """The committed trained FiLM-TCN artifact must reduce embedding
    distance toward the target on fresh held-out synthetic pairs (the
    reference's convergence criterion is a >=20% per-pair reduction,
    test_tcn_style_transfer.py:200; the one-shot FiLM transfer here must
    clear a 10% mean bar)."""
    import json
    from pathlib import Path

    from mst_tpu.checkpoints.npz_io import load_params_npz
    from mst_tpu.cli.train_style_transfer import _encoder_from_npz
    from mst_tpu.separation.synth import synth_batch
    from mst_tpu.train.style_transfer import StyleTransferState

    root = Path(__file__).resolve().parent.parent
    ckpt = root / "artifacts" / "tcn_synth_best.npz"
    meta_path = root / "artifacts" / "tcn_synth_best.json"
    if not ckpt.exists():
        pytest.skip("trained TCN artifact not committed yet")
    meta = json.loads(meta_path.read_text())
    enc, enc_vars, ecfg, fcfg = _encoder_from_npz(
        root / "artifacts" / Path(meta["encoder_npz"]).name)
    t = meta["tcn"]
    cfg = StyleTransferConfig(
        encoder=ecfg, features=fcfg,
        tcn=TCNConfig(hidden_channels=t["hidden_channels"],
                      num_blocks=t["num_blocks"], kernel_size=t["kernel_size"],
                      causal=t["causal"], use_film=True,
                      film_embed_dim=t["film_embed_dim"]),
    )
    from mst_tpu.models import TCNMixer, TCNFiLMGenerator

    tcn = TCNMixer(cfg.tcn)
    gen = TCNFiLMGenerator(cfg.tcn)
    w = load_params_npz(ckpt)
    state = StyleTransferState(
        tcn_params=w["tcn_params"], tcn_batch_stats=w["tcn_batch_stats"],
        film_params=w["film_params"], opt_state=(),
        step=jnp.zeros((), jnp.int32))

    T = ecfg.audio.clip_samples
    key = jax.random.key(20260817)
    d0s, d1s, imps = [], [], []
    for i in range(2):  # 4 pairs in 2 small batches (bounds CPU memory)
        k1, k2 = jax.random.split(jax.random.fold_in(key, i))
        inp = synth_batch(k1, 2, T, float(ecfg.audio.sample_rate))
        tgt = synth_batch(k2, 2, T, float(ecfg.audio.sample_rate))
        _, m = apply_style_transfer(cfg, enc, enc_vars, tcn, gen, state,
                                    inp, tgt)
        d0s += list(np.asarray(m["initial_distance"]))
        d1s += list(np.asarray(m["final_distance"]))
        imps += list(np.asarray(m["improvement"]))
    d0s, imps = np.asarray(d0s), np.asarray(imps)
    assert np.isfinite(imps).all()
    # The transfer regime is DISTINCTIVE pairs — large initial style
    # distance (the reference evaluates the same way, via
    # select_distinctive_pairs; ref run_distinctive_pairs_transfer.py).
    # Near-identical pairs (tiny initial distance) are out of scope and
    # numerically unstable across platforms.
    distinct = d0s >= 0.6
    assert distinct.any(), d0s
    mean_imp = float(imps[distinct].mean())
    assert mean_imp >= 0.2, (mean_imp, d0s, d1s)
