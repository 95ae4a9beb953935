"""Shape/semantics tests for the encoder stack, TCN, GRL, discriminator.

Mirrors the reference's inference/test_model.py (shape tests on random
audio) plus src/grl.py and src/tcn_mixer.py __main__ self-tests, as pytest.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mst_tpu.config import (
    AudioConfig,
    EncoderConfig,
    TCNConfig,
    DEFAULT_ENCODER,
    TRAINED_ENCODER,
)
from mst_tpu.models import (
    MelFrontend,
    MixingStyleEncoder,
    BandSplitEncoder,
    MixingFeatureEncoder,
    SongIdentityDiscriminator,
    TCNMixer,
    TCNFiLMGenerator,
    gradient_reversal,
    compute_grl_lambda,
    compute_adversarial_lambda,
    create_tcn_config,
)
from mst_tpu.models.tcn import stems_to_nlc, nlc_to_stems


# short clips keep CPU tests fast; shapes scale identically
SHORT_AUDIO = AudioConfig(n_fft=1024, hop_length=256, n_mels=128, clip_duration=2.0)
SHORT_ENC = EncoderConfig(audio=SHORT_AUDIO, split_size=20, overlap=10,
                          embed_dim=768, feature_dim=64)
SHORT_TRAINED = EncoderConfig(
    audio=AudioConfig(n_fft=2048, hop_length=512, n_mels=80, clip_duration=2.0),
    split_size=16, overlap=8, embed_dim=512, feature_dim=64,
)


def test_n_subbands_matches_reference():
    # ref model.py:257-261 counting on both live configs (SURVEY.md §2.6)
    assert DEFAULT_ENCODER.n_subbands == 11
    assert TRAINED_ENCODER.n_subbands == 9


def test_mel_frontend_shape(rng):
    stems = jnp.asarray(rng.standard_normal((2, 4, 2, 88200), dtype=np.float32))
    m = MelFrontend(SHORT_ENC)
    out = m.apply(m.init(jax.random.key(0), stems), stems)
    # (B, n_mels, frames, 8); frames = 1 + T // hop
    assert out.shape == (2, 128, 1 + 88200 // 256, 8)


@pytest.mark.parametrize("cfg", [SHORT_ENC, SHORT_TRAINED], ids=["default", "trained"])
def test_encoder_forward(rng, cfg):
    stems = jnp.asarray(rng.standard_normal((2, 4, 2, 88200), dtype=np.float32)) * 0.1
    feats = jnp.asarray(rng.standard_normal((2, 64), dtype=np.float32))
    model = MixingStyleEncoder(cfg)
    params = model.init(jax.random.key(0), stems, feats)
    emb = model.apply(params, stems, feats)
    assert emb.shape == (2, cfg.embed_dim)
    assert bool(jnp.isfinite(emb).all())


def test_encoder_train_mode_mutable_batchstats(rng):
    stems = jnp.asarray(rng.standard_normal((2, 4, 2, 88200), dtype=np.float32)) * 0.1
    feats = jnp.asarray(rng.standard_normal((2, 64), dtype=np.float32))
    model = MixingStyleEncoder(SHORT_ENC)
    variables = model.init(jax.random.key(0), stems, feats)
    emb, updates = model.apply(
        variables, stems, feats, train=True,
        rngs={"dropout": jax.random.key(1)},
        mutable=["batch_stats"],
    )
    assert emb.shape == (2, SHORT_ENC.embed_dim)
    assert "batch_stats" in updates


def test_film_generator_shapes(rng):
    feats = jnp.asarray(rng.standard_normal((3, 64), dtype=np.float32))
    gen = MixingFeatureEncoder(SHORT_ENC)
    g1, b1, g2, b2 = gen.apply(gen.init(jax.random.key(0), feats), feats)
    nb = SHORT_ENC.n_subbands
    assert g1.shape == (3, nb, 32) and b1.shape == (3, nb, 32)
    assert g2.shape == (3, nb, 64) and b2.shape == (3, nb, 64)


def test_attention_weights_sum_to_one(rng):
    # mirrors reference test_model.py attention-normalization assert
    from mst_tpu.models.encoder import AttentionPooling

    x = jnp.asarray(rng.standard_normal((2, 50, 32), dtype=np.float32))
    ap = AttentionPooling(hidden_dim=16, output_dim=8)
    variables = ap.init(jax.random.key(0), x)
    w = ap.apply(variables, x, method=AttentionPooling.attention_weights)
    np.testing.assert_allclose(np.asarray(w.sum(axis=1)), 1.0, atol=1e-5)


def test_encoder_grad_flows(rng):
    stems = jnp.asarray(rng.standard_normal((2, 4, 2, 44100), dtype=np.float32)) * 0.1
    feats = jnp.asarray(rng.standard_normal((2, 64), dtype=np.float32))
    model = MixingStyleEncoder(SHORT_ENC)
    params = model.init(jax.random.key(0), stems, feats)

    def loss(s):
        return jnp.sum(model.apply(params, s, feats) ** 2)

    g = jax.grad(loss)(stems)
    assert bool(jnp.isfinite(g).all()) and float(jnp.abs(g).max()) > 0


# --- TCN ---------------------------------------------------------------


def test_tcn_receptive_field():
    cfg = TCNConfig(num_blocks=14, kernel_size=15)
    # 1 + (2^14 - 1) * 14; the reference docstring says 229,377 but its code
    # (tcn_mixer.py:278-280) computes 229,363 — we match the code.
    assert cfg.receptive_field == 1 + (2**14 - 1) * 14 == 229363


def test_create_tcn_config_clamp():
    assert create_tcn_config(0.01).num_blocks == 6
    assert create_tcn_config(100.0).num_blocks == 16
    assert create_tcn_config(5.2).num_blocks == 14


@pytest.mark.parametrize("causal", [False, True])
def test_tcn_forward_identity_at_init(rng, causal):
    cfg = TCNConfig(num_blocks=6, kernel_size=5, hidden_channels=16,
                    causal=causal, use_film=False)
    x = jnp.asarray(rng.standard_normal((1, 8192, 8), dtype=np.float32)) * 0.3
    tcn = TCNMixer(cfg)
    variables = tcn.init(jax.random.key(0), x)
    y = tcn.apply(variables, x)
    assert y.shape == x.shape
    # near-identity init: output_conv weights ~N(0, 1e-3)
    rel = float(jnp.abs(y - x).max() / (jnp.abs(x).max() + 1e-9))
    assert rel < 0.1


def test_tcn_film_conditioning_changes_output(rng):
    cfg = TCNConfig(num_blocks=4, kernel_size=5, hidden_channels=16,
                    use_film=True, film_embed_dim=32)
    x = jnp.asarray(rng.standard_normal((2, 4096, 8), dtype=np.float32))
    emb = jnp.asarray(rng.standard_normal((2, 32), dtype=np.float32))
    gen = TCNFiLMGenerator(cfg)
    gvars = gen.init(jax.random.key(0), emb)
    film = gen.apply(gvars, emb)
    assert film[0].shape == (2, 4, 16)

    tcn = TCNMixer(cfg)
    tvars = tcn.init(jax.random.key(1), x, film)
    y1 = tcn.apply(tvars, x, film)
    film2 = tuple(f + 1.0 for f in film)
    y2 = tcn.apply(tvars, x, film2)
    assert y1.shape == x.shape
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_stems_nlc_roundtrip(rng):
    stems = jnp.asarray(rng.standard_normal((2, 4, 2, 1000), dtype=np.float32))
    np.testing.assert_array_equal(
        np.asarray(nlc_to_stems(stems_to_nlc(stems))), np.asarray(stems)
    )


def test_causal_tcn_is_causal(rng):
    cfg = TCNConfig(num_blocks=4, kernel_size=5, hidden_channels=8,
                    causal=True, use_film=False)
    x = jnp.asarray(rng.standard_normal((1, 4096, 8), dtype=np.float32))
    tcn = TCNMixer(cfg)
    variables = tcn.init(jax.random.key(0), x)
    y1 = tcn.apply(variables, x)
    x2 = x.at[:, 3000:, :].add(10.0)  # perturb only the future
    y2 = tcn.apply(variables, x2)
    np.testing.assert_allclose(
        np.asarray(y1[:, :3000]), np.asarray(y2[:, :3000]), atol=1e-5
    )


# --- GRL ----------------------------------------------------------------


def test_grl_identity_forward_negated_backward():
    x = jnp.asarray([1.0, 2.0, 3.0])
    y = gradient_reversal(x, 1.0)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    for lam in [0.0, 0.5, 1.0, 2.0]:
        g = jax.grad(lambda v: jnp.sum(gradient_reversal(v, lam)))(x)
        np.testing.assert_allclose(np.asarray(g), -lam, atol=1e-6)


def test_grl_schedules_match_reference_formulas():
    # values from the reference's __main__ self-test semantics (grl.py:167-227)
    assert float(compute_grl_lambda(0, 10000, 2000)) == 0.0
    assert float(compute_grl_lambda(1999, 10000, 2000)) == 0.0
    np.testing.assert_allclose(
        float(compute_grl_lambda(6000, 10000, 2000)),
        2.0 / (1.0 + np.exp(-10.0 * 0.5)) - 1.0, rtol=1e-6,
    )
    np.testing.assert_allclose(float(compute_grl_lambda(10000, 10000, 2000)), 1.0, atol=1e-4)
    np.testing.assert_allclose(
        float(compute_adversarial_lambda(6000, 10000, 2000, 0.0, 1.5)), 0.75, rtol=1e-6
    )


def test_discriminator_shape(rng):
    x = jnp.asarray(rng.standard_normal((4, 512), dtype=np.float32))
    d = SongIdentityDiscriminator(hidden_dim=512, output_dim=512)
    out = d.apply(d.init(jax.random.key(0), x), x)
    assert out.shape == (4, 512)
