"""Regression tests for code-review findings."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from mst_tpu.losses import info_nce_loss


def test_infonce_grad_finite_with_positive_less_anchors(rng):
    """-log(0) where-grad trap: anchors without positives must not NaN the
    backward pass (review finding #1)."""
    emb = jnp.asarray(rng.standard_normal((3, 16)).astype(np.float32))
    labels = jnp.asarray(np.asarray([0, 0, 1], np.int32))  # anchor 2: no positives

    loss, g = jax.value_and_grad(
        lambda e: info_nce_loss(e, labels, 0.1)
    )(emb)
    assert np.isfinite(float(loss))
    assert bool(jnp.isfinite(g).all()), "NaN gradient from positive-less anchor"

    # all anchors positive-less (num_segments=1 batch): loss 0, grads 0
    labels2 = jnp.asarray(np.arange(3, dtype=np.int32))
    loss2, g2 = jax.value_and_grad(
        lambda e: info_nce_loss(e, labels2, 0.1)
    )(emb)
    assert float(loss2) == 0.0
    assert bool(jnp.isfinite(g2).all())


def test_multisteps_schedule_horizon():
    """The style-transfer cosine schedule must anneal over *optimizer* steps,
    not micro-batches (review finding #2)."""
    from mst_tpu.config import (
        AudioConfig, EncoderConfig, FeatureConfig, StyleTransferConfig, TCNConfig,
    )
    from mst_tpu.train import create_style_transfer_state
    from mst_tpu.train.schedules import cosine_schedule

    audio = AudioConfig(n_fft=512, hop_length=128, n_mels=64, clip_duration=0.25)
    cfg = StyleTransferConfig(
        encoder=EncoderConfig(audio=audio, split_size=16, overlap=8,
                              embed_dim=16, feature_dim=64,
                              attn_hidden_dim=8, film_hidden_dim=8),
        features=FeatureConfig(audio=audio),
        tcn=TCNConfig(hidden_channels=4, num_blocks=2, kernel_size=3,
                      use_film=True, film_embed_dim=32, film_hidden_dim=8),
        grad_accum_steps=4,
        learning_rate=1e-3,
    )
    total_micro = 40  # -> 10 optimizer steps
    state, tcn, gen, tx = create_style_transfer_state(
        cfg, jax.random.key(0), total_steps=total_micro
    )
    # the inner schedule must reach ~0 by optimizer step 10, not step 40
    sched = cosine_schedule(cfg.learning_rate, max(1, total_micro // 4))
    assert float(sched(10)) < 1e-9
    assert float(sched(5)) > 0  # mid-schedule still positive
