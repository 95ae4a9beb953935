"""Stage-1 train step with the on-device augmentation chain wired in."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mst_tpu.augment import AugmentConfig, augment_stems
from mst_tpu.config import AudioConfig, EncoderConfig, FeatureConfig, Stage1Config
from mst_tpu.train import create_stage1_state, make_train_step

TINY_AUDIO = AudioConfig(n_fft=512, hop_length=128, n_mels=64, clip_duration=0.5)
TINY_CFG = Stage1Config(
    encoder=EncoderConfig(
        audio=TINY_AUDIO, split_size=16, overlap=8, embed_dim=32,
        feature_dim=64, attn_hidden_dim=16, film_hidden_dim=16,
    ),
    features=FeatureConfig(audio=TINY_AUDIO),
    learning_rate=1e-3,
    warmup_steps=2,
    use_augmentation=True,
)


@pytest.mark.slow
def test_train_step_with_augmentation():
    rng = np.random.default_rng(99)
    n = 8
    batch = {
        "stems": jnp.asarray(rng.standard_normal((n, 4, 2, 11025)).astype(np.float32) * 0.2),
        "song_labels": jnp.asarray(np.repeat(np.arange(n // 2), 2).astype(np.int32)),
    }
    state, enc, disc = create_stage1_state(TINY_CFG, jax.random.key(0), total_steps=50)
    acfg = AugmentConfig(sample_rate=22050, fir_taps=1024)
    step_fn = make_train_step(
        TINY_CFG, enc, disc, total_steps=50,
        augment_fn=lambda r, s: augment_stems(r, s, acfg),
    )
    key = jax.random.key(1)
    losses = []
    for _ in range(3):
        state, metrics = step_fn(state, batch, key)
        losses.append(float(metrics["infonce"]))
    assert np.isfinite(losses).all()
    assert int(state.step) == 3
