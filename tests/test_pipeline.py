"""Fused pipeline: shared-mel embedding == unshared embedding."""

import numpy as np

import jax
import jax.numpy as jnp

from mst_tpu.config import AudioConfig, EncoderConfig, FeatureConfig
from mst_tpu.features import extract_mixing_features
from mst_tpu.models import MixingStyleEncoder
from mst_tpu.pipeline import embed_stems, _mel_shared

AUDIO = AudioConfig(n_fft=512, hop_length=128, n_mels=64, clip_duration=0.5)
ENC = EncoderConfig(audio=AUDIO, split_size=16, overlap=8, embed_dim=32,
                    feature_dim=64, attn_hidden_dim=16, film_hidden_dim=16)
FEAT = FeatureConfig(audio=AUDIO)


def test_shared_mel_matches_unshared():
    rng = np.random.default_rng(5)
    stems = jnp.asarray(rng.standard_normal((2, 4, 2, 11025)).astype(np.float32) * 0.2)
    enc = MixingStyleEncoder(ENC)
    variables = enc.init(jax.random.key(0), stems, jnp.zeros((2, 64)))

    fused = embed_stems(enc, variables, stems, FEAT)
    feats = extract_mixing_features(stems, FEAT)
    plain = enc.apply(variables, stems, feats, train=False)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain), atol=1e-5)


def test_mel_shared_detection():
    assert _mel_shared(ENC, FEAT)
    other = FeatureConfig(audio=AudioConfig(n_fft=1024, hop_length=128, n_mels=64))
    assert not _mel_shared(ENC, other)


def test_mismatched_configs_still_work():
    rng = np.random.default_rng(6)
    stems = jnp.asarray(rng.standard_normal((1, 4, 2, 11025)).astype(np.float32) * 0.2)
    other_feat = FeatureConfig(
        audio=AudioConfig(n_fft=1024, hop_length=256, n_mels=32)
    )
    enc = MixingStyleEncoder(ENC)
    variables = enc.init(jax.random.key(0), stems, jnp.zeros((1, 64)))
    emb = embed_stems(enc, variables, stems, other_feat)
    assert emb.shape == (1, 32)
