"""Track-level embedding averaging (ref: validation_utils.py:106-148)."""

import numpy as np

import jax
import jax.numpy as jnp

from mst_tpu.config import AudioConfig, EncoderConfig, FeatureConfig
from mst_tpu.eval import compute_track_embedding, compute_embeddings
from mst_tpu.models import MixingStyleEncoder

AUDIO = AudioConfig(sample_rate=22050, n_fft=512, hop_length=128, n_mels=64,
                    clip_duration=0.5)
ENC = EncoderConfig(audio=AUDIO, split_size=16, overlap=8, embed_dim=16,
                    feature_dim=64, attn_hidden_dim=8, film_hidden_dim=8)
FEAT = FeatureConfig(audio=AUDIO)


def test_track_embedding_is_mean_of_segments():
    rng = np.random.default_rng(11)
    T = int(22050 * 1.5)  # 3 segments of 0.5 s
    stems = rng.standard_normal((4, 2, T)).astype(np.float32) * 0.2
    enc = MixingStyleEncoder(ENC)
    variables = enc.init(jax.random.key(0),
                         jnp.zeros((1, 4, 2, 11025)), jnp.zeros((1, 64)))
    emb = compute_track_embedding(enc, variables, stems, FEAT,
                                  clip_duration=0.5, sample_rate=22050)
    assert emb.shape == (16,)
    segs = np.stack([stems[..., :11025], stems[..., 11025:22050],
                     stems[..., 22050:33075]])
    expected = compute_embeddings(enc, variables, segs, FEAT).mean(axis=0)
    np.testing.assert_allclose(emb, expected, atol=1e-5)
