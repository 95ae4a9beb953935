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


def test_streaming_cache_batch_size_invariant(tmp_path):
    """build_embedding_cache streams in batches; results must not depend on
    the flush granularity (incl. the padded partial trailing batch)."""
    from mst_tpu.data import make_synthetic_corpus, FMABaselineDataset
    from mst_tpu.eval import build_embedding_cache

    corpus = make_synthetic_corpus(tmp_path / "c", n_tracks=5, duration=1.0,
                                   sample_rate=22050)
    dataset = FMABaselineDataset(str(corpus), 22050, 0.5, num_segments=1)
    enc = MixingStyleEncoder(ENC)
    variables = enc.init(jax.random.key(0),
                         jnp.zeros((1, 4, 2, 11025)), jnp.zeros((1, 64)))
    idx = np.arange(len(dataset))
    small = build_embedding_cache(enc, variables, dataset, idx, FEAT,
                                  clip_duration=0.5, batch_size=2)
    big = build_embedding_cache(enc, variables, dataset, idx, FEAT,
                                clip_duration=0.5, batch_size=8)
    assert small["embeddings"].shape == (5, 16)
    np.testing.assert_allclose(small["embeddings"], big["embeddings"],
                               rtol=2e-4, atol=2e-5)
    assert small["track_indices"].tolist() == big["track_indices"].tolist()
