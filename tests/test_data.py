"""Dataset / loader tests on a synthetic separated-stems corpus."""

import numpy as np
import pytest

from mst_tpu.data import (
    FMABaselineDataset,
    StyleTransferDataset,
    MUSDB18Dataset,
    PrefetchLoader,
    baseline_collate,
    style_transfer_collate,
    make_synthetic_corpus,
    train_val_split,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    return make_synthetic_corpus(root, n_tracks=6, duration=3.0, sample_rate=22050)


def test_fma_dataset_and_collate(corpus):
    ds = FMABaselineDataset(corpus, sample_rate=22050, clip_duration=1.0,
                            num_segments=2)
    assert len(ds) == 6
    segs, idx, d = ds[0]
    assert segs.shape == (2, 4, 2, 22050)
    batch = baseline_collate([ds[0], ds[1], ds[2]])
    assert batch["stems"].shape == (6, 4, 2, 22050)
    np.testing.assert_array_equal(batch["song_labels"], [0, 0, 1, 1, 2, 2])


def test_two_segments_non_overlapping(corpus):
    ds = FMABaselineDataset(corpus, sample_rate=22050, clip_duration=1.0,
                            num_segments=2)
    segs, _, _ = ds[3]
    # segments from one track must differ (different crops)
    assert not np.allclose(segs[0], segs[1])


def test_style_transfer_dataset(corpus):
    ds = StyleTransferDataset(corpus, sample_rate=22050, clip_duration=1.0)
    inp, tgt = ds[0]
    assert inp.shape == (4, 2, 22050) and tgt.shape == (4, 2, 22050)
    assert not np.allclose(inp, tgt)  # different songs
    batch = style_transfer_collate([ds[0], ds[1]])
    assert batch["input_stems"].shape == (2, 4, 2, 22050)


@pytest.mark.slow  # 88 s: the on-the-fly SCNet data path is exercised
# by the separator-domain integration test (round-5 suite re-budget)
def test_style_transfer_dataset_on_the_fly_separation(corpus, tmp_path):
    """separator= mode: raw mixture files separated per item
    (ref: data.py:503-509, use_preseparated=False)."""
    from mst_tpu.data import load_stems, write_wav
    from mst_tpu.separation import SCNetConfig, SCNetSeparator

    mix_dir = tmp_path / "mixes"
    mix_dir.mkdir()
    from mst_tpu.data.datasets import find_stem_dirs

    for d in find_stem_dirs(corpus)[:3]:
        write_wav(mix_dir / f"{d.name}.wav",
                  load_stems(d, 22050).sum(axis=0), 22050)

    tiny = SCNetConfig(n_fft=512, hop_length=128, dims=(4, 8, 16, 24),
                       band_strides=(1, 2, 4), band_kernels=(3, 2, 4),
                       conv_depths=(1, 1, 1), num_dplayers=1, rnn_hidden=16)
    sep = SCNetSeparator.from_checkpoint(None, sample_rate=22050, cfg=tiny)
    sep.chunk_seconds = 1.0
    ds = StyleTransferDataset(mix_dir, sample_rate=22050, clip_duration=1.0,
                              separator=sep)
    assert len(ds) == 3
    inp, tgt = ds[0]
    assert inp.shape == (4, 2, 22050) and tgt.shape == (4, 2, 22050)
    assert np.isfinite(inp).all()


def test_musdb_embedding_dataset(corpus):
    """Fixed-window loader (ref: musdb_dataset.py:199-262): deterministic
    across calls, pads short tracks, mixture == stem sum when no file."""
    from mst_tpu.data import MUSDB18EmbeddingDataset

    ds = MUSDB18EmbeddingDataset(corpus, sample_rate=22050,
                                 segment_duration=1.0, segment_offset=0.5)
    a = ds[0]
    b = ds[0]
    assert a["stems"].shape == (4, 2, 22050)
    np.testing.assert_array_equal(a["stems"], b["stems"])  # deterministic
    np.testing.assert_allclose(a["mixture"], a["stems"].sum(axis=0), atol=1e-6)
    full = ds.track_dirs[0]
    from mst_tpu.data import load_stems
    np.testing.assert_allclose(
        a["stems"], load_stems(full, 22050)[..., 11025:33075], atol=1e-7)
    # offset beyond track end -> zero-padded, not an error
    ds2 = MUSDB18EmbeddingDataset(corpus, sample_rate=22050,
                                  segment_duration=1.0, segment_offset=2.5)
    c = ds2[0]
    assert c["stems"].shape == (4, 2, 22050)


def test_musdb_dataset(corpus):
    ds = MUSDB18Dataset(corpus, sample_rate=22050)
    item = ds[0]
    assert item["stems"].shape[0] == 4
    np.testing.assert_allclose(
        item["mixture"], item["stems"].sum(axis=0), atol=1e-6
    )
    seg = ds.segment(0, 0.5, 1.0)
    assert seg.shape == (4, 2, 22050)


def test_train_val_split_seeded():
    tr1, va1 = train_val_split(100, 0.1, seed=42)
    tr2, va2 = train_val_split(100, 0.1, seed=42)
    np.testing.assert_array_equal(tr1, tr2)
    np.testing.assert_array_equal(va1, va2)
    assert len(va1) == 10 and len(tr1) == 90
    assert set(tr1) | set(va1) == set(range(100))


def test_prefetch_loader(corpus):
    ds = FMABaselineDataset(corpus, sample_rate=22050, clip_duration=1.0)
    loader = PrefetchLoader(ds, batch_size=4, collate_fn=baseline_collate,
                            num_workers=2)
    batches = list(loader)
    assert len(batches) == 2  # 6 tracks / batch 4 -> 2 batches
    total = sum(b["stems"].shape[0] for b in batches)
    assert total == 12  # 6 tracks x 2 segments


def test_prefetch_loader_skips_bad_items(corpus, tmp_path):
    ds = FMABaselineDataset(corpus, sample_rate=22050, clip_duration=1.0)
    orig = ds.track_dirs[2]
    ds.track_dirs = list(ds.track_dirs)
    ds.track_dirs[2] = tmp_path / "missing"  # unreadable track
    loader = PrefetchLoader(ds, batch_size=6, collate_fn=baseline_collate,
                            num_workers=2, shuffle=False)
    batches = list(loader)
    assert sum(b["stems"].shape[0] for b in batches) == 10  # 5 tracks survive


def test_mp3_decode_sdl_fallback():
    """MP3 decode without ffmpeg via the SDL_mixer fallback (ROADMAP item 3):
    native-rate header parse + decode; reference loads FMA mp3s through
    torchaudio (ref: src/data.py:169-199)."""
    from pathlib import Path

    import numpy as np
    import pytest

    from mst_tpu.data.audio_io import mpeg_stream_info, read_audio

    asset = Path("/opt/venv/lib/python3.12/site-packages/pygame/examples"
                 "/data/house_lo.mp3")
    if not asset.exists():
        pytest.skip("no mp3 asset in this environment")
    pytest.importorskip("pygame")

    info = mpeg_stream_info(asset)
    assert info == (11025, 1)  # known native format of the asset

    x, sr = read_audio(asset)
    assert sr == 11025 and x.shape[0] == 1
    assert 7.0 < x.shape[1] / sr < 7.5  # known ~7.26 s duration
    rms = float(np.sqrt((x**2).mean()))
    assert 0.05 < rms < 0.6 and float(np.abs(x).max()) <= 1.0

    # resample-on-read path
    y, sr2 = read_audio(asset, target_sr=22050)
    assert sr2 == 22050
    assert abs(y.shape[1] - 2 * x.shape[1]) <= 2
