"""CQT op + song-identity extraction pipeline tests."""

import numpy as np

import jax.numpy as jnp

from mst_tpu.ops.cqt import cqt


def test_cqt_peak_at_note_frequency():
    """A pure A4 (440 Hz) must peak at CQT bin for A4."""
    sr = 22050
    t = np.arange(sr * 2) / sr
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    mag = np.asarray(cqt(jnp.asarray(x), sr, hop_length=512, n_bins=84))
    assert mag.shape[0] == 84
    mean_per_bin = mag.mean(axis=1)
    # bin index of 440 Hz with fmin C1=32.703: 12*log2(440/32.703) ~= 45
    expected_bin = int(round(12 * np.log2(440.0 / 32.703195)))
    assert abs(int(mean_per_bin.argmax()) - expected_bin) <= 1


def test_cqt_octave_separation():
    sr = 22050
    t = np.arange(sr) / sr
    x1 = np.sin(2 * np.pi * 110.0 * t).astype(np.float32)
    x2 = np.sin(2 * np.pi * 220.0 * t).astype(np.float32)
    m1 = np.asarray(cqt(jnp.asarray(x1), sr)).mean(axis=1)
    m2 = np.asarray(cqt(jnp.asarray(x2), sr)).mean(axis=1)
    assert int(m2.argmax()) - int(m1.argmax()) == 12  # exactly one octave


def test_preprocess_cqt_shape_and_standardization():
    from mst_tpu.cli.extract_song_identity import preprocess_cqt

    rng = np.random.default_rng(0)
    mag = rng.random((84, 4000)).astype(np.float32)
    out = preprocess_cqt(mag, downsample=20, max_frames=7600)
    assert out.shape == (84, 7600)
    # standardized over the non-padded region
    valid = out[:, :200]
    np.testing.assert_allclose(valid.mean(axis=1), 0.0, atol=1e-4)


def test_cqtnet_torch_parity():
    """flax CQTNet + order/shape converter == torch replica (cosine, values)."""
    import torch
    import jax

    from mst_tpu.checkpoints import cqtnet_params_from_torch
    from mst_tpu.models import CQTNet
    from tests.torch_cqtnet import TorchCQTNet

    torch.manual_seed(0)
    tmodel = TorchCQTNet(ch_in=4, ch_out=32).eval()
    # non-trivial BN running stats so the converter's batch_stats mapping is
    # actually exercised
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)

    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 1, 84, 300)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()

    variables = cqtnet_params_from_torch(
        {k: v.numpy() for k, v in tmodel.state_dict().items()}
    )
    model = CQTNet(ch_in=4, ch_out=32)
    out = np.asarray(
        jax.jit(lambda v, a: model.apply(v, a))(
            variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
        )
    )
    cos = np.sum(ref * out, axis=1)  # both L2-normalized
    assert np.all(cos >= 0.999), cos
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_cqtnet_shapes_and_init():
    import jax

    from mst_tpu.models import CQTNet

    model = CQTNet(ch_in=4, ch_out=32)
    x = jnp.zeros((1, 84, 300, 1))
    variables = jax.jit(model.init)(jax.random.key(0), x)
    emb = model.apply(variables, x)
    assert emb.shape == (1, 32)
    assert variables["params"]["conv0"]["kernel"].shape == (12, 3, 1, 4)
    assert variables["params"]["projection"]["kernel"].shape == (64, 32)


def test_cqtnet_cache_feeds_adversarial_training(tmp_path, capsys):
    """The real-weights adversarial pipeline end-to-end (ref:
    scripts/extract_song_identity_embeddings.py:169-183,278 ->
    src/train.py:529-541): extract a song-ID cache with a CQTNet checkpoint
    (--cqtnet_checkpoint), then stage-1 adversarial training consumes it —
    the discriminator dim follows the cache's embedding space."""
    import json as _json

    import jax

    from mst_tpu.checkpoints.npz_io import save_params_npz
    from mst_tpu.cli import train as train_cli
    from mst_tpu.cli.extract_song_identity import main as extract_main
    from mst_tpu.data import make_synthetic_corpus
    from mst_tpu.models import CQTNet

    sr = 22050
    corpus = make_synthetic_corpus(tmp_path / "c", n_tracks=3, duration=1.0,
                                   sample_rate=sr)

    # a small "upstream" CQTNet checkpoint in the flax .npz layout
    model = CQTNet(ch_in=4, ch_out=32)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 84, 300, 1)))
    ckpt = tmp_path / "cqtnet.npz"
    save_params_npz(ckpt, variables)

    cache = tmp_path / "songid.npz"
    extract_main([
        "--separated_path", str(corpus), "--output", str(cache),
        "--sample_rate", str(sr), "--max_frames", "300", "--downsample", "4",
        "--cqtnet_checkpoint", str(ckpt),
    ])
    z = np.load(cache, allow_pickle=True)
    assert z["embeddings"].shape == (3, 32)  # CQTNet dim, not the JL 512
    np.testing.assert_allclose(
        np.linalg.norm(z["embeddings"], axis=1), 1.0, atol=1e-5)

    train_cli.main([
        "--separated_path", str(corpus), "--sample_rate", str(sr),
        "--clip_duration", "0.25", "--n_fft", "256", "--hop_length", "64",
        "--n_mels", "32", "--encoder_dim", "32", "--band_split_size", "8",
        "--band_overlap", "4",
        "--use_adversarial", "--song_id_cache_path", str(cache),
        "--batch_size", "2", "--num_epochs", "1", "--max_steps", "1",
        "--log_interval", "1", "--num_workers", "1",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--log_dir", str(tmp_path / "logs"),
    ])
    out = capsys.readouterr().out
    assert "adversarial=" in out  # the adversarial loss actually ran
    assert "missing from song-ID cache" not in out  # cache rows aligned
    assert "no song-ID cache" not in out


def test_song_identity_cli(tmp_path):
    from mst_tpu.cli.extract_song_identity import main
    from mst_tpu.data import make_synthetic_corpus

    corpus = make_synthetic_corpus(tmp_path / "c", n_tracks=3, duration=2.0,
                                   sample_rate=22050)
    out = tmp_path / "songid.npz"
    main(["--separated_path", str(corpus), "--output", str(out)])
    z = np.load(out, allow_pickle=True)
    assert z["embeddings"].shape == (3, 512)
    norms = np.linalg.norm(z["embeddings"], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # different songs -> different embeddings
    sims = z["embeddings"] @ z["embeddings"].T
    assert sims[0, 1] < 0.999
