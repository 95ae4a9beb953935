"""Synthetic-corpus materializer + song-identity leakage probe.

The probe (eval/probe.py, cli/probe_song_identity.py) is the evaluation the
reference's adversarial objective lacks (ref: src/train.py:130-204): it
measures whether song-identity information is decodable from the mixing
embedding.  cli/make_synth_corpus bridges the on-device procedural corpora
to every disk-corpus CLI."""

import json
from pathlib import Path

import numpy as np
import pytest


def _read_bytes(p: Path) -> bytes:
    return p.read_bytes()


def test_make_synth_corpus_writes_loadable_deterministic_corpus(tmp_path):
    from mst_tpu.cli.make_synth_corpus import main
    from mst_tpu.data import FMABaselineDataset

    root = tmp_path / "corpus"
    argv = ["--output", str(root), "--n_songs", "3", "--duration", "1.0",
            "--sample_rate", "8000", "--synth_version", "2", "--seed", "7"]
    main(argv)

    dirs = sorted(d for d in root.iterdir() if d.is_dir())
    assert [d.name for d in dirs] == ["track_0000", "track_0001", "track_0002"]
    for d in dirs:
        for stem in ("vocals", "bass", "drums", "other"):
            assert (d / f"{stem}.wav").exists()
    manifest = json.loads((root / "manifest.json").read_text())
    assert manifest["synth_version"] == 2 and manifest["n_tracks"] == 3

    # the standard dataset layer consumes it
    ds = FMABaselineDataset(root, sample_rate=8000, clip_duration=0.25,
                            num_segments=2)
    segs, idx, _ = ds[0]
    assert segs.shape == (2, 4, 2, 2000)

    # mixture respects the 16-bit peak ceiling
    stems = np.stack([np.frombuffer(_read_bytes(dirs[0] / f"{s}.wav")[44:],
                                    "<i2").astype(np.float32) / 32767.0
                      for s in ("vocals", "bass", "drums", "other")])
    assert np.abs(stems.sum(axis=0)).max() <= 1.0 + 1e-3

    # seeded determinism: regeneration reproduces identical bytes
    blob = _read_bytes(dirs[1] / "drums.wav")
    root2 = tmp_path / "corpus2"
    main(["--output", str(root2), "--n_songs", "3", "--duration", "1.0",
          "--sample_rate", "8000", "--synth_version", "2", "--seed", "7"])
    assert _read_bytes(root2 / "track_0001" / "drums.wav") == blob


def test_make_synth_corpus_style_pool(tmp_path):
    """--n_styles K renders song i with shared style i % K, records the
    assignment in styles.json, and stays byte-deterministic; the probe CLI
    reads styles.json into style-aware metrics."""
    from mst_tpu.cli.make_synth_corpus import main

    root = tmp_path / "pool"
    argv = ["--output", str(root), "--n_songs", "4", "--duration", "1.0",
            "--sample_rate", "8000", "--synth_version", "2", "--seed", "3",
            "--n_styles", "2"]
    main(argv)
    styles = json.loads((root / "styles.json").read_text())
    assert styles == {"track_0000": 0, "track_0001": 1,
                      "track_0002": 0, "track_0003": 1}
    assert json.loads((root / "manifest.json").read_text())["n_styles"] == 2

    # same style, different content: tracks 0 and 2 are distinct audio
    a = _read_bytes(root / "track_0000" / "vocals.wav")
    b = _read_bytes(root / "track_0002" / "vocals.wav")
    assert a != b

    # byte-deterministic regeneration (style pool is seeded too)
    root2 = tmp_path / "pool2"
    main(["--output", str(root2), *argv[2:]])
    assert _read_bytes(root2 / "track_0002" / "drums.wav") == \
        _read_bytes(root / "track_0002" / "drums.wav")

    # v1 has no explicit style latent
    with pytest.raises(SystemExit):
        main(["--output", str(tmp_path / "bad"), "--n_songs", "2",
              "--duration", "1.0", "--sample_rate", "8000",
              "--synth_version", "1", "--n_styles", "2"])


def test_style_match_excl_self_metric():
    """The content-free style metric: a style-only embedding scores 1.0,
    noise scores ~chance, and the cluster ceiling reflects cluster sizes."""
    from mst_tpu.cli.probe_song_identity import _style_match_excl_self

    rng = np.random.default_rng(0)
    n, k = 32, 4
    labels = np.arange(n) % k
    centers = rng.standard_normal((k, 8))
    style_only = centers[labels] + 0.01 * rng.standard_normal((n, 8))
    pure = _style_match_excl_self(style_only,
                                  centers[labels]
                                  + 0.01 * rng.standard_normal((n, 8)),
                                  labels)
    assert pure["style_match_top1_excl_self"] == 1.0
    assert pure["style_match_chance"] == pytest.approx((n / k - 1) / (n - 1))
    assert pure["style_cluster_id_ceiling"] == pytest.approx(k / n)

    noise = _style_match_excl_self(rng.standard_normal((n, 8)),
                                   rng.standard_normal((n, 8)), labels)
    assert noise["style_match_top1_excl_self"] < 0.5


def test_probe_separates_informative_from_uninformative_embeddings():
    """A linear decode of song identity scores ~1.0; an embedding with no
    song-identity information scores near chance."""
    from mst_tpu.eval.probe import song_identity_probe

    rng = np.random.default_rng(0)
    n, d, k = 64, 32, 16
    song_id = rng.standard_normal((n, k))
    song_id /= np.linalg.norm(song_id, axis=1, keepdims=True)

    # informative: both crops carry a (noisy) linear image of the song-ID
    w = rng.standard_normal((k, d)) / np.sqrt(k)
    emb_a = song_id @ w + 0.05 * rng.standard_normal((n, d))
    emb_b = song_id @ w + 0.05 * rng.standard_normal((n, d))
    hot = song_identity_probe(emb_a, emb_b, song_id, l2=1e-3)
    assert hot["probe_id_top1"] > 0.9
    assert hot["probe_cosine"] > 0.9

    # uninformative: crops are independent noise
    cold = song_identity_probe(rng.standard_normal((n, d)),
                               rng.standard_normal((n, d)), song_id, l2=1e-3)
    assert cold["probe_id_top1"] < 0.2
    assert cold["probe_cosine"] < 0.3
    assert hot["chance_id_top1"] == pytest.approx(1.0 / n)


def test_probe_cli_end_to_end(tmp_path, capsys):
    """corpus -> extract_song_identity cache -> probe CLI on a random-init
    encoder artifact: full disk pipeline, tiny config."""
    import jax

    from mst_tpu.checkpoints.npz_io import save_params_npz
    from mst_tpu.cli.extract_song_identity import main as extract_main
    from mst_tpu.cli.make_synth_corpus import main as corpus_main
    from mst_tpu.cli.probe_song_identity import main as probe_main
    from mst_tpu.config import AudioConfig, EncoderConfig
    from mst_tpu.models import MixingStyleEncoder

    sr = 8000
    root = tmp_path / "corpus"
    corpus_main(["--output", str(root), "--n_songs", "4", "--duration",
                 "1.0", "--sample_rate", str(sr), "--synth_version", "2"])

    cache = tmp_path / "songid.npz"
    extract_main(["--separated_path", str(root), "--output", str(cache),
                  "--sample_rate", str(sr), "--max_frames", "60",
                  "--downsample", "2"])

    # random-init encoder artifact in the --encoder_npz layout
    audio = AudioConfig(sample_rate=sr, clip_duration=0.25, n_fft=256,
                        hop_length=64, n_mels=32)
    ecfg = EncoderConfig(audio=audio, split_size=8, overlap=4, embed_dim=24)
    enc = MixingStyleEncoder(ecfg)
    variables = jax.jit(enc.init)(
        jax.random.key(0), np.zeros((1, 4, 2, audio.clip_samples), np.float32),
        np.zeros((1, 64), np.float32))
    npz = tmp_path / "enc.npz"
    save_params_npz(npz, variables)
    npz.with_suffix(".json").write_text(json.dumps({
        "sample_rate": sr, "clip_duration": 0.25,
        "config": {"n_fft": 256, "hop_length": 64, "n_mels": 32,
                   "encoder_dim": 24, "band_split_size": 8,
                   "band_overlap": 4},
    }))

    out = tmp_path / "probe.json"
    m = probe_main(["--encoder_npz", str(npz), "--separated_path", str(root),
                    "--song_id_cache", str(cache), "--batch_size", "2",
                    "--output", str(out)])
    saved = json.loads(out.read_text())
    for key in ("probe_cosine", "probe_id_top1", "chance_id_top1",
                "style_retrieval_top1", "n_tracks"):
        assert key in saved
    assert saved["n_tracks"] == 4
    assert 0.0 <= saved["probe_id_top1"] <= 1.0
    assert m["probe_id_top1"] == saved["probe_id_top1"]


def test_train_corpus_artifact_out_loads_as_encoder_npz(tmp_path):
    """--artifact_out writes the .npz + .json layout every --encoder_npz
    consumer loads (train_style_transfer._encoder_from_npz)."""
    from mst_tpu.cli import train as train_cli
    from mst_tpu.cli.train_style_transfer import _encoder_from_npz
    from mst_tpu.data import make_synthetic_corpus

    sr = 8000
    corpus = make_synthetic_corpus(tmp_path / "c", n_tracks=3, duration=1.0,
                                   sample_rate=sr)
    art = tmp_path / "artifacts" / "enc_demo.npz"
    train_cli.main([
        "--separated_path", str(corpus), "--sample_rate", str(sr),
        "--clip_duration", "0.25", "--n_fft", "256", "--hop_length", "64",
        "--n_mels", "32", "--encoder_dim", "24", "--band_split_size", "8",
        "--band_overlap", "4", "--batch_size", "2", "--num_epochs", "1",
        "--max_steps", "1", "--log_interval", "1", "--num_workers", "1",
        "--checkpoint_dir", str(tmp_path / "ckpt"),
        "--log_dir", str(tmp_path / "logs"),
        "--artifact_out", str(art),
    ])
    assert art.exists() and art.with_suffix(".json").exists()
    enc, enc_vars, ecfg, fcfg = _encoder_from_npz(art)
    assert ecfg.embed_dim == 24
    assert "params" in enc_vars and "batch_stats" in enc_vars
    meta = json.loads(art.with_suffix(".json").read_text())
    assert meta["use_adversarial"] is False
