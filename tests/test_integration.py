"""End-to-end integration on a synthetic corpus (CPU, tiny config):

corpus -> loader -> stage-1 training -> orbax save/resume -> retrieval
validation -> per-pair TCN optimization.  The on-TPU equivalent is driven
through the CLIs (see .claude/skills/verify); this keeps the seams covered
in CI.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mst_tpu.config import AudioConfig, EncoderConfig, FeatureConfig, Stage1Config, TCNConfig
from mst_tpu.checkpoints import restore_checkpoint, save_checkpoint
from mst_tpu.data import (
    FMABaselineDataset,
    PrefetchLoader,
    baseline_collate,
    make_synthetic_corpus,
    train_val_split,
)
from mst_tpu.eval import build_embedding_cache, evaluate_retrieval_accuracy, optimize_pair
from mst_tpu.models import MixingStyleEncoder
from mst_tpu.train import create_stage1_state, make_train_step

SR = 22050
AUDIO = AudioConfig(sample_rate=SR, n_fft=512, hop_length=128, n_mels=64,
                    clip_duration=0.5)
CFG = Stage1Config(
    encoder=EncoderConfig(audio=AUDIO, split_size=16, overlap=8, embed_dim=32,
                          feature_dim=64, attn_hidden_dim=16, film_hidden_dim=16),
    features=FeatureConfig(audio=AUDIO),
    learning_rate=1e-3,
    warmup_steps=2,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return make_synthetic_corpus(tmp_path_factory.mktemp("it"), n_tracks=6,
                                 duration=2.0, sample_rate=SR)


@pytest.mark.slow
def test_full_loop(corpus, tmp_path):
    dataset = FMABaselineDataset(corpus, SR, 0.5, num_segments=2, seed=0)
    train_idx, val_idx = train_val_split(len(dataset), 0.2, seed=0)
    loader = PrefetchLoader(dataset, batch_size=4, collate_fn=baseline_collate,
                            indices=train_idx, num_workers=2, seed=0)

    state, enc, disc = create_stage1_state(CFG, jax.random.key(0), total_steps=20)
    step_fn = make_train_step(CFG, enc, disc, total_steps=20)
    rng = jax.random.key(1)
    for _ in range(2):
        for batch in loader:
            state, metrics = step_fn(
                state,
                {"stems": jnp.asarray(batch["stems"]),
                 "song_labels": jnp.asarray(batch["song_labels"])},
                rng,
            )
    assert int(state.step) >= 2
    assert np.isfinite(float(metrics["infonce"]))

    # checkpoint save -> restore -> training continues from restored state
    ckpt = tmp_path / "ckpt"
    save_checkpoint(ckpt, int(state.step), state, CFG)
    restored = restore_checkpoint(ckpt, None, state)
    assert int(restored.step) == int(state.step)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
    )
    restored, _ = step_fn(
        restored,
        {"stems": jnp.asarray(batch["stems"]),
         "song_labels": jnp.asarray(batch["song_labels"])},
        rng,
    )
    assert int(restored.step) == int(state.step) + 1

    # retrieval: queries = last 0.5 s, pool = first 0.5 s, all tracks
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    idx = np.arange(len(dataset))
    queries = build_embedding_cache(enc, variables, dataset, idx, CFG.features,
                                    segment="last", clip_duration=0.5)
    pool = build_embedding_cache(enc, variables, dataset, idx, CFG.features,
                                 segment="first", clip_duration=0.5)
    metrics = evaluate_retrieval_accuracy(
        queries["embeddings"], queries["track_indices"],
        pool["embeddings"], pool["track_indices"],
    )
    assert metrics["num_queries"] == 6
    assert 0.0 <= metrics["top1_accuracy"] <= 1.0
    assert metrics["top5_accuracy"] >= metrics["top1_accuracy"]

    # per-pair TCN optimization through the trained encoder
    enc_apply = lambda stems, feats: enc.apply(variables, stems, feats, train=False)
    inp = dataset[0][0][0]
    tgt = dataset[3][0][0]
    out_stems, res = optimize_pair(
        enc_apply, CFG.features, jnp.asarray(inp), jnp.asarray(tgt),
        TCNConfig(hidden_channels=8, num_blocks=3, kernel_size=5, use_film=False),
        num_steps=5, learning_rate=1e-3,
    )
    assert out_stems.shape == inp.shape
    assert res["identity_init_error"] < 0.1
    assert np.isfinite(res["final_distance"])


def test_train_style_transfer_cli_fx_encoder(tmp_path):
    """CLI fx_encoder mode end-to-end in-process (ref
    train_style_transfer.py:421-426): mixture-level conditioning trains and
    checkpoints with config.json recording the encoder type."""
    import json

    from mst_tpu.cli import train_style_transfer as cli

    ckpt = tmp_path / "st_fx"
    cli.main([
        "--synthetic", "--checkpoint_dir", str(ckpt),
        "--log_dir", str(tmp_path / "logs"),
        "--sample_rate", "8000", "--clip_duration", "0.25",
        "--n_fft", "256", "--hop_length", "64", "--n_mels", "32",
        "--encoder_dim", "32", "--band_split_size", "8", "--band_overlap", "4",
        "--encoder_type", "fx_encoder", "--fx_embed_dim", "16",
        "--hidden_channels", "8", "--num_blocks", "2", "--kernel_size", "5",
        "--batch_size", "1", "--gradient_accumulation_steps", "2",
        "--num_epochs", "1", "--max_steps", "2", "--no_cycle_consistency",
        "--num_workers", "1",
    ])
    meta = json.loads((ckpt / "config.json").read_text())
    assert meta["encoder_type"] == "fx_encoder"
    assert meta["encoder_dim"] == 16
    assert (ckpt / "final").exists()


@pytest.mark.slow
def test_style_transfer_cli_on_device_synth(tmp_path):
    """Full synthetic pipeline glue: stage-1 synth training produces the
    encoder artifact, then the style-transfer CLI consumes it via
    --encoder_npz and writes a best-by-improvement TCN artifact."""
    import json

    from mst_tpu.cli import train as s1_cli
    from mst_tpu.cli import train_style_transfer as st_cli

    enc_dir = tmp_path / "enc"
    common = [
        "--sample_rate", "8000", "--clip_duration", "0.25",
        "--n_fft", "256", "--hop_length", "64", "--n_mels", "32",
        "--encoder_dim", "32", "--band_split_size", "8", "--band_overlap", "4",
    ]
    s1_cli.main([
        "--on_device_synth", "--checkpoint_dir", str(enc_dir),
        "--log_dir", str(tmp_path / "logs"), *common,
        "--batch_size", "4", "--max_steps", "2",
        "--eval_interval", "2", "--eval_songs", "4", "--log_interval", "1",
    ])
    st_dir = tmp_path / "st"
    st_cli.main([
        "--on_device_synth", "--checkpoint_dir", str(st_dir),
        "--log_dir", str(tmp_path / "logs"), *common,
        "--encoder_npz", str(enc_dir / "encoder_synth_best.npz"),
        "--hidden_channels", "8", "--num_blocks", "2", "--kernel_size", "5",
        "--batch_size", "2", "--gradient_accumulation_steps", "2",
        "--max_steps", "4", "--eval_interval", "4", "--eval_pairs", "2",
        "--log_interval", "2", "--no_cycle_consistency",
    ])
    meta = json.loads((st_dir / "tcn_synth_best.json").read_text())
    assert (st_dir / "tcn_synth_best.npz").exists()
    assert meta["tcn"]["hidden_channels"] == 8

    # --init_npz warm-starts a continuation run from the saved artifact
    cont_dir = tmp_path / "st2"
    st_cli.main([
        "--on_device_synth", "--checkpoint_dir", str(cont_dir),
        "--log_dir", str(tmp_path / "logs"), *common,
        "--encoder_npz", str(enc_dir / "encoder_synth_best.npz"),
        "--init_npz", str(st_dir / "tcn_synth_best.npz"),
        "--hidden_channels", "8", "--num_blocks", "2", "--kernel_size", "5",
        "--batch_size", "2", "--gradient_accumulation_steps", "2",
        "--max_steps", "2", "--eval_interval", "2", "--eval_pairs", "2",
        "--log_interval", "1", "--no_cycle_consistency",
    ])
    assert (cont_dir / "tcn_synth_best.npz").exists()


@pytest.mark.slow
def test_style_transfer_cli_separator_domain(tmp_path):
    """--separator_npz trains the TCN on frozen-SCNet-separated stems (the
    serving domain) and records the self/cross improvement split — the
    round-5 domain-gap closure for zero-shot transfer on real audio."""
    import json

    from mst_tpu.checkpoints.npz_io import save_params_npz
    from mst_tpu.cli import train as s1_cli
    from mst_tpu.cli import train_style_transfer as st_cli
    from mst_tpu.separation import SCNet, SCNetConfig

    # tiny frozen separator artifact (npz + sibling config json, the
    # cli/train_separation.py format from_checkpoint consumes)
    sep_cfg_meta = {"n_fft": 256, "hop_length": 64, "dims": [4, 8, 16, 24],
                    "num_dplayers": 1, "rnn_hidden": 8, "rnn_impl": "lru"}
    scfg = SCNetConfig.from_meta(sep_cfg_meta)
    model = SCNet(scfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 2, 1000)))
    sep_npz = tmp_path / "scnet_tiny.npz"
    save_params_npz(sep_npz, variables["params"])
    sep_npz.with_suffix(".json").write_text(json.dumps(
        {"config": sep_cfg_meta, "chunk_seconds": 0.125,
         "sample_rate": 8000}))

    enc_dir = tmp_path / "enc"
    common = [
        "--sample_rate", "8000", "--clip_duration", "0.25",
        "--n_fft", "256", "--hop_length", "64", "--n_mels", "32",
        "--encoder_dim", "32", "--band_split_size", "8", "--band_overlap", "4",
    ]
    s1_cli.main([
        "--on_device_synth", "--checkpoint_dir", str(enc_dir),
        "--log_dir", str(tmp_path / "logs"), *common,
        "--batch_size", "4", "--max_steps", "2",
        "--eval_interval", "2", "--eval_songs", "4", "--log_interval", "1",
    ])
    st_dir = tmp_path / "st"
    st_cli.main([
        "--on_device_synth", "--synth_version", "2",
        "--checkpoint_dir", str(st_dir),
        "--log_dir", str(tmp_path / "logs"), *common,
        "--encoder_npz", str(enc_dir / "encoder_synth_best.npz"),
        "--separator_npz", str(sep_npz),
        "--hidden_channels", "8", "--num_blocks", "2", "--kernel_size", "5",
        "--batch_size", "2", "--gradient_accumulation_steps", "2",
        "--max_steps", "4", "--eval_interval", "4", "--eval_pairs", "2",
        "--log_interval", "2", "--no_cycle_consistency",
    ])
    meta = json.loads((st_dir / "tcn_synth2_sep_best.json").read_text())
    assert (st_dir / "tcn_synth2_sep_best.npz").exists()
    assert meta["separator_npz"] == str(sep_npz)
    # the eval split is recorded: half same-content (demo protocol),
    # half cross-content (reference two-song protocol)
    assert "improvement_self" in meta and "improvement_cross" in meta
    assert np.isfinite(meta["improvement_self"])
    assert np.isfinite(meta["improvement_cross"])
