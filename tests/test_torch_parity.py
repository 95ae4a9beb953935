"""Embedding parity: reference-architecture torch encoder -> converted flax.

The reference repo ships no trained checkpoints, so parity is tested the
strongest available way: a torch replica with the reference's exact module
names is randomly initialized, its state_dict is converted with
``mst_tpu.checkpoints.torch_compat``, and both models must produce the same
embedding (cosine >= 0.999 — the BASELINE.json acceptance bar) on the same
input.  This exercises every layout mapping a real checkpoint would."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mst_tpu.config import AudioConfig, EncoderConfig
from mst_tpu.checkpoints import (
    encoder_params_from_torch,
    tcn_params_from_torch,
    film_generator_params_from_torch,
    discriminator_params_from_torch,
    encoder_params_to_torch,
    tcn_params_to_torch,
    film_generator_params_to_torch,
    save_torch_checkpoint,
)
from mst_tpu.models import MixingStyleEncoder, TCNMixer, TCNFiLMGenerator, SongIdentityDiscriminator
from mst_tpu.config import TCNConfig
from tests.torch_encoder import TorchMixingStyleEncoder


CLIP_SECONDS = 2.0


@pytest.mark.parametrize(
    "n_fft,hop,n_mels,split,overlap,embed",
    [(1024, 256, 128, 20, 10, 768), (2048, 512, 80, 16, 8, 512)],
    ids=["default", "trained"],
)
def test_encoder_embedding_parity(rng, n_fft, hop, n_mels, split, overlap, embed):
    torch.manual_seed(0)
    tmodel = TorchMixingStyleEncoder(
        n_fft=n_fft, hop=hop, n_mels=n_mels, split_size=split,
        overlap=overlap, embed_dim=embed, feature_dim=64,
        clip_seconds=CLIP_SECONDS,
    ).eval()

    T = int(44100 * CLIP_SECONDS)
    stems = rng.standard_normal((2, 4, 2, T)).astype(np.float32) * 0.1
    feats = rng.standard_normal((2, 64)).astype(np.float32)

    with torch.no_grad():
        ref_emb = tmodel(torch.from_numpy(stems), torch.from_numpy(feats)).numpy()

    cfg = EncoderConfig(
        audio=AudioConfig(n_fft=n_fft, hop_length=hop, n_mels=n_mels,
                          clip_duration=CLIP_SECONDS),
        split_size=split, overlap=overlap, embed_dim=embed, feature_dim=64,
    )
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = encoder_params_from_torch(sd, cfg.n_subbands)

    model = MixingStyleEncoder(cfg)
    got = np.asarray(
        model.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            jnp.asarray(stems), jnp.asarray(feats), train=False,
        )
    )

    assert got.shape == ref_emb.shape
    for b in range(got.shape[0]):
        cos = np.dot(got[b], ref_emb[b]) / (
            np.linalg.norm(got[b]) * np.linalg.norm(ref_emb[b]) + 1e-12
        )
        assert cos >= 0.999, f"cosine {cos}"
    np.testing.assert_allclose(got, ref_emb, atol=5e-2, rtol=1e-2)


def test_tcn_parity(rng):
    """Torch TCN (reference layout) -> converted flax TCN, same output."""
    import torch.nn as tnn
    import torch.nn.functional as F

    class TorchConv(tnn.Module):
        def __init__(self, ch, k, d):
            super().__init__()
            self.conv = tnn.Conv1d(ch, ch, k, padding=((k - 1) * d) // 2, dilation=d)

        def forward(self, x):
            return self.conv(x)

    class TorchBlock(tnn.Module):
        def __init__(self, ch, k, d):
            super().__init__()
            self.conv1 = TorchConv(ch, k, d)
            self.conv2 = TorchConv(ch, k, d)
            self.norm1 = tnn.BatchNorm1d(ch)
            self.norm2 = tnn.BatchNorm1d(ch)

        def forward(self, x):
            r = x
            h = F.leaky_relu(self.norm1(self.conv1(x)), 0.2)
            h = self.norm2(self.conv2(h))
            return F.leaky_relu(h + r, 0.2)

    class TorchTCN(tnn.Module):
        def __init__(self, in_ch=8, hid=16, blocks=4, k=5):
            super().__init__()
            self.input_conv = tnn.Conv1d(in_ch, hid, 1)
            self.blocks = tnn.ModuleList(
                [TorchBlock(hid, k, 2**i) for i in range(blocks)]
            )
            self.output_conv = tnn.Conv1d(hid, in_ch, 1)
            tnn.init.normal_(self.output_conv.weight, 0.0, 0.001)
            tnn.init.zeros_(self.output_conv.bias)

        def forward(self, x):
            h = self.input_conv(x)
            for b in self.blocks:
                h = b(h)
            return self.output_conv(h) + x

    torch.manual_seed(1)
    tm = TorchTCN().eval()
    x = rng.standard_normal((2, 8, 4096)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = tcn_params_from_torch(sd, num_blocks=4)
    cfg = TCNConfig(in_channels=8, hidden_channels=16, num_blocks=4,
                    kernel_size=5, use_film=False)
    tcn = TCNMixer(cfg)
    got = np.asarray(
        tcn.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 1))), train=False)
    )
    got = np.transpose(got, (0, 2, 1))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-3)


def test_film_generator_and_discriminator_parity(rng):
    import torch.nn as tnn

    class TorchGen(tnn.Module):
        def __init__(self, embed=64, blocks=4, hid=16):
            super().__init__()
            self.mlp = tnn.Sequential(
                tnn.Linear(embed, 512), tnn.LeakyReLU(0.2), tnn.Dropout(0.1),
                tnn.Linear(512, 512), tnn.LeakyReLU(0.2), tnn.Dropout(0.1),
                tnn.Linear(512, blocks * 4 * hid),
            )

        def forward(self, x):
            return self.mlp(x)

    torch.manual_seed(2)
    tg = TorchGen().eval()
    emb = rng.standard_normal((3, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tg(torch.from_numpy(emb)).numpy().reshape(3, 4, 4, 16)

    variables = film_generator_params_from_torch(
        {k: v.numpy() for k, v in tg.state_dict().items()}
    )
    cfg = TCNConfig(hidden_channels=16, num_blocks=4, film_embed_dim=64,
                    use_film=True)
    gen = TCNFiLMGenerator(cfg)
    g1, b1, g2, b2 = gen.apply(variables, jnp.asarray(emb), train=False)
    np.testing.assert_allclose(np.asarray(g1), ref[:, :, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(b2), ref[:, :, 3], atol=1e-5)

    class TorchDisc(tnn.Module):
        def __init__(self, d=32):
            super().__init__()
            self.network = tnn.Sequential(
                tnn.Linear(d, d), tnn.ReLU(), tnn.Dropout(0.3),
                tnn.Linear(d, d), tnn.ReLU(), tnn.Dropout(0.3),
                tnn.Linear(d, d),
            )

        def forward(self, x):
            return self.network(x)

    td = TorchDisc().eval()
    x = rng.standard_normal((3, 32)).astype(np.float32)
    with torch.no_grad():
        dref = td(torch.from_numpy(x)).numpy()
    dv = discriminator_params_from_torch(
        {k: v.numpy() for k, v in td.state_dict().items()}
    )
    disc = SongIdentityDiscriminator(hidden_dim=32, output_dim=32)
    dgot = np.asarray(disc.apply(dv, jnp.asarray(x), train=False))
    np.testing.assert_allclose(dgot, dref, atol=1e-5)


def _tree_equal(a, b):
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_encoder_export_roundtrip(rng):
    """flax -> torch .pt layout -> flax reproduces the exact tree
    (SURVEY.md §5: to/from the PyTorch layout for parity checks)."""
    cfg = EncoderConfig(
        audio=AudioConfig(n_fft=512, hop_length=128, n_mels=64,
                          clip_duration=0.5),
        split_size=16, overlap=8, embed_dim=32, feature_dim=64,
    )
    model = MixingStyleEncoder(cfg)
    T = cfg.audio.clip_samples
    variables = jax.jit(model.init)(
        jax.random.key(3), jnp.zeros((1, 4, 2, T)), jnp.zeros((1, 64)))
    sd = encoder_params_to_torch(variables)
    back = encoder_params_from_torch(sd, cfg.n_subbands)
    _tree_equal(variables["params"], back["params"])
    _tree_equal(variables["batch_stats"], back["batch_stats"])
    # and the exported layout is loadable by the torch replica
    tmodel = TorchMixingStyleEncoder(
        n_fft=512, hop=128, n_mels=64, split_size=16, overlap=8,
        embed_dim=32, feature_dim=64, clip_seconds=0.5,
    )
    # mel fb/window are derived buffers (recomputed from config), not weights
    res = tmodel.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    assert not res.unexpected_keys
    assert all(k.startswith("audio_encoder.mel.") for k in res.missing_keys)


def test_tcn_and_film_export_roundtrip(tmp_path, rng):
    cfg = TCNConfig(in_channels=8, hidden_channels=16, num_blocks=3,
                    kernel_size=5, use_film=False)
    tcn = TCNMixer(cfg)
    tvars = jax.jit(tcn.init)(jax.random.key(4), jnp.zeros((1, 256, 8)))
    sd = tcn_params_to_torch(tvars)
    back = tcn_params_from_torch(sd, num_blocks=3)
    _tree_equal(tvars["params"], back["params"])
    _tree_equal(tvars["batch_stats"], back["batch_stats"])

    gcfg = TCNConfig(hidden_channels=16, num_blocks=3, film_embed_dim=64,
                     use_film=True)
    gen = TCNFiLMGenerator(gcfg)
    gvars = jax.jit(gen.init)(jax.random.key(5), jnp.zeros((1, 64)))
    gsd = film_generator_params_to_torch(gvars)
    gback = film_generator_params_from_torch(gsd)
    _tree_equal(gvars["params"], gback["params"])

    # reference-layout .pt on disk: content + the architecture hyperparams
    # the reference trainer forgot (SURVEY.md §2.5)
    from mst_tpu.checkpoints import load_torch_checkpoint

    path = tmp_path / "st.pt"
    save_torch_checkpoint(
        path, {"tcn_state_dict": sd, "film_generator_state_dict": gsd},
        epoch=7, hidden_channels=16, num_blocks=3, kernel_size=5,
    )
    ckpt = load_torch_checkpoint(str(path))
    assert ckpt["epoch"] == 7 and ckpt["hidden_channels"] == 16
    back2 = tcn_params_from_torch(ckpt["tcn_state_dict"], num_blocks=3)
    _tree_equal(tvars["params"], back2["params"])
