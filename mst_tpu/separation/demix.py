"""Chunked overlap-add inference + the SCNetSeparator wrapper.

The reference's separator (ref: src/data.py:28-108) delegates to the
submodule's chunked ``demix``; here chunking is an explicit overlap-add over
fixed-size windows (static shapes — every chunk reuses one compiled forward)
with a triangular cross-fade, the standard long-audio source-separation
protocol.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from mst_tpu.separation.scnet import SCNet, SCNetConfig


def demix_track(
    apply_fn,
    mixture: np.ndarray,
    chunk_seconds: float = 10.0,
    overlap: float = 0.25,
    sample_rate: int = 44100,
    normalize: bool = True,
) -> np.ndarray:
    """Separate a full track: (2, T) -> (sources, 2, T).

    ``apply_fn``: jitted (1, 2, chunk) -> (1, S, 2, chunk) model forward.
    """
    C, T = mixture.shape
    chunk = int(chunk_seconds * sample_rate)
    hop = int(chunk * (1.0 - overlap))

    mean = mixture.mean() if normalize else 0.0
    std = mixture.std() + 1e-8 if normalize else 1.0
    x = (mixture - mean) / std

    # triangular cross-fade window
    win = np.minimum(np.arange(1, chunk + 1), np.arange(chunk, 0, -1))
    win = np.minimum(win / (chunk * overlap + 1e-9), 1.0).astype(np.float32)

    n_chunks = max(1, -(-max(T - chunk, 0) // hop) + 1)
    total = hop * (n_chunks - 1) + chunk
    xp = np.zeros((C, total), np.float32)
    xp[:, :T] = x

    out = None
    acc = np.zeros((total,), np.float32)
    for i in range(n_chunks):
        s = i * hop
        seg = xp[:, s : s + chunk]
        res = np.asarray(apply_fn(jnp.asarray(seg[None])))[0]  # (S, 2, chunk)
        if out is None:
            out = np.zeros((res.shape[0], C, total), np.float32)
        out[:, :, s : s + chunk] += res * win
        acc[s : s + chunk] += win
    out = out / np.maximum(acc, 1e-8)
    return out[:, :, :T] * std + mean


class SCNetSeparator:
    """Drop-in equivalent of the reference's SCNetSeparator
    (ref: data.py:28-108): ``separate((2, T)) -> (4, 2, T)`` stems in
    STEM order (vocals, bass, drums, other)."""

    def __init__(self, model: SCNet, variables: dict, sample_rate: int = 44100,
                 chunk_seconds: float = 10.0, overlap: float = 0.25,
                 compute_dtype: str | None = None):
        if compute_dtype and compute_dtype != model.cfg.compute_dtype:
            from dataclasses import replace

            model = SCNet(replace(model.cfg, compute_dtype=compute_dtype))
        self.model = model
        self.variables = variables
        self.sr = sample_rate
        self.chunk_seconds = chunk_seconds
        self.overlap = overlap
        self._apply = jax.jit(lambda x: model.apply(variables, x))

    @classmethod
    def from_checkpoint(cls, checkpoint_dir: str | None, sample_rate: int = 44100,
                        cfg: SCNetConfig | None = None,
                        chunk_seconds: float = 10.0,
                        compute_dtype: str | None = None) -> "SCNetSeparator":
        """``checkpoint_dir``: an orbax directory, a ``.npz`` params file
        (checkpoints/npz_io.py — the shipped trained artifact format), or
        None for untrained weights.  For a ``.npz`` with a sibling ``.json``
        metadata file (written by cli/train_separation.py), the SCNet config
        and training chunk length are read from it so the separator runs at
        the resolution it was trained at.

        With ``checkpoint_dir=None`` and no explicit ``cfg``, the repo's
        committed demonstration artifact (artifacts/scnet_synth_best.npz)
        is used when present — the reference likewise ships a default
        pretrained checkpoint path (ref:
        inference/inference_e2e_style_transfer.py:200-205); untrained
        weights are the last resort."""
        meta = None
        if checkpoint_dir is None and cfg is None:
            art = Path(__file__).resolve().parents[2] / "artifacts"
            # flagship first (best committed held-out SI-SDR), older
            # demonstration artifacts as fallbacks; a candidate needs BOTH
            # the weights and the sibling config json (a bare .npz would
            # silently load under a default config with the wrong dims)
            for name in ("scnet_synth2_xl_best", "scnet_synth2_lru_best",
                         "scnet_synth2_best", "scnet_synth_best"):
                if ((art / f"{name}.npz").exists()
                        and (art / f"{name}.json").exists()):
                    checkpoint_dir = str(art / f"{name}.npz")
                    break
        path = Path(str(checkpoint_dir)) if checkpoint_dir is not None else None
        if path is not None and path.suffix == ".npz":
            meta_path = path.with_suffix(".json")
            if cfg is None and meta_path.exists():
                import json

                meta = json.loads(meta_path.read_text())
                cfg = SCNetConfig.from_meta(meta.get("config", {}))
                chunk_seconds = meta.get("chunk_seconds", chunk_seconds)
        cfg = cfg or SCNetConfig()
        model = SCNet(cfg)
        chunk = int(chunk_seconds * sample_rate)
        dummy = jnp.zeros((1, cfg.audio_channels, chunk))
        if path is not None and path.suffix == ".npz" and path.exists():
            from mst_tpu.checkpoints.npz_io import load_params_npz

            variables = {"params": load_params_npz(path)}
            print(f"loaded SCNet weights from {path}")
        else:
            variables = jax.jit(model.init)(jax.random.key(0), dummy)
            if path is not None and path.exists():
                from mst_tpu.checkpoints import restore_checkpoint

                variables = restore_checkpoint(checkpoint_dir, None, variables)
                print(f"loaded SCNet weights from {checkpoint_dir}")
            else:
                print("WARNING: SCNet running with untrained weights")
        sep = cls(model, variables, sample_rate, chunk_seconds=chunk_seconds,
                  compute_dtype=compute_dtype)
        # provenance for artifact metadata: the RESOLVED path (the default-
        # resolution order above can change as better artifacts land)
        sep.checkpoint_path = str(path) if path is not None else None
        return sep

    def separate(self, mixture: np.ndarray) -> np.ndarray:
        return demix_track(
            self._apply, np.asarray(mixture, np.float32),
            self.chunk_seconds, self.overlap, self.sr,
        )


def make_demix_batch_fn(model, variables, T: int,
                        chunk_seconds: float = 10.0, overlap: float = 0.25,
                        sample_rate: int = 44100, normalize: bool = True):
    """Jit-friendly batched chunked separation: (B, C, T) -> (B, S, C, T).

    Same protocol as :func:`demix_track` (per-item scalar normalization,
    triangular cross-fade overlap-add; ref chunked demix: src/data.py:87-95)
    but with a *static* chunk grid so the whole thing traces into one XLA
    program — all chunks of all batch items run as ONE model forward of
    shape (B * n_chunks, C, chunk), which is how the separator joins a
    jitted data path (e.g. separator-domain style-transfer training).
    """
    chunk = int(chunk_seconds * sample_rate)
    chunk = min(chunk, max(T, 1))
    hop = max(1, int(chunk * (1.0 - overlap)))
    n_chunks = max(1, -(-max(T - chunk, 0) // hop) + 1)
    total = hop * (n_chunks - 1) + chunk

    win = np.minimum(np.arange(1, chunk + 1), np.arange(chunk, 0, -1))
    win = np.minimum(win / (chunk * overlap + 1e-9), 1.0).astype(np.float32)
    acc = np.zeros((total,), np.float32)
    for i in range(n_chunks):
        acc[i * hop : i * hop + chunk] += win
    inv_acc = (1.0 / np.maximum(acc, 1e-8)).astype(np.float32)
    win_j, inv_acc_j = jnp.asarray(win), jnp.asarray(inv_acc)

    def fn(mix: jax.Array) -> jax.Array:
        B, C, _ = mix.shape
        if normalize:
            mean = mix.mean(axis=(1, 2), keepdims=True)
            std = mix.std(axis=(1, 2), keepdims=True) + 1e-8
        else:
            mean = jnp.zeros((B, 1, 1), mix.dtype)
            std = jnp.ones((B, 1, 1), mix.dtype)
        x = (mix - mean) / std
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, total - T)))
        chunks = jnp.stack(
            [xp[:, :, i * hop : i * hop + chunk] for i in range(n_chunks)],
            axis=1)  # (B, n, C, chunk)
        res = model.apply(variables, chunks.reshape(B * n_chunks, C, chunk))
        S = res.shape[1]
        res = res.reshape(B, n_chunks, S, C, chunk) * win_j
        out = jnp.zeros((B, S, C, total), res.dtype)
        for i in range(n_chunks):
            out = out.at[..., i * hop : i * hop + chunk].add(res[:, i])
        out = (out * inv_acc_j)[..., :T]
        return out * std[:, None] + mean[:, None]

    return fn
