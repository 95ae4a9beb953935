"""Song-identity embedding extraction
(ref: scripts/extract_song_identity_embeddings.py).

Pipeline parity: stems -> mono mixture @ 22.05 kHz -> CQT (84 bins, hop 512)
-> mean-downsample x20 along time -> per-bin standardize -> pad/crop to 7600
frames -> embedding model -> L2-normalized 512-d, cached with
{embeddings, track_paths, failed_tracks} (ref: :241-248; stored as .npz).

The embedding model is pluggable:

- ``--cqtnet_checkpoint``: run the real CQTNet (models/cqtnet.py — the
  Discogs-VINet architecture the reference loads,
  ref: scripts/extract_song_identity_embeddings.py:37-58,169-183) on the
  preprocessed CQT.  Accepts a torch ``.pt``/``.pth`` state dict (imported
  via checkpoints.cqtnet_params_from_torch) or a flax ``.npz`` variables
  snapshot (checkpoints/npz_io.py).  ``ch_in``/``ch_out`` are inferred from
  the weights.
- default (no checkpoint): a seeded random-projection embedder maps the
  standardized CQT to 512-d — deterministic and distance-preserving
  (Johnson-Lindenstrauss), the stand-in when no upstream weights exist
  (the reference checkout likewise lacks the VINet submodule).  Legacy
  ``--vinet_params`` (.npz with 'proj') overrides the projection matrix.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def get_params(argv=None):
    p = argparse.ArgumentParser(description="Song-identity embeddings (TPU)")
    p.add_argument("--separated_path", type=str, required=True)
    p.add_argument("--output", type=str, default="song_identity_embeddings.npz")
    p.add_argument("--sample_rate", type=int, default=22050)
    p.add_argument("--n_bins", type=int, default=84)
    p.add_argument("--hop_length", type=int, default=512)
    p.add_argument("--downsample", type=int, default=20)
    p.add_argument("--max_frames", type=int, default=7600)
    p.add_argument("--embed_dim", type=int, default=512)
    p.add_argument("--cqtnet_checkpoint", type=str, default=None,
                   help="CQTNet weights: torch .pt/.pth state dict or flax "
                        ".npz variables; runs the real model instead of the "
                        "random-projection stand-in")
    p.add_argument("--vinet_params", type=str, default=None)
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def preprocess_cqt(mag: np.ndarray, downsample: int, max_frames: int) -> np.ndarray:
    """(n_bins, F) -> (n_bins, max_frames): x20 mean-downsample, per-bin
    standardize, pad/crop (ref: :150-176)."""
    F = (mag.shape[1] // downsample) * downsample
    m = mag[:, :F].reshape(mag.shape[0], -1, downsample).mean(axis=2)
    mu = m.mean(axis=1, keepdims=True)
    sd = m.std(axis=1, keepdims=True) + 1e-8
    m = (m - mu) / sd
    if m.shape[1] >= max_frames:
        return m[:, :max_frames]
    out = np.zeros((m.shape[0], max_frames), np.float32)
    out[:, : m.shape[1]] = m
    return out


def load_cqtnet(path):
    """(model, variables) from a torch .pt/.pth state dict or flax .npz;
    ch_in/ch_out inferred from the projection/conv0 weight shapes."""
    from mst_tpu.models import CQTNet

    if str(path).endswith((".pt", ".pth")):
        import torch

        from mst_tpu.checkpoints import cqtnet_params_from_torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        for key in ("state_dict", "model_state_dict"):
            if isinstance(ckpt, dict) and key in ckpt:
                ckpt = ckpt[key]
                break
        sd = {k: np.asarray(v.detach().cpu() if hasattr(v, "detach") else v)
              for k, v in ckpt.items()}
        variables = cqtnet_params_from_torch(sd)
    else:
        from mst_tpu.checkpoints.npz_io import load_params_npz

        variables = load_params_npz(path)
    ch_in = int(variables["params"]["conv0"]["kernel"].shape[-1])
    ch_out = int(variables["params"]["projection"]["kernel"].shape[-1])
    return CQTNet(ch_in=ch_in, ch_out=ch_out), variables


def make_cqtnet_embed(path):
    """One compiled per-track embed: (n_bins, max_frames) CQT -> (D,)."""
    import jax

    model, variables = load_cqtnet(path)

    @jax.jit
    def embed(feat):
        return model.apply(variables, feat[None, :, :, None])[0]

    return embed, model.ch_out


def main(argv=None):
    args = get_params(argv)

    import jax.numpy as jnp

    from mst_tpu.data import find_stem_dirs, load_stems
    from mst_tpu.ops.cqt import cqt

    dirs = find_stem_dirs(args.separated_path)
    print(f"{len(dirs)} tracks")

    cqtnet_embed = None
    proj = None
    embed_dim = args.embed_dim
    if args.cqtnet_checkpoint:
        cqtnet_embed, embed_dim = make_cqtnet_embed(args.cqtnet_checkpoint)
        print(f"CQTNet from {args.cqtnet_checkpoint} ({embed_dim}-d)")
    elif args.vinet_params:
        proj = np.load(args.vinet_params)["proj"]
    else:
        print("WARNING: no CQTNet weights; using seeded random projection")
        rng = np.random.default_rng(args.seed)
        proj = rng.standard_normal(
            (args.n_bins * 32, args.embed_dim)
        ).astype(np.float32) / np.sqrt(args.n_bins * 32)

    embeddings, paths, failed = [], [], []
    for d in dirs:
        try:
            stems = load_stems(d, args.sample_rate)  # (4, 2, T)
            mixture = stems.sum(axis=0).mean(axis=0)  # mono (T,)
            mag = np.asarray(cqt(jnp.asarray(mixture), args.sample_rate,
                                 args.hop_length, args.n_bins))
            feat = preprocess_cqt(mag, args.downsample, args.max_frames)
            if cqtnet_embed is not None:
                # the reference feeds the padded CQT through the model
                # (ref: :169-183,278); output is already L2-normalized
                emb = np.asarray(cqtnet_embed(jnp.asarray(feat)))
            else:
                # JL stand-in: summary-pool the *valid* (un-padded) region
                # into 16 chunks of per-bin (mean, std) -> (n_bins*32,).
                # Standardization makes plain means ~0, so std carries the
                # temporal structure.
                valid = min(mag.shape[1] // args.downsample, args.max_frames)
                chunks = np.array_split(feat[:, :max(valid, 16)], 16, axis=1)
                pooled = np.concatenate(
                    [np.concatenate([c.mean(axis=1), c.std(axis=1)])
                     for c in chunks]
                )
                emb = pooled @ proj
            emb = emb / max(np.linalg.norm(emb), 1e-8)
            embeddings.append(emb.astype(np.float32))
            paths.append(str(d))
        except Exception as e:  # per-item tolerance (ref: :211-232)
            failed.append({"track": str(d), "error": str(e)})
            print(f"FAILED {d}: {e}")

    np.savez(
        args.output,
        embeddings=np.stack(embeddings) if embeddings else np.zeros((0, embed_dim)),
        track_paths=np.asarray(paths, dtype=object),
        failed_tracks=np.asarray([json.dumps(f) for f in failed], dtype=object),
    )
    print(json.dumps({"embedded": len(embeddings), "failed": len(failed),
                      "output": args.output}))


if __name__ == "__main__":
    main()
