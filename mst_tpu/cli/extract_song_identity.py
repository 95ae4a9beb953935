"""Song-identity embedding extraction
(ref: scripts/extract_song_identity_embeddings.py).

Pipeline parity: stems -> mono mixture @ 22.05 kHz -> CQT (84 bins, hop 512)
-> mean-downsample x20 along time -> per-bin standardize -> pad/crop to 7600
frames -> embedding model -> L2-normalized 512-d, cached with
{embeddings, track_paths, failed_tracks} (ref: :241-248; stored as .npz).

The reference's embedding model is the external Discogs-VINet CQTNet whose
weights are NOT vendored (same situation as the reference checkout).  The
model slot is pluggable: by default a seeded random-projection embedder maps
the standardized CQT to 512-d — deterministic and distance-preserving
(Johnson-Lindenstrauss), adequate as the adversarial target's stand-in and
replaceable by real VINet weights via --vinet_params (.npz with 'proj').
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


def main(argv=None):
    args = get_params(argv)

    import jax.numpy as jnp

    from mst_tpu.data import find_stem_dirs, load_stems
    from mst_tpu.ops.cqt import cqt

    dirs = find_stem_dirs(args.separated_path)
    print(f"{len(dirs)} tracks")

    if args.vinet_params:
        proj = np.load(args.vinet_params)["proj"]
    else:
        print("WARNING: no VINet weights; using seeded random projection")
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
            # summary-pool the *valid* (un-padded) region into 16 chunks of
            # per-bin (mean, std) -> (n_bins*32,).  Standardization makes
            # plain means ~0, so std carries the temporal structure.
            valid = min(mag.shape[1] // args.downsample, args.max_frames)
            chunks = np.array_split(feat[:, :max(valid, 16)], 16, axis=1)
            pooled = np.concatenate(
                [np.concatenate([c.mean(axis=1), c.std(axis=1)]) for c in chunks]
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
        embeddings=np.stack(embeddings) if embeddings else np.zeros((0, args.embed_dim)),
        track_paths=np.asarray(paths, dtype=object),
        failed_tracks=np.asarray([json.dumps(f) for f in failed], dtype=object),
    )
    print(json.dumps({"embedded": len(embeddings), "failed": len(failed),
                      "output": args.output}))


if __name__ == "__main__":
    main()
