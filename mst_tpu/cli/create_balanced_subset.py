"""Balanced MUSDB subset creation (ref: inference/create_balanced_musdb_subset.py).

Sliding-window (10 s, stride 1 s) search for windows where every stem holds
>= min_energy_ratio of total RMS energy; extracts the minimum-std window per
track and writes stems + manifest.json.  The window energy scan runs
vectorized on device (one cumsum per track) instead of the reference's
per-window Python loop.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def get_params(argv=None):
    p = argparse.ArgumentParser(description="Balanced stem-subset creation (TPU)")
    p.add_argument("--musdb_root", type=str, required=True)
    p.add_argument("--output_root", type=str, required=True)
    p.add_argument("--sample_rate", type=int, default=44100)
    p.add_argument("--window_seconds", type=float, default=10.0)
    p.add_argument("--stride_seconds", type=float, default=1.0)
    p.add_argument("--min_energy_ratio", type=float, default=0.10)
    p.add_argument("--max_tracks", type=int, default=None)
    return p.parse_args(argv)


def windowed_stem_energies(stems: np.ndarray, win: int, stride: int) -> np.ndarray:
    """(4, 2, T) -> per-window per-stem mean-square energy (n_windows, 4)
    via one cumulative sum (no per-window loops)."""
    sq = (stems**2).mean(axis=1)  # (4, T)
    csum = np.concatenate([np.zeros((4, 1)), np.cumsum(sq, axis=1)], axis=1)
    T = sq.shape[1]
    if T < win:
        return np.zeros((0, 4))
    starts = np.arange(0, T - win + 1, stride)
    return ((csum[:, starts + win] - csum[:, starts]) / win).T  # (n_windows, 4)


def main(argv=None):
    args = get_params(argv)

    from mst_tpu.data import MUSDB18Dataset, write_wav
    from mst_tpu import STEMS

    ds = MUSDB18Dataset(args.musdb_root, args.sample_rate)
    out_root = Path(args.output_root)
    out_root.mkdir(parents=True, exist_ok=True)
    win = int(args.window_seconds * args.sample_rate)
    stride = int(args.stride_seconds * args.sample_rate)

    manifest = []
    n = len(ds) if args.max_tracks is None else min(len(ds), args.max_tracks)
    for i in range(n):
        item = ds[i]
        stems = item["stems"]
        energies = windowed_stem_energies(stems, win, stride)  # (W, 4)
        if len(energies) == 0:
            print(f"skip {item['name']}: shorter than window")
            continue
        total = energies.sum(axis=1, keepdims=True) + 1e-12
        ratios = energies / total
        balanced = (ratios >= args.min_energy_ratio).all(axis=1)
        if not balanced.any():
            print(f"skip {item['name']}: no balanced window")
            continue
        # among balanced windows pick the minimum ratio-std one (ref behavior)
        idx = np.where(balanced)[0]
        best = idx[np.argmin(ratios[idx].std(axis=1))]
        s = best * stride
        seg = stems[..., s : s + win]
        d = out_root / item["name"]
        d.mkdir(parents=True, exist_ok=True)
        for k, name in enumerate(STEMS):
            write_wav(d / f"{name}.wav", seg[k], args.sample_rate)
        manifest.append({
            "track": item["name"],
            "offset_seconds": s / args.sample_rate,
            "stem_ratios": ratios[best].tolist(),
        })
        print(f"{item['name']}: window @ {s / args.sample_rate:.1f}s "
              f"ratios {np.round(ratios[best], 3).tolist()}")

    (out_root / "manifest.json").write_text(json.dumps(manifest, indent=2))
    print(json.dumps({"tracks": len(manifest)}))


if __name__ == "__main__":
    main()
