"""Fit a post-hoc song-identity null-space projection for an encoder.

Closed-form alternative to the reference's in-training GRL removal
(ref: src/train.py:130-204, src/grl.py) — see eval/inlp.py.  Embeds two
disjoint crops per track with the frozen encoder (TPU), iteratively
removes the ridge-probe-predictive subspace fit on crop A, and reports
the held-out crop-B leakage after each round.  The saved projection is
consumed by ``cli/probe_song_identity --projection_npz`` (full metrics,
including the style-retrieval signals that must survive).

    python -m mst_tpu.cli.remove_song_identity \
        --encoder_npz artifacts/encoder_adv_baseline.npz \
        --separated_path /tmp/corpus --song_id_cache /tmp/corpus/songid.npz \
        --rounds 6 --rank 8 --output artifacts/identity_nullspace.npz
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def get_params(argv=None):
    p = argparse.ArgumentParser(
        description="Fit a song-identity null-space projection (INLP)")
    p.add_argument("--encoder_npz", type=str, required=True)
    p.add_argument("--separated_path", type=str, required=True)
    p.add_argument("--song_id_cache", type=str, required=True)
    p.add_argument("--rounds", type=int, default=6)
    p.add_argument("--rank", type=int, default=8,
                   help="predictive directions removed per round")
    p.add_argument("--l2", type=float, default=1.0)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--output", type=str, required=True,
                   help=".npz for the (D, D) projection + round history")
    p.add_argument("--matmul_precision", choices=("default", "highest"),
                   default="highest")
    return p.parse_args(argv)


def main(argv=None):
    args = get_params(argv)
    import jax

    from mst_tpu.cli.probe_song_identity import _embed_corpus
    from mst_tpu.cli.train import load_song_id_cache
    from mst_tpu.cli.train_style_transfer import _encoder_from_npz
    from mst_tpu.data.datasets import find_stem_dirs
    from mst_tpu.eval.inlp import fit_identity_nullspace

    with jax.default_matmul_precision(
            "highest" if args.matmul_precision == "highest" else "bfloat16"):
        enc, enc_vars, ecfg, fcfg = _encoder_from_npz(args.encoder_npz)
        track_dirs = find_stem_dirs(args.separated_path)
        emb, cache_paths = load_song_id_cache(args.song_id_cache)
        path_to_row = {p: i for i, p in enumerate(cache_paths)}
        rows = [path_to_row.get(str(d)) for d in track_dirs]
        keep = [i for i, r in enumerate(rows) if r is not None]
        track_dirs = [track_dirs[i] for i in keep]
        song_id = emb[[rows[i] for i in keep]]
        emb_a, emb_b = _embed_corpus(args, enc, enc_vars, ecfg, fcfg,
                                     track_dirs)

    proj, history = fit_identity_nullspace(
        emb_a, song_id, rounds=args.rounds, rank=args.rank, l2=args.l2,
        emb_val=emb_b,
    )
    np.savez(args.output, projection=proj.astype(np.float32),
             history=json.dumps(history),
             encoder_npz=str(args.encoder_npz),
             rounds=args.rounds, rank=args.rank, l2=args.l2)
    summary = {"output": str(args.output), "rounds": history}
    Path(args.output).with_suffix(".json").write_text(
        json.dumps(summary, indent=2))
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
