"""Distinctive pair selection (ref: inference/select_distinctive_pairs.py).

Embeds every track, computes the pairwise cosine matrix on device, picks the
lowest-similarity pairs -> distinctive_pairs.json.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def get_params(argv=None):
    from mst_tpu.cli._common import add_audio_args, add_model_args

    p = argparse.ArgumentParser(description="Select distinctive pairs (TPU)")
    p.add_argument("--separated_path", type=str, required=True)
    add_audio_args(p)
    add_model_args(p)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--encoder_npz", type=str, default=None,
                   help="trained encoder artifact (.npz + sibling .json "
                        "config); overrides --checkpoint and the "
                        "audio/model args")
    p.add_argument("--num_pairs", type=int, default=10)
    p.add_argument("--output", type=str, default="distinctive_pairs.json")
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def main(argv=None):
    args = get_params(argv)

    import jax

    from mst_tpu.checkpoints import restore_checkpoint
    from mst_tpu.cli._common import encoder_config_from_args, feature_config_from_args
    from mst_tpu.config import Stage1Config
    from mst_tpu.data import FMABaselineDataset
    from mst_tpu.eval import build_embedding_cache
    from mst_tpu.models import MixingStyleEncoder
    from mst_tpu.train import create_stage1_state

    if args.encoder_npz:
        from mst_tpu.cli.train_style_transfer import _encoder_from_npz

        enc, enc_vars, enc_cfg, fcfg = _encoder_from_npz(args.encoder_npz)
        args.sample_rate = enc_cfg.audio.sample_rate
        args.clip_duration = enc_cfg.audio.clip_duration
    else:
        enc_cfg = encoder_config_from_args(args)
        fcfg = feature_config_from_args(args)
        enc = MixingStyleEncoder(enc_cfg)
        s1state, _, _ = create_stage1_state(
            Stage1Config(encoder=enc_cfg, features=fcfg),
            jax.random.key(args.seed), 1
        )
        if args.checkpoint:
            s1state = restore_checkpoint(args.checkpoint, None, s1state)
        enc_vars = {"params": s1state.params,
                    "batch_stats": s1state.batch_stats}

    dataset = FMABaselineDataset(args.separated_path, args.sample_rate,
                                 args.clip_duration, num_segments=1,
                                 seed=args.seed)
    cache = build_embedding_cache(
        enc, enc_vars, dataset, np.arange(len(dataset)), fcfg,
        segment="first", clip_duration=args.clip_duration,
    )
    e = cache["embeddings"]
    e = e / (np.linalg.norm(e, axis=1, keepdims=True) + 1e-12)
    sims = e @ e.T
    n = len(e)
    iu = np.triu_indices(n, k=1)
    order = np.argsort(sims[iu])
    pairs = []
    for k in order[: args.num_pairs]:
        i, j = iu[0][k], iu[1][k]
        pairs.append({
            "track_a": cache["track_paths"][i],
            "track_b": cache["track_paths"][j],
            "similarity": float(sims[i, j]),
        })
    Path(args.output).write_text(json.dumps({"pairs": pairs}, indent=2))
    print(json.dumps({"num_pairs": len(pairs),
                      "min_similarity": pairs[0]["similarity"] if pairs else None}))


if __name__ == "__main__":
    main()
