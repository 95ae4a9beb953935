"""Per-pair optimization over selected distinctive pairs
(ref: inference/run_distinctive_pairs_transfer.py).

Consumes distinctive_pairs.json from select_distinctive_pairs and runs the
per-pair TCN optimization on each, saving transferred audio + results.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def get_params(argv=None):
    from mst_tpu.cli._common import add_audio_args, add_model_args

    p = argparse.ArgumentParser(description="Distinctive-pair transfer (TPU)")
    p.add_argument("--pairs_json", type=str, required=True)
    add_audio_args(p)
    add_model_args(p)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--encoder_npz", type=str, default=None,
                   help="trained encoder artifact (.npz + sibling .json "
                        "config); overrides --checkpoint and the "
                        "audio/model args")
    p.add_argument("--num_steps", type=int, default=200)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--output_dir", type=str, default="distinctive_transfer/")
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def main(argv=None):
    args = get_params(argv)

    import jax
    import jax.numpy as jnp

    from mst_tpu.checkpoints import restore_checkpoint
    from mst_tpu.cli._common import encoder_config_from_args, feature_config_from_args
    from mst_tpu.config import Stage1Config, TCNConfig
    from mst_tpu.data import load_stems, write_wav
    from mst_tpu.eval.per_pair import optimize_pairs
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
    enc_apply = lambda stems, feats: enc.apply(enc_vars, stems, feats, train=False)
    # fused embedding: one shared mel for features + encoder front-end
    from mst_tpu.pipeline import embed_stems
    embed_fn = lambda stems: embed_stems(enc, enc_vars, stems, fcfg)

    pairs = json.loads(Path(args.pairs_json).read_text())["pairs"]
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    n = int(args.clip_duration * args.sample_rate)

    def _clip(stems):
        padded = np.zeros((4, 2, n), np.float32)
        s = stems[..., :n]
        padded[..., : s.shape[-1]] = s
        return padded

    inputs = np.stack([_clip(load_stems(p["track_a"], args.sample_rate))
                       for p in pairs])
    targets = np.stack([_clip(load_stems(p["track_b"], args.sample_rate))
                        for p in pairs])

    # all pairs optimize as ONE vmapped program, sharded over the mesh
    mesh = None
    if len(jax.devices()) > 1:
        from mst_tpu.parallel import make_mesh

        mesh = make_mesh()
    out_stems, res = optimize_pairs(
        enc_apply, fcfg, jnp.asarray(inputs), jnp.asarray(targets),
        TCNConfig(hidden_channels=16, num_blocks=8, kernel_size=5,
                  use_film=False),
        args.num_steps, args.learning_rate,
        rng=jax.random.key(args.seed), embed_fn=embed_fn, mesh=mesh,
    )
    results = []
    for i, pair in enumerate(pairs):
        r = {
            "pair": i,
            "similarity": pair["similarity"],
            "initial_distance": float(res["initial_distance"][i]),
            "final_distance": float(res["final_distance"][i]),
            "improvement": float(res["improvement"][i]),
            "converged": bool(res["converged"][i]),
        }
        results.append(r)
        write_wav(out / f"pair{i}_transferred.wav",
                  np.asarray(out_stems[i]).sum(0), args.sample_rate)
        print(f"pair {i}: improvement {r['improvement']:.1%}")

    (out / "results.json").write_text(json.dumps(results, indent=2))
    print(json.dumps({"pairs": len(results),
                      "mean_improvement": float(np.mean([r["improvement"] for r in results])) if results else None}))


if __name__ == "__main__":
    main()
