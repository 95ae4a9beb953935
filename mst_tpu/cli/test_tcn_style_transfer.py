"""Per-pair TCN optimization driver (ref: inference/test_tcn_style_transfer.py).

Optimizes a fresh TCN per random (input, target) pair and reports
embedding-distance improvement + convergence (>=20% reduction).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def get_params(argv=None):
    from mst_tpu.cli._common import add_audio_args, add_model_args

    p = argparse.ArgumentParser(description="Per-pair TCN style transfer (TPU)")
    p.add_argument("--separated_path", type=str, required=True)
    add_audio_args(p)
    add_model_args(p)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--checkpoint_torch", type=str, default=None)
    p.add_argument("--num_pairs", type=int, default=5)
    p.add_argument("--num_steps", type=int, default=200)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--hidden_channels", type=int, default=16)
    p.add_argument("--num_blocks", type=int, default=8)
    p.add_argument("--kernel_size", type=int, default=5)
    p.add_argument("--output_dir", type=str, default="tcn_test_results/")
    p.add_argument("--save_audio", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def main(argv=None):
    args = get_params(argv)

    import jax
    import jax.numpy as jnp

    from mst_tpu.checkpoints import (
        encoder_params_from_torch, load_torch_checkpoint, restore_checkpoint,
    )
    from mst_tpu.cli._common import encoder_config_from_args, feature_config_from_args
    from mst_tpu.config import Stage1Config, TCNConfig
    from mst_tpu.data import StyleTransferDataset, write_wav
    from mst_tpu.eval.per_pair import optimize_pairs
    from mst_tpu.models import MixingStyleEncoder
    from mst_tpu.train import create_stage1_state

    enc_cfg = encoder_config_from_args(args)
    fcfg = feature_config_from_args(args)
    enc = MixingStyleEncoder(enc_cfg)
    s1state, _, _ = create_stage1_state(
        Stage1Config(encoder=enc_cfg, features=fcfg), jax.random.key(args.seed), 1
    )
    if args.checkpoint_torch:
        ckpt = load_torch_checkpoint(args.checkpoint_torch)
        enc_vars = encoder_params_from_torch(ckpt["model_state_dict"], enc_cfg.n_subbands)
    elif args.checkpoint:
        s1state = restore_checkpoint(args.checkpoint, None, s1state)
        enc_vars = {"params": s1state.params, "batch_stats": s1state.batch_stats}
    else:
        print("WARNING: randomly initialized encoder")
        enc_vars = {"params": s1state.params, "batch_stats": s1state.batch_stats}

    enc_apply = lambda stems, feats: enc.apply(enc_vars, stems, feats, train=False)
    # fused embedding: one shared mel for features + encoder front-end
    from mst_tpu.pipeline import embed_stems
    embed_fn = lambda stems: embed_stems(enc, enc_vars, stems, fcfg)
    tcn_cfg = TCNConfig(hidden_channels=args.hidden_channels,
                        num_blocks=args.num_blocks,
                        kernel_size=args.kernel_size, use_film=False)

    dataset = StyleTransferDataset(args.separated_path, args.sample_rate,
                                   args.clip_duration, seed=args.seed)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    inputs, targets = [], []
    for _ in range(args.num_pairs):
        idx = int(rng.integers(0, len(dataset)))
        inp, tgt = dataset[idx]
        inputs.append(inp)
        targets.append(tgt)

    # all pairs optimize as ONE vmapped program, sharded over the mesh
    mesh = None
    if len(jax.devices()) > 1:
        from mst_tpu.parallel import make_mesh

        mesh = make_mesh()
    out_stems, res = optimize_pairs(
        enc_apply, fcfg, jnp.asarray(np.stack(inputs)),
        jnp.asarray(np.stack(targets)), tcn_cfg, args.num_steps,
        args.learning_rate, rng=jax.random.key(args.seed),
        embed_fn=embed_fn, mesh=mesh,
    )
    results = []
    for p in range(args.num_pairs):
        r = {
            "pair": p,
            "initial_distance": float(res["initial_distance"][p]),
            "final_distance": float(res["final_distance"][p]),
            "improvement": float(res["improvement"][p]),
            "converged": bool(res["converged"][p]),
            "identity_init_error": float(res["identity_init_error"][p]),
        }
        results.append(r)
        print(f"pair {p}: init={r['initial_distance']:.4f} "
              f"final={r['final_distance']:.4f} "
              f"improvement={r['improvement']:.1%} converged={r['converged']}")
        if args.save_audio:
            write_wav(out / f"pair{p}_transferred.wav",
                      np.asarray(out_stems[p]).sum(0), args.sample_rate)

    summary = {
        "num_pairs": len(results),
        "converged": sum(r["converged"] for r in results),
        "mean_improvement": float(np.mean([r["improvement"] for r in results])),
        "results": results,
    }
    (out / "results.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps({k: v for k, v in summary.items() if k != "results"}))


if __name__ == "__main__":
    main()
