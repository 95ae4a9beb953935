"""TCN hyperparameter grid search (ref: inference/grid_search_tcn.py).

Sweeps optimizer LR x steps x hidden x blocks over fixed seeded pairs; JSON
results + ranked summary (ref grid: :205-211, seeded pairs :190-192).
"""

from __future__ import annotations

import argparse
import itertools
import json
from pathlib import Path

import numpy as np


def get_params(argv=None):
    from mst_tpu.cli._common import add_audio_args, add_model_args

    p = argparse.ArgumentParser(description="TCN grid search (TPU)")
    p.add_argument("--separated_path", type=str, required=True)
    add_audio_args(p)
    add_model_args(p)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--num_pairs", type=int, default=5)
    p.add_argument("--learning_rates", type=float, nargs="+",
                   default=[1e-2, 1e-3, 1e-4])
    p.add_argument("--num_steps_list", type=int, nargs="+", default=[200, 500])
    p.add_argument("--hidden_channels_list", type=int, nargs="+", default=[8, 16])
    p.add_argument("--num_blocks_list", type=int, nargs="+", default=[8, 10])
    p.add_argument("--output_dir", type=str, default="grid_search_results/")
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def main(argv=None):
    args = get_params(argv)

    import jax
    import jax.numpy as jnp

    from mst_tpu.checkpoints import restore_checkpoint
    from mst_tpu.cli._common import encoder_config_from_args, feature_config_from_args
    from mst_tpu.config import Stage1Config, TCNConfig
    from mst_tpu.data import StyleTransferDataset
    from mst_tpu.eval.per_pair import optimize_pair
    from mst_tpu.models import MixingStyleEncoder
    from mst_tpu.train import create_stage1_state

    enc_cfg = encoder_config_from_args(args)
    fcfg = feature_config_from_args(args)
    enc = MixingStyleEncoder(enc_cfg)
    s1state, _, _ = create_stage1_state(
        Stage1Config(encoder=enc_cfg, features=fcfg), jax.random.key(args.seed), 1
    )
    if args.checkpoint:
        s1state = restore_checkpoint(args.checkpoint, None, s1state)
    enc_vars = {"params": s1state.params, "batch_stats": s1state.batch_stats}
    enc_apply = lambda stems, feats: enc.apply(enc_vars, stems, feats, train=False)
    # fused embedding: one shared mel for features + encoder front-end
    from mst_tpu.pipeline import embed_stems
    embed_fn = lambda stems: embed_stems(enc, enc_vars, stems, fcfg)

    dataset = StyleTransferDataset(args.separated_path, args.sample_rate,
                                   args.clip_duration, seed=args.seed)
    rng = np.random.default_rng(args.seed)  # seeded pair selection (ref: :190-192)
    pairs = []
    for _ in range(args.num_pairs):
        idx = int(rng.integers(0, len(dataset)))
        inp, tgt = dataset[idx]
        pairs.append((jnp.asarray(inp), jnp.asarray(tgt)))

    grid = list(itertools.product(
        args.learning_rates, args.num_steps_list,
        args.hidden_channels_list, args.num_blocks_list,
    ))
    print(f"grid search: {len(grid)} configs x {len(pairs)} pairs")

    results = []
    for ci, (lr, steps, hidden, blocks) in enumerate(grid):
        tcn_cfg = TCNConfig(hidden_channels=hidden, num_blocks=blocks,
                            kernel_size=5, use_film=False)
        improvements = []
        for pi, (inp, tgt) in enumerate(pairs):
            _, res = optimize_pair(enc_apply, fcfg, inp, tgt, tcn_cfg,
                                   steps, lr, rng=jax.random.key(args.seed + pi),
                                   embed_fn=embed_fn)
            improvements.append(res["improvement"])
        rec = {
            "config": {"lr": lr, "steps": steps, "hidden": hidden, "blocks": blocks},
            "mean_improvement": float(np.mean(improvements)),
            "improvements": improvements,
        }
        results.append(rec)
        print(f"[{ci + 1}/{len(grid)}] lr={lr} steps={steps} hidden={hidden} "
              f"blocks={blocks}: mean improvement {rec['mean_improvement']:.1%}")

    results.sort(key=lambda r: -r["mean_improvement"])
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / "results.json").write_text(json.dumps(results, indent=2))
    print("\n== ranked summary ==")
    for r in results[:10]:
        print(f"  {r['mean_improvement']:+.1%}  {r['config']}")


if __name__ == "__main__":
    main()
