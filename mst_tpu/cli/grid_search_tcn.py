"""TCN hyperparameter grid search (ref: inference/grid_search_tcn.py).

Sweeps optimizer x LR x steps x hidden x receptive-field-seconds over fixed
seeded pairs (ref grid: :205-211, seeded pairs :190-192); JSON results +
ranked summary.  Unlike the reference's serial 30-50 h loop
(ref scripts/run_grid_search.sh:20-27), the P pairs of each config run as
ONE vmapped program with the pair axis sharded over the device mesh
(eval/per_pair.py:optimize_pairs).
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
    # ref grid dims (grid_search_tcn.py:205-211)
    p.add_argument("--optimizers", type=str, nargs="+",
                   default=["adam", "adamw"], choices=["adam", "adamw"])
    p.add_argument("--learning_rates", type=float, nargs="+",
                   default=[5e-4, 1e-3, 2e-3])
    p.add_argument("--num_steps_list", type=int, nargs="+", default=[300, 500])
    p.add_argument("--hidden_channels_list", type=int, nargs="+", default=[8, 16])
    p.add_argument("--receptive_field_list", type=float, nargs="+",
                   default=[1.5, 2.0, 3.0],
                   help="receptive field in seconds; solved to num_blocks "
                        "via models.tcn.create_tcn_config")
    p.add_argument("--num_blocks_list", type=int, nargs="+", default=None,
                   help="sweep explicit block counts instead of "
                        "--receptive_field_list")
    p.add_argument("--kernel_size", type=int, default=15)
    p.add_argument("--output_dir", type=str, default="grid_search_results/")
    p.add_argument("--no_mesh", action="store_true",
                   help="disable sharding the pair axis over the mesh")
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
    from mst_tpu.eval.per_pair import optimize_pairs
    from mst_tpu.models import MixingStyleEncoder
    from mst_tpu.models.tcn import create_tcn_config
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
    # fused embedding: one shared mel for features + encoder front-end
    from mst_tpu.pipeline import embed_stems
    embed_fn = lambda stems: embed_stems(enc, enc_vars, stems, fcfg)

    mesh = None
    if not args.no_mesh and len(jax.devices()) > 1:
        from mst_tpu.parallel import make_mesh

        mesh = make_mesh()
        print(f"pair axis sharded over {len(jax.devices())} devices")

    dataset = StyleTransferDataset(args.separated_path, args.sample_rate,
                                   args.clip_duration, seed=args.seed)
    rng = np.random.default_rng(args.seed)  # seeded pair selection (ref: :190-192)
    inputs, targets = [], []
    for _ in range(args.num_pairs):
        idx = int(rng.integers(0, len(dataset)))
        inp, tgt = dataset[idx]
        inputs.append(inp)
        targets.append(tgt)
    inputs = jnp.asarray(np.stack(inputs))    # (P, 4, 2, T)
    targets = jnp.asarray(np.stack(targets))

    if args.num_blocks_list is not None:
        arch_axis = [("blocks", b) for b in args.num_blocks_list]
    else:
        arch_axis = [("rf_seconds", rf) for rf in args.receptive_field_list]

    grid = list(itertools.product(
        args.optimizers, args.learning_rates, args.num_steps_list,
        args.hidden_channels_list, arch_axis,
    ))
    print(f"grid search: {len(grid)} configs x {args.num_pairs} pairs")

    results = []
    for ci, (opt, lr, steps, hidden, (akind, aval)) in enumerate(grid):
        if akind == "blocks":
            tcn_cfg = TCNConfig(hidden_channels=hidden, num_blocks=int(aval),
                                kernel_size=args.kernel_size, use_film=False)
        else:
            tcn_cfg = create_tcn_config(
                receptive_field_seconds=float(aval),
                sample_rate=args.sample_rate, hidden_channels=hidden,
                kernel_size=args.kernel_size,
            )
        _, res = optimize_pairs(
            None, fcfg, inputs, targets, tcn_cfg, steps, lr,
            rng=jax.random.key(args.seed), embed_fn=embed_fn,
            optimizer=opt, mesh=mesh,
        )
        improvements = [float(x) for x in res["improvement"]]
        rec = {
            "config": {"optimizer": opt, "lr": lr, "steps": steps,
                       "hidden": hidden, akind: aval,
                       "blocks": tcn_cfg.num_blocks},
            "mean_improvement": float(np.mean(improvements)),
            "improvements": improvements,
            "converged": int(np.sum(res["converged"])),
        }
        results.append(rec)
        print(f"[{ci + 1}/{len(grid)}] opt={opt} lr={lr} steps={steps} "
              f"hidden={hidden} {akind}={aval}: "
              f"mean improvement {rec['mean_improvement']:.1%} "
              f"({rec['converged']}/{args.num_pairs} converged)")

    results.sort(key=lambda r: -r["mean_improvement"])
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / "results.json").write_text(json.dumps(results, indent=2))
    print("\n== ranked summary ==")
    for r in results[:10]:
        print(f"  {r['mean_improvement']:+.1%}  {r['config']}")


if __name__ == "__main__":
    main()
