"""SCNet separation training CLI (new capability — the reference consumes a
pretrained checkpoint it cannot ship; SURVEY.md §2.1 + §7 risks).

    python -m mst_tpu.cli.train_separation --musdb_root /data/musdb_stems \
        --checkpoint_dir checkpoints/scnet

Trains SCNet from scratch on stem corpora (MUSDB-style dirs with
vocals/bass/drums/other files): random 10 s chunks, remix augmentation,
L1 + MR-STFT loss, SI-SDR validation.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def get_params(argv=None):
    p = argparse.ArgumentParser(description="SCNet separation training (TPU)")
    p.add_argument("--musdb_root", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--sample_rate", type=int, default=44100)
    p.add_argument("--chunk_seconds", type=float, default=10.0)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--num_epochs", type=int, default=100)
    p.add_argument("--learning_rate", type=float, default=5e-4)
    p.add_argument("--n_fft", type=int, default=4096)
    p.add_argument("--hop_length", type=int, default=1024)
    p.add_argument("--dims", type=int, nargs="+", default=[4, 32, 64, 128])
    p.add_argument("--num_dplayers", type=int, default=6)
    p.add_argument("--no_augment", action="store_true")
    p.add_argument("--log_interval", type=int, default=10)
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints/scnet")
    p.add_argument("--log_dir", type=str, default="logs/")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--num_workers", type=int, default=4)
    return p.parse_args(argv)


def main(argv=None):
    args = get_params(argv)

    import jax
    import jax.numpy as jnp

    from mst_tpu.checkpoints import save_checkpoint
    from mst_tpu.cli._common import MetricsLogger
    from mst_tpu.data import (
        FMABaselineDataset,
        PrefetchLoader,
        baseline_collate,
        make_synthetic_corpus,
        train_val_split,
    )
    from mst_tpu.separation import SCNetConfig
    from mst_tpu.separation.train import (
        create_separation_state,
        make_separation_train_step,
        si_sdr,
    )

    if args.synthetic:
        root = Path(args.checkpoint_dir) / "synthetic_corpus"
        if not root.exists():
            make_synthetic_corpus(root, n_tracks=8,
                                  duration=args.chunk_seconds + 1.0,
                                  sample_rate=args.sample_rate)
        args.musdb_root = str(root)
    if args.musdb_root is None:
        raise SystemExit("--musdb_root (or --synthetic) is required")

    cfg = SCNetConfig(
        n_fft=args.n_fft, hop_length=args.hop_length,
        dims=tuple(args.dims), num_dplayers=args.num_dplayers,
    )
    chunk = int(args.chunk_seconds * args.sample_rate)

    dataset = FMABaselineDataset(args.musdb_root, args.sample_rate,
                                 args.chunk_seconds, num_segments=1,
                                 seed=args.seed)
    train_idx, val_idx = train_val_split(len(dataset), 0.1, args.seed)
    loader = PrefetchLoader(dataset, args.batch_size, baseline_collate,
                            indices=train_idx, num_workers=args.num_workers,
                            seed=args.seed)
    total_steps = max(len(loader), 1) * args.num_epochs

    state, model, tx = create_separation_state(
        cfg, jax.random.key(args.seed), total_steps,
        args.learning_rate, chunk,
    )
    step_fn = make_separation_train_step(model, tx, augment=not args.no_augment)
    eval_fn = jax.jit(
        lambda params, stems: jnp.mean(
            si_sdr(model.apply({"params": params}, jnp.sum(stems, axis=1)), stems)
        )
    )

    logger = MetricsLogger(args.log_dir, "scnet")
    rng = jax.random.key(args.seed + 1)
    ckpt_dir = Path(args.checkpoint_dir).absolute()
    stop = False
    for epoch in range(args.num_epochs):
        if stop:
            break
        for batch in loader:
            state, metrics = step_fn(state, {"stems": batch["stems"]}, rng)
            step = int(state.step)
            if step % args.log_interval == 0:
                logger.log(step, loss=float(metrics["loss"]))
                print(f"epoch {epoch} step {step}: loss={float(metrics['loss']):.4f}")
            if args.max_steps and step >= args.max_steps:
                stop = True
                break
        if len(val_idx) > 0:
            sdrs = []
            for i in val_idx[:4]:
                segs, _, _ = dataset[int(i)]
                sdrs.append(float(eval_fn(state.params, jnp.asarray(segs))))
            print(f"epoch {epoch}: val SI-SDR {np.mean(sdrs):.2f} dB")
            logger.log(int(state.step), val_si_sdr=float(np.mean(sdrs)))
        save_checkpoint(ckpt_dir, int(state.step), {"params": state.params}, cfg)

    logger.close()
    print(json.dumps({"final_step": int(state.step)}))


if __name__ == "__main__":
    main()
