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
    p.add_argument("--synthetic", action="store_true",
                   help="tiny on-disk synthetic corpus (integration tests)")
    p.add_argument("--on_device_synth", action="store_true",
                   help="synthesize stems INSIDE the jitted step "
                        "(separation/synth.py): infinite fresh data, zero "
                        "host involvement — the round-2 demonstration recipe")
    p.add_argument("--synth_version", type=int, default=1, choices=(1, 2),
                   help="procedural corpus: 1 = disjoint-signature stems "
                        "(easy), 2 = shared-harmony/overlapping-spectra "
                        "with per-song mixing styles (separation/synth_v2.py)")
    p.add_argument("--eval_interval", type=int, default=500)
    p.add_argument("--eval_songs", type=int, default=16,
                   help="held-out synthetic songs for SI-SDR eval (fixed "
                        "set: best-artifact selection needs a stable metric)")
    p.add_argument("--save_interval", type=int, default=1000)
    p.add_argument("--sample_rate", type=int, default=44100)
    p.add_argument("--chunk_seconds", type=float, default=10.0)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--num_epochs", type=int, default=100)
    p.add_argument("--learning_rate", type=float, default=5e-4)
    p.add_argument("--n_fft", type=int, default=4096)
    p.add_argument("--hop_length", type=int, default=1024)
    p.add_argument("--dims", type=int, nargs="+", default=[4, 32, 64, 128])
    p.add_argument("--num_dplayers", type=int, default=6)
    p.add_argument("--rnn_hidden", type=int, default=128,
                   help="dual-path RNN hidden size (scale with dims[-1])")
    p.add_argument("--loss_balance", action="store_true",
                   help="per-source scale-normalized loss "
                        "(separation_loss_balanced): every stem gets an "
                        "equal gradient vote regardless of its mix level — "
                        "the fix for the pass-through 'other' stem")
    p.add_argument("--loss", choices=("paper", "balanced", "sisdr"),
                   default=None,
                   help="objective: 'paper' L1+MR-STFT, 'balanced' "
                        "per-source scale-normalized, 'sisdr' soft-capped "
                        "negative SI-SDR + mixture-consistency (trains on "
                        "the eval metric directly; separation_loss_sisdr). "
                        "Default: 'balanced' if --loss_balance else 'paper'")
    p.add_argument("--rnn_impl", choices=("flax", "fused", "lru"),
                   default="flax",
                   help="dual-path core: 'flax'/'fused' BiLSTM (same "
                        "checkpoints) or 'lru' associative-scan linear "
                        "recurrence (different model, own checkpoints)")
    p.add_argument("--no_augment", action="store_true")
    p.add_argument("--log_interval", type=int, default=10)
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints/scnet")
    p.add_argument("--log_dir", type=str, default="logs/")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--resume_npz", type=str, default=None,
                   help="warm-start params from a .npz artifact (fresh "
                        "optimizer; use a lower --learning_rate)")
    p.add_argument("--data_seed", type=int, default=None,
                   help="seed for the on-device training data stream only "
                        "(defaults to --seed).  The stream is fold_in(key, "
                        "step) and a warm start resets step to 0, so a "
                        "continuation with the same seed would replay the "
                        "original stream; set a fresh --data_seed while "
                        "--seed keeps the held-out eval set comparable to "
                        "the committed best artifact")
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

    if args.on_device_synth:
        return _train_on_device_synth(args)

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
        rnn_hidden=args.rnn_hidden, rnn_impl=args.rnn_impl,
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


def _train_on_device_synth(args):
    """Fully on-device training: procedural stems generated inside the jit
    (separation/synth.py), held-out SI-SDR eval on a disjoint key stream,
    best-by-SI-SDR .npz artifact committed under --checkpoint_dir."""
    import jax

    from mst_tpu.checkpoints.npz_io import save_params_npz
    from mst_tpu.cli._common import MetricsLogger
    from mst_tpu.separation import SCNetConfig
    from mst_tpu.separation.train import (
        create_separation_state,
        make_synth_eval_fn,
        make_synth_train_step,
    )

    cfg = SCNetConfig(
        n_fft=args.n_fft, hop_length=args.hop_length,
        dims=tuple(args.dims), num_dplayers=args.num_dplayers,
        rnn_hidden=args.rnn_hidden, rnn_impl=args.rnn_impl,
    )
    chunk = int(args.chunk_seconds * args.sample_rate)
    total_steps = args.max_steps or 30000

    state, model, tx = create_separation_state(
        cfg, jax.random.key(args.seed), total_steps, args.learning_rate, chunk
    )
    if args.resume_npz:
        from mst_tpu.checkpoints.npz_io import load_params_npz

        warm = load_params_npz(args.resume_npz)
        state = state.replace(params=warm)
        print(f"warm-started params from {args.resume_npz}", flush=True)
    step_fn = make_synth_train_step(model, tx, args.batch_size, chunk,
                                    float(args.sample_rate),
                                    augment=not args.no_augment,
                                    synth_version=args.synth_version,
                                    balanced_loss=args.loss_balance,
                                    loss=args.loss)
    eval_fn = make_synth_eval_fn(model, args.eval_songs, chunk,
                                 float(args.sample_rate),
                                 synth_version=args.synth_version)

    # per-corpus-version artifact names: v2 scores are not comparable to v1
    stem = "scnet_synth" if args.synth_version == 1 else "scnet_synth2"
    logger = MetricsLogger(args.log_dir, stem)
    data_seed = args.seed if args.data_seed is None else args.data_seed
    rng = jax.random.key(data_seed + 1)
    eval_key = jax.random.key(args.seed + 777_000)  # disjoint from training
    ckpt_dir = Path(args.checkpoint_dir).absolute()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    best_sdr = -1e9
    prev_meta = ckpt_dir / f"{stem}_best.json"
    if prev_meta.exists():  # never regress the committed best artifact
        best_sdr = float(json.loads(prev_meta.read_text())["si_sdr"])
        print(f"existing best SI-SDR {best_sdr:.2f} dB — only saving above it",
              flush=True)

    for _ in range(total_steps):
        state, metrics = step_fn(state, rng)
        step = int(state.step)
        if step % args.log_interval == 0:
            loss = float(metrics["loss"])
            logger.log(step, loss=loss)
            print(f"step {step}/{total_steps}: loss={loss:.4f}", flush=True)
        if step % args.eval_interval == 0 or step == total_steps:
            # FIXED held-out set (not re-drawn per eval): best-artifact
            # selection compares like with like instead of eval-set noise
            r = eval_fn(state.params, eval_key)
            sdr = float(r["si_sdr"])
            per = [round(float(x), 2) for x in r["si_sdr_per_stem"]]
            base = float(r["input_si_sdr"])
            base_per = [round(float(x), 2)
                        for x in r["input_si_sdr_per_stem"]]
            logger.log(step, val_si_sdr=sdr, input_si_sdr=base)
            print(f"step {step}: held-out SI-SDR {sdr:.2f} dB "
                  f"(per-stem {per}, mixture baseline {base:.2f} "
                  f"per-stem {base_per})", flush=True)
            if sdr > best_sdr:
                best_sdr = sdr
                save_params_npz(ckpt_dir / f"{stem}_best.npz", state.params)
                (ckpt_dir / f"{stem}_best.json").write_text(json.dumps({
                    "step": step, "si_sdr": sdr, "si_sdr_per_stem": per,
                    "input_si_sdr": base,
                    "input_si_sdr_per_stem": base_per,
                    "chunk_seconds": args.chunk_seconds,
                    "sample_rate": args.sample_rate,
                    "synth_version": args.synth_version,
                    "loss_balance": args.loss_balance,
                    "loss": args.loss or (
                        "balanced" if args.loss_balance else "paper"),
                    "config": {"n_fft": cfg.n_fft, "hop_length": cfg.hop_length,
                               "dims": list(cfg.dims),
                               "num_dplayers": cfg.num_dplayers,
                               "rnn_hidden": cfg.rnn_hidden,
                               "rnn_impl": cfg.rnn_impl},
                }, indent=2))
        if step % args.save_interval == 0:
            save_params_npz(ckpt_dir / f"{stem}_last.npz", state.params)

    logger.close()
    print(json.dumps({"final_step": int(state.step), "best_si_sdr": best_sdr}))


if __name__ == "__main__":
    main()
