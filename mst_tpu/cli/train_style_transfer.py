"""Style-transfer (TCN) training CLI (ref: src/train_style_transfer.py:410-483).

    python -m mst_tpu.cli.train_style_transfer --separated_path /data/stems \
        --encoder_checkpoint ckpts/stage1/best --hidden_channels 128 \
        --num_blocks 14 --kernel_size 15

The frozen encoder loads from an orbax Stage-1 checkpoint or a reference
torch .pt (--encoder_checkpoint_torch).  Unlike the reference, checkpoints
always embed the TCN architecture hyperparams (fixes SURVEY.md §2.5's
missing-keys bug).
"""

from __future__ import annotations

import argparse
import json
from functools import partial
from pathlib import Path

import numpy as np


def get_params(argv=None):
    from mst_tpu.cli._common import add_audio_args, add_model_args

    p = argparse.ArgumentParser(description="TCN style transfer training (TPU)")
    p.add_argument("--separated_path", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--on_device_synth", action="store_true",
                   help="(input, target) pairs synthesized INSIDE the step "
                        "(separation/synth.py); pairs with the trained "
                        "encoder artifact via --encoder_npz; saves a "
                        "best-by-improvement TCN .npz artifact")
    p.add_argument("--encoder_npz", type=str, default=None,
                   help="frozen-encoder .npz artifact "
                        "(cli/train.py --on_device_synth output); its "
                        "sibling .json supplies the encoder config")
    p.add_argument("--synth_version", type=int, default=1, choices=(1, 2),
                   help="procedural corpus: 1 = disjoint-signature stems, "
                        "2 = shared-harmony songs with per-song mixing "
                        "styles (separation/synth_v2.py)")
    p.add_argument("--separator_npz", type=str, default=None,
                   help="separator-DOMAIN training (--on_device_synth only): "
                        "pass every synthesized mixture through this frozen "
                        "SCNet artifact inside the jitted data path and "
                        "train the TCN on the separated stems — the serving "
                        "domain (real audio is always separator output, "
                        "ref: inference_e2e_style_transfer.py:271-287). "
                        "Closes the clean-synth -> separator-output domain "
                        "gap that breaks zero-shot transfer on real audio.")
    p.add_argument("--self_pair_prob", type=float, default=0.5,
                   help="separator-domain mode: probability a training pair "
                        "holds content fixed (target = the input's own "
                        "separated stems under a fresh mixing style — the "
                        "flagship demo protocol) vs a different song")
    p.add_argument("--gain_stage_rms_db", type=float, default=-16.0,
                   help="separator-domain mode: stage each pair's mixtures "
                        "to this RMS (dB), matching the serving CLI default")
    p.add_argument("--gain_jitter_db", type=float, default=3.0,
                   help="separator-domain mode: uniform +-dB jitter around "
                        "--gain_stage_rms_db during training (level "
                        "robustness; eval pairs use the exact level)")
    p.add_argument("--eval_interval", type=int, default=250)
    p.add_argument("--eval_pairs", type=int, default=16)
    p.add_argument("--matmul_precision", choices=("default", "highest"),
                   default="default",
                   help="'highest' = f32-equivalent matmuls (platform-"
                        "portable artifacts; ~2x slower on TPU)")
    p.add_argument("--num_workers", type=int, default=4)
    add_audio_args(p)
    add_model_args(p)
    # encoder (frozen)
    p.add_argument("--encoder_checkpoint", type=str, default=None)
    p.add_argument("--encoder_checkpoint_torch", type=str, default=None)
    # ref: train_style_transfer.py:421-426 — mixing_style (stem-based 512-d)
    # or fx_encoder (mixture-based 128-d)
    p.add_argument("--encoder_type", type=str, default="mixing_style",
                   choices=["mixing_style", "fx_encoder"])
    p.add_argument("--fx_encoder_checkpoint", type=str, default=None,
                   help=".npz FxEncoder params (models/fx_encoder.py)")
    p.add_argument("--fx_embed_dim", type=int, default=128)
    # TCN architecture (ref: train_style_transfer.py:431-445)
    p.add_argument("--hidden_channels", type=int, default=128)
    p.add_argument("--num_blocks", type=int, default=14)
    p.add_argument("--kernel_size", type=int, default=15)
    p.add_argument("--causal", action="store_true")
    # training
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--gradient_accumulation_steps", type=int, default=32)
    p.add_argument("--num_epochs", type=int, default=50)
    p.add_argument("--learning_rate", type=float, default=2e-4)
    p.add_argument("--use_cycle_consistency", action="store_true", default=True)
    p.add_argument("--no_cycle_consistency", dest="use_cycle_consistency",
                   action="store_false")
    p.add_argument("--lambda_cycle", type=float, default=0.1)
    p.add_argument("--remat", action="store_true",
                   help="rematerialize TCN blocks + output-embedding "
                        "encoder pass in backward (full 10 s clips fit in "
                        "one chip's HBM; trades FLOPs for memory)")
    p.add_argument("--log_interval", type=int, default=10)
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints_st/")
    p.add_argument("--log_dir", type=str, default="logs/")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--init_npz", type=str, default=None,
                   help="warm-start the TCN/FiLM weights from a previously "
                        "saved *_best.npz artifact (--on_device_synth only; "
                        "optimizer state restarts)")
    return p.parse_args(argv)


def _encoder_from_npz(npz_path):
    """(enc, variables, EncoderConfig, FeatureConfig) from a trained
    encoder artifact + its sibling metadata json."""
    from mst_tpu.checkpoints.npz_io import load_params_npz
    from mst_tpu.config import AudioConfig, EncoderConfig, FeatureConfig
    from mst_tpu.models import MixingStyleEncoder

    path = Path(npz_path)
    meta = json.loads(path.with_suffix(".json").read_text())
    c = meta["config"]
    audio = AudioConfig(
        sample_rate=meta["sample_rate"], clip_duration=meta["clip_duration"],
        n_fft=c["n_fft"], hop_length=c["hop_length"], n_mels=c["n_mels"],
        mel_method=c.get("mel_method", "rfft"),
    )
    ecfg = EncoderConfig(audio=audio, split_size=c["band_split_size"],
                         overlap=c["band_overlap"], embed_dim=c["encoder_dim"])
    return (MixingStyleEncoder(ecfg), load_params_npz(path), ecfg,
            FeatureConfig(audio=audio))


def _train_on_device_synth(args):
    import jax

    with jax.default_matmul_precision(
            "highest" if args.matmul_precision == "highest" else "bfloat16"):
        return _train_on_device_synth_inner(args)


def _train_on_device_synth_inner(args):
    """FiLM-TCN style-transfer training on device-synthesized (input,
    target) pairs with a frozen trained encoder: completes the fully
    trained reference stack (separator + encoder + TCN) with zero host
    data path.  Eval = mean e2e embedding-distance improvement
    (apply_style_transfer) on held-out pairs; best artifact saved as
    <checkpoint_dir>/tcn_synth_best.npz."""
    import jax
    import jax.numpy as jnp

    from mst_tpu.checkpoints.npz_io import save_params_npz
    from mst_tpu.cli._common import MetricsLogger
    from mst_tpu.config import StyleTransferConfig, TCNConfig
    from mst_tpu.parallel import data_sharding, make_mesh
    from mst_tpu.train import (
        apply_style_transfer,
        create_style_transfer_state,
        make_style_transfer_step,
    )

    if args.synth_version == 1:
        from mst_tpu.separation.synth import synth_batch
    else:
        from mst_tpu.separation.synth_v2 import synth_batch_v2 as synth_batch

    if not args.encoder_npz:
        raise SystemExit("--on_device_synth requires --encoder_npz "
                         "(trained encoder artifact)")
    enc, enc_vars, ecfg, fcfg = _encoder_from_npz(args.encoder_npz)
    print(f"frozen encoder from {args.encoder_npz} ({ecfg.embed_dim}-d)")

    # Mesh-default (pod-correct, no-op on one chip): pad the microbatch to a
    # device multiple so pairs shard on 'data'; grad accumulation supplies
    # the rest of the effective batch.
    n_dev = len(jax.devices())
    if args.batch_size % n_dev:
        new_bs = -(-args.batch_size // n_dev) * n_dev
        args.gradient_accumulation_steps = max(
            1, round(args.gradient_accumulation_steps
                     * args.batch_size / new_bs))
        print(f"NOTE: scaling microbatch {args.batch_size} -> {new_bs} over "
              f"{n_dev} devices (grad accumulation -> "
              f"{args.gradient_accumulation_steps})")
        args.batch_size = new_bs
    mesh = make_mesh()

    cfg = StyleTransferConfig(
        encoder=ecfg, features=fcfg,
        tcn=TCNConfig(
            hidden_channels=args.hidden_channels,
            num_blocks=args.num_blocks,
            kernel_size=args.kernel_size,
            causal=args.causal,
            use_film=True,
            film_embed_dim=2 * ecfg.embed_dim,
            remat=args.remat,
        ),
        batch_size=args.batch_size,
        grad_accum_steps=args.gradient_accumulation_steps,
        learning_rate=args.learning_rate,
        use_cycle_consistency=args.use_cycle_consistency,
        cycle_weight=args.lambda_cycle,
        remat_embed=args.remat,
        seed=args.seed,
    )
    total_steps = args.max_steps or 2000
    T = ecfg.audio.clip_samples
    sr = float(ecfg.audio.sample_rate)
    B = args.batch_size

    state, tcn, gen, tx = create_style_transfer_state(
        cfg, jax.random.key(args.seed), total_steps)
    if args.init_npz:
        from mst_tpu.checkpoints.npz_io import load_params_npz
        w = load_params_npz(args.init_npz)
        state = state.replace(tcn_params=w["tcn_params"],
                              tcn_batch_stats=w["tcn_batch_stats"],
                              film_params=w["film_params"])
        print(f"warm-started TCN/FiLM weights from {args.init_npz}")
    step_fn = make_style_transfer_step(cfg, enc, enc_vars, tcn, gen, tx,
                                       mesh=mesh)

    batch_sh = data_sharding(mesh)

    demix_fn = None
    if args.separator_npz:
        from mst_tpu.separation import SCNetSeparator
        from mst_tpu.separation.demix import make_demix_batch_fn
        from mst_tpu.separation.synth_v2 import render_style

        sep = SCNetSeparator.from_checkpoint(args.separator_npz,
                                             sample_rate=int(sr))
        demix_fn = make_demix_batch_fn(
            sep.model, sep.variables, T, chunk_seconds=sep.chunk_seconds,
            overlap=sep.overlap, sample_rate=int(sr))
        print(f"separator-domain training: {args.separator_npz} "
              f"(chunk {sep.chunk_seconds}s, self_pair_prob "
              f"{args.self_pair_prob}, stage {args.gain_stage_rms_db} dB "
              f"+-{args.gain_jitter_db})")

        def stage_stems(stems, key, jitter_db):
            """Scale each item so its MIXTURE RMS hits the staging level
            (the serving CLI's --gain_stage_rms_db protocol,
            cli/inference_e2e_style_transfer.py)."""
            mix = stems.sum(axis=1)  # (B, 2, T)
            rms = jnp.sqrt(jnp.mean(mix ** 2, axis=(1, 2)))
            db = args.gain_stage_rms_db
            if jitter_db:
                db = db + jax.random.uniform(
                    key, rms.shape, minval=-jitter_db, maxval=jitter_db)
            g = 10.0 ** (db / 20.0) / jnp.maximum(rms, 1e-9)
            return stems * g[:, None, None, None]

        def sep_domain_pairs(key, n, jitter_db, self_mask=None):
            """(input, target) pairs in the SERVING domain: input = SCNet
            of a synth mixture; target = either the input's own separated
            stems under a fresh style (same content, the flagship demo
            protocol) or a different separated song (cross-content, the
            reference's two-song protocol)."""
            ki, kt, ks, kp, kg1, kg2 = jax.random.split(key, 6)
            sep_i = demix_fn(synth_batch(ki, n, T, sr).sum(axis=1))
            sep_t = demix_fn(synth_batch(kt, n, T, sr).sum(axis=1))
            styled = render_style(ks, sep_i, sr)
            if self_mask is None:
                self_mask = jax.random.bernoulli(kp, args.self_pair_prob, (n,))
            tgt = jnp.where(self_mask[:, None, None, None], styled, sep_t)
            return (stage_stems(sep_i, kg1, jitter_db),
                    stage_stems(tgt, kg2, jitter_db))

    if demix_fn is None:
        @partial(jax.jit, out_shardings={"input_stems": batch_sh,
                                         "target_stems": batch_sh})
        def synth_pair(key):
            ki, kt = jax.random.split(key)
            return {"input_stems": synth_batch(ki, B, T, sr),
                    "target_stems": synth_batch(kt, B, T, sr)}

        @jax.jit
        def eval_pair(state, key):
            ki, kt = jax.random.split(key)
            inp = synth_batch(ki, args.eval_pairs, T, sr)
            tgt = synth_batch(kt, args.eval_pairs, T, sr)
            _, m = apply_style_transfer(cfg, enc, enc_vars, tcn, gen, state,
                                        inp, tgt)
            return (jnp.mean(m["improvement"]),
                    jnp.mean(m["initial_distance"]),
                    jnp.mean(m["final_distance"]), {})
    else:
        @partial(jax.jit, out_shardings={"input_stems": batch_sh,
                                         "target_stems": batch_sh})
        def synth_pair(key):
            inp, tgt = sep_domain_pairs(key, B, args.gain_jitter_db)
            return {"input_stems": inp, "target_stems": tgt}

        @jax.jit
        def eval_pair(state, key):
            # deterministic halves: first half same-content (demo
            # protocol), second half cross-content; exact staging level
            E = args.eval_pairs
            half = E // 2
            self_mask = jnp.arange(E) < half

            def one(k_and_m):
                k, m = k_and_m
                inp, tgt = sep_domain_pairs(k, 1, 0.0, self_mask=m[None])
                _, met = apply_style_transfer(cfg, enc, enc_vars, tcn, gen,
                                              state, inp, tgt)
                return (met["improvement"][0], met["initial_distance"][0],
                        met["final_distance"][0])

            # lax.map (not vmap): eval runs beside training jobs; one pair
            # at a time keeps peak HBM at the training step's level
            imp, d0, d1 = jax.lax.map(
                one, (jax.random.split(key, E), self_mask))
            return (jnp.mean(imp), jnp.mean(d0), jnp.mean(d1),
                    {"improvement_self": jnp.mean(imp[:half]),
                     "improvement_cross": jnp.mean(imp[half:])})

    stem = "tcn_synth" if args.synth_version == 1 else "tcn_synth2"
    if demix_fn is not None:
        stem += "_sep"
    logger = MetricsLogger(args.log_dir, f"style_transfer_{stem}")
    rng = jax.random.key(args.seed + 1)
    eval_key = jax.random.key(args.seed + 777_000)
    ckpt_dir = Path(args.checkpoint_dir).absolute()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    best_imp = -1e9
    prev_meta = ckpt_dir / f"{stem}_best.json"
    if prev_meta.exists():
        best_imp = float(json.loads(prev_meta.read_text())["improvement"])
        print(f"existing best improvement {best_imp:.3f} — only saving above")

    for i in range(total_steps):
        batch = synth_pair(jax.random.fold_in(rng, i))
        state, metrics = step_fn(state, batch, rng)
        step = int(state.step)
        if step % args.log_interval == 0:
            scalars = {k: float(v) for k, v in metrics.items()}
            logger.log(step, **scalars)
            print(f"step {step}/{total_steps}: " +
                  " ".join(f"{k}={v:.4f}" for k, v in scalars.items()),
                  flush=True)
        if step % args.eval_interval == 0 or step == total_steps:
            imp, d0, d1, extra = eval_pair(
                state, jax.random.fold_in(eval_key, step))
            imp, d0, d1 = float(imp), float(d0), float(d1)
            extra = {k: float(v) for k, v in extra.items()}
            logger.log(step, improvement=imp, **extra)
            print(f"step {step}: e2e improvement {imp:.3f} "
                  f"(distance {d0:.4f} -> {d1:.4f}, {args.eval_pairs} pairs"
                  + "".join(f", {k}={v:.3f}" for k, v in extra.items())
                  + ")", flush=True)
            if imp >= best_imp:
                best_imp = imp
                save_params_npz(ckpt_dir / f"{stem}_best.npz", {
                    "tcn_params": state.tcn_params,
                    "tcn_batch_stats": state.tcn_batch_stats,
                    "film_params": state.film_params,
                })
                prev_meta.write_text(json.dumps({
                    "step": step, "improvement": imp,
                    "initial_distance": d0, "final_distance": d1,
                    **extra,
                    "eval_pairs": args.eval_pairs,
                    "encoder_npz": str(args.encoder_npz),
                    "separator_npz": args.separator_npz,
                    "self_pair_prob": (args.self_pair_prob
                                       if args.separator_npz else None),
                    "gain_stage_rms_db": (args.gain_stage_rms_db
                                          if args.separator_npz else None),
                    "gain_jitter_db": (args.gain_jitter_db
                                       if args.separator_npz else None),
                    "synth_version": args.synth_version,
                    "matmul_precision": args.matmul_precision,
                    "tcn": {"hidden_channels": args.hidden_channels,
                            "num_blocks": args.num_blocks,
                            "kernel_size": args.kernel_size,
                            "causal": args.causal,
                            "film_embed_dim": 2 * ecfg.embed_dim},
                }, indent=2))

    logger.close()
    print(json.dumps({"final_step": int(state.step),
                      "best_improvement": best_imp}))


def main(argv=None):
    args = get_params(argv)

    if args.on_device_synth:
        return _train_on_device_synth(args)

    import jax

    from mst_tpu.checkpoints import (
        encoder_params_from_torch,
        load_torch_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )
    from mst_tpu.cli._common import (
        MetricsLogger,
        encoder_config_from_args,
        feature_config_from_args,
    )
    from mst_tpu.config import StyleTransferConfig, TCNConfig
    from mst_tpu.data import (
        PrefetchLoader,
        StyleTransferDataset,
        make_synthetic_corpus,
        style_transfer_collate,
        train_val_split,
    )
    from mst_tpu.models import MixingStyleEncoder
    from mst_tpu.train import (
        create_stage1_state,
        create_style_transfer_state,
        make_style_transfer_step,
    )

    if args.synthetic:
        root = Path(args.checkpoint_dir) / "synthetic_corpus"
        if not root.exists():
            make_synthetic_corpus(root, n_tracks=8, duration=3.0,
                                  sample_rate=args.sample_rate)
        args.separated_path = str(root)
    if args.separated_path is None:
        raise SystemExit("--separated_path (or --synthetic) is required")

    # Auto-scale the microbatch to the mesh instead of leaving a pod idle:
    # effective batch (microbatch * accumulation) is preserved by shrinking
    # the accumulation horizon as the microbatch grows.
    n_dev = len(jax.devices())
    if n_dev > 1 and args.batch_size % n_dev:
        new_bs = -(-args.batch_size // n_dev) * n_dev
        args.gradient_accumulation_steps = max(
            1, round(args.gradient_accumulation_steps
                     * args.batch_size / new_bs))
        print(f"NOTE: scaling microbatch {args.batch_size} -> {new_bs} over "
              f"{n_dev} devices (grad accumulation -> "
              f"{args.gradient_accumulation_steps})")
        args.batch_size = new_bs

    enc_cfg = encoder_config_from_args(args)
    cond_dim = (args.fx_embed_dim if args.encoder_type == "fx_encoder"
                else enc_cfg.embed_dim)
    cfg = StyleTransferConfig(
        encoder=enc_cfg,
        features=feature_config_from_args(args),
        tcn=TCNConfig(
            hidden_channels=args.hidden_channels,
            num_blocks=args.num_blocks,
            kernel_size=args.kernel_size,
            causal=args.causal,
            use_film=True,
            film_embed_dim=2 * cond_dim,
            remat=args.remat,
        ),
        batch_size=args.batch_size,
        grad_accum_steps=args.gradient_accumulation_steps,
        learning_rate=args.learning_rate,
        num_epochs=args.num_epochs,
        use_cycle_consistency=args.use_cycle_consistency,
        cycle_weight=args.lambda_cycle,
        seed=args.seed,
    )

    # frozen encoder (mixing_style stem-based, or fx_encoder mixture-based —
    # ref: train_style_transfer.py:501-556)
    embed_fn = None
    enc = MixingStyleEncoder(enc_cfg)
    from mst_tpu.config import Stage1Config

    s1cfg = Stage1Config(encoder=enc_cfg, features=cfg.features)
    s1state, _, _ = create_stage1_state(s1cfg, jax.random.key(args.seed), 1)
    if args.encoder_type == "fx_encoder":
        import jax.numpy as jnp

        from mst_tpu.models.fx_encoder import FxEncoder, make_fx_embed_fn

        fx = FxEncoder(audio=enc_cfg.audio, embed_dim=args.fx_embed_dim)
        if args.fx_encoder_checkpoint:
            from mst_tpu.checkpoints.npz_io import load_params_npz

            w = load_params_npz(args.fx_encoder_checkpoint)
            # trained artifacts carry {params, batch_stats}; bare param
            # trees (older snapshots) are wrapped
            fx_vars = w if "params" in w else {"params": w}
            print(f"loaded fx encoder from {args.fx_encoder_checkpoint}")
        else:
            print("WARNING: randomly initialized fx encoder (no checkpoint)")
            fx_vars = jax.jit(fx.init)(
                jax.random.key(args.seed),
                jnp.zeros((1, 2, enc_cfg.audio.clip_samples)))
        embed_fn = make_fx_embed_fn(fx, fx_vars)
        enc_vars = {"params": s1state.params, "batch_stats": s1state.batch_stats}
    elif args.encoder_checkpoint_torch:
        ckpt = load_torch_checkpoint(args.encoder_checkpoint_torch)
        enc_vars = encoder_params_from_torch(
            ckpt["model_state_dict"], enc_cfg.n_subbands
        )
    elif args.encoder_checkpoint:
        s1state = restore_checkpoint(args.encoder_checkpoint, None, s1state)
        enc_vars = {"params": s1state.params, "batch_stats": s1state.batch_stats}
        print(f"loaded encoder from {args.encoder_checkpoint}")
    else:
        print("WARNING: randomly initialized encoder (no checkpoint given)")
        enc_vars = {"params": s1state.params, "batch_stats": s1state.batch_stats}

    dataset = StyleTransferDataset(args.separated_path, args.sample_rate,
                                   args.clip_duration, seed=args.seed)
    train_idx, val_idx = train_val_split(len(dataset), 0.1, args.seed)
    # sharded stepping needs full device-divisible batches; tiny corpora
    # (< one batch) fall back to a single-device mesh instead
    shard_data = n_dev > 1 and len(train_idx) >= args.batch_size
    if n_dev > 1 and not shard_data:
        print(f"NOTE: corpus ({len(train_idx)} train pairs) smaller than one "
              f"batch; running unsharded")
    loader = PrefetchLoader(dataset, args.batch_size, style_transfer_collate,
                            indices=train_idx, num_workers=args.num_workers,
                            seed=args.seed, drop_last=shard_data)
    val_loader = PrefetchLoader(dataset, args.batch_size, style_transfer_collate,
                                indices=val_idx, shuffle=False,
                                num_workers=args.num_workers)

    total_steps = max(len(loader), 1) * args.num_epochs
    state, tcn, gen, tx = create_style_transfer_state(
        cfg, jax.random.key(args.seed), total_steps
    )
    # spread the microbatch over the chips (state replicated, batch on
    # 'data'); grad accumulation supplies the rest of the effective batch
    from mst_tpu.parallel import make_mesh

    mesh = make_mesh() if shard_data or n_dev == 1 else make_mesh((1,))
    if shard_data:
        print(f"data-parallel over {n_dev} devices")
    step_fn = make_style_transfer_step(cfg, enc, enc_vars, tcn, gen, tx,
                                       mesh=mesh, embed_fn=embed_fn)

    logger = MetricsLogger(args.log_dir, "style_transfer")
    rng = jax.random.key(args.seed + 1)
    ckpt_dir = Path(args.checkpoint_dir).absolute()
    (ckpt_dir).mkdir(parents=True, exist_ok=True)
    (ckpt_dir / "config.json").write_text(
        json.dumps({"tcn": {"hidden_channels": args.hidden_channels,
                            "num_blocks": args.num_blocks,
                            "kernel_size": args.kernel_size,
                            "causal": args.causal},
                    "encoder_type": args.encoder_type,
                    "encoder_dim": cond_dim}, indent=2)
    )

    # validation: style loss on held-out pairs with frozen TCN state
    # (ref: train_style_transfer.py:333-369)
    from mst_tpu.pipeline import embed_stems
    from mst_tpu.models.tcn import nlc_to_stems, stems_to_nlc
    import jax.numpy as jnp

    @jax.jit
    def val_step(state, batch):
        if embed_fn is not None:
            embed = embed_fn
        else:
            def embed(stems):
                return embed_stems(enc, enc_vars, stems, cfg.features)

        inp, tgt = batch["input_stems"], batch["target_stems"]
        input_emb = embed(inp)
        target_emb = embed(tgt)
        film = gen.apply({"params": state.film_params},
                         jnp.concatenate([input_emb, target_emb], axis=1),
                         train=False)
        out = tcn.apply(
            {"params": state.tcn_params, "batch_stats": state.tcn_batch_stats},
            stems_to_nlc(inp), film, train=False,
        )
        out_emb = embed(nlc_to_stems(out))
        o = out_emb / jnp.maximum(jnp.linalg.norm(out_emb, axis=1, keepdims=True), 1e-12)
        t = target_emb / jnp.maximum(jnp.linalg.norm(target_emb, axis=1, keepdims=True), 1e-12)
        return jnp.mean(1.0 - jnp.sum(o * t, axis=1))

    best_val = float("inf")
    stop = False
    for epoch in range(args.num_epochs):
        if stop:
            break
        for batch in loader:
            if shard_data and batch["input_stems"].shape[0] % n_dev:
                continue  # failed-item shrinkage broke divisibility
            state, metrics = step_fn(state, batch, rng)
            step = int(state.step)
            if step % args.log_interval == 0:
                scalars = {k: float(v) for k, v in metrics.items()}
                logger.log(step, **scalars)
                print(f"epoch {epoch} step {step}: " +
                      " ".join(f"{k}={v:.4f}" for k, v in scalars.items()))
            if args.max_steps and step >= args.max_steps:
                stop = True
                break
        if len(val_idx) > 0:
            val_losses = [float(val_step(state, b)) for b in val_loader]
            val_loss = float(np.mean(val_losses)) if val_losses else float("inf")
            logger.log(int(state.step), val_style_loss=val_loss)
            print(f"epoch {epoch}: val_style_loss={val_loss:.4f}")
            if val_loss < best_val:
                best_val = val_loss
                save_checkpoint(ckpt_dir / "best", int(state.step), state, cfg,
                                {"val_style_loss": val_loss, "epoch": epoch})
        save_checkpoint(ckpt_dir / "latest", int(state.step), state, cfg)

    save_checkpoint(ckpt_dir / "final", int(state.step), state, cfg)
    logger.close()
    print(json.dumps({
        "final_step": int(state.step),
        "best_val_loss": best_val if best_val < float("inf") else None,
    }))


if __name__ == "__main__":
    main()
