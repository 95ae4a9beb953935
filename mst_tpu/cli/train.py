"""Stage-1 contrastive training CLI (ref: src/train.py + src/params.py).

    python -m mst_tpu.cli.train --separated_path /data/fma_separated \
        --batch_size 100 --n_fft 2048 --hop_length 512 --n_mels 80 \
        --band_split_size 16 --band_overlap 8 --encoder_dim 512

Flag names mirror the reference's params.py.  Differences: training runs as
one jitted data-parallel step over all local devices (batch sharded on the
'data' mesh axis), mixing features + optional augmentations are computed on
device, checkpoints are orbax (torch .pt importable via --resume_torch).
"""

from __future__ import annotations

import argparse
import json
from functools import partial
from pathlib import Path

import numpy as np


def get_params(argv=None):
    from mst_tpu.cli._common import add_audio_args, add_model_args

    p = argparse.ArgumentParser(
        description="Mixing Style Representation Learning - Stage 1 (TPU)"
    )
    p.add_argument("--separated_path", type=str, default=None,
                   help="pre-separated stems root; omit with --synthetic")
    p.add_argument("--synthetic", action="store_true",
                   help="generate a synthetic corpus (smoke runs)")
    p.add_argument("--on_device_synth", action="store_true",
                   help="two-crop contrastive batches synthesized INSIDE "
                        "the step (separation/synth.py): infinite fresh "
                        "songs, zero host data path; saves a best-by-"
                        "retrieval .npz encoder artifact")
    p.add_argument("--synth_version", type=int, default=1, choices=(1, 2),
                   help="procedural corpus: 1 = disjoint-signature stems, "
                        "2 = shared-harmony/overlapping-spectra songs with "
                        "per-song mixing styles (separation/synth_v2.py)")
    p.add_argument("--eval_interval", type=int, default=500)
    p.add_argument("--eval_songs", type=int, default=64,
                   help="held-out synthetic songs for retrieval eval")
    p.add_argument("--eval_protocol", choices=("same_mix", "confuser"),
                   default=None,
                   help="retrieval eval: 'same_mix' = two crops of one "
                        "render (ref validate_retrieval.py protocol); "
                        "'confuser' = pool additionally holds a different-"
                        "style render of the SAME content per song, so "
                        "top1 measures style discrimination and cannot "
                        "saturate on content cues (default for "
                        "--synth_version 2; v1 has no style latent)")
    p.add_argument("--confuser_alpha", type=float, default=0.02,
                   help="style proximity of the confuser render: the pool "
                        "distractor's continuous mix params are "
                        "lerp(key_style, independent_draw, alpha); smaller "
                        "= finer style resolution required")
    p.add_argument("--init_npz", type=str, default=None,
                   help="warm-start the encoder from a saved .npz variables "
                        "artifact (on-device-synth path)")
    p.add_argument("--hard_negative_alpha", type=float, default=0.0,
                   help="> 0 (v2 only): train batches add, per song, a "
                        "third crop rendered with an alpha-close "
                        "interpolated style under a FRESH label — an "
                        "explicit near-style InfoNCE negative that "
                        "optimizes exactly what the confuser eval "
                        "measures.  Per-batch alpha is drawn log-uniform "
                        "in [alpha/2, 2*alpha] so resolution is learned "
                        "across a band, not one offset")
    p.add_argument("--matmul_precision", choices=("default", "highest"),
                   default="default",
                   help="'highest' trains with f32-equivalent matmuls (3-pass "
                        "bf16 on TPU): ~2x slower but the artifact becomes "
                        "platform-portable — embeddings match CPU f32 "
                        "inference instead of drifting with TPU bf16 "
                        "semantics")
    p.add_argument("--num_workers", type=int, default=4)
    add_audio_args(p)
    add_model_args(p)
    p.add_argument("--batch_size", type=int, default=24)
    p.add_argument("--num_epochs", type=int, default=100)
    p.add_argument("--learning_rate", type=float, default=2e-4)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--temperature", type=float, default=0.1)
    p.add_argument("--num_segments", type=int, default=2)
    p.add_argument("--log_interval", type=int, default=10)
    p.add_argument("--save_interval", type=int, default=5)
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints/")
    p.add_argument("--artifact_out", type=str, default=None,
                   help="(corpus path) also save the best-val-loss encoder "
                        "as a portable .npz artifact + sibling .json config "
                        "(the layout --encoder_npz consumers load)")
    p.add_argument("--log_dir", type=str, default="logs/")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--use_augmentation", action="store_true",
                   help="on-device negative-pair degradations")
    p.add_argument("--use_adversarial", action="store_true")
    p.add_argument("--adversarial_lambda", type=float, default=1.0)
    p.add_argument("--initial_adversarial_lambda", type=float, default=0.0)
    p.add_argument("--adversarial_warmup_steps", type=int, default=2000)
    p.add_argument("--fixed_grl_lambda", type=float, default=None)
    p.add_argument("--song_id_cache_path", type=str, default=None)
    p.add_argument("--discriminator_hidden_dim", type=int, default=512)
    p.add_argument("--discriminator_dropout", type=float, default=0.3)
    p.add_argument("--disc_detach_train", action="store_true",
                   help="also train the discriminator on detached "
                        "embeddings (full-strength head; plain DANN's "
                        "reversed-only head stays too weak to exert "
                        "removal pressure - see Stage1Config)")
    p.add_argument("--disc_learning_rate", type=float, default=None,
                   help="separate constant-LR Adam for the discriminator "
                        "(default: share the encoder's warmup-cosine "
                        "schedule, which starves the adversary on runs "
                        "shorter than the warmup - see Stage1Config)")
    p.add_argument("--disc_steps", type=int, default=1,
                   help="discriminator updates per train step (>1 adds "
                        "adversary-only inner steps on the detached batch "
                        "embedding)")
    p.add_argument("--resume", type=str, default=None,
                   help="orbax checkpoint dir to resume from")
    p.add_argument("--resume_torch", type=str, default=None,
                   help="reference .pt checkpoint to import weights from")
    p.add_argument("--weights_only", action="store_true")
    p.add_argument("--max_steps", type=int, default=None,
                   help="stop after N steps (smoke runs)")
    p.add_argument("--infonce_impl", choices=("spmd", "shard_map"),
                   default="spmd",
                   help="'spmd': global (N,N) InfoNCE, XLA inserts the "
                        "all-gather; 'shard_map': explicit per-chip row "
                        "blocks via info_nce_loss(axis_name='data')")
    return p.parse_args(argv)


def load_song_id_cache(path):
    """(embeddings (N, D) f32, track_paths list[str]) from either our .npz
    layout or the reference's torch .pt cache
    (ref: scripts/extract_song_identity_embeddings.py:241-248)."""
    if str(path).endswith((".pt", ".pth")):
        import torch

        c = torch.load(path, map_location="cpu", weights_only=False)
        emb = c["embeddings"]
        if hasattr(emb, "detach"):
            emb = emb.detach().cpu().numpy()
        return np.asarray(emb, np.float32), [str(p) for p in c["track_paths"]]
    z = np.load(path, allow_pickle=True)
    return np.asarray(z["embeddings"], np.float32), [str(p) for p in z["track_paths"]]


def _train_on_device_synth(args):
    import jax

    with jax.default_matmul_precision(
            "highest" if args.matmul_precision == "highest" else "bfloat16"):
        return _train_on_device_synth_inner(args)


def _train_on_device_synth_inner(args):
    """Stage-1 contrastive training with on-device synthesized two-crop
    batches (no corpus, no host data path — the demonstration recipe, like
    train_separation --on_device_synth).  Eval = same-song retrieval over
    held-out synthetic songs: crop A embeddings query a pool of crop B
    embeddings (the ref's validation protocol, validate_retrieval.py);
    best-by-top1 artifact saved as <checkpoint_dir>/encoder_synth_best.npz."""
    import jax
    import jax.numpy as jnp

    from mst_tpu.augment import AugmentConfig, augment_stems
    from mst_tpu.checkpoints.npz_io import save_params_npz
    from mst_tpu.cli._common import (
        MetricsLogger,
        encoder_config_from_args,
        feature_config_from_args,
    )
    from mst_tpu.config import Stage1Config
    from mst_tpu.parallel import data_sharding, make_mesh
    from mst_tpu.pipeline import embed_stems
    from mst_tpu.train import create_stage1_state, make_train_step

    if args.synth_version == 1:
        from mst_tpu.separation.synth import synth_two_crop_batch
        synth_confuser_batch = None
    else:
        from mst_tpu.separation.synth_v2 import (
            synth_confuser_batch_v2 as synth_confuser_batch,
            synth_two_crop_batch_v2 as synth_two_crop_batch,
        )
    if args.eval_protocol is None:
        args.eval_protocol = "confuser" if args.synth_version == 2 else "same_mix"
    if args.eval_protocol == "confuser" and synth_confuser_batch is None:
        raise SystemExit("--eval_protocol confuser needs --synth_version 2 "
                         "(v1 stems have no mixing-style latent)")

    # Mesh-default (pod-correct, no-op on one chip): pad the song count to a
    # device multiple so the 2*songs contrastive batch shards on 'data'.
    n_dev = len(jax.devices())
    if args.batch_size % n_dev:
        new_bs = -(-args.batch_size // n_dev) * n_dev
        print(f"NOTE: rounding --batch_size {args.batch_size} -> {new_bs} "
              f"(multiple of {n_dev} devices)")
        args.batch_size = new_bs
    mesh = make_mesh()

    cfg = Stage1Config(
        encoder=encoder_config_from_args(args),
        features=feature_config_from_args(args),
        batch_size=args.batch_size,
        num_segments=2,
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        temperature=args.temperature,
        seed=args.seed,
        use_adversarial=False,
        use_augmentation=args.use_augmentation,
    )
    total_steps = args.max_steps or 10000
    T = cfg.encoder.audio.clip_samples
    sr = float(args.sample_rate)

    state, enc, _ = create_stage1_state(cfg, jax.random.key(args.seed), total_steps)
    if args.init_npz:
        from mst_tpu.checkpoints.npz_io import load_params_npz

        w = load_params_npz(args.init_npz)
        state = state.replace(params=w["params"],
                              batch_stats=w.get("batch_stats",
                                                state.batch_stats))
        print(f"warm-started encoder from {args.init_npz}", flush=True)

    augment_fn = None
    if args.use_augmentation:
        acfg = AugmentConfig(sample_rate=args.sample_rate)
        augment_fn = lambda rng, stems: augment_stems(rng, stems, acfg)
    step_fn = make_train_step(cfg, enc, None, total_steps, augment_fn=augment_fn,
                              mesh=mesh)

    batch_sh = data_sharding(mesh)

    if args.hard_negative_alpha > 0 and synth_confuser_batch is None:
        raise SystemExit("--hard_negative_alpha needs --synth_version 2 "
                         "(v1 stems have no style latent)")

    @partial(jax.jit, out_shardings=(batch_sh, batch_sh))
    def synth_fn(key):
        if args.hard_negative_alpha > 0:
            # [A,B,C] per song: crops A/B share label i (positives); the
            # alpha-close different-style crop C gets a fresh unique label
            # so InfoNCE pushes it apart from its own song's mix — the
            # hard-negative form of the confuser eval.
            ka, kb = jax.random.split(key)
            a0 = args.hard_negative_alpha
            alpha = a0 / 2.0 * jnp.exp(
                jax.random.uniform(ka) * jnp.log(4.0))
            stems = synth_confuser_batch(kb, args.batch_size, T, sr,
                                         confuser_alpha=alpha)
            n = args.batch_size
            labels = jnp.stack([jnp.arange(n), jnp.arange(n),
                                n + jnp.arange(n)], axis=1).reshape(-1)
            return stems, labels
        return synth_two_crop_batch(key, args.batch_size, T, sr)

    @jax.jit
    def embed_fn(variables, stems):
        return embed_stems(enc, variables, stems, cfg.features)

    ec = min(16, args.eval_songs)  # one compiled eval-chunk program
    confuser = args.eval_protocol == "confuser"

    @jax.jit
    def eval_chunk(variables, key):
        if confuser:
            stems = synth_confuser_batch(
                key, ec, T, sr, confuser_alpha=args.confuser_alpha)  # [A,B,C]*ec
        else:
            stems, _ = synth_two_crop_batch(key, ec, T, sr)  # [A,B]*ec
        return embed_fn(variables, stems)

    def retrieval_eval(variables, key):
        """top1/top5 same-song retrieval over held-out synthetic songs.

        same_mix: query crop A vs pool of key crops B (ref protocol,
        validate_retrieval.py:92-150).  confuser: the pool also holds, per
        song, a different-style render of the same content (a "different mix
        of the same song", ref mixing_utils.py:364-479) — ranking the true
        key above its confuser requires embedding the mixing style itself.
        """
        per = 3 if confuser else 2
        qs, ps, cs = [], [], []
        for i in range(0, args.eval_songs, ec):
            emb = np.asarray(eval_chunk(variables, jax.random.fold_in(key, i)),
                             np.float32)
            qs.append(emb[0::per])
            ps.append(emb[1::per])
            if confuser:
                cs.append(emb[2::per])
        q = np.concatenate(qs)[: args.eval_songs]
        p = np.concatenate(ps)[: args.eval_songs]
        if confuser:
            p = np.concatenate([p, np.concatenate(cs)[: args.eval_songs]])
        q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        p /= np.maximum(np.linalg.norm(p, axis=1, keepdims=True), 1e-12)
        sim = q @ p.T
        order = np.argsort(-sim, axis=1)
        truth = np.arange(len(q))
        top1 = float((order[:, 0] == truth).mean())
        top5 = float((order[:, :5] == truth[:, None]).any(axis=1).mean())
        return top1, top5

    stem = "encoder_synth" if args.synth_version == 1 else "encoder_synth2"
    logger = MetricsLogger(args.log_dir, f"stage1_{stem}")
    rng = jax.random.key(args.seed + 1)
    eval_key = jax.random.key(args.seed + 777_000)  # disjoint stream
    ckpt_dir = Path(args.checkpoint_dir).absolute()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    best_top1 = -1.0
    prev_meta = ckpt_dir / f"{stem}_best.json"
    if prev_meta.exists():
        prev = json.loads(prev_meta.read_text())
        # a recorded bar only gates runs under the SAME eval protocol/pool —
        # a same-mix 1.000 must not block every confuser-protocol save
        prev_alpha = prev.get("confuser_alpha")
        if (prev.get("eval_protocol", "same_mix") == args.eval_protocol
                and prev.get("eval_songs") == args.eval_songs
                and (args.eval_protocol != "confuser"
                     or prev_alpha == args.confuser_alpha)):
            best_top1 = float(prev["top1"])
            print(f"existing best top1 {best_top1:.3f} — only saving above "
                  "it", flush=True)
        else:
            print("existing best used a different eval protocol/pool — "
                  "starting a fresh bar", flush=True)

    for i in range(total_steps):
        stems, labels = synth_fn(jax.random.fold_in(rng, i))
        state, metrics = step_fn(
            state, {"stems": stems, "song_labels": labels}, rng)
        step = int(state.step)
        if step % args.log_interval == 0:
            loss = float(metrics["total"])
            logger.log(step, loss=loss)
            print(f"step {step}/{total_steps}: loss={loss:.4f}", flush=True)
        if step % args.eval_interval == 0 or step == total_steps:
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            top1, top5 = retrieval_eval(variables, jax.random.fold_in(eval_key, step))
            logger.log(step, top1=top1, top5=top5)
            print(f"step {step}: retrieval top1 {top1:.3f} top5 {top5:.3f} "
                  f"({args.eval_songs} songs, {args.eval_protocol})",
                  flush=True)
            # >= so ties refresh the artifact: retrieval saturates early and
            # the later (lower-loss) state has far more robust margins —
            # a step-500 tie-winner measurably degrades under CPU f32 vs the
            # TPU bf16 numerics it trained in
            if top1 >= best_top1:
                best_top1 = top1
                save_params_npz(ckpt_dir / f"{stem}_best.npz", variables)
                prev_meta.write_text(json.dumps({
                    "step": step, "top1": top1, "top5": top5,
                    "eval_songs": args.eval_songs,
                    "eval_protocol": args.eval_protocol,
                    "confuser_alpha": (args.confuser_alpha
                                       if args.eval_protocol == "confuser"
                                       else None),
                    "hard_negative_alpha": args.hard_negative_alpha,
                    "clip_duration": args.clip_duration,
                    "sample_rate": args.sample_rate,
                    "synth_version": args.synth_version,
                    "matmul_precision": args.matmul_precision,
                    "config": {
                        "n_fft": args.n_fft, "hop_length": args.hop_length,
                        "n_mels": args.n_mels, "mel_method": args.mel_method,
                        "encoder_dim": args.encoder_dim,
                        "band_split_size": args.band_split_size,
                        "band_overlap": args.band_overlap,
                    },
                }, indent=2))

    logger.close()
    print(json.dumps({"final_step": int(state.step), "best_top1": best_top1}))


def main(argv=None):
    args = get_params(argv)

    if args.on_device_synth:
        return _train_on_device_synth(args)

    import jax

    with jax.default_matmul_precision(
            "highest" if args.matmul_precision == "highest" else "bfloat16"):
        return _train_corpus(args)


def _train_corpus(args):
    import jax
    import jax.numpy as jnp

    from mst_tpu.augment import AugmentConfig, augment_stems
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
    from mst_tpu.config import Stage1Config
    from mst_tpu.data import (
        FMABaselineDataset,
        PrefetchLoader,
        baseline_collate,
        make_synthetic_corpus,
        train_val_split,
    )
    from mst_tpu.parallel import make_mesh, shard_batch
    from mst_tpu.train import create_stage1_state, make_eval_step, make_train_step

    if args.synthetic:
        root = Path(args.checkpoint_dir) / "synthetic_corpus"
        if not root.exists():
            make_synthetic_corpus(root, n_tracks=8, duration=3.0,
                                  sample_rate=args.sample_rate)
        args.separated_path = str(root)
    if args.separated_path is None:
        raise SystemExit("--separated_path (or --synthetic) is required")

    cfg = Stage1Config(
        encoder=encoder_config_from_args(args),
        features=feature_config_from_args(args),
        batch_size=args.batch_size,
        num_segments=args.num_segments,
        num_epochs=args.num_epochs,
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        temperature=args.temperature,
        seed=args.seed,
        use_adversarial=args.use_adversarial,
        adversarial_lambda=args.adversarial_lambda,
        initial_adversarial_lambda=args.initial_adversarial_lambda,
        adversarial_warmup_steps=args.adversarial_warmup_steps,
        fixed_grl_lambda=args.fixed_grl_lambda,
        discriminator_hidden_dim=args.discriminator_hidden_dim,
        discriminator_dropout=args.discriminator_dropout,
        disc_detach_train=args.disc_detach_train,
        disc_learning_rate=args.disc_learning_rate,
        disc_steps=args.disc_steps,
        use_augmentation=args.use_augmentation,
    )

    if args.num_segments < 2 and not args.use_augmentation:
        # InfoNCE needs positives: >=2 segments per song, or augmented
        # same-song negatives creating contrast (otherwise loss is 0)
        raise SystemExit(
            "--num_segments must be >= 2 (or enable --use_augmentation): "
            "with one segment per song no anchor has a positive pair"
        )

    dataset = FMABaselineDataset(
        args.separated_path, args.sample_rate, args.clip_duration,
        args.num_segments, seed=args.seed,
    )
    train_idx, val_idx = train_val_split(len(dataset), 0.1, args.seed)
    print(f"dataset: {len(dataset)} tracks ({len(train_idx)} train / {len(val_idx)} val)")

    # sharded stepping needs device-divisible batches (N = batch *
    # num_segments on 'data'); tiny corpora fall back to one device
    n_dev = len(jax.devices())
    shard_data = (n_dev > 1 and len(train_idx) >= args.batch_size
                  and (args.batch_size * args.num_segments) % n_dev == 0)
    if n_dev > 1 and not shard_data:
        print(f"NOTE: batch {args.batch_size}x{args.num_segments} clips not "
              f"shardable over {n_dev} devices; running unsharded")
    loader = PrefetchLoader(dataset, args.batch_size, baseline_collate,
                            indices=train_idx, num_workers=args.num_workers,
                            seed=args.seed, drop_last=shard_data)
    val_loader = PrefetchLoader(dataset, args.batch_size, baseline_collate,
                                indices=val_idx, shuffle=False,
                                num_workers=args.num_workers)

    steps_per_epoch = max(len(loader), 1)
    total_steps = steps_per_epoch * args.num_epochs

    song_id_cache = None
    if args.use_adversarial:
        if args.song_id_cache_path and Path(args.song_id_cache_path).exists():
            emb, cache_paths = load_song_id_cache(args.song_id_cache_path)
            # Align by track path, not row index: failed tracks are dropped
            # from the cache, which would shift every later row (the
            # reference builds the same lookup; ref train.py:170-180).
            path_to_row = {p: i for i, p in enumerate(cache_paths)}
            song_id_cache = np.zeros((len(dataset), emb.shape[1]), np.float32)
            missing = 0
            for i, d in enumerate(dataset.track_dirs):
                row = path_to_row.get(str(d))
                if row is None:
                    missing += 1
                else:
                    song_id_cache[i] = emb[row]
            if missing:
                print(f"WARNING: {missing} tracks missing from song-ID cache "
                      f"(zero targets)")
            # the discriminator must predict the cache's embedding space
            # (512-d for VINet, arbitrary for custom CQTNets)
            if song_id_cache.shape[1] != cfg.song_id_dim:
                import dataclasses

                cfg = dataclasses.replace(
                    cfg, song_id_dim=song_id_cache.shape[1])
        else:
            print("WARNING: no song-ID cache; using zeros (adversarial no-op)")
            song_id_cache = np.zeros((len(dataset), cfg.song_id_dim), np.float32)

    state, enc, disc = create_stage1_state(cfg, jax.random.key(args.seed), total_steps)
    if args.resume_torch:
        ckpt = load_torch_checkpoint(args.resume_torch)
        variables = encoder_params_from_torch(
            ckpt["model_state_dict"], cfg.encoder.n_subbands
        )
        state = state.replace(params=variables["params"],
                              batch_stats=variables["batch_stats"])
        print(f"imported torch weights from {args.resume_torch}")
    elif args.resume:
        state = restore_checkpoint(args.resume, None, state)
        if args.weights_only:
            fresh, _, _ = create_stage1_state(cfg, jax.random.key(args.seed), total_steps)
            state = fresh.replace(params=state.params, batch_stats=state.batch_stats)
        print(f"resumed from {args.resume} at step {int(state.step)}")

    augment_fn = None
    if args.use_augmentation:
        acfg = AugmentConfig(sample_rate=args.sample_rate)
        augment_fn = lambda rng, stems: augment_stems(rng, stems, acfg)

    mesh = make_mesh() if shard_data or n_dev == 1 else make_mesh((1,))
    print(f"mesh: {mesh.devices.shape} devices on axes {mesh.axis_names}")
    step_fn = make_train_step(cfg, enc, disc, total_steps, augment_fn=augment_fn,
                              mesh=mesh, infonce_impl=args.infonce_impl)
    eval_fn = make_eval_step(cfg, enc, mesh=mesh)

    logger = MetricsLogger(args.log_dir, "stage1")
    rng = jax.random.key(args.seed + 1)
    best_val = float("inf")
    ckpt_dir = Path(args.checkpoint_dir).absolute()
    stop = False

    for epoch in range(args.num_epochs):
        if stop:
            break
        for batch in loader:
            if shard_data and batch["stems"].shape[0] % n_dev:
                continue  # failed-item shrinkage broke divisibility
            device_batch = {
                "stems": batch["stems"],
                "song_labels": batch["song_labels"],
            }
            if song_id_cache is not None:
                device_batch["song_id_emb"] = song_id_cache[batch["song_labels"]]
            device_batch = shard_batch(device_batch, mesh)
            with mesh:
                state, metrics = step_fn(state, device_batch, rng)
            step = int(state.step)
            if step % args.log_interval == 0:
                scalars = {k: float(v) for k, v in metrics.items()}
                logger.log(step, **scalars)
                print(f"epoch {epoch} step {step}: " +
                      " ".join(f"{k}={v:.4f}" for k, v in scalars.items()))
            if args.max_steps and step >= args.max_steps:
                stop = True
                break

        # validation (ref: train.py:388-427); skipped when the corpus is too
        # small for a val split
        val_losses = []
        if len(val_idx) > 0:
            for batch in val_loader:
                if shard_data and batch["stems"].shape[0] % n_dev:
                    continue
                device_batch = shard_batch(
                    {"stems": batch["stems"], "song_labels": batch["song_labels"]}, mesh
                )
                with mesh:
                    loss, _ = eval_fn(state, device_batch)
                val_losses.append(float(loss))
        val_loss = float(np.mean(val_losses)) if val_losses else float("inf")
        if val_losses:
            logger.log(int(state.step), val_loss=val_loss)
            print(f"epoch {epoch}: val_loss={val_loss:.4f}")

        if val_loss < best_val or not val_losses:
            # with no val split (tiny corpora), "best" tracks the latest
            # state so downstream CLIs always find a checkpoint
            best_val = min(best_val, val_loss)
            save_checkpoint(ckpt_dir / "best", int(state.step), state, cfg,
                            {"val_loss": val_loss if val_losses else None,
                             "epoch": epoch})
            if args.artifact_out:
                from mst_tpu.checkpoints.npz_io import save_params_npz

                out = Path(args.artifact_out)
                out.parent.mkdir(parents=True, exist_ok=True)
                save_params_npz(out, {"params": state.params,
                                      "batch_stats": state.batch_stats})
                out.with_suffix(".json").write_text(json.dumps({
                    "step": int(state.step), "epoch": epoch,
                    "val_loss": val_loss if val_losses else None,
                    "clip_duration": args.clip_duration,
                    "sample_rate": args.sample_rate,
                    "use_adversarial": args.use_adversarial,
                    "matmul_precision": args.matmul_precision,
                    "config": {
                        "n_fft": args.n_fft, "hop_length": args.hop_length,
                        "n_mels": args.n_mels, "mel_method": args.mel_method,
                        "encoder_dim": args.encoder_dim,
                        "band_split_size": args.band_split_size,
                        "band_overlap": args.band_overlap,
                    },
                }, indent=2))
        if (epoch + 1) % args.save_interval == 0:
            save_checkpoint(ckpt_dir / "periodic", int(state.step), state, cfg,
                            {"val_loss": val_loss, "epoch": epoch})

    save_checkpoint(ckpt_dir / "final", int(state.step), state, cfg,
                    {"best_val_loss": best_val if best_val < float("inf") else None})
    logger.close()
    print(f"done: {int(state.step)} steps, best val {best_val:.4f}")
    print(json.dumps({
        "final_step": int(state.step),
        "best_val_loss": best_val if best_val < float("inf") else None,
    }))


if __name__ == "__main__":
    main()
