"""FxEncoder self-supervised training (fills the role of the external
pretrained Fx-Encoder++ the reference loads but cannot ship,
ref: src/train_style_transfer.py:421-427,543-556).

    python -m mst_tpu.cli.train_fx_encoder --on_device_synth \
        --checkpoint_dir artifacts --max_steps 4000

Objective: supervised-contrastive over *effects chains*.  Each step draws B
effect styles and 2B songs; every style renders two different songs
(separation/synth_v2.render_style), and InfoNCE pulls same-style/different-
content views together.  The embedding must therefore encode the mixing
style and discard content — the property the style-transfer loss
``1 - cos(emb(out), emb(target))`` needs from its conditioning encoder
(input and target are always different songs, ref:
train_style_transfer.py:217-226).  Eval = style retrieval over held-out
styles and songs (query: style i on song A; pool: style i on song B).
Default protocol 'confuser' also puts an alpha-interpolated style on the
same song B in the pool, so top1 measures style *resolution* and stays off
the 1.0 ceiling (round-2 verdict item 1; ref "different mix of the same
song": src/mixing_utils.py:364-479).

Artifact: ``<checkpoint_dir>/fx_encoder_synth_best.npz`` — full variables
(params + BN batch_stats), loadable by ``--encoder_type fx_encoder`` in the
style-transfer and e2e CLIs.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def get_params(argv=None):
    from mst_tpu.cli._common import add_audio_args

    p = argparse.ArgumentParser(description="FxEncoder training (TPU)")
    p.add_argument("--on_device_synth", action="store_true", default=True)
    p.add_argument("--embed_dim", type=int, default=128)
    p.add_argument("--styles_per_batch", type=int, default=8)
    p.add_argument("--learning_rate", type=float, default=2e-4)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--temperature", type=float, default=0.1)
    p.add_argument("--max_steps", type=int, default=4000)
    p.add_argument("--warmup_steps", type=int, default=200)
    p.add_argument("--eval_interval", type=int, default=250)
    p.add_argument("--eval_styles", type=int, default=64)
    p.add_argument("--eval_protocol", choices=("style", "confuser"),
                   default="confuser",
                   help="'style': pool holds only same-style/other-content "
                        "renders (saturates for a trained encoder); "
                        "'confuser': pool additionally holds an alpha-close "
                        "interpolated style on the SAME pool content, so "
                        "top1 measures style resolution (round-2 verdict "
                        "item 1)")
    p.add_argument("--confuser_alpha", type=float, default=0.05)
    p.add_argument("--init_npz", type=str, default=None,
                   help="warm-start variables (.npz with params+batch_stats)")
    p.add_argument("--hard_negative_alpha", type=float, default=0.0,
                   help="> 0: each style also renders its second song with "
                        "an alpha-close interpolated style under a FRESH "
                        "label — a near-style InfoNCE negative matching the "
                        "confuser eval.  Per-batch alpha is log-uniform in "
                        "[alpha/2, 2*alpha]")
    p.add_argument("--log_interval", type=int, default=10)
    p.add_argument("--matmul_precision", choices=("default", "highest"),
                   default="default")
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints_fx/")
    p.add_argument("--log_dir", type=str, default="logs/")
    p.add_argument("--seed", type=int, default=42)
    add_audio_args(p)
    return p.parse_args(argv)


def main(argv=None):
    args = get_params(argv)

    import jax

    with jax.default_matmul_precision(
            "highest" if args.matmul_precision == "highest" else "bfloat16"):
        return _main_inner(args)


def _main_inner(args):
    import jax
    import jax.numpy as jnp
    import optax

    from mst_tpu.checkpoints.npz_io import save_params_npz
    from mst_tpu.cli._common import MetricsLogger, audio_config_from_args
    from mst_tpu.losses import info_nce_loss
    from mst_tpu.models.fx_encoder import FxEncoder
    from mst_tpu.parallel import data_sharding, make_mesh
    from mst_tpu.separation.synth_v2 import (
        apply_style,
        draw_style_params,
        interpolate_style,
        render_style,
        synth_dry_song,
    )
    from mst_tpu.train.schedules import warmup_cosine_schedule

    audio = audio_config_from_args(args)
    T = audio.clip_samples
    sr = float(audio.sample_rate)
    fx = FxEncoder(audio=audio, embed_dim=args.embed_dim)

    # Mesh-default: 2*styles views shard on 'data' (no-op on one chip)
    n_dev = len(jax.devices())
    B = args.styles_per_batch
    if (2 * B) % n_dev:
        B = -(-B // max(n_dev // 2, 1)) * max(n_dev // 2, 1)
        if (2 * B) % n_dev:
            B = n_dev  # 2B = 2*n_dev always divides
        print(f"NOTE: styles_per_batch -> {B} (2 views x styles must "
              f"shard over {n_dev} devices)")
    mesh = make_mesh()
    batch_sh = data_sharding(mesh)

    def synth_views(key):
        """(2B, 2, T) mixtures + (2B,) style labels: style i renders songs
        2i and 2i+1 — same fx, different content.  With
        --hard_negative_alpha > 0, a third view per style (song 2i+1 under
        an alpha-close interpolated style, FRESH label) joins as a
        near-style negative -> (3B, 2, T).  The view axis is
        sharding-constrained onto 'data' so generation + embedding spread
        over the mesh (no-op on one chip)."""
        ks, kc, ka = jax.random.split(key, 3)
        style_keys = jax.random.split(ks, B)
        content_keys = jax.random.split(kc, 2 * B)
        dry = jax.vmap(lambda k: synth_dry_song(k, T, sr))(content_keys)
        if args.hard_negative_alpha > 0:
            a0 = args.hard_negative_alpha
            alpha = a0 / 2.0 * jnp.exp(
                jax.random.uniform(ka) * jnp.log(4.0))

            def one(sk, da, db):
                k1, k2 = jax.random.split(sk)
                p = draw_style_params(k1, 1, da.shape[0], sr)
                pc = interpolate_style(
                    p, draw_style_params(k2, 1, da.shape[0], sr), alpha)
                return jnp.stack([
                    apply_style(p, da[None], sr)[0].sum(axis=0),
                    apply_style(p, db[None], sr)[0].sum(axis=0),
                    apply_style(pc, db[None], sr)[0].sum(axis=0),
                ])

            mixed = jax.vmap(one)(style_keys, dry[0::2], dry[1::2])
            mixtures = mixed.reshape(3 * B, *mixed.shape[2:])
            labels = jnp.stack([jnp.arange(B), jnp.arange(B),
                                B + jnp.arange(B)], axis=1).reshape(-1)
        else:
            styles2 = jnp.repeat(jnp.arange(B), 2)
            mixed = jax.vmap(lambda sk, d: render_style(sk, d, sr))(
                style_keys[styles2], dry)
            mixtures = mixed.sum(axis=1)
            labels = styles2
        mixtures = jax.lax.with_sharding_constraint(mixtures, batch_sh)
        return mixtures, labels  # (2B or 3B, 2, T), matching labels

    tx = optax.adamw(
        warmup_cosine_schedule(args.learning_rate, args.max_steps,
                               args.warmup_steps),
        weight_decay=args.weight_decay,
    )
    variables = jax.jit(fx.init)(jax.random.key(args.seed),
                                 jnp.zeros((1, 2, T)))
    params, batch_stats = variables["params"], variables["batch_stats"]
    if args.init_npz:
        from mst_tpu.checkpoints.npz_io import load_params_npz

        w = load_params_npz(args.init_npz)
        params, batch_stats = w["params"], w["batch_stats"]
        print(f"warm-started fx encoder from {args.init_npz}", flush=True)
    opt_state = tx.init(params)

    def loss_fn(params, batch_stats, key):
        mixtures, labels = synth_views(key)
        emb, updates = fx.apply(
            {"params": params, "batch_stats": batch_stats},
            mixtures, train=True, mutable=["batch_stats"],
        )
        loss = info_nce_loss(emb, labels, args.temperature)
        return loss, updates["batch_stats"]

    @jax.jit
    def train_step(params, batch_stats, opt_state, key):
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, key)
        upd, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), new_bs, new_opt, loss

    ec = min(16, args.eval_styles)
    confuser = args.eval_protocol == "confuser"

    @jax.jit
    def eval_chunk(params, batch_stats, key):
        """'style': 2 views/style [query: style i on song A, key: style i on
        song B].  'confuser': 3 views/style — the same two plus an
        alpha-interpolated style on the SAME song B, so ranking the key
        above the confuser requires resolving the mixing style finer than
        alpha; content cues cannot help (both pool entries share song B).
        Mirrors the stage-1 confuser protocol
        (separation/synth_v2.synth_confuser_batch_v2)."""
        ks, kc = jax.random.split(key)
        style_keys = jax.random.split(ks, ec)
        content_keys = jax.random.split(kc, 2 * ec)
        dry = jax.vmap(lambda k: synth_dry_song(k, T, sr))(content_keys)
        if not confuser:
            styles2 = jnp.repeat(jnp.arange(ec), 2)
            mixed = jax.vmap(lambda sk, d: render_style(sk, d, sr))(
                style_keys[styles2], dry).sum(axis=1)
        else:
            dry_a, dry_b = dry[0::2], dry[1::2]

            def one(sk, da, db):
                k1, k2 = jax.random.split(sk)
                p = draw_style_params(k1, 1, da.shape[0], sr)
                pc = interpolate_style(
                    p, draw_style_params(k2, 1, da.shape[0], sr),
                    args.confuser_alpha)
                return jnp.stack([
                    apply_style(p, da[None], sr)[0].sum(axis=0),
                    apply_style(p, db[None], sr)[0].sum(axis=0),
                    apply_style(pc, db[None], sr)[0].sum(axis=0),
                ])

            mixed = jax.vmap(one)(style_keys, dry_a, dry_b)
            mixed = mixed.reshape(3 * ec, *mixed.shape[2:])
        return fx.apply({"params": params, "batch_stats": batch_stats},
                        mixed, train=False)

    def style_retrieval(params, batch_stats, key):
        per = 3 if confuser else 2
        qs, ps, cs = [], [], []
        for i in range(0, args.eval_styles, ec):
            emb = np.asarray(eval_chunk(params, batch_stats,
                                        jax.random.fold_in(key, i)))
            qs.append(emb[0::per])
            ps.append(emb[1::per])
            if confuser:
                cs.append(emb[2::per])
        q = np.concatenate(qs)[: args.eval_styles]
        p = np.concatenate(ps)[: args.eval_styles]
        if confuser:
            p = np.concatenate([p, np.concatenate(cs)[: args.eval_styles]])
        sim = q @ p.T  # embeddings are L2-normalized
        order = np.argsort(-sim, axis=1)
        truth = np.arange(len(q))
        top1 = float((order[:, 0] == truth).mean())
        top5 = float((order[:, :5] == truth[:, None]).any(axis=1).mean())
        return top1, top5

    logger = MetricsLogger(args.log_dir, "fx_encoder")
    rng = jax.random.key(args.seed + 1)
    eval_key = jax.random.key(args.seed + 777_000)
    ckpt_dir = Path(args.checkpoint_dir).absolute()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    best_top1 = -1.0
    prev_meta = ckpt_dir / "fx_encoder_synth_best.json"
    if prev_meta.exists():
        prev = json.loads(prev_meta.read_text())
        # the recorded bar only applies under the SAME protocol: pool size,
        # eval protocol, and (for confuser) alpha — a 64-style same-style
        # 1.000 must not gate saves under a harder confuser eval
        if (prev.get("eval_styles") == args.eval_styles
                and prev.get("eval_protocol", "style") == args.eval_protocol
                and (args.eval_protocol != "confuser"
                     or prev.get("confuser_alpha") == args.confuser_alpha)):
            best_top1 = float(prev["top1"])
            print(f"existing best top1 {best_top1:.3f} — only saving above "
                  "it", flush=True)
        else:
            print("existing best used a different eval protocol — fresh bar",
                  flush=True)

    for i in range(args.max_steps):
        params, batch_stats, opt_state, loss = train_step(
            params, batch_stats, opt_state, jax.random.fold_in(rng, i))
        step = i + 1
        if step % args.log_interval == 0:
            logger.log(step, loss=float(loss))
            print(f"step {step}/{args.max_steps}: loss={float(loss):.4f}",
                  flush=True)
        if step % args.eval_interval == 0 or step == args.max_steps:
            top1, top5 = style_retrieval(params, batch_stats,
                                         jax.random.fold_in(eval_key, step))
            logger.log(step, top1=top1, top5=top5)
            print(f"step {step}: style retrieval top1 {top1:.3f} "
                  f"top5 {top5:.3f} ({args.eval_styles} styles)", flush=True)
            if top1 >= best_top1:
                best_top1 = top1
                save_params_npz(ckpt_dir / "fx_encoder_synth_best.npz",
                                {"params": params, "batch_stats": batch_stats})
                prev_meta.write_text(json.dumps({
                    "step": step, "top1": top1, "top5": top5,
                    "eval_styles": args.eval_styles,
                    "eval_protocol": args.eval_protocol,
                    "confuser_alpha": (args.confuser_alpha
                                       if args.eval_protocol == "confuser"
                                       else None),
                    "hard_negative_alpha": args.hard_negative_alpha,
                    "embed_dim": args.embed_dim,
                    "clip_duration": args.clip_duration,
                    "sample_rate": args.sample_rate,
                    "matmul_precision": args.matmul_precision,
                    "config": {"n_fft": args.n_fft,
                               "hop_length": args.hop_length,
                               "n_mels": args.n_mels,
                               "mel_method": args.mel_method},
                }, indent=2))

    logger.close()
    print(json.dumps({"final_step": args.max_steps, "best_top1": best_top1}))


if __name__ == "__main__":
    main()
