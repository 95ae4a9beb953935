"""Style-resolution sweep: retrieval top1 as a function of confuser alpha.

The confuser protocol (eval counterpart of the reference's "different mix
of the same song" definition, ref: src/mixing_utils.py:364-479; retrieval
protocol ref: inference/validate_retrieval.py:92-150) puts, for every
query song, an alpha-interpolated different-style render of the SAME
content into the retrieval pool.  Sweeping alpha traces the encoder's
psychometric curve: at what style distance does it stop resolving "same
mix" from "slightly different mix"?  alpha=1 is the fully-independent-
style ceiling (equivalent to the classic two-crop protocol for a trained
encoder); small alphas probe fine-grained mixing-style resolution.

    python -m mst_tpu.cli.style_resolution \
        --encoder_npz artifacts/encoder_synth2_best.npz \
        --alphas 0.005,0.01,0.02,0.05,0.1,1.0 --songs 128 \
        --output artifacts/encoder_synth2_resolution.json

One jitted program serves every alpha (alpha enters the style lerp as a
traced scalar), so the sweep costs one compile + n_alphas * songs/chunk
device calls.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def get_params(argv=None):
    p = argparse.ArgumentParser(
        description="retrieval top1 vs confuser alpha (style resolution)")
    p.add_argument("--encoder_npz", type=str, required=True,
                   help="trained encoder artifact (+ sibling .json metadata)")
    p.add_argument("--model", choices=("encoder", "fx"), default="encoder",
                   help="'encoder': stem-level MixingStyleEncoder (same-song "
                        "confuser pool); 'fx': mixture-level FxEncoder "
                        "(same-style-other-song pool, the trainer's "
                        "confuser eval)")
    p.add_argument("--alphas", type=str, default="0.005,0.01,0.02,0.05,0.1,1.0")
    p.add_argument("--songs", type=int, default=128)
    p.add_argument("--chunk", type=int, default=8,
                   help="songs per device call (3*chunk clips embedded)")
    p.add_argument("--seed", type=int, default=20260817)
    p.add_argument("--output", type=str, default=None,
                   help="metrics json path (default: <npz>_resolution.json)")
    return p.parse_args(argv)


def _topk(q: np.ndarray, pool: np.ndarray, k: int) -> np.ndarray:
    """Row i's rank-position hit vector: does pool item i make the top-k
    for query i (cosine)."""
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    p = pool / np.maximum(np.linalg.norm(pool, axis=1, keepdims=True), 1e-12)
    order = np.argsort(-(q @ p.T), axis=1)
    return (order[:, :k] == np.arange(len(q))[:, None]).any(axis=1)


def _fx_chunk_fn(args, meta):
    """(chunk_embs(key, alpha), T, sr) for a trained FxEncoder artifact:
    per style, [query: style on song A, key: style on song B, confuser:
    alpha-interpolated style on song B] — the fx trainer's confuser eval
    (cli/train_fx_encoder.py) with alpha traced."""
    import jax
    import jax.numpy as jnp

    from mst_tpu.checkpoints.npz_io import load_params_npz
    from mst_tpu.config import AudioConfig
    from mst_tpu.models.fx_encoder import FxEncoder
    from mst_tpu.separation.synth_v2 import (
        apply_style,
        draw_style_params,
        interpolate_style,
        synth_dry_song,
    )

    c = meta["config"]
    audio = AudioConfig(
        sample_rate=meta["sample_rate"], clip_duration=meta["clip_duration"],
        n_fft=c["n_fft"], hop_length=c["hop_length"], n_mels=c["n_mels"],
        mel_method=c.get("mel_method", "rfft"),
    )
    fx = FxEncoder(audio=audio, embed_dim=meta["embed_dim"])
    variables = load_params_npz(args.encoder_npz)
    T = audio.clip_samples
    sr = float(audio.sample_rate)

    @jax.jit
    def chunk_embs(key, alpha):
        ks, kc = jax.random.split(key)
        style_keys = jax.random.split(ks, args.chunk)
        content_keys = jax.random.split(kc, 2 * args.chunk)
        dry = jax.vmap(lambda k: synth_dry_song(k, T, sr))(content_keys)

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
        mixed = mixed.reshape(3 * args.chunk, *mixed.shape[2:])
        return fx.apply(variables, mixed, train=False)

    return chunk_embs, T, sr


def main(argv=None):
    args = get_params(argv)

    import jax

    from mst_tpu.cli.train_style_transfer import _encoder_from_npz
    from mst_tpu.pipeline import embed_stems
    from mst_tpu.separation.synth_v2 import synth_confuser_batch_v2

    meta = json.loads(Path(args.encoder_npz).with_suffix(".json").read_text())
    precision = ("highest" if meta.get("matmul_precision") == "highest"
                 else "bfloat16")
    alphas = [float(a) for a in args.alphas.split(",")]

    with jax.default_matmul_precision(precision):
        if args.model == "encoder":
            enc, variables, ecfg, fcfg = _encoder_from_npz(args.encoder_npz)
            T = ecfg.audio.clip_samples
            sr = float(ecfg.audio.sample_rate)

            @jax.jit
            def chunk_embs(key, alpha):
                stems = synth_confuser_batch_v2(key, args.chunk, T, sr,
                                                confuser_alpha=alpha)
                return embed_stems(enc, variables, stems, fcfg)  # [A,B,C]*chunk
        else:
            chunk_embs, T, sr = _fx_chunk_fn(args, meta)

        results = []
        for alpha in alphas:
            qs, ks, cs = [], [], []
            for i in range(0, args.songs, args.chunk):
                key = jax.random.fold_in(jax.random.key(args.seed), i)
                emb = np.asarray(chunk_embs(key, alpha))
                qs.append(emb[0::3])
                ks.append(emb[1::3])
                cs.append(emb[2::3])
            q = np.concatenate(qs)[: args.songs]
            # pool rows: [key crops 0..S-1 | confusers 0..S-1] — query i's
            # correct match is row i, its confuser row S+i
            pool = np.concatenate([np.concatenate(ks)[: args.songs],
                                   np.concatenate(cs)[: args.songs]])
            results.append({
                "alpha": alpha,
                "top1": float(_topk(q, pool, 1).mean()),
                "top5": float(_topk(q, pool, 5).mean()),
            })
            print(f"alpha={alpha:g}: top1={results[-1]['top1']:.3f} "
                  f"top5={results[-1]['top5']:.3f}")

    out = {
        "encoder_npz": str(args.encoder_npz),
        "model": args.model,
        "songs": args.songs,
        "pool_size": 2 * args.songs,
        "protocol": "confuser",
        "matmul_precision": meta.get("matmul_precision", "default"),
        "curve": results,
    }
    path = Path(args.output) if args.output else Path(
        str(Path(args.encoder_npz).with_suffix("")) + "_resolution.json")
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps({"output": str(path),
                      "curve": {str(r["alpha"]): r["top1"] for r in results}}))
    return out


if __name__ == "__main__":
    main()
