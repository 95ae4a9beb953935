"""Retrieval validation CLI (ref: inference/validate_retrieval.py).

In-domain protocol: queries = last 10 s of each val track, pool = first 10 s
of all val tracks, top-1/top-5 own-track hit rate
(ref: validate_retrieval.py:92-165).  Writes metrics.json + embedding caches.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def get_params(argv=None):
    from mst_tpu.cli._common import add_audio_args, add_model_args

    p = argparse.ArgumentParser(description="Retrieval validation (TPU)")
    p.add_argument("--separated_path", type=str, required=True)
    add_audio_args(p)
    add_model_args(p)
    p.add_argument("--checkpoint", type=str, default=None,
                   help="orbax stage-1 checkpoint dir")
    p.add_argument("--encoder_npz", type=str, default=None,
                   help="trained encoder .npz artifact (cli/train.py "
                        "--on_device_synth output); its sibling .json "
                        "overrides the encoder config flags")
    p.add_argument("--checkpoint_torch", type=str, default=None,
                   help="reference .pt checkpoint")
    p.add_argument("--output_dir", type=str, default="validation_results/")
    p.add_argument("--cache_dir", type=str, default=None,
                   help="reuse/save embedding caches here")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--seed", type=int, default=42)
    # out-of-domain retrieval (ref: validate_retrieval.py:169-308): raw
    # mixture queries separated on the fly with SCNet, pool = full dataset
    p.add_argument("--query_audio_dir", type=str, default=None,
                   help="directory of mixture files for OOD queries")
    p.add_argument("--scnet_checkpoint", type=str, default=None)
    p.add_argument("--top_k", type=int, default=5)
    return p.parse_args(argv)


def main(argv=None):
    args = get_params(argv)

    import jax

    from mst_tpu.checkpoints import (
        encoder_params_from_torch,
        load_torch_checkpoint,
        restore_checkpoint,
    )
    from mst_tpu.cli._common import encoder_config_from_args, feature_config_from_args
    from mst_tpu.config import Stage1Config
    from mst_tpu.data import FMABaselineDataset, train_val_split
    from mst_tpu.eval import (
        build_embedding_cache,
        evaluate_retrieval_accuracy,
        load_embedding_cache,
        save_embedding_cache,
    )
    from mst_tpu.models import MixingStyleEncoder
    from mst_tpu.train import create_stage1_state

    enc_cfg = encoder_config_from_args(args)
    fcfg = feature_config_from_args(args)
    enc = MixingStyleEncoder(enc_cfg)

    if args.encoder_npz:
        from mst_tpu.cli.train_style_transfer import _encoder_from_npz

        enc, enc_vars, enc_cfg, fcfg = _encoder_from_npz(args.encoder_npz)
        print(f"loaded encoder artifact from {args.encoder_npz}")
    else:
        s1state, _, _ = create_stage1_state(
            Stage1Config(encoder=enc_cfg, features=fcfg),
            jax.random.key(args.seed), 1
        )
        if args.checkpoint_torch:
            ckpt = load_torch_checkpoint(args.checkpoint_torch)
            enc_vars = encoder_params_from_torch(ckpt["model_state_dict"],
                                                 enc_cfg.n_subbands)
        elif args.checkpoint:
            s1state = restore_checkpoint(args.checkpoint, None, s1state)
            enc_vars = {"params": s1state.params,
                        "batch_stats": s1state.batch_stats}
        else:
            print("WARNING: randomly initialized encoder")
            enc_vars = {"params": s1state.params,
                        "batch_stats": s1state.batch_stats}

    dataset = FMABaselineDataset(args.separated_path, args.sample_rate,
                                 args.clip_duration, num_segments=1, seed=args.seed)
    _, val_idx = train_val_split(len(dataset), 0.1, args.seed)
    if len(val_idx) == 0:
        val_idx = np.arange(len(dataset))
    print(f"validating retrieval over {len(val_idx)} tracks")

    cache_dir = Path(args.cache_dir) if args.cache_dir else None
    caches = {}
    for name, segment in (("queries", "last"), ("pool", "first")):
        cache_path = cache_dir / f"{name}.npz" if cache_dir else None
        if cache_path and cache_path.exists():
            caches[name] = load_embedding_cache(cache_path)
            print(f"loaded {name} cache from {cache_path}")
        else:
            caches[name] = build_embedding_cache(
                enc, enc_vars, dataset, val_idx, fcfg, segment=segment,
                clip_duration=args.clip_duration, batch_size=args.batch_size,
            )
            if cache_path:
                cache_path.parent.mkdir(parents=True, exist_ok=True)
                save_embedding_cache(cache_path, caches[name])

    metrics = evaluate_retrieval_accuracy(
        caches["queries"]["embeddings"], caches["queries"]["track_indices"],
        caches["pool"]["embeddings"], caches["pool"]["track_indices"],
        ks=(1, 5),
    )
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)

    # ---- out-of-domain: separate raw mixtures on the fly, retrieve from
    # the full pool (ref: validate_retrieval.py:169-308) ----
    if args.query_audio_dir:
        from mst_tpu.data import read_audio
        from mst_tpu.eval import compute_embeddings, retrieve_top_k
        from mst_tpu.separation import SCNetSeparator

        sep = SCNetSeparator.from_checkpoint(
            args.scnet_checkpoint, sample_rate=args.sample_rate
        )
        full_pool = build_embedding_cache(
            enc, enc_vars, dataset, np.arange(len(dataset)), fcfg,
            segment="first", clip_duration=args.clip_duration,
            batch_size=args.batch_size,
        )
        n = int(args.clip_duration * args.sample_rate)
        query_stems, query_files = [], []
        for f in sorted(Path(args.query_audio_dir).iterdir()):
            if f.suffix.lower() not in (".wav", ".mp3", ".flac"):
                continue
            try:
                mix, _ = read_audio(f, target_sr=args.sample_rate)
                if mix.shape[0] == 1:
                    mix = np.repeat(mix, 2, axis=0)
                stems = sep.separate(mix[:2, :n])
                if stems.shape[-1] < n:
                    pad = np.zeros((4, 2, n), np.float32)
                    pad[..., : stems.shape[-1]] = stems
                    stems = pad
                query_stems.append(stems)
                query_files.append(str(f))
            except Exception as e:  # noqa: BLE001
                print(f"OOD query failed for {f}: {e}")
        if query_stems:
            q_embs = compute_embeddings(
                enc, enc_vars, np.stack(query_stems), fcfg, args.batch_size
            )
            top, sims = retrieve_top_k(
                q_embs, full_pool["embeddings"], k=args.top_k
            )
            # write the top-1 retrieved track's mixture for listening checks
            # (ref: validate_retrieval.py:259-282)
            from mst_tpu.data.audio_io import write_wav
            from mst_tpu.data.datasets import load_stems

            retrieved_dir = out / "retrieved_audio"
            retrieved_dir.mkdir(parents=True, exist_ok=True)
            ood = []
            for i in range(len(query_files)):
                rec = {
                    "query": query_files[i],
                    "retrieved": [full_pool["track_paths"][j] for j in top[i]],
                    "similarities": sims[i].tolist(),
                }
                try:
                    mix = load_stems(full_pool["track_paths"][top[i][0]],
                                     args.sample_rate).sum(axis=0)  # (2, T)
                    wav = retrieved_dir / (
                        f"{Path(query_files[i]).stem}_retrieved_mix.wav")
                    write_wav(wav, mix, args.sample_rate)
                    rec["retrieved_mix_wav"] = str(wav)
                except Exception as e:  # per-item tolerance (ref: :281-282)
                    print(f"could not write retrieved mix for "
                          f"{query_files[i]}: {e}")
                ood.append(rec)
            metrics["out_of_domain"] = {"num_queries": len(ood)}
            (out / "retrieval_log.json").write_text(json.dumps(ood, indent=2))

    (out / "metrics.json").write_text(json.dumps(metrics, indent=2))
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
