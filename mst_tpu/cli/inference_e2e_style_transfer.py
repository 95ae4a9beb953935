"""End-to-end style transfer CLI (ref: inference/inference_e2e_style_transfer.py).

    python -m mst_tpu.cli.inference_e2e_style_transfer \
        --input_audio in.wav --target_audio ref.wav \
        --tcn_checkpoint ckpts_st/final --encoder_checkpoint ckpts/best \
        --output_dir out/

Pipeline: load 10 s segments -> SCNet 4-stem separation (or pre-separated
stem dirs via --input_stems/--target_stems) -> embeddings -> FiLM ->
TCN transfer -> save wavs + stems + metadata.json with
initial/final embedding distance (ref layout: :439-466).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def get_params(argv=None):
    from mst_tpu.cli._common import add_audio_args, add_model_args

    p = argparse.ArgumentParser(description="E2E mixing style transfer (TPU)")
    p.add_argument("--input_audio", type=str, default=None)
    p.add_argument("--target_audio", type=str, default=None)
    p.add_argument("--input_stems", type=str, default=None,
                   help="pre-separated stem dir (skips SCNet)")
    p.add_argument("--target_stems", type=str, default=None)
    p.add_argument("--self_target_style_seed", type=int, default=None,
                   help="build the target from the INPUT's own separated "
                        "stems re-mixed under a different mixing style "
                        "(separation/synth_v2.render_style with this seed): "
                        "same content, different mix — the known-ground-"
                        "truth flagship demo protocol "
                        "(ref: inference_e2e_style_transfer.py:439-466)")
    p.add_argument("--segment_offset", type=float, default=0.0)
    p.add_argument("--target_segment_offset", type=float, default=None,
                   help="separate offset for the TARGET audio (defaults to "
                        "--segment_offset).  With the same file for both "
                        "sides, disjoint offsets give the reference's "
                        "two-different-songs protocol on one asset "
                        "(ref: inference_e2e_style_transfer.py:249-253)")
    p.add_argument("--target_style_seed", type=int, default=None,
                   help="re-mix the TARGET's separated stems under a fresh "
                        "mixing style (separation/synth_v2.render_style) — "
                        "combined with --target_segment_offset this builds "
                        "the cross-content demo: different content AND a "
                        "known different style")
    p.add_argument("--gain_stage_rms_db", type=float, default=-16.0,
                   help="input normalization (ON by default): scale input "
                        "and target stems so each MIXTURE hits this RMS "
                        "(dB) before embedding/transfer.  The TCN is "
                        "trained at this operating point (the conv stack — "
                        "BN + nonlinearities — is not scale-equivariant, "
                        "and real assets can sit 10+ dB away).  Raw-level "
                        "audio therefore needs no manual staging flag; "
                        "pass --no_gain_stage to disable.  All saved wavs "
                        "are in the staged domain.")
    p.add_argument("--no_gain_stage", dest="gain_stage_rms_db",
                   action="store_const", const=None,
                   help="disable the default input gain staging")
    add_audio_args(p)
    add_model_args(p)
    p.add_argument("--encoder_checkpoint", type=str, default=None)
    p.add_argument("--encoder_npz", type=str, default=None,
                   help="trained encoder .npz artifact (cli/train.py "
                        "--on_device_synth output); its sibling .json "
                        "overrides the encoder config flags")
    p.add_argument("--encoder_checkpoint_torch", type=str, default=None)
    # ref: inference_e2e_style_transfer.py:7 — mixture-based 128-d variant
    p.add_argument("--encoder_type", type=str, default="mixing_style",
                   choices=["mixing_style", "fx_encoder"])
    p.add_argument("--fx_encoder_checkpoint", type=str, default=None)
    p.add_argument("--fx_embed_dim", type=int, default=128)
    p.add_argument("--tcn_checkpoint", type=str, default=None)
    p.add_argument("--tcn_npz", type=str, default=None,
                   help="trained FiLM-TCN .npz artifact "
                        "(cli/train_style_transfer --on_device_synth "
                        "output); overrides --tcn_checkpoint")
    p.add_argument("--scnet_checkpoint", type=str, default=None,
                   help="SCNet separation weights (orbax)")
    p.add_argument("--hidden_channels", type=int, default=128)
    p.add_argument("--num_blocks", type=int, default=14)
    p.add_argument("--kernel_size", type=int, default=15)
    p.add_argument("--output_dir", type=str, default="e2e_output/")
    p.add_argument("--per_pair_steps", type=int, default=0,
                   help="after the zero-shot TCN pass, run this many steps "
                        "of per-pair optimization (eval/per_pair.py — the "
                        "reference's test_tcn_style_transfer.py protocol, "
                        "'converged' = >=20%% distance reduction) and save "
                        "optimized_mix.wav + metrics")
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def _load_segment(path, sr, offset, duration):
    from mst_tpu.data import read_audio

    audio, _ = read_audio(path, target_sr=sr)
    if audio.shape[0] == 1:
        audio = np.repeat(audio, 2, axis=0)
    s = int(offset * sr)
    n = int(duration * sr)
    seg = audio[:2, s : s + n]
    if seg.shape[1] < n:
        pad = np.zeros((2, n), np.float32)
        pad[:, : seg.shape[1]] = seg
        seg = pad
    return seg


def main(argv=None):
    args = get_params(argv)

    import jax
    import jax.numpy as jnp

    from mst_tpu.checkpoints import (
        encoder_params_from_torch,
        load_torch_checkpoint,
        restore_checkpoint,
    )
    from mst_tpu.cli._common import encoder_config_from_args, feature_config_from_args
    from mst_tpu.config import Stage1Config, StyleTransferConfig, TCNConfig
    from mst_tpu.data import load_stems, write_wav
    from mst_tpu.models import MixingStyleEncoder
    from mst_tpu.train import (
        create_stage1_state,
        create_style_transfer_state,
        apply_style_transfer,
    )
    from mst_tpu import STEMS

    enc_cfg = encoder_config_from_args(args)
    fcfg = feature_config_from_args(args)
    sr = args.sample_rate

    # --- stems: pre-separated dirs or SCNet separation ---
    _separator = []

    def get_stems(stem_dir, audio_path, offset):
        if stem_dir:
            stems = load_stems(stem_dir, sr)
            n = int(args.clip_duration * sr)
            s = int(offset * sr)
            stems = stems[..., s : s + n]
            if stems.shape[-1] < n:
                pad = np.zeros((4, 2, n), np.float32)
                pad[..., : stems.shape[-1]] = stems
                stems = pad
            return stems
        if audio_path is None:
            raise SystemExit("need --input_audio/--target_audio or stem dirs")
        mixture = _load_segment(audio_path, sr, offset, args.clip_duration)
        from mst_tpu.separation import SCNetSeparator

        if not _separator:
            _separator.append(SCNetSeparator.from_checkpoint(
                args.scnet_checkpoint, sample_rate=sr))
        return _separator[0].separate(mixture)

    def restyle(stems, seed):
        # re-mix separated stems under a fresh per-stem mixing style
        # (gain/pan/tilt/compression/reverb)
        from mst_tpu.separation.synth_v2 import render_style

        return np.asarray(jax.jit(
            lambda k, s: render_style(k, s, float(sr)))(
                jax.random.key(seed), jnp.asarray(stems, jnp.float32)))

    tgt_offset = (args.segment_offset if args.target_segment_offset is None
                  else args.target_segment_offset)
    input_stems = get_stems(args.input_stems, args.input_audio,
                            args.segment_offset)
    if args.self_target_style_seed is not None:
        # target = the input's own stems under a fresh style — content is
        # held fixed so the transfer target is well-posed on real audio
        target_stems = restyle(input_stems, args.self_target_style_seed)
    else:
        target_stems = get_stems(args.target_stems, args.target_audio,
                                 tgt_offset)
        if args.target_style_seed is not None:
            target_stems = restyle(target_stems, args.target_style_seed)

    gain_stage = {}
    if args.gain_stage_rms_db is not None:
        def staged(stems, name):
            rms = float(np.sqrt((stems.sum(0) ** 2).mean()))
            g = 10.0 ** (args.gain_stage_rms_db / 20.0) / max(rms, 1e-9)
            gain_stage[name] = {"gain": g,
                                "raw_rms_db": 20.0 * np.log10(max(rms, 1e-9))}
            return np.asarray(stems * g, np.float32)

        input_stems = staged(np.asarray(input_stems), "input")
        target_stems = staged(np.asarray(target_stems), "target")

    # --- models ---
    embed_fn = None
    enc = MixingStyleEncoder(enc_cfg)
    s1state, _, _ = create_stage1_state(
        Stage1Config(encoder=enc_cfg, features=fcfg), jax.random.key(args.seed), 1
    )
    if args.encoder_npz and args.encoder_type == "mixing_style":
        from mst_tpu.cli.train_style_transfer import _encoder_from_npz

        enc, enc_vars, enc_cfg, fcfg = _encoder_from_npz(args.encoder_npz)
        print(f"loaded encoder artifact from {args.encoder_npz}")
    elif args.encoder_type == "fx_encoder":
        from mst_tpu.models.fx_encoder import FxEncoder, make_fx_embed_fn

        fx = FxEncoder(audio=enc_cfg.audio, embed_dim=args.fx_embed_dim)
        if args.fx_encoder_checkpoint:
            from mst_tpu.checkpoints.npz_io import load_params_npz

            w = load_params_npz(args.fx_encoder_checkpoint)
            fx_vars = w if "params" in w else {"params": w}
        else:
            print("WARNING: randomly initialized fx encoder")
            fx_vars = jax.jit(fx.init)(
                jax.random.key(args.seed),
                jnp.zeros((1, 2, enc_cfg.audio.clip_samples)))
        embed_fn = make_fx_embed_fn(fx, fx_vars)
        enc_vars = {"params": s1state.params, "batch_stats": s1state.batch_stats}
    elif args.encoder_checkpoint_torch:
        ckpt = load_torch_checkpoint(args.encoder_checkpoint_torch)
        enc_vars = encoder_params_from_torch(ckpt["model_state_dict"], enc_cfg.n_subbands)
    elif args.encoder_checkpoint:
        s1state = restore_checkpoint(args.encoder_checkpoint, None, s1state)
        enc_vars = {"params": s1state.params, "batch_stats": s1state.batch_stats}
    else:
        print("WARNING: randomly initialized encoder")
        enc_vars = {"params": s1state.params, "batch_stats": s1state.batch_stats}

    cond_dim = (args.fx_embed_dim if args.encoder_type == "fx_encoder"
                else enc_cfg.embed_dim)
    # a .npz artifact's sibling .json records the TCN architecture (the
    # reference trainer forgot these keys and inference silently fell back
    # to defaults — SURVEY.md §2.5); trust the artifact over the flags
    if args.tcn_npz:
        tcn_meta = Path(args.tcn_npz).with_suffix(".json")
        if tcn_meta.exists():
            tc = json.loads(tcn_meta.read_text()).get("tcn", {})
            args.hidden_channels = tc.get("hidden_channels", args.hidden_channels)
            args.num_blocks = tc.get("num_blocks", args.num_blocks)
            args.kernel_size = tc.get("kernel_size", args.kernel_size)
    st_cfg = StyleTransferConfig(
        encoder=enc_cfg, features=fcfg,
        tcn=TCNConfig(hidden_channels=args.hidden_channels,
                      num_blocks=args.num_blocks, kernel_size=args.kernel_size,
                      use_film=True, film_embed_dim=2 * cond_dim),
    )
    state, tcn, gen, _ = create_style_transfer_state(st_cfg, jax.random.key(args.seed), 1)
    if args.tcn_npz:
        from mst_tpu.checkpoints.npz_io import load_params_npz

        w = load_params_npz(args.tcn_npz)
        state = state.replace(tcn_params=w["tcn_params"],
                              tcn_batch_stats=w["tcn_batch_stats"],
                              film_params=w["film_params"])
        print(f"loaded TCN artifact from {args.tcn_npz}")
    elif args.tcn_checkpoint:
        state = restore_checkpoint(args.tcn_checkpoint, None, state)
        print(f"loaded TCN from {args.tcn_checkpoint}")
    else:
        print("WARNING: randomly initialized TCN (near-identity transfer)")

    out_stems, metrics = apply_style_transfer(
        st_cfg, enc, enc_vars, tcn, gen, state,
        jnp.asarray(input_stems)[None], jnp.asarray(target_stems)[None],
        embed_fn=embed_fn,
    )
    out_stems = np.asarray(out_stems)[0]

    # --- save bundle (ref: :439-466) ---
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    write_wav(out / "input_mix.wav", input_stems.sum(0), sr)
    write_wav(out / "target_mix.wav", target_stems.sum(0), sr)
    write_wav(out / "transferred_mix.wav", out_stems.sum(0), sr)
    for i, name in enumerate(STEMS):
        write_wav(out / f"transferred_{name}.wav", out_stems[i], sr)
    # feature-space transfer quality (ref: style_transfer_eval.py:277-318):
    # |target - output| per audio-QA feature, with |target - input| as the
    # do-nothing baseline the transfer must beat
    from mst_tpu.eval.transfer_eval import StyleTransferEvaluator

    qa = StyleTransferEvaluator(embed_fn=None, sample_rate=sr)
    target_mix = target_stems.sum(0)
    meta = {
        "initial_distance": float(metrics["initial_distance"][0]),
        "final_distance": float(metrics["final_distance"][0]),
        "improvement": float(metrics["improvement"][0]),
        "transfer_quality": qa.evaluate_transfer_quality(
            target_mix, out_stems.sum(0)),
        "baseline_quality": qa.evaluate_transfer_quality(
            target_mix, input_stems.sum(0)),
        "input_audio": args.input_audio or args.input_stems,
        "target_audio": args.target_audio or args.target_stems,
        "segment_offset": args.segment_offset,
        "target_segment_offset": tgt_offset,
        "self_target_style_seed": args.self_target_style_seed,
        "target_style_seed": args.target_style_seed,
        "clip_duration": args.clip_duration,
        "gain_stage_rms_db": args.gain_stage_rms_db,
        "gain_stage": gain_stage or None,
        "encoder_npz": args.encoder_npz,
        "tcn_npz": args.tcn_npz,
        # resolved separator provenance (default resolution prefers the
        # current flagship, which changes as better artifacts land)
        "scnet_checkpoint": (getattr(_separator[0], "checkpoint_path",
                                     args.scnet_checkpoint)
                            if _separator else args.scnet_checkpoint),
        "config": {"hidden_channels": args.hidden_channels,
                   "num_blocks": args.num_blocks,
                   "kernel_size": args.kernel_size,
                   "encoder_type": args.encoder_type,
                   "encoder_dim": cond_dim},
    }

    if args.per_pair_steps:
        from mst_tpu.eval.per_pair import optimize_pair
        from mst_tpu.pipeline import embed_stems

        if embed_fn is None:  # mixing_style path: fused stem embedding
            pair_embed = lambda stems: embed_stems(enc, enc_vars, stems, fcfg)
        else:                 # fx_encoder path embeds the mixture
            pair_embed = lambda stems: embed_fn(stems.sum(axis=1))
        opt_stems, res = optimize_pair(
            None, fcfg, jnp.asarray(input_stems, jnp.float32),
            jnp.asarray(target_stems, jnp.float32),
            num_steps=args.per_pair_steps,
            rng=jax.random.key(args.seed), embed_fn=pair_embed)
        write_wav(out / "optimized_mix.wav", np.asarray(opt_stems).sum(0), sr)
        meta["per_pair"] = {
            "steps": args.per_pair_steps,
            "initial_distance": res["initial_distance"],
            "final_distance": res["final_distance"],
            "improvement": res["improvement"],
            "converged": res["converged"],
            "transfer_quality": qa.evaluate_transfer_quality(
                target_mix, np.asarray(opt_stems).sum(0)),
        }

    (out / "metadata.json").write_text(json.dumps(meta, indent=2))
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
