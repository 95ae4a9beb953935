"""Effect-chain style transfer CLI (ref: src/style_transfer_eval.py).

The reference's ST-ITO harness is runnable (`test_style_transfer()` at
style_transfer_eval.py:326-364 plus the `run_style_transfer` driver at
:139-231): CMA-ES over a pedalboard effect chain minimizing AFx-Rep
embedding distance.  This CLI exposes the tpu-native equivalent
(:mod:`mst_tpu.eval.transfer_eval`) end to end: mixture-level FxEncoder
embeddings, the differentiable on-device effect chain, and either the
TPU-native gradient search (Adam through chain + embedding, one jitted
scan) or the reference-protocol CMA-ES.

    python -m mst_tpu.cli.effects_transfer \
        --input /root/reference/assets/song_A.wav --target styled.wav \
        --output_dir out/

Self-target mode (recovery evidence without a second file): render the
target by applying a HIDDEN random effect chain to the input itself —
the search should then drive the embedding distance (nearly) closed:

    python -m mst_tpu.cli.effects_transfer \
        --input /root/reference/assets/song_A.wav --self_target_seed 7 \
        --output_dir artifacts/effects_transfer_demo

Writes ``output.wav`` (+ ``target.wav`` in self-target mode) and
``metrics.json`` with initial/final embedding distance, improvement,
recovered effect params, and audio QA reports (the reference's
metadata.json fields, inference_e2e_style_transfer.py:439-466, plus the
QA block from style_transfer_eval.py:233-275).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def get_params(argv=None):
    p = argparse.ArgumentParser(
        description="effect-chain style transfer (ST-ITO role, TPU)")
    p.add_argument("--input", type=str, required=True, help="wav/mp3 path")
    p.add_argument("--target", type=str, default=None,
                   help="style reference audio (omit with --self_target_seed)")
    p.add_argument("--self_target_seed", type=int, default=None,
                   help="render the target by applying a hidden random "
                        "effect chain to the input (recovery evidence)")
    p.add_argument("--fx_npz", type=str,
                   default="artifacts/fx_encoder_synth_best.npz",
                   help="trained FxEncoder artifact (+ sibling .json)")
    p.add_argument("--method", choices=("gradient", "cma"), default="gradient",
                   help="'gradient': Adam through the differentiable chain "
                        "(TPU-native); 'cma': the reference's CMA-ES protocol")
    p.add_argument("--num_steps", type=int, default=150,
                   help="gradient steps (gradient method)")
    p.add_argument("--cma_generations", type=int, default=25)
    p.add_argument("--cma_popsize", type=int, default=12)
    p.add_argument("--max_seconds", type=float, default=10.0,
                   help="crop both clips (embedding is clip-level)")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--no_save_audio", action="store_true")
    return p.parse_args(argv)


def _load_fx_embed_fn(fx_npz: str):
    """Mixture-level ``embed_fn((2,T)) -> (D,)`` from a trained artifact."""
    import jax

    from mst_tpu.checkpoints.npz_io import load_params_npz
    from mst_tpu.config import AudioConfig
    from mst_tpu.models.fx_encoder import FxEncoder

    meta = json.loads(Path(fx_npz).with_suffix(".json").read_text())
    c = meta["config"]
    audio = AudioConfig(
        sample_rate=meta["sample_rate"], clip_duration=meta["clip_duration"],
        n_fft=c["n_fft"], hop_length=c["hop_length"], n_mels=c["n_mels"],
        mel_method=c.get("mel_method", "rfft"),
    )
    fx = FxEncoder(audio=audio, embed_dim=meta["embed_dim"])
    variables = load_params_npz(fx_npz)

    @jax.jit
    def embed(audio_ct):
        return fx.apply(variables, audio_ct[None], train=False)[0]

    return embed, meta


def main(argv=None):
    args = get_params(argv)
    if (args.target is None) == (args.self_target_seed is None):
        raise SystemExit("pass exactly one of --target / --self_target_seed")

    import jax

    from mst_tpu.data.audio_io import read_audio, write_wav
    from mst_tpu.eval.effects_search import (
        N_PARAMS, render_effect_chain, _unit_to_params)
    from mst_tpu.eval.transfer_eval import StyleTransferEvaluator

    embed_fn, meta = _load_fx_embed_fn(args.fx_npz)
    sr = int(meta["sample_rate"])
    T = int(args.max_seconds * sr)

    def load_clip(path: str) -> np.ndarray:
        audio, _ = read_audio(path, target_sr=sr)  # (2, T)
        audio = audio[:, :T]
        if audio.shape[1] < T:  # static shapes: pad short clips
            audio = np.pad(audio, ((0, 0), (0, T - audio.shape[1])))
        return np.asarray(audio, np.float32)

    inp = load_clip(args.input)
    true_params = None
    if args.self_target_seed is not None:
        key = jax.random.key(args.self_target_seed)
        true_u = jax.random.uniform(key, (N_PARAMS,), minval=0.1, maxval=0.9)
        tgt = render_effect_chain(inp, true_u, sr)
        true_params = {k: float(v) for k, v in _unit_to_params(true_u).items()}
    else:
        tgt = load_clip(args.target)

    precision = ("highest" if meta.get("matmul_precision") == "highest"
                 else "bfloat16")
    with jax.default_matmul_precision(precision):
        ev = StyleTransferEvaluator(
            embed_fn, sample_rate=sr, method=args.method,
            num_steps=args.num_steps, cma_generations=args.cma_generations,
            cma_popsize=args.cma_popsize,
        )
        out, metrics = ev.run_style_transfer(inp, tgt)

    metrics["input"] = str(args.input)
    metrics["target"] = args.target or f"self+chain(seed={args.self_target_seed})"
    metrics["method"] = args.method
    metrics["fx_npz"] = str(args.fx_npz)
    metrics["seconds"] = args.max_seconds
    if true_params is not None:
        metrics["true_effect_params"] = true_params

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "metrics.json").write_text(json.dumps(metrics, indent=2))
    if not args.no_save_audio:
        write_wav(out_dir / "output.wav", np.asarray(out, np.float32), sr)
        if args.self_target_seed is not None:
            write_wav(out_dir / "target.wav", tgt, sr)
    print(json.dumps({k: metrics[k] for k in
                      ("initial_distance", "final_distance", "improvement")}))
    return metrics


if __name__ == "__main__":
    main()
