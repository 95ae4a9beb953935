"""Demix one audio file into 4 stems with the trained SCNet
(ref: the separation step embedded in inference/inference_e2e_style_transfer.py:262-287
and src/data.py:60-108, exposed standalone).

    python -m mst_tpu.cli.demix --input song.wav --output_dir out/

Writes ``<output_dir>/{vocals,bass,drums,other}.wav`` (unless
``--no_save_stems``) and ``<output_dir>/metrics.json`` with demix
plausibility metrics:

- ``recon_rel_err``: relative L2 error of sum-of-stems vs the input
  mixture.  SCNet predicts per-source complex masks applied to the mixture
  spectrogram (separation/scnet.py), so reconstruction holds exactly when
  the masks sum to one — how close a trained model gets is a quality
  signal, not a tautology.
- ``stem_energy_fraction``: each stem's share of total stem energy.
- ``band_fractions``: per stem, energy fraction in low (<250 Hz),
  mid (250-4000 Hz) and high (>4 kHz) bands — a bass stem should be
  LF-dominant, hats/cymbals HF-heavy, etc.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

STEMS = ("vocals", "bass", "drums", "other")


def get_params(argv=None):
    p = argparse.ArgumentParser(description="SCNet 4-stem demix (TPU)")
    p.add_argument("--input", type=str, required=True, help="wav/mp3 path")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--checkpoint", type=str, default=None,
                   help="SCNet .npz/orbax; default = committed trained artifact")
    p.add_argument("--sample_rate", type=int, default=44100)
    p.add_argument("--max_seconds", type=float, default=None,
                   help="crop the input (smoke runs)")
    p.add_argument("--no_save_stems", action="store_true")
    return p.parse_args(argv)


def demix_metrics(mixture: np.ndarray, stems: np.ndarray,
                  sample_rate: int) -> dict:
    """Plausibility metrics for a (4, 2, T) demix of a (2, T) mixture."""
    recon = stems.sum(axis=0)
    recon_rel_err = float(np.linalg.norm(recon - mixture)
                          / max(np.linalg.norm(mixture), 1e-12))
    energies = (stems ** 2).sum(axis=(-2, -1))
    frac = energies / max(energies.sum(), 1e-12)

    spec = np.abs(np.fft.rfft(stems.mean(axis=1), axis=-1)) ** 2  # (4, F)
    freqs = np.fft.rfftfreq(stems.shape[-1], 1.0 / sample_rate)
    bands = {}
    for i, name in enumerate(STEMS):
        tot = max(spec[i].sum(), 1e-12)
        bands[name] = {
            "low": float(spec[i, freqs < 250.0].sum() / tot),
            "mid": float(spec[i, (freqs >= 250.0) & (freqs < 4000.0)].sum() / tot),
            "high": float(spec[i, freqs >= 4000.0].sum() / tot),
        }
    return {
        "recon_rel_err": recon_rel_err,
        "stem_energy_fraction": {n: float(frac[i]) for i, n in enumerate(STEMS)},
        "band_fractions": bands,
    }


def main(argv=None):
    args = get_params(argv)

    from mst_tpu.data.audio_io import read_audio, write_wav
    from mst_tpu.separation import SCNetSeparator

    audio, _ = read_audio(args.input, target_sr=args.sample_rate)  # (2, T)
    if args.max_seconds is not None:
        audio = audio[:, : int(args.max_seconds * args.sample_rate)]
    print(f"{args.input}: {audio.shape[1] / args.sample_rate:.1f} s stereo")

    sep = SCNetSeparator.from_checkpoint(args.checkpoint,
                                         sample_rate=args.sample_rate)
    stems = sep.separate(audio)  # (4, 2, T)

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    metrics = demix_metrics(np.asarray(audio, np.float32),
                            np.asarray(stems, np.float32), args.sample_rate)
    metrics["input"] = str(args.input)
    metrics["seconds"] = audio.shape[1] / args.sample_rate
    # resolved provenance (the default resolution moves as better
    # artifacts land)
    metrics["checkpoint"] = getattr(sep, "checkpoint_path", args.checkpoint)
    (out / "metrics.json").write_text(json.dumps(metrics, indent=2))
    if not args.no_save_stems:
        for i, name in enumerate(STEMS):
            write_wav(out / f"{name}.wav", stems[i], args.sample_rate)
    print(json.dumps({k: metrics[k] for k in
                      ("recon_rel_err", "stem_energy_fraction")}))
    return metrics


if __name__ == "__main__":
    main()
