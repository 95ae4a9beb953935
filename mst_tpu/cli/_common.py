"""Shared CLI plumbing: flag groups mirroring the reference's params.py,
metric logging, seeding."""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

from mst_tpu.config import AudioConfig, EncoderConfig, FeatureConfig


def add_audio_args(p: argparse.ArgumentParser) -> None:
    """Mirrors ref params.py:24-30 (+ dataset group 15-22)."""
    p.add_argument("--sample_rate", type=int, default=44100)
    p.add_argument("--clip_duration", type=float, default=10.0)
    p.add_argument("--n_fft", type=int, default=1024)
    p.add_argument("--hop_length", type=int, default=256)
    p.add_argument("--n_mels", type=int, default=128)
    p.add_argument("--mel_method", choices=("rfft", "gemm"), default="gemm",
                   help="'gemm' = DFT-as-GEMM on the MXU (~2x faster, "
                        "embedding cosine 0.999999 vs rfft); 'rfft' = "
                        "bit-parity path. CLIs default to 'gemm' (TPU "
                        "perf); the library AudioConfig defaults to 'rfft' "
                        "(torch parity) — an intentional split, see "
                        "config.py:AudioConfig.mel_method")


def add_model_args(p: argparse.ArgumentParser) -> None:
    """Mirrors ref params.py:32-41."""
    p.add_argument("--encoder_dim", type=int, default=768)
    p.add_argument("--feature_dim", type=int, default=64)
    p.add_argument("--band_split_size", type=int, default=20)
    p.add_argument("--band_overlap", type=int, default=10)


def audio_config_from_args(args) -> AudioConfig:
    return AudioConfig(
        sample_rate=args.sample_rate,
        clip_duration=args.clip_duration,
        n_fft=args.n_fft,
        hop_length=args.hop_length,
        n_mels=args.n_mels,
        mel_method=getattr(args, "mel_method", "gemm"),
    )


def encoder_config_from_args(args) -> EncoderConfig:
    audio = audio_config_from_args(args)
    return EncoderConfig(
        audio=audio,
        split_size=args.band_split_size,
        overlap=args.band_overlap,
        embed_dim=args.encoder_dim,
        feature_dim=args.feature_dim,
    )


def feature_config_from_args(args) -> FeatureConfig:
    return FeatureConfig(
        audio=AudioConfig(
            sample_rate=args.sample_rate,
            clip_duration=args.clip_duration,
            n_fft=args.n_fft,
            hop_length=args.hop_length,
            n_mels=args.n_mels,
            mel_method=getattr(args, "mel_method", "gemm"),
        )
    )


class MetricsLogger:
    """JSONL metrics + optional TensorBoard scalars (parity with the
    reference's SummaryWriter usage; ref: train.py:360-371)."""

    def __init__(self, log_dir: str | Path, name: str = "train",
                 tensorboard: bool = True):
        self.path = Path(log_dir)
        self.path.mkdir(parents=True, exist_ok=True)
        self.file = (self.path / f"{name}_metrics.jsonl").open("a")
        self.t0 = time.time()
        self.tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(str(self.path / name))
            except Exception:
                self.tb = None

    def log(self, step: int, **scalars) -> None:
        rec = {"step": step, "time": round(time.time() - self.t0, 3)}
        rec.update({k: float(v) for k, v in scalars.items()})
        self.file.write(json.dumps(rec) + "\n")
        self.file.flush()
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(k, float(v), step)

    def close(self) -> None:
        self.file.close()
        if self.tb is not None:
            self.tb.close()
