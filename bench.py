"""Benchmark: mixing-style embedding pipeline throughput (clips/sec/chip).

Workload = BASELINE.json configs 1+2 fused: batched 10 s stereo 4-stem clips
-> on-device 64-d mixing features -> band-split FiLM encoder -> embedding,
one jitted program on the TPU (trained config: 2048/512/80, embed 512).

Baseline = the reference pipeline on CPU (torch replica with identical
architecture + reference-formula feature extraction), measured in-process.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _measure_tpu(batch_size: int = 64, iters: int = 10) -> float:
    import jax
    import jax.numpy as jnp

    import dataclasses

    from mst_tpu.config import TRAINED_ENCODER, FeatureConfig
    from mst_tpu.models import MixingStyleEncoder
    from mst_tpu.pipeline import embed_stems

    # GEMM-DFT mel front-end: 1.7x pipeline speedup at embedding cosine
    # 0.999999 vs the rfft parity path (measured on v5e)
    audio = dataclasses.replace(TRAINED_ENCODER.audio, mel_method="gemm")
    cfg = dataclasses.replace(TRAINED_ENCODER, audio=audio)
    fcfg = FeatureConfig(audio=audio)
    model = MixingStyleEncoder(cfg)

    T = cfg.audio.clip_samples
    rng = np.random.default_rng(0)
    stems = jnp.asarray(rng.standard_normal((batch_size, 4, 2, T), dtype=np.float32) * 0.1)
    variables = model.init(jax.random.key(0), stems[:1],
                           jnp.zeros((1, cfg.feature_dim)))

    @jax.jit
    def pipeline(stems):
        return embed_stems(model, variables, stems, fcfg)

    out = pipeline(stems)
    out.block_until_ready()  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipeline(stems)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


def _measure_cpu_reference(n_clips: int = 6) -> float:
    import torch

    from tests.torch_encoder import TorchMixingStyleEncoder
    from tests.reference_features import RefFeatureExtractor, STEMS

    torch.manual_seed(0)
    tmodel = TorchMixingStyleEncoder(
        n_fft=2048, hop=512, n_mels=80, split_size=16, overlap=8,
        embed_dim=512, feature_dim=64, clip_seconds=10.0,
    ).eval()
    fx = RefFeatureExtractor(44100, 2048, 512, 80)

    T = 441000
    rng = np.random.default_rng(0)
    clips = [rng.standard_normal((4, 2, T)).astype(np.float32) * 0.1
             for _ in range(n_clips)]

    # warmup one clip
    with torch.no_grad():
        c = torch.from_numpy(clips[0])
        feats = fx.extract({s: c[i] for i, s in enumerate(STEMS)})
        tmodel(c.unsqueeze(0), torch.from_numpy(feats).unsqueeze(0))

    t0 = time.perf_counter()
    with torch.no_grad():
        for clip in clips:
            c = torch.from_numpy(clip)
            feats = fx.extract({s: c[i] for i, s in enumerate(STEMS)})
            tmodel(c.unsqueeze(0), torch.from_numpy(feats).unsqueeze(0))
    dt = time.perf_counter() - t0
    return n_clips / dt


def main():
    tpu_cps = _measure_tpu()
    cpu_cps = _measure_cpu_reference()
    print(json.dumps({
        "metric": "embed_pipeline_clips_per_sec_per_chip",
        "value": round(tpu_cps, 3),
        "unit": "clips/s",
        "vs_baseline": round(tpu_cps / cpu_cps, 2),
    }))


if __name__ == "__main__":
    main()
