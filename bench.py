"""Benchmark: the BASELINE.json north-star pipeline on one TPU chip.

Headline (BASELINE.json metric: "Triplets/sec/chip (separation+mel+encoder
pipeline)"; configs 3+1+2 fused): batched 10 s stereo mixtures -> SCNet
4-stem separation -> on-device 64-d mixing features -> band-split FiLM
encoder -> embedding, ONE jitted program.  vs_baseline = the identical
program on the host CPU (the reference's own torch stack cannot run here —
torchaudio/librosa absent — so XLA-CPU is the conservative stand-in; it is
*faster* than the reference's per-clip torch/scipy loop, understating the
ratio).

Extras inside the same JSON line:
- embed_clips_per_sec / embed_vs_torch_cpu: configs 1+2 only (features +
  encoder), vs the in-process torch replica of the reference architecture —
  directly comparable to BENCH_r01.
- stage1_train_clips_per_sec: config 4 — full contrastive train step with
  on-device augmentation (anchors/positives/negatives never leave HBM).
- e2e_transfer_ms: config 5 — FiLM-TCN style-transfer forward latency for
  one 10 s pair, embeddings included.
- MFU / roofline accounting (round-3 verdict item 2): FLOPs and HBM bytes
  per program from the compiled executable's own cost model
  (XLA ``cost_analysis()``), turned into ``mfu_full_pipeline`` /
  ``mfu_stage1_train`` (fraction of the v5e chip's 197 TFLOP/s bf16 peak —
  the standard MFU denominator; f32 programs run as bf16 MXU passes so
  this is the honest ceiling) and ``hbm_util_*`` (fraction of the 819 GB/s
  HBM peak).  Whichever fraction is higher names the roofline the program
  sits under; see docs/PERF.md.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extras"}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

SR = 44100
T10 = 441000  # 10 s

# TPU v5e single-chip peaks (public spec): 197 TFLOP/s bf16 MXU,
# 819 GB/s HBM.  MFU uses the bf16 peak as denominator even for f32
# programs (f32 matmuls execute as multi-pass bf16 on this hardware).
V5E_PEAK_FLOPS = 197e12
V5E_HBM_BYTES_PER_S = 819e9


def _cost_analysis(jitted, *args):
    """(compiled_callable, flops, hbm_bytes) for one invocation of
    ``jitted(*args)`` via the AOT path — the executable's own XLA cost
    model, not an analytic guess.  Returns (None, None, None) when the
    backend can't report costs (e.g. some CPU builds)."""
    try:
        compiled = jitted.lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return (compiled, float(ca.get("flops", 0.0)) or None,
                float(ca.get("bytes accessed", 0.0)) or None)
    except Exception:
        return None, None, None


def _scnet_cfg(stem: str = "scnet_synth_best"):
    from pathlib import Path

    from mst_tpu.separation import SCNetConfig

    # the trained-artifact config (artifacts/<stem>.json), run with the
    # bf16 serving core: the pipeline is HBM-bound (92% of peak in f32,
    # docs/PERF.md) and SCNet's activations are ~96% of the bytes, so bf16
    # is the deployment configuration (parity-tested:
    # tests/test_scnet.py::test_bf16_core_matches_f32 + on-chip SI-SDR
    # parity recorded in docs/PERF.md)
    meta = Path(__file__).resolve().parent / "artifacts" / f"{stem}.json"
    if meta.exists():
        return SCNetConfig.from_meta(json.loads(meta.read_text())["config"],
                                     compute_dtype="bfloat16")
    return SCNetConfig(n_fft=2048, hop_length=512,
                       compute_dtype="bfloat16")


def _build_full_pipeline(batch_size: int, stem: str = "scnet_synth_best"):
    """mixture (B, 2, T) -> embedding (B, D): separation+features+encoder.

    The SCNet runs the committed trained artifact
    (artifacts/<stem>.npz) so the bench also proves the trained
    path composes and catches artifact-load regressions; same FLOPs as a
    random init."""
    import dataclasses
    from pathlib import Path

    import jax
    import jax.numpy as jnp

    from mst_tpu.config import TRAINED_ENCODER, FeatureConfig
    from mst_tpu.models import MixingStyleEncoder
    from mst_tpu.pipeline import embed_stems
    from mst_tpu.separation import SCNet

    audio = dataclasses.replace(TRAINED_ENCODER.audio, mel_method="gemm")
    cfg = dataclasses.replace(TRAINED_ENCODER, audio=audio)
    fcfg = FeatureConfig(audio=audio)
    enc = MixingStyleEncoder(cfg)
    scnet = SCNet(_scnet_cfg(stem))

    rng = np.random.default_rng(0)
    mix = jnp.asarray(
        rng.standard_normal((batch_size, 2, T10), dtype=np.float32) * 0.1)
    enc_vars = enc.init(jax.random.key(0),
                        jnp.zeros((1, 4, 2, T10)), jnp.zeros((1, cfg.feature_dim)))
    artifact = Path(__file__).resolve().parent / "artifacts" / f"{stem}.npz"
    if artifact.exists():
        from mst_tpu.checkpoints.npz_io import load_params_npz

        scnet_vars = {"params": load_params_npz(artifact)}
    else:
        scnet_vars = jax.jit(scnet.init)(jax.random.key(1), mix[:1])

    @jax.jit
    def pipeline(mix):
        stems = scnet.apply(scnet_vars, mix)          # (B, 4, 2, T)
        return embed_stems(enc, enc_vars, stems, fcfg)  # (B, D)

    return pipeline, mix


def _throughput(fn, arg, batch: int, iters: int, repeats: int = 3) -> float:
    """Median of ``repeats`` timed windows: a single window is at the mercy
    of host-side scheduling jitter (round-2 verdict asked for <10% spread
    across bench runs)."""
    import jax

    out = fn(arg)
    jax.block_until_ready(out)  # compile + warmup
    rates = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(arg)
        jax.block_until_ready(out)
        rates.append(batch * iters / (time.perf_counter() - t0))
    return sorted(rates)[len(rates) // 2]


def _measure_full_tpu(batch_size: int = 8, iters: int = 10,
                      stem: str = "scnet_synth_best"):
    """(clips/s, flops-per-invocation, HBM-bytes-per-invocation, batch)."""
    pipeline, mix = _build_full_pipeline(batch_size, stem)
    compiled, flops, hbm = _cost_analysis(pipeline, mix)
    rate = _throughput(compiled or pipeline, mix, batch_size, iters)
    return rate, flops, hbm, batch_size


def _measure_full_cpu() -> float:
    """Same program, host CPU, separate process (this one is pinned to TPU)."""
    env = dict(os.environ)
    env.setdefault("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--cpu-probe"],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("CPU_CLIPS_PER_SEC"):
            return float(line.split()[1])
    raise RuntimeError(f"cpu probe failed: {out.stdout[-500:]} {out.stderr[-500:]}")


def _cpu_probe():
    """>=5 measured clips (time-budgeted): a 2-clip denominator made the
    headline ratio swing ~2x between runs (round-2 weak finding)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    pipeline, mix = _build_full_pipeline(1)
    out = pipeline(mix)
    jax.block_until_ready(out)  # compile + warmup
    durs = []
    t0 = time.perf_counter()
    while len(durs) < 5 or (time.perf_counter() - t0) < 45.0:
        t1 = time.perf_counter()
        jax.block_until_ready(pipeline(mix))
        durs.append(time.perf_counter() - t1)
        if len(durs) >= 16:
            break
    # fastest observed clip: the program is deterministic, so variance is
    # pure host contention/VM steal — the minimum is the least-biased and
    # most repeatable estimate (median still swung the headline ratio ~18%
    # between quiet-machine runs), and it is conservative for vs_baseline
    cps = 1.0 / min(durs)
    print(f"CPU_CLIPS_PER_SEC {cps:.6f}", flush=True)


def _measure_embed_tpu(batch_size: int = 64, iters: int = 10) -> float:
    """Configs 1+2 (features + encoder), comparable to BENCH_r01."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from mst_tpu.config import TRAINED_ENCODER, FeatureConfig
    from mst_tpu.models import MixingStyleEncoder
    from mst_tpu.pipeline import embed_stems

    audio = dataclasses.replace(TRAINED_ENCODER.audio, mel_method="gemm")
    cfg = dataclasses.replace(TRAINED_ENCODER, audio=audio)
    fcfg = FeatureConfig(audio=audio)
    model = MixingStyleEncoder(cfg)

    rng = np.random.default_rng(0)
    stems = jnp.asarray(
        rng.standard_normal((batch_size, 4, 2, T10), dtype=np.float32) * 0.1)
    variables = model.init(jax.random.key(0), stems[:1],
                           jnp.zeros((1, cfg.feature_dim)))

    @jax.jit
    def pipeline(stems):
        return embed_stems(model, variables, stems, fcfg)

    return _throughput(pipeline, stems, batch_size, iters)


def _measure_embed_cpu_torch(n_clips: int = 6) -> float:
    """In-process torch replica of the reference architecture (CPU)."""
    import torch

    from tests.torch_encoder import TorchMixingStyleEncoder
    from tests.reference_features import RefFeatureExtractor, STEMS

    torch.manual_seed(0)
    tmodel = TorchMixingStyleEncoder(
        n_fft=2048, hop=512, n_mels=80, split_size=16, overlap=8,
        embed_dim=512, feature_dim=64, clip_seconds=10.0,
    ).eval()
    fx = RefFeatureExtractor(SR, 2048, 512, 80)

    rng = np.random.default_rng(0)
    clips = [rng.standard_normal((4, 2, T10)).astype(np.float32) * 0.1
             for _ in range(n_clips)]

    def run(clip):
        with torch.no_grad():
            c = torch.from_numpy(clip)
            feats = fx.extract({s: c[i] for i, s in enumerate(STEMS)})
            tmodel(c.unsqueeze(0), torch.from_numpy(feats).unsqueeze(0))

    run(clips[0])  # warmup
    durs = []
    for clip in clips:
        t0 = time.perf_counter()
        run(clip)
        durs.append(time.perf_counter() - t0)
    # fastest clip, for the same reason as _cpu_probe
    return 1.0 / min(durs)


def _measure_stage1_train(batch: int = 8, segments: int = 2,
                          iters: int = 5) -> float:
    """Config 4: contrastive train step + on-device augmentation, clips/s."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from mst_tpu.augment import AugmentConfig, augment_stems
    from mst_tpu.config import TRAINED_ENCODER, FeatureConfig, Stage1Config
    from mst_tpu.train import create_stage1_state, make_train_step

    audio = dataclasses.replace(TRAINED_ENCODER.audio, mel_method="gemm")
    cfg = Stage1Config(
        encoder=dataclasses.replace(TRAINED_ENCODER, audio=audio),
        features=FeatureConfig(audio=audio),
        use_adversarial=False,
    )
    state, enc, _ = create_stage1_state(cfg, jax.random.key(0), 1000)
    aug = AugmentConfig()
    step_fn = make_train_step(
        cfg, enc, None, 1000,
        augment_fn=lambda k, s: augment_stems(k, s, aug),
    )
    n = batch * segments
    rng = np.random.default_rng(0)
    batch_d = {
        "stems": jnp.asarray(
            rng.standard_normal((n, 4, 2, T10), dtype=np.float32) * 0.1),
        "song_labels": jnp.asarray(np.repeat(np.arange(batch), segments)),
    }
    key = jax.random.key(1)
    compiled, flops, hbm = _cost_analysis(step_fn, state, batch_d, key)
    fn = compiled or step_fn
    state, m = fn(state, batch_d, key)
    jax.block_until_ready(m["total"])
    rates = []
    for _ in range(3):  # median window (see _throughput)
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = fn(state, batch_d, key)
        jax.block_until_ready(m["total"])
        rates.append(n * iters / (time.perf_counter() - t0))
    # each step consumes n clips and augments them to 2n contrastive views
    return sorted(rates)[1], flops, hbm, n


def _measure_e2e_transfer(iters: int = 10) -> float:
    """Config 5: one-pair FiLM-TCN style transfer forward latency (ms)."""
    import jax
    import jax.numpy as jnp

    from mst_tpu.config import StyleTransferConfig, TRAINED_ENCODER, FeatureConfig, TCNConfig
    from mst_tpu.models import MixingStyleEncoder
    from mst_tpu.train import create_style_transfer_state, apply_style_transfer

    cfg = StyleTransferConfig(
        encoder=TRAINED_ENCODER,
        features=FeatureConfig(audio=TRAINED_ENCODER.audio),
        tcn=TCNConfig(hidden_channels=64, num_blocks=14, kernel_size=15,
                      use_film=True, film_embed_dim=2 * TRAINED_ENCODER.embed_dim),
    )
    enc = MixingStyleEncoder(cfg.encoder)
    enc_vars = enc.init(jax.random.key(0), jnp.zeros((1, 4, 2, T10)),
                        jnp.zeros((1, cfg.encoder.feature_dim)))
    state, tcn, gen, _ = create_style_transfer_state(cfg, jax.random.key(1), 10)

    rng = np.random.default_rng(0)
    inp = jnp.asarray(rng.standard_normal((1, 4, 2, T10), dtype=np.float32) * 0.1)
    tgt = jnp.asarray(rng.standard_normal((1, 4, 2, T10), dtype=np.float32) * 0.1)

    @jax.jit
    def transfer(inp, tgt):
        out, metrics = apply_style_transfer(
            cfg, enc, enc_vars, tcn, gen, state, inp, tgt)
        return out, metrics["final_distance"]

    out, d = transfer(inp, tgt)
    jax.block_until_ready(d)
    times = []
    for _ in range(3):  # median window (see _throughput)
        t0 = time.perf_counter()
        for _ in range(iters):
            out, d = transfer(inp, tgt)
        jax.block_until_ready(d)
        times.append((time.perf_counter() - t0) / iters * 1e3)
    return sorted(times)[1]


def _measure_hbm_peak_gbps(size_mb: int = 256, iters: int = 40) -> float | None:
    """Measured achievable HBM bandwidth via a known-traffic microbench:
    ``y = y + 1`` over a ``size_mb`` f32 array inside a ``lax.fori_loop``
    moves exactly 2x its size per iteration (one read + one write per loop
    body; XLA cannot fuse across while-loop iterations).  All ``iters``
    iterations run in ONE dispatched program — a host-side loop of tiny
    jitted calls measures per-dispatch latency instead of bandwidth
    (~11 ms/dispatch through the remote tunnel, which made an early
    version of this report 81 GB/s).  This calibrates the roofline: the
    XLA cost model's "bytes accessed" double-counts reads that
    fusion/caching elides, so utilizations derived from it are upper
    bounds (round-4 verdict #4) — the microbench pins what the hardware
    actually sustains."""
    try:
        import jax
        import jax.numpy as jnp

        n = size_mb * (1 << 20) // 4
        x = jnp.zeros((n,), jnp.float32)
        # trip count as a TRACED operand: a static count lets XLA unroll
        # the loop and fuse the adds into one elementwise pass (an early
        # version measured an impossible 1.5 PB/s that way)
        k = jnp.asarray(iters, jnp.int32)

        @jax.jit
        def sweep(x, k):
            # per-iteration scalar addend: a plain ``a + 1.0`` body can be
            # collapsed to ``a + k`` by the loop simplifier (an early
            # version of this measured an impossible 881 TB/s)
            body = lambda i, a: a + jnp.sin(i.astype(jnp.float32))
            y = jax.lax.fori_loop(0, k, body, x)
            return y[:8]  # tiny slice; the full carry is still computed

        def run(x):
            # fetch to host: on the remote backend block_until_ready alone
            # does not guarantee the computation executed
            return np.asarray(sweep(x, k))

        run(x)  # compile + warmup
        rates = []
        for j in range(3):
            # distinct input each call: a repeated identical call can be
            # served from a result cache and time as ~0
            xj = x + float(j + 1)
            jax.block_until_ready(xj)
            t0 = time.perf_counter()
            run(xj)
            rates.append(2.0 * n * 4 * iters / (time.perf_counter() - t0))
        return sorted(rates)[1] / 1e9
    except Exception:
        return None


def _roofline_extras(prefix: str, rate_clips: float, flops, hbm, batch: int):
    """MFU + HBM-utilization extras for one program (round-3 verdict #2).

    ``hbm_util_*`` uses the cost model's bytes over the datasheet peak and
    is therefore an UPPER BOUND on true utilization: XLA's "bytes accessed"
    counts every operand of every fused op, re-counting reads that fusion
    keeps in registers/CMEM.  When the bound lands above 1.0 (physically
    impossible as a true utilization) the raw value moves to
    ``hbm_util_<p>_costmodel_raw`` with an ``_overcount`` flag and the
    clamped 1.0 is reported, per docs/PERF.md §roofline-calibration."""
    out = {}
    if flops:
        achieved = flops * rate_clips / batch          # FLOP/s sustained
        out[f"mfu_{prefix}"] = round(achieved / V5E_PEAK_FLOPS, 4)
        out[f"{prefix}_gflops_per_clip"] = round(flops / batch / 1e9, 1)
    if hbm:
        util = hbm * rate_clips / batch / V5E_HBM_BYTES_PER_S
        if util > 1.0:
            out[f"hbm_util_{prefix}"] = 1.0
            out[f"hbm_util_{prefix}_costmodel_raw"] = round(util, 4)
            out[f"hbm_util_{prefix}_overcount"] = True
        else:
            out[f"hbm_util_{prefix}"] = round(util, 4)
    return out


def main():
    full_tpu, full_flops, full_hbm, full_batch = _measure_full_tpu()
    stage1_rate, s1_flops, s1_hbm, s1_n = _measure_stage1_train()
    extras = {
        "embed_clips_per_sec": round(_measure_embed_tpu(), 3),
        "stage1_train_clips_per_sec": round(stage1_rate, 3),
        "e2e_transfer_ms": round(_measure_e2e_transfer(), 3),
    }
    extras.update(_roofline_extras("full_pipeline", full_tpu, full_flops,
                                   full_hbm, full_batch))
    extras.update(_roofline_extras("stage1_train", stage1_rate, s1_flops,
                                   s1_hbm, s1_n))
    # v2 separators come in TWO presets and bench reports both:
    #   full_pipeline_v2  — the SERVING preset (LRU core, bf16 input GEMMs
    #     with f32 recurrence).  Pinned to the LRU artifact so the number
    #     stays comparable with BENCH_r03/r04's v2 extras.
    #   full_pipeline_xl  — the QUALITY flagship (XL LRU, dims
    #     [4,96,192,384]); ~5x the serving preset's compute, reported with
    #     its own roofline extras so throughput-vs-quality is explicit.
    # _scnet_cfg honors each artifact's recorded rnn_impl/dims.
    from pathlib import Path
    art_dir = Path(__file__).resolve().parent / "artifacts"

    def _stem_ok(s):
        # BOTH weights and the sibling config json — a bare .npz would make
        # _scnet_cfg fall back to default dims and the load would fail with
        # a confusing shape error far from the cause
        return ((art_dir / f"{s}.npz").exists()
                and (art_dir / f"{s}.json").exists())

    v2_stem = next((s for s in ("scnet_synth2_lru_best", "scnet_synth2_best")
                    if _stem_ok(s)), None)
    if v2_stem:
        v2_rate, v2_flops, v2_hbm, v2_batch = _measure_full_tpu(
            batch_size=4, stem=v2_stem)
        extras["full_pipeline_v2_clips_per_sec"] = round(v2_rate, 3)
        extras["full_pipeline_v2_artifact"] = v2_stem
        extras.update(_roofline_extras("full_pipeline_v2", v2_rate,
                                       v2_flops, v2_hbm, v2_batch))
    if _stem_ok("scnet_synth2_xl_best"):
        xl_rate, xl_flops, xl_hbm, xl_batch = _measure_full_tpu(
            batch_size=4, stem="scnet_synth2_xl_best")
        extras["full_pipeline_xl_clips_per_sec"] = round(xl_rate, 3)
        extras["full_pipeline_xl_artifact"] = "scnet_synth2_xl_best"
        extras.update(_roofline_extras("full_pipeline_xl", xl_rate,
                                       xl_flops, xl_hbm, xl_batch))
    hbm_meas = _measure_hbm_peak_gbps()
    if hbm_meas:
        # measured achievable bandwidth (known-traffic microbench) — the
        # calibrated denominator docs/PERF.md's roofline argument rests on
        extras["hbm_measured_gbps"] = round(hbm_meas, 1)
        extras["hbm_measured_frac_of_peak"] = round(
            hbm_meas * 1e9 / V5E_HBM_BYTES_PER_S, 3)
    extras["embed_vs_torch_cpu"] = round(
        extras["embed_clips_per_sec"] / _measure_embed_cpu_torch(), 2)
    full_cpu = _measure_full_cpu()
    print(json.dumps({
        "metric": "full_pipeline_clips_per_sec_per_chip",
        "value": round(full_tpu, 3),
        "unit": "clips/s",
        "vs_baseline": round(full_tpu / full_cpu, 2),
        "extras": extras,
    }))


if __name__ == "__main__":
    if "--cpu-probe" in sys.argv:
        _cpu_probe()
    else:
        main()
