"""Effect-chain style transfer search (ref: src/style_transfer_eval.py).

The reference evaluates against st-ito: CMA-ES over a pedalboard effect
chain (compressor/HP/LP/reverb/limiter; param ranges at
style_transfer_eval.py:67-137) minimizing AFx-Rep embedding distance.
Equivalent here, with our embedding model and a parametric on-device effect
chain:

- the chain (gain, low/high shelf tilt, compressor threshold/ratio,
  low-pass cutoff, reverb wet) is pure jnp and differentiable, so the
  TPU-native optimizer is plain **gradient descent through the chain**;
- a dependency-free **CMA-ES** is provided for gradient-free parity with
  the reference protocol.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from mst_tpu.ops.biquad import butter_sos, sosfilt_fir
from mst_tpu.ops.fftconv import fft_convolve_1d

# (name, low, high) — mirrors the reference's search space
PARAM_SPACE = (
    ("gain_db", -12.0, 12.0),
    ("highpass_hz", 20.0, 500.0),
    ("lowpass_hz", 2000.0, 20000.0),
    ("comp_threshold_db", -40.0, 0.0),
    ("comp_ratio", 1.0, 8.0),
    ("reverb_wet", 0.0, 0.5),
)
N_PARAMS = len(PARAM_SPACE)


def _unit_to_params(u: jax.Array) -> dict:
    """u in [0,1]^N -> physical parameter dict."""
    out = {}
    for i, (name, lo, hi) in enumerate(PARAM_SPACE):
        out[name] = lo + (hi - lo) * jnp.clip(u[i], 0.0, 1.0)
    return out


def apply_effect_chain(audio: jax.Array, u: jax.Array,
                       sample_rate: int = 44100, rng=None) -> jax.Array:
    """(C, T) audio, u in [0,1]^6 -> processed audio.  Differentiable."""
    p = _unit_to_params(u)
    x = audio * 10.0 ** (p["gain_db"] / 20.0)
    x = sosfilt_fir(butter_sos(2, p["highpass_hz"], "high", sample_rate), x, 2048)
    x = sosfilt_fir(butter_sos(4, p["lowpass_hz"], "low", sample_rate), x, 2048)
    # soft-knee-ish compressor in dB domain
    db = 20.0 * jnp.log10(jnp.abs(x) + 1e-8)
    over = jnp.maximum(db - p["comp_threshold_db"], 0.0)
    gain_db = -over * (1.0 - 1.0 / p["comp_ratio"])
    x = x * 10.0 ** (gain_db / 20.0)
    # fixed exp-decay reverb, wet controlled
    T = x.shape[-1]
    rl = sample_rate // 4
    t = jnp.linspace(0.0, 0.25, rl)
    key = rng if rng is not None else jax.random.key(0)
    ir = jnp.exp(-t / 0.08) * jax.random.normal(key, (rl,)) * 0.05
    wet = fft_convolve_1d(x, ir, mode="same_corr")[..., :T]
    return x * (1.0 - p["reverb_wet"]) + wet * p["reverb_wet"]


def gradient_search(
    embed_fn: Callable[[jax.Array], jax.Array],
    input_audio: jax.Array,
    target_emb: jax.Array,
    num_steps: int = 100,
    lr: float = 0.05,
    sample_rate: int = 44100,
):
    """TPU-native effect search: Adam on the 6 chain params through the
    differentiable chain + embedding.  Returns (audio, params, losses)."""
    import optax

    u = jnp.full((N_PARAMS,), 0.5)
    tx = optax.adam(lr)
    opt = tx.init(u)

    def loss_fn(u):
        out = apply_effect_chain(input_audio, u, sample_rate)
        emb = embed_fn(out)
        e = emb / jnp.maximum(jnp.linalg.norm(emb), 1e-12)
        t = target_emb / jnp.maximum(jnp.linalg.norm(target_emb), 1e-12)
        return 1.0 - jnp.sum(e * t)

    @jax.jit
    def run(u, opt):
        def step(carry, _):
            u, opt = carry
            loss, g = jax.value_and_grad(loss_fn)(u)
            upd, opt = tx.update(g, opt, u)
            return (optax.apply_updates(u, upd), opt), loss

        (u, _), losses = jax.lax.scan(step, (u, opt), None, length=num_steps)
        return u, losses

    u, losses = run(u, opt)
    out = apply_effect_chain(input_audio, u, sample_rate)
    return out, _unit_to_params(u), np.asarray(losses)


def cma_es_search(
    objective: Callable[[np.ndarray], float],
    num_generations: int = 30,
    popsize: int = 12,
    sigma0: float = 0.25,
    seed: int = 0,
):
    """Minimal (mu/mu_w, lambda)-CMA-ES over [0,1]^N_PARAMS — the
    reference's search protocol (ref: style_transfer_eval.py:139-231)
    without external dependencies.  Returns (best_u, best_f, history)."""
    rng = np.random.default_rng(seed)
    n = N_PARAMS
    mean = np.full(n, 0.5)
    sigma = sigma0
    C = np.eye(n)
    mu = popsize // 2
    w = np.log(mu + 0.5) - np.log(np.arange(1, mu + 1))
    w /= w.sum()
    mueff = 1.0 / np.sum(w**2)
    cc = (4 + mueff / n) / (n + 4 + 2 * mueff / n)
    cs = (mueff + 2) / (n + mueff + 5)
    c1 = 2 / ((n + 1.3) ** 2 + mueff)
    cmu = min(1 - c1, 2 * (mueff - 2 + 1 / mueff) / ((n + 2) ** 2 + mueff))
    damps = 1 + 2 * max(0, np.sqrt((mueff - 1) / (n + 1)) - 1) + cs
    pc = np.zeros(n)
    ps = np.zeros(n)
    chiN = np.sqrt(n) * (1 - 1 / (4 * n) + 1 / (21 * n * n))

    best_u, best_f = mean.copy(), float("inf")
    history = []
    for g in range(num_generations):
        A = np.linalg.cholesky(C + 1e-10 * np.eye(n))
        z = rng.standard_normal((popsize, n))
        xs = np.clip(mean + sigma * z @ A.T, 0.0, 1.0)
        fs = np.array([objective(x) for x in xs])
        order = np.argsort(fs)
        history.append(float(fs[order[0]]))
        if fs[order[0]] < best_f:
            best_f = float(fs[order[0]])
            best_u = xs[order[0]].copy()
        sel = xs[order[:mu]]
        zsel = z[order[:mu]]
        old_mean = mean
        mean = w @ sel
        zw = w @ zsel
        ps = (1 - cs) * ps + np.sqrt(cs * (2 - cs) * mueff) * zw
        hsig = float(np.linalg.norm(ps) / np.sqrt(1 - (1 - cs) ** (2 * (g + 1)))
                     < (1.4 + 2 / (n + 1)) * chiN)
        pc = (1 - cc) * pc + hsig * np.sqrt(cc * (2 - cc) * mueff) * (
            (mean - old_mean) / max(sigma, 1e-12)
        )
        artmp = (sel - old_mean) / max(sigma, 1e-12)
        C = ((1 - c1 - cmu) * C
             + c1 * (np.outer(pc, pc) + (1 - hsig) * cc * (2 - cc) * C)
             + cmu * artmp.T @ np.diag(w) @ artmp)
        sigma = sigma * np.exp((cs / damps) * (np.linalg.norm(ps) / chiN - 1))
    return best_u, best_f, history
