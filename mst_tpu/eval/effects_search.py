"""Effect-chain style transfer search (ref: src/style_transfer_eval.py).

The reference evaluates against st-ito: CMA-ES over a pedalboard effect
chain (compressor/HP/LP/reverb/limiter; param ranges at
style_transfer_eval.py:67-137) minimizing AFx-Rep embedding distance.
Equivalent here, with our embedding model and a parametric on-device effect
chain:

- the chain (output gain, compressor threshold/ratio/attack/release,
  high-pass/low-pass cutoffs, damped reverb, limiter — PARAM_SPACE below)
  is pure jnp and differentiable, so the TPU-native optimizer is plain
  **gradient descent through the chain**;
- a dependency-free **CMA-ES** is provided for gradient-free parity with
  the reference protocol.
"""

from __future__ import annotations

import functools

from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from mst_tpu.ops.biquad import butter_sos, sosfilt_fir, sosfilt_scan
from mst_tpu.ops.fftconv import fft_convolve_1d

# (name, low, high) — mirrors the reference's 'standard' chain search space
# (style_transfer_eval.py:81-118: Compressor threshold/ratio/attack/release,
# Highpass, Lowpass, Reverb wet/damping, Limiter threshold/release), plus an
# explicit output gain.
PARAM_SPACE = (
    ("gain_db", -12.0, 12.0),
    ("comp_threshold_db", -40.0, -5.0),
    ("comp_ratio", 1.5, 10.0),
    ("comp_attack_ms", 1.0, 50.0),
    ("comp_release_ms", 50.0, 500.0),
    ("highpass_hz", 20.0, 200.0),
    ("lowpass_hz", 8000.0, 20000.0),
    ("reverb_wet", 0.0, 0.3),
    ("reverb_damping", 0.2, 0.8),
    ("limiter_threshold_db", -10.0, -0.5),
    ("limiter_release_ms", 50.0, 200.0),
)
N_PARAMS = len(PARAM_SPACE)

_ENV_FRAME = 512  # dynamics envelope resolution: 11.6 ms @ 44.1 kHz


def _frame_peak_db(x: jax.Array, frame: int) -> jax.Array:
    """Stereo-linked per-frame peak level in dB of (C, T) audio -> (F,)."""
    T = x.shape[-1]
    pad = (-T) % frame
    xa = jnp.pad(jnp.abs(x), ((0, 0), (0, pad)))
    p = xa.reshape(x.shape[0], -1, frame).max(axis=(0, 2))
    return 20.0 * jnp.log10(p + 1e-6)


def _smooth_env_db(p_db: jax.Array, attack_ms, release_ms,
                   frame: int, sample_rate: int) -> jax.Array:
    """Attack/release one-pole envelope at frame rate.  The rising/falling
    branch select is a sigmoid in dB so the whole recurrence stays
    differentiable in both time constants."""
    dt_ms = 1e3 * frame / sample_rate
    c_att = jnp.exp(-dt_ms / jnp.maximum(attack_ms, 1e-2))
    c_rel = jnp.exp(-dt_ms / jnp.maximum(release_ms, 1e-2))

    def step(e, p):
        s = jax.nn.sigmoid(p - e)  # ->1 when rising: attack coefficient
        c = s * c_att + (1.0 - s) * c_rel
        e = c * e + (1.0 - c) * p
        return e, e

    _, env = jax.lax.scan(step, p_db[0], p_db)
    return env


def _apply_gain_db(x: jax.Array, gain_db_frames: jax.Array) -> jax.Array:
    """Upsample per-frame gain (F,) to samples and apply to (C, T)."""
    g = jnp.repeat(10.0 ** (gain_db_frames / 20.0), _ENV_FRAME)[: x.shape[-1]]
    return x * g


def _unit_to_params(u: jax.Array) -> dict:
    """u in [0,1]^N -> physical parameter dict."""
    out = {}
    for i, (name, lo, hi) in enumerate(PARAM_SPACE):
        out[name] = lo + (hi - lo) * jnp.clip(u[i], 0.0, 1.0)
    return out


def apply_effect_chain(audio: jax.Array, u: jax.Array,
                       sample_rate: int = 44100, rng=None) -> jax.Array:
    """(C, T) audio, u in [0,1]^N_PARAMS -> processed audio.  Differentiable
    in every parameter, in the reference's 'standard' chain order
    (style_transfer_eval.py:81-118): gain -> compressor (attack/release
    envelope) -> highpass -> lowpass -> reverb (damped exp-decay IR) ->
    limiter (instant attack, own release)."""
    p = _unit_to_params(u)
    x = audio * 10.0 ** (p["gain_db"] / 20.0)

    # compressor: frame-peak envelope smoothed with attack/release, static
    # dB curve above threshold
    env = _smooth_env_db(_frame_peak_db(x, _ENV_FRAME),
                         p["comp_attack_ms"], p["comp_release_ms"],
                         _ENV_FRAME, sample_rate)
    over = jnp.maximum(env - p["comp_threshold_db"], 0.0)
    x = _apply_gain_db(x, -over * (1.0 - 1.0 / p["comp_ratio"]))

    x = sosfilt_fir(butter_sos(2, p["highpass_hz"], "high", sample_rate), x, 2048)
    x = sosfilt_fir(butter_sos(4, p["lowpass_hz"], "low", sample_rate), x, 2048)

    # damped exp-decay reverb: one-pole lowpass (coefficient = damping) over
    # the noise IR models pedalboard.Reverb's HF absorption
    T = x.shape[-1]
    rl = sample_rate // 4
    t = jnp.linspace(0.0, 0.25, rl)
    key = rng if rng is not None else jax.random.key(0)
    ir = jnp.exp(-t / 0.08) * jax.random.normal(key, (rl,)) * 0.05
    d = p["reverb_damping"]
    z = jnp.zeros(())
    damp_sos = jnp.stack([1.0 - d, z, z, jnp.ones(()), -d, z])[None]
    ir = sosfilt_scan(damp_sos, ir)
    wet = fft_convolve_1d(x, ir, mode="same_corr")[..., :T]
    x = x * (1.0 - p["reverb_wet"]) + wet * p["reverb_wet"]

    # limiter: same dynamics machinery, near-instant attack, full ratio
    env = _smooth_env_db(_frame_peak_db(x, _ENV_FRAME),
                         0.1, p["limiter_release_ms"], _ENV_FRAME, sample_rate)
    return _apply_gain_db(
        x, jnp.minimum(p["limiter_threshold_db"] - env, 0.0))


@functools.lru_cache(maxsize=8)
def _jitted_chain(sample_rate: int):
    """Jitted ``(audio, u) -> processed audio`` — eager per-primitive
    dispatch of the chain is pathologically slow on the remote-compile
    axon backend; every non-traced call site must go through this."""
    return jax.jit(
        lambda audio, u: apply_effect_chain(audio, u, sample_rate))


def render_effect_chain(audio, u, sample_rate: int = 44100) -> np.ndarray:
    """Host-callable jitted render of :func:`apply_effect_chain`."""
    return np.asarray(
        _jitted_chain(int(sample_rate))(jnp.asarray(audio), jnp.asarray(u)))


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
        # best-by-loss tracking inside the scan — the last iterate can
        # overshoot; the reference's per-pair optimizer keeps the best
        # state the same way (ref: test_tcn_style_transfer.py:84-201)
        def step(carry, _):
            u, opt, best_u, best_loss = carry
            loss, g = jax.value_and_grad(loss_fn)(u)
            better = loss < best_loss
            best_u = jnp.where(better, u, best_u)
            best_loss = jnp.where(better, loss, best_loss)
            upd, opt = tx.update(g, opt, u)
            return (optax.apply_updates(u, upd), opt, best_u, best_loss), loss

        init = (u, opt, u, jnp.inf)
        (u, _, best_u, best_loss), losses = jax.lax.scan(
            step, init, None, length=num_steps)
        # best over the evaluated iterates u_0..u_{n-1}; the post-update
        # u_n is never scored (scoring it would duplicate the whole
        # forward in the compiled program for one extra sample)
        return best_u, losses

    u, losses = run(u, opt)
    out = _jitted_chain(int(sample_rate))(input_audio, u)
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
