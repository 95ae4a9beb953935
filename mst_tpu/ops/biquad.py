"""Butterworth design + IIR filtering, TPU-native.

The reference filters with ``scipy.signal.butter`` + ``sosfilt`` on host CPU
numpy (ref: src/mixing_utils.py:421-433, 449-456), forcing a device->host
round-trip per augmentation.  Here:

- :func:`butter_sos` designs Butterworth low/high-pass biquad cascades in
  pure jnp (closed-form bilinear transform), so a *traced* cutoff works —
  random per-example cutoffs stay on device and differentiable.
- :func:`sosfilt_scan` evaluates the exact IIR recurrence with
  ``lax.associative_scan`` over 2x2 state-transition matrices: O(log T)
  depth instead of a T-step sequential loop.  A biquad in transposed
  direct-form II is the linear recurrence  s[n] = A s[n-1] + B x[n],
  y[n] = s1[n-1] + b0 x[n]  — associative, hence parallel-prefixable.
- :func:`sosfilt_fir` is the bandwidth-friendly alternative: truncate the
  impulse response to K taps and FFT-convolve (one big batched FFT on MXU/VPU
  instead of T sequential steps).  For the 2nd/4th-order filters used by the
  augmentation chain the IR decays below 1e-6 within ~4k taps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mst_tpu.ops.fftconv import fft_convolve_1d


def _butter_prototype_poles(order: int) -> np.ndarray:
    k = np.arange(1, order + 1)
    theta = np.pi * (2 * k + order - 1) / (2 * order)
    return np.exp(1j * theta)  # left-half-plane, conjugate pairs


def butter_sos(order: int, cutoff, btype: str, fs: float) -> jax.Array:
    """Butterworth biquad cascade, scipy.signal.butter(..., output='sos') semantics.

    ``cutoff`` may be a Python float or a traced jnp scalar (random cutoffs on
    device).  ``order`` must be even (2 or 4 cover the reference's usage).
    Returns sos of shape (order//2, 6): rows [b0 b1 b2 1 a1 a2].
    """
    if order % 2 != 0:
        raise ValueError("only even orders supported")
    btype = btype.lower()
    if btype not in ("low", "high"):
        raise ValueError(f"btype must be low/high, got {btype}")

    cutoff = jnp.asarray(cutoff, jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32)
    # scipy normalizes Wn = cutoff/(fs/2), then pre-warps with internal fs=2.
    # scipy raises for Wn outside (0, 1); cutoff may be traced here, so clamp
    # to the open interval instead (an out-of-range cutoff would otherwise
    # produce a silently unstable filter).
    wn = jnp.clip(cutoff / (fs / 2.0), 1e-5, 1.0 - 1e-5)
    fs2 = 2.0 * 2.0  # 2 * internal_fs
    warped = 2.0 * 2.0 * jnp.tan(jnp.pi * wn / 2.0)

    proto = _butter_prototype_poles(order)  # numpy complex, static
    proto = jnp.asarray(proto, jnp.complex64)

    if btype == "low":
        poles = proto * warped.astype(jnp.complex64)
        # gain = warped**order; zeros at infinity -> z-plane zeros at -1
        k_analog = warped**order
        z_zero = -1.0
    else:
        poles = warped.astype(jnp.complex64) / proto
        # lp2hp: k_hp = k * real(prod(-p)) = 1 for Butterworth prototype
        k_analog = jnp.asarray(1.0, warped.dtype)
        z_zero = 1.0  # analog zeros at 0 -> bilinear -> +1

    # bilinear transform (scipy bilinear_zpk with fs=2 -> fs2=4):
    # k_z = k * real(prod(fs2 - z_analog) / prod(fs2 - p_analog)).
    z_poles = (fs2 + poles) / (fs2 - poles)
    den = jnp.real(jnp.prod(fs2 - poles))
    if btype == "low":
        num = 1.0  # no analog zeros (empty product); z-plane zeros land at -1
    else:
        num = fs2**order  # analog zeros at 0: prod(fs2 - 0)
    k_digital = k_analog * num / den

    # Pair conjugate poles into biquads.  Prototype poles come in conjugate
    # pairs (k, order-1-k); after the transforms they remain conjugates.
    n_sections = order // 2
    sos = []
    k_per = k_digital ** (1.0 / n_sections)
    for s in range(n_sections):
        p = z_poles[s]  # its conjugate is z_poles[order-1-s]
        a1 = -2.0 * jnp.real(p)
        a2 = jnp.real(p * jnp.conj(p))
        # zero pair at z_zero (double real zero)
        b0 = k_per
        b1 = k_per * (-2.0 * z_zero)
        b2 = k_per * (z_zero * z_zero)
        sos.append(jnp.stack([b0, b1, b2, jnp.ones_like(a1), a1, a2]))
    return jnp.stack(sos).astype(jnp.float32)  # (n_sections, 6)


def _biquad_assoc_scan(x: jax.Array, b0, b1, b2, a1, a2) -> jax.Array:
    """One biquad over the last axis of ``x`` via parallel prefix scan.

    Transposed direct-form II:
        y[n]  = b0 x[n] + s1[n-1]
        s1[n] = (b1 - a1 b0) x[n] - a1 s1[n-1] + s2[n-1]
        s2[n] = (b2 - a2 b0) x[n] - a2 s1[n-1]
    i.e. s[n] = A s[n-1] + B x[n] with constant A (2x2), B (2,).
    """
    T = x.shape[-1]
    dtype = x.dtype
    A = jnp.stack(
        [jnp.stack([-a1, jnp.ones_like(a1)]), jnp.stack([-a2, jnp.zeros_like(a2)])]
    ).astype(dtype)  # (2, 2)
    B = jnp.stack([b1 - a1 * b0, b2 - a2 * b0]).astype(dtype)  # (2,)

    # elements: (A_n, v_n) with v_n = B * x[n];  combine (later ∘ earlier)
    v = jnp.moveaxis(x[..., None] * B, -2, 0)  # (T, ..., 2)
    Ae = jnp.broadcast_to(A, (T, 2, 2))

    def combine(left, right):
        A1, v1 = left
        A2, v2 = right
        # HIGHEST precision: TPU f32 matmuls default to bf16 passes, and
        # cumulative products of near-unit-circle 2x2 matrices amplify bf16
        # rounding exponentially (NaN/Inf IRs observed on v5e otherwise)
        Anew = jnp.einsum("tij,tjk->tik", A2, A1,
                          precision=jax.lax.Precision.HIGHEST)
        vnew = jnp.einsum("tij,t...j->t...i", A2, v1,
                          precision=jax.lax.Precision.HIGHEST) + v2
        return Anew, vnew

    _, s = lax.associative_scan(combine, (Ae, v), axis=0)
    # s[n] = state after step n;  y[n] = s1[n-1] + b0 x[n]
    s1 = jnp.moveaxis(s[..., 0], 0, -1)  # (..., T)
    s1_prev = jnp.concatenate([jnp.zeros_like(s1[..., :1]), s1[..., :-1]], axis=-1)
    return b0 * x + s1_prev


def sosfilt_scan(sos: jax.Array, x: jax.Array) -> jax.Array:
    """Exact cascade IIR filter over the last axis (scipy.signal.sosfilt parity).

    ``sos``: (n_sections, 6).  Zero initial state.  Fully parallel over leading
    (batch/stem/channel) axes and O(log T) in sequence length.
    """
    n_sections = sos.shape[0]
    y = x
    for s in range(n_sections):
        b0, b1, b2, _, a1, a2 = (sos[s, i] for i in range(6))
        y = _biquad_assoc_scan(y, b0, b1, b2, a1, a2)
    return y


def sos_impulse_response(sos: jax.Array, n_taps: int) -> jax.Array:
    """Truncated impulse response of the cascade, shape (n_taps,)."""
    impulse = jnp.zeros((n_taps,), jnp.float32).at[0].set(1.0)
    return sosfilt_scan(sos, impulse)


def sosfilt_fir(sos: jax.Array, x: jax.Array, n_taps: int = 4096) -> jax.Array:
    """FIR approximation of the IIR cascade: truncate IR to ``n_taps`` and
    FFT-convolve.  Causal; matches sosfilt up to the truncation tail."""
    ir = sos_impulse_response(sos, n_taps)
    return fft_convolve_1d(x, ir, mode="causal")
