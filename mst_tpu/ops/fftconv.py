"""FFT convolution for long kernels (reverb IRs, FIR filter approximations).

The reference convolves a ~22k-tap reverb impulse response with
``F.conv1d`` (ref: src/mixing_utils.py:458-479) — O(T*K) work.  On TPU a
batched rFFT multiply is both faster and fully fused by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def fft_convolve_1d(x: jax.Array, kernel: jax.Array, mode: str = "causal",
                    correlate: bool = False) -> jax.Array:
    """Convolve ``x`` (..., T) with ``kernel`` (K,) along the last axis.

    modes:
      - 'causal': output[n] = sum_k kernel[k] x[n-k], length T (IIR-style filtering)
      - 'same_corr': torch ``F.conv1d(x, k, padding=K//2)`` cross-correlation
        semantics cropped to T (what the reference reverb does)
      - 'full': length T + K - 1
    """
    T = x.shape[-1]
    K = kernel.shape[-1]
    if correlate or mode == "same_corr":
        kernel = kernel[::-1]
    n = _next_pow2(T + K - 1)
    X = jnp.fft.rfft(x, n=n, axis=-1)
    H = jnp.fft.rfft(kernel, n=n)
    y = jnp.fft.irfft(X * H, n=n, axis=-1)
    if mode == "causal":
        return y[..., :T].astype(x.dtype)
    if mode == "full":
        return y[..., : T + K - 1].astype(x.dtype)
    if mode == "same_corr":
        # torch conv1d with padding=p: out[n] = sum_k w[k] x[n + k - p],
        # out_len = T + 2p - K + 1; flipped-kernel full conv index offset K-1-p.
        p = K // 2
        start = K - 1 - p
        out_len = T + 2 * p - K + 1
        return y[..., start : start + out_len].astype(x.dtype)
    raise ValueError(f"unknown mode {mode}")
