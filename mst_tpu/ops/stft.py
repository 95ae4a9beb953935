"""STFT for TPU, numerically matching torch.stft defaults.

The reference reaches STFT through ``torchaudio.transforms.MelSpectrogram``
(ref: src/model.py:33-39, src/mixing_utils.py:45-51) and ``torch.stft``
(ref: src/loss.py:380-387).  torch defaults replicated here:

- periodic Hann window of length ``win_length``
- ``center=True`` reflect padding of ``n_fft // 2`` on both sides
- one-sided rFFT, no normalization
- ``num_frames = 1 + T // hop`` for centered input

Design notes (TPU-first):
- Framing is done with ``lax.conv_general_dilated_patches`` which XLA lowers
  to a strided window read, no gather.  The subsequent rFFT batches over all
  (batch x channel x frame) at once so the FFT runs as one large fused op.
- Everything is float32 in, complex64 out; power spectrogram stays real.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@functools.lru_cache(maxsize=32)
def _hann_np(win_length: int) -> np.ndarray:
    # periodic Hann (torch.hann_window default periodic=True)
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def hann_window(win_length: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window, identical to ``torch.hann_window(win_length)``."""
    return jnp.asarray(_hann_np(win_length), dtype=dtype)


def frame_signal(x: jax.Array, frame_length: int, hop_length: int) -> jax.Array:
    """Slice ``x`` (..., T) into overlapping frames (..., num_frames, frame_length).

    When hop divides the frame length (every config here: 2048/512,
    1024/256, 512/128), framing is r shifted views of a compact
    (n_blocks, hop) reshape concatenated on the last axis — pure
    slice+concat at memcpy speed.  The general case falls back to
    conv_general_dilated_patches (measured ~10x slower on TPU: its gather
    lowering costs ~34 ms vs ~3 ms for the block path on (16,8,441000)).
    """
    *lead, T = x.shape
    num_frames = 1 + (T - frame_length) // hop_length
    if frame_length % hop_length == 0:
        r = frame_length // hop_length
        n_blocks = num_frames + r - 1
        blocks = x[..., : n_blocks * hop_length].reshape(
            tuple(lead) + (n_blocks, hop_length)
        )
        views = [blocks[..., j : j + num_frames, :] for j in range(r)]
        return jnp.concatenate(views, axis=-1)
    flat = x.reshape((-1, 1, T))
    patches = lax.conv_general_dilated_patches(
        flat,
        filter_shape=(frame_length,),
        window_strides=(hop_length,),
        padding="VALID",
    )
    frames = jnp.moveaxis(patches, 1, 2)  # (N, num_frames, frame_length)
    return frames.reshape(tuple(lead) + (num_frames, frame_length))


def _center_pad(x: jax.Array, n_fft: int) -> jax.Array:
    pad = n_fft // 2
    pad_width = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    return jnp.pad(x, pad_width, mode="reflect")


def stft(
    x: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    center: bool = True,
    window: jax.Array | None = None,
) -> jax.Array:
    """Complex STFT of ``x`` (..., T) -> (..., n_fft//2+1, num_frames).

    Matches ``torch.stft(x, n_fft, hop, win_length, hann, center=True,
    pad_mode='reflect', return_complex=True)``.
    """
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length, x.dtype)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    if center:
        x = _center_pad(x, n_fft)
    frames = frame_signal(x, n_fft, hop_length)  # (..., F, n_fft)
    frames = frames * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)  # (..., F, n_fft//2+1)
    return jnp.swapaxes(spec, -1, -2)  # (..., freq, F)


def spectrogram(
    x: jax.Array,
    n_fft: int,
    hop_length: int,
    power: float = 2.0,
    center: bool = True,
    win_length: int | None = None,
) -> jax.Array:
    """Magnitude**power spectrogram, torchaudio.transforms.Spectrogram semantics."""
    s = stft(x, n_fft, hop_length, win_length=win_length, center=center)
    mag2 = jnp.real(s) ** 2 + jnp.imag(s) ** 2
    if power == 2.0:
        return mag2
    if power == 1.0:
        return jnp.sqrt(mag2)
    return mag2 ** (power / 2.0)


@functools.lru_cache(maxsize=8)
def _dft_mats_np(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT matrices (n_fft, n_fft//2+1): frames @ W == rfft."""
    k = np.arange(n_fft)[:, None]
    f = np.arange(n_fft // 2 + 1)[None, :]
    ang = -2.0 * np.pi * k * f / n_fft
    win = _hann_np(n_fft)[:, None]
    return (win * np.cos(ang)).astype(np.float32), (win * np.sin(ang)).astype(np.float32)


def spectrogram_gemm(
    x: jax.Array,
    n_fft: int,
    hop_length: int,
    power: float = 2.0,
    center: bool = True,
    chunk_signals: int = 64,
) -> jax.Array:
    """Power spectrogram via DFT-as-GEMM (..., T) -> (..., freq, F).

    The rFFT runs on the TPU's VPU; expressing the windowed DFT as two
    (frames, n_fft) x (n_fft, n_fft//2+1) matmuls puts the work on the MXU
    instead — ~2x faster end-to-end for the mel front-end at n_fft 2048
    (measured on v5e; the MelT GEMM-native-NDFT idea).  TPU f32 matmuls use
    bf16 passes by default, so quiet bins carry ~1e-7-absolute error —
    irrelevant above the 1e-10 log floor but use the rfft path when bit-level
    parity matters.
    """
    if center:
        x = _center_pad(x, n_fft)
    wr, wi = _dft_mats_np(n_fft)
    Wr, Wi = jnp.asarray(wr), jnp.asarray(wi)

    def _one_chunk(sig):  # (n, T) -> (n, F, freq)
        frames = frame_signal(sig, n_fft, hop_length)
        re = frames @ Wr
        im = frames @ Wi
        return re * re + im * im

    *lead, T = x.shape
    n_sig = int(np.prod(lead)) if lead else 1
    flat = x.reshape(n_sig, T)
    if n_sig > chunk_signals:
        # bound the transient frames buffer: process chunk_signals at a time
        # (frames for one 10 s signal at n_fft 2048 are ~7 MB; unchunked
        # batch-200x8 would transiently need >11 GB)
        pad = (-n_sig) % chunk_signals
        if pad:
            flat = jnp.concatenate([flat, jnp.zeros((pad, T), flat.dtype)])
        stacked = flat.reshape(-1, chunk_signals, T)
        mag2 = jax.lax.map(_one_chunk, stacked)
        mag2 = mag2.reshape(-1, *mag2.shape[2:])[:n_sig]
    else:
        mag2 = _one_chunk(flat)
    mag2 = mag2.reshape(tuple(lead) + mag2.shape[1:])
    mag2 = jnp.swapaxes(mag2, -1, -2)  # (..., freq, F)
    if power == 2.0:
        return mag2
    if power == 1.0:
        return jnp.sqrt(mag2)
    return mag2 ** (power / 2.0)


def istft(
    spec: jax.Array,
    n_fft: int,
    hop_length: int,
    length: int | None = None,
    center: bool = True,
) -> jax.Array:
    """Inverse STFT with Hann overlap-add; inverse of :func:`stft`.

    ``spec``: (..., n_fft//2+1, num_frames) complex -> (..., T) real.
    Used by the SCNet demix pipeline (the reference delegates to the SCNet
    submodule's torch.istft; ref: src/data.py:87-95).
    """
    window = hann_window(n_fft, jnp.float32)
    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
    frames = frames * window  # (..., F, n_fft)

    *lead, num_frames, _ = frames.shape
    out_len = n_fft + hop_length * (num_frames - 1)

    # Overlap-add via transposed conv: place each frame at its hop offset.
    flat = frames.reshape((-1, num_frames, n_fft))

    def _ola(fr):  # (num_frames, n_fft) -> (out_len,)
        idx = jnp.arange(num_frames) * hop_length

        def body(carry, args):
            frame, start = args
            carry = lax.dynamic_update_slice(
                carry, lax.dynamic_slice(carry, (start,), (n_fft,)) + frame, (start,)
            )
            return carry, None

        init = jnp.zeros((out_len,), frames.dtype)
        out, _ = lax.scan(body, init, (fr, idx))
        return out

    y = jax.vmap(_ola)(flat)

    # window envelope normalization
    win_sq = window**2
    env = _ola_envelope(win_sq, num_frames, hop_length, out_len)
    y = y / jnp.maximum(env, 1e-11)
    y = y.reshape(tuple(lead) + (out_len,))
    if center:
        y = y[..., n_fft // 2 : out_len - n_fft // 2]
    if length is not None:
        cur = y.shape[-1]
        if cur >= length:
            y = y[..., :length]
        else:  # torch.istft pads with zeros to the requested length
            pad = [(0, 0)] * (y.ndim - 1) + [(0, length - cur)]
            y = jnp.pad(y, pad)
    return y


def _ola_envelope(win_sq: jax.Array, num_frames: int, hop: int, out_len: int) -> jax.Array:
    n_fft = win_sq.shape[0]
    env = jnp.zeros((out_len,), win_sq.dtype)

    def body(carry, start):
        carry = lax.dynamic_update_slice(
            carry, lax.dynamic_slice(carry, (start,), (n_fft,)) + win_sq, (start,)
        )
        return carry, None

    env, _ = lax.scan(body, env, jnp.arange(num_frames) * hop)
    return env
