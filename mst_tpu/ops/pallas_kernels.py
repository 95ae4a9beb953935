"""Pallas TPU kernels for the hot DSP path.

``logmel_from_stft``: fuses |X|^2 -> mel filterbank matmul -> log(+eps) in
one VMEM-resident kernel.  The XLA path materializes the (rows, freq) power
spectrogram in HBM between the square and the mel GEMM when the producer is
an rFFT (not fusable into a dot); this kernel reads the complex STFT's
re/im planes once, squares in registers, runs the mel projection on the
MXU, applies the log epilogue, and writes only the (rows, n_mels) result —
HBM traffic drops from (2F + F + M) to (2F + M) floats per row.

Rows = collapsed (batch x channel x frame); freq tiles are accumulated in
VMEM scratch so arbitrary n_fft fits the tiling constraints.

Falls back to the plain jnp implementation on non-TPU backends (used under
``interpret=True`` in CPU tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _logmel_kernel(re_ref, im_ref, fb_ref, out_ref, acc_ref, *, n_freq_tiles, eps):
    k = pl.program_id(1)  # freq tile index

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    power = re_ref[:] * re_ref[:] + im_ref[:] * im_ref[:]
    acc_ref[:] += jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32)

    @pl.when(k == n_freq_tiles - 1)
    def _():
        out_ref[:] = jnp.log(acc_ref[:] + eps)


@functools.partial(jax.jit, static_argnames=("n_mels", "eps", "interpret"))
def logmel_from_stft(
    spec_re: jax.Array,
    spec_im: jax.Array,
    fb: jax.Array,
    n_mels: int,
    eps: float = 1e-10,
    interpret: bool = False,
) -> jax.Array:
    """(rows, freq) re/im STFT planes + (freq, n_mels) fb -> (rows, n_mels)
    log-mel.  Rows are padded to the 128-tile internally."""
    rows, freq = spec_re.shape
    ROW_TILE = 256
    FREQ_TILE = 512
    rows_p = _round_up(rows, ROW_TILE)
    freq_p = _round_up(freq, FREQ_TILE)
    mels_p = _round_up(n_mels, 128)

    re = jnp.zeros((rows_p, freq_p), jnp.float32).at[:rows, :freq].set(spec_re)
    im = jnp.zeros((rows_p, freq_p), jnp.float32).at[:rows, :freq].set(spec_im)
    fbp = jnp.zeros((freq_p, mels_p), jnp.float32).at[:freq, :n_mels].set(fb)

    n_row_tiles = rows_p // ROW_TILE
    n_freq_tiles = freq_p // FREQ_TILE

    out = pl.pallas_call(
        functools.partial(_logmel_kernel, n_freq_tiles=n_freq_tiles, eps=eps),
        grid=(n_row_tiles, n_freq_tiles),
        in_specs=[
            pl.BlockSpec((ROW_TILE, FREQ_TILE), lambda i, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, FREQ_TILE), lambda i, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FREQ_TILE, mels_p), lambda i, k: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, mels_p), lambda i, k: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_p, mels_p), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ROW_TILE, mels_p), jnp.float32)],
        interpret=interpret,
    )(re, im, fbp)
    return out[:rows, :n_mels]


def log_mel_frontend_pallas(
    x: jax.Array,
    sample_rate: int,
    n_fft: int,
    hop_length: int,
    n_mels: int,
    eps: float = 1e-10,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in for log(mel_spectrogram(x)+eps): (..., T) -> (..., n_mels, F).

    STFT runs through XLA's rFFT; the power+mel+log tail runs in the fused
    Pallas kernel.
    """
    from mst_tpu.ops.mel import mel_filterbank
    from mst_tpu.ops.stft import stft

    spec = stft(x, n_fft, hop_length)  # (..., freq, F) complex
    *lead, freq, F = spec.shape
    flat = jnp.moveaxis(spec, -2, -1).reshape(-1, freq)  # (rows=...*F, freq)
    fb = mel_filterbank(freq, n_mels, sample_rate)
    mel = logmel_from_stft(
        jnp.real(flat), jnp.imag(flat), fb, n_mels, eps, interpret=interpret
    )
    mel = mel.reshape(tuple(lead) + (F, n_mels))
    return jnp.moveaxis(mel, -1, -2)
