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
import numpy as np
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


def _fused_logmel_kernel(blocks_hbm, wr_ref, wi_ref, fb_ref, out_ref,
                         scratch, sems, *, tile_f, r_ov, hop, window,
                         n_tiles, eps):
    # 1-D grid over (signal, frame-tile) pairs so the DMA for step g+1 can
    # prefetch while step g computes (double buffering across grid steps —
    # TPU grid iterations run sequentially in one kernel invocation).
    g = pl.program_id(0)
    total = pl.num_programs(0)

    def dma_for(gidx, slot):
        rsig = gidx // n_tiles
        i = gidx % n_tiles
        return pltpu.make_async_copy(
            blocks_hbm.at[rsig, pl.ds(i * tile_f, window), :],
            scratch.at[slot],
            sems.at[slot],
        )

    @pl.when(g == 0)
    def _():
        dma_for(0, 0).start()

    @pl.when(g + 1 < total)
    def _():
        dma_for(g + 1, (g + 1) % 2).start()

    dma_for(g, g % 2).wait()
    buf = scratch[g % 2]

    # frames @ W as a sum of r_ov block-GEMMs over hop-sized K slices —
    # Mosaic cannot concat shifted sublane slices into one frames tensor
    re = jnp.zeros((tile_f, wr_ref.shape[1]), jnp.float32)
    im = jnp.zeros((tile_f, wi_ref.shape[1]), jnp.float32)
    for j in range(r_ov):
        part = buf[j : j + tile_f, :].astype(wr_ref.dtype)
        re += jnp.dot(part, wr_ref[j * hop : (j + 1) * hop, :],
                      preferred_element_type=jnp.float32)
        im += jnp.dot(part, wi_ref[j * hop : (j + 1) * hop, :],
                      preferred_element_type=jnp.float32)
    power = re * re + im * im
    out_ref[0] = jnp.log(
        jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32) + eps
    )


@functools.partial(
    jax.jit,
    static_argnames=("sample_rate", "n_fft", "hop_length", "n_mels", "eps",
                     "interpret"),
)
def fused_logmel(
    x: jax.Array,
    sample_rate: int,
    n_fft: int,
    hop_length: int,
    n_mels: int,
    eps: float = 1e-10,
    interpret: bool = False,
) -> jax.Array:
    """Fully-fused log-mel front-end: (..., T) -> (..., n_mels, frames).

    One Pallas kernel does framing (as shifted views of a compact
    (n_blocks, hop) layout DMA'd into VMEM), the windowed rDFT as bf16 MXU
    GEMMs, |.|^2, the mel projection and the log — the (frames, n_fft)
    frame tensor and the (frames, freq) spectrogram never touch HBM
    (~1.8 GB of traffic per 16-clip batch on the XLA path).

    Requires hop | n_fft (all shipped configs).  torchaudio-parity up to
    bf16 GEMM rounding (same rounding XLA's default f32 matmul uses).
    """
    from mst_tpu.ops.mel import mel_filterbank
    from mst_tpu.ops.stft import _center_pad, _dft_mats_np

    if n_fft % hop_length != 0:
        raise ValueError("fused_logmel requires hop | n_fft")
    r_ov = n_fft // hop_length

    *lead, T = x.shape
    xp = _center_pad(x, n_fft)
    Tp = xp.shape[-1]
    n_frames = 1 + (Tp - n_fft) // hop_length

    TILE_F = 256
    n_tiles = -(-n_frames // TILE_F)
    window = _round_up(TILE_F + r_ov - 1, 8)  # DMA slices must align to 8
    n_blocks_needed = (n_tiles - 1) * TILE_F + window

    R = int(np.prod(lead)) if lead else 1
    flat = xp.reshape(R, Tp)
    need = n_blocks_needed * hop_length
    if need > Tp:
        flat = jnp.pad(flat, ((0, 0), (0, need - Tp)))
    blocks = flat[:, :need].reshape(R, n_blocks_needed, hop_length)

    wr, wi = _dft_mats_np(n_fft)
    freq = n_fft // 2 + 1
    freq_p = _round_up(freq, 128)
    mels_p = _round_up(n_mels, 128)
    Wr = jnp.zeros((n_fft, freq_p), jnp.bfloat16).at[:, :freq].set(
        jnp.asarray(wr, jnp.bfloat16))
    Wi = jnp.zeros((n_fft, freq_p), jnp.bfloat16).at[:, :freq].set(
        jnp.asarray(wi, jnp.bfloat16))
    fbm = mel_filterbank(freq, n_mels, sample_rate)
    fb = jnp.zeros((freq_p, mels_p), jnp.float32).at[:freq, :n_mels].set(fbm)

    out = pl.pallas_call(
        functools.partial(_fused_logmel_kernel, tile_f=TILE_F, r_ov=r_ov,
                          hop=hop_length, window=window, n_tiles=n_tiles,
                          eps=eps),
        grid=(R * n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # blocks stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_F, mels_p),
            lambda g: (g // n_tiles, g % n_tiles, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((R, n_tiles * TILE_F, mels_p),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, window, hop_length), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(blocks, Wr, Wi, fb)

    out = out[:, :n_frames, :n_mels].reshape(tuple(lead) + (n_frames, n_mels))
    return jnp.swapaxes(out, -1, -2)


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
