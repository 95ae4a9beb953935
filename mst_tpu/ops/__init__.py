"""DSP kernels: STFT, mel, biquad IIR, FFT convolution.

All ops are pure jnp functions (differentiable, jit/vmap/shard-friendly).
Hot paths have Pallas variants in ``mst_tpu.ops.pallas_kernels``.
"""

from mst_tpu.ops.stft import (
    hann_window,
    frame_signal,
    stft,
    spectrogram,
    spectrogram_gemm,
    istft,
)
from mst_tpu.ops.mel import mel_filterbank, mel_spectrogram, log_mel_spectrogram
from mst_tpu.ops.cqt import cqt
from mst_tpu.ops.biquad import (
    butter_sos,
    sosfilt_scan,
    sosfilt_fir,
    sos_impulse_response,
)
from mst_tpu.ops.fftconv import fft_convolve_1d

__all__ = [
    "hann_window",
    "frame_signal",
    "stft",
    "spectrogram",
    "spectrogram_gemm",
    "istft",
    "cqt",
    "mel_filterbank",
    "mel_spectrogram",
    "log_mel_spectrogram",
    "butter_sos",
    "sosfilt_scan",
    "sosfilt_fir",
    "sos_impulse_response",
    "fft_convolve_1d",
]
