"""Golden-parity tests for the DSP kernels against torch.stft / scipy.

These pin the numerics the whole framework depends on (SURVEY.md §7 step 1):
torchaudio's MelSpectrogram is torch.stft + an HTK filterbank, so matching
torch.stft plus an independently-derived filterbank gives reference parity.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mst_tpu.ops import (
    stft,
    spectrogram,
    istft,
    hann_window,
    mel_filterbank,
    mel_spectrogram,
    butter_sos,
    sosfilt_scan,
    sosfilt_fir,
    fft_convolve_1d,
)


@pytest.fixture(scope="module")
def sig(rng):
    return rng.standard_normal((2, 44100), dtype=np.float32) * 0.3


def _torch_stft(x, n_fft, hop):
    w = torch.hann_window(n_fft)
    return torch.stft(
        torch.from_numpy(x), n_fft, hop, window=w, center=True,
        pad_mode="reflect", return_complex=True,
    ).numpy()


@pytest.mark.parametrize("n_fft,hop", [(1024, 256), (2048, 512), (512, 128)])
def test_stft_matches_torch(sig, n_fft, hop):
    ref = _torch_stft(sig, n_fft, hop)
    got = np.asarray(stft(jnp.asarray(sig), n_fft, hop))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-4)


def test_power_spectrogram_matches_torch(sig):
    ref = np.abs(_torch_stft(sig, 1024, 256)) ** 2
    got = np.asarray(spectrogram(jnp.asarray(sig), 1024, 256, power=2.0))
    # relative comparison: power spans many orders of magnitude
    np.testing.assert_allclose(got, ref, atol=1e-2, rtol=1e-3)


def test_hann_window_matches_torch():
    np.testing.assert_allclose(
        np.asarray(hann_window(1024)), torch.hann_window(1024).numpy(),
        atol=1e-6, rtol=0,
    )


def test_istft_roundtrip(sig):
    T = (sig.shape[-1] // 256) * 256  # recoverable length is hop * (F - 1)
    x = sig[..., :T]
    spec = stft(jnp.asarray(x), 1024, 256)
    rec = np.asarray(istft(spec, 1024, 256, length=T))
    np.testing.assert_allclose(rec, x, atol=1e-4)


def test_mel_filterbank_properties():
    fb = np.asarray(mel_filterbank(513, 80, 44100))
    assert fb.shape == (513, 80)
    assert (fb >= 0).all()
    # triangles: each filter has a single peak, consecutive centers increase
    peaks = fb.argmax(axis=0)
    assert (np.diff(peaks) >= 0).all()
    # HTK scale: filter centers follow mel spacing (check first/last nonzero)
    assert fb[:, 0].max() > 0 and fb[:, -1].max() > 0


def test_mel_filterbank_matches_htk_formula():
    # independently recompute one triangle from the HTK formula
    sr, n_fft, n_mels = 44100, 1024, 128
    fb = np.asarray(mel_filterbank(n_fft // 2 + 1, n_mels, sr))
    freqs = np.linspace(0, sr // 2, n_fft // 2 + 1)
    mel = lambda f: 2595.0 * np.log10(1.0 + f / 700.0)
    imel = lambda m: 700.0 * (10 ** (m / 2595.0) - 1.0)
    pts = imel(np.linspace(mel(0.0), mel(sr / 2), n_mels + 2))
    m = 37  # arbitrary mid filter
    lo, c, hi = pts[m], pts[m + 1], pts[m + 2]
    expected = np.clip(
        np.minimum((freqs - lo) / (c - lo), (hi - freqs) / (hi - c)), 0, None
    )
    np.testing.assert_allclose(fb[:, m], expected, atol=1e-5)


def test_mel_spectrogram_shapes(sig):
    mel = mel_spectrogram(jnp.asarray(sig), 44100, 2048, 512, 80)
    assert mel.shape == (2, 80, 1 + 44100 // 512)
    assert bool(jnp.all(mel >= 0))


@pytest.mark.parametrize(
    "order,cutoff,btype",
    [(2, 2000.0, "high"), (2, 500.0, "low"), (4, 4000.0, "low"), (4, 11999.0, "low")],
)
def test_butter_sosfilt_matches_scipy(rng, order, cutoff, btype):
    from scipy.signal import butter, sosfilt

    x = rng.standard_normal(8192).astype(np.float32)
    sos_ref = butter(order, cutoff, btype=btype, fs=44100, output="sos")
    y_ref = sosfilt(sos_ref, x)

    sos = butter_sos(order, cutoff, btype, fs=44100)
    y = np.asarray(sosfilt_scan(sos, jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, atol=5e-4, rtol=1e-3)


def test_sosfilt_fir_approximates_iir(rng):
    from scipy.signal import butter, sosfilt

    x = rng.standard_normal(16384).astype(np.float32)
    sos_ref = butter(4, 6000.0, btype="low", fs=44100, output="sos")
    y_ref = sosfilt(sos_ref, x)
    sos = butter_sos(4, 6000.0, "low", fs=44100)
    y = np.asarray(sosfilt_fir(sos, jnp.asarray(x), n_taps=4096))
    err = np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
    assert err < 1e-3


def test_butter_traced_cutoff(rng):
    """Cutoff can be a traced value (random per-example cutoffs on device)."""
    x = jnp.asarray(rng.standard_normal(4096).astype(np.float32))

    @jax.jit
    def f(cut):
        return sosfilt_scan(butter_sos(4, cut, "low", fs=44100), x)

    y1 = f(jnp.asarray(4000.0))
    y2 = f(jnp.asarray(8000.0))
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_fft_convolve_matches_torch_conv1d(rng):
    x = rng.standard_normal((2, 4000)).astype(np.float32)
    k = rng.standard_normal(501).astype(np.float32)
    ref = torch.nn.functional.conv1d(
        torch.from_numpy(x).unsqueeze(1), torch.from_numpy(k).view(1, 1, -1),
        padding=len(k) // 2,
    ).squeeze(1).numpy()
    got = np.asarray(fft_convolve_1d(jnp.asarray(x), jnp.asarray(k), mode="same_corr"))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_song_a_loads(song_a):
    audio, sr = song_a
    assert sr == 44100
    assert audio.shape[0] == 2
    assert audio.shape[1] > 10 * sr
