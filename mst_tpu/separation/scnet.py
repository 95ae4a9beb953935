"""SCNet music source separation in JAX/flax.

The reference wraps an external SCNet checkpoint via the
Music-Source-Separation-Training submodule (ref: src/data.py:28-108), which
is absent from the checkout (SURVEY.md §2.1) — so the architecture is
reimplemented here from the SCNet paper (Tong et al., 2024: band-split
spectrogram, sparse down-sampling encoder, dual-path RNN core, sparse
up-sampling decoder with fusion, masked complex output).  Hyperparameters
are fully parameterized in :class:`SCNetConfig`; exact parity with the
upstream `config_musdb18_scnet_xl_ihf.yaml` checkpoint is impossible without
its code, so this model is validated by shape/gradient tests and
trainability on synthetic mixtures, and is trainable from scratch with
:mod:`mst_tpu.separation.train`.

TPU-first choices:
- Spectrogram features are channel-last (B, F, T, C) so band convs hit the
  MXU; band split/merge are static slices.
- The dual-path RNNs scan over the *downsampled* axes (F' ~ 47, T' ~ 188
  for a 10 s clip), keeping sequential work small; everything else is
  batched dense/conv work.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mst_tpu.ops.stft import stft, istft


@dataclass(frozen=True)
class SCNetConfig:
    sources: int = 4  # vocals, bass, drums, other
    audio_channels: int = 2
    n_fft: int = 4096
    hop_length: int = 1024
    # encoder dims per stage (input dim = 2*audio_channels for re/im)
    dims: Tuple[int, ...] = (4, 32, 64, 128)
    # frequency split ratios low/mid/high (paper: 0.175 / 0.392 / 0.433)
    band_ratios: Tuple[float, ...] = (0.175, 0.392, 0.433)
    # per-band freq downsampling stride and kernel
    band_strides: Tuple[int, ...] = (1, 4, 16)
    band_kernels: Tuple[int, ...] = (3, 4, 16)
    # per-band number of convolution modules before downsampling
    conv_depths: Tuple[int, ...] = (3, 2, 1)
    # dual-path core
    num_dplayers: int = 6
    rnn_hidden: int = 128
    # lax.scan unroll factor for the LSTM scans: bigger blocks pipeline
    # better on the TPU (fewer loop iterations, fused per-block HLO) with
    # bit-identical math and an unchanged parameter tree
    rnn_unroll: int = 8
    # 'flax' = nn.RNN(OptimizedLSTMCell); 'fused' = input GEMMs hoisted out
    # of the scan.  Same parameter tree and same math (parity-tested), but
    # different memory behavior: hoisting materializes (B·L, 4H)
    # pre-activations in HBM — measured SLOWER for the v5e-1 separation
    # shapes (27 vs 41 clips/s full pipeline), where recomputing the input
    # projections in-scan is cheaper than the extra HBM traffic.  Kept for
    # small-C/large-H shapes where the trade reverses.
    # 'lru' = diagonal linear recurrent unit via lax.associative_scan
    # (O(log L) depth, no sequential scan) — a DIFFERENT model (new
    # parameter tree, needs its own training), not a drop-in kernel swap.
    rnn_impl: str = "flax"
    # Inference-time compute dtype for the spectrogram-domain core.  The
    # full pipeline sits on the HBM roofline (92% of the v5e's 819 GB/s at
    # the round-3 headline — docs/PERF.md), and SCNet's dual-path
    # activations are ~96% of the traffic, so running the core in bfloat16
    # halves the dominant byte stream.  Plumbed as the flax compute
    # ``dtype`` of every core module (params stay float32 in HBM — they are
    # ~60 MB vs ~18 GB/clip of activations — and are cast per-op), so
    # checkpoints need no conversion.  STFT/iSTFT and the complex mask
    # multiply stay float32 (jax has no bf16 complex), and the LRU core
    # ignores it (its associative-scan products compound multiplicative
    # error; see _LRU).  Training uses float32 — this knob is for the
    # serving/bench path (demix, pipeline).
    compute_dtype: str = "float32"

    @classmethod
    def from_meta(cls, mc: dict, **overrides) -> "SCNetConfig":
        """Build a config from an artifact-metadata 'config' dict (the JSON
        written next to each trained .npz by cli/train_separation.py).  One
        place owns the defaults so every consumer (demix, bench, tests)
        honors newly added knobs like rnn_hidden.  ``overrides`` layers
        inference-time choices (e.g. ``compute_dtype="bfloat16"``) on top —
        those are serving knobs, not artifact properties."""
        kw = dict(
            n_fft=mc.get("n_fft", 4096),
            hop_length=mc.get("hop_length", 1024),
            dims=tuple(mc.get("dims", (4, 32, 64, 128))),
            num_dplayers=mc.get("num_dplayers", 6),
            rnn_hidden=mc.get("rnn_hidden", 128),
            rnn_impl=mc.get("rnn_impl", "flax"),
        )
        kw.update(overrides)
        return cls(**kw)

    @property
    def core_dtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2  # drop the Nyquist bin for clean band splits

    def band_widths(self, n_freq: int) -> Tuple[int, ...]:
        lows = int(n_freq * self.band_ratios[0])
        mids = int(n_freq * self.band_ratios[1])
        return (lows, mids, n_freq - lows - mids)


class ConvolutionModule(nn.Module):
    """Residual GLU conv module over the frequency axis (per SD band).

    norm -> pointwise Dense(2d) -> GLU -> depthwise freq conv -> pointwise
    Dense -> residual (Conformer-style, as used by SCNet's feature path).
    Input (B, F, T, C).
    """

    channels: int
    kernel: int = 3
    dtype: jnp.dtype | None = None  # flax compute dtype (bf16 serving core)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(2 * self.channels, dtype=self.dtype)(h)
        h = nn.glu(h, axis=-1)
        h = nn.Conv(
            self.channels, (self.kernel, 1),
            feature_group_count=self.channels, padding="SAME",
            dtype=self.dtype,
        )(h)
        h = nn.gelu(h)
        h = nn.Dense(self.channels, dtype=self.dtype)(h)
        return x + h


class SDLayer(nn.Module):
    """Sparse down-sampling layer: band-split -> per-band conv modules ->
    strided freq conv; concat bands along frequency."""

    cfg: SCNetConfig
    out_dim: int

    @nn.compact
    def __call__(self, x: jax.Array):
        c = self.cfg
        F = x.shape[1]
        widths = c.band_widths(F)
        outs = []
        skips = []
        start = 0
        for b, w in enumerate(widths):
            band = x[:, start : start + w]
            start += w
            for d in range(c.conv_depths[b]):
                band = ConvolutionModule(
                    band.shape[-1], kernel=3, dtype=c.core_dtype,
                    name=f"band{b}_conv{d}"
                )(band)
            skips.append(band)
            stride = c.band_strides[b]
            kernel = c.band_kernels[b]
            down = nn.Conv(
                self.out_dim, (kernel, 1), strides=(stride, 1),
                padding=((self._pad(w, kernel, stride)), (0, 0)),
                dtype=c.core_dtype, name=f"band{b}_down",
            )(band)
            down = nn.gelu(down)
            outs.append(down)
        return jnp.concatenate(outs, axis=1), skips

    @staticmethod
    def _pad(width: int, kernel: int, stride: int) -> tuple[int, int]:
        # 'SAME'-style padding for exact ceil(width/stride) output bins
        out = -(-width // stride)
        total = max((out - 1) * stride + kernel - width, 0)
        return (total // 2, total - total // 2)


class SULayer(nn.Module):
    """Sparse up-sampling layer: split the downsampled frequency axis back
    into bands, transpose-conv each band up, fuse with the encoder skip."""

    cfg: SCNetConfig
    out_dim: int
    target_freq: int

    @nn.compact
    def __call__(self, x: jax.Array, skips):
        c = self.cfg
        widths = c.band_widths(self.target_freq)
        down_widths = [-(-w // s) for w, s in zip(widths, c.band_strides)]
        outs = []
        start = 0
        for b, (w, dw) in enumerate(zip(widths, down_widths)):
            band = x[:, start : start + dw]
            start += dw
            stride = c.band_strides[b]
            kernel = c.band_kernels[b]
            up = nn.ConvTranspose(
                self.out_dim, (kernel, 1), strides=(stride, 1),
                dtype=c.core_dtype, name=f"band{b}_up",
            )(band)
            # crop/pad to the exact encoder width
            up = up[:, :w]
            if up.shape[1] < w:
                up = jnp.pad(up, ((0, 0), (0, w - up.shape[1]), (0, 0), (0, 0)))
            # fusion with the encoder skip (concat -> dense)
            fused = jnp.concatenate([up, skips[b]], axis=-1)
            fused = nn.Dense(self.out_dim, dtype=c.core_dtype,
                             name=f"band{b}_fuse")(fused)
            fused = nn.gelu(fused)
            outs.append(fused)
        return jnp.concatenate(outs, axis=1)


class _LSTMGates(nn.Module):
    """Parameter container matching ``nn.OptimizedLSTMCell``'s tree exactly
    ({ii,if,ig,io} bias-free input kernels + {hi,hf,hg,ho} hidden kernels
    with bias) so the fused scan below is checkpoint-interchangeable with
    the flax cell."""

    hidden: int
    dtype: jnp.dtype | None = None

    def setup(self):
        H = self.hidden
        self.inp = [nn.Dense(H, use_bias=False, dtype=self.dtype,
                             name=f"i{g}") for g in "ifgo"]
        self.hid = [nn.Dense(H, use_bias=True, dtype=self.dtype,
                             name=f"h{g}") for g in "ifgo"]


def _fused_lstm_scan(cell: _LSTMGates, x: jax.Array, reverse: bool,
                     unroll: int) -> jax.Array:
    """One LSTM direction with the input projections hoisted out of the
    scan: the four x_t @ W_i* products for EVERY timestep run as one big
    sequence-level GEMM on the MXU, leaving only the (B, H) @ (H, 4H)
    recurrent product inside the (unrolled) ``lax.scan``.  Bit-equivalent
    to ``nn.RNN(nn.OptimizedLSTMCell(H))`` (parity-tested in
    tests/test_scnet.py) with the same parameter tree; ~half the
    scan-resident FLOPs."""
    H = cell.hidden
    if reverse:
        x = jnp.flip(x, 1)
    # hoisted input projections (i, f, g, o), one pass over the sequence
    zx = jnp.concatenate([d(x) for d in cell.inp], axis=-1)  # (B, L, 4H)
    # materialize the recurrent kernels, then scan with their raw values
    _ = [d(jnp.zeros((1, H), x.dtype)) for d in cell.hid]
    Wh = jnp.concatenate(
        [d.variables["params"]["kernel"] for d in cell.hid], axis=1)
    bh = jnp.concatenate([d.variables["params"]["bias"] for d in cell.hid])
    # match the hoisted projections' compute dtype (bf16 serving core):
    # the raw kernels bypass Dense's own cast
    Wh, bh = Wh.astype(zx.dtype), bh.astype(zx.dtype)

    def step(carry, zxt):
        c, h = carry
        z = zxt + h @ Wh + bh
        i, f, g, o = jnp.split(z, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (c, h), h

    init = (jnp.zeros((x.shape[0], H), zx.dtype),
            jnp.zeros((x.shape[0], H), zx.dtype))
    _, hs = jax.lax.scan(step, init, jnp.swapaxes(zx, 0, 1), unroll=unroll)
    hs = jnp.swapaxes(hs, 0, 1)
    if reverse:
        hs = jnp.flip(hs, 1)
    return hs


class _LRU(nn.Module):
    """One direction of a diagonal Linear Recurrent Unit.

    h_t = λ ⊙ h_{t-1} + γ ⊙ (x_t W_B) with complex diagonal λ in the
    stable-exponential parameterization (λ = exp(-exp(ν) + i·exp(θ)),
    γ = sqrt(1 - |λ|²)), computed as a ``lax.associative_scan`` — O(log L)
    depth instead of the LSTM's L sequential steps, so the recurrence
    parallelizes across the VPU instead of bottlenecking the scan loop.
    Complex arithmetic is carried as explicit (re, im) pairs (the axon
    backend's complex support is untested).  Returns [Re(h) ‖ Im(h)]
    (B, L, 2H); the caller's output projection plays the LRU's C matrix.
    Original TPU-native replacement for the reference's BiLSTM core
    (ref: the dual-path RNN in SCNet's separation_net; rebuilt here from
    the LRU recurrence, Orvieto et al. 2023 — no reference code involved).
    """

    hidden: int
    r_min: float = 0.4
    r_max: float = 0.99
    max_phase: float = 6.28
    # Serving knob: compute dtype for the input GEMMs (x @ B_re/B_im) ONLY.
    # The associative scan itself always runs f32 — its products compound
    # multiplicative rounding error over the sequence — but the two input
    # projections are plain one-shot matmuls where bf16's ~3 decimal digits
    # are as safe as in every other Dense of the core (parity-tested:
    # tests/test_scnet.py::test_lru_bf16_gemm_matches_f32).
    gemm_dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, reverse: bool = False) -> jax.Array:
        B, L, C = x.shape
        H = self.hidden
        if reverse:
            x = jnp.flip(x, 1)

        def init_nu(key, shape):
            u = jax.random.uniform(key, shape)
            r2 = u * (self.r_max ** 2 - self.r_min ** 2) + self.r_min ** 2
            return jnp.log(-0.5 * jnp.log(r2))

        def init_theta(key, shape):
            return jnp.log(
                self.max_phase * jax.random.uniform(key, shape) + 1e-4)

        nu_log = self.param("nu_log", init_nu, (H,))
        theta_log = self.param("theta_log", init_theta, (H,))
        scale = 1.0 / np.sqrt(2 * C)
        w_re = self.param("B_re", nn.initializers.normal(scale), (C, H))
        w_im = self.param("B_im", nn.initializers.normal(scale), (C, H))

        mag = jnp.exp(-jnp.exp(nu_log))          # |λ| in (0, 1)
        phase = jnp.exp(theta_log)
        lam_re, lam_im = mag * jnp.cos(phase), mag * jnp.sin(phase)
        gamma = jnp.sqrt(jnp.maximum(1.0 - mag ** 2, 1e-8))

        if self.gemm_dtype is not None:
            xg = x.astype(self.gemm_dtype)
            u_re = gamma * (xg @ w_re.astype(self.gemm_dtype)
                            ).astype(jnp.float32)   # (B, L, H)
            u_im = gamma * (xg @ w_im.astype(self.gemm_dtype)
                            ).astype(jnp.float32)
        else:
            u_re = gamma * (x @ w_re)                # (B, L, H)
            u_im = gamma * (x @ w_im)
        ones = jnp.ones_like(u_re)

        def combine(e1, e2):
            # (a2*a1, a2*b1 + b2) for h_t = a_t h_{t-1} + b_t
            a1r, a1i, b1r, b1i = e1
            a2r, a2i, b2r, b2i = e2
            return (a2r * a1r - a2i * a1i,
                    a2r * a1i + a2i * a1r,
                    a2r * b1r - a2i * b1i + b2r,
                    a2r * b1i + a2i * b1r + b2i)

        h_re, h_im = jax.lax.associative_scan(
            combine, (ones * lam_re, ones * lam_im, u_re, u_im), axis=1)[2:]
        h = jnp.concatenate([h_re, h_im], axis=-1)
        return jnp.flip(h, 1) if reverse else h


class BiRNN(nn.Module):
    """Bidirectional LSTM over axis 1 of (B, L, C) + dense projection.

    Both impls share one parameter tree (the fused gates containers are
    named OptimizedLSTMCell_0/1 to match flax's auto-naming), so
    checkpoints are interchangeable; see SCNetConfig.rnn_impl."""

    hidden: int
    out: int
    unroll: int = 1
    impl: str = "flax"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.impl == "lru":
            # the LRU's associative-scan products compound multiplicative
            # rounding error over ~10^3-step sequences — the SCAN stays f32
            # even when the rest of the core runs bf16; the input GEMMs
            # take the serving dtype (safe one-shot matmuls)
            fwd = _LRU(self.hidden, gemm_dtype=self.dtype,
                       name="lru_fwd")(x.astype(jnp.float32))
            bwd = _LRU(self.hidden, gemm_dtype=self.dtype,
                       name="lru_bwd")(x.astype(jnp.float32), reverse=True)
        elif self.impl == "fused":
            cf = _LSTMGates(self.hidden, dtype=self.dtype,
                            name="OptimizedLSTMCell_0")
            cb = _LSTMGates(self.hidden, dtype=self.dtype,
                            name="OptimizedLSTMCell_1")
            fwd = _fused_lstm_scan(cf, x, reverse=False, unroll=self.unroll)
            bwd = _fused_lstm_scan(cb, x, reverse=True, unroll=self.unroll)
        else:
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype),
                         unroll=self.unroll, name="fwd")(x)
            bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype),
                         reverse=True, keep_order=True, unroll=self.unroll,
                         name="bwd")(x)
        h = jnp.concatenate([fwd, bwd], axis=-1)
        return nn.Dense(self.out, dtype=self.dtype, name="proj")(h)


class DualPathLayer(nn.Module):
    """One dual-path block: RNN along frequency, then along time, each with
    layernorm + residual (BSRNN/SCNet-style core)."""

    channels: int
    rnn_hidden: int
    rnn_unroll: int = 1
    rnn_impl: str = "flax"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, F, T, C = x.shape
        # frequency path
        h = nn.LayerNorm(dtype=self.dtype, name="freq_norm")(x)
        h = h.transpose(0, 2, 1, 3).reshape(B * T, F, C)
        h = BiRNN(self.rnn_hidden, C, unroll=self.rnn_unroll,
                  impl=self.rnn_impl, dtype=self.dtype, name="freq_rnn")(h)
        h = h.reshape(B, T, F, C).transpose(0, 2, 1, 3)
        x = x + h
        # time path
        h = nn.LayerNorm(dtype=self.dtype, name="time_norm")(x)
        h = h.reshape(B * F, T, C)
        h = BiRNN(self.rnn_hidden, C, unroll=self.rnn_unroll,
                  impl=self.rnn_impl, dtype=self.dtype, name="time_rnn")(h)
        h = h.reshape(B, F, T, C)
        return x + h


class SCNet(nn.Module):
    """Full SCNet: spectrogram -> SD encoder -> dual-path -> SU decoder ->
    per-source complex masks -> masked mixture spectrogram.

    __call__ operates on waveforms: (B, 2, T) -> (B, sources, 2, T).
    ``spec_forward`` exposes the spectrogram-domain core for training.
    """

    cfg: SCNetConfig

    @nn.compact
    def spec_forward(self, spec: jax.Array) -> jax.Array:
        """spec: complex (B, 2, F, T) with F = n_fft//2 -> per-source masked
        complex spec (B, sources, 2, F, T)."""
        c = self.cfg
        B, ch, F, T = spec.shape
        x = jnp.concatenate([jnp.real(spec), jnp.imag(spec)], axis=1)  # (B, 4, F, T)
        x = x.transpose(0, 2, 3, 1)  # (B, F, T, 4)
        x = x.astype(jnp.dtype(c.compute_dtype))  # bf16 core when configured

        freqs = [F]
        skips_all = []
        for i in range(len(c.dims) - 1):
            x, skips = SDLayer(c, c.dims[i + 1], name=f"sd{i}")(x)
            skips_all.append(skips)
            freqs.append(x.shape[1])

        for i in range(c.num_dplayers):
            x = DualPathLayer(c.dims[-1], c.rnn_hidden, c.rnn_unroll,
                              c.rnn_impl, dtype=c.core_dtype,
                              name=f"dp{i}")(x)

        for i in reversed(range(len(c.dims) - 1)):
            out_dim = c.dims[i] if i > 0 else c.dims[1]
            x = SULayer(c, out_dim, freqs[i], name=f"su{i}")(x, skips_all[i])

        # mask head: per source, complex mask for each mixture channel
        m = nn.Dense(c.sources * ch * 2, dtype=c.core_dtype,
                     name="mask_head")(x)  # (B, F, T, S*ch*2)
        m = m.astype(jnp.float32)  # lax.complex needs f32; spec stays f32
        m = m.reshape(B, F, T, c.sources, ch, 2)
        mask = jax.lax.complex(m[..., 0], m[..., 1])  # (B, F, T, S, ch)
        mask = mask.transpose(0, 3, 4, 1, 2)  # (B, S, ch, F, T)
        return mask * spec[:, None]  # masked mixture

    def __call__(self, mixture: jax.Array) -> jax.Array:
        c = self.cfg
        B, ch, T = mixture.shape
        spec = stft(mixture, c.n_fft, c.hop_length)  # (B, 2, F+1, frames)
        spec_in = spec[:, :, : c.n_freqs]  # drop Nyquist bin
        out = self.spec_forward(spec_in)  # (B, S, 2, F, frames)
        # restore the Nyquist bin as zeros for inversion
        out = jnp.pad(out, ((0, 0), (0, 0), (0, 0), (0, 1), (0, 0)))
        wav = istft(out, c.n_fft, c.hop_length, length=T)
        return wav  # (B, S, 2, T)
