"""Batched, differentiable 64-d mixing-feature extractor.

Re-derivation of the reference's ``MixingFeatureExtractor``
(ref: src/mixing_utils.py:16-357) as one pure jnp function over stacked
stems ``(..., 4, 2, T)`` — the reference loops stems/keys in Python on CPU
per sample; here a whole batch is one fused XLA program (a single shared
mel spectrogram feeds spectral, flatness and masking features), it vmaps,
shards, and is differentiable end-to-end (needed for per-pair TCN
optimization, ref: inference/test_tcn_style_transfer.py:84-201).

Feature vector layout — must match the reference's *sorted-key flattening*
(ref: mixing_utils.py:320-335) exactly for checkpoint/embedding parity:

    [bass_dynamics(6), bass_rel_loudness(1), bass_spectral(5), bass_stereo(3),
     drums_...(15), masking(4: vocals,bass,drums,other), other_...(15),
     vocals_...(15)]  -> 64

Per-stem blocks:
  dynamics(6)  = [rms_L, rms_R, crest_L, crest_R, loudness, loudness]
  spectral(5)  = [low_dB, mid_dB, high_dB, tilt, flatness]
  stereo(3)    = [ILD, correlation, mid/side ratio]
Values are clamped to [-100, 100] and NaN -> 0 (ref: mixing_utils.py:337-356).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mst_tpu.config import FeatureConfig
from mst_tpu.ops.mel import mel_spectrogram

# canonical stem axis order of the stacked array
STEM_AXIS_ORDER = ("vocals", "bass", "drums", "other")
# sorted(key) order of the reference's feature dict
_SORTED_STEMS = ("bass", "drums", "other", "vocals")
_STEM_TO_AXIS = {s: STEM_AXIS_ORDER.index(s) for s in _SORTED_STEMS}

FEATURE_ORDER = tuple(
    [f"{s}_{blk}" for s in _SORTED_STEMS[:2] for blk in ("dynamics", "rel_loudness", "spectral", "stereo")]
    + ["masking"]
    + [f"{s}_{blk}" for s in _SORTED_STEMS[2:] for blk in ("dynamics", "rel_loudness", "spectral", "stereo")]
)


def feature_dim(cfg: FeatureConfig | None = None) -> int:
    cfg = cfg or FeatureConfig()
    return cfg.feature_dim


def _loudness(audio: jax.Array) -> jax.Array:
    """Simplified-LUFS loudness over (..., 2, T) -> (...,).
    ref: mixing_utils.py:311-318: -0.691 + 10*log10(mean(x^2) + 1e-10)."""
    ms = jnp.mean(audio**2, axis=(-2, -1))
    return -0.691 + 10.0 * jnp.log10(ms + 1e-10)


def _dynamics(audio: jax.Array) -> jax.Array:
    """(..., 2, T) -> (..., 6): rms_L/R, crest_L/R, loudness x2
    (ref: mixing_utils.py:107-139)."""
    rms = jnp.sqrt(jnp.mean(audio**2, axis=-1))  # (..., 2)
    peak = jnp.max(jnp.abs(audio), axis=-1)  # (..., 2)
    crest = 20.0 * jnp.log10(peak / (rms + 1e-8) + 0.0)
    loud = _loudness(audio)[..., None]  # (..., 1)
    return jnp.concatenate([rms, crest, loud, loud], axis=-1)


def _tilt(curve: jax.Array, n_bins: int) -> jax.Array:
    """Pearson corr(bin_index, curve) over the last axis; 0 when flat
    (ref guards std < 1e-6 with a hard switch, mixing_utils.py:187-191 —
    implemented as a smooth-safe where so gradients stay finite)."""
    bins = jnp.arange(n_bins, dtype=curve.dtype)
    bins_c = bins - bins.mean()
    c = curve - jnp.mean(curve, axis=-1, keepdims=True)
    # torch.corrcoef uses the unbiased estimator; the (n-1) factors cancel.
    cov = jnp.sum(bins_c * c, axis=-1)
    c_std = jnp.sqrt(jnp.sum(c**2, axis=-1))
    b_std = jnp.sqrt(jnp.sum(bins_c**2))
    # ref threshold is on torch.std (unbiased): std = c_std / sqrt(n-1)
    flat_mask = (c_std / jnp.sqrt(jnp.asarray(n_bins - 1.0))) < 1e-6
    safe_denom = jnp.where(flat_mask, 1.0, c_std * b_std)
    return jnp.where(flat_mask, 0.0, cov / safe_denom)


def _flatness(mel_pow: jax.Array) -> jax.Array:
    """geometric/arithmetic mean over the full (channel, mel, time) tensor
    (ref: mixing_utils.py:195)."""
    return jnp.exp(jnp.mean(jnp.log(mel_pow + 1e-10), axis=(-3, -2, -1))) / (
        jnp.mean(mel_pow, axis=(-3, -2, -1)) + 1e-10
    )


def _spectral(mel_pow: jax.Array, n_mels: int) -> jax.Array:
    """(..., 2, n_mels, F) mel power -> (..., 5) (ref: mixing_utils.py:141-200)."""
    mel_db = 10.0 * jnp.log10(mel_pow + 1e-10)
    mel_energy = jnp.mean(mel_db, axis=(-3, -1))  # (..., n_mels)

    lo = n_mels // 4
    hi = (n_mels // 4) * 3
    low_e = jnp.mean(mel_energy[..., :lo], axis=-1)
    mid_e = jnp.mean(mel_energy[..., lo:hi], axis=-1)
    high_e = jnp.mean(mel_energy[..., hi:], axis=-1)

    tilt = _tilt(mel_energy, n_mels)
    flatness = _flatness(mel_pow)
    return jnp.stack([low_e, mid_e, high_e, tilt, flatness], axis=-1)


def _spectral_detailed(mel_pow: jax.Array, n_mels: int, n_bins: int) -> jax.Array:
    """Detailed mode (ref: mixing_utils.py:202-236): subsampled mel-dB curve
    (linear interpolation, align_corners) + tilt over the curve + flatness
    -> (..., n_bins + 2)."""
    mel_db = 10.0 * jnp.log10(mel_pow + 1e-10)
    mel_energy = jnp.mean(mel_db, axis=(-3, -1))  # (..., n_mels)

    if n_bins >= n_mels:
        curve = mel_energy
        n_bins = n_mels
    else:
        # torch F.interpolate(mode='linear', align_corners=True) semantics
        pos = jnp.linspace(0.0, n_mels - 1.0, n_bins)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n_mels - 1)
        w = (pos - lo).astype(mel_energy.dtype)
        curve = mel_energy[..., lo] * (1.0 - w) + mel_energy[..., hi] * w

    tilt = _tilt(curve, n_bins)
    flatness = _flatness(mel_pow)
    return jnp.concatenate(
        [curve, tilt[..., None], flatness[..., None]], axis=-1
    )


def _stereo(audio: jax.Array) -> jax.Array:
    """(..., 2, T) -> (..., 3): ILD, correlation, MSR (ref: mixing_utils.py:238-268)."""
    L = audio[..., 0, :]
    R = audio[..., 1, :]
    rms_L = jnp.sqrt(jnp.mean(L**2, axis=-1))
    rms_R = jnp.sqrt(jnp.mean(R**2, axis=-1))
    ild = 20.0 * jnp.log10(rms_L / (rms_R + 1e-8))

    Lc = L - jnp.mean(L, axis=-1, keepdims=True)
    Rc = R - jnp.mean(R, axis=-1, keepdims=True)
    corr = jnp.sum(Lc * Rc, axis=-1) / (
        jnp.sqrt(jnp.sum(Lc**2, axis=-1) * jnp.sum(Rc**2, axis=-1)) + 1e-8
    )

    mid = (L + R) / 2.0
    side = (L - R) / 2.0
    msr = jnp.mean(side**2, axis=-1) / (jnp.mean(mid**2, axis=-1) + 1e-8)
    return jnp.stack([ild, corr, msr], axis=-1)


def _masking(stem_mels: jax.Array) -> jax.Array:
    """(..., 4, n_mels, F) channel-averaged mel power -> (..., 4).

    Masking indicator per stem in STEM_AXIS_ORDER (vocals, bass, drums,
    other): sigmoid((beta - dominance)/tau) averaged over (mel, time) with
    beta=0, tau=1 (ref: mixing_utils.py:270-309)."""
    outs = []
    for i in range(4):
        stem_e = stem_mels[..., i, :, :]
        others = jnp.stack(
            [stem_mels[..., j, :, :] for j in range(4) if j != i], axis=-3
        )
        max_other = jnp.max(others, axis=-3)
        dominance = stem_e - max_other
        outs.append(jnp.mean(jax.nn.sigmoid(-dominance), axis=(-2, -1)))
    return jnp.stack(outs, axis=-1)


def extract_mixing_features(
    stems: jax.Array,
    cfg: FeatureConfig | None = None,
    mel_pow: jax.Array | None = None,
) -> jax.Array:
    """Stems ``(..., 4, 2, T)`` (STEM_AXIS_ORDER) -> features ``(..., 64)``.

    Pure function: jit/vmap/grad-safe; one mel spectrogram computation is
    shared by the spectral, flatness and masking blocks.  Pass ``mel_pow``
    ``(..., 4, 2, n_mels, F)`` to reuse an already-computed power mel (the
    encoder front-end computes the identical transform when its audio
    config matches — the fused pipeline computes it once).
    """
    cfg = cfg or FeatureConfig()
    a = cfg.audio

    if mel_pow is None:
        # shared mel power for all stems/channels: (..., 4, 2, n_mels, F)
        mel_pow = mel_spectrogram(
            stems, a.sample_rate, a.n_fft, a.hop_length, a.n_mels,
            power=2.0, method=getattr(a, "mel_method", "rfft"),
        )

    mixture = jnp.sum(stems, axis=-3)  # (..., 2, T)
    mix_loud = _loudness(mixture)  # (...,)

    dyn = _dynamics(stems)  # (..., 4, 6)
    if cfg.use_detailed_spectral:
        spec = _spectral_detailed(mel_pow, a.n_mels, cfg.n_spectral_bins)
    else:
        spec = _spectral(mel_pow, a.n_mels)  # (..., 4, 5)
    ster = _stereo(stems)  # (..., 4, 3)
    rel = _loudness(stems) - mix_loud[..., None]  # (..., 4)
    mask = _masking(jnp.mean(mel_pow, axis=-3))  # (..., 4)

    blocks = []
    sorted_idx = [_STEM_TO_AXIS[s] for s in _SORTED_STEMS]
    for pos, ax in enumerate(sorted_idx):
        blocks.append(dyn[..., ax, :])
        blocks.append(rel[..., ax : ax + 1])
        blocks.append(spec[..., ax, :])
        blocks.append(ster[..., ax, :])
        if _SORTED_STEMS[pos] == "drums":  # 'masking' sorts after 'drums_stereo'
            blocks.append(mask)
    feats = jnp.concatenate(blocks, axis=-1)

    feats = jnp.clip(feats, -100.0, 100.0)
    feats = jnp.where(jnp.isnan(feats), 0.0, feats)
    return feats
