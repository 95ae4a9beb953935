"""On-device negative-pair augmentation chain (ref: src/mixing_utils.py:364-479).

The reference's ``AudioAugmenter`` round-trips every stem through host numpy
for scipy sosfilt.  Here the whole chain is one jnp program over batched
stems ``(B, 4, 2, T)`` driven by a PRNGKey — anchors/positives/negatives
never leave HBM (the BASELINE.json north-star augmentation path).

Per stem, each applied independently with probability ``prob``:
  1. gain imbalance: U(-gain_range, +gain_range) dB        (ref: 389-392)
  2. spectral tilt: 50/50 Butterworth-2 high-pass @2 kHz or low-pass @500 Hz
     (ref: 394-396, 421-433)
  3. compression: dB-domain, threshold -20 dB, ratio 4     (ref: 435-447)
  4. bandwidth limit: Butterworth-4 low-pass, U(4, 12) kHz (ref: 449-456)
then, with probability ``prob`` per example:
  5. stereo reverb on the mixture (exp-decay noise IR, 0.3 wet),
     redistributed to stems proportionally to energy      (ref: 408-418, 458-479)

Branches are computed unconditionally and selected with ``jnp.where`` —
the XLA-friendly form of the reference's Python ``if torch.rand(1) < p``.
Filtering uses the truncated-IR FFT path (sosfilt_fir); cutoffs are traced,
so the random per-example bandwidth stays on device.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from mst_tpu.ops.biquad import butter_sos, sosfilt_fir
from mst_tpu.ops.fftconv import fft_convolve_1d


@dataclass(frozen=True)
class AugmentConfig:
    sample_rate: int = 44100
    gain_range_db: float = 9.0
    prob: float = 0.5
    comp_threshold_db: float = -20.0
    comp_ratio: float = 4.0
    tilt_high_cutoff: float = 2000.0
    tilt_low_cutoff: float = 500.0
    bandlimit_min: float = 4000.0
    bandlimit_max: float = 12000.0
    reverb_decay: float = 0.5
    reverb_wet: float = 0.3
    fir_taps: int = 4096


def _compress(audio: jax.Array, threshold: float, ratio: float) -> jax.Array:
    db = 20.0 * jnp.log10(jnp.abs(audio) + 1e-8)
    comp_db = jnp.where(db > threshold, threshold + (db - threshold) / ratio, db)
    return jnp.sign(audio) * (10.0 ** (comp_db / 20.0))


def _bernoulli(rng, p, shape):
    return jax.random.uniform(rng, shape) < p


def augment_stems(rng: jax.Array, stems: jax.Array,
                  cfg: AugmentConfig | None = None,
                  decisions: dict | None = None) -> jax.Array:
    """stems (..., 4, 2, T) -> degraded stems, same shape.

    Leading dims are treated as batch; every (batch, stem) draws its own
    augmentation decisions, matching the reference's per-stem loop.

    ``decisions``: optional override of every random draw (golden testing —
    the same pinned decisions drive a scipy/numpy oracle).  Keys, all
    optional: apply_gain/apply_tilt/use_high/apply_comp/apply_band (B, S)
    bool, gain_db/cutoffs (B, S), apply_reverb (B,) bool, impulse (rl,).
    Missing keys fall back to PRNG draws from ``rng``.
    """
    cfg = cfg or AugmentConfig()
    lead = stems.shape[:-3]
    S, C, T = stems.shape[-3:]
    x = stems.reshape((-1, S, C, T))
    B = x.shape[0]

    keys = jax.random.split(rng, 10) if rng is not None else [None] * 10
    decisions = decisions or {}

    def _pick(name, draw, reshape=(1, 1)):
        if name in decisions:
            d = jnp.asarray(decisions[name])
            return d.reshape(d.shape + (1,) * len(reshape)) if reshape else d
        return draw()

    # 1. gain
    apply_g = _pick("apply_gain",
                    lambda: _bernoulli(keys[0], cfg.prob, (B, S, 1, 1)))
    gain_db = _pick("gain_db", lambda: jax.random.uniform(
        keys[1], (B, S, 1, 1), minval=-cfg.gain_range_db,
        maxval=cfg.gain_range_db))
    x = jnp.where(apply_g, x * 10.0 ** (gain_db / 20.0), x)

    # 2. spectral tilt: static cutoffs -> precompute both cascades once
    apply_t = _pick("apply_tilt",
                    lambda: _bernoulli(keys[2], cfg.prob, (B, S, 1, 1)))
    use_high = _pick("use_high",
                     lambda: _bernoulli(keys[3], 0.5, (B, S, 1, 1)))
    sos_hi = butter_sos(2, cfg.tilt_high_cutoff, "high", cfg.sample_rate)
    sos_lo = butter_sos(2, cfg.tilt_low_cutoff, "low", cfg.sample_rate)
    hi = sosfilt_fir(sos_hi, x, cfg.fir_taps)
    lo = sosfilt_fir(sos_lo, x, cfg.fir_taps)
    tilted = jnp.where(use_high, hi, lo)
    x = jnp.where(apply_t, tilted, x)

    # 3. compression
    apply_c = _pick("apply_comp",
                    lambda: _bernoulli(keys[4], cfg.prob, (B, S, 1, 1)))
    x = jnp.where(apply_c, _compress(x, cfg.comp_threshold_db, cfg.comp_ratio), x)

    # 4. bandwidth limit with per-(batch, stem) random cutoff
    apply_b = _pick("apply_band",
                    lambda: _bernoulli(keys[5], cfg.prob, (B, S, 1, 1)))
    cutoffs = _pick("cutoffs", lambda: jax.random.uniform(
        keys[6], (B, S), minval=cfg.bandlimit_min, maxval=cfg.bandlimit_max
    ), reshape=None)

    def _bl(sig, cut):  # sig (2, T), cut scalar
        return sosfilt_fir(butter_sos(4, cut, "low", cfg.sample_rate), sig, cfg.fir_taps)

    limited = jax.vmap(jax.vmap(_bl))(x, cutoffs)
    x = jnp.where(apply_b, limited, x)

    # 5. reverb on the mixture, redistributed by stem energy
    apply_r = _pick("apply_reverb",
                    lambda: _bernoulli(keys[7], cfg.prob, (B, 1, 1, 1)),
                    reshape=(1, 1, 1))
    mixture = jnp.sum(x, axis=1)  # (B, 2, T)
    rl = int(cfg.sample_rate * cfg.reverb_decay)
    t = jnp.linspace(0.0, cfg.reverb_decay, rl)
    impulse = _pick("impulse", lambda: (
        jnp.exp(-t / (cfg.reverb_decay / 4.0))
        * jax.random.normal(keys[8], (rl,))
        * 0.1
    ), reshape=None)
    wet = fft_convolve_1d(mixture, impulse, mode="same_corr")[..., :T]
    mixture_rev = mixture * (1.0 - cfg.reverb_wet) + wet * cfg.reverb_wet

    stem_energy = jnp.mean(x**2, axis=(-2, -1))  # (B, S)
    total_energy = jnp.sum(stem_energy, axis=-1, keepdims=True) + 1e-8
    proportion = (stem_energy / total_energy)[..., None, None]  # (B, S, 1, 1)
    reverbed = x + mixture_rev[:, None] * proportion * cfg.reverb_wet
    x = jnp.where(apply_r, reverbed, x)

    return x.reshape(lead + (S, C, T))
