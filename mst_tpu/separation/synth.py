"""On-device procedural 4-stem music synthesizer (training data for SCNet).

The reference trains nothing — it consumes an upstream SCNet checkpoint
(ref: inference/inference_e2e_style_transfer.py:200-205) whose training data
(MUSDB18) is not available here.  To *demonstrate* separation capability we
synthesize music-like stems directly on the TPU inside the jitted train
step: every stem family has a distinct, consistent spectro-temporal
signature (the property a separator must learn), randomness is fully
PRNGKey-driven, and all shapes are static — so the generator compiles once
and produces infinite fresh batches with zero host involvement (the host
has 1 CPU core; a Python data loader would starve the chip).

Stem signatures (STEM order vocals/bass/drums/other, features/mixing_features.py):
- vocals: harmonic tone, f0 196-392 Hz random note walk, 5.5 Hz vibrato,
  8 harmonics with 1/h rolloff, slow AM + note-onset envelope.
- bass:   41-82 Hz note walk, saw-ish 3-harmonic tone, plucked decay.
- drums:  0.5 s beat grid — pitch-dropping kick, off-beat snare
  (band-limited noise), 1/8-note hats (HF noise); L/R decorrelated.
- other:  sustained chord pad (root 110-220 Hz, ratios 1/1.5/2/2.5),
  slow attack.

Each stem gets a random pan and gain per example.  `synth_stems` is pure
jnp and differentiable-free (data only), vmapped over the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SEMITONE = 2.0 ** (1.0 / 12.0)


def _note_walk(key: jax.Array, T: int, seg_samples: int, base_hz: float,
               n_semitones: int) -> jax.Array:
    """Piecewise-constant random note frequencies, one per segment -> (T,)."""
    n_seg = T // seg_samples + 1
    semis = jax.random.randint(key, (n_seg,), 0, n_semitones)
    f = base_hz * SEMITONE ** semis.astype(jnp.float32)
    idx = jnp.minimum(jnp.arange(T) // seg_samples, n_seg - 1)
    return f[idx]


def _phase(f_t: jax.Array, sr: float) -> jax.Array:
    """Continuous phase for a time-varying frequency track."""
    return 2.0 * jnp.pi * jnp.cumsum(f_t) / sr


def _hp(x: jax.Array, a: float = 0.9) -> jax.Array:
    """One-pole FIR high-pass (x[n] - a*x[n-1]) — cheap in-jit noise shaping."""
    return x - a * jnp.roll(x, 1, axis=-1)


def _vocals(key: jax.Array, t: jax.Array, sr: float) -> jax.Array:
    T = t.shape[0]
    k1, k2 = jax.random.split(key)
    seg = int(0.4 * sr)
    f0 = _note_walk(k1, T, seg, 196.0, 13)
    f0 = f0 * (1.0 + 0.01 * jnp.sin(2 * jnp.pi * 5.5 * t))
    ph = _phase(f0, sr)
    wave = sum(jnp.sin(h * ph) * (1.0 / h) for h in range(1, 9))
    t_in = (jnp.arange(T) % seg) / sr
    onset = jnp.minimum(t_in * 25.0, 1.0)
    am = 0.7 + 0.3 * jnp.sin(2 * jnp.pi * 0.8 * t + jax.random.uniform(k2) * 6.28)
    return wave * onset * am * 0.35


def _bass(key: jax.Array, t: jax.Array, sr: float) -> jax.Array:
    T = t.shape[0]
    seg = int(0.5 * sr)
    f0 = _note_walk(key, T, seg, 41.2, 13)
    ph = _phase(f0, sr)
    wave = sum(jnp.sin(h * ph) * (1.0 / h) for h in range(1, 4))
    t_in = (jnp.arange(T) % seg) / sr
    env = jnp.exp(-2.0 * t_in) * jnp.minimum(t_in * 80.0, 1.0)
    return wave * env * 0.6


def _drums(key: jax.Array, t: jax.Array, sr: float) -> jax.Array:
    """Returns (2, T) — channels carry decorrelated noise components."""
    T = t.shape[0]
    kc, kl, kr = jax.random.split(key, 3)
    beat = 0.5
    t_beat = t % beat
    # kick: pitch drop 165 -> 45 Hz, fast decay
    kick_ph = 2 * jnp.pi * (45.0 * t_beat + (120.0 / 25.0) * (1 - jnp.exp(-25.0 * t_beat)))
    kick = jnp.sin(kick_ph) * jnp.exp(-11.0 * t_beat)
    # snare on the off-beat, band-limited noise burst
    t_sn = (t - 0.25) % beat
    common = jax.random.normal(kc, (T,))
    nl = 0.8 * common + 0.6 * jax.random.normal(kl, (T,))
    nr = 0.8 * common + 0.6 * jax.random.normal(kr, (T,))
    snare_env = jnp.exp(-22.0 * t_sn)
    # hats every 1/8 note, strongly high-passed
    t_h = t % 0.25
    hat_env = jnp.exp(-55.0 * t_h) * 0.5
    out = []
    for n in (nl, nr):
        sn = _hp(n, 0.6) * snare_env * 0.7
        hat = _hp(_hp(n, 0.95), 0.95) * hat_env
        out.append(kick + sn + hat)
    return jnp.stack(out) * 0.5


def _pad(key: jax.Array, t: jax.Array, sr: float) -> jax.Array:
    T = t.shape[0]
    k1, k2 = jax.random.split(key)
    seg = int(1.0 * sr)
    root = _note_walk(k1, T, seg, 110.0, 13)
    ph = _phase(root, sr)
    chord = sum(jnp.sin(r * ph + i) for i, r in enumerate((1.0, 1.5, 2.0, 2.5)))
    t_in = (jnp.arange(T) % seg) / sr
    attack = jnp.minimum(t_in * 4.0, 1.0)
    am = 0.85 + 0.15 * jnp.sin(2 * jnp.pi * 0.5 * t + jax.random.uniform(k2) * 6.28)
    return chord * attack * am * 0.2


def synth_stems(key: jax.Array, T: int, sample_rate: float = 44100.0) -> jax.Array:
    """One example: (4, 2, T) stems in vocals/bass/drums/other order."""
    kv, kb, kd, kp, kmix = jax.random.split(key, 5)
    t = jnp.arange(T) / sample_rate
    voc = _vocals(kv, t, sample_rate)
    bas = _bass(kb, t, sample_rate)
    drm = _drums(kd, t, sample_rate)  # (2, T)
    pad = _pad(kp, t, sample_rate)

    kpan, kgain = jax.random.split(kmix)
    pans = jax.random.uniform(kpan, (4,), minval=0.25, maxval=0.75)
    gains = jax.random.uniform(kgain, (4,), minval=0.6, maxval=1.0)
    l = jnp.sqrt(pans)[:, None]
    r = jnp.sqrt(1.0 - pans)[:, None]
    mono = jnp.stack([voc, bas, jnp.zeros_like(voc), pad])  # drums handled below
    stems = jnp.stack([mono * l, mono * r], axis=1)  # (4, 2, T)
    drm_st = jnp.stack([drm[0] * l[2, 0], drm[1] * r[2, 0]])
    stems = stems.at[2].set(drm_st)
    return stems * gains[:, None, None]


def synth_batch(key: jax.Array, batch: int, T: int,
                sample_rate: float = 44100.0) -> jax.Array:
    """(B, 4, 2, T) fresh stems from one key."""
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda k: synth_stems(k, T, sample_rate))(keys)


def synth_two_crop_batch(key: jax.Array, songs: int, T: int,
                         sample_rate: float = 44100.0):
    """Two-crop contrastive batch, synthesized on device: each "song" is one
    2T-sample procedural piece whose halves become two same-song segments
    (the FMA two-crop protocol, ref: src/data.py:230-268, with zero host
    involvement).  Returns (stems (2*songs, 4, 2, T), labels (2*songs,))
    ordered [song0_cropA, song0_cropB, song1_cropA, ...] so labels are
    ``repeat(arange(songs), 2)`` — the stage-1 trainer's expected layout."""
    stems2 = synth_batch(key, songs, 2 * T, sample_rate)  # (B, 4, 2, 2T)
    crops = jnp.stack([stems2[..., :T], stems2[..., T:]], axis=1)
    stems = crops.reshape(songs * 2, *stems2.shape[1:-1], T)
    labels = jnp.repeat(jnp.arange(songs), 2)
    return stems, labels
