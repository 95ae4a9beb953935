"""Harder on-device procedural corpus (v2) — music-like enough that the
synthetic evaluations stop saturating (round-2 verdict item 1).

v1 (separation/synth.py) gives every stem family a *disjoint* spectro-
temporal signature, which makes separation and same-song retrieval far
easier than real music.  v2 closes the gap along the axes that define the
reference's task (ref: README.md:1-14 — "mixing style" as the latent to
embed; ref: src/mixing_utils.py:364-479 — the degradations that define
"different mix of the same song"):

- **Shared harmony**: bass, pad and melody follow one per-song chord
  progression in one random key, so stems are harmonically correlated
  (partials collide) instead of living in disjoint bands.
- **Overlapping spectra**: vocals span 165-660 Hz with variable-brightness
  harmonic stacks and HF consonant noise (collides with hats); bass spans
  41-220 Hz with drive harmonics reaching the mids; the snare has a tonal
  body at 150-250 Hz (collides with bass/pad); the pad is a detuned-saw
  stack up to the 12th partial (collides with everything).
- **Tempo / key / instrumentation jitter**: BPM ~ U(70, 180), key ~ U(0,
  12) semitones, per-song brightness/decay/pattern draws.
- **Mixing style as an explicit latent factor**: songs are synthesized
  *dry*, then ``render_style`` applies a per-song mix — per-stem gain,
  pan, spectral tilt, compression, and a shared stereo reverb (the
  augment-chain effect family, ops/biquad.py) — so "same song, same mix"
  crops share a real style latent and a different render is a genuinely
  different mix of the same content.

Everything is pure jnp with static shapes (traced tempo/key — no
data-dependent control flow), vmapped over the batch, PRNGKey-driven.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mst_tpu.ops.biquad import butter_sos, sosfilt_fir
from mst_tpu.ops.fftconv import fft_convolve_1d

SEMI = 2.0 ** (1.0 / 12.0)
# chord intervals (semitones from song key root): I, vi, IV, V — a pop loop
_PROG = jnp.asarray([0.0, 9.0, 5.0, 7.0])
# chord tones for melody/pad voicing: root, third, fifth, octave
_TONES = jnp.asarray([0.0, 4.0, 7.0, 12.0])


def _seg_gather(key: jax.Array, t: jax.Array, seg_dur: jax.Array,
                n_max: int, low: int, high: int) -> jax.Array:
    """Per-segment random ints gathered onto the time axis with a *traced*
    segment duration (tempo jitter needs this; a static `//` would bake the
    tempo into the compiled shape)."""
    vals = jax.random.randint(key, (n_max,), low, high)
    idx = jnp.clip((t / seg_dur).astype(jnp.int32), 0, n_max - 1)
    return vals[idx]


def _chord_root(t: jax.Array, bar: jax.Array, key_semis: jax.Array) -> jax.Array:
    """Chord-root semitone offset over time: progression advances per bar."""
    bar_idx = jnp.clip((t / bar).astype(jnp.int32) % 4, 0, 3)
    return key_semis + _PROG[bar_idx]


def _phase(f_t: jax.Array, sr: float) -> jax.Array:
    return 2.0 * jnp.pi * jnp.cumsum(f_t) / sr


def _hp(x: jax.Array, a: float) -> jax.Array:
    return x - a * jnp.roll(x, 1, axis=-1)


def _vocals(key, t, sr, beat, bar, key_semis):
    """Melody on chord tones, 165-660 Hz, variable brightness, vibrato and
    HF consonant bursts at note onsets."""
    T = t.shape[0]
    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
    seg = beat  # one note per beat
    n_max = max(2, int(T / sr / (60.0 / 180.0)) + 2)  # fastest-tempo bound
    tone_idx = _seg_gather(k1, t, seg, n_max, 0, 4)
    octave = _seg_gather(k2, t, seg, n_max, 0, 2).astype(jnp.float32)
    semis = _chord_root(t, bar, key_semis) + _TONES[tone_idx] + 12.0 * octave
    f0 = 165.0 * SEMI ** semis
    vib_rate = 4.5 + 2.0 * jax.random.uniform(k3)
    vib_depth = 0.005 + 0.015 * jax.random.uniform(k6)
    f0 = f0 * (1.0 + vib_depth * jnp.sin(2 * jnp.pi * vib_rate * t))
    ph = _phase(f0, sr)
    rolloff = 0.7 + 0.8 * jax.random.uniform(k4)  # brightness jitter
    wave = sum(jnp.sin(h * ph) * h ** (-rolloff) for h in range(1, 11))
    t_in = jnp.mod(t, seg)
    onset = jnp.minimum(t_in * 25.0, 1.0)
    # consonant: HF noise burst at each note onset (collides w/ hats)
    burst = _hp(jax.random.normal(k5, (T,)), 0.92) * jnp.exp(-t_in * 60.0) * 0.5
    am = 0.75 + 0.25 * jnp.sin(2 * jnp.pi * 0.7 * t + jax.random.uniform(k7) * 6.28)
    return (wave * onset * am * 0.3 + burst * 0.15)


def _bass(key, t, sr, beat, bar, key_semis):
    """Chord roots with octave jitter (41-220 Hz) and random drive
    (harmonics into the mids); plucked or sustained."""
    k1, k2, k3 = jax.random.split(key, 3)
    seg = beat
    n_max = max(2, int(t.shape[0] / sr / (60.0 / 180.0)) + 2)
    octave = _seg_gather(k1, t, seg, n_max, 0, 2).astype(jnp.float32)
    semis = _chord_root(t, bar, key_semis) + 12.0 * (octave - 1.0)
    f0 = 82.4 * SEMI ** semis  # E2-centred: 41-220 Hz across octaves
    ph = _phase(f0, sr)
    drive = 0.2 + 0.8 * jax.random.uniform(k2)  # harmonic content jitter
    wave = sum(jnp.sin(h * ph) * drive ** (h - 1) for h in range(1, 7))
    t_in = jnp.mod(t, seg)
    sustained = jax.random.uniform(k3) < 0.5
    env_pluck = jnp.exp(-3.0 * t_in)
    env_sus = jnp.ones_like(t_in) * 0.7
    env = jnp.where(sustained, env_sus, env_pluck)
    return wave * env * jnp.minimum(t_in * 80.0, 1.0) * 0.5


def _drums(key, t, sr, beat):
    """(2, T): kick (random pitch drop), snare with tonal body 150-250 Hz,
    hats in 8ths or 16ths, occasional mid toms."""
    T = t.shape[0]
    kc, kl, kr, kp, kb2, kh, kh2, kt = jax.random.split(key, 8)
    t_beat = jnp.mod(t, beat)
    f_hi = 100.0 + 100.0 * jax.random.uniform(kp)
    kick_ph = 2 * jnp.pi * (45.0 * t_beat
                            + ((f_hi - 45.0) / 25.0) * (1 - jnp.exp(-25.0 * t_beat)))
    kick = jnp.sin(kick_ph) * jnp.exp(-11.0 * t_beat)
    # snare on beats 2/4: noise + tonal body colliding with bass/pad range
    t_sn = jnp.mod(t - beat, 2 * beat)  # floor-mod: safe for t < beat
    body_f = 150.0 + 100.0 * jax.random.uniform(kb2)
    common = jax.random.normal(kc, (T,))
    nl = 0.8 * common + 0.6 * jax.random.normal(kl, (T,))
    nr = 0.8 * common + 0.6 * jax.random.normal(kr, (T,))
    sn_env = jnp.exp(-18.0 * t_sn)
    body = jnp.sin(2 * jnp.pi * body_f * t) * sn_env * 0.5
    # hats: 8ths or 16ths
    sixteenths = jax.random.uniform(kh) < 0.5
    hat_div = jnp.where(sixteenths, beat / 4.0, beat / 2.0)
    t_h = jnp.mod(t, hat_div)
    open_decay = 25.0 + 50.0 * jax.random.uniform(kh2)
    hat_env = jnp.exp(-open_decay * t_h) * 0.5
    # toms: one random mid-frequency hit per 2 bars
    tom_f = 80.0 + 80.0 * jax.random.uniform(kt)
    t_tom = jnp.mod(t - 3 * beat, 8 * beat)
    tom = jnp.sin(2 * jnp.pi * tom_f * t) * jnp.exp(-8.0 * t_tom) * 0.6
    out = []
    for n in (nl, nr):
        sn = _hp(n, 0.6) * sn_env * 0.6 + body
        hat = _hp(_hp(n, 0.95), 0.95) * hat_env
        out.append(kick + sn + hat + tom)
    return jnp.stack(out) * 0.45


def _pad(key, t, sr, beat, bar, key_semis):
    """Detuned-saw chord stack up to the 12th partial; sustained pad or
    16th-gated arpeggio (rhythmic collision with drums)."""
    T = t.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    root_semis = _chord_root(t, bar, key_semis)
    f_root = 110.0 * SEMI ** root_semis
    detune = 1.0 + 0.003 * jax.random.uniform(k1, (3,))
    chord = jnp.zeros(T)
    for i, iv in enumerate((0.0, 4.0, 7.0)):
        f = f_root * SEMI ** iv * detune[i]
        ph = _phase(f, sr)
        # saw-ish: 12 partials at 1/h
        chord = chord + sum(jnp.sin(h * ph) / h for h in range(1, 13))
    arp = jax.random.uniform(k2) < 0.4
    gate_div = beat / 4.0
    t_g = jnp.mod(t, gate_div)
    gated = jnp.exp(-12.0 * t_g)
    sustained = 0.85 + 0.15 * jnp.sin(2 * jnp.pi * 0.4 * t
                                      + jax.random.uniform(k3) * 6.28)
    env = jnp.where(arp, gated, sustained)
    return chord * env * 0.12


def synth_dry_song(key: jax.Array, T: int,
                   sample_rate: float = 44100.0) -> jax.Array:
    """One dry (un-mixed) song: (4, 2, T) in vocals/bass/drums/other order.
    Channels are near-identical for pitched stems (pan/width happen in
    ``render_style``); drums are L/R decorrelated at source."""
    ks, kk, kv, kb, kd, kp = jax.random.split(key, 6)
    t = jnp.arange(T) / sample_rate
    bpm = 70.0 + 110.0 * jax.random.uniform(ks)
    beat = 60.0 / bpm
    bar = 4.0 * beat
    key_semis = jax.random.uniform(kk, minval=0.0, maxval=12.0)

    voc = _vocals(kv, t, sample_rate, beat, bar, key_semis)
    bas = _bass(kb, t, sample_rate, beat, bar, key_semis)
    drm = _drums(kd, t, sample_rate, beat)           # (2, T)
    pad = _pad(kp, t, sample_rate, beat, bar, key_semis)

    mono = jnp.stack([voc, bas, jnp.zeros_like(voc), pad])
    stems = jnp.stack([mono, mono], axis=1)  # (4, 2, T) centred
    return stems.at[2].set(drm)


def draw_style_params(key: jax.Array, B: int, S: int,
                      sample_rate: float = 44100.0) -> dict:
    """Draw one mixing style per song as an explicit parameter pytree
    (per-stem gain/pan/tilt/compression + shared reverb — the effect family
    the reference treats as "different mix of the same song",
    ref: mixing_utils.py:364-479).  Key-split order matches the original
    fused render_style exactly, so render_style(key, ...) output is
    bit-stable across the refactor."""
    k = jax.random.split(key, 8)
    kd, kw, ki = jax.random.split(k[7], 3)
    rl = int(0.6 * sample_rate)
    return {
        "gain_db": jax.random.uniform(k[0], (B, S, 1, 1), minval=-6.0,
                                      maxval=6.0),
        "pan": jax.random.uniform(k[1], (B, S), minval=0.2, maxval=0.8),
        "tilt_amt": jax.random.uniform(k[2], (B, S, 1, 1), minval=0.0,
                                       maxval=0.8),
        "use_high": jax.random.uniform(k[3], (B, S, 1, 1)) < 0.5,
        "thresh": jax.random.uniform(k[4], (B, S, 1, 1), minval=-30.0,
                                     maxval=-12.0),
        "ratio": jax.random.uniform(k[5], (B, S, 1, 1), minval=1.5,
                                    maxval=6.0),
        "apply_c": jax.random.uniform(k[6], (B, S, 1, 1)) < 0.7,
        "decay": 0.15 + 0.45 * jax.random.uniform(kd),
        "wet_amt": 0.05 + 0.35 * jax.random.uniform(kw),
        "reverb_noise": jax.random.normal(ki, (rl,)),
    }


def interpolate_style(p_base: dict, p_other: dict, alpha: float) -> dict:
    """A style alpha-close to ``p_base``: continuous params lerp toward
    ``p_other``; discrete switches and the reverb noise stay at base.  The
    knob behind the confuser eval protocol — small alpha tests fine-grained
    style resolution (two fully independent styles are trivially separable
    for a trained encoder)."""
    out = dict(p_base)
    for name in ("gain_db", "pan", "tilt_amt", "thresh", "ratio", "decay",
                 "wet_amt"):
        out[name] = (1.0 - alpha) * p_base[name] + alpha * p_other[name]
    return out


def apply_style(params: dict, stems: jax.Array,
                sample_rate: float = 44100.0,
                fir_taps: int = 2048) -> jax.Array:
    """Apply an explicit mixing style (draw_style_params pytree) to batched
    dry stems (B, 4, 2, T)."""
    x = stems * 10.0 ** (params["gain_db"] / 20.0)

    # per-stem constant-power pan
    pan = params["pan"]
    l, r = jnp.sqrt(pan), jnp.sqrt(1.0 - pan)
    mid = x.mean(axis=2)
    side = 0.5 * (x[:, :, 0] - x[:, :, 1])  # drums carry width
    x = jnp.stack([mid * l[..., None] + side, mid * r[..., None] - side], axis=2)

    # per-stem spectral tilt: blend toward a shelved copy
    hi = sosfilt_fir(butter_sos(2, 2000.0, "high", sample_rate), x, fir_taps)
    lo = sosfilt_fir(butter_sos(2, 500.0, "low", sample_rate), x, fir_taps)
    shelved = jnp.where(params["use_high"], hi, lo)
    tilt_amt = params["tilt_amt"]
    x = x * (1.0 - tilt_amt) + shelved * tilt_amt

    # per-stem compression, applied per the style's discrete switch
    thresh, ratio = params["thresh"], params["ratio"]
    db = 20.0 * jnp.log10(jnp.abs(x) + 1e-8)
    comp_db = jnp.where(db > thresh, thresh + (db - thresh) / ratio, db)
    comp = jnp.sign(x) * 10.0 ** (comp_db / 20.0)
    x = jnp.where(params["apply_c"], comp, x)

    # shared stereo reverb on the mixture, redistributed by stem energy
    T = stems.shape[-1]
    rl = params["reverb_noise"].shape[-1]
    tr = jnp.arange(rl) / sample_rate
    impulse = (jnp.exp(-tr / (params["decay"] / 4.0))
               * params["reverb_noise"] * 0.1)
    mixture = x.sum(axis=1)  # (B, 2, T)
    wet = fft_convolve_1d(mixture, impulse, mode="same_corr")[..., :T]
    energy = jnp.mean(x ** 2, axis=(-2, -1))
    prop = (energy / (energy.sum(axis=-1, keepdims=True) + 1e-8))[..., None, None]
    x = x + wet[:, None] * prop * params["wet_amt"]
    return x


def render_style(key: jax.Array, stems: jax.Array,
                 sample_rate: float = 44100.0,
                 fir_taps: int = 2048) -> jax.Array:
    """Draw + apply one per-song *mixing style* to dry stems (4, 2, T) (or
    batched (B, 4, 2, T) under vmap).  Output is identical to the original
    fused implementation (same key-split order)."""
    single = stems.ndim == 3
    if single:
        stems = stems[None]
    B, S, C, T = stems.shape
    params = draw_style_params(key, B, S, sample_rate)
    x = apply_style(params, stems, sample_rate, fir_taps)
    return x if not single else x[0]


def synth_stems_v2(key: jax.Array, T: int,
                   sample_rate: float = 44100.0) -> jax.Array:
    """Dry song + its style render: (4, 2, T).  Drop-in for synth_stems."""
    kd, ks = jax.random.split(key)
    return render_style(ks, synth_dry_song(kd, T, sample_rate), sample_rate)


def synth_batch_v2(key: jax.Array, batch: int, T: int,
                   sample_rate: float = 44100.0) -> jax.Array:
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda k: synth_stems_v2(k, T, sample_rate))(keys)


def synth_two_crop_batch_v2(key: jax.Array, songs: int, T: int,
                            sample_rate: float = 44100.0):
    """Two same-song/same-mix crops per song (the FMA two-crop protocol,
    ref: src/data.py:230-268): each song is one 2T dry piece rendered with
    ONE style (so the mix is a shared latent across both crops), split into
    halves.  Returns (stems (2*songs, 4, 2, T), labels) in
    [song0_cropA, song0_cropB, song1_cropA, ...] order."""
    keys = jax.random.split(key, songs)

    def one(k):
        kd, ks = jax.random.split(k)
        dry = synth_dry_song(kd, 2 * T, sample_rate)
        return render_style(ks, dry, sample_rate)

    styled = jax.vmap(one)(keys)  # (songs, 4, 2, 2T)
    crops = jnp.stack([styled[..., :T], styled[..., T:]], axis=1)
    stems = crops.reshape(songs * 2, *styled.shape[1:-1], T)
    labels = jnp.repeat(jnp.arange(songs), 2)
    return stems, labels


def synth_confuser_batch_v2(key: jax.Array, songs: int, T: int,
                            sample_rate: float = 44100.0,
                            confuser_alpha: float = 0.02) -> jax.Array:
    """Hard retrieval-eval batch: per song, one 2T dry piece rendered TWICE
    — style S gives query crop A and key crop B (same mix, different crop,
    the ref protocol, validate_retrieval.py:92-150); an alpha-interpolated
    style S' = lerp(S, independent draw, alpha) on the SAME dry content
    gives confuser crop C (a *slightly* "different mix of the same song",
    ref: mixing_utils.py:364-479).  A retrieval pool of {all B} ∪ {all C}
    can only be solved by resolving mixing styles finer than alpha: content
    cues alone cannot rank B_i above C_i, and fully independent styles are
    trivially separable for a trained encoder (measured: confuser never
    beats the key at alpha=1), so the alpha knob is what keeps top1 off the
    1.0 ceiling (round-2 verdict item 1).

    Returns stems (3*songs, 4, 2, T) in [A0,B0,C0, A1,B1,C1, ...] order.
    """
    keys = jax.random.split(key, songs)

    def one(k):
        kd, ks1, ks2 = jax.random.split(k, 3)
        dry = synth_dry_song(kd, 2 * T, sample_rate)[None]
        p1 = draw_style_params(ks1, 1, dry.shape[1], sample_rate)
        p2 = draw_style_params(ks2, 1, dry.shape[1], sample_rate)
        pc = interpolate_style(p1, p2, confuser_alpha)
        s1 = apply_style(p1, dry, sample_rate)[0]
        sc = apply_style(pc, dry, sample_rate)[0]
        return jnp.stack([s1[..., :T], s1[..., T:], sc[..., T:]])

    crops = jax.vmap(one)(keys)  # (songs, 3, 4, 2, T)
    return crops.reshape(songs * 3, *crops.shape[2:])
