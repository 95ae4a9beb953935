"""Materialize the procedural synthetic corpora to separated-stem dirs.

Bridges the fully on-device recipes (``--on_device_synth``) and every
corpus-based CLI (train / validate_retrieval / extract_song_identity /
check_dataset / demix): the same seeded songs the jitted trainers
synthesize in HBM are written out as ``track_%04d/{vocals,bass,drums,
other}.wav`` — the separated-corpus layout the reference's datasets scan
(ref: src/data.py:146-166) — so the whole disk pipeline can be exercised
end-to-end without FMA/MUSDB access.

    python -m mst_tpu.cli.make_synth_corpus --output /data/synth2 \
        --n_songs 48 --duration 11 --sample_rate 22050 --synth_version 2

v2 songs (separation/synth_v2.py) carry one *mixing style* per song
(``render_style``), so song identity and mixing style are the corpus's two
latent factors — the setting the adversarial song-identity objective needs
(ref: src/train.py:529-541).  Generation is seeded and deterministic:
song ``i`` is ``fold_in(key(seed), i)`` regardless of batching or order.

``--n_styles K`` (v2 only) draws K styles from a shared pool and renders
song ``i`` with style ``i % K`` (assignment written to ``styles.json``).
With per-song styles, identity and style are perfectly confounded — a
style-only embedding still identifies the song — so a GRL evaluation
cannot show identity removal without breaking retrieval.  A shared pool
decouples the factors: identity probes can drop toward the style-cluster
ceiling while same-style retrieval holds.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

STEM_NAMES = ("vocals", "bass", "drums", "other")  # synth stem-axis order


def get_params(argv=None):
    p = argparse.ArgumentParser(description="Write a synthetic stem corpus")
    p.add_argument("--output", type=str, required=True)
    p.add_argument("--n_songs", type=int, default=48)
    p.add_argument("--duration", type=float, default=11.0,
                   help="seconds per song (>= 2x clip_duration + 1 so the "
                        "two-segment FMA protocol has room, "
                        "ref: src/data.py:235-267)")
    p.add_argument("--sample_rate", type=int, default=44100)
    p.add_argument("--synth_version", type=int, default=2, choices=(1, 2))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n_styles", type=int, default=0,
                   help="v2 only: 0 = one independent style per song "
                        "(default); K > 0 = draw K shared styles and render "
                        "song i with style i %% K (styles.json records the "
                        "assignment) — decouples song identity from mixing "
                        "style for the adversarial GRL evaluation")
    p.add_argument("--peak", type=float, default=0.99,
                   help="per-song peak |mixture| ceiling before the 16-bit "
                        "write; one uniform scale across a song's stems "
                        "preserves every relative-gain feature")
    return p.parse_args(argv)


def main(argv=None):
    args = get_params(argv)
    import jax
    import jax.numpy as jnp

    from mst_tpu.data.audio_io import write_wav

    if args.synth_version == 1:
        from mst_tpu.separation.synth import synth_stems
    else:
        from mst_tpu.separation.synth_v2 import synth_stems_v2 as synth_stems

    T = int(args.duration * args.sample_rate)
    sr = float(args.sample_rate)

    if args.n_styles and args.synth_version != 2:
        raise SystemExit("--n_styles requires --synth_version 2")

    def _peak_norm(stems):
        peak = jnp.max(jnp.abs(stems.sum(axis=0)))
        return stems * jnp.minimum(1.0, args.peak / jnp.maximum(peak, 1e-9))

    base = jax.random.key(args.seed)
    if args.n_styles:
        from mst_tpu.separation.synth_v2 import (
            apply_style,
            draw_style_params,
            synth_dry_song,
        )

        # one shared pool; style s is deterministic in (seed, s) alone
        style_key = jax.random.key(args.seed + 999_331)
        pool = [draw_style_params(jax.random.fold_in(style_key, s), 1, 4, sr)
                for s in range(args.n_styles)]

        @jax.jit
        def one_song(key, params):
            dry = synth_dry_song(key, T, sr)
            return _peak_norm(apply_style(params, dry[None], sr)[0])

        def render(i):
            return one_song(jax.random.fold_in(base, i),
                            pool[i % args.n_styles])
    else:
        @jax.jit
        def one_song(key):
            return _peak_norm(synth_stems(key, T, sr))  # (4, 2, T)

        def render(i):
            return one_song(jax.random.fold_in(base, i))

    root = Path(args.output)
    root.mkdir(parents=True, exist_ok=True)
    for i in range(args.n_songs):
        stems = np.asarray(render(i), np.float32)
        d = root / f"track_{i:04d}"
        d.mkdir(exist_ok=True)
        for s, name in enumerate(STEM_NAMES):
            write_wav(d / f"{name}.wav", stems[s], args.sample_rate)
        if (i + 1) % 16 == 0 or i + 1 == args.n_songs:
            print(f"{i + 1}/{args.n_songs} songs written", flush=True)

    if args.n_styles:
        (root / "styles.json").write_text(json.dumps(
            {f"track_{i:04d}": i % args.n_styles
             for i in range(args.n_songs)}, indent=2))
    (root / "manifest.json").write_text(json.dumps({
        "n_tracks": args.n_songs, "sample_rate": args.sample_rate,
        "duration": args.duration, "synth_version": args.synth_version,
        "seed": args.seed, "peak": args.peak, "n_styles": args.n_styles,
    }, indent=2))
    print(json.dumps({"corpus": str(root), "n_songs": args.n_songs}))


if __name__ == "__main__":
    main()
