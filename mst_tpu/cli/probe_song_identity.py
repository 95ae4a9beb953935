"""Song-identity leakage probe over a separated-stems corpus.

Quantifies whether adversarial training (``cli/train --use_adversarial``,
ref: src/train.py:130-204 + src/grl.py) actually removed song-identity
information from the mixing-style embedding — the evaluation the reference
lacks.  Protocol (eval/probe.py): embed two disjoint crops per track with
the frozen encoder, ridge-regress crop-A embeddings onto the song-ID cache
(``cli/extract_song_identity`` output, ref cache layout:
scripts/extract_song_identity_embeddings.py:241-248), report held-out-crop
prediction cosine and nearest-cache-row identification accuracy — plus
same-song style retrieval (crop A query vs crop B pool, the ref protocol
validate_retrieval.py:92-150) to show the *style* signal survives.

    python -m mst_tpu.cli.probe_song_identity \
        --encoder_npz artifacts/encoder_adv_demo.npz \
        --separated_path /data/synth2 --song_id_cache /data/songid.npz \
        --output probe_metrics.json
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def get_params(argv=None):
    p = argparse.ArgumentParser(description="Song-identity leakage probe")
    p.add_argument("--encoder_npz", type=str, required=True,
                   help="trained encoder artifact (+ sibling .json config)")
    p.add_argument("--separated_path", type=str, required=True)
    p.add_argument("--song_id_cache", type=str, required=True,
                   help=".npz/.pt song-ID cache (cli/extract_song_identity)")
    p.add_argument("--styles_json", type=str, default=None,
                   help="styles.json from make_synth_corpus --n_styles: "
                        "adds style-aware retrieval metrics (nearest "
                        "OTHER-track neighbor shares the style), the "
                        "signal that must survive identity removal")
    p.add_argument("--projection_npz", type=str, default=None,
                   help="identity null-space projection from "
                        "cli/remove_song_identity, applied to both crops "
                        "before all metrics")
    p.add_argument("--l2", type=float, default=1.0)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--matmul_precision", choices=("default", "highest"),
                   default="highest",
                   help="'highest' matches artifacts trained for platform-"
                        "portable evaluation")
    return p.parse_args(argv)


def _embed_corpus(args, enc, enc_vars, ecfg, fcfg, track_dirs):
    """(emb_a, emb_b): embeddings of the first and last clip window of each
    track (disjoint when the track is >= 2 clips long)."""
    import jax

    from mst_tpu.data.datasets import load_stems
    from mst_tpu.pipeline import embed_stems

    n = ecfg.audio.clip_samples

    @jax.jit
    def embed(stems):
        return embed_stems(enc, enc_vars, stems, fcfg)

    crops_a, crops_b = [], []
    for d in track_dirs:
        stems = load_stems(d, ecfg.audio.sample_rate)  # (4, 2, T)
        if stems.shape[-1] < 2 * n:
            pad = np.zeros((4, 2, max(2 * n, stems.shape[-1])), np.float32)
            pad[..., : stems.shape[-1]] = stems
            stems = pad
        crops_a.append(stems[..., :n])
        crops_b.append(stems[..., -n:])

    def run(crops):
        out = []
        b = args.batch_size
        for i in range(0, len(crops), b):
            chunk = np.stack(crops[i:i + b])
            if len(chunk) < b:  # pad to one compiled shape
                chunk = np.concatenate(
                    [chunk, np.zeros((b - len(chunk), *chunk.shape[1:]),
                                     np.float32)])
            out.append(np.asarray(embed(chunk), np.float32))
        return np.concatenate(out)[: len(crops)]

    return run(crops_a), run(crops_b)


def _style_top1(q: np.ndarray, pool: np.ndarray) -> float:
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    p = pool / np.maximum(np.linalg.norm(pool, axis=1, keepdims=True), 1e-12)
    return float((np.argmax(q @ p.T, axis=1) == np.arange(len(q))).mean())


def _style_match_excl_self(q: np.ndarray, pool: np.ndarray,
                           labels: np.ndarray) -> dict:
    """Nearest OTHER-track crop-B neighbor shares the query's style label.
    Content-free by construction (the same track is masked out), so this is
    the style signal that must survive adversarial identity removal."""
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    p = pool / np.maximum(np.linalg.norm(pool, axis=1, keepdims=True), 1e-12)
    sims = q @ p.T
    np.fill_diagonal(sims, -np.inf)
    hit = labels[np.argmax(sims, axis=1)] == labels
    n = len(labels)
    cluster = np.array([(labels == l).sum() for l in labels])
    return {
        "style_match_top1_excl_self": float(hit.mean()),
        "style_match_chance": float(((cluster - 1) / (n - 1)).mean()),
        "style_cluster_id_ceiling": float((1.0 / cluster).mean()),
    }


def main(argv=None):
    args = get_params(argv)
    import jax

    from mst_tpu.cli.train import load_song_id_cache
    from mst_tpu.cli.train_style_transfer import _encoder_from_npz
    from mst_tpu.data.datasets import find_stem_dirs
    from mst_tpu.eval.probe import song_identity_probe

    with jax.default_matmul_precision(
            "highest" if args.matmul_precision == "highest" else "bfloat16"):
        enc, enc_vars, ecfg, fcfg = _encoder_from_npz(args.encoder_npz)
        track_dirs = find_stem_dirs(args.separated_path)

        emb, cache_paths = load_song_id_cache(args.song_id_cache)
        path_to_row = {p: i for i, p in enumerate(cache_paths)}
        rows = [path_to_row.get(str(d)) for d in track_dirs]
        keep = [i for i, r in enumerate(rows) if r is not None]
        if len(keep) < len(track_dirs):
            print(f"WARNING: {len(track_dirs) - len(keep)} tracks missing "
                  "from the song-ID cache — skipped")
        track_dirs = [track_dirs[i] for i in keep]
        song_id = emb[[rows[i] for i in keep]]

        emb_a, emb_b = _embed_corpus(args, enc, enc_vars, ecfg, fcfg,
                                     track_dirs)

    if args.projection_npz:
        from mst_tpu.eval.inlp import apply_projection
        proj = np.load(args.projection_npz)["projection"]
        emb_a = apply_projection(emb_a, proj).astype(np.float32)
        emb_b = apply_projection(emb_b, proj).astype(np.float32)

    metrics = song_identity_probe(emb_a, emb_b, song_id, args.l2)
    metrics["style_retrieval_top1"] = _style_top1(emb_a, emb_b)
    if args.styles_json:
        styles = json.loads(Path(args.styles_json).read_text())
        labels = np.array([styles[Path(d).name] for d in track_dirs])
        metrics.update(_style_match_excl_self(emb_a, emb_b, labels))
    metrics["encoder_npz"] = str(args.encoder_npz)
    metrics["song_id_cache"] = str(args.song_id_cache)
    if args.projection_npz:
        metrics["projection_npz"] = str(args.projection_npz)

    if args.output:
        Path(args.output).write_text(json.dumps(metrics, indent=2))
    print(json.dumps(metrics))
    return metrics


if __name__ == "__main__":
    main()
