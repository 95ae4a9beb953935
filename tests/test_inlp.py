"""INLP identity removal: kills linear song-ID decodability, keeps style.

Synthetic geometry mirrors the style-pool corpus protocol
(scripts/run_adversarial_demo.sh): identity lives in a low-rank subspace
partially overlapping the style directions; removal must push the ridge
probe (eval/probe.py) toward chance while nearest-neighbor style matching
survives."""

import json

import numpy as np

from mst_tpu.eval.inlp import apply_projection, fit_identity_nullspace
from mst_tpu.eval.probe import song_identity_probe

N_SONGS, N_STYLES, D, ID_RANK = 64, 16, 128, 32


def _corpus(seed=0):
    rng = np.random.default_rng(seed)
    styles = np.arange(N_SONGS) % N_STYLES
    style_dirs = rng.standard_normal((N_STYLES, D))
    style_dirs /= np.linalg.norm(style_dirs, axis=1, keepdims=True)
    # identity variation confined to an ID_RANK-dim subspace
    basis = np.linalg.qr(rng.standard_normal((D, ID_RANK)))[0]
    id_dirs = rng.standard_normal((N_SONGS, ID_RANK)) @ basis.T
    id_dirs /= np.linalg.norm(id_dirs, axis=1, keepdims=True)
    song_id = rng.standard_normal((N_SONGS, 96))

    def crop():
        return (style_dirs[styles] + 0.8 * id_dirs
                + 0.05 * rng.standard_normal((N_SONGS, D)))

    return crop(), crop(), song_id.astype(np.float32), styles


def _style_match(q, pool, labels):
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    p = pool / np.maximum(np.linalg.norm(pool, axis=1, keepdims=True), 1e-12)
    sims = q @ p.T
    np.fill_diagonal(sims, -np.inf)
    return float((labels[np.argmax(sims, axis=1)] == labels).mean())


def test_inlp_removes_identity_keeps_style():
    emb_a, emb_b, song_id, styles = _corpus()
    before = song_identity_probe(emb_a, emb_b, song_id)
    assert before["probe_id_top1"] > 0.9  # identity starts decodable

    proj, history = fit_identity_nullspace(
        emb_a, song_id, rounds=6, rank=8, emb_val=emb_b)
    pa, pb = apply_projection(emb_a, proj), apply_projection(emb_b, proj)
    after = song_identity_probe(pa, pb, song_id)

    assert after["probe_id_top1"] < 0.3, after
    assert after["probe_cosine"] < 0.5 * before["probe_cosine"]
    # style structure survives the projection
    assert _style_match(pa, pb, styles) > 0.5
    # history tracks held-out leakage per round, monotone-ish to the end
    assert len(history) == 6
    assert history[-1]["probe_id_top1"] == after["probe_id_top1"]
    assert history[-1]["removed_dims"] == 48


def test_projection_is_exact():
    emb_a, _, song_id, _ = _corpus(1)
    proj, _ = fit_identity_nullspace(emb_a, song_id, rounds=3, rank=4)
    np.testing.assert_allclose(proj @ proj, proj, atol=1e-10)
    np.testing.assert_allclose(proj, proj.T, atol=1e-10)
    # removed exactly rounds*rank dimensions
    assert int(round(np.trace(proj))) == D - 12
