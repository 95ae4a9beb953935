"""Song-identity predictability probe.

Measures how much *song identity* (content) information a mixing-style
embedding retains — the quantity the adversarial GRL objective exists to
minimize (ref: src/train.py:130-204 adversarial loss; src/grl.py:16-96;
src/model.py:545-587 discriminator predicting the 512-d VINet song-ID
embedding).  The reference never evaluates whether the removal *worked*;
this probe does, reference-style but stronger than the train-time
discriminator because it is fit fresh, in closed form, on the frozen
embeddings:

1. embed one crop per track (probe-train) and a disjoint crop (probe-val);
2. ridge-regress mixing embedding -> song-ID embedding on the train crops;
3. report, on the val crops,
   - ``probe_cosine``: mean cosine(prediction, true song-ID embedding);
   - ``probe_id_top1``: accuracy of identifying the song by nearest
     song-ID-cache row from the prediction (chance = 1/n_tracks).

Adversarial training should push both toward chance while same-song style
retrieval holds.
"""

from __future__ import annotations

import numpy as np

__all__ = ["fit_ridge", "apply_ridge", "song_identity_probe"]


def _augment(x: np.ndarray) -> np.ndarray:
    return np.concatenate([x, np.ones((x.shape[0], 1), x.dtype)], axis=1)


def fit_ridge(x: np.ndarray, y: np.ndarray, l2: float = 1.0) -> np.ndarray:
    """Closed-form ridge with bias: (N, D), (N, K) -> W (D+1, K) minimizing
    ||[x 1] W - y||^2 + l2 ||W||^2."""
    xa = _augment(np.asarray(x, np.float64))
    a = xa.T @ xa + l2 * np.eye(xa.shape[1])
    return np.linalg.solve(a, xa.T @ np.asarray(y, np.float64))


def apply_ridge(w: np.ndarray, x: np.ndarray) -> np.ndarray:
    return _augment(np.asarray(x, np.float64)) @ w


def _mean_cosine(a: np.ndarray, b: np.ndarray) -> float:
    na = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    return float(np.mean(np.sum(a * b, axis=1) / np.maximum(na, 1e-12)))


def song_identity_probe(
    emb_train: np.ndarray,
    emb_val: np.ndarray,
    song_id: np.ndarray,
    l2: float = 1.0,
) -> dict:
    """emb_train/emb_val: (N, D) mixing embeddings of two disjoint crops of
    the same N tracks (row i = track i); song_id: (N, K) song-ID cache.
    Returns the probe metrics dict (see module docstring)."""
    w = fit_ridge(emb_train, song_id, l2)
    pred = apply_ridge(w, emb_val)
    sid = np.asarray(song_id, np.float64)
    # nearest cache row by cosine = identification
    p = pred / np.maximum(np.linalg.norm(pred, axis=1, keepdims=True), 1e-12)
    s = sid / np.maximum(np.linalg.norm(sid, axis=1, keepdims=True), 1e-12)
    nearest = np.argmax(p @ s.T, axis=1)
    n = len(sid)
    return {
        "probe_cosine": _mean_cosine(pred, sid),
        "probe_id_top1": float(np.mean(nearest == np.arange(n))),
        "chance_id_top1": 1.0 / n,
        "n_tracks": n,
        "l2": float(l2),
    }
