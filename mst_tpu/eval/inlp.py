"""Post-hoc song-identity removal: iterative null-space projection.

The reference's only identity-removal mechanism is the in-training
GRL/discriminator game (ref: src/train.py:130-204, src/grl.py:16-96) —
adversarial, schedule-sensitive, and never evaluated for whether the
removal worked.  This module adds a closed-form alternative that operates
on a FROZEN encoder: iteratively fit the same ridge read-out the leakage
probe uses (eval/probe.py), take its ``rank`` most predictive directions
in embedding space (top left-singular vectors of the weight matrix), and
project the embedding onto their orthogonal complement.  Because probe
and removal are both linear, each round directly reduces the probe's fit;
rank control matters because the song-ID targets have >= as many
dimensions as the embedding — one unconstrained round would null the
entire space.

All GEMM/QR/SVD on (N, 512)/(512, 512) matrices — instant in host NumPy
float64; the encoder forward that produces the embeddings is the TPU part.
"""

from __future__ import annotations

import numpy as np

from mst_tpu.eval.probe import fit_ridge, song_identity_probe

__all__ = ["fit_identity_nullspace", "apply_projection"]


def apply_projection(emb: np.ndarray, p: np.ndarray) -> np.ndarray:
    """(N, D) @ (D, D) in float64 (matches the probe's closed forms)."""
    return np.asarray(emb, np.float64) @ np.asarray(p, np.float64)


def fit_identity_nullspace(
    emb: np.ndarray,
    song_id: np.ndarray,
    rounds: int = 6,
    rank: int = 8,
    l2: float = 1.0,
    emb_val: np.ndarray | None = None,
) -> tuple[np.ndarray, list[dict]]:
    """Fit a (D, D) orthogonal projection removing the linearly
    song-ID-predictive subspace of ``emb``.

    Each round: ridge-fit ``emb @ P -> song_id``, accumulate the read-out's
    top-``rank`` embedding-space directions into an orthonormal basis B
    (QR re-orthogonalized so P = I - B B^T stays an exact projection),
    and continue on the projected embeddings.

    Returns ``(P, history)`` where history[r] holds the leakage-probe
    metrics after r+1 rounds — measured on ``emb_val`` crops when given
    (fit-on-A / eval-on-B, the probe protocol), else on the fit crops.
    """
    x0 = np.asarray(emb, np.float64)
    y = np.asarray(song_id, np.float64)
    d = x0.shape[1]
    basis = np.zeros((d, 0))
    history: list[dict] = []
    for _ in range(rounds):
        p = np.eye(d) - basis @ basis.T
        w = fit_ridge(x0 @ p, y, l2)[:-1]  # drop the bias row -> (D, K)
        u = np.linalg.svd(w, full_matrices=False)[0][:, :rank]
        basis = np.linalg.qr(np.concatenate([basis, u], axis=1))[0]
        p = np.eye(d) - basis @ basis.T
        va = x0 @ p
        vb = (np.asarray(emb_val, np.float64) @ p
              if emb_val is not None else va)
        m = song_identity_probe(va, vb, y, l2)
        m["removed_dims"] = int(basis.shape[1])
        history.append(m)
    return np.eye(d) - basis @ basis.T, history
