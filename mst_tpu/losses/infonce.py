"""Contrastive losses, vectorized (ref: src/loss.py:10-187).

The reference computes the per-anchor InfoNCE in a Python loop over the
batch (loss.py:110-124).  Here it is one (N, N) matmul + masked reductions —
a single MXU call — with identical semantics:

  - L2-normalize embeddings
  - sim = E E^T / temperature, row-max subtracted, exponentiated
  - positives: same song label, diagonal excluded
  - per anchor with >=1 positive: -log(pos_sum / (pos_sum + neg_sum + 1e-8))
  - mean over anchors that have positives

For batch sharding across chips, pass ``axis_name`` and per-shard
embeddings/labels: the function all-gathers both over the mesh axis so every
chip computes the loss over the *global* batch (SURVEY.md §2.4 — this is the
collective the reference never had).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def info_nce_loss(
    embeddings: jax.Array,
    song_labels: jax.Array,
    temperature: float = 0.1,
    axis_name: str | None = None,
) -> jax.Array:
    e = embeddings / jnp.maximum(
        jnp.linalg.norm(embeddings, axis=1, keepdims=True), 1e-12
    )
    n_local = e.shape[0]

    if axis_name is not None:
        # Local anchors vs global keys: all-gather the key side over ICI,
        # compute the (n_local, n_global) block, psum the reductions.
        # Equivalent to the full global (N, N) loss but each chip only does
        # its own row block.
        e_keys = jax.lax.all_gather(e, axis_name, tiled=True)
        key_labels = jax.lax.all_gather(song_labels, axis_name, tiled=True)
        offset = jax.lax.axis_index(axis_name) * n_local
        self_idx = jnp.arange(n_local) + offset
    else:
        e_keys = e
        key_labels = song_labels
        self_idx = jnp.arange(n_local)

    sim = (e @ e_keys.T) / temperature  # (n_local, n_global)
    same = song_labels[:, None] == key_labels[None, :]
    diag = jnp.arange(e_keys.shape[0])[None, :] == self_idx[:, None]
    pos_mask = (same & ~diag).astype(sim.dtype)
    neg_mask = (~same & ~diag).astype(sim.dtype)

    sim = sim - jax.lax.stop_gradient(jnp.max(sim, axis=1, keepdims=True))
    ex = jnp.exp(sim)
    pos_sum = jnp.sum(ex * pos_mask, axis=1)
    neg_sum = jnp.sum(ex * neg_mask, axis=1)

    has_pos = jnp.sum(pos_mask, axis=1) > 0
    # where-grad trap: -log(0) for positive-less anchors would produce NaN
    # cotangents even though the forward masks them, so substitute a safe
    # numerator BEFORE the log (the reference's Python loop skips them).
    safe_pos = jnp.where(has_pos, pos_sum, 1.0)
    per_anchor = -jnp.log(safe_pos / (safe_pos + neg_sum + 1e-8))
    per_anchor = jnp.where(has_pos, per_anchor, 0.0)
    loss_sum = jnp.sum(per_anchor)
    n_valid = jnp.sum(has_pos)
    if axis_name is not None:
        loss_sum = jax.lax.psum(loss_sum, axis_name)
        n_valid = jax.lax.psum(n_valid, axis_name)
    return loss_sum / jnp.maximum(n_valid, 1)


def nt_xent_loss(z_i: jax.Array, z_j: jax.Array, temperature: float = 0.1) -> jax.Array:
    """SimCLR NT-Xent over two views (ref: loss.py:139-187)."""
    b = z_i.shape[0]
    z = jnp.concatenate([z_i, z_j], axis=0)
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=1, keepdims=True), 1e-12)
    sim = (z @ z.T) / temperature
    sim = jnp.where(jnp.eye(2 * b, dtype=bool), -1e9, sim)
    labels = jnp.concatenate([jnp.arange(b) + b, jnp.arange(b)])
    logp = jax.nn.log_softmax(sim, axis=1)
    return -jnp.mean(logp[jnp.arange(2 * b), labels])
