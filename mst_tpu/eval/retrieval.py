"""Retrieval validation utilities (ref: src/validation_utils.py).

Embedding caches keep the reference's logical format
{embeddings (N, D), track_indices, track_paths} (ref:
validation_utils.py:206-213) but persist as .npz.  Retrieval is one
device-side cosine matmul over the whole pool instead of the reference's
per-query loop (ref: validation_utils.py:217-240).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from mst_tpu.config import FeatureConfig
from mst_tpu.features import extract_mixing_features


def compute_embeddings(enc, variables, stems_batch, fcfg: FeatureConfig,
                       batch_size: int = 8) -> np.ndarray:
    """Embed (N, 4, 2, T) stems -> (N, D), batched through one jitted fn."""

    from mst_tpu.pipeline import embed_stems

    @jax.jit
    def embed(stems):
        return embed_stems(enc, variables, stems, fcfg)

    out = []
    for i in range(0, stems_batch.shape[0], batch_size):
        out.append(np.asarray(embed(jnp.asarray(stems_batch[i : i + batch_size]))))
    return np.concatenate(out, axis=0)


def build_embedding_cache(enc, variables, dataset, indices, fcfg: FeatureConfig,
                          segment: str = "first", clip_duration: float = 10.0,
                          batch_size: int = 8) -> dict:
    """Embed one segment per track (ref: validation_utils.py:151-214).

    ``segment``: 'first' (pool) or 'last' (queries) 10 s of each track
    (ref: validate_retrieval.py:92-150).

    Streams: tracks are embedded ``batch_size`` at a time and only the
    (N, D) embeddings accumulate on the host — host RSS stays bounded by
    one batch of stems regardless of corpus size (a few thousand
    materialized (4, 2, 441000) clips would OOM a small host)."""
    from mst_tpu.data.datasets import load_stems
    from mst_tpu.pipeline import embed_stems

    @jax.jit
    def embed(stems):
        return embed_stems(enc, variables, stems, fcfg)

    pending: list[np.ndarray] = []
    emb_chunks: list[np.ndarray] = []

    def flush():
        if not pending:
            return
        batch = np.stack(pending)
        pad = batch_size - batch.shape[0]
        if pad:  # pad the trailing partial batch: one compiled batch shape
            batch = np.concatenate(
                [batch, np.zeros((pad,) + batch.shape[1:], np.float32)])
        emb_chunks.append(np.asarray(embed(jnp.asarray(batch)))[: len(pending)])
        pending.clear()

    track_dirs = getattr(dataset, "track_dirs", None)
    track_indices, track_paths = [], []
    n = int(clip_duration * dataset.sr)
    for idx in indices:
        try:
            if track_dirs is not None:
                # deterministic protocol: slice the FULL track's first/last
                # clip_duration seconds (ref: validate_retrieval.py:104-112).
                # Going through dataset[idx] would yield a *random crop*,
                # making 'first' vs 'last' a no-op and the cache
                # nondeterministic.
                stems = load_stems(track_dirs[int(idx)], dataset.sr)
            else:
                item = dataset[int(idx)]
                stems = item["stems"] if isinstance(item, dict) else item[0]
                if stems.ndim == 4:  # (num_segments, 4, 2, T)
                    stems = stems[0]
        except Exception as e:  # per-item tolerance (ref: 177-203)
            print(f"[embedding_cache] skipping {idx}: {e}")
            continue
        if stems.shape[-1] >= n:
            stems = stems[..., :n] if segment == "first" else stems[..., -n:]
        else:
            pad = np.zeros(stems.shape[:-1] + (n,), np.float32)
            pad[..., : stems.shape[-1]] = stems
            stems = pad
        pending.append(np.ascontiguousarray(stems))
        track_indices.append(int(idx))
        track_paths.append(
            str(track_dirs[int(idx)]) if track_dirs is not None else "?"
        )
        if len(pending) == batch_size:
            flush()
    flush()
    embs = (np.concatenate(emb_chunks, axis=0) if emb_chunks
            else np.zeros((0, enc.cfg.embed_dim), np.float32))
    return {
        "embeddings": embs,
        "track_indices": np.asarray(track_indices),
        "track_paths": track_paths,
    }


def compute_track_embedding(enc, variables, stems: np.ndarray,
                            fcfg: FeatureConfig, clip_duration: float = 10.0,
                            sample_rate: int = 44100, max_segments: int = 8,
                            batch_size: int = 8) -> np.ndarray:
    """Track-level embedding: mean of consecutive non-overlapping segment
    embeddings (ref: validation_utils.py:106-148).  stems (4, 2, T) -> (D,)."""
    n = int(clip_duration * sample_rate)
    T = stems.shape[-1]
    n_seg = min(max(T // n, 1), max_segments)
    segs = []
    for i in range(n_seg):
        seg = stems[..., i * n : i * n + n]
        if seg.shape[-1] < n:
            pad = np.zeros(stems.shape[:-1] + (n,), np.float32)
            pad[..., : seg.shape[-1]] = seg
            seg = pad
        segs.append(seg)
    embs = compute_embeddings(enc, variables, np.stack(segs), fcfg, batch_size)
    return embs.mean(axis=0)


def retrieve_top_k(query_embs: np.ndarray, pool_embs: np.ndarray, k: int = 5):
    """Cosine top-k for every query: returns (indices (Q, k), sims (Q, k))."""
    q = query_embs / (np.linalg.norm(query_embs, axis=1, keepdims=True) + 1e-12)
    p = pool_embs / (np.linalg.norm(pool_embs, axis=1, keepdims=True) + 1e-12)
    sims = q @ p.T
    top = np.argsort(-sims, axis=1)[:, :k]
    return top, np.take_along_axis(sims, top, axis=1)


def evaluate_retrieval_accuracy(
    query_embs: np.ndarray,
    query_track_idx: np.ndarray,
    pool_embs: np.ndarray,
    pool_track_idx: np.ndarray,
    ks=(1, 5),
) -> dict:
    """Top-k hit rate: query's own track found among the k nearest pool
    entries (ref: validation_utils.py:243-282)."""
    top, _ = retrieve_top_k(query_embs, pool_embs, k=max(ks))
    retrieved = np.asarray(pool_track_idx)[top]  # (Q, kmax)
    out = {}
    for k in ks:
        hits = (retrieved[:, :k] == np.asarray(query_track_idx)[:, None]).any(axis=1)
        out[f"top{k}_accuracy"] = float(hits.mean())
    out["num_queries"] = int(len(query_embs))
    return out


def save_embedding_cache(path: str | Path, cache: dict) -> None:
    np.savez(
        path,
        embeddings=cache["embeddings"],
        track_indices=cache["track_indices"],
        track_paths=np.asarray(cache["track_paths"], dtype=object),
    )


def load_embedding_cache(path: str | Path) -> dict:
    z = np.load(path, allow_pickle=True)
    return {
        "embeddings": z["embeddings"],
        "track_indices": z["track_indices"],
        "track_paths": list(z["track_paths"]),
    }
