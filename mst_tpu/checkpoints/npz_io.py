"""Flat .npz parameter snapshots (repo-committable trained artifacts).

Orbax directories (orbax_io.py) are the training-time format; for shipping a
small trained model *inside* the repository (e.g. the demonstration SCNet
checkpoint) a single compressed .npz with '/'-joined pytree paths is easier
to version and diff.  Equivalent role to the reference's single-file
torch.save checkpoints (ref: src/train.py:34-51)."""

from __future__ import annotations

from pathlib import Path

import numpy as np
from flax import traverse_util


def save_params_npz(path: str | Path, params, dtype=None) -> Path:
    """Save a params pytree to one compressed npz. ``dtype`` optionally
    downcasts (e.g. np.float16 halves the artifact; callers must validate
    the quality impact themselves)."""
    flat = traverse_util.flatten_dict(params, sep="/")
    arrays = {}
    for k, v in flat.items():
        a = np.asarray(v)
        if dtype is not None and np.issubdtype(a.dtype, np.floating):
            a = a.astype(dtype)
        arrays[k] = a
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **arrays)
    return path


def load_params_npz(path: str | Path, dtype=np.float32):
    """Load a params pytree saved by :func:`save_params_npz`."""
    with np.load(Path(path)) as z:
        flat = {
            k: (z[k].astype(dtype) if np.issubdtype(z[k].dtype, np.floating) else z[k])
            for k in z.files
        }
    return traverse_util.unflatten_dict(flat, sep="/")
