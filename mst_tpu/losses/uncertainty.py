"""Uncertainty-weighted MSE over feature groups (ref: src/loss.py:190-329).

Kendall-style multi-task weighting: sum_g MSE_g / (2 sigma_g^2) + log sigma_g
with learnable log-sigma per group.

NOTE: the reference's group index layout (loss.py:249-255) assumes features
are grouped family-by-family (all dynamics, then all spectral, ...), which
does NOT match the actual sorted-key flattening in mixing_utils.py:320-335 —
a latent bug SURVEY.md §2.1 flags.  Here the group slices are derived from
the real FEATURE_ORDER, fixing it.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mst_tpu.config import FeatureConfig
from mst_tpu.features.mixing_features import FEATURE_ORDER


def feature_group_slices(cfg: FeatureConfig | None = None) -> dict[str, list[int]]:
    """Indices of each feature family in the actual flattened layout."""
    cfg = cfg or FeatureConfig()
    sizes = {
        "dynamics": cfg.dynamics_dim,
        "rel_loudness": 1,
        "spectral": cfg.spectral_dim,
        "stereo": cfg.stereo_dim,
        "masking": 4,
    }
    groups: dict[str, list[int]] = {
        "dynamics": [], "spectral": [], "stereo": [], "global": []
    }
    pos = 0
    for key in FEATURE_ORDER:
        fam = "masking" if key == "masking" else key.split("_", 1)[1]
        n = sizes[fam]
        idx = list(range(pos, pos + n))
        if fam in ("dynamics", "spectral", "stereo"):
            groups[fam] += idx
        else:  # rel_loudness + masking = 'global' relational features
            groups["global"] += idx
        pos += n
    return groups


class UncertaintyWeightedMSE(nn.Module):
    """4-group uncertainty-weighted MSE with learnable log-sigmas."""

    cfg: FeatureConfig | None = None

    @nn.compact
    def __call__(self, pred: jax.Array, target: jax.Array):
        groups = feature_group_slices(self.cfg)
        log_sigma = self.param(
            "log_sigma", nn.initializers.zeros, (len(groups),)
        )
        sigma = jnp.exp(log_sigma)
        total = 0.0
        aux = {}
        for g, (name, idx) in enumerate(groups.items()):
            ind = jnp.asarray(idx)
            mse = jnp.mean((pred[..., ind] - target[..., ind]) ** 2)
            weighted = mse / (2.0 * sigma[g] ** 2) + log_sigma[g]
            total = total + weighted
            aux[f"{name}_mse"] = mse
            aux[f"{name}_sigma"] = sigma[g]
        return total, aux
