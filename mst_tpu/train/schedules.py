"""LR schedules matching the reference trainers.

Stage 1 (ref: src/train.py:629-644): per-step LambdaLR with linear warmup
over 2000 steps then cosine decay to 0 across the remaining steps.
Style transfer (ref: train_style_transfer.py:602-612): CosineAnnealingLR.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def warmup_cosine_schedule(
    peak_lr: float, total_steps: int, warmup_steps: int = 2000
) -> optax.Schedule:
    def schedule(step):
        warm = peak_lr * jnp.minimum(step, warmup_steps) / jnp.maximum(warmup_steps, 1)
        progress = jnp.clip(
            (step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1), 0.0, 1.0
        )
        cos = peak_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def cosine_schedule(peak_lr: float, total_steps: int, eta_min: float = 0.0) -> optax.Schedule:
    def schedule(step):
        progress = jnp.clip(step / jnp.maximum(total_steps, 1), 0.0, 1.0)
        return eta_min + (peak_lr - eta_min) * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))

    return schedule
