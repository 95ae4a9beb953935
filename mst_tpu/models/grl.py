"""Gradient reversal + adversarial schedules (ref: src/grl.py).

The reference implements GRL as a torch autograd.Function (grl.py:16-56);
the JAX-native form is a ``custom_vjp`` identity whose cotangent is
``-lambda * g``.  ``lambda`` may be a traced scalar so the DANN schedule can
be computed inside the jitted train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def gradient_reversal(x: jax.Array, lam) -> jax.Array:
    """Identity forward; backward multiplies the gradient by ``-lam``."""
    return x


def _grl_fwd(x, lam):
    return x, lam


def _grl_bwd(lam, g):
    return (-lam * g, None)


gradient_reversal.defvjp(_grl_fwd, _grl_bwd)


def compute_grl_lambda(current_step, total_steps, warmup_steps: int = 2000):
    """DANN schedule: 0 during warmup, then 2/(1+e^{-10 p}) - 1
    (ref: grl.py:98-129).  Accepts traced step values."""
    progress = jnp.clip(
        (current_step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1),
        0.0,
        1.0,
    )
    lam = 2.0 / (1.0 + jnp.exp(-10.0 * progress)) - 1.0
    return jnp.where(current_step < warmup_steps, 0.0, lam)


def compute_adversarial_lambda(
    current_step, total_steps, warmup_steps, initial_lambda, final_lambda
):
    """Linear ramp from initial to final after warmup (ref: grl.py:132-164)."""
    progress = jnp.clip(
        (current_step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1),
        0.0,
        1.0,
    )
    lam = initial_lambda + (final_lambda - initial_lambda) * progress
    return jnp.where(current_step < warmup_steps, initial_lambda, lam)
