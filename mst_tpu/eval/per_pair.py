"""Per-pair TCN optimization (ref: inference/test_tcn_style_transfer.py).

Instead of a pretrained FiLM-conditioned TCN, optimize a *fresh* TCN per
(input, target) pair: N Adam steps minimizing
1 - cos(enc(TCN(input)), enc(target)), gradients flowing through the
feature extractor + frozen encoder (ref: :84-201; grad-mode embedding at
:44-58).  Identity init is asserted before optimizing (ref: :138-141);
"converged" = >=20% embedding-distance reduction (ref: :200).

The whole optimization loop runs as one jitted ``lax.scan`` over steps —
zero host round-trips per step, unlike the reference's per-step Python loop.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from mst_tpu.config import FeatureConfig, TCNConfig
from mst_tpu.features import extract_mixing_features
from mst_tpu.models import TCNMixer
from mst_tpu.models.tcn import stems_to_nlc, nlc_to_stems

CONVERGENCE_IMPROVEMENT = 0.20  # ref: test_tcn_style_transfer.py:200


def optimize_pair(
    enc_apply: Callable,
    fcfg: FeatureConfig,
    input_stems: jax.Array,
    target_stems: jax.Array,
    tcn_cfg: TCNConfig | None = None,
    num_steps: int = 200,
    learning_rate: float = 1e-3,
    rng: jax.Array | None = None,
    embed_fn: Callable | None = None,
):
    """Returns (output_stems, result dict with loss trajectory + distances).

    ``enc_apply(stems, feats) -> (B, D)`` is the frozen encoder forward.
    Pass ``embed_fn(stems) -> (B, D)`` instead to supply a fused embedding
    (e.g. ``pipeline.embed_stems`` sharing one mel between features and
    front-end).  Stems are (4, 2, T) single-pair arrays.
    """
    tcn_cfg = tcn_cfg or TCNConfig(
        hidden_channels=16, num_blocks=8, kernel_size=5, use_film=False
    )
    assert not tcn_cfg.use_film, "per-pair mode uses an unconditioned TCN"
    rng = rng if rng is not None else jax.random.key(0)

    tcn = TCNMixer(tcn_cfg)
    x = stems_to_nlc(input_stems[None])  # (1, T, 8)
    variables = tcn.init(rng, x)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    if embed_fn is not None:
        embed = embed_fn
    else:
        def embed(stems):
            feats = extract_mixing_features(stems, fcfg)
            return enc_apply(stems, feats)

    target_emb = jax.lax.stop_gradient(embed(target_stems[None]))
    input_emb = embed(input_stems[None])

    def cos_dist(a, b):
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
        b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-12)
        return 1.0 - jnp.sum(a * b, axis=-1)

    initial_distance = cos_dist(input_emb, target_emb)[0]

    # identity-init sanity (ref: :138-141): TCN output ~= input at init
    y0 = tcn.apply({"params": params, "batch_stats": batch_stats}, x, train=False)
    identity_err = jnp.max(jnp.abs(y0 - x)) / (jnp.max(jnp.abs(x)) + 1e-9)

    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)

    def loss_fn(p, bs):
        out, updates = tcn.apply(
            {"params": p, "batch_stats": bs}, x, train=True,
            rngs={"dropout": rng}, mutable=["batch_stats"],
        )
        out_emb = embed(nlc_to_stems(out))
        return cos_dist(out_emb, target_emb)[0], updates["batch_stats"]

    def step(carry, _):
        p, bs, opt = carry
        (loss, new_bs), g = jax.value_and_grad(loss_fn, has_aux=True)(p, bs)
        upd, opt = tx.update(g, opt, p)
        p = optax.apply_updates(p, upd)
        return (p, new_bs, opt), loss

    @jax.jit
    def run(params, batch_stats, opt_state):
        (p, bs, _), losses = jax.lax.scan(
            step, (params, batch_stats, opt_state), None, length=num_steps
        )
        out = tcn.apply({"params": p, "batch_stats": bs}, x, train=False)
        return out, losses

    out, losses = run(params, batch_stats, opt_state)
    out_stems = nlc_to_stems(out)[0]

    final_distance = cos_dist(embed(out_stems[None]), target_emb)[0]
    improvement = (initial_distance - final_distance) / jnp.maximum(
        initial_distance, 1e-8
    )
    return out_stems, {
        "losses": losses,
        "initial_distance": float(initial_distance),
        "final_distance": float(final_distance),
        "improvement": float(improvement),
        "converged": bool(improvement >= CONVERGENCE_IMPROVEMENT),
        "identity_init_error": float(identity_err),
    }
