"""Per-pair TCN optimization (ref: inference/test_tcn_style_transfer.py).

Instead of a pretrained FiLM-conditioned TCN, optimize a *fresh* TCN per
(input, target) pair: N Adam steps minimizing
1 - cos(enc(TCN(input)), enc(target)), gradients flowing through the
feature extractor + frozen encoder (ref: :84-201; grad-mode embedding at
:44-58).  Identity init is asserted before optimizing (ref: :138-141);
"converged" = >=20% embedding-distance reduction (ref: :200).

Each optimization runs as one jitted ``lax.scan`` over steps — zero host
round-trips per step, unlike the reference's per-step Python loop — and
``optimize_pairs`` vmaps P independent pair optimizations into ONE program
whose pair axis shards over the mesh 'data' axis: a pod runs P pairs
concurrently where the reference's grid search runs them serially for
30-50 h (ref: scripts/run_grid_search.sh:20-27).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mst_tpu.config import FeatureConfig, TCNConfig
from mst_tpu.features import extract_mixing_features
from mst_tpu.models import TCNMixer
from mst_tpu.models.tcn import stems_to_nlc, nlc_to_stems

CONVERGENCE_IMPROVEMENT = 0.20  # ref: test_tcn_style_transfer.py:200


def _cos_dist(a: jax.Array, b: jax.Array) -> jax.Array:
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-12)
    return 1.0 - jnp.sum(a * b, axis=-1)


def _make_tx(optimizer: str, learning_rate: float) -> optax.GradientTransformation:
    """Per-pair optimizers matching the ref grid (grid_search_tcn.py:205-211)."""
    if optimizer == "adam":
        return optax.adam(learning_rate)
    if optimizer == "adamw":
        return optax.adamw(learning_rate)
    raise ValueError(f"unknown optimizer {optimizer!r} (adam|adamw)")


def optimize_pairs(
    enc_apply: Callable | None,
    fcfg: FeatureConfig,
    input_stems: jax.Array,
    target_stems: jax.Array,
    tcn_cfg: TCNConfig | None = None,
    num_steps: int = 200,
    learning_rate: float = 1e-3,
    rng: jax.Array | None = None,
    embed_fn: Callable | None = None,
    optimizer: str = "adam",
    mesh=None,
):
    """P independent per-pair optimizations as one vmapped (+sharded) program.

    ``input_stems``/``target_stems``: (P, 4, 2, T).  Every pair gets its own
    fresh TCN, optimizer state and dropout key; ``jax.vmap`` stacks the P
    scan loops, and with ``mesh`` the pair axis is sharded on 'data' so each
    chip optimizes only its local pairs (P is padded up to a mesh multiple
    internally; padding results are discarded).

    ``enc_apply(stems, feats) -> (B, D)`` is the frozen encoder forward.
    Pass ``embed_fn(stems) -> (B, D)`` instead to supply a fused embedding
    (e.g. ``pipeline.embed_stems`` sharing one mel between features and
    front-end).

    Returns ``(output_stems (P, 4, 2, T), results)`` where results holds
    per-pair numpy arrays: losses (P, num_steps), initial/final_distance,
    improvement, converged, identity_init_error.
    """
    tcn_cfg = tcn_cfg or TCNConfig(
        hidden_channels=16, num_blocks=8, kernel_size=5, use_film=False
    )
    assert not tcn_cfg.use_film, "per-pair mode uses an unconditioned TCN"
    rng = rng if rng is not None else jax.random.key(0)

    n_pairs = input_stems.shape[0]
    tcn = TCNMixer(tcn_cfg)
    tx = _make_tx(optimizer, learning_rate)

    if embed_fn is not None:
        embed = embed_fn
    else:
        def embed(stems):
            feats = extract_mixing_features(stems, fcfg)
            return enc_apply(stems, feats)

    def single(pair_rng, inp, tgt):
        x = stems_to_nlc(inp[None])  # (1, T, 8)
        variables = tcn.init(pair_rng, x)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = tx.init(params)

        target_emb = jax.lax.stop_gradient(embed(tgt[None]))
        initial_distance = _cos_dist(embed(inp[None]), target_emb)[0]

        # identity-init sanity (ref: :138-141): TCN output ~= input at init
        y0 = tcn.apply({"params": params, "batch_stats": batch_stats}, x,
                       train=False)
        identity_err = jnp.max(jnp.abs(y0 - x)) / (jnp.max(jnp.abs(x)) + 1e-9)

        def loss_fn(p, bs):
            out, updates = tcn.apply(
                {"params": p, "batch_stats": bs}, x, train=True,
                rngs={"dropout": pair_rng}, mutable=["batch_stats"],
            )
            return (_cos_dist(embed(nlc_to_stems(out)), target_emb)[0],
                    updates["batch_stats"])

        def step(carry, _):
            p, bs, opt = carry
            (loss, new_bs), g = jax.value_and_grad(loss_fn, has_aux=True)(p, bs)
            upd, opt = tx.update(g, opt, p)
            return (optax.apply_updates(p, upd), new_bs, opt), loss

        (p, bs, _), losses = jax.lax.scan(
            step, (params, batch_stats, opt_state), None, length=num_steps
        )
        out = tcn.apply({"params": p, "batch_stats": bs}, x, train=False)
        out_stems = nlc_to_stems(out)[0]
        final_distance = _cos_dist(embed(out_stems[None]), target_emb)[0]
        return out_stems, losses, initial_distance, final_distance, identity_err

    # pad the pair axis to a mesh multiple so P("data") shards evenly
    n_dev = int(mesh.devices.size) if mesh is not None else 1
    pad = (-n_pairs) % n_dev
    total = n_pairs + pad
    # fold_in by pair index (NOT split(rng, total)): pair i's key must not
    # depend on how much padding the mesh requires
    keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(jnp.arange(total))
    inp_all, tgt_all = input_stems, target_stems
    if pad:
        inp_all = jnp.concatenate(
            [inp_all, jnp.broadcast_to(inp_all[-1:], (pad,) + inp_all.shape[1:])])
        tgt_all = jnp.concatenate(
            [tgt_all, jnp.broadcast_to(tgt_all[-1:], (pad,) + tgt_all.shape[1:])])

    if mesh is None:
        run = jax.jit(jax.vmap(single))
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P

        data = NamedSharding(mesh, P("data"))
        # inputs may arrive committed under a different sharding (e.g.
        # slices of a batch-sharded array); re-place them explicitly so the
        # jit in_shardings never conflict
        keys, inp_all, tgt_all = (
            jax.device_put(x, data) for x in (keys, inp_all, tgt_all))
        run = jax.jit(jax.vmap(single), in_shardings=(data, data, data),
                      out_shardings=data)

    out_stems, losses, init_d, final_d, id_err = run(keys, inp_all, tgt_all)
    init_d = np.asarray(init_d[:n_pairs])
    final_d = np.asarray(final_d[:n_pairs])
    improvement = (init_d - final_d) / np.maximum(init_d, 1e-8)
    return np.asarray(out_stems[:n_pairs]), {
        "losses": np.asarray(losses[:n_pairs]),
        "initial_distance": init_d,
        "final_distance": final_d,
        "improvement": improvement,
        "converged": improvement >= CONVERGENCE_IMPROVEMENT,
        "identity_init_error": np.asarray(id_err[:n_pairs]),
    }


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
    optimizer: str = "adam",
):
    """Single-pair wrapper over ``optimize_pairs`` (stems are (4, 2, T)).

    Returns (output_stems, result dict with loss trajectory + distances).
    """
    rng = rng if rng is not None else jax.random.key(0)
    out, res = optimize_pairs(
        enc_apply, fcfg, input_stems[None], target_stems[None], tcn_cfg,
        num_steps, learning_rate, rng=rng, embed_fn=embed_fn,
        optimizer=optimizer,
    )
    return out[0], {
        "losses": res["losses"][0],
        "initial_distance": float(res["initial_distance"][0]),
        "final_distance": float(res["final_distance"][0]),
        "improvement": float(res["improvement"][0]),
        "converged": bool(res["converged"][0]),
        "identity_init_error": float(res["identity_init_error"][0]),
    }
