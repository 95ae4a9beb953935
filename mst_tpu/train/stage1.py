"""Stage-1 contrastive trainer (ref: src/train.py).

One jitted global-batch train step, data-parallel over a ``Mesh`` via
NamedSharding constraints (XLA SPMD inserts the ICI collectives).  The
reference's hot loop crosses host<->device every step for CPU feature
extraction (SURVEY.md §3.1); here features (and optional augmentations) are
computed *inside* the step, so clips never leave HBM.

Losses/semantics preserved: vectorized InfoNCE over song labels
(ref: loss.py:31-136), optional adversarial song-identity removal through a
GRL'd discriminator with the DANN lambda schedules (ref: train.py:130-204,
grl.py:98-164), AdamW + warmup-2000/cosine per-step schedule
(ref: train.py:586-644).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import flax
import jax
import jax.numpy as jnp
import optax

from mst_tpu.config import Stage1Config
from mst_tpu.features import extract_mixing_features
from mst_tpu.losses import info_nce_loss
from mst_tpu.models import (
    MixingStyleEncoder,
    SongIdentityDiscriminator,
    gradient_reversal,
    compute_grl_lambda,
    compute_adversarial_lambda,
)
from mst_tpu.train.schedules import warmup_cosine_schedule


@flax.struct.dataclass
class Stage1State:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array
    disc_params: Any = None
    disc_opt_state: Any = None


def _make_optimizer(cfg: Stage1Config, total_steps: int) -> optax.GradientTransformation:
    return optax.adamw(
        learning_rate=warmup_cosine_schedule(
            cfg.learning_rate, total_steps, cfg.warmup_steps
        ),
        weight_decay=cfg.weight_decay,
    )


def _make_disc_optimizer(
    cfg: Stage1Config, total_steps: int
) -> optax.GradientTransformation:
    """Discriminator optimizer: constant-LR Adam when
    ``cfg.disc_learning_rate`` is set, else the shared encoder schedule
    (see Stage1Config.disc_learning_rate for why the shared schedule
    starves the adversary on short runs)."""
    if cfg.disc_learning_rate is None:
        return _make_optimizer(cfg, total_steps)
    return optax.adam(cfg.disc_learning_rate)


def create_stage1_state(
    cfg: Stage1Config, rng: jax.Array, total_steps: int
) -> tuple[Stage1State, MixingStyleEncoder, Optional[SongIdentityDiscriminator]]:
    """Initialize encoder (+ discriminator) and optimizer state."""
    enc = MixingStyleEncoder(cfg.encoder)
    a = cfg.encoder.audio
    dummy_stems = jnp.zeros((2, 4, 2, a.clip_samples), jnp.float32)
    dummy_feats = jnp.zeros((2, cfg.encoder.feature_dim), jnp.float32)
    # jit the init: op-by-op dispatch through a remote TPU link is minutes,
    # one compiled program is seconds
    variables = jax.jit(enc.init)(rng, dummy_stems, dummy_feats)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    tx = _make_optimizer(cfg, total_steps)
    opt_state = tx.init(params)

    disc = None
    disc_params = None
    disc_opt_state = None
    if cfg.use_adversarial:
        disc = SongIdentityDiscriminator(
            hidden_dim=cfg.discriminator_hidden_dim,
            output_dim=cfg.song_id_dim,
            dropout=cfg.discriminator_dropout,
        )
        disc_params = disc.init(
            jax.random.fold_in(rng, 1), jnp.zeros((2, cfg.encoder.embed_dim))
        )["params"]
        disc_opt_state = _make_disc_optimizer(cfg, total_steps).init(disc_params)

    state = Stage1State(
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
        disc_params=disc_params,
        disc_opt_state=disc_opt_state,
    )
    return state, enc, disc


def make_train_step(
    cfg: Stage1Config,
    enc: MixingStyleEncoder,
    disc: Optional[SongIdentityDiscriminator],
    total_steps: int,
    features_on_device: bool = True,
    augment_fn=None,
    mesh=None,
    infonce_impl: str = "spmd",
):
    """Build the jitted train step.

    batch: dict with
      stems        (N, 4, 2, T) float32  (N = batch * num_segments)
      song_labels  (N,) int32
      features     (N, 64)  -- only if features_on_device=False
      song_id_emb  (N, song_id_dim) -- only for adversarial training

    ``mesh``: when given, the step is jitted with *explicit* shardings —
    state replicated, batch sharded on the 'data' axis — instead of relying
    on SPMD propagation from the input batch (multi-host-safe, and the
    memory layout is pinned rather than accident-prone).

    ``infonce_impl``: 'spmd' (default) computes the global (N, N) InfoNCE
    inside the jit and lets XLA insert the all-gather from the shardings;
    'shard_map' (requires ``mesh``) calls ``info_nce_loss(axis_name='data')``
    under ``jax.shard_map`` so each chip computes only its own
    (N/chips, N) row block and psums the reduction — the explicit-collective
    variant.  Both are parity-tested (tests/test_train_stage1.py)."""
    tx = _make_optimizer(cfg, total_steps)
    disc_tx = _make_disc_optimizer(cfg, total_steps)

    from mst_tpu.pipeline import embed_stems

    def _disc_fit_loss(dp, emb_sg, t, drng):
        """Cosine fit of the head on detached embeddings (the adversary's
        own objective for inner updates; targets ``t`` pre-normalized)."""
        pred = disc.apply({"params": dp}, emb_sg, train=True,
                          rngs={"dropout": drng})
        p = pred / jnp.maximum(
            jnp.linalg.norm(pred, axis=1, keepdims=True), 1e-12
        )
        return jnp.mean(1.0 - jnp.sum(p * t, axis=1))

    if infonce_impl == "shard_map":
        if mesh is None:
            raise ValueError("infonce_impl='shard_map' requires a mesh")
        from jax.sharding import PartitionSpec as P

        def nce(emb, labels):
            return jax.shard_map(
                partial(info_nce_loss, temperature=cfg.temperature,
                        axis_name="data"),
                mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P(),
            )(emb, labels)
    elif infonce_impl == "spmd":
        def nce(emb, labels):
            return info_nce_loss(emb, labels, cfg.temperature)
    else:
        raise ValueError(f"unknown infonce_impl {infonce_impl!r}")

    def loss_fn(params, disc_params, batch_stats, batch, rng, step):
        stems = batch["stems"]
        song_labels = batch["song_labels"]
        if augment_fn is not None:
            # Negative-pair augmentation (ref README.md:108-123 / proposal —
            # the reference *defines* AudioAugmenter but never wires it,
            # SURVEY §2.1): augmented copies are same-song/different-mix, so
            # they get fresh unique labels and act as negatives to
            # everything, including their own source clip.
            rng, aug_rng = jax.random.split(rng)
            aug = augment_fn(aug_rng, stems)
            stems = jnp.concatenate([stems, aug], axis=0)
            n = song_labels.shape[0]
            aug_labels = jnp.max(song_labels) + 1 + jnp.arange(n, dtype=song_labels.dtype)
            song_labels = jnp.concatenate([song_labels, aug_labels])
        if features_on_device:
            emb, updates = embed_stems(
                enc, {"params": params, "batch_stats": batch_stats},
                stems, cfg.features, train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"],
            )
        else:
            emb, updates = enc.apply(
                {"params": params, "batch_stats": batch_stats},
                stems, batch["features"], train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"],
            )

        loss_nce = nce(emb, song_labels)
        metrics = {"infonce": loss_nce}
        total = loss_nce

        if cfg.use_adversarial and disc is not None:
            grl_lam = (
                cfg.fixed_grl_lambda
                if cfg.fixed_grl_lambda is not None
                else compute_grl_lambda(step, total_steps, cfg.adversarial_warmup_steps)
            )
            adv_lam = compute_adversarial_lambda(
                step,
                total_steps,
                cfg.adversarial_warmup_steps,
                cfg.initial_adversarial_lambda,
                cfg.adversarial_lambda,
            )
            target_song_id = batch["song_id_emb"]
            if augment_fn is not None:
                # augmented copies keep their source clip's song identity
                target_song_id = jnp.concatenate([target_song_id] * 2, axis=0)
            rev = gradient_reversal(emb, grl_lam)
            if cfg.discriminator_noise > 0.0:
                rev = rev + cfg.discriminator_noise * jax.random.normal(
                    jax.random.fold_in(rng, 3), rev.shape
                )
            pred = disc.apply(
                {"params": disc_params}, rev, train=True,
                rngs={"dropout": jax.random.fold_in(rng, 2)},
            )
            # 1 - cosine(normalized pred, normalized target)
            # (ref: train.py:196-202)
            p = pred / jnp.maximum(
                jnp.linalg.norm(pred, axis=1, keepdims=True), 1e-12
            )
            t = target_song_id / jnp.maximum(
                jnp.linalg.norm(target_song_id, axis=1, keepdims=True), 1e-12
            )
            adv_loss = jnp.mean(1.0 - jnp.sum(p * t, axis=1))
            total = total + adv_lam * adv_loss
            if cfg.disc_detach_train:
                # full-strength head: its own loss on stop_grad(emb), so
                # the head's learning does not fight the reversal (see
                # Stage1Config.disc_detach_train)
                disc_fit = _disc_fit_loss(
                    disc_params, jax.lax.stop_gradient(emb), t,
                    jax.random.fold_in(rng, 4),
                )
                total = total + disc_fit
                metrics["disc_fit"] = disc_fit
            metrics["adversarial"] = adv_loss
            metrics["grl_lambda"] = grl_lam
            metrics["adv_lambda"] = adv_lam
            adv_aux = (jax.lax.stop_gradient(emb), t)
        else:
            adv_aux = None

        metrics["total"] = total
        return total, (updates["batch_stats"], metrics, adv_aux)

    def train_step(state: Stage1State, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        if cfg.use_adversarial and disc is not None:
            (loss, (new_bs, metrics, adv_aux)), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(state.params, state.disc_params, state.batch_stats, batch, rng, state.step)
            g_enc, g_disc = grads
            upd, new_opt = tx.update(g_enc, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, upd)
            d_upd, new_d_opt = disc_tx.update(
                g_disc, state.disc_opt_state, state.disc_params
            )
            new_disc = optax.apply_updates(state.disc_params, d_upd)
            if cfg.disc_steps > 1:
                # k-1 extra adversary-only Adam steps on the detached batch
                # embedding, so the head tracks the (moving) encoder closely
                # enough for the reversed gradient to carry signal
                emb_sg, t = adv_aux

                def body(i, carry):
                    dp, dopt = carry
                    g = jax.grad(_disc_fit_loss)(
                        dp, emb_sg, t, jax.random.fold_in(rng, 100 + i)
                    )
                    du, dopt = disc_tx.update(g, dopt, dp)
                    return optax.apply_updates(dp, du), dopt

                new_disc, new_d_opt = jax.lax.fori_loop(
                    1, cfg.disc_steps, body, (new_disc, new_d_opt)
                )
            new_state = state.replace(
                params=new_params,
                disc_params=new_disc,
                opt_state=new_opt,
                disc_opt_state=new_d_opt,
                batch_stats=new_bs,
                step=state.step + 1,
            )
        else:
            (loss, (new_bs, metrics, _)), g_enc = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, None, state.batch_stats, batch, rng, state.step)
            upd, new_opt = tx.update(g_enc, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, upd)
            new_state = state.replace(
                params=new_params,
                opt_state=new_opt,
                batch_stats=new_bs,
                step=state.step + 1,
            )
        return new_state, metrics

    if mesh is None:
        return jax.jit(train_step)
    repl, data = _state_and_batch_shardings(mesh)
    return jax.jit(train_step, in_shardings=(repl, data, repl),
                   out_shardings=(repl, repl))


def _state_and_batch_shardings(mesh):
    """(replicated, batch-on-'data') NamedShardings used as pytree prefixes."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))


def make_eval_step(cfg: Stage1Config, enc: MixingStyleEncoder,
                   features_on_device: bool = True, mesh=None):
    """Validation forward (no grads, running BN stats; ref: train.py:388-427)."""

    from mst_tpu.pipeline import embed_stems

    def eval_step(state: Stage1State, batch):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if features_on_device:
            emb = embed_stems(enc, variables, batch["stems"], cfg.features)
        else:
            emb = enc.apply(variables, batch["stems"], batch["features"],
                            train=False)
        loss = info_nce_loss(emb, batch["song_labels"], cfg.temperature)
        return loss, emb

    if mesh is None:
        return jax.jit(eval_step)
    repl, data = _state_and_batch_shardings(mesh)
    return jax.jit(eval_step, in_shardings=(repl, data),
                   out_shardings=(repl, data))
