"""SCNet separation training.

The reference never trains SCNet (it consumes an upstream checkpoint,
SURVEY.md §2.1); without the submodule the checkpoint cannot be ported, so
this recipe trains from scratch on MUSDB-style stem corpora.  Loss follows
the SCNet paper: waveform L1 + multi-resolution STFT on each source, with
random-chunk + stem-shuffle augmentation (the standard MSS recipe).
Data-parallel over the mesh like the Stage-1 trainer.
"""

from __future__ import annotations

from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax

from mst_tpu.losses import multi_resolution_stft_loss
from mst_tpu.separation.scnet import SCNet, SCNetConfig
from mst_tpu.train.schedules import warmup_cosine_schedule


@flax.struct.dataclass
class SeparationState:
    params: Any
    opt_state: Any
    step: jax.Array


def create_separation_state(
    cfg: SCNetConfig, rng: jax.Array, total_steps: int,
    learning_rate: float = 5e-4, chunk_samples: int = 441000,
):
    model = SCNet(cfg)
    dummy = jnp.zeros((1, cfg.audio_channels, chunk_samples))
    variables = jax.jit(model.init)(rng, dummy)
    tx = optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.adamw(warmup_cosine_schedule(learning_rate, total_steps, 1000)),
    )
    state = SeparationState(
        params=variables["params"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    return state, model, tx


def separation_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """pred/target (B, S, 2, T): L1 + 0.5 * MR-STFT per source."""
    l1 = jnp.mean(jnp.abs(pred - target))
    spec = multi_resolution_stft_loss(
        pred.reshape(-1, pred.shape[-1]), target.reshape(-1, target.shape[-1])
    )
    return l1 + 0.5 * spec


def separation_loss_balanced(pred: jax.Array, target: jax.Array,
                             eps: float = 1e-3) -> jax.Array:
    """Per-source scale-normalized L1 + per-item MR-STFT (round-4 fix).

    The plain mean-L1 loss lets loud stems dominate the gradient: on mixes
    with a quiet 'other' stem the signal for that stem vanishes and the
    model learns to pass it through (round-3 verdict: per-stem SI-SDR
    [0.26, 3.88, 3.53, -3.48] — 'other' effectively unseparated).  Here
    each (batch, source) L1 term is normalized by that target's own mean
    magnitude, and the MR-STFT spectral-convergence ratio is computed per
    item, so every stem gets an equal vote regardless of its mix level.
    """
    l1 = jnp.mean(jnp.abs(pred - target), axis=(-2, -1))    # (B, S)
    scale = jnp.mean(jnp.abs(target), axis=(-2, -1)) + eps  # (B, S)
    l1 = jnp.mean(l1 / scale)
    spec = multi_resolution_stft_loss(
        pred.reshape(-1, pred.shape[-1]), target.reshape(-1, target.shape[-1]),
        per_item=True,
    )
    return 0.5 * l1 + 0.5 * spec


def separation_loss_sisdr(pred: jax.Array, target: jax.Array,
                          mixture: jax.Array, tau_db: float = 30.0,
                          mc_weight: float = 0.5) -> jax.Array:
    """Soft-capped negative SI-SDR + mixture-consistency (round-4 quality
    objective).

    The held-out metric IS mean per-stem SI-SDR, so train on it directly:
    each (batch, source, channel) term is the eval quantity, which makes the
    loss per-source balanced by construction (every stem contributes one dB
    number regardless of its mix level — the property separation_loss_balanced
    approximates through scale normalization).  Two standard fixes make it a
    good objective rather than a brittle one:

    - **soft cap at ``tau_db``** (the "SDR-max" trick): the raw negative
      SI-SDR keeps paying unbounded reward for polishing already-easy chunks;
      capping via -10*log10(10^(-sdr/10) + 10^(-tau/10)) saturates the
      per-term reward at tau dB so gradient moves to the hard stems.
    - **mixture consistency**: SI-SDR is gain-blind, but downstream demix
      reconstructs the mix as the stem sum (and the real-audio evidence
      bundle asserts recon_rel_err), so an L1 anchor |sum(pred) - mixture|
      relative to the mixture level pins the output scale.
    """
    sdr = si_sdr(pred, target)  # (B, S, C) in dB
    capped = -10.0 * jnp.log10(
        jnp.power(10.0, -sdr / 10.0) + 10.0 ** (-tau_db / 10.0))
    sdr_term = -jnp.mean(capped) / 10.0  # ~unit scale
    recon = jnp.sum(pred, axis=1)
    mc = jnp.mean(jnp.abs(recon - mixture)) / (
        jnp.mean(jnp.abs(mixture)) + 1e-8)
    return sdr_term + mc_weight * mc


def shuffle_stems_augment(rng: jax.Array, stems: jax.Array) -> jax.Array:
    """Remix augmentation: per-stem random gain + channel swap
    (B, S, 2, T) -> same.  The classic MSS trick of recombining stems
    across batch items is done by permuting the batch per stem."""
    B, S, C, T = stems.shape
    k1, k2, k3 = jax.random.split(rng, 3)
    gains = jax.random.uniform(k1, (B, S, 1, 1), minval=0.5, maxval=1.2)
    swap = jax.random.bernoulli(k2, 0.5, (B, S, 1, 1))
    swapped = stems[:, :, ::-1, :]
    stems = jnp.where(swap, swapped, stems) * gains
    perms = jax.vmap(lambda k: jax.random.permutation(k, B))(
        jax.random.split(k3, S)
    )  # (S, B)
    remixed = jnp.stack([stems[perms[s], s] for s in range(S)], axis=1)
    return remixed


def make_separation_train_step(model: SCNet, tx, augment: bool = True):
    """batch: {'stems': (B, 4, 2, T)}; mixture is the stem sum."""

    def loss_fn(params, batch, rng):
        stems = batch["stems"]
        if augment:
            stems = shuffle_stems_augment(rng, stems)
        mixture = jnp.sum(stems, axis=1)
        pred = model.apply({"params": params}, mixture)
        loss = separation_loss(pred, stems)
        return loss, {"loss": loss}

    def train_step(state: SeparationState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        upd, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, upd)
        return (
            state.replace(params=new_params, opt_state=new_opt, step=state.step + 1),
            metrics,
        )

    return jax.jit(train_step)


def _synth_batch_fn(synth_version: int):
    if synth_version == 1:
        from mst_tpu.separation.synth import synth_batch
        return synth_batch
    if synth_version == 2:
        from mst_tpu.separation.synth_v2 import synth_batch_v2
        return synth_batch_v2
    raise ValueError(f"unknown synth_version {synth_version!r}")


def make_synth_train_step(model: SCNet, tx, batch_size: int,
                          chunk_samples: int, sample_rate: float,
                          augment: bool = True, synth_version: int = 1,
                          balanced_loss: bool = False,
                          loss: str | None = None):
    """Train step with data synthesized *inside* the jit (separation/synth.py
    or the harder synth_v2.py — ``synth_version``): the generator + forward +
    backward compile to one program, so the host (1 CPU core here) never
    touches training data.  ``loss`` selects the objective: "paper"
    (L1 + MR-STFT, the SCNet recipe), "balanced" (per-source scale-normalized
    — also the legacy ``balanced_loss=True``), or "sisdr"
    (separation_loss_sisdr — trains on the eval metric directly)."""
    synth_batch = _synth_batch_fn(synth_version)
    loss = loss or ("balanced" if balanced_loss else "paper")
    if loss not in ("paper", "balanced", "sisdr"):
        raise ValueError(f"unknown loss {loss!r}")

    def loss_fn(params, stems):
        mixture = jnp.sum(stems, axis=1)
        pred = model.apply({"params": params}, mixture)
        if loss == "sisdr":
            val = separation_loss_sisdr(pred, stems, mixture)
        elif loss == "balanced":
            val = separation_loss_balanced(pred, stems)
        else:
            val = separation_loss(pred, stems)
        return val, {"loss": val}

    def train_step(state: SeparationState, rng):
        rng = jax.random.fold_in(rng, state.step)
        k_data, k_aug = jax.random.split(rng)
        stems = synth_batch(k_data, batch_size, chunk_samples, sample_rate)
        if augment:
            stems = shuffle_stems_augment(k_aug, stems)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, stems
        )
        upd, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, upd)
        return (
            state.replace(params=new_params, opt_state=new_opt, step=state.step + 1),
            metrics,
        )

    return jax.jit(train_step)


def make_synth_eval_fn(model: SCNet, batch_size: int, chunk_samples: int,
                       sample_rate: float, synth_version: int = 1):
    """Held-out SI-SDR eval on fresh synthetic mixes (keys disjoint from the
    training stream by construction — caller passes a dedicated eval key).

    Returns jitted fn(params, key) -> {si_sdr, si_sdr_per_stem (4,),
    input_si_sdr} where input_si_sdr is the mixture-as-prediction baseline
    (the number an identity 'separator' scores)."""
    synth_batch = _synth_batch_fn(synth_version)

    def eval_fn(params, key):
        stems = synth_batch(key, batch_size, chunk_samples, sample_rate)
        mixture = jnp.sum(stems, axis=1)
        pred = model.apply({"params": params}, mixture)
        per = si_sdr(pred, stems)  # (B, 4, 2)
        base = si_sdr(jnp.broadcast_to(mixture[:, None], stems.shape), stems)
        return {
            "si_sdr": jnp.mean(per),
            "si_sdr_per_stem": jnp.mean(per, axis=(0, 2)),
            "input_si_sdr": jnp.mean(base),
            "input_si_sdr_per_stem": jnp.mean(base, axis=(0, 2)),
        }

    return jax.jit(eval_fn)


def si_sdr(pred: jax.Array, target: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Scale-invariant SDR in dB over the last axis (eval metric)."""
    t = target - jnp.mean(target, axis=-1, keepdims=True)
    p = pred - jnp.mean(pred, axis=-1, keepdims=True)
    s = jnp.sum(p * t, axis=-1, keepdims=True) * t / (
        jnp.sum(t**2, axis=-1, keepdims=True) + eps
    )
    e = p - s
    return 10.0 * jnp.log10(
        (jnp.sum(s**2, axis=-1) + eps) / (jnp.sum(e**2, axis=-1) + eps)
    )
