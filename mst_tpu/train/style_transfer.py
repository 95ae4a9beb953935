"""Style-transfer (TCN) trainer (ref: src/train_style_transfer.py).

Frozen mixing-style encoder conditions a trainable TCN + FiLM generator:

  style_loss = mean(1 - cos(enc(TCN(input)), enc(target)))       (ref: 217-226)
  cycle      = MRSTFT(TCN(output | [target_emb, input_emb]), input)  (ref: 229-249)
  total      = style + lambda_cycle * cycle

Gradients flow to the TCN *through* the frozen encoder and the (pure-jnp,
differentiable) feature extractor — the reference gets this from autograd;
here it falls out of one jitted value_and_grad over (tcn, film) params.
Gradient accumulation (32) + clip 1.0 via optax.MultiSteps
(ref: 276-316), AdamW + cosine (ref: 602-612).
"""

from __future__ import annotations

from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax

from mst_tpu.config import StyleTransferConfig
from mst_tpu.features import extract_mixing_features
from mst_tpu.losses import multi_resolution_stft_loss
from mst_tpu.models import MixingStyleEncoder, TCNMixer, TCNFiLMGenerator
from mst_tpu.models.tcn import stems_to_nlc, nlc_to_stems
from mst_tpu.train.schedules import cosine_schedule


@flax.struct.dataclass
class StyleTransferState:
    tcn_params: Any
    tcn_batch_stats: Any
    film_params: Any
    opt_state: Any
    step: jax.Array


def create_style_transfer_state(
    cfg: StyleTransferConfig, rng: jax.Array, total_steps: int
):
    """Init TCN + FiLM generator; returns (state, tcn, film_gen, optimizer)."""
    tcn = TCNMixer(cfg.tcn)
    gen = TCNFiLMGenerator(cfg.tcn)

    T = min(cfg.encoder.audio.clip_samples, 44100)
    dummy_emb = jnp.zeros((1, cfg.tcn.film_embed_dim))
    gvars = jax.jit(gen.init)(rng, dummy_emb)
    film = gen.apply(gvars, dummy_emb)
    x = jnp.zeros((1, T, cfg.tcn.in_channels))
    tvars = jax.jit(tcn.init)(jax.random.fold_in(rng, 1), x, film)

    # MultiSteps' inner optimizer sees one step per *applied* update, so the
    # cosine horizon is in optimizer steps, not micro-batches (otherwise the
    # LR would only traverse 1/grad_accum of the schedule).
    opt_steps = max(1, -(-total_steps // cfg.grad_accum_steps))
    tx = optax.MultiSteps(
        optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.adamw(cosine_schedule(cfg.learning_rate, opt_steps)),
        ),
        every_k_schedule=cfg.grad_accum_steps,
    )
    params = {"tcn": tvars["params"], "film": gvars["params"]}
    state = StyleTransferState(
        tcn_params=tvars["params"],
        tcn_batch_stats=tvars.get("batch_stats", {}),
        film_params=gvars["params"],
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )
    return state, tcn, gen, tx


def make_style_transfer_step(
    cfg: StyleTransferConfig,
    enc: MixingStyleEncoder,
    enc_variables: dict,
    tcn: TCNMixer,
    gen: TCNFiLMGenerator,
    tx: optax.GradientTransformation,
    mesh=None,
    embed_fn=None,
):
    """Jitted accumulating train step.

    batch: {input_stems (B, 4, 2, T), target_stems (B, 4, 2, T)}.

    ``mesh``: when given, the step is jitted with explicit shardings —
    state replicated, (micro)batch sharded on 'data' — so the B clips of a
    microbatch spread over the chips instead of leaving all but one idle
    (the grad-accum horizon supplies the rest of the effective batch).

    ``embed_fn(stems) -> (B, D)``: overrides the stem-based mixing-style
    embedding — the reference's ``--encoder_type fx_encoder`` mode embeds
    the summed mixture instead (ref: train_style_transfer.py:163-182;
    adapter: models.fx_encoder.make_fx_embed_fn).  D must equal
    ``cfg.tcn.film_embed_dim // 2``.
    """
    from mst_tpu.pipeline import embed_stems

    fcfg = cfg.features

    if embed_fn is not None:
        embed = embed_fn
    else:
        def embed(stems):
            return embed_stems(enc, enc_variables, stems, fcfg)

    # grads flow through the output embedding; remat recomputes the
    # encoder's mel/CNN activations in backward instead of storing them
    grad_embed = jax.checkpoint(embed) if cfg.remat_embed else embed

    def loss_fn(params, tcn_stats, batch, rng):
        inp = batch["input_stems"]
        tgt = batch["target_stems"]

        # frozen-encoder embeddings of input/target (no grads needed)
        input_emb = jax.lax.stop_gradient(embed(inp))
        target_emb = jax.lax.stop_gradient(embed(tgt))

        concat = jnp.concatenate([input_emb, target_emb], axis=1)
        film = gen.apply({"params": params["film"]}, concat, train=True,
                         rngs={"dropout": rng})

        x = stems_to_nlc(inp)
        out, updates = tcn.apply(
            {"params": params["tcn"], "batch_stats": tcn_stats},
            x, film, train=True,
            rngs={"dropout": jax.random.fold_in(rng, 1)},
            mutable=["batch_stats"],
        )
        out_stems = nlc_to_stems(out)

        # grads flow through the frozen encoder + differentiable features
        out_emb = grad_embed(out_stems)

        o = out_emb / jnp.maximum(jnp.linalg.norm(out_emb, axis=1, keepdims=True), 1e-12)
        t = target_emb / jnp.maximum(jnp.linalg.norm(target_emb, axis=1, keepdims=True), 1e-12)
        cos_sim = jnp.sum(o * t, axis=1)
        style_loss = jnp.mean(1.0 - cos_sim)

        metrics = {"style_loss": style_loss, "cos_sim": jnp.mean(cos_sim)}
        total = style_loss

        if cfg.use_cycle_consistency:
            concat_bwd = jnp.concatenate([target_emb, input_emb], axis=1)
            film_bwd = gen.apply({"params": params["film"]}, concat_bwd,
                                 train=True, rngs={"dropout": jax.random.fold_in(rng, 2)})
            recon, _ = tcn.apply(
                {"params": params["tcn"], "batch_stats": updates["batch_stats"]},
                out, film_bwd, train=True,
                rngs={"dropout": jax.random.fold_in(rng, 3)},
                mutable=["batch_stats"],
            )
            cycle = multi_resolution_stft_loss(
                jnp.moveaxis(recon, -1, -2), jnp.moveaxis(x, -1, -2)
            )
            total = total + cfg.cycle_weight * cycle
            metrics["cycle_loss"] = cycle

        metrics["total_loss"] = total
        return total, (updates["batch_stats"], metrics)

    def train_step(state: StyleTransferState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        params = {"tcn": state.tcn_params, "film": state.film_params}
        (loss, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, state.tcn_batch_stats, batch, rng)
        upd, new_opt = tx.update(grads, state.opt_state, params)
        new_params = optax.apply_updates(params, upd)
        return (
            state.replace(
                tcn_params=new_params["tcn"],
                film_params=new_params["film"],
                tcn_batch_stats=new_stats,
                opt_state=new_opt,
                step=state.step + 1,
            ),
            metrics,
        )

    if mesh is None:
        return jax.jit(train_step)
    from mst_tpu.train.stage1 import _state_and_batch_shardings

    repl, data = _state_and_batch_shardings(mesh)
    return jax.jit(train_step, in_shardings=(repl, data, repl),
                   out_shardings=(repl, repl))


def apply_style_transfer(
    cfg: StyleTransferConfig,
    enc: MixingStyleEncoder,
    enc_variables: dict,
    tcn: TCNMixer,
    gen: TCNFiLMGenerator,
    state: StyleTransferState,
    input_stems: jax.Array,
    target_stems: jax.Array,
    embed_fn=None,
):
    """Inference: transfer target's mixing style onto input
    (ref: inference_e2e_style_transfer.py:124-177).  Returns
    (output_stems (B, 4, 2, T), metrics with initial/final distance).

    ``embed_fn``: mixture-level override, as in make_style_transfer_step
    (ref's fx_encoder mode, inference_e2e_style_transfer.py:7)."""
    from mst_tpu.pipeline import embed_stems

    fcfg = cfg.features

    if embed_fn is not None:
        embed = embed_fn
    else:
        def embed(stems):
            return embed_stems(enc, enc_variables, stems, fcfg)

    input_emb = embed(input_stems)
    target_emb = embed(target_stems)
    concat = jnp.concatenate([input_emb, target_emb], axis=1)
    film = gen.apply({"params": state.film_params}, concat, train=False)
    out = tcn.apply(
        {"params": state.tcn_params, "batch_stats": state.tcn_batch_stats},
        stems_to_nlc(input_stems), film, train=False,
    )
    out_stems = nlc_to_stems(out)
    out_emb = embed(out_stems)

    def cos_dist(a, b):
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), 1e-12)
        b = b / jnp.maximum(jnp.linalg.norm(b, axis=1, keepdims=True), 1e-12)
        return 1.0 - jnp.sum(a * b, axis=1)

    initial = cos_dist(input_emb, target_emb)
    final = cos_dist(out_emb, target_emb)
    # improvement ratio is meaningless when input already matches the
    # target (initial ~ 0); report 0 instead of a 1e8-scaled artifact
    improvement = jnp.where(
        initial > 1e-4, (initial - final) / jnp.maximum(initial, 1e-8), 0.0
    )
    return out_stems, {
        "initial_distance": initial,
        "final_distance": final,
        "improvement": improvement,
    }
