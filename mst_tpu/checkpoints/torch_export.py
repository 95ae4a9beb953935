"""Flax -> PyTorch parameter export (reference checkpoint layouts).

Inverse of torch_compat.py: trained flax artifacts become reference-layout
``state_dict``s so they can be inspected/consumed by the reference tooling
(the reference's checkpoint content: ref src/train.py:34-51 —
``{epoch, model_state_dict, optimizer_state_dict, loss}``; style-transfer:
ref src/train_style_transfer.py:375-384).  Round-trip parity
(``import(export(x)) == x``) is guarded by tests/test_torch_parity.py.
"""

from __future__ import annotations

import numpy as np


def _conv2d_inv(w):  # (kH, kW, I, O) -> (O, I, kH, kW)
    return np.transpose(np.asarray(w), (3, 2, 0, 1))


def _conv1d_inv(w):  # (k, I, O) -> (O, I, k)
    return np.transpose(np.asarray(w), (2, 1, 0))


def _linear_inv(w):  # (I, O) -> (O, I)
    return np.transpose(np.asarray(w), (1, 0))


def _np(x):
    return np.asarray(x)


def _bn_inv(sd: dict, prefix: str, bn_params: dict, bn_stats: dict) -> None:
    sd[f"{prefix}.weight"] = _np(bn_params["scale"])
    sd[f"{prefix}.bias"] = _np(bn_params["bias"])
    sd[f"{prefix}.running_mean"] = _np(bn_stats["mean"])
    sd[f"{prefix}.running_var"] = _np(bn_stats["var"])


def encoder_params_to_torch(variables: dict) -> dict:
    """Flax MixingStyleEncoder {params, batch_stats} -> reference
    ``model_state_dict`` layout (ref: model.py — ``audio_encoder.
    subnet_cnns.{i}.*``, ``.attention_pooling.*``, ``film_encoder.*``).
    The stacked (n_subbands,) band ensemble unstacks into the reference's
    per-band ModuleList."""
    p = variables["params"]
    bs = variables["batch_stats"]
    bands_p = p["audio_encoder"]["bands"]
    bands_s = bs["audio_encoder"]["bands"]
    n_subbands = int(np.asarray(bands_p["conv1"]["kernel"]).shape[0])

    sd: dict = {}
    for i in range(n_subbands):
        pre = f"audio_encoder.subnet_cnns.{i}"
        for conv in ("conv1", "conv2"):
            sd[f"{pre}.{conv}.weight"] = _conv2d_inv(bands_p[conv]["kernel"][i])
            sd[f"{pre}.{conv}.bias"] = _np(bands_p[conv]["bias"][i])
        for bn in ("bn1", "bn2"):
            _bn_inv(sd, f"{pre}.{bn}",
                    {k: v[i] for k, v in bands_p[bn].items()},
                    {k: v[i] for k, v in bands_s[bn].items()})

    ap = p["audio_encoder"]["attention_pooling"]
    sd["audio_encoder.attention_pooling.attention.0.weight"] = _linear_inv(ap["attn_in"]["kernel"])
    sd["audio_encoder.attention_pooling.attention.0.bias"] = _np(ap["attn_in"]["bias"])
    sd["audio_encoder.attention_pooling.attention.2.weight"] = _linear_inv(ap["attn_out"]["kernel"])
    sd["audio_encoder.attention_pooling.attention.2.bias"] = _np(ap["attn_out"]["bias"])
    sd["audio_encoder.attention_pooling.projection.0.weight"] = _linear_inv(ap["proj"]["kernel"])
    sd["audio_encoder.attention_pooling.projection.0.bias"] = _np(ap["proj"]["bias"])

    fe = p["film_encoder"]
    sd["film_encoder.feature_mlp.0.weight"] = _linear_inv(fe["mlp1"]["kernel"])
    sd["film_encoder.feature_mlp.0.bias"] = _np(fe["mlp1"]["bias"])
    sd["film_encoder.feature_mlp.3.weight"] = _linear_inv(fe["mlp2"]["kernel"])
    sd["film_encoder.feature_mlp.3.bias"] = _np(fe["mlp2"]["bias"])
    sd["film_encoder.film_head.weight"] = _linear_inv(fe["film_head"]["kernel"])
    sd["film_encoder.film_head.bias"] = _np(fe["film_head"]["bias"])
    return sd


def tcn_params_to_torch(variables: dict) -> dict:
    """Flax TCNMixer {params, batch_stats} -> reference state_dict
    (torch layout ref: tcn_mixer.py:219-321)."""
    p = variables["params"]
    bs = variables.get("batch_stats", {})
    sd: dict = {
        "input_conv.weight": _conv1d_inv(p["input_conv"]["kernel"]),
        "input_conv.bias": _np(p["input_conv"]["bias"]),
        "output_conv.weight": _conv1d_inv(p["output_conv"]["kernel"]),
        "output_conv.bias": _np(p["output_conv"]["bias"]),
    }
    blocks = sorted((k for k in p if k.startswith("block_")),
                    key=lambda k: int(k.split("_")[1]))
    for k in blocks:
        i = int(k.split("_")[1])
        for j in (1, 2):
            sd[f"blocks.{i}.conv{j}.conv.weight"] = _conv1d_inv(
                p[k][f"conv{j}"]["Conv_0"]["kernel"])
            sd[f"blocks.{i}.conv{j}.conv.bias"] = _np(
                p[k][f"conv{j}"]["Conv_0"]["bias"])
            _bn_inv(sd, f"blocks.{i}.norm{j}", p[k][f"bn{j}"], bs[k][f"bn{j}"])
    return sd


def film_generator_params_to_torch(variables: dict) -> dict:
    """Flax TCNFiLMGenerator -> reference ``mlp.0/3/6`` layout."""
    p = variables["params"]
    sd: dict = {}
    for flax_name, torch_idx in (("fc1", 0), ("fc2", 3), ("fc3", 6)):
        sd[f"mlp.{torch_idx}.weight"] = _linear_inv(p[flax_name]["kernel"])
        sd[f"mlp.{torch_idx}.bias"] = _np(p[flax_name]["bias"])
    return sd


def save_torch_checkpoint(path, state_dicts: dict, **extra) -> None:
    """Write a reference-layout ``.pt``: ``state_dicts`` maps reference key
    names (``model_state_dict``, ``tcn_state_dict``, ...) to numpy
    state_dicts; ``extra`` carries scalars (epoch, loss, hyperparams —
    the architecture keys the reference trainer forgot to write,
    SURVEY.md §2.5)."""
    import torch

    ckpt = dict(extra)
    for key, sd in state_dicts.items():
        ckpt[key] = {k: torch.from_numpy(np.ascontiguousarray(v))
                     for k, v in sd.items()}
    torch.save(ckpt, path)
