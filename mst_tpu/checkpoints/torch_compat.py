"""PyTorch -> flax parameter conversion for the reference checkpoint layouts.

The reference saves raw ``state_dict``s (ref: src/train.py:34-51,
train_style_transfer.py:375-384).  These converters map them onto the flax
module trees so reference-trained weights load directly, and embedding
parity (cosine >= 0.999 vs torch) is testable.

Key layout mappings (torch -> flax):
- Conv2d weight (O, I, kH, kW)  -> (kH, kW, I, O)
- Conv1d weight (O, I, k)       -> (k, I, O)
- Linear weight (O, I)          -> (I, O)
- BatchNorm: weight/bias -> scale/bias (params); running_mean/var -> batch_stats
- reference per-band ModuleList ``subnet_cnns.{i}.*`` -> stacked leading
  (n_subbands,) axis of the vmapped ``bands`` ensemble
"""

from __future__ import annotations

import numpy as np


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference .pt checkpoint to numpy dicts (CPU, no grad state)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    out = {}
    for key, val in ckpt.items():
        if key.endswith("_state_dict") and isinstance(val, dict):
            out[key] = {k: v.detach().cpu().numpy() for k, v in val.items()
                        if hasattr(v, "detach")}
        else:
            out[key] = val
    return out


def _conv2d(w):  # (O, I, kH, kW) -> (kH, kW, I, O)
    return np.transpose(w, (2, 3, 1, 0))


def _conv1d(w):  # (O, I, k) -> (k, I, O)
    return np.transpose(w, (2, 1, 0))


def _linear(w):  # (O, I) -> (I, O)
    return np.transpose(w, (1, 0))


def _bn(sd, prefix):
    return (
        {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]},
        {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]},
    )


def encoder_params_from_torch(sd: dict, n_subbands: int) -> dict:
    """Reference MixingStyleEncoder state_dict -> flax {params, batch_stats}.

    Torch layout (ref: model.py): ``audio_encoder.subnet_cnns.{i}.conv1/bn1/
    conv2/bn2``, ``audio_encoder.attention_pooling.attention.0/2`` and
    ``.projection.0``, ``film_encoder.feature_mlp.0/3`` and ``.film_head``.
    """
    bands_params = {"conv1": [], "bn1": [], "conv2": [], "bn2": []}
    bands_stats = {"bn1": [], "bn2": []}
    for i in range(n_subbands):
        p = f"audio_encoder.subnet_cnns.{i}"
        bands_params["conv1"].append(
            {"kernel": _conv2d(sd[f"{p}.conv1.weight"]), "bias": sd[f"{p}.conv1.bias"]}
        )
        bands_params["conv2"].append(
            {"kernel": _conv2d(sd[f"{p}.conv2.weight"]), "bias": sd[f"{p}.conv2.bias"]}
        )
        for bn in ("bn1", "bn2"):
            bp, bs = _bn(sd, f"{p}.{bn}")
            bands_params[bn].append(bp)
            bands_stats[bn].append(bs)

    def _stack(dicts):
        return {k: np.stack([d[k] for d in dicts]) for k in dicts[0]}

    params = {
        "audio_encoder": {
            "bands": {
                "conv1": _stack(bands_params["conv1"]),
                "conv2": _stack(bands_params["conv2"]),
                "bn1": _stack(bands_params["bn1"]),
                "bn2": _stack(bands_params["bn2"]),
            },
            "attention_pooling": {
                "attn_in": {
                    "kernel": _linear(sd["audio_encoder.attention_pooling.attention.0.weight"]),
                    "bias": sd["audio_encoder.attention_pooling.attention.0.bias"],
                },
                "attn_out": {
                    "kernel": _linear(sd["audio_encoder.attention_pooling.attention.2.weight"]),
                    "bias": sd["audio_encoder.attention_pooling.attention.2.bias"],
                },
                "proj": {
                    "kernel": _linear(sd["audio_encoder.attention_pooling.projection.0.weight"]),
                    "bias": sd["audio_encoder.attention_pooling.projection.0.bias"],
                },
            },
        },
        "film_encoder": {
            "mlp1": {
                "kernel": _linear(sd["film_encoder.feature_mlp.0.weight"]),
                "bias": sd["film_encoder.feature_mlp.0.bias"],
            },
            "mlp2": {
                "kernel": _linear(sd["film_encoder.feature_mlp.3.weight"]),
                "bias": sd["film_encoder.feature_mlp.3.bias"],
            },
            "film_head": {
                "kernel": _linear(sd["film_encoder.film_head.weight"]),
                "bias": sd["film_encoder.film_head.bias"],
            },
        },
    }
    batch_stats = {
        "audio_encoder": {
            "bands": {
                "bn1": _stack(bands_stats["bn1"]),
                "bn2": _stack(bands_stats["bn2"]),
            }
        }
    }
    import jax

    params = jax.tree.map(np.asarray, params)
    batch_stats = jax.tree.map(np.asarray, batch_stats)
    return {"params": params, "batch_stats": batch_stats}


def tcn_params_from_torch(sd: dict, num_blocks: int) -> dict:
    """Reference TCNMixer state_dict -> flax {params, batch_stats}
    (torch layout ref: tcn_mixer.py:219-321)."""
    params = {
        "input_conv": {
            "kernel": _conv1d(sd["input_conv.weight"]),
            "bias": sd["input_conv.bias"],
        },
        "output_conv": {
            "kernel": _conv1d(sd["output_conv.weight"]),
            "bias": sd["output_conv.bias"],
        },
    }
    batch_stats = {}
    for i in range(num_blocks):
        blk = {}
        stats = {}
        for j in (1, 2):
            blk[f"conv{j}"] = {
                "Conv_0": {
                    "kernel": _conv1d(sd[f"blocks.{i}.conv{j}.conv.weight"]),
                    "bias": sd[f"blocks.{i}.conv{j}.conv.bias"],
                }
            }
            bp, bs = _bn(sd, f"blocks.{i}.norm{j}")
            blk[f"bn{j}"] = bp
            stats[f"bn{j}"] = bs
        params[f"block_{i}"] = blk
        batch_stats[f"block_{i}"] = stats
    import jax

    return {
        "params": jax.tree.map(np.asarray, params),
        "batch_stats": jax.tree.map(np.asarray, batch_stats),
    }


def film_generator_params_from_torch(sd: dict) -> dict:
    """Reference TCNFiLMGenerator (mlp.0/3/6) -> flax fc1/fc2/fc3."""
    import jax

    params = {
        "fc1": {"kernel": _linear(sd["mlp.0.weight"]), "bias": sd["mlp.0.bias"]},
        "fc2": {"kernel": _linear(sd["mlp.3.weight"]), "bias": sd["mlp.3.bias"]},
        "fc3": {"kernel": _linear(sd["mlp.6.weight"]), "bias": sd["mlp.6.bias"]},
    }
    return {"params": jax.tree.map(np.asarray, params)}


def cqtnet_params_from_torch(sd: dict) -> dict:
    """Discogs-VINet CQTNet state_dict -> flax {params, batch_stats}
    (models/cqtnet.py; ref usage: scripts/extract_song_identity_embeddings.py:37-58).

    Maps by *registration order and shape*, not names: upstream wraps layers
    in ``nn.Sequential`` so keys are positional (``features.0.weight``...)
    and vary across repo revisions, but torch preserves insertion order —
    the i-th conv2d weight is conv{i}, the i-th norm group is bn{i}, and the
    single 2-d weight is the linear projection.
    """
    import jax

    groups: dict[str, dict] = {}
    order: list[str] = []
    for key, val in sd.items():
        prefix, _, leaf = key.rpartition(".")
        if prefix not in groups:
            groups[prefix] = {}
            order.append(prefix)
        groups[prefix][leaf] = np.asarray(val)

    convs, bns, linears = [], [], []
    for prefix in order:
        g = groups[prefix]
        if "running_mean" in g:
            bns.append(g)
        elif "weight" in g and g["weight"].ndim == 4:
            convs.append(g)
        elif "weight" in g and g["weight"].ndim == 2:
            linears.append(g)
    if len(convs) != 10 or len(bns) != 10 or len(linears) != 1:
        raise ValueError(
            f"unexpected CQTNet layout: {len(convs)} convs, {len(bns)} "
            f"norms, {len(linears)} linears (want 10/10/1)"
        )

    params: dict = {}
    batch_stats: dict = {}
    for i, (conv, bn) in enumerate(zip(convs, bns)):
        params[f"conv{i}"] = {"kernel": _conv2d(conv["weight"])}
        params[f"bn{i}"] = {"scale": bn["weight"], "bias": bn["bias"]}
        batch_stats[f"bn{i}"] = {"mean": bn["running_mean"],
                                 "var": bn["running_var"]}
    proj = {"kernel": _linear(linears[0]["weight"])}
    proj["bias"] = linears[0].get(
        "bias", np.zeros(proj["kernel"].shape[1], np.float32))
    params["projection"] = proj
    return {
        "params": jax.tree.map(np.asarray, params),
        "batch_stats": jax.tree.map(np.asarray, batch_stats),
    }


def discriminator_params_from_torch(sd: dict) -> dict:
    """Reference SongIdentityDiscriminator (network.0/3/6) -> flax fc1/fc2/fc3."""
    import jax

    params = {
        "fc1": {"kernel": _linear(sd["network.0.weight"]), "bias": sd["network.0.bias"]},
        "fc2": {"kernel": _linear(sd["network.3.weight"]), "bias": sd["network.3.bias"]},
        "fc3": {"kernel": _linear(sd["network.6.weight"]), "bias": sd["network.6.bias"]},
    }
    return {"params": jax.tree.map(np.asarray, params)}
