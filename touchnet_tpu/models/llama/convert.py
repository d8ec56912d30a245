# Copyright (c) 2026 touchnet_tpu authors.
# HF <-> touchnet_tpu weight layout conversion for Llama.
#
# Capability parity: reference convert_hf_to_dcp.py / convert_dcp_to_hf.py
# (touchnet/bin/convert_hf_to_dcp.py:24-66, convert_dcp_to_hf.py:28-92).
# Our params stack per-layer weights on a leading [L, ...] axis (scan
# layout); HF stores one tensor per layer — conversion is a mechanical
# stack/unstack over the documented key map.

from typing import Dict

import numpy as np

from touchnet_tpu.models.llama.configuration_llama import LlamaConfig

_LAYER_KEYS = [
    ("input_layernorm", ("input_layernorm", "weight")),
    ("self_attn.q_proj", ("self_attn", "q_proj", "weight")),
    ("self_attn.k_proj", ("self_attn", "k_proj", "weight")),
    ("self_attn.v_proj", ("self_attn", "v_proj", "weight")),
    ("self_attn.o_proj", ("self_attn", "o_proj", "weight")),
    ("post_attention_layernorm", ("post_attention_layernorm", "weight")),
    ("mlp.gate_proj", ("mlp", "gate_proj", "weight")),
    ("mlp.up_proj", ("mlp", "up_proj", "weight")),
    ("mlp.down_proj", ("mlp", "down_proj", "weight")),
]


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def params_from_hf_state_dict(
    config: LlamaConfig, sd: Dict[str, np.ndarray], prefix: str = ""
) -> dict:
    """HF flat state dict (numpy) -> stacked param pytree."""
    L = config.num_hidden_layers
    params: dict = {"model": {"layers": {}}}
    _set(params, ("model", "embed_tokens", "weight"),
         np.asarray(sd[f"{prefix}model.embed_tokens.weight"]))
    for hf_key, path in _LAYER_KEYS:
        stacked = np.stack(
            [
                np.asarray(sd[f"{prefix}model.layers.{l}.{hf_key}.weight"])
                for l in range(L)
            ]
        )
        _set(params["model"]["layers"], path, stacked)
        bias_key = f"{prefix}model.layers.0.{hf_key}.bias"
        if bias_key in sd:  # Qwen2-style q/k/v biases
            stacked_b = np.stack(
                [
                    np.asarray(sd[f"{prefix}model.layers.{l}.{hf_key}.bias"])
                    for l in range(L)
                ]
            )
            _set(params["model"]["layers"], path[:-1] + ("bias",), stacked_b)
    _set(params, ("model", "norm", "weight"), np.asarray(sd[f"{prefix}model.norm.weight"]))
    if not config.tie_word_embeddings:
        lm_key = f"{prefix}lm_head.weight"
        if lm_key in sd:
            params["lm_head"] = {"weight": np.asarray(sd[lm_key])}
        else:  # some checkpoints tie implicitly
            params["lm_head"] = {
                "weight": np.asarray(sd[f"{prefix}model.embed_tokens.weight"]).copy()
            }
    return params


def params_to_hf_state_dict(
    config: LlamaConfig, params: dict, prefix: str = ""
) -> Dict[str, np.ndarray]:
    """Stacked param pytree -> HF flat state dict (numpy)."""
    L = config.num_hidden_layers
    sd: Dict[str, np.ndarray] = {}
    sd[f"{prefix}model.embed_tokens.weight"] = np.asarray(
        _get(params, ("model", "embed_tokens", "weight"))
    )
    for hf_key, path in _LAYER_KEYS:
        stacked = np.asarray(_get(params["model"]["layers"], path))
        for l in range(L):
            sd[f"{prefix}model.layers.{l}.{hf_key}.weight"] = stacked[l]
        try:
            stacked_b = np.asarray(_get(params["model"]["layers"], path[:-1] + ("bias",)))
        except KeyError:
            continue
        for l in range(L):
            sd[f"{prefix}model.layers.{l}.{hf_key}.bias"] = stacked_b[l]
    sd[f"{prefix}model.norm.weight"] = np.asarray(_get(params, ("model", "norm", "weight")))
    if not config.tie_word_embeddings and "lm_head" in params:
        sd[f"{prefix}lm_head.weight"] = np.asarray(params["lm_head"]["weight"])
    return sd
