# Copyright (c) 2026 touchnet_tpu authors.
# HF <-> touchnet_tpu conversion for Qwen2-Audio.
#
# Capability parity: reference convert_hf_to_dcp.py / convert_dcp_to_hf.py
# applied to Qwen2AudioForConditionalGeneration checkpoints. HF keys:
# audio_tower.* (whisper encoder), multi_modal_projector.linear.*,
# language_model.* (Qwen2). Our layers stack on [L, ...].

from typing import Dict

import numpy as np

from touchnet_tpu.models.llama import convert as llama_convert
from touchnet_tpu.models.qwen2_audio.configuration_qwen2_audio import (
    Qwen2AudioConfig,
)

_TOWER_LAYER_KEYS = [
    ("self_attn_layer_norm", ("self_attn_layer_norm",), ("weight", "bias")),
    ("self_attn.q_proj", ("self_attn", "q_proj"), ("weight", "bias")),
    ("self_attn.k_proj", ("self_attn", "k_proj"), ("weight",)),
    ("self_attn.v_proj", ("self_attn", "v_proj"), ("weight", "bias")),
    ("self_attn.out_proj", ("self_attn", "out_proj"), ("weight", "bias")),
    ("final_layer_norm", ("final_layer_norm",), ("weight", "bias")),
    ("fc1", ("fc1",), ("weight", "bias")),
    ("fc2", ("fc2",), ("weight", "bias")),
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


def tower_from_hf(sd: Dict[str, np.ndarray], L: int, prefix: str = "audio_tower.") -> dict:
    tower: dict = {"layers": {}}
    for name in ("conv1", "conv2", "layer_norm", "embed_positions"):
        entry = {"weight": np.asarray(sd[f"{prefix}{name}.weight"])}
        if f"{prefix}{name}.bias" in sd:
            entry["bias"] = np.asarray(sd[f"{prefix}{name}.bias"])
        tower[name] = entry
    for hf_key, path, leaves in _TOWER_LAYER_KEYS:
        for leaf in leaves:
            stacked = np.stack(
                [
                    np.asarray(sd[f"{prefix}layers.{l}.{hf_key}.{leaf}"])
                    for l in range(L)
                ]
            )
            _set(tower["layers"], path + (leaf,), stacked)
    return tower


def tower_to_hf(tower: dict, L: int, prefix: str = "audio_tower.") -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    for name in ("conv1", "conv2", "layer_norm", "embed_positions"):
        sd[f"{prefix}{name}.weight"] = np.asarray(tower[name]["weight"])
        if "bias" in tower[name]:
            sd[f"{prefix}{name}.bias"] = np.asarray(tower[name]["bias"])
    for hf_key, path, leaves in _TOWER_LAYER_KEYS:
        for leaf in leaves:
            stacked = np.asarray(_get(tower["layers"], path + (leaf,)))
            for l in range(L):
                sd[f"{prefix}layers.{l}.{hf_key}.{leaf}"] = stacked[l]
    return sd


def params_from_hf_state_dict(config: Qwen2AudioConfig, sd: Dict[str, np.ndarray]) -> dict:
    return {
        "audio_tower": tower_from_hf(sd, config.audio_config.encoder_layers),
        "multi_modal_projector": {
            "linear": {
                "weight": np.asarray(sd["multi_modal_projector.linear.weight"]),
                "bias": np.asarray(sd["multi_modal_projector.linear.bias"]),
            }
        },
        "language_model": llama_convert.params_from_hf_state_dict(
            config.text_config, sd, prefix="language_model."
        ),
    }


def params_to_hf_state_dict(config: Qwen2AudioConfig, params: dict) -> Dict[str, np.ndarray]:
    sd = tower_to_hf(params["audio_tower"], config.audio_config.encoder_layers)
    sd["multi_modal_projector.linear.weight"] = np.asarray(
        params["multi_modal_projector"]["linear"]["weight"]
    )
    sd["multi_modal_projector.linear.bias"] = np.asarray(
        params["multi_modal_projector"]["linear"]["bias"]
    )
    sd.update(
        llama_convert.params_to_hf_state_dict(
            config.text_config, params["language_model"], prefix="language_model."
        )
    )
    return sd
