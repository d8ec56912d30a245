# Copyright (c) 2026 touchnet_tpu authors.
# HF <-> touchnet_tpu conversion for TouchAudioForCausalLM.
#
# Capability parity: reference convert_hf_to_dcp.py:24-58 — a text-backbone
# HF checkpoint becomes a touch_audio seed by prefixing keys with
# "language_model." and injecting a freshly initialized projector.

from typing import Dict

import numpy as np

from touchnet_tpu.models.llama import convert as llama_convert
from touchnet_tpu.models.touch_audio.configuration_touch_audio import (
    TouchAudioConfig,
)


def params_from_hf_backbone_state_dict(
    config: TouchAudioConfig, sd: Dict[str, np.ndarray], seed: int = 0
) -> dict:
    """Backbone-only HF state dict -> touch_audio params with fresh projector."""
    import jax

    from touchnet_tpu.models.common import kaiming_uniform_init

    lm = llama_convert.params_from_hf_state_dict(config.text_config, sd)
    proj = kaiming_uniform_init(
        jax.random.PRNGKey(seed),
        (config.text_config.hidden_size, config.audio_config.input_size),
    )
    return {"projector": {"weight": np.asarray(proj)}, "language_model": lm}


def params_from_hf_state_dict(
    config: TouchAudioConfig, sd: Dict[str, np.ndarray]
) -> dict:
    """Full TouchAudioForCausalLM HF state dict (projector.weight +
    language_model.*) -> params."""
    lm = llama_convert.params_from_hf_state_dict(
        config.text_config, sd, prefix="language_model."
    )
    return {
        "projector": {"weight": np.asarray(sd["projector.weight"])},
        "language_model": lm,
    }


def params_to_hf_state_dict(
    config: TouchAudioConfig, params: dict
) -> Dict[str, np.ndarray]:
    sd = llama_convert.params_to_hf_state_dict(
        config.text_config, params["language_model"], prefix="language_model."
    )
    sd["projector.weight"] = np.asarray(params["projector"]["weight"])
    return sd
