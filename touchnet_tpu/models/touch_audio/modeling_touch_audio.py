# Copyright (c) 2026 touchnet_tpu authors.
# TouchAudioForCausalLM: bias-free audio projector + causal-LM backbone with
# padding+addition multimodal fusion.
#
# Capability parity: reference touchnet/models/touch_audio/
# modeling_touch_audio.py:19-155 — the ONLY difference from the text model:
#   inputs_embeds = projector(input_features) + embed_tokens(input_ids)
# Text positions carry pad tokens where audio lives and audio features are
# zero where text lives, so the addition is an interleave ("padding+addition"
# fusion, docs/TouchAudioForCausalLM.md) — and because every per-position
# tensor shards identically, the fusion is TP/CP-friendly by construction.
# The reference's NaN guard on inputs_embeds is a host-side data check; under
# jit we keep the check in the trainer's host path (data pipeline) instead of
# the traced graph.

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from touchnet_tpu.models.common import kaiming_uniform_init, linear
from touchnet_tpu.models.llama import modeling_llama
from touchnet_tpu.models.touch_audio.configuration_touch_audio import (
    TouchAudioConfig,
)


def init_params(config: TouchAudioConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    k_proj, k_lm = jax.random.split(key)
    return {
        "projector": {
            "weight": kaiming_uniform_init(
                k_proj,
                (config.text_config.hidden_size, config.audio_config.input_size),
                dtype=dtype,
            )
        },
        "language_model": modeling_llama.init_params(
            config.text_config, k_lm, dtype
        ),
    }


def forward(
    params: dict,
    *,
    input_ids: Optional[jax.Array] = None,
    input_features: Optional[jax.Array] = None,
    inputs_embeds: Optional[jax.Array] = None,
    segment_ids: Optional[jax.Array] = None,
    position_ids: Optional[jax.Array] = None,
    config: TouchAudioConfig,
    compute_dtype=jnp.bfloat16,
    attn_fn: Optional[Callable] = None,
    remat_mode: str = "none",
    selective_ac_option: str = "op",
    block_q: int = 512,
    block_kv: int = 512,
    shard_fn: Optional[Callable] = None,
    return_hidden: bool = False,
) -> jax.Array:
    lm = params["language_model"]
    if inputs_embeds is None:
        parts = []
        if input_ids is not None:
            parts.append(
                jnp.take(
                    lm["model"]["embed_tokens"]["weight"], input_ids, axis=0
                ).astype(compute_dtype)
            )
        if input_features is not None:
            parts.append(
                linear(
                    input_features.astype(compute_dtype),
                    params["projector"]["weight"].astype(compute_dtype),
                )
            )
        assert parts, "need input_ids and/or input_features"
        inputs_embeds = sum(parts)
    return modeling_llama.forward(
        lm,
        inputs_embeds=inputs_embeds,
        segment_ids=segment_ids,
        position_ids=position_ids,
        config=config.text_config,
        compute_dtype=compute_dtype,
        attn_fn=attn_fn,
        remat_mode=remat_mode,
        selective_ac_option=selective_ac_option,
        block_q=block_q,
        block_kv=block_kv,
        shard_fn=shard_fn,
        return_hidden=return_hidden,
    )


def get_num_params(config: TouchAudioConfig, exclude_embedding: bool = False) -> int:
    return (
        modeling_llama.get_num_params(config.text_config, exclude_embedding)
        + config.text_config.hidden_size * config.audio_config.input_size
    )


def get_num_flop_per_token(
    num_params: int, config: TouchAudioConfig, seq_len: int
) -> float:
    return modeling_llama.get_num_flop_per_token(
        num_params, config.text_config, seq_len
    )

