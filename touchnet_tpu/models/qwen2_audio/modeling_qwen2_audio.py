# Copyright (c) 2026 touchnet_tpu authors.
# Qwen2-Audio: whisper audio tower + avg-pool + projector + Qwen2 LM with
# <|AUDIO|> masked-scatter fusion.
#
# Capability parity: HF Qwen2AudioForConditionalGeneration with the
# reference's training patches (touchnet/models/qwen2_audio/__init__.py):
#   - variable-length audio tower (>30s pos-emb tiling);
#   - causal audio-tower attention (streamable training);
#   - audio-feature -> <|AUDIO|>-token merge.
# TPU-first: the merge is a static cumsum gather (per row, the j-th audio
# token takes the j-th pooled audio frame of that row) instead of torch's
# dynamic masked_scatter — same semantics for the one-audio-per-sample
# batches the pipeline produces, with fully static shapes.

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from touchnet_tpu.models import whisper_encoder
from touchnet_tpu.models.common import linear
from touchnet_tpu.models.llama import modeling_llama
from touchnet_tpu.models.qwen2_audio.configuration_qwen2_audio import (
    Qwen2AudioConfig,
)


def init_params(config: Qwen2AudioConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    k_tower, k_proj, k_lm = jax.random.split(key, 3)
    d = config.audio_config.d_model
    hidden = config.text_config.hidden_size
    from touchnet_tpu.models.common import kaiming_uniform_init

    return {
        "audio_tower": whisper_encoder.init_params(config.audio_config, k_tower, dtype),
        "multi_modal_projector": {
            "linear": {
                "weight": kaiming_uniform_init(k_proj, (hidden, d), dtype=dtype),
                "bias": jnp.zeros((hidden,), dtype),
            }
        },
        "language_model": modeling_llama.init_params(config.text_config, k_lm, dtype),
    }


def get_feat_extract_output_lengths(input_lengths):
    """Conv2 (stride 2) then avg-pool (stride 2): HF
    Qwen2AudioEncoder._get_feat_extract_output_lengths."""
    feat_lengths = (input_lengths - 1) // 2 + 1
    output_lengths = (feat_lengths - 2) // 2 + 1
    return feat_lengths, output_lengths


def encode_audio(
    params: dict,
    input_features: jax.Array,  # [B, mel, T]
    config: Qwen2AudioConfig,
    compute_dtype=jnp.bfloat16,
    remat_mode: str = "none",
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """Audio tower -> avg pool (2) -> final LN -> projector. [B, T//4, hidden]."""
    h = whisper_encoder.forward(
        params["audio_tower"], input_features, config.audio_config,
        compute_dtype=compute_dtype, causal=True, remat_mode=remat_mode,
        use_pallas=use_pallas, apply_final_layer_norm=False,
    )  # [B, T', D]
    B, T, D = h.shape
    # avg_pool1d(kernel 2, stride 2) over time
    h = h[:, : (T // 2) * 2].reshape(B, T // 2, 2, D).mean(axis=2)
    h = whisper_encoder.layer_norm(
        h,
        params["audio_tower"]["layer_norm"]["weight"],
        params["audio_tower"]["layer_norm"]["bias"],
        config.audio_config.layer_norm_eps,
    )
    proj = params["multi_modal_projector"]["linear"]
    return linear(h, proj["weight"].astype(compute_dtype),
                  proj["bias"].astype(compute_dtype))


def merge_audio_into_text(
    text_embeds: jax.Array,  # [B, L, E]
    audio_embeds: jax.Array,  # [B, Ta, E] (row b's audio)
    input_ids: jax.Array,  # [B, L]
    audio_token_index: int,
) -> jax.Array:
    """Place row b's j-th audio frame at row b's j-th <|AUDIO|> position."""
    mask = input_ids == audio_token_index  # [B, L]
    idx = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1  # j-th audio token
    idx = jnp.clip(idx, 0, audio_embeds.shape[1] - 1)
    gathered = jnp.take_along_axis(audio_embeds, idx[..., None], axis=1)
    return jnp.where(mask[..., None], gathered, text_embeds)


def forward(
    params: dict,
    *,
    input_ids: Optional[jax.Array] = None,
    input_features: Optional[jax.Array] = None,  # [B, mel, T]
    feature_attention_mask: Optional[jax.Array] = None,
    inputs_embeds: Optional[jax.Array] = None,
    segment_ids: Optional[jax.Array] = None,
    position_ids: Optional[jax.Array] = None,
    config: Qwen2AudioConfig,
    compute_dtype=jnp.bfloat16,
    attn_fn: Optional[Callable] = None,
    remat_mode: str = "none",
    selective_ac_option: str = "op",
    block_q: int = 512,
    block_kv: int = 512,
    shard_fn: Optional[Callable] = None,
) -> jax.Array:
    lm = params["language_model"]
    if inputs_embeds is None:
        inputs_embeds = jnp.take(
            lm["model"]["embed_tokens"]["weight"], input_ids, axis=0
        ).astype(compute_dtype)
        if input_features is not None:
            audio_embeds = encode_audio(
                params, input_features, config, compute_dtype, remat_mode
            )
            inputs_embeds = merge_audio_into_text(
                inputs_embeds, audio_embeds, input_ids, config.audio_token_index
            )
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
    )


def get_num_params(config: Qwen2AudioConfig, exclude_embedding: bool = False) -> int:
    d = config.audio_config.d_model
    hidden = config.text_config.hidden_size
    return (
        whisper_encoder.get_num_params(config.audio_config)
        + d * hidden + hidden  # projector
        + modeling_llama.get_num_params(config.text_config, exclude_embedding)
    )


def get_num_flop_per_token(num_params, config: Qwen2AudioConfig, seq_len: int):
    """Reference excludes speech-encoder flops (qwen2_audio/__init__.py:
    get_num_flop_per_token)."""
    tc = config.text_config
    return 6 * num_params + 12 * tc.num_hidden_layers * (
        tc.num_attention_heads * tc.head_dim
    ) * seq_len

