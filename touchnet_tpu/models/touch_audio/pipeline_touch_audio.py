# Copyright (c) 2026 touchnet_tpu authors.
# Pipeline-parallel TouchAudioForCausalLM forward.
#
# BEYOND reference parity: the reference pipelines only llama (its
# touchnet/models/llama/pipeline_llama.py:31-337 is the sole pipelining_fn;
# touch_audio ships FSDP/TP/CP but no PP). Here the multimodal fusion —
# inputs_embeds = projector(input_features) + embed_tokens(input_ids),
# reference modeling_touch_audio.py:19-155 — runs in the SPMD preamble
# OUTSIDE the tick loop (exactly like embed/head in pipeline_llama: every
# per-position tensor shards identically on (dp, cp), so the fusion is
# schedule-orthogonal), and the text backbone pipelines unchanged via
# pipeline_llama.pipeline_forward(inputs_embeds=...). This also means the
# reference's one real motive for unequal stage splits (a fusion-heavy
# first stage) never arises.

from typing import Optional

import jax
import jax.numpy as jnp

from touchnet_tpu.models.common import linear
from touchnet_tpu.models.llama import pipeline_llama
from touchnet_tpu.models.touch_audio.configuration_touch_audio import (
    TouchAudioConfig,
)


def pipeline_forward(
    params: dict,
    *,
    input_ids: Optional[jax.Array] = None,
    input_features: Optional[jax.Array] = None,
    inputs_embeds: Optional[jax.Array] = None,
    segment_ids: Optional[jax.Array] = None,
    position_ids: Optional[jax.Array] = None,
    config: TouchAudioConfig,
    mesh,
    n_microbatches: Optional[int] = None,
    compute_dtype=jnp.bfloat16,
    remat_mode: str = "full",
    block_q: int = 512,
    block_kv: int = 512,
    shard_fn=None,
    schedule: str = "1F1B",
    split_points: Optional[str] = None,
    rotate_method: str = "allgather",
) -> jax.Array:
    """Pipelined logits [B, T, V] for the projector+backbone model."""
    lm = params["language_model"]
    if inputs_embeds is None:
        parts = []
        if input_ids is not None:
            parts.append(
                pipeline_llama.embed_tokens_sharded(
                    lm["model"], input_ids, mesh
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
    return pipeline_llama.pipeline_forward(
        lm,
        inputs_embeds=inputs_embeds,
        segment_ids=segment_ids,
        position_ids=position_ids,
        config=config.text_config,
        mesh=mesh,
        n_microbatches=n_microbatches,
        compute_dtype=compute_dtype,
        remat_mode=remat_mode,
        block_q=block_q,
        block_kv=block_kv,
        shard_fn=shard_fn,
        schedule=schedule,
        split_points=split_points,
        rotate_method=rotate_method,
    )
