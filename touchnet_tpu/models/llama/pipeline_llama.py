# Copyright (c) 2026 touchnet_tpu authors.
# Pipeline-parallel Llama forward.
#
# Capability parity: reference touchnet/models/llama/pipeline_llama.py
# (llama is the only family with a pipelining_fn, SURVEY.md §2.7). The
# stacked-layer scan layout makes stage splitting a sharding annotation
# (P("pp", ...) on the layer axis) instead of per-rank module surgery; the
# skewed SPMD schedule lives in parallel/pipeline.py. FSDP composes: layer
# params keep their fsdp-axis sharding alongside "pp" and are all-gathered
# per layer inside the stage body (pp_param_rules + make_layer_gather).

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from touchnet_tpu.models.common import linear, rms_norm, rope_frequencies
from touchnet_tpu.models.llama.configuration_llama import LlamaConfig
from touchnet_tpu.models.llama.modeling_llama import decoder_layer
from touchnet_tpu.parallel.pipeline import (
    make_layer_gather,
    parse_split_points,
    pipeline_apply,
    stage_layer_counts,
    virtual_stages_of,
)


def embed_tokens_sharded(mp: dict, input_ids: jax.Array, mesh) -> jax.Array:
    """Token-embedding take with the same gather-cliff avoidance as
    forward(): vocab stays tp-sharded, E gathers before the take
    (sharding.py ACTIVATION_SPECS notes). Shared with the touch_audio
    pipelining path."""
    from jax.sharding import NamedSharding

    from touchnet_tpu.parallel.sharding import (
        ACTIVATION_SPECS, _shrink_spec_to_shape,
    )

    table = mp["embed_tokens"]["weight"]
    table = jax.lax.with_sharding_constraint(
        table, NamedSharding(mesh, _shrink_spec_to_shape(
            ACTIVATION_SPECS["embed_table"], table.shape, mesh
        )),
    )
    return jnp.take(table, input_ids, axis=0)


def pipeline_forward(
    params: dict,
    *,
    input_ids: Optional[jax.Array] = None,
    inputs_embeds: Optional[jax.Array] = None,
    segment_ids: Optional[jax.Array] = None,
    position_ids: Optional[jax.Array] = None,
    config: LlamaConfig,
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
    """Pipelined logits [B, T, V]. Microbatch count defaults to pp degree
    (reference build_pipeline_schedule default)."""
    S = mesh.shape["pp"]
    if n_microbatches is None:
        n_microbatches = S
    V = virtual_stages_of(
        split_points, config.num_hidden_layers, S, schedule
    )
    parse_split_points(split_points, config.num_hidden_layers, S, V)
    mp = params["model"]
    if inputs_embeds is None:
        inputs_embeds = embed_tokens_sharded(mp, input_ids, mesh)
    h = inputs_embeds.astype(compute_dtype)
    B, T, _ = h.shape
    if position_ids is None:
        position_ids = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    if segment_ids is None:
        segment_ids = jnp.ones((B, T), jnp.int32)
    inv_freq = rope_frequencies(config.head_dim, config.rope_theta,
                                rope_scaling=config.rope_scaling)

    use_pallas = jax.default_backend() == "tpu"
    cp = mesh.shape.get("cp", 1)

    def attn(q, k, v, seg):
        # inside shard_map: the shared LOCAL-frame CP body (falls back to
        # the dense reference off-TPU). pp x cp: h enters the lockstep loop
        # sequence-sharded on "cp" (pipeline_apply h_spec), so the stage
        # body runs the same two CP methods as the non-pp path —
        # cp_local_attn is the single definition both paths share.
        # Reference composability: touchnet/bin/train.py:354-391 (the CP
        # context shards buffers per-batch, independent of schedule). bthd
        # dynamic-trip kernels: the r4 chip sweep rejected grouped IO at
        # step level (see modeling_llama._default_attn).
        from touchnet_tpu.parallel.context_parallel import cp_local_attn

        return cp_local_attn(
            q, k, v, seg, cp=cp, rotate_method=rotate_method,
            block_q=block_q, block_kv=block_kv,
            use_pallas=use_pallas, dynamic=True,
        )

    # specs of the stacked layer params (pp on the layer axis + fsdp on the
    # weight dims) drive both the shard_map in_specs and the per-layer gather
    from touchnet_tpu.parallel.sharding import LLAMA_PARAM_RULES, param_shardings

    # Non-divisible layer counts: tail-pad the stack to S*V*K BEFORE the
    # specs are derived — param_shardings shrinks a "pp" entry off any dim
    # the mesh can't divide, which would hand every stage the FULL stack.
    # Storage-level shardings (named_shardings on the unpadded [L] params)
    # shrink the same way, so off-divisible stacks are stored fsdp-sharded
    # but pp-replicated (a factor-S memory overhead on the stacked layers
    # only in this edge case); the pad is a local op at the shard_map edge.
    counts, _K = stage_layer_counts(config.num_hidden_layers, S, V)
    needs_mask = config.num_hidden_layers % (S * V) != 0
    layers_stacked = mp["layers"]
    if needs_mask:
        lpad = S * V * _K - config.num_hidden_layers
        layers_stacked = jax.tree.map(
            lambda x: jnp.pad(x, [(0, lpad)] + [(0, 0)] * (x.ndim - 1)),
            layers_stacked,
        )
    layer_specs = param_shardings(
        layers_stacked, mesh, pp_param_rules(LLAMA_PARAM_RULES)
    )
    # PP x TP (reference applies the TP plan per pipeline stage,
    # touchnet/bin/train.py:217-254): inside the stage body the tp weight
    # shards stay LOCAL (gather skips "tp"), each rank computes its own
    # H/tp heads / inter/tp features, and ONE raw lax.psum over "tp" after
    # the row-parallel projections (o_proj, down_proj — the decoder_layer
    # shard_fn hook sits exactly there) completes the Megatron pair. AD is
    # exact without custom_vjp: psum transposes to psum, the shard_map
    # in-boundary psums replicated-input cotangents over "tp", and the
    # out-boundary's 1/tp cotangent scaling cancels against the forward
    # pp-psum's transpose — validated by the pp x tp golden-grad tests.
    tp = mesh.shape.get("tp", 1)
    stage_config = config
    if tp > 1:
        H, Hkv = config.num_attention_heads, config.num_key_value_heads
        if H % tp or Hkv % tp:
            raise NotImplementedError(
                f"pp x tp needs heads divisible by tp: H={H}, Hkv={Hkv}, tp={tp}"
            )
        import dataclasses

        stage_config = dataclasses.replace(
            config, num_attention_heads=H // tp, num_key_value_heads=Hkv // tp
        )
    gather = make_layer_gather(
        layer_specs, mesh, keep_axes=("tp",) if tp > 1 else ()
    )
    stage_shard_fn = (
        (lambda a, kind: jax.lax.psum(a, "tp") if kind == "btd" else a)
        if tp > 1
        else (lambda a, kind: a)
    )

    # the stage body masks slot j >= counts[stage] to an identity relay so
    # the padded (zero) weights see exactly-zero grads
    counts_arr = jnp.asarray(counts, jnp.int32)

    def stage_fn(layers_local, x, extras, stage_idx):
        layer = functools.partial(
            decoder_layer,
            cos_sin_posids=extras["position_ids"],
            segment_ids=extras["segment_ids"],
            config=stage_config,
            attn_fn=attn,
            inv_freq=inv_freq,
            shard_fn=stage_shard_fn,
        )

        if not needs_mask:  # divisible: keep the hot path mask-free
            def body(carry, lp):
                lp = gather(lp)  # FSDP all-gather; re-gathered in backward
                lp = jax.tree.map(lambda p: p.astype(compute_dtype), lp)
                return layer(carry, lp), None

            x, _ = jax.lax.scan(body, x, layers_local)
            return x

        count = counts_arr[stage_idx]

        def body(carry, inp):
            lp, j = inp
            lp = gather(lp)
            lp = jax.tree.map(lambda p: p.astype(compute_dtype), lp)
            y = layer(carry, lp)
            return jnp.where(j < count, y, carry), None

        n_slots = jax.tree.leaves(layers_local)[0].shape[0]
        x, _ = jax.lax.scan(
            body, x, (layers_local, jnp.arange(n_slots, dtype=jnp.int32))
        )
        return x

    h = pipeline_apply(
        mesh, stage_fn, layers_stacked, h,
        {"segment_ids": segment_ids, "position_ids": position_ids},
        n_microbatches, remat=(remat_mode != "none"),
        layer_specs=layer_specs, schedule=schedule, virtual_stages=V,
        # ring CP puts ppermutes inside the stage body: see pipeline_apply
        cond_skip=not (cp > 1 and rotate_method == "alltoall"),
    )
    h = rms_norm(h, mp["norm"]["weight"].astype(compute_dtype), config.rms_norm_eps)
    head_w = (
        mp["embed_tokens"]["weight"]
        if config.tie_word_embeddings
        else params["lm_head"]["weight"]
    )
    return linear(h, head_w.astype(compute_dtype))


def pp_param_rules(base_rules):
    """Stage split as sharding: layer-stack params get "pp" on the stacked
    dim while KEEPING their fsdp entries on the weight dims (pp x dp_shard
    composition); non-layer params (embed/head/final norm) follow the base
    rules — the reference pins them to first/last ranks, SPMD shards them
    on fsdp and replicates across pp instead."""
    from jax.sharding import PartitionSpec as P

    rules = []
    for pat, spec in base_rules:
        entries = tuple(spec)
        # stacked layer rules are written against the [L, ...] layout: the
        # leading entry is None (the L dim) followed by the weight dims
        # (sharding.py LLAMA_PARAM_RULES); non-layer params (embed/head:
        # leading tp; final norm/biases: 1-entry specs) pass through. The
        # touch_audio projector is 2-D [E, audio_in] but NOT stacked — it
        # runs in the fused-embeds SPMD preamble outside the tick loop
        if "projector" in pat:
            rules.append((pat, spec))
        elif entries and entries[0] is None and len(entries) >= 2:
            rules.append((pat, P("pp", *entries[1:])))
        else:
            rules.append((pat, spec))
    # q/k/v biases follow their column-parallel weights: under pp x tp the
    # stage computes on its own head slice, so the bias must be sliced too
    from touchnet_tpu.parallel.sharding import TP_AXIS

    rules.insert(0, (r".*self_attn/(q|k|v)_proj/bias", P("pp", TP_AXIS)))
    # catch-all for layer params the base rules miss
    rules.append((r".*layers/.*", P("pp")))
    return rules
