# Copyright (c) 2026 touchnet_tpu authors.
# Pipeline parallelism: microbatched stage pipeline over the "pp" mesh axis.
#
# Capability parity: reference PP (touchnet/models/llama/pipeline_llama.py:
# 31-337 + utils/distributed.py:496-667 — manual layer-range split,
# PipelineStage + 1F1B/Interleaved/ZBV schedules over NCCL P2P). TPU-native
# re-design: there is no per-rank model surgery — the SAME program runs on
# every device under shard_map; each stage holds layers[stage::] via a
# P("pp") sharding on the stacked layer axis, activations move stage->stage
# with lax.ppermute, and the schedule is a GPipe loop of
# (microbatches + stages - 1) ticks. Backward is jax autodiff through the
# loop (ppermute transposes to the reverse ring), with jax.checkpoint on the
# stage body standing in for the reference's per-stage AC. The reference's
# named schedules (1F1B/Interleaved/ZBV) map to this single SPMD schedule —
# XLA overlaps the collective-permute with stage compute; zero-bubble
# scheduling is a future kernel-level optimization.
#
# Composition: pp x (dp_replicate, dp_shard as pure replication/batch
# sharding). TP/CP inside the pipeline body would need manual collectives
# (GSPMD does not partition inside shard_map) — asserted out for now; the
# reference's llama recipes likewise run PP with FSDP-only.

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

BATCH = ("dp_replicate", "dp_shard")


def pipeline_apply(
    mesh: Mesh,
    stage_fn: Callable,  # (local_layers, h [b,T,E], extras_microbatch) -> h
    params_layers,  # stacked [L, ...] pytree, sharded P("pp") on dim 0
    h: jax.Array,  # [B, T, E] embedded inputs (replicated over pp)
    extras,  # pytree of [B, T, ...] per-position arrays (seg/pos ids)
    n_microbatches: int,
    remat: bool = True,
):
    """GPipe pipeline: returns h_out [B, T, E] (last stage's results,
    replicated across pp)."""
    S = mesh.shape["pp"]
    M = n_microbatches
    B = h.shape[0]
    assert B % M == 0, f"batch {B} not divisible by microbatches {M}"

    layer_spec = jax.tree.map(lambda _: P("pp"), params_layers)
    h_spec = P(None, BATCH, None, None)  # [M, b, T, E]
    extras_spec = jax.tree.map(lambda _: P(None, BATCH), extras)

    body = stage_fn
    if remat:
        body = jax.checkpoint(stage_fn, prevent_cse=False)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(layer_spec, h_spec, extras_spec),
        out_specs=h_spec,
        check_vma=False,
    )
    def run(layers_local, h_micro, extras_micro):
        # h_micro: [M, b, T, E] local to this device's (dp, ...) coords
        s = jax.lax.axis_index("pp")
        M_, b, T, E = h_micro.shape
        fwd_perm = [(p, p + 1) for p in range(S - 1)]

        def tick(carry, t):
            recv, outs = carry
            # stage 0 consumes microbatch t; others consume what they received
            mb = jax.lax.dynamic_index_in_dim(
                h_micro, jnp.clip(t, 0, M_ - 1), axis=0, keepdims=False
            )
            x = jnp.where(s == 0, mb, recv)
            # the microbatch THIS stage processes at tick t is m = t - s
            m_here = jnp.clip(t - s, 0, M_ - 1)
            ex = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, m_here, axis=0, keepdims=False
                ),
                extras_micro,
            )
            y = body(layers_local, x, ex)
            # last stage records microbatch (t - (S-1)) when valid
            m_out = t - (S - 1)
            valid = (s == S - 1) & (m_out >= 0) & (m_out < M_)
            outs = jax.lax.cond(
                valid,
                lambda o: jax.lax.dynamic_update_index_in_dim(
                    o, y, jnp.clip(m_out, 0, M_ - 1), axis=0
                ),
                lambda o: o,
                outs,
            )
            # forward the activation to the next stage
            recv = jax.lax.ppermute(y, "pp", fwd_perm)
            return (recv, outs), None

        outs = jnp.zeros_like(h_micro)
        recv = jnp.zeros((b, T, E), h_micro.dtype)
        # scan (not fori_loop): the tick loop must be reverse-differentiable
        (recv, outs), _ = jax.lax.scan(
            tick, (recv, outs), jnp.arange(M_ + S - 1)
        )
        # non-last stages hold zeros; psum broadcasts the last stage's
        # outputs to every pp rank so norm/head/loss compute identically
        outs = jax.lax.psum(outs, "pp")
        return outs

    h_micro = h.reshape(M, B // M, *h.shape[1:])
    extras_micro = jax.tree.map(
        lambda a: a.reshape(M, B // M, *a.shape[1:]), extras
    )
    out = run(params_layers, h_micro, extras_micro)
    return out.reshape(B, *h.shape[1:])


def validate_pp_composition(parallel_dims):
    assert not (parallel_dims.pp_enabled and (
        parallel_dims.tp_enabled or parallel_dims.cp_enabled
        or parallel_dims.dp_shard_enabled
    )), (
        "pipeline parallel currently composes with dp_replicate only "
        "(TP/CP/FSDP inside the pipeline body requires manual collectives); "
        "use pp x dp_replicate, or tp/cp/fsdp without pp"
    )
