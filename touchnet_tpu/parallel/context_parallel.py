# Copyright (c) 2026 touchnet_tpu authors.
# Sharded attention: shard_map wrapper dispatching the Pallas kernel across
# the mesh, with context-parallel sequence sharding.
#
# Capability parity: reference context parallel (torch experimental ring
# attention ctx manager, touchnet/utils/distributed.py:292-346) supports two
# KV rotation methods: "allgather" (gather KV once, compute locally) and
# "alltoall" (ring). This module implements the allgather method via
# lax.all_gather over the "cp" axis (XLA turns it into ICI collectives and
# its transpose into reduce-scatter on the backward pass); the Pallas ring
# kernel (ops/ring_attention.py) serves the alltoall method.
#
# The wrapper also carries the TP head sharding: inside shard_map each device
# sees [B/dp, T/cp, H/tp, D] and runs the kernel locally — this is how a
# Pallas custom call composes with GSPMD (explicit collectives around an
# opaque kernel).

import functools
from typing import Optional

import jax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from touchnet_tpu.ops.attention import flash_attention

BATCH = ("dp_replicate", "dp_shard")


def cp_local_attn(
    q, k, v, seg, *, cp: int, rotate_method: str = "allgather",
    block_q: int = 512, block_kv: int = 512, use_pallas=None,
    interpret: bool = False, dynamic=None,
):
    """LOCAL-frame CP attention: the body every shard_map with an active
    "cp" axis runs per shard — both make_sharded_attn_fn below and the PP
    stage body (models/llama/pipeline_llama.py), so a rotation fix lands in
    one place. q/k/v are this shard's [B, T/cp, H, D] slice; allgather
    rotation gathers KV (+ kv segment ids) across cp with q_offset keeping
    global causal positions right; alltoall runs the ring kernel in its
    nestable form (ring_attention_sharded wraps its OWN shard_map and
    cannot run inside another one)."""
    if cp > 1:
        if rotate_method == "alltoall":
            from touchnet_tpu.ops.ring_attention import (
                make_ring_attention,
                ring_attention_jnp,
            )

            if use_pallas:
                ring = make_ring_attention(
                    "cp", cp, block_q=block_q, block_kv=block_kv
                )
                return ring(q, k, v, seg, seg)
            return ring_attention_jnp(q, k, v, seg, seg, "cp", cp)
        k_full = jax.lax.all_gather(k, "cp", axis=1, tiled=True)
        v_full = jax.lax.all_gather(v, "cp", axis=1, tiled=True)
        seg_full = jax.lax.all_gather(seg, "cp", axis=1, tiled=True)
        q_off = jax.lax.axis_index("cp") * q.shape[1]
        return flash_attention(
            q, k_full, v_full, seg,
            kv_segment_ids=seg_full, q_offset=q_off,
            block_q=block_q, block_kv=block_kv,
            use_pallas=use_pallas, interpret=interpret, dynamic=dynamic,
        )
    return flash_attention(
        q, k, v, seg, block_q=block_q, block_kv=block_kv,
        use_pallas=use_pallas, interpret=interpret, dynamic=dynamic,
    )


def make_sharded_attn_fn(
    mesh: Optional[Mesh],
    block_q: int = 512,
    block_kv: int = 512,
    rotate_method: str = "allgather",
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
    layout: str = "bthd",
):
    """Returns attn(q, k, v, segment_ids) -> out, partitioned over the mesh.

    layout "bthd" (default): q [B, T, H, D], k/v [B, T, Hkv, D], dispatched
    to the dynamic-trip kernels. The ring/alltoall rotate method always
    uses this layout (the ring kernel owns its IO). Default since r4: the
    step-level chip sweep rejected grouped IO (344.4 vs 371.7 ms/step at
    the bench shape — see modeling_llama._default_attn).

    layout "grouped" (opt-in, the kernel-native IO — see ops/attention.py
    flash_attention_grouped): q [B, Hkv, G, T, D], k/v [B, Hkv, S, D];
    sharding: batch on dp, kv-heads on tp, sequence on cp. The returned fn
    carries .layout = "grouped" so decoder layers emit/consume the kernel
    layout directly from their projection einsums.

    Both layouts shard k/v heads by tp, so the divisibility constraint
    (Hkv % tp == 0) is unchanged.
    """
    cp = mesh.shape.get("cp", 1) if mesh is not None else 1

    if rotate_method == "alltoall" and cp > 1:
        from touchnet_tpu.ops.ring_attention import ring_attention_sharded

        return ring_attention_sharded(
            mesh, block_q=block_q, block_kv=block_kv,
            use_pallas=use_pallas, interpret=interpret,
        )

    if layout == "grouped":
        return _make_grouped_attn_fn(
            mesh, cp, block_q, block_kv, use_pallas, interpret
        )

    if mesh is None:
        return lambda q, k, v, seg: flash_attention(
            q, k, v, seg, block_q=block_q, block_kv=block_kv,
            use_pallas=use_pallas, interpret=interpret,
        )

    qkv_spec = P(BATCH, "cp", "tp", None)
    seg_spec = P(BATCH, "cp")

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, seg_spec),
        out_specs=qkv_spec,
        check_vma=False,
    )
    def attn(q, k, v, seg):
        return cp_local_attn(
            q, k, v, seg, cp=cp, rotate_method="allgather",
            block_q=block_q, block_kv=block_kv,
            use_pallas=use_pallas, interpret=interpret,
        )

    return attn


def _make_grouped_attn_fn(mesh, cp, block_q, block_kv, use_pallas, interpret):
    from touchnet_tpu.ops.attention import flash_attention_grouped

    if mesh is None:
        fn = lambda q, k, v, seg: flash_attention_grouped(  # noqa: E731
            q, k, v, seg, block_q=block_q, block_kv=block_kv,
            use_pallas=use_pallas, interpret=interpret,
        )
        fn.layout = "grouped"
        return fn

    qg_spec = P(BATCH, "tp", None, "cp", None)
    kh_spec = P(BATCH, "tp", "cp", None)
    seg_spec = P(BATCH, "cp")

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(qg_spec, kh_spec, kh_spec, seg_spec),
        out_specs=qg_spec,
        check_vma=False,
    )
    def attn(q, k, v, seg):
        if cp > 1:
            k_full = jax.lax.all_gather(k, "cp", axis=2, tiled=True)
            v_full = jax.lax.all_gather(v, "cp", axis=2, tiled=True)
            seg_full = jax.lax.all_gather(seg, "cp", axis=1, tiled=True)
            q_off = jax.lax.axis_index("cp") * q.shape[3]
            return flash_attention_grouped(
                q, k_full, v_full, seg,
                kv_segment_ids=seg_full, q_offset=q_off,
                block_q=block_q, block_kv=block_kv,
                use_pallas=use_pallas, interpret=interpret,
            )
        return flash_attention_grouped(
            q, k, v, seg, block_q=block_q, block_kv=block_kv,
            use_pallas=use_pallas, interpret=interpret,
        )

    def tagged(q, k, v, seg):
        return attn(q, k, v, seg)

    tagged.layout = "grouped"
    return tagged
