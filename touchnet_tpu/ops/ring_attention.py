# Copyright (c) 2026 touchnet_tpu authors.
# Ring attention: context parallelism with rotating KV chunks.
#
# Capability parity: the reference's context-parallel "alltoall" rotate
# method (torch.distributed.tensor.experimental.context_parallel with
# set_rotate_method("alltoall"), touchnet/utils/distributed.py:292-346).
# TPU-native design: Q stays sequence-sharded on the "cp" mesh axis; K/V
# chunks rotate around the ring via lax.ppermute (ICI neighbor exchange)
# while each step runs the local Pallas flash kernel with the right
# (q_offset, kv_offset) so causal + packed-segment masking stays globally
# correct. Partial results combine in fp32 log-sum-exp space
# (num/den/max running triplet). Backward is a second ring pass: dq
# accumulates locally; dK/dV accumulate in buffers that rotate WITH their
# KV chunks, arriving home after a full cycle — the ppermute traffic
# overlaps with the per-step kernels (RingAttention, arXiv:2310.01889).

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from touchnet_tpu.ops.attention import _bwd_pallas, _fwd_pallas

NEG_INF = -jnp.inf
BATCH = ("dp_replicate", "dp_shard")


def _partial_reference(q, k, v, q_seg, kv_seg, q_off, kv_off, causal, scale):
    """Dense partial attention returning (out [B,T,H,D] f32, lse [B,T,H])."""
    s = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    B, T = q.shape[0], q.shape[1]
    S = k.shape[1]
    mask = q_seg[:, None, :, None] == kv_seg[:, None, None, :]
    if causal:
        rows = q_off + jnp.arange(T)[:, None]
        cols = kv_off + jnp.arange(S)[None, :]
        mask = mask & (rows >= cols)[None, None]
    s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=-1)  # [B,H,T]
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(s - m_safe[..., None])
    p = jnp.where(jnp.isfinite(s), p, 0.0)
    l = jnp.sum(p, axis=-1)  # [B,H,T]
    out = jnp.einsum("bhts,bshd->bthd", p, v.astype(jnp.float32))
    l_safe = jnp.where(l == 0.0, 1.0, l)
    out = out / l_safe.transpose(0, 2, 1)[..., None]
    lse = jnp.where(l == 0.0, NEG_INF, m_safe + jnp.log(l_safe))
    return out, lse.transpose(0, 2, 1)  # [B,T,H]


def _combine(num, den, m, out_p, lse_p):
    """Running lse-space combine. num [B,T,H,D] f32, den/m [B,T,H]."""
    m_new = jnp.maximum(m, lse_p)
    m_new_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    alpha = jnp.where(jnp.isfinite(m), jnp.exp(m - m_new_safe), 0.0)
    beta = jnp.where(jnp.isfinite(lse_p), jnp.exp(lse_p - m_new_safe), 0.0)
    num = num * alpha[..., None] + out_p * beta[..., None]
    den = den * alpha + beta
    return num, den, m_new


def _rotate(xs, axis_name, n):
    perm = [(p, (p + 1) % n) for p in range(n)]
    return [jax.lax.ppermute(x, axis_name, perm) for x in xs]


# ---------------------------------------------------------------------------
# Differentiable jnp ring (CPU / fallback; autodiff goes through ppermute)
# ---------------------------------------------------------------------------


def ring_attention_jnp(q, k, v, q_seg, kv_seg, axis_name, n, causal=True,
                       scale=None):
    i = jax.lax.axis_index(axis_name)
    Tq, Tkv = q.shape[1], k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    q_off = i * Tq
    B, T, H, D = q.shape
    num = jnp.zeros((B, T, H, D), jnp.float32)
    den = jnp.zeros((B, T, H), jnp.float32)
    m = jnp.full((B, T, H), NEG_INF, jnp.float32)
    k_c, v_c, seg_c = k, v, kv_seg
    for s_i in range(n):
        j = (i - s_i) % n
        kv_off = j * Tkv
        k_full = k_c if k_c.shape[2] == H else jnp.repeat(
            k_c, H // k_c.shape[2], axis=2
        )
        v_full = v_c if v_c.shape[2] == H else jnp.repeat(
            v_c, H // v_c.shape[2], axis=2
        )
        out_p, lse_p = _partial_reference(
            q, k_full, v_full, q_seg, seg_c, q_off, kv_off, causal, scale
        )
        num, den, m = _combine(num, den, m, out_p, lse_p)
        if s_i + 1 < n:
            k_c, v_c, seg_c = _rotate([k_c, v_c, seg_c], axis_name, n)
    den_safe = jnp.where(den == 0.0, 1.0, den)
    return (num / den_safe[..., None]).astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas ring with custom VJP (TPU path)
# ---------------------------------------------------------------------------


def _offsets(q_off, kv_off):
    return jnp.stack([jnp.asarray(q_off, jnp.int32).reshape(()),
                      jnp.asarray(kv_off, jnp.int32).reshape(())])


def _ring_fwd(q, k, v, q_seg, kv_seg, axis_name, n, causal, scale, block_q,
              block_kv, interpret):
    i = jax.lax.axis_index(axis_name)
    Tq, Tkv = q.shape[1], k.shape[1]
    B, T, H, D = q.shape
    q_off = i * Tq
    num = jnp.zeros((B, T, H, D), jnp.float32)
    den = jnp.zeros((B, T, H), jnp.float32)
    m = jnp.full((B, T, H), NEG_INF, jnp.float32)
    k_c, v_c, seg_c = k, v, kv_seg
    for s_i in range(n):
        j = (i - s_i) % n
        out_p, lse_p = _fwd_pallas(
            q, k_c, v_c, q_seg, seg_c, _offsets(q_off, j * Tkv), causal,
            scale, block_q, block_kv, interpret,
        )  # out [B,T,H,D], lse [B,Hkv,G,T]
        Bp, Hkv, G, Tp = lse_p.shape
        lse_p = lse_p.transpose(0, 3, 1, 2).reshape(Bp, Tp, Hkv * G)  # [B,T,H]
        num, den, m = _combine(num, den, m, out_p.astype(jnp.float32), lse_p)
        if s_i + 1 < n:
            k_c, v_c, seg_c = _rotate([k_c, v_c, seg_c], axis_name, n)
    den_safe = jnp.where(den == 0.0, 1.0, den)
    out = (num / den_safe[..., None]).astype(q.dtype)
    final_lse = jnp.where(den == 0.0, NEG_INF, m + jnp.log(den_safe))  # [B,T,H]
    return out, final_lse


def _ring_bwd(q, k, v, q_seg, kv_seg, out, final_lse, dout, axis_name, n,
              causal, scale, block_q, block_kv, interpret):
    i = jax.lax.axis_index(axis_name)
    Tq, Tkv = q.shape[1], k.shape[1]
    q_off = i * Tq
    # lse in kernel layout [B,Hkv,G,T]; padding rows with -inf lse would make
    # exp(s - lse) explode — clamp to 0 (their p is masked to 0 anyway)
    Hkv = k.shape[2]
    H = q.shape[2]
    G = H // Hkv
    lse_k = jnp.where(jnp.isfinite(final_lse), final_lse, 0.0)
    Bq, Tq_, _ = lse_k.shape
    lse_k = lse_k.reshape(Bq, Tq_, Hkv, G).transpose(0, 2, 3, 1)
    dq_acc = jnp.zeros(q.shape, jnp.float32)
    k_c, v_c, seg_c = k, v, kv_seg
    dk_c = jnp.zeros(k.shape, jnp.float32)
    dv_c = jnp.zeros(v.shape, jnp.float32)
    for s_i in range(n):
        j = (i - s_i) % n
        dq_p, dk_p, dv_p = _bwd_pallas(
            q, k_c, v_c, q_seg, seg_c, _offsets(q_off, j * Tkv), out, lse_k,
            dout, causal, scale, block_q, block_kv, interpret,
        )
        dq_acc = dq_acc + dq_p.astype(jnp.float32)
        dk_c = dk_c + dk_p.astype(jnp.float32)
        dv_c = dv_c + dv_p.astype(jnp.float32)
        # rotate KV together with its gradient accumulators; after n rotations
        # in total the buffers return to their owners
        k_c, v_c, seg_c, dk_c, dv_c = _rotate(
            [k_c, v_c, seg_c, dk_c, dv_c], axis_name, n
        )
    return dq_acc.astype(q.dtype), dk_c.astype(k.dtype), dv_c.astype(v.dtype)


def make_ring_attention(axis_name: str, n: int, causal=True, scale=None,
                        block_q=512, block_kv=512, interpret=False):
    """Ring attention over `axis_name` (size n), Pallas kernels + custom VJP.
    Call INSIDE shard_map. Local sequence lengths must be multiples of the
    (clamped) block sizes."""

    def blocks(Tq, Tkv):
        bq = min(block_q, Tq)
        bkv = min(block_kv, Tkv)
        assert Tq % bq == 0 and Tkv % bkv == 0, (
            f"ring attention needs block-divisible local lengths: "
            f"Tq={Tq} bq={bq} Tkv={Tkv} bkv={bkv}"
        )
        return bq, bkv

    @functools.partial(jax.custom_vjp, nondiff_argnums=())
    def ring(q, k, v, q_seg, kv_seg):
        sc = scale if scale is not None else 1.0 / math.sqrt(q.shape[-1])
        bq, bkv = blocks(q.shape[1], k.shape[1])
        out, _ = _ring_fwd(q, k, v, q_seg, kv_seg, axis_name, n, causal, sc,
                           bq, bkv, interpret)
        return out

    def fwd(q, k, v, q_seg, kv_seg):
        sc = scale if scale is not None else 1.0 / math.sqrt(q.shape[-1])
        bq, bkv = blocks(q.shape[1], k.shape[1])
        out, lse = _ring_fwd(q, k, v, q_seg, kv_seg, axis_name, n, causal, sc,
                             bq, bkv, interpret)
        return out, (q, k, v, q_seg, kv_seg, out, lse)

    def bwd(res, dout):
        q, k, v, q_seg, kv_seg, out, lse = res
        sc = scale if scale is not None else 1.0 / math.sqrt(q.shape[-1])
        bq, bkv = blocks(q.shape[1], k.shape[1])
        dq, dk, dv = _ring_bwd(q, k, v, q_seg, kv_seg, out, lse, dout,
                               axis_name, n, causal, sc, bq, bkv, interpret)
        return dq, dk, dv, None, None

    ring.defvjp(fwd, bwd)
    return ring


def ring_attention_sharded(
    mesh: Mesh,
    block_q: int = 1024,
    block_kv: int = 1024,
    causal: bool = True,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
):
    """attn(q, k, v, segment_ids) over the mesh with ring CP on "cp"."""
    n = mesh.shape.get("cp", 1)
    qkv_spec = P(BATCH, "cp", "tp", None)
    seg_spec = P(BATCH, "cp")
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, seg_spec),
        out_specs=qkv_spec, check_vma=False,
    )
    def attn(q, k, v, seg):
        if seg is None:
            seg = jnp.ones(q.shape[:2], jnp.int32)
        if use_pallas or interpret:
            ring = make_ring_attention(
                "cp", n, causal=causal, block_q=block_q, block_kv=block_kv,
                interpret=interpret,
            )
            return ring(q, k, v, seg, seg)
        return ring_attention_jnp(q, k, v, seg, seg, "cp", n, causal=causal)

    def wrapper(q, k, v, segment_ids):
        if segment_ids is None:
            segment_ids = jnp.ones(q.shape[:2], jnp.int32)
        return attn(q, k, v, segment_ids.astype(jnp.int32))

    return wrapper

