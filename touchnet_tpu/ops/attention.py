# Copyright (c) 2026 touchnet_tpu authors.
# Packed-document flash attention for TPU (Pallas) with XLA fallback.
#
# Capability parity: the reference trains packed sequences with
# flex-attention document masks (segment-id attention_mask, SURVEY.md §5;
# touchnet/models/llama/processing_llama.py:24-104) and ring-attention
# context parallel (torch.distributed context_parallel, SURVEY.md §2.5). On
# TPU this becomes a block-wise flash attention kernel taking per-position
# segment ids with (causal AND same-segment) masking applied online —
# FlashAttention (arXiv:2205.14135) tiling with fp32 online-softmax
# accumulators feeding the MXU — plus a context-parallel wrapper
# (shard_map over the "cp" mesh axis) in touchnet_tpu/parallel/.
#
# Performance notes (tuned on a real v5e chip):
#   - GQA groups are processed INSIDE one kernel invocation: Q is viewed as
#     [B, Hkv, G, T, D] and each grid cell computes a (G*block_q, block_kv)
#     score tile against one shared KV block — K/V are DMAed once per GROUP
#     (not per query head) and the MXU sees G x taller matmuls;
#   - matmul inputs stay bf16 with fp32 accumulation
#     (preferred_element_type); softmax runs fp32 on the VPU in base-2 space
#     (log2(e) folded into the scale; lse converts to base-e at the kernel
#     boundary so ring combining / saved residuals see the usual contract);
#   - splash-style block sparsity from the packed-document structure: per
#     outer row, a compacted table of live block indices (not above the
#     causal diagonal, not a uniform-different-document pair) is scalar-
#     prefetched and consulted by the index maps; exhausted rows repeat the
#     last live index so skipped blocks cost zero DMA (revisiting elision)
#     and zero compute. Tiles fully interior to one document below the
#     diagonal also skip mask construction entirely (lax.cond);
#   - q_offset / kv_offset make all skip logic position-aware, so it
#     survives context parallelism (sharded Q over gathered or ring KV).
#
# Layout: public API is [B, T, H, D] (q) / [B, S, Hkv, D] (k, v) with
# segment_ids [B, T]/[B, S] int32 (0 = padding). `q_offset`/`kv_offset` give
# global positions for sequence-sharded Q/KV (context parallel).

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
# exp2 trick: fold log2(e) into the softmax scale so the VPU evaluates raw
# exp2 (one full-tile multiply cheaper per exponential than exp). Kernels run
# in base-2 space internally; the lse contract at the API stays base-e.
LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453
_MIN_LANE = 128

# dynamic-trip-count kernels are the default; the static-grid kernels are
# reachable per-call via flash_attention(dynamic=False) — exposed as
# attn_implementation="flash_static" in the model configs — for A/B timing
# and as a fallback if a runtime miscompiles the manual-DMA loops
USE_DYNAMIC_KERNELS = True
# the one-pass fused backward keeps whole-sequence dK/dV in VMEM scratch;
# above this byte budget the split (dq + dkv) kernels run instead. The
# budget is measured on the 128-lane-padded head dim (so 8k seq @ head 64
# -> 8 MiB still takes the fused path).
FUSED_BWD_VMEM_LIMIT = 9 * 2**20


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# XLA reference implementation (CPU tests / non-TPU backends / correctness)
# ---------------------------------------------------------------------------


def packed_attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    segment_ids: Optional[jax.Array],
    causal: bool = True,
    scale: Optional[float] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    q_offset=0,
    kv_offset=0,
) -> jax.Array:
    """Dense masked attention. q [B,T,H,D], k/v [B,S,Hkv,D] -> [B,T,H,D]."""
    B, T, H, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    if kv_segment_ids is None:
        kv_segment_ids = segment_ids
    if Hkv != H:
        assert H % Hkv == 0
        k = jnp.repeat(k, H // Hkv, axis=2)
        v = jnp.repeat(v, H // Hkv, axis=2)
    s = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32) * scale
    mask = jnp.ones((B, 1, T, S), dtype=jnp.bool_)
    if causal:
        rows = q_offset + jnp.arange(T)[:, None]
        cols = kv_offset + jnp.arange(S)[None, :]
        mask = mask & (rows >= cols)[None, None]
    if segment_ids is not None:
        mask = mask & (
            segment_ids.astype(jnp.int32)[:, None, :, None]
            == kv_segment_ids.astype(jnp.int32)[:, None, None, :]
        )
    s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", p.astype(v.dtype), v)
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Kernel helpers
# ---------------------------------------------------------------------------


def _row_positions(q_off, iq, block_q, group, block_kv):
    """Global sequence position of each row of the merged (G*bq, bkv) tile."""
    row = jax.lax.broadcasted_iota(jnp.int32, (group * block_q, block_kv), 0)
    return q_off + iq * block_q + row % block_q


def _tile_mask(q_seg, kv_seg, q_off, kv_off, iq, ikv, block_q, block_kv,
               group, causal):
    """(same segment) AND (causal) over the merged (G*bq, bkv) tile.
    Tiling happens in 2D (Mosaic supports sublane concatenation of 2D tiles
    but not 1D vector concat)."""
    seg_mask = q_seg[:, None] == kv_seg[None, :]  # [bq, bkv]
    mask = jnp.tile(seg_mask, (group, 1))  # [G*bq, bkv]
    if causal:
        rows = _row_positions(q_off, iq, block_q, group, block_kv)
        cols = kv_off + ikv * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, (group * block_q, block_kv), 1
        )
        mask = jnp.logical_and(mask, rows >= cols)
    return mask


def _tile_mask_t(q_seg, kv_seg, q_off, kv_off, iq, ikv, block_q, block_kv,
                 group, causal):
    """Transposed (bkv, G*bq) tile mask built directly (Mosaic cannot
    transpose boolean tiles)."""
    q_seg_row = jnp.tile(q_seg[None, :], (1, group))  # [1, G*bq] lane concat
    mask = kv_seg[:, None] == q_seg_row  # [bkv, G*bq]
    if causal:
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (block_kv, group * block_q), 1
        )
        rows = q_off + iq * block_q + lane % block_q  # q positions on lanes
        cols = kv_off + ikv * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, (block_kv, group * block_q), 0
        )
        mask = jnp.logical_and(mask, rows >= cols)
    return mask


def _fwd_kernel(
    q_off_ref,  # SMEM [2] = [q_off, kv_off]
    q_uni_ref, kv_uni_ref,  # SMEM per-block uniform segment ids (-1 = mixed)
    kvmap_ref,  # SMEM [B, nq, nkv] compacted live kv block indices
    q_seg_ref, kv_seg_ref, q_ref, k_ref, v_ref,  # inputs
    out_ref, lse_ref,  # outputs
    m_scratch, l_scratch, acc_scratch,  # scratch
    *, scale: float, causal: bool, block_q: int, block_kv: int, nkv: int,
    group: int, sum_lane: int = -1,
):
    bi, iq, ikv = pl.program_id(0), pl.program_id(2), pl.program_id(3)
    q_off = q_off_ref[0]
    kv_off = q_off_ref[1]
    G = group

    @pl.when(ikv == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    # the grid step visits the MAPPED kv block; repeated map entries are
    # exhausted padding (same block index -> DMA elided) and do not run
    jkv = kvmap_ref[bi, iq, ikv]
    prev = kvmap_ref[bi, iq, jnp.maximum(ikv - 1, 0)]
    qu = q_uni_ref[bi, iq]
    ku = kv_uni_ref[bi, jkv]
    run = (ikv == 0) | (jkv != prev)
    # n_live == 0 rows map to block 0; reject it by the uniform-diff check
    run = run & jnp.logical_not((qu >= 0) & (ku >= 0) & (qu != ku))

    @pl.when(run)
    def _compute():
        # bf16 in, fp32 accumulation: full-rate MXU
        q = q_ref[0, 0].reshape(G * block_q, q_ref.shape[-1])
        # softmax scale + exp2 base conversion folded into the small K
        # block ([bkv, D]) instead of a full [G*bq, bkv] pass on s (r5,
        # ported from the dynamic kernels)
        k = k_ref[0, 0] * jnp.asarray(scale * LOG2E, k_ref.dtype)
        # low-precision softmax chain for bf16 inputs (see _fwd_kernel_dyn)
        lp = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(lp)  # [G*bq, bkv] base-2 space

        # interior fast path: both sides inside ONE document and the tile is
        # strictly below the causal diagonal -> nothing to mask
        interior = (qu >= 0) & (qu == ku)
        if causal:
            interior = interior & (
                kv_off + (jkv + 1) * block_kv - 1 <= q_off + iq * block_q
            )

        def masked(s):
            mask = _tile_mask(
                q_seg_ref[0, 0], kv_seg_ref[0, 0], q_off, kv_off, iq, jkv,
                block_q, block_kv, G, causal,
            )
            return jnp.where(mask, s, jnp.asarray(DEFAULT_MASK_VALUE, s.dtype))

        s = jax.lax.cond(interior, lambda s: s, masked, s)

        m_prev = m_scratch[:, :1]  # [G*bq, 1]
        l_prev = l_scratch[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True).astype(jnp.float32)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new.astype(s.dtype))
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        if sum_lane >= 0:
            # the caller padded v's head dim and set v[:, sum_lane] = 1, so
            # the PV matmul emits the softmax row-sum in that lane for free
            # (one fewer full-tile VPU reduction pass); the pad lanes of the
            # output are sliced off by the caller
            psum = pv[:, sum_lane:sum_lane + 1]
        else:
            psum = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
        l_new = alpha * l_prev + psum
        m_scratch[:] = jnp.broadcast_to(m_new, m_scratch.shape)
        l_scratch[:] = jnp.broadcast_to(l_new, l_scratch.shape)
        acc_scratch[:] = acc_scratch[:] * alpha + pv

    @pl.when(ikv == nkv - 1)
    def _finalize():
        l = l_scratch[:, :1]
        # all-masked rows (padding) have l == 0; emit zeros, keep lse finite
        l_safe = jnp.where(l == 0.0, 1.0, l)
        out_ref[0, 0] = (acc_scratch[:] / l_safe).reshape(out_ref.shape[2:]).astype(
            out_ref.dtype
        )
        # m is in base-2 space; emit base-e lse (API contract)
        lse = m_scratch[:, 0] * LN2 + jnp.log(
            jnp.where(l[:, 0] == 0.0, 1.0, l[:, 0])
        )
        lse_ref[0, 0, 0] = lse.astype(lse_ref.dtype)


# ---------------------------------------------------------------------------
# Dynamic-trip-count forward kernel: the kv loop runs EXACTLY n_live
# iterations per q row (fori_loop with a scalar-prefetched bound), with
# manually double-buffered K/V block DMAs from HBM. This removes the no-op
# grid steps of the static grid entirely (at packed-32k with 8 docs ~92% of
# (iq, ikv) grid steps were skips — each still paying Mosaic's per-step
# latency, the round-1 "dead grid tail").
# ---------------------------------------------------------------------------


def _fwd_kernel_dyn(
    q_off_ref,  # SMEM [2] = [q_off, kv_off]
    q_uni_ref, kv_uni_ref,  # SMEM per-block uniform segment ids (-1 = mixed)
    kvmap_ref,  # SMEM [B, nq, nkv] compacted live kv block indices
    nlive_ref,  # SMEM [B, nq] number of live kv blocks per q row
    q_seg_ref, kv_seg_ref, q_ref, k_any, v_any,  # kv stay in HBM (pl.ANY)
    out_ref, lse_ref,
    k_buf, v_buf, m_scratch, l_scratch, acc_scratch, sem,
    *, scale: float, causal: bool, block_q: int, block_kv: int, group: int,
    sum_lane: int = -1,
):
    bi, hi, iq = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    q_off = q_off_ref[0]
    kv_off = q_off_ref[1]
    G = group
    n = nlive_ref[bi, iq]
    qu = q_uni_ref[bi, iq]

    m_scratch[:] = jnp.full_like(m_scratch, -jnp.inf)
    l_scratch[:] = jnp.zeros_like(l_scratch)
    acc_scratch[:] = jnp.zeros_like(acc_scratch)

    def kv_dmas(slot, t):
        jkv = kvmap_ref[bi, iq, t]
        return (
            pltpu.make_async_copy(
                k_any.at[bi, hi, pl.ds(jkv * block_kv, block_kv), :],
                k_buf.at[slot], sem.at[slot, 0],
            ),
            pltpu.make_async_copy(
                v_any.at[bi, hi, pl.ds(jkv * block_kv, block_kv), :],
                v_buf.at[slot], sem.at[slot, 1],
            ),
        )

    @pl.when(n > 0)
    def _warmup():
        for dma in kv_dmas(0, 0):
            dma.start()

    q = q_ref[0, 0].reshape(G * block_q, q_ref.shape[-1])

    def body(t, _):
        slot = t % 2

        @pl.when(t + 1 < n)
        def _prefetch():
            for dma in kv_dmas((t + 1) % 2, t + 1):
                dma.start()

        for dma in kv_dmas(slot, t):
            dma.wait()
        jkv = kvmap_ref[bi, iq, t]
        ku = kv_uni_ref[bi, jkv]
        # softmax scale + exp2 base conversion folded into the small K block
        # ([bkv, D] elements) instead of a full [G*bq, bkv] f32 pass on s
        k = k_buf[slot] * jnp.asarray(scale * LOG2E, k_buf.dtype)
        # Low-precision softmax chain (r5), gated on the INPUT dtype: for
        # bf16 inputs the PV matmul consumes p as bf16 ANYWAY, so the
        # max/exp2 chain runs in bf16 — the big [G*bq, bkv] VPU passes
        # process half the bytes and the separate bf16 cast pass disappears
        # (measured -5% fwd at the bench shape). Error model: rounding the
        # RAW base-2 score s to bf16 costs ~|s| * 2^-9 in the exponent, so
        # the chain's error GROWS with score magnitude — measured
        # worst-element output error 0.011 at |s|~8 (unit-scale q,k, where
        # the bf16 INPUT quantization of q/k contributes more) and 0.092 at
        # |s|~30, a sharp late-training head (input quantization alone:
        # 0.036). Envelopes pinned by test_bf16_chain_parity_envelope. A
        # better-bounded variant (subtract the f32 running max BEFORE the
        # bf16 cast, bounding the rounded quantity by ~ln(1/p)) gives up
        # the byte savings on the mask/max passes — adopt only with a
        # step-level chip measurement (docs/performance.md r4 moral). f32
        # inputs keep the exact f32 chain (the .astype calls are no-ops).
        # The running max/l stay f32 in scratch.
        lp = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(lp)  # [G*bq, bkv] base-2 space

        interior = (qu >= 0) & (qu == ku)
        if causal:
            interior = interior & (
                kv_off + (jkv + 1) * block_kv - 1 <= q_off + iq * block_q
            )

        def masked(s):
            mask = _tile_mask(
                q_seg_ref[0, 0],
                kv_seg_ref[0, 0, pl.ds(jkv * block_kv, block_kv)],
                q_off, kv_off, iq, jkv, block_q, block_kv, G, causal,
            )
            return jnp.where(mask, s, jnp.asarray(DEFAULT_MASK_VALUE, s.dtype))

        s = jax.lax.cond(interior, lambda s: s, masked, s)

        m_prev = m_scratch[:, :1]
        l_prev = l_scratch[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True).astype(jnp.float32)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new.astype(s.dtype))
        pv = jax.lax.dot_general(
            p.astype(v_buf.dtype), v_buf[slot],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        if sum_lane >= 0:
            # head-dim-padded shapes (D 64 -> 128 lanes): the caller set
            # v[:, sum_lane] = 1, so the PV matmul computes the softmax
            # row-sum for free in that lane — one fewer full-tile VPU pass
            # (the pad lanes of the output are sliced off by the caller)
            psum = pv[:, sum_lane:sum_lane + 1]
        else:
            # upcast: a raw bf16 sum over block_kv terms would lose ~1%
            psum = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
        l_new = alpha * l_prev + psum
        m_scratch[:] = jnp.broadcast_to(m_new, m_scratch.shape)
        l_scratch[:] = jnp.broadcast_to(l_new, l_scratch.shape)
        acc_scratch[:] = acc_scratch[:] * alpha + pv
        return _

    jax.lax.fori_loop(0, n, body, None)

    l = l_scratch[:, :1]
    l_safe = jnp.where(l == 0.0, 1.0, l)
    out_ref[0, 0] = (acc_scratch[:] / l_safe).reshape(out_ref.shape[2:]).astype(
        out_ref.dtype
    )
    lse = m_scratch[:, 0] * LN2 + jnp.log(
        jnp.where(l[:, 0] == 0.0, 1.0, l[:, 0])
    )
    lse_ref[0, 0, 0] = lse.astype(lse_ref.dtype)


def _pad_head_dim(*arrays):
    """Zero-pad the trailing head dim to the 128 lane tile.

    The dyn kernels DMA K/V (and q/do) blocks out of pl.ANY (HBM) refs by
    hand; Mosaic requires manual-DMA slices of the minor, lane-tiled dim to
    be 128-aligned, so head_dim 64 (e.g. Llama-3.2-1B) must be padded.
    Zero columns are exact: they add 0 to every dot product, and padded
    output columns are sliced off by the caller. The MXU cost is unchanged —
    a K=64 contraction already occupies a 128-lane tile internally.
    """
    D = arrays[0].shape[-1]
    Dp = -(-D // _MIN_LANE) * _MIN_LANE
    if Dp == D:
        return arrays
    return tuple(
        jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, Dp - D)]) for a in arrays
    )


def _set_ones_lane(v: jax.Array, lane: int) -> jax.Array:
    """Write 1.0 into one (padded) lane of v — fuses into the pad copy."""
    idx = jnp.arange(v.shape[-1]) == lane
    return jnp.where(idx, jnp.ones((), v.dtype), v)


def _fwd_pallas_dyn(q, k, v, q_seg, kv_seg, q_off, causal, scale, block_q,
                    block_kv, interpret):
    """[B,T,H,D]-layout adapter around the grouped fwd core."""
    D_out = q.shape[-1]
    B, T, H, _ = q.shape
    # transpose BEFORE padding: the grouping transpose then moves the
    # unpadded bytes (half the padded volume); the minor-dim pad afterwards
    # is a cheap layout-preserving copy
    qg, kh, vh, G = _grouped_views(q, k, v)
    qg, kh, vh = _pad_head_dim(qg, kh, vh)
    D = qg.shape[-1]
    sum_lane = -1
    if D > D_out:
        # first pad lane of v carries a 1: the kernel's PV matmul then
        # yields the softmax row-sum in that output lane for free
        vh = _set_ones_lane(vh, D_out)
        sum_lane = D_out
    Hkv = kh.shape[1]
    nq = pl.cdiv(T, block_q)
    out, lse = _fwd_dyn_core(qg, kh, vh, q_seg, kv_seg, q_off, causal, scale,
                             block_q, block_kv, interpret, sum_lane=sum_lane)
    out = out[..., :D_out].reshape(B, H, T, D_out).transpose(0, 2, 1, 3)
    lse = _unpermute_lse(lse, Hkv, G, nq, block_q)
    return out, lse


def _fwd_dyn_core(qg, kh, vh, q_seg, kv_seg, q_off, causal, scale, block_q,
                  block_kv, interpret, block_map=None, sum_lane=-1):
    """Grouped-layout dynamic-trip forward: qg [B,Hkv,G,T,D] (D lane-padded),
    kh/vh [B,Hkv,S,D] -> (outg [B,Hkv,G,T,D], lse flat
    [B,Hkv,1,nq*G*block_q] in (iq, g, row) order).

    block_map: optional precomputed (q_uni, kv_uni, kvmap, nlive) — the map
    depends only on segments/offsets, so callers running the same shapes
    repeatedly (one chunk across L layers) compute it once.

    sum_lane: >= 0 when the caller padded the head dim AND set
    v[..., sum_lane] = 1 — the kernel then reads the softmax row-sum out
    of the PV matmul instead of a VPU reduction pass."""
    B, Hkv, G, T, D = qg.shape
    S = kh.shape[2]
    nq = pl.cdiv(T, block_q)
    nkv = pl.cdiv(S, block_kv)

    if block_map is None:
        q_uni = _block_uniform(q_seg, block_q)
        kv_uni = _block_uniform(kv_seg, block_kv)
        kvmap, nlive = _kv_block_map(q_uni, kv_uni, q_off[0], q_off[1],
                                     nq, nkv, block_q, block_kv, causal)
    else:
        q_uni, kv_uni, kvmap, nlive = block_map

    kernel = functools.partial(
        _fwd_kernel_dyn, scale=scale, causal=causal,
        block_q=block_q, block_kv=block_kv, group=G, sum_lane=sum_lane,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(B, Hkv, nq),
            in_specs=[
                pl.BlockSpec((1, 1, block_q), lambda b, h, iq, *_: (b, 0, iq)),
                pl.BlockSpec((1, 1, S), lambda b, h, iq, *_: (b, 0, 0)),
                pl.BlockSpec((1, 1, G, block_q, D),
                             lambda b, h, iq, *_: (b, h, 0, iq, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, G, block_q, D),
                             lambda b, h, iq, *_: (b, h, 0, iq, 0)),
                pl.BlockSpec((1, 1, 1, G * block_q),
                             lambda b, h, iq, *_: (b, h, 0, iq)),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, block_kv, D), kh.dtype),
                pltpu.VMEM((2, block_kv, D), vh.dtype),
                pltpu.VMEM((G * block_q, _MIN_LANE), jnp.float32),
                pltpu.VMEM((G * block_q, _MIN_LANE), jnp.float32),
                pltpu.VMEM((G * block_q, D), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, G, T, D), qg.dtype),
            jax.ShapeDtypeStruct((B, Hkv, 1, nq * G * block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(q_off, q_uni, kv_uni, kvmap, nlive,
      q_seg[:, None, :], kv_seg[:, None, :], qg, kh, vh)
    return out, lse


# ---------------------------------------------------------------------------
# Pallas backward kernels
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(
    q_off_ref,
    q_uni_ref, kv_uni_ref,
    kvmap_ref,
    q_seg_ref, kv_seg_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref,
    dq_scratch,
    *, scale: float, causal: bool, block_q: int, block_kv: int, nkv: int,
    group: int,
):
    bi, iq, ikv = pl.program_id(0), pl.program_id(2), pl.program_id(3)
    q_off = q_off_ref[0]
    kv_off = q_off_ref[1]
    G = group
    D = q_ref.shape[-1]

    @pl.when(ikv == 0)
    def _init():
        dq_scratch[:] = jnp.zeros_like(dq_scratch)

    jkv = kvmap_ref[bi, iq, ikv]
    prev = kvmap_ref[bi, iq, jnp.maximum(ikv - 1, 0)]
    qu = q_uni_ref[bi, iq]
    ku = kv_uni_ref[bi, jkv]
    run = (ikv == 0) | (jkv != prev)
    run = run & jnp.logical_not((qu >= 0) & (ku >= 0) & (qu != ku))

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0].reshape(G * block_q, D)
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].reshape(G * block_q, D)
        # low-precision p/ds chain for bf16 inputs (see _bwd_fused_kernel_dyn)
        lp = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32
        s = (jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (scale * LOG2E)).astype(lp)
        interior = (qu >= 0) & (qu == ku)
        if causal:
            interior = interior & (
                kv_off + (jkv + 1) * block_kv - 1 <= q_off + iq * block_q
            )
        lse = (lse_ref[0, 0, 0][:, None] * LOG2E).astype(lp)  # base-e -> 2

        def masked_p(s):
            mask = _tile_mask(
                q_seg_ref[0, 0], kv_seg_ref[0, 0], q_off, kv_off, iq, jkv,
                block_q, block_kv, G, causal,
            )
            return jnp.where(mask, jnp.exp2(s - lse),
                             jnp.asarray(0.0, s.dtype))

        p = jax.lax.cond(interior, lambda s: jnp.exp2(s - lse), masked_p, s)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [G*bq, bkv]
        delta = delta_ref[0, 0, 0][:, None]
        ds = (p * (dp - delta).astype(lp)).astype(k.dtype)
        dq_scratch[:] += scale * jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(ikv == nkv - 1)
    def _finalize():
        dq_ref[0, 0] = dq_scratch[:].reshape(dq_ref.shape[2:]).astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_off_ref,
    q_uni_ref, kv_uni_ref,
    qmap_ref,
    q_seg_ref, kv_seg_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    dk_scratch, dv_scratch,
    *, scale: float, causal: bool, block_q: int, block_kv: int, nq: int,
    group: int,
):
    bi, ikv, iq = pl.program_id(0), pl.program_id(2), pl.program_id(3)
    q_off = q_off_ref[0]
    kv_off = q_off_ref[1]
    G = group
    D = q_ref.shape[-1]

    @pl.when(iq == 0)
    def _init():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    jq = qmap_ref[bi, ikv, iq]
    prev = qmap_ref[bi, ikv, jnp.maximum(iq - 1, 0)]
    qu = q_uni_ref[bi, jq]
    ku = kv_uni_ref[bi, ikv]
    # the grid step visits the MAPPED q block; repeated map entries are
    # exhausted padding (same block index -> DMA elided) and do not run
    run = (iq == 0) | (jq != prev)
    run = run & jnp.logical_not((qu >= 0) & (ku >= 0) & (qu != ku))

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0].reshape(G * block_q, D)
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].reshape(G * block_q, D)
        # low-precision p/ds chain for bf16 inputs (see _bwd_fused_kernel_dyn)
        lp = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32
        st = (jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (scale * LOG2E)).astype(lp)  # [bkv, G*bq]
        interior = (qu >= 0) & (qu == ku)
        if causal:
            interior = interior & (
                kv_off + (ikv + 1) * block_kv - 1 <= q_off + jq * block_q
            )
        lse = (lse_ref[0, 0, 0][None, :] * LOG2E).astype(lp)  # base-e -> 2

        def masked_p(st):
            mask = _tile_mask_t(
                q_seg_ref[0, 0], kv_seg_ref[0, 0], q_off, kv_off, jq, ikv,
                block_q, block_kv, G, causal,
            )
            return jnp.where(mask, jnp.exp2(st - lse),
                             jnp.asarray(0.0, st.dtype))

        pt = jax.lax.cond(
            interior, lambda st: jnp.exp2(st - lse), masked_p, st
        )  # [bkv, G*bq]
        # dV and dK accumulate over the whole GQA group in one pass
        dv_scratch[:] += jax.lax.dot_general(
            pt.astype(do.dtype), do,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        dpt = jax.lax.dot_general(
            v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bkv, G*bq]
        delta = delta_ref[0, 0, 0][None, :]
        dst = (pt * (dpt - delta).astype(lp)).astype(q.dtype)
        dk_scratch[:] += scale * jax.lax.dot_general(
            dst, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(iq == nq - 1)
    def _finalize():
        dk_ref[0, 0] = dk_scratch[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scratch[:].astype(dv_ref.dtype)


def _bwd_fused_kernel(
    q_off_ref,
    q_uni_ref, kv_uni_ref,
    kvmap_ref,
    q_seg_ref, kv_seg_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref, dk_ref, dv_ref,
    dq_scratch, dk_scratch, dv_scratch,
    *, scale: float, causal: bool, block_q: int, block_kv: int, nq: int,
    nkv: int, group: int,
):
    """Single-pass backward (q blocks outer, kv blocks inner): each tile
    computes p once and feeds dQ, dK and dV — one exp and 5 matmuls instead
    of the 2 exps / 7 matmuls of the split kernels. dK/dV accumulate across
    the whole sequence in VMEM scratch ([S, D] per kv head — G x smaller
    than a dQ-resident layout); callers fall back to the split kernels when
    it would not fit."""
    bi, iq, ikv = pl.program_id(0), pl.program_id(2), pl.program_id(3)
    q_off = q_off_ref[0]
    kv_off = q_off_ref[1]
    G = group
    D = q_ref.shape[-1]
    rows = G * block_q

    @pl.when((iq == 0) & (ikv == 0))
    def _init_dkv():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    @pl.when(ikv == 0)
    def _init_dq():
        dq_scratch[:] = jnp.zeros_like(dq_scratch)

    jkv = kvmap_ref[bi, iq, ikv]
    prev = kvmap_ref[bi, iq, jnp.maximum(ikv - 1, 0)]
    qu = q_uni_ref[bi, iq]
    ku = kv_uni_ref[bi, jkv]
    run = (ikv == 0) | (jkv != prev)
    run = run & jnp.logical_not((qu >= 0) & (ku >= 0) & (qu != ku))

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0].reshape(rows, D)
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].reshape(rows, D)
        # low-precision p/ds chain for bf16 inputs (see _bwd_fused_kernel_dyn)
        lp = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32
        sc = (jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (scale * LOG2E)).astype(lp)  # [G*bq, bkv]
        interior = (qu >= 0) & (qu == ku)
        if causal:
            interior = interior & (
                kv_off + (jkv + 1) * block_kv - 1 <= q_off + iq * block_q
            )
        lse = (lse_ref[0, 0, 0][:, None] * LOG2E).astype(lp)  # base-e -> 2

        def masked_p(sc):
            mask = _tile_mask(
                q_seg_ref[0, 0], kv_seg_ref[0, 0], q_off, kv_off, iq, jkv,
                block_q, block_kv, G, causal,
            )
            return jnp.where(mask, jnp.exp2(sc - lse),
                             jnp.asarray(0.0, sc.dtype))

        p = jax.lax.cond(
            interior, lambda sc: jnp.exp2(sc - lse), masked_p, sc
        )  # [G*bq, bkv]
        p_lp = p.astype(do.dtype)
        kv_slice = pl.ds(jkv * block_kv, block_kv)
        # dV += p^T @ dO (contract the row dim -> [bkv, D], no transpose)
        dv_scratch[kv_slice, :] += jax.lax.dot_general(
            p_lp, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [G*bq, bkv]
        delta = delta_ref[0, 0, 0][:, None]
        ds = (p * (dp - delta).astype(lp)).astype(q.dtype)  # [G*bq, bkv]
        dk_scratch[kv_slice, :] += scale * jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dq_scratch[:] += scale * jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(ikv == nkv - 1)
    def _finalize_dq():
        dq_ref[0, 0] = dq_scratch[:].reshape(dq_ref.shape[2:]).astype(dq_ref.dtype)

    @pl.when((iq == nq - 1) & (ikv == nkv - 1))
    def _finalize_dkv():
        dk_ref[0, 0] = dk_scratch[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scratch[:].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# Dynamic-trip-count backward kernels (see _fwd_kernel_dyn): per outer row
# the inner loop runs exactly n_live iterations with double-buffered DMAs.
# ---------------------------------------------------------------------------


def _bwd_fused_kernel_dyn(
    q_off_ref, q_uni_ref, kv_uni_ref, kvmap_ref, nlive_ref,
    q_seg_ref, kv_seg_ref, q_ref, k_any, v_any, do_ref, lse_ref, delta_ref,
    dq_ref, dk_ref, dv_ref,
    k_buf, v_buf, dq_scratch, dk_scratch, dv_scratch, sem,
    *, scale: float, causal: bool, block_q: int, block_kv: int, nq: int,
    group: int,
):
    """One-pass backward, q rows outer (grid), live kv blocks inner (dynamic
    fori_loop). dK/dV accumulate across the whole sequence in VMEM scratch."""
    bi, hi, iq = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    q_off = q_off_ref[0]
    kv_off = q_off_ref[1]
    G = group
    D = q_ref.shape[-1]
    rows = G * block_q
    n = nlive_ref[bi, iq]
    qu = q_uni_ref[bi, iq]

    @pl.when(iq == 0)
    def _init_dkv():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    dq_scratch[:] = jnp.zeros_like(dq_scratch)

    def kv_dmas(slot, t):
        jkv = kvmap_ref[bi, iq, t]
        return (
            pltpu.make_async_copy(
                k_any.at[bi, hi, pl.ds(jkv * block_kv, block_kv), :],
                k_buf.at[slot], sem.at[slot, 0],
            ),
            pltpu.make_async_copy(
                v_any.at[bi, hi, pl.ds(jkv * block_kv, block_kv), :],
                v_buf.at[slot], sem.at[slot, 1],
            ),
        )

    @pl.when(n > 0)
    def _warmup():
        for dma in kv_dmas(0, 0):
            dma.start()

    q = q_ref[0, 0].reshape(rows, D)
    do = do_ref[0, 0].reshape(rows, D)
    lse = lse_ref[0, 0, 0][:, None] * LOG2E  # base-e -> base-2
    delta = delta_ref[0, 0, 0][:, None]

    def body(t, _):
        slot = t % 2

        @pl.when(t + 1 < n)
        def _prefetch():
            for dma in kv_dmas((t + 1) % 2, t + 1):
                dma.start()

        for dma in kv_dmas(slot, t):
            dma.wait()
        jkv = kvmap_ref[bi, iq, t]
        ku = kv_uni_ref[bi, jkv]
        k = k_buf[slot]
        v = v_buf[slot]
        # Low-precision p/ds chain (r5), gated on input dtype like the fwd
        # kernel: for bf16 inputs p feeds bf16 matmuls anyway, so the exp2
        # and ds elementwise passes run in bf16 — half the VPU bytes, and
        # the separate bf16 casts before the dV/dK/dQ dots disappear.
        # Rounding raw s and lse to bf16 costs ~|s| * 2^-9 in the exponent
        # (grows with score magnitude): measured grad error ~1% mean-rel at
        # |s|~8, ~2.5% at |s|~30 — envelopes pinned by
        # test_bf16_chain_parity_envelope; see the fwd kernel comment for
        # the full error model. f32 inputs keep the exact f32 chain.
        lp = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32
        sc = (jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (scale * LOG2E)).astype(lp)
        interior = (qu >= 0) & (qu == ku)
        if causal:
            interior = interior & (
                kv_off + (jkv + 1) * block_kv - 1 <= q_off + iq * block_q
            )
        lse_lp = lse.astype(lp)

        def masked_p(sc):
            mask = _tile_mask(
                q_seg_ref[0, 0],
                kv_seg_ref[0, 0, pl.ds(jkv * block_kv, block_kv)],
                q_off, kv_off, iq, jkv, block_q, block_kv, G, causal,
            )
            return jnp.where(mask, jnp.exp2(sc - lse_lp),
                             jnp.asarray(0.0, sc.dtype))

        p = jax.lax.cond(
            interior, lambda sc: jnp.exp2(sc - lse_lp), masked_p, sc
        )  # [G*bq, bkv] in lp
        kv_slice = pl.ds(jkv * block_kv, block_kv)
        dv_scratch[kv_slice, :] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta).astype(lp)).astype(q.dtype)
        dk_scratch[kv_slice, :] += scale * jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dq_scratch[:] += scale * jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return _

    jax.lax.fori_loop(0, n, body, None)

    dq_ref[0, 0] = dq_scratch[:].reshape(dq_ref.shape[2:]).astype(dq_ref.dtype)

    @pl.when(iq == nq - 1)
    def _finalize_dkv():
        dk_ref[0, 0] = dk_scratch[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scratch[:].astype(dv_ref.dtype)


def _bwd_dq_kernel_dyn(
    q_off_ref, q_uni_ref, kv_uni_ref, kvmap_ref, nlive_ref,
    q_seg_ref, kv_seg_ref, q_ref, k_any, v_any, do_ref, lse_ref, delta_ref,
    dq_ref,
    k_buf, v_buf, dq_scratch, sem,
    *, scale: float, causal: bool, block_q: int, block_kv: int, group: int,
):
    """dQ-only backward for long sequences (dK/dV scratch would not fit):
    q rows outer, live kv blocks inner (dynamic)."""
    bi, hi, iq = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    q_off = q_off_ref[0]
    kv_off = q_off_ref[1]
    G = group
    D = q_ref.shape[-1]
    rows = G * block_q
    n = nlive_ref[bi, iq]
    qu = q_uni_ref[bi, iq]

    dq_scratch[:] = jnp.zeros_like(dq_scratch)

    def kv_dmas(slot, t):
        jkv = kvmap_ref[bi, iq, t]
        return (
            pltpu.make_async_copy(
                k_any.at[bi, hi, pl.ds(jkv * block_kv, block_kv), :],
                k_buf.at[slot], sem.at[slot, 0],
            ),
            pltpu.make_async_copy(
                v_any.at[bi, hi, pl.ds(jkv * block_kv, block_kv), :],
                v_buf.at[slot], sem.at[slot, 1],
            ),
        )

    @pl.when(n > 0)
    def _warmup():
        for dma in kv_dmas(0, 0):
            dma.start()

    q = q_ref[0, 0].reshape(rows, D)
    do = do_ref[0, 0].reshape(rows, D)
    lse = lse_ref[0, 0, 0][:, None] * LOG2E
    delta = delta_ref[0, 0, 0][:, None]

    def body(t, _):
        slot = t % 2

        @pl.when(t + 1 < n)
        def _prefetch():
            for dma in kv_dmas((t + 1) % 2, t + 1):
                dma.start()

        for dma in kv_dmas(slot, t):
            dma.wait()
        jkv = kvmap_ref[bi, iq, t]
        ku = kv_uni_ref[bi, jkv]
        k = k_buf[slot]
        v = v_buf[slot]
        # low-precision p/ds chain for bf16 inputs (see _bwd_fused_kernel_dyn)
        lp = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32
        s = (jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (scale * LOG2E)).astype(lp)
        interior = (qu >= 0) & (qu == ku)
        if causal:
            interior = interior & (
                kv_off + (jkv + 1) * block_kv - 1 <= q_off + iq * block_q
            )
        lse_lp = lse.astype(lp)

        def masked_p(s):
            mask = _tile_mask(
                q_seg_ref[0, 0],
                kv_seg_ref[0, 0, pl.ds(jkv * block_kv, block_kv)],
                q_off, kv_off, iq, jkv, block_q, block_kv, G, causal,
            )
            return jnp.where(mask, jnp.exp2(s - lse_lp),
                             jnp.asarray(0.0, s.dtype))

        p = jax.lax.cond(
            interior, lambda s: jnp.exp2(s - lse_lp), masked_p, s
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta).astype(lp)).astype(k.dtype)
        dq_scratch[:] += scale * jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return _

    jax.lax.fori_loop(0, n, body, None)
    dq_ref[0, 0] = dq_scratch[:].reshape(dq_ref.shape[2:]).astype(dq_ref.dtype)


def _bwd_dkv_kernel_dyn(
    q_off_ref, q_uni_ref, kv_uni_ref, qmap_ref, nlive_ref,
    q_seg_ref, kv_seg_ref, q_any, k_ref, v_ref, do_any, lse_any, delta_any,
    dk_ref, dv_ref,
    q_buf, do_buf, lse_buf, delta_buf, dk_scratch, dv_scratch, sem,
    *, scale: float, causal: bool, block_q: int, block_kv: int, group: int,
):
    """dK/dV backward for long sequences: kv blocks outer (grid), live q
    blocks inner (dynamic loop DMAing q/do/lse/delta blocks)."""
    bi, hi, ikv = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    q_off = q_off_ref[0]
    kv_off = q_off_ref[1]
    G = group
    D = k_ref.shape[-1]
    rows = G * block_q
    n = nlive_ref[bi, ikv]
    ku = kv_uni_ref[bi, ikv]

    dk_scratch[:] = jnp.zeros_like(dk_scratch)
    dv_scratch[:] = jnp.zeros_like(dv_scratch)

    def q_dmas(slot, t):
        jq = qmap_ref[bi, ikv, t]
        flat = pl.ds(jq * rows, rows)
        return (
            pltpu.make_async_copy(
                q_any.at[bi, hi, :, pl.ds(jq * block_q, block_q), :],
                q_buf.at[slot], sem.at[slot, 0],
            ),
            pltpu.make_async_copy(
                do_any.at[bi, hi, :, pl.ds(jq * block_q, block_q), :],
                do_buf.at[slot], sem.at[slot, 1],
            ),
            pltpu.make_async_copy(
                lse_any.at[bi, hi, :, flat], lse_buf.at[slot], sem.at[slot, 2],
            ),
            pltpu.make_async_copy(
                delta_any.at[bi, hi, :, flat], delta_buf.at[slot],
                sem.at[slot, 3],
            ),
        )

    @pl.when(n > 0)
    def _warmup():
        for dma in q_dmas(0, 0):
            dma.start()

    k = k_ref[0, 0]
    v = v_ref[0, 0]

    def body(t, _):
        slot = t % 2

        @pl.when(t + 1 < n)
        def _prefetch():
            for dma in q_dmas((t + 1) % 2, t + 1):
                dma.start()

        for dma in q_dmas(slot, t):
            dma.wait()
        jq = qmap_ref[bi, ikv, t]
        qu = q_uni_ref[bi, jq]
        q = q_buf[slot].reshape(rows, D)
        do = do_buf[slot].reshape(rows, D)
        # low-precision p/ds chain for bf16 inputs (see _bwd_fused_kernel_dyn)
        lp = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32
        st = (jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (scale * LOG2E)).astype(lp)  # [bkv, G*bq]
        interior = (qu >= 0) & (qu == ku)
        if causal:
            interior = interior & (
                kv_off + (ikv + 1) * block_kv - 1 <= q_off + jq * block_q
            )
        lse = (lse_buf[slot][0][None, :] * LOG2E).astype(lp)

        def masked_p(st):
            mask = _tile_mask_t(
                q_seg_ref[0, 0, pl.ds(jq * block_q, block_q)],
                kv_seg_ref[0, 0],
                q_off, kv_off, jq, ikv, block_q, block_kv, G, causal,
            )
            return jnp.where(mask, jnp.exp2(st - lse),
                             jnp.asarray(0.0, st.dtype))

        pt = jax.lax.cond(
            interior, lambda st: jnp.exp2(st - lse), masked_p, st
        )
        dv_scratch[:] += jax.lax.dot_general(
            pt.astype(do.dtype), do,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        dpt = jax.lax.dot_general(
            v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        delta = delta_buf[slot][0][None, :]
        dst = (pt * (dpt - delta).astype(lp)).astype(q.dtype)
        dk_scratch[:] += scale * jax.lax.dot_general(
            dst, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return _

    jax.lax.fori_loop(0, n, body, None)
    dk_ref[0, 0] = dk_scratch[:].astype(dk_ref.dtype)
    dv_ref[0, 0] = dv_scratch[:].astype(dv_ref.dtype)


def _bwd_pallas_dyn(q, k, v, q_seg, kv_seg, q_off, out, lse, do, causal,
                    scale, block_q, block_kv, interpret):
    """[B,T,H,D]-layout adapter around the grouped bwd core."""
    D_out = q.shape[-1]
    B, T, H, _ = q.shape
    # transpose before padding (see _fwd_pallas_dyn)
    qg, kh, vh, G = _grouped_views(q, k, v)
    Hkv = kh.shape[1]
    dog = do.transpose(0, 2, 1, 3).reshape(B, Hkv, G, T, D_out)
    outg = out.transpose(0, 2, 1, 3).reshape(B, Hkv, G, T, D_out)
    qg, kh, vh, outg, dog = _pad_head_dim(qg, kh, vh, outg, dog)
    D = qg.shape[-1]
    nq = pl.cdiv(T, block_q)
    lse_p = _permute_lse(lse, nq, block_q)
    dq, dk, dv = _bwd_dyn_core(qg, kh, vh, q_seg, kv_seg, q_off, outg, lse_p,
                               dog, causal, scale, block_q, block_kv,
                               interpret)
    dq = dq[..., :D_out].reshape(B, H, T, D_out).transpose(0, 2, 1, 3)
    dk = dk[..., :D_out].transpose(0, 2, 1, 3)
    dv = dv[..., :D_out].transpose(0, 2, 1, 3)
    return dq, dk, dv


def _bwd_dyn_core(qg, kh, vh, q_seg, kv_seg, q_off, outg, lse_p, dog, causal,
                  scale, block_q, block_kv, interpret):
    """Grouped-layout dynamic-trip backward: all tensors [B,Hkv,G,T,D] /
    [B,Hkv,S,D] with D lane-padded; lse_p flat [B,Hkv,1,nq*G*block_q].
    Returns (dqg, dkh, dvh) in the same grouped layout (padded D)."""
    B, Hkv, G, T, D = qg.shape
    S = kh.shape[2]
    nq = pl.cdiv(T, block_q)
    nkv = pl.cdiv(S, block_kv)
    # delta (rowwise sum do*out) directly in the flat (iq, g, row) layout
    # the kernels consume - the [B,Hkv,G,T] f32 permute is ~1 MB, trivial
    delta = jnp.sum(
        dog.astype(jnp.float32) * outg.astype(jnp.float32), axis=-1
    )
    delta_p = _permute_lse(delta, nq, block_q)

    q_uni = _block_uniform(q_seg, block_q)
    kv_uni = _block_uniform(kv_seg, block_kv)
    kvmap, kv_nlive = _kv_block_map(q_uni, kv_uni, q_off[0], q_off[1], nq, nkv,
                                    block_q, block_kv, causal)
    rows = G * block_q
    fused = T == S and 2 * S * D * 4 <= FUSED_BWD_VMEM_LIMIT

    if fused:
        dq, dk, dv = pl.pallas_call(
            functools.partial(
                _bwd_fused_kernel_dyn, scale=scale, causal=causal,
                block_q=block_q, block_kv=block_kv, nq=nq, group=G,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=5,
                grid=(B, Hkv, nq),
                in_specs=[
                    pl.BlockSpec((1, 1, block_q), lambda b, h, iq, *_: (b, 0, iq)),
                    pl.BlockSpec((1, 1, S), lambda b, h, iq, *_: (b, 0, 0)),
                    pl.BlockSpec((1, 1, G, block_q, D),
                                 lambda b, h, iq, *_: (b, h, 0, iq, 0)),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec((1, 1, G, block_q, D),
                                 lambda b, h, iq, *_: (b, h, 0, iq, 0)),
                    pl.BlockSpec((1, 1, 1, rows),
                                 lambda b, h, iq, *_: (b, h, 0, iq)),
                    pl.BlockSpec((1, 1, 1, rows),
                                 lambda b, h, iq, *_: (b, h, 0, iq)),
                ],
                out_specs=[
                    pl.BlockSpec((1, 1, G, block_q, D),
                                 lambda b, h, iq, *_: (b, h, 0, iq, 0)),
                    pl.BlockSpec((1, 1, S, D), lambda b, h, iq, *_: (b, h, 0, 0)),
                    pl.BlockSpec((1, 1, S, D), lambda b, h, iq, *_: (b, h, 0, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((2, block_kv, D), kh.dtype),
                    pltpu.VMEM((2, block_kv, D), vh.dtype),
                    pltpu.VMEM((rows, D), jnp.float32),
                    pltpu.VMEM((S, D), jnp.float32),
                    pltpu.VMEM((S, D), jnp.float32),
                    pltpu.SemaphoreType.DMA((2, 2)),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((B, Hkv, G, T, D), qg.dtype),
                jax.ShapeDtypeStruct((B, Hkv, S, D), qg.dtype),
                jax.ShapeDtypeStruct((B, Hkv, S, D), qg.dtype),
            ],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
            interpret=interpret,
        )(q_off, q_uni, kv_uni, kvmap, kv_nlive,
          q_seg[:, None, :], kv_seg[:, None, :], qg, kh, vh, dog, lse_p,
          delta_p)
        return dq, dk, dv

    qmap, q_nlive = _q_block_map(q_uni, kv_uni, q_off[0], q_off[1], nq, nkv,
                                 block_q, block_kv, causal)
    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel_dyn, scale=scale, causal=causal,
            block_q=block_q, block_kv=block_kv, group=G,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(B, Hkv, nq),
            in_specs=[
                pl.BlockSpec((1, 1, block_q), lambda b, h, iq, *_: (b, 0, iq)),
                pl.BlockSpec((1, 1, S), lambda b, h, iq, *_: (b, 0, 0)),
                pl.BlockSpec((1, 1, G, block_q, D),
                             lambda b, h, iq, *_: (b, h, 0, iq, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 1, G, block_q, D),
                             lambda b, h, iq, *_: (b, h, 0, iq, 0)),
                pl.BlockSpec((1, 1, 1, rows), lambda b, h, iq, *_: (b, h, 0, iq)),
                pl.BlockSpec((1, 1, 1, rows), lambda b, h, iq, *_: (b, h, 0, iq)),
            ],
            out_specs=pl.BlockSpec((1, 1, G, block_q, D),
                                   lambda b, h, iq, *_: (b, h, 0, iq, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, block_kv, D), kh.dtype),
                pltpu.VMEM((2, block_kv, D), vh.dtype),
                pltpu.VMEM((rows, D), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, T, D), qg.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(q_off, q_uni, kv_uni, kvmap, kv_nlive,
      q_seg[:, None, :], kv_seg[:, None, :], qg, kh, vh, dog, lse_p, delta_p)

    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel_dyn, scale=scale, causal=causal,
            block_q=block_q, block_kv=block_kv, group=G,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(B, Hkv, nkv),
            in_specs=[
                pl.BlockSpec((1, 1, T), lambda b, h, ikv, *_: (b, 0, 0)),
                pl.BlockSpec((1, 1, block_kv), lambda b, h, ikv, *_: (b, 0, ikv)),
                pl.BlockSpec(memory_space=pl.ANY),  # q
                pl.BlockSpec((1, 1, block_kv, D),
                             lambda b, h, ikv, *_: (b, h, ikv, 0)),
                pl.BlockSpec((1, 1, block_kv, D),
                             lambda b, h, ikv, *_: (b, h, ikv, 0)),
                pl.BlockSpec(memory_space=pl.ANY),  # do
                pl.BlockSpec(memory_space=pl.ANY),  # lse
                pl.BlockSpec(memory_space=pl.ANY),  # delta
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_kv, D),
                             lambda b, h, ikv, *_: (b, h, ikv, 0)),
                pl.BlockSpec((1, 1, block_kv, D),
                             lambda b, h, ikv, *_: (b, h, ikv, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, G, block_q, D), qg.dtype),
                pltpu.VMEM((2, G, block_q, D), dog.dtype),
                pltpu.VMEM((2, 1, rows), jnp.float32),
                pltpu.VMEM((2, 1, rows), jnp.float32),
                pltpu.VMEM((block_kv, D), jnp.float32),
                pltpu.VMEM((block_kv, D), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 4)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, S, D), qg.dtype),
            jax.ShapeDtypeStruct((B, Hkv, S, D), qg.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(q_off, q_uni, kv_uni, qmap, q_nlive,
      q_seg[:, None, :], kv_seg[:, None, :], qg, kh, vh, dog, lse_p, delta_p)

    return dq, dk, dv


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _pad_to(x, multiple, axis):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _unpermute_lse(flat, Hkv, G, nq, block_q):
    """[B, Hkv, 1, nq*G*bq] (iq, g, row ordering) -> [B, Hkv, G, T]."""
    B = flat.shape[0]
    x = flat.reshape(B, Hkv, nq, G, block_q)
    return x.transpose(0, 1, 3, 2, 4).reshape(B, Hkv, G, nq * block_q)


def _permute_lse(lse, nq, block_q):
    """[B, Hkv, G, T] -> flat [B, Hkv, 1, nq*G*bq] kernel layout."""
    B, Hkv, G, T = lse.shape
    x = lse.reshape(B, Hkv, G, nq, block_q)
    return x.transpose(0, 1, 3, 2, 4).reshape(B, Hkv, 1, nq * G * block_q)


def _kv_block_map(q_uni, kv_uni, q_off, kv_off, nq, nkv, block_q, block_kv,
                  causal):
    """Compacted live-kv-block index map [B, nq, nkv] for q-outer kernels.

    For each q block row, the ascending indices of kv blocks that are not
    skippable (skippable = uniform DIFFERENT documents on both sides, or
    strictly above the causal diagonal), padded by repeating the last live
    index. Index maps consult this table (scalar prefetch), so Pallas's
    revisiting elision turns every skipped block into a zero-DMA no-op —
    the splash-attention trick, built from packed-document segment ids."""
    B = q_uni.shape[0]
    j = jnp.arange(nkv, dtype=jnp.int32)
    qd = q_uni[:, :, None]  # [B, nq, 1]
    kd = kv_uni[:, None, :]  # [B, 1, nkv]
    live = jnp.logical_not((qd >= 0) & (kd >= 0) & (qd != kd))
    if causal:
        i = jnp.arange(nq, dtype=jnp.int32)
        live = live & (
            (kv_off + j[None, None, :] * block_kv)
            <= (q_off + (i[None, :, None] + 1) * block_q - 1)
        )
    key = jnp.where(live, j[None, None, :], nkv)
    skey = jnp.sort(key, axis=-1)
    n_live = live.sum(axis=-1)  # [B, nq]
    last = jnp.take_along_axis(
        skey, jnp.maximum(n_live - 1, 0)[..., None], axis=-1
    )
    last = jnp.where(n_live[..., None] == 0, 0, last)
    kvmap = jnp.where(
        j[None, None, :] < n_live[..., None], skey, last
    ).astype(jnp.int32)
    return kvmap, n_live.astype(jnp.int32)


def _q_block_map(q_uni, kv_uni, q_off, kv_off, nq, nkv, block_q, block_kv,
                 causal):
    """Compacted live-q-block index map [B, nkv, nq] for the kv-outer
    (dK/dV) kernel: ascending q block indices whose rows can attend into the
    kv block, padded by repeating the last live index."""
    i = jnp.arange(nq, dtype=jnp.int32)
    qd = q_uni[:, None, :]  # [B, 1, nq]
    kd = kv_uni[:, :, None]  # [B, nkv, 1]
    live = jnp.logical_not((qd >= 0) & (kd >= 0) & (qd != kd))
    if causal:
        j = jnp.arange(nkv, dtype=jnp.int32)
        live = live & (
            (q_off + (i[None, None, :] + 1) * block_q - 1)
            >= (kv_off + j[None, :, None] * block_kv)
        )
    key = jnp.where(live, i[None, None, :], nq)
    skey = jnp.sort(key, axis=-1)
    n_live = live.sum(axis=-1)
    last = jnp.take_along_axis(
        skey, jnp.maximum(n_live - 1, 0)[..., None], axis=-1
    )
    last = jnp.where(n_live[..., None] == 0, 0, last)
    qmap = jnp.where(
        i[None, None, :] < n_live[..., None], skey, last
    ).astype(jnp.int32)
    return qmap, n_live.astype(jnp.int32)


def _block_uniform(seg: jax.Array, block: int) -> jax.Array:
    """Per-block uniform segment id, or -1 when mixed. seg [B, T] -> [B, nb]."""
    B, T = seg.shape
    nb = (T + block - 1) // block
    if nb * block != T:  # partial tail block: mark mixed via -1 padding
        seg = jnp.pad(seg, ((0, 0), (0, nb * block - T)), constant_values=-1)
    blocks = seg.reshape(B, nb, block)
    mn = blocks.min(axis=-1)
    mx = blocks.max(axis=-1)
    return jnp.where(mn == mx, mn, -1).astype(jnp.int32)


def _grouped_views(q, k, v):
    """[B,T,H,D]/[B,S,Hkv,D] -> qg [B,Hkv,G,T,D], kh/vh [B,Hkv,S,D]."""
    B, T, H, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    G = H // Hkv
    qg = q.transpose(0, 2, 1, 3).reshape(B, Hkv, G, T, D)
    kh = k.transpose(0, 2, 1, 3)
    vh = v.transpose(0, 2, 1, 3)
    return qg, kh, vh, G


def _fwd_pallas(q, k, v, q_seg, kv_seg, q_off, causal, scale, block_q, block_kv,
                interpret, static_zero_offsets=False, dynamic=None):
    if USE_DYNAMIC_KERNELS if dynamic is None else dynamic:
        return _fwd_pallas_dyn(q, k, v, q_seg, kv_seg, q_off, causal, scale,
                               block_q, block_kv, interpret)
    B, T, H, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    qg, kh, vh, G = _grouped_views(q, k, v)
    # pad ONLY v's head dim and plant a ones-lane: the PV matmul then emits
    # the softmax row-sum for free (see _fwd_kernel sum_lane). q/k stay at
    # the model's head dim — a K=64 contraction costs the same MXU passes,
    # and so does a 64-lane-masked PV output tile, so the pad is free
    # compute-wise; only v's DMA bytes double.
    sum_lane = -1
    if D < _MIN_LANE:
        vh = _set_ones_lane(_pad_head_dim(vh)[0], D)
        sum_lane = D
    Dv = vh.shape[-1]
    nq = pl.cdiv(T, block_q)
    nkv = pl.cdiv(S, block_kv)
    grid = (B, Hkv, nq, nkv)
    del static_zero_offsets  # superseded by the kv block map below

    # index maps consult the compacted live-block table (scalar prefetch):
    # skipped blocks repeat the previous index, so their DMA is elided
    def kv_index(b, h, iq, ikv, qo, qu, ku, kvmap):
        return (b, h, kvmap[b, iq, ikv], 0)

    def kv_seg_index(b, h, iq, ikv, qo, qu, ku, kvmap):
        return (b, 0, kvmap[b, iq, ikv])

    def q_index5(b, h, iq, ikv, qo, qu, ku, kvmap):
        return (b, h, 0, iq, 0)

    def q_seg_index(b, h, iq, ikv, qo, qu, ku, kvmap):
        return (b, 0, iq)

    def lse_index(b, h, iq, ikv, qo, qu, ku, kvmap):
        return (b, h, 0, iq)

    kernel = functools.partial(
        _fwd_kernel, scale=scale, causal=causal,
        block_q=block_q, block_kv=block_kv, nkv=nkv, group=G,
        sum_lane=sum_lane,
    )
    q_uni = _block_uniform(q_seg, block_q)
    kv_uni = _block_uniform(kv_seg, block_kv)
    kvmap, _ = _kv_block_map(q_uni, kv_uni, q_off[0], q_off[1], nq, nkv,
                             block_q, block_kv, causal)
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q), q_seg_index),
                pl.BlockSpec((1, 1, block_kv), kv_seg_index),
                pl.BlockSpec((1, 1, G, block_q, D), q_index5),
                pl.BlockSpec((1, 1, block_kv, D), kv_index),
                pl.BlockSpec((1, 1, block_kv, Dv), kv_index),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, G, block_q, Dv), q_index5),
                pl.BlockSpec((1, 1, 1, G * block_q), lse_index),
            ],
            scratch_shapes=[
                pltpu.VMEM((G * block_q, _MIN_LANE), jnp.float32),
                pltpu.VMEM((G * block_q, _MIN_LANE), jnp.float32),
                pltpu.VMEM((G * block_q, Dv), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, G, T, Dv), q.dtype),
            # lse in a block-permuted flat layout: [(iq, g, row)] on the last
            # dim; _unpermute_lse restores [B, Hkv, G, T]
            jax.ShapeDtypeStruct((B, Hkv, 1, nq * G * block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(q_off, q_uni, kv_uni, kvmap,
      q_seg[:, None, :], kv_seg[:, None, :], qg, kh, vh)
    out = out[..., :D].reshape(B, H, T, D).transpose(0, 2, 1, 3)
    lse = _unpermute_lse(lse, Hkv, G, nq, block_q)
    return out, lse  # lse [B, Hkv, G, T]


def _bwd_pallas(q, k, v, q_seg, kv_seg, q_off, out, lse, do, causal, scale,
                block_q, block_kv, interpret, static_zero_offsets=False,
                dynamic=None):
    if USE_DYNAMIC_KERNELS if dynamic is None else dynamic:
        return _bwd_pallas_dyn(q, k, v, q_seg, kv_seg, q_off, out, lse, do,
                               causal, scale, block_q, block_kv, interpret)
    B, T, H, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    G = H // Hkv
    # the fused one-pass kernel keeps dK/dV for the WHOLE sequence in VMEM;
    # use it when that scratch fits, otherwise fall back to the two-kernel
    # split (longer sequences / bigger head dims)
    if T == S and 2 * S * D * 4 <= FUSED_BWD_VMEM_LIMIT:
        return _bwd_pallas_fused(
            q, k, v, q_seg, kv_seg, q_off, out, lse, do, causal, scale,
            block_q, block_kv, interpret, static_zero_offsets,
        )
    qg, kh, vh, G = _grouped_views(q, k, v)
    dog = do.transpose(0, 2, 1, 3).reshape(B, Hkv, G, T, D)
    outg = out.transpose(0, 2, 1, 3).reshape(B, Hkv, G, T, D)
    delta = jnp.sum(
        dog.astype(jnp.float32) * outg.astype(jnp.float32), axis=-1
    )  # [B, Hkv, G, T]
    nq = pl.cdiv(T, block_q)
    nkv = pl.cdiv(S, block_kv)
    lse = _permute_lse(lse, nq, block_q)
    delta = _permute_lse(delta, nq, block_q)

    del static_zero_offsets  # superseded by the block maps below

    # q-outer (dQ) index maps: kv side consults the live-block table
    def kv_index(b, h, iq, ikv, qo, qu, ku, kvmap):
        return (b, h, kvmap[b, iq, ikv], 0)

    def kv_seg_index(b, h, iq, ikv, qo, qu, ku, kvmap):
        return (b, 0, kvmap[b, iq, ikv])

    def q_index5_dq(b, h, iq, ikv, qo, qu, ku, kvmap):
        return (b, h, 0, iq, 0)

    def q_seg_index_dq(b, h, iq, ikv, qo, qu, ku, kvmap):
        return (b, 0, iq)

    def lse_index_dq(b, h, iq, ikv, qo, qu, ku, kvmap):
        return (b, h, 0, iq)

    # kv-outer (dK/dV) index maps: q side consults the live-block table
    def q_index(b, h, ikv, iq, qo, qu, ku, qmap):
        return (b, h, 0, qmap[b, ikv, iq], 0)

    def q_flat_index(b, h, ikv, iq, qo, qu, ku, qmap):
        return (b, h, 0, qmap[b, ikv, iq])

    def q_seg_index(b, h, ikv, iq, qo, qu, ku, qmap):
        return (b, 0, qmap[b, ikv, iq])

    def kv_index_dkv(b, h, ikv, iq, qo, qu, ku, qmap):
        return (b, h, ikv, 0)

    def kv_seg_index_dkv(b, h, ikv, iq, qo, qu, ku, qmap):
        return (b, 0, ikv)

    q_uni = _block_uniform(q_seg, block_q)
    kv_uni = _block_uniform(kv_seg, block_kv)
    kvmap, _ = _kv_block_map(q_uni, kv_uni, q_off[0], q_off[1], nq, nkv,
                             block_q, block_kv, causal)
    qmap, _ = _q_block_map(q_uni, kv_uni, q_off[0], q_off[1], nq, nkv,
                           block_q, block_kv, causal)
    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, scale=scale, causal=causal,
            block_q=block_q, block_kv=block_kv, nkv=nkv, group=G,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(B, Hkv, nq, nkv),
            in_specs=[
                pl.BlockSpec((1, 1, block_q), q_seg_index_dq),
                pl.BlockSpec((1, 1, block_kv), kv_seg_index),
                pl.BlockSpec((1, 1, G, block_q, D), q_index5_dq),
                pl.BlockSpec((1, 1, block_kv, D), kv_index),
                pl.BlockSpec((1, 1, block_kv, D), kv_index),
                pl.BlockSpec((1, 1, G, block_q, D), q_index5_dq),
                pl.BlockSpec((1, 1, 1, G * block_q), lse_index_dq),
                pl.BlockSpec((1, 1, 1, G * block_q), lse_index_dq),
            ],
            out_specs=pl.BlockSpec((1, 1, G, block_q, D), q_index5_dq),
            scratch_shapes=[pltpu.VMEM((G * block_q, D), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, T, D), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(q_off, q_uni, kv_uni, kvmap, q_seg[:, None, :], kv_seg[:, None, :],
      qg, kh, vh, dog, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, scale=scale, causal=causal,
            block_q=block_q, block_kv=block_kv, nq=nq, group=G,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(B, Hkv, nkv, nq),
            in_specs=[
                pl.BlockSpec((1, 1, block_q), q_seg_index),
                pl.BlockSpec((1, 1, block_kv), kv_seg_index_dkv),
                pl.BlockSpec((1, 1, G, block_q, D), q_index),
                pl.BlockSpec((1, 1, block_kv, D), kv_index_dkv),
                pl.BlockSpec((1, 1, block_kv, D), kv_index_dkv),
                pl.BlockSpec((1, 1, G, block_q, D), q_index),
                pl.BlockSpec((1, 1, 1, G * block_q), q_flat_index),
                pl.BlockSpec((1, 1, 1, G * block_q), q_flat_index),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_kv, D), kv_index_dkv),
                pl.BlockSpec((1, 1, block_kv, D), kv_index_dkv),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_kv, D), jnp.float32),
                pltpu.VMEM((block_kv, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, S, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hkv, S, D), q.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(q_off, q_uni, kv_uni, qmap, q_seg[:, None, :], kv_seg[:, None, :],
      qg, kh, vh, dog, lse, delta)

    dq = dq.reshape(B, H, T, D).transpose(0, 2, 1, 3)
    dk = dk.transpose(0, 2, 1, 3)
    dv = dv.transpose(0, 2, 1, 3)
    return dq, dk, dv


def _bwd_pallas_fused(q, k, v, q_seg, kv_seg, q_off, out, lse, do, causal,
                      scale, block_q, block_kv, interpret,
                      static_zero_offsets=False):
    B, T, H, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    qg, kh, vh, G = _grouped_views(q, k, v)
    dog = do.transpose(0, 2, 1, 3).reshape(B, Hkv, G, T, D)
    outg = out.transpose(0, 2, 1, 3).reshape(B, Hkv, G, T, D)
    delta = jnp.sum(
        dog.astype(jnp.float32) * outg.astype(jnp.float32), axis=-1
    )
    nq = pl.cdiv(T, block_q)
    nkv = pl.cdiv(S, block_kv)
    lse = _permute_lse(lse, nq, block_q)
    delta = _permute_lse(delta, nq, block_q)

    del static_zero_offsets  # superseded by the kv block map below

    def kv_index(b, h, iq, ikv, qo, qu, ku, kvmap):
        return (b, h, kvmap[b, iq, ikv], 0)

    def kv_seg_index(b, h, iq, ikv, qo, qu, ku, kvmap):
        return (b, 0, kvmap[b, iq, ikv])

    def q_index5(b, h, iq, ikv, qo, qu, ku, kvmap):
        return (b, h, 0, iq, 0)

    def q_seg_index(b, h, iq, ikv, qo, qu, ku, kvmap):
        return (b, 0, iq)

    def lse_index(b, h, iq, ikv, qo, qu, ku, kvmap):
        return (b, h, 0, iq)

    def dkv_index(b, h, iq, ikv, qo, qu, ku, kvmap):
        return (b, h, 0, 0)

    q_uni = _block_uniform(q_seg, block_q)
    kv_uni = _block_uniform(kv_seg, block_kv)
    kvmap, _ = _kv_block_map(q_uni, kv_uni, q_off[0], q_off[1], nq, nkv,
                             block_q, block_kv, causal)
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_fused_kernel, scale=scale, causal=causal,
            block_q=block_q, block_kv=block_kv, nq=nq, nkv=nkv, group=G,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(B, Hkv, nq, nkv),
            in_specs=[
                pl.BlockSpec((1, 1, block_q), q_seg_index),
                pl.BlockSpec((1, 1, block_kv), kv_seg_index),
                pl.BlockSpec((1, 1, G, block_q, D), q_index5),
                pl.BlockSpec((1, 1, block_kv, D), kv_index),
                pl.BlockSpec((1, 1, block_kv, D), kv_index),
                pl.BlockSpec((1, 1, G, block_q, D), q_index5),
                pl.BlockSpec((1, 1, 1, G * block_q), lse_index),
                pl.BlockSpec((1, 1, 1, G * block_q), lse_index),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, G, block_q, D), q_index5),
                pl.BlockSpec((1, 1, S, D), dkv_index),
                pl.BlockSpec((1, 1, S, D), dkv_index),
            ],
            scratch_shapes=[
                pltpu.VMEM((G * block_q, D), jnp.float32),
                pltpu.VMEM((S, D), jnp.float32),
                pltpu.VMEM((S, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, G, T, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hkv, S, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hkv, S, D), q.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(q_off, q_uni, kv_uni, kvmap, q_seg[:, None, :], kv_seg[:, None, :],
      qg, kh, vh, dog, lse, delta)

    dq = dq.reshape(B, H, T, D).transpose(0, 2, 1, 3)
    dk = dk.transpose(0, 2, 1, 3)
    dv = dv.transpose(0, 2, 1, 3)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Public API with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12))
def _flash_attention(q, k, v, q_seg, kv_seg, q_off, causal, scale, block_q,
                     block_kv, interpret, static_zero_offsets, dynamic):
    out, _ = _fwd_pallas(q, k, v, q_seg, kv_seg, q_off, causal, scale,
                         block_q, block_kv, interpret, static_zero_offsets,
                         dynamic)
    return out


def _flash_fwd(q, k, v, q_seg, kv_seg, q_off, causal, scale, block_q, block_kv,
               interpret, static_zero_offsets, dynamic):
    from jax.ad_checkpoint import checkpoint_name

    out, lse = _fwd_pallas(q, k, v, q_seg, kv_seg, q_off, causal, scale,
                           block_q, block_kv, interpret, static_zero_offsets,
                           dynamic)
    # named so remat policies can SAVE the kernel's residuals and skip
    # re-running the forward attention kernel in the backward pass
    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, q_seg, kv_seg, q_off, out, lse)


def _flash_bwd(causal, scale, block_q, block_kv, interpret,
               static_zero_offsets, dynamic, res, g):
    q, k, v, q_seg, kv_seg, q_off, out, lse = res
    dq, dk, dv = _bwd_pallas(
        q, k, v, q_seg, kv_seg, q_off, out, lse, g, causal, scale,
        block_q, block_kv, interpret, static_zero_offsets, dynamic,
    )
    return dq, dk, dv, None, None, None


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    segment_ids: Optional[jax.Array] = None,
    causal: bool = True,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_kv: int = 512,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
    kv_segment_ids: Optional[jax.Array] = None,
    q_offset=None,
    kv_offset=None,
    dynamic: Optional[bool] = None,
) -> jax.Array:
    """Packed-document flash attention.

    Args:
        q: [B, T, H, D]; k, v: [B, S, Hkv, D] (GQA when Hkv < H).
        segment_ids: [B, T] int32 document ids for q; 0 marks padding.
            Attention is restricted to (same segment) AND (causal).
        kv_segment_ids: [B, S]; defaults to segment_ids (self-attention).
        q_offset / kv_offset: global positions of row/col 0 (context
            parallel); scalar ints.
        causal / scale / block_q / block_kv: kernel options.
        use_pallas: force the kernel path; defaults to True on TPU backends.
        interpret: run the Pallas kernel in interpreter mode (debugging).
        dynamic: False selects the static-grid kernel variants
            (attn_implementation="flash_static"); default follows
            USE_DYNAMIC_KERNELS.

    Returns: [B, T, H, D] in q.dtype.
    """
    B, T, H, D = q.shape
    S = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    if use_pallas is None:
        use_pallas = _on_tpu()
    if kv_segment_ids is None and segment_ids is not None:
        kv_segment_ids = segment_ids
    if not (use_pallas or interpret):
        return packed_attention_reference(
            q, k, v, segment_ids, causal, scale,
            kv_segment_ids=kv_segment_ids,
            q_offset=0 if q_offset is None else q_offset,
            kv_offset=0 if kv_offset is None else kv_offset,
        )

    block_q = min(block_q, -(-T // 128) * 128)
    block_kv = min(block_kv, -(-S // 128) * 128)
    if segment_ids is None:
        segment_ids = jnp.ones((B, T), dtype=jnp.int32)
        kv_segment_ids = jnp.ones((B, S), dtype=jnp.int32)
    segment_ids = segment_ids.astype(jnp.int32)
    kv_segment_ids = kv_segment_ids.astype(jnp.int32)
    # pad sequence dims to block multiples; padding gets segment id 0, which
    # in packed batches marks padding and only matches itself
    qp = _pad_to(q, block_q, 1)
    kp = _pad_to(k, block_kv, 1)
    vp = _pad_to(v, block_kv, 1)
    q_segp = _pad_to(segment_ids, block_q, 1)
    kv_segp = _pad_to(kv_segment_ids, block_kv, 1)
    static_zero_offsets = q_offset is None and kv_offset is None
    q_off = jnp.stack([
        jnp.asarray(0 if q_offset is None else q_offset, jnp.int32).reshape(()),
        jnp.asarray(0 if kv_offset is None else kv_offset, jnp.int32).reshape(()),
    ])
    out = _flash_attention(
        qp, kp, vp, q_segp, kv_segp, q_off, causal, scale, block_q, block_kv,
        interpret, static_zero_offsets,
        USE_DYNAMIC_KERNELS if dynamic is None else dynamic,
    )
    return out[:, :T]

# ---------------------------------------------------------------------------
# Grouped-layout entry (kernel-native IO)
# ---------------------------------------------------------------------------
# The [B,T,H,D] entry above pays pad+transpose epilogues on every call: q/k/v
# are re-grouped to the kernel layout, the output is un-grouped, and lse is
# un/re-permuted between fwd and bwd — measured 2.6 ms/layer at the bench
# shape (B1 T8192 H24 Hkv8 D64), ~23% of the attention step. This entry
# accepts q [B,Hkv,G,T,D] and k/v [B,Hkv,S,D] — the layouts the Pallas
# kernels index natively and that the projection einsums can EMIT for free
# (the grouping transpose folds into the matmul's output layout; measured
# 1.11 ms grouped-direct vs 1.12 ms ungrouped + 0.42 ms transpose for the
# q projection) — returns the output grouped (the o-projection consumes it
# directly: 1.17 ms vs 2.12 ms for ungroup+matmul), and keeps lse in the
# kernel's flat block layout between forward and backward.


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def _flash_attention_g(qg, kh, vh, q_seg, kv_seg, q_off, causal, scale,
                       block_q, block_kv, interpret):
    out, _ = _flash_g_fwd(qg, kh, vh, q_seg, kv_seg, q_off, causal, scale,
                          block_q, block_kv, interpret)
    return out


def _flash_g_fwd(qg, kh, vh, q_seg, kv_seg, q_off, causal, scale,
                 block_q, block_kv, interpret):
    from jax.ad_checkpoint import checkpoint_name

    D_out = qg.shape[-1]
    qp, kp, vp = _pad_head_dim(qg, kh, vh)
    sum_lane = -1
    if qp.shape[-1] > D_out:
        vp = _set_ones_lane(vp, D_out)
        sum_lane = D_out
    outg, lse = _fwd_dyn_core(qp, kp, vp, q_seg, kv_seg, q_off, causal,
                              scale, block_q, block_kv, interpret,
                              sum_lane=sum_lane)
    outg = outg[..., :D_out]
    outg = checkpoint_name(outg, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    # residuals stay unpadded (same bytes as the model's tensors); the
    # backward re-pads with one fused copy each
    return outg, (qg, kh, vh, q_seg, kv_seg, q_off, outg, lse)


def _flash_g_bwd(causal, scale, block_q, block_kv, interpret, res, g):
    qg, kh, vh, q_seg, kv_seg, q_off, outg, lse = res
    D_out = qg.shape[-1]
    qp, kp, vp, outp, dop = _pad_head_dim(qg, kh, vh, outg, g)
    dq, dk, dv = _bwd_dyn_core(qp, kp, vp, q_seg, kv_seg, q_off, outp, lse,
                               dop, causal, scale, block_q, block_kv,
                               interpret)
    return (dq[..., :D_out], dk[..., :D_out], dv[..., :D_out],
            None, None, None)


_flash_attention_g.defvjp(_flash_g_fwd, _flash_g_bwd)


def _ungroup_q(qg):
    B, Hkv, G, T, D = qg.shape
    return qg.transpose(0, 3, 1, 2, 4).reshape(B, T, Hkv * G, D)


def _regroup_q(q, Hkv):
    B, T, H, D = q.shape
    return q.reshape(B, T, Hkv, H // Hkv, D).transpose(0, 2, 3, 1, 4)


def flash_attention_grouped(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    segment_ids: Optional[jax.Array] = None,
    causal: bool = True,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_kv: int = 512,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
    kv_segment_ids: Optional[jax.Array] = None,
    q_offset=None,
    kv_offset=None,
) -> jax.Array:
    """Packed-document flash attention, kernel-native grouped layout.

    Args:
        q: [B, Hkv, G, T, D] (GQA groups split out; H = Hkv * G).
        k, v: [B, Hkv, S, D].
        Everything else as flash_attention.

    Returns: [B, Hkv, G, T, D] in q.dtype.
    """
    B, Hkv, G, T, D = q.shape
    S = k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    if use_pallas is None:
        use_pallas = _on_tpu()
    if kv_segment_ids is None and segment_ids is not None:
        kv_segment_ids = segment_ids
    if not (use_pallas or interpret):
        out = packed_attention_reference(
            _ungroup_q(q), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
            segment_ids, causal, scale,
            kv_segment_ids=kv_segment_ids,
            q_offset=0 if q_offset is None else q_offset,
            kv_offset=0 if kv_offset is None else kv_offset,
        )
        return _regroup_q(out, Hkv)

    block_q = min(block_q, -(-T // 128) * 128)
    block_kv = min(block_kv, -(-S // 128) * 128)
    if segment_ids is None:
        segment_ids = jnp.ones((B, T), dtype=jnp.int32)
        kv_segment_ids = jnp.ones((B, S), dtype=jnp.int32)
    segment_ids = segment_ids.astype(jnp.int32)
    kv_segment_ids = kv_segment_ids.astype(jnp.int32)
    qp = _pad_to(q, block_q, 3)
    kp = _pad_to(k, block_kv, 2)
    vp = _pad_to(v, block_kv, 2)
    q_segp = _pad_to(segment_ids, block_q, 1)
    kv_segp = _pad_to(kv_segment_ids, block_kv, 1)
    q_off = jnp.stack([
        jnp.asarray(0 if q_offset is None else q_offset, jnp.int32).reshape(()),
        jnp.asarray(0 if kv_offset is None else kv_offset, jnp.int32).reshape(()),
    ])
    out = _flash_attention_g(
        qp, kp, vp, q_segp, kv_segp, q_off, causal, scale, block_q, block_kv,
        interpret,
    )
    return out[:, :, :, :T]


def make_grouped_prefill_map(q_seg, kv_seg, q_offset, block_q, block_kv,
                             causal: bool = True):
    """Precompute the live-kv block map for flash_prefill_grouped.

    One chunk's map is identical across all L decoder layers (it depends
    only on segments and the chunk offset) — computing it per layer costs
    one XLA sort per layer (the decode path's make_decode_block_map has the
    same contract). Pads segments exactly like flash_prefill_grouped."""
    T = q_seg.shape[1]
    S = kv_seg.shape[1]
    block_q = min(block_q, -(-T // 128) * 128)
    block_kv = min(block_kv, -(-S // 128) * 128)
    q_segp = _pad_to(q_seg.astype(jnp.int32), block_q, 1)
    kv_segp = _pad_to(kv_seg.astype(jnp.int32), block_kv, 1)
    nq = pl.cdiv(q_segp.shape[1], block_q)
    nkv = pl.cdiv(kv_segp.shape[1], block_kv)
    q_uni = _block_uniform(q_segp, block_q)
    kv_uni = _block_uniform(kv_segp, block_kv)
    kvmap, nlive = _kv_block_map(
        q_uni, kv_uni,
        jnp.asarray(q_offset, jnp.int32), jnp.asarray(0, jnp.int32),
        nq, nkv, block_q, block_kv, causal,
    )
    return q_uni, kv_uni, kvmap, nlive


def flash_prefill_grouped(
    q: jax.Array,  # [B, Hkv, G, T, D]
    k: jax.Array,  # [B, Hkv, S, D]
    v: jax.Array,
    segment_ids: jax.Array,  # [B, T]
    kv_segment_ids: jax.Array,  # [B, S]
    *,
    q_offset,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_kv: int = 512,
    block_map=None,  # from make_grouped_prefill_map (same block sizes)
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> jax.Array:
    """Forward-only grouped flash attention for chunked prefill.

    Like flash_attention_grouped but with no custom_vjp (decode/prefill is
    inference-only) and an optional precomputed block map so a chunk's one
    XLA sort is shared across every decoder layer."""
    B, Hkv, G, T, D = q.shape
    S = k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    if use_pallas is None:
        use_pallas = _on_tpu()
    if not (use_pallas or interpret):
        out = packed_attention_reference(
            _ungroup_q(q), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
            segment_ids, True, scale,
            kv_segment_ids=kv_segment_ids, q_offset=q_offset, kv_offset=0,
        )
        return _regroup_q(out, Hkv)
    block_q = min(block_q, -(-T // 128) * 128)
    block_kv = min(block_kv, -(-S // 128) * 128)
    qp = _pad_to(q, block_q, 3)
    kp = _pad_to(k, block_kv, 2)
    vp = _pad_to(v, block_kv, 2)
    q_segp = _pad_to(segment_ids.astype(jnp.int32), block_q, 1)
    kv_segp = _pad_to(kv_segment_ids.astype(jnp.int32), block_kv, 1)
    qp, kp, vp = _pad_head_dim(qp, kp, vp)
    q_off = jnp.stack([
        jnp.asarray(q_offset, jnp.int32).reshape(()),
        jnp.asarray(0, jnp.int32).reshape(()),
    ])
    out, _ = _fwd_dyn_core(
        qp, kp, vp, q_segp, kv_segp, q_off, True, scale, block_q, block_kv,
        interpret, block_map=block_map,
    )
    return out[:, :, :, :T, :D]
