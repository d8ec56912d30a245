# Copyright (c) 2026 touchnet_tpu authors.
# Pallas decode attention: one query step against a dense ragged KV cache.
#
# Capability parity: the reference delegates decoding to HF generate
# (eager SDPA over the cache). TPU-native design in the spirit of "Ragged
# Paged Attention" (PAPERS.md): a single-pass flash kernel over the cache
# with per-row validity, instead of the XLA einsum path whose cache
# streaming runs far below the bandwidth roofline at long context.
#
# The cache is PACKED: one [B, Hkv, S, 2D] buffer with K in lanes [0, D)
# and V in lanes [D, 2D) (inference_llama.KVCache contract). Packing is
# what makes the kernel bandwidth-shaped:
#   - 2D is a lane-tile multiple for the common head dims (64, 128), so
#     the manual block DMA needs no head-dim padding (a separate D=64
#     cache would be repadded to 128 lanes on every step);
#   - one DMA per sequence block moves K AND V for ALL kv heads
#     ([Hkv, block, 2D] ~ 1 MB), so the loop amortizes DMA latency that a
#     per-(head, block) grid pays 8x;
#   - the query is zero-padded into the packed width: dot(q_pad, kv^T)
#     computes q.k exactly (zero lanes kill the V half), and p @ kv
#     leaves p.v in the V lanes of the accumulator.
# Validity for row b: col < prompt_len[b] OR base <= col <= last (the
# [prompt_len, base) gap holds prefill right-padding).
#
# RAGGED BLOCK TABLE: each batch row walks its OWN per-row list of live
# blocks (bmap [B, nmax] physical block ids + nlive [B] trip counts,
# built by live_block_map). Rows with short prompts skip the dead
# [prompt_len, base) gap blocks entirely — zero DMA, zero compute — which
# is what lets the kernel beat the XLA einsum path on ragged batches: the
# einsum must stream the full dense cache every step. This is the
# "Ragged Paged Attention" access pattern with an identity page pool
# (block table + per-sequence lengths). Inference only — no VJP.

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = 1.4426950408889634
_LANE = 128
NEG_INF = -1e30

# Default ON for every supported shape (measured r4 on v5e, 535M model,
# ragged prompts, marginal e2e decode step with the zero-copy rank-5
# cache path — host-read-synced timing):
#   B=32 8k ctx: flash 9.55 ms/step (3349 batch tok/s); einsum-era 57.6 ms
#   B=8  8k ctx: flash 3.32 ms/step
#   B=8  2k ctx: flash 2.37 ms vs einsum 3.83 (1.6x)
#   B=1  2k ctx: flash 1.74 ms vs einsum 1.83
# The r3 "short caches stay on einsum" crossover (threshold 4096) was an
# artifact of the per-layer cache extract both paths then paid; with the
# kernel indexing the layer inside its own DMAs the flash path wins at
# every measured point, so the context threshold is retired (kept as a
# knob for A/B). The einsum path remains for unsupported shapes and
# non-TPU backends.
USE_FLASH_DECODE = True
FLASH_DECODE_MIN_CONTEXT = 0

# decode kernel sequence-block size; cache allocations round up to it so
# the kernel's manual DMAs never need a padded cache copy
DECODE_BLOCK = 512


def _n_splits(n_kv_heads: int) -> int:
    """Largest divisor of Hkv that is <= 4 (DMA engines to engage). A
    non-divisor split would leave Hkv % splits trailing heads un-DMA'd,
    silently attending over stale VMEM."""
    for s in (4, 3, 2):
        if n_kv_heads % s == 0:
            return s
    return 1


def supported(head_dim: int, n_kv_heads: int) -> bool:
    """Whether the kernel's shape constraints hold: callers gate
    use_flash_decode on this and fall back to the einsum cache path
    rather than hitting trace-time asserts."""
    del n_kv_heads  # any Hkv works via _n_splits
    return (2 * head_dim) % _LANE == 0


def _kernel(
    plen_ref,  # SMEM [B] prompt lengths
    lim_ref,   # SMEM [3] = [base, last, layer]
    bmap_ref,  # SMEM [B, nmax] per-row live block ids (block table)
    nlive_ref,  # SMEM [B] per-row live block count (ragged trip count)
    q_ref, kv_any, out_ref,
    kv_buf, m_scr, l_scr, acc_scr, sem,
    *, scale: float, block_s: int, group: int, n_kv_heads: int,
):
    bi = pl.program_id(0)
    G, Hkv = group, n_kv_heads
    plen = plen_ref[bi]
    base = lim_ref[0]
    last = lim_ref[1]
    li = lim_ref[2]  # layer index into the [L, B, Hkv, S, 2D] cache
    n = nlive_ref[bi]

    m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
    l_scr[:] = jnp.zeros_like(l_scr)
    acc_scr[:] = jnp.zeros_like(acc_scr)

    # split each block's copy across kv-head groups: one async_copy rides
    # one DMA engine (~100 GB/s); parallel copies engage several engines
    splits = _n_splits(Hkv)
    hs = Hkv // splits

    def dmas(slot, t):
        jb = bmap_ref[bi, t]  # physical block for this row's t-th live block
        return [
            pltpu.make_async_copy(
                # indexing the LAYER inside the DMA is what lets decode keep
                # the whole [L, B, Hkv, S, 2D] cache in place: the caller
                # never materializes a per-layer slice (r4: the extract +
                # reinsert moved ~2.1 GB/layer/step — 36 ms of a 57.6 ms
                # decode step at B=32/8k)
                kv_any.at[li, bi, pl.ds(i * hs, hs),
                          pl.ds(jb * block_s, block_s), :],
                kv_buf.at[slot, pl.ds(i * hs, hs)], sem.at[slot, i],
            )
            for i in range(splits)
        ]

    @pl.when(n > 0)
    def _warmup():
        for d in dmas(0, 0):
            d.start()

    D2 = q_ref.shape[-1]
    HG = Hkv * G
    qs = (q_ref[0] * jnp.asarray(scale * LOG2E, q_ref.dtype)).reshape(
        HG, D2
    )
    # head-of-row / head-of-col maps for the block-diagonal mask: ONE dot
    # computes every (q-head, kv-head) product for the whole block — the
    # off-diagonal flops are an 8x MXU overspend that costs ~nothing,
    # while per-head [G, block] dots pay Mosaic's small-shape tax 2*Hkv
    # times per block. Off-diagonal p is exp2(-inf) = 0, which makes the
    # single flat pv dot sum exactly each head's own V.
    rows_h = jax.lax.broadcasted_iota(jnp.int32, (HG, Hkv * block_s), 0) // G
    cols_flat = jax.lax.broadcasted_iota(
        jnp.int32, (HG, Hkv * block_s), 1
    )
    cols_h = cols_flat // block_s
    cols_s = cols_flat % block_s
    head_diag = rows_h == cols_h

    def body(t, _):
        slot = t % 2

        @pl.when(t + 1 < n)
        def _prefetch():
            for d in dmas((t + 1) % 2, t + 1):
                d.start()

        for d in dmas(slot, t):
            d.wait()
        kv = kv_buf[slot].reshape(Hkv * block_s, D2)
        s = jax.lax.dot_general(
            qs, kv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [HG, Hkv*block_s]; V lanes of qs are zero => pure q.k
        pos = bmap_ref[bi, t] * block_s + cols_s
        valid = head_diag & (
            (pos < plen) | ((pos >= base) & (pos <= last))
        )
        s = jnp.where(valid, s, NEG_INF)
        m_prev = m_scr[:, :1]
        l_prev = l_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new)
        l_scr[:] = jnp.broadcast_to(
            alpha * l_prev + jnp.sum(p, axis=1, keepdims=True), l_scr.shape
        )
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        pv = jax.lax.dot_general(
            p.astype(kv.dtype), kv,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )  # [HG, 2D]; V half is p.v, K half is discarded garbage
        acc_scr[:] = acc_scr[:] * alpha + pv
        return _

    jax.lax.fori_loop(0, n, body, None)

    l = l_scr[:, :1]
    out_ref[0] = (
        acc_scr[:] / jnp.where(l == 0.0, 1.0, l)
    ).reshape(out_ref.shape[1:]).astype(out_ref.dtype)


def block_geometry(S: int, block_s: int = 512):
    """(effective block size, padded block count) for a cache of length S —
    callers precomputing a block map must mirror decode_attention's
    padding."""
    bs = min(block_s, -(-S // _LANE) * _LANE)
    return bs, -(-S // bs)


def live_block_map(prompt_len, base, last, block_s: int, n_blocks: int):
    """Per-row block table: bmap [B, n_blocks] lists (ascending) the block
    ids that intersect the row's live set [0, plen) ∪ [base, last]; nlive
    [B] is the ragged trip count. Rows with short prompts skip their dead
    [plen, base) gap blocks — the reads the dense einsum path cannot
    avoid."""
    ids = jnp.arange(n_blocks, dtype=jnp.int32)
    lo = ids * block_s
    hi = lo + block_s  # exclusive
    live = (lo < prompt_len[:, None]) | ((hi > base) & (lo <= last))
    # sort-free compaction (an XLA sort on TPU costs more than the decode
    # kernel itself): live block i lands at slot cumsum(live)-1 — build the
    # [B, nb, nb] one-hot of that placement and contract with the block ids
    pos = jnp.cumsum(live.astype(jnp.int32), axis=1) - 1  # [B, nb]
    slots = jnp.arange(n_blocks, dtype=jnp.int32)
    onehot = (pos[:, :, None] == slots[None, None, :]) & live[:, :, None]
    bmap = jnp.einsum(
        "bis,i->bs", onehot.astype(jnp.int32), ids
    ).astype(jnp.int32)
    return bmap, live.sum(axis=1).astype(jnp.int32)


def decode_attention(
    q: jax.Array,           # [B, H, D]
    kv_cache: jax.Array,    # [B, Hkv, S, 2D] or [L, B, Hkv, S, 2D] packed
    prompt_len: jax.Array,  # [B] int32
    base,                   # scalar: first decode slot
    last,                   # scalar: current decode slot (inclusive)
    scale: float = None,
    block_s: int = 512,
    interpret: bool = False,
    block_map=None,  # optional precomputed (bmap, nlive) from live_block_map
    layer_idx=None,  # scalar: layer into a rank-5 cache (kernel-side index)
) -> jax.Array:
    """Flash decode step over a packed ragged cache. Returns [B, H, D].

    ``block_map``: pass live_block_map(...) computed ONCE per decode step —
    computing it here is correct but runs an XLA sort per LAYER (the layer
    scan re-traces this call), which costs more than the kernel itself.

    ``layer_idx``: with a rank-5 [L, B, Hkv, S, 2D] cache, the kernel
    indexes the layer inside its own block DMAs — the caller passes the
    WHOLE multi-layer cache and never materializes a per-layer slice
    (which would move ~2x the layer's cache bytes per step)."""
    B, H, D = q.shape
    if kv_cache.ndim == 4:
        kv_cache = kv_cache[None]
        layer_idx = 0
    assert layer_idx is not None, "rank-5 cache requires layer_idx"
    Hkv, S = kv_cache.shape[2], kv_cache.shape[3]
    D2 = kv_cache.shape[4]
    assert D2 == 2 * D, (D2, D)
    G = H // Hkv
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    assert D2 % _LANE == 0, (
        f"packed kv width {D2} must be a {_LANE}-lane multiple"
    )

    block_s = min(block_s, -(-S // _LANE) * _LANE)
    Sp = -(-S // block_s) * block_s
    if Sp != S:
        # correctness fallback ONLY: this copies the WHOLE cache every
        # layer every step (measured: it single-handedly turned a 5x
        # kernel win into a loss). init_cache rounds max_len up to
        # DECODE_BLOCK so production callers never hit it.
        kv_cache = jnp.pad(
            kv_cache, [(0, 0), (0, 0), (0, 0), (0, Sp - S), (0, 0)]
        )

    # zero V lanes in the query: dot against packed kv then equals q.k
    qg = jnp.pad(q.reshape(B, Hkv, G, D), [(0, 0)] * 3 + [(0, D2 - D)])
    base = jnp.asarray(base, jnp.int32).reshape(())
    last = jnp.asarray(last, jnp.int32).reshape(())
    lim = jnp.stack([base, last, jnp.asarray(layer_idx, jnp.int32).reshape(())])
    if block_map is not None:
        bmap, nlive = block_map
        assert bmap.shape == (B, Sp // block_s), (bmap.shape, B, Sp // block_s)
    else:
        bmap, nlive = live_block_map(
            prompt_len.astype(jnp.int32), base, last, block_s, Sp // block_s
        )

    out = pl.pallas_call(
        functools.partial(
            _kernel, scale=scale, block_s=block_s, group=G,
            n_kv_heads=Hkv,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, Hkv, G, D2), lambda b, *_: (b, 0, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, Hkv, G, D2), lambda b, *_: (b, 0, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((2, Hkv, block_s, D2), kv_cache.dtype),
                pltpu.VMEM((Hkv * G, _LANE), jnp.float32),
                pltpu.VMEM((Hkv * G, _LANE), jnp.float32),
                pltpu.VMEM((Hkv * G, D2), jnp.float32),
                pltpu.SemaphoreType.DMA((2, _n_splits(Hkv))),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D2), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(prompt_len.astype(jnp.int32), lim, bmap, nlive, qg, kv_cache)
    # V lanes of the accumulator hold p.v
    return out.reshape(B, H, D2)[..., D:]
