# Copyright (c) 2026 touchnet_tpu authors.
# Fused lm-head + cross-entropy Pallas kernel ("liger CE", TPU-native).
#
# Capability parity: the reference's --training_enable_liger_kernel swaps in
# liger's Triton fused-linear-CE so the [N, V] fp32 logits never reach HBM
# (reference touchnet/bin/train.py:443-445). The existing TPU analog
# (parallel/loss_parallel.py) chunks the matmul + CE with lax.scan, but each
# [chunk, V] f32 logits tile still round-trips HBM (chunk 1024 x 32k vocab =
# 128 MiB per chunk) — measured ~24 ms vs a 12.6 ms flop-ideal for the
# 535M bench step's CE block (docs/performance.md).
#
# This kernel keeps every logits tile in VMEM:
#   forward  — grid (n_vocab_blocks, n_row_blocks), rows innermost. The
#     [v_blk, E] weight block is DMA'd once per outer step and reused across
#     all row blocks (weight traffic = |W| per pass, independent of N); each
#     step computes one [r_blk, v_blk] f32 logits tile on the MXU and folds
#     it into running per-row online-softmax state (max, sum-exp in base-2
#     space), the label's logit (one-hot extraction), and the running argmax
#     — all held in constant-index output refs that live in VMEM for the
#     whole call and flush once.
#   backward — same grid; recomputes the logits tile, forms
#     dlogits = dlse * softmax + dtrue * onehot (bf16: magnitudes are tiny
#     but bf16 precision is relative, f32 accumulation on the MXU), and
#     accumulates dH in a whole-[N, E] f32 VMEM-resident output (constant
#     index) and dW per vocab block (flushed when the outer index moves on).
#     The dH residency bound (~24 MiB) is what caps rows-per-call; the
#     public wrapper slices rows and lets JAX AD sum the per-slice dW.
#
# The public entry computes row-wise (lse, true_logit, argmax); loss
# reductions (pack loss / accuracy) stay in plain XLA outside. m (the row
# max) is exposed for the vocab-parallel combine but carries no gradient
# (the lse path's vjp already accounts for it).

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453
NEG_INF = -jnp.inf
_LANE = 128

# dH must stay VMEM-resident across the whole backward call (constant-index
# output); cap its footprint and slice rows above it.
_DH_VMEM_BUDGET = 24 * 2**20
# dW block is a VMEM f32 accumulator: v_blk * E * 4 bytes.
_DW_VMEM_BUDGET = 16 * 2**20
_ROW_BLOCK = 256


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _pick_vocab_block(V: int, E: int) -> Optional[int]:
    for v_blk in (2048, 1024, 512, 256, 128):
        if V % v_blk == 0 and v_blk * E * 4 <= _DW_VMEM_BUDGET:
            return v_blk
    return None


def kernel_applicable(N: int, E: int, V: int) -> bool:
    """Shapes the Pallas path supports; others use the scan fallback."""
    return (
        E % _LANE == 0
        and _pick_vocab_block(V, E) is not None
        and N >= _ROW_BLOCK
    )


def _rows_per_call(E: int) -> int:
    rows = _DH_VMEM_BUDGET // (4 * E)
    return max(_ROW_BLOCK, (rows // _ROW_BLOCK) * _ROW_BLOCK)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    lab_ref,  # [1, N] int32
    h_ref,  # [r_blk, E]
    w_ref,  # [v_blk, E]
    m_ref,  # [1, N] f32 out: running row max, base-2 space
    l_ref,  # [1, N] f32 out: running sum exp2
    tl_ref,  # [1, N] f32 out: label logit (natural units)
    ai_ref,  # [1, N] i32 out: running argmax
    *,
    r_blk: int,
    v_blk: int,
):
    vi, ri = pl.program_id(0), pl.program_id(1)
    rows = pl.ds(ri * r_blk, r_blk)

    t = jax.lax.dot_general(
        h_ref[...], w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [r_blk, v_blk] logits, f32
    t2 = t * LOG2E  # base-2 space for exp2

    @pl.when(vi == 0)
    def _init():
        m_ref[0, rows] = jnp.full((r_blk,), NEG_INF, jnp.float32)
        l_ref[0, rows] = jnp.zeros((r_blk,), jnp.float32)
        tl_ref[0, rows] = jnp.zeros((r_blk,), jnp.float32)
        ai_ref[0, rows] = jnp.zeros((r_blk,), jnp.int32)

    m_prev = m_ref[0, rows]
    l_prev = l_ref[0, rows]

    m_cur = jnp.max(t2, axis=1)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)
    p_sum = jnp.sum(jnp.exp2(t2 - m_new[:, None]), axis=1)
    m_ref[0, rows] = m_new
    l_ref[0, rows] = l_prev * alpha + p_sum

    # label logit: one-hot extraction (out-of-block / invalid labels match
    # nothing and contribute 0)
    local_lab = lab_ref[0, rows] - vi * v_blk
    cols = jax.lax.broadcasted_iota(jnp.int32, (r_blk, v_blk), 1)
    match = cols == local_lab[:, None]
    tl_ref[0, rows] += jnp.sum(jnp.where(match, t, 0.0), axis=1)

    # running argmax (strict > keeps the earlier/smaller index on ties, and
    # m_cur > m_prev is exactly "this block holds a new global max")
    arg_cur = jnp.argmax(t2, axis=1).astype(jnp.int32) + vi * v_blk
    ai_prev = ai_ref[0, rows]
    ai_ref[0, rows] = jnp.where(m_cur > m_prev, arg_cur, ai_prev)


def _fwd_pallas(h, w, labels, r_blk, v_blk, interpret):
    N, E = h.shape
    V = w.shape[0]
    nv = V // v_blk
    nr = N // r_blk
    kernel = functools.partial(_fwd_kernel, r_blk=r_blk, v_blk=v_blk)
    m2, l, tl, ai = pl.pallas_call(
        kernel,
        grid=(nv, nr),
        in_specs=[
            pl.BlockSpec((1, N), lambda v, r: (0, 0)),
            pl.BlockSpec((r_blk, E), lambda v, r: (r, 0)),
            pl.BlockSpec((v_blk, E), lambda v, r: (v, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, N), lambda v, r: (0, 0)),
            pl.BlockSpec((1, N), lambda v, r: (0, 0)),
            pl.BlockSpec((1, N), lambda v, r: (0, 0)),
            pl.BlockSpec((1, N), lambda v, r: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, N), jnp.float32),
            jax.ShapeDtypeStruct((1, N), jnp.float32),
            jax.ShapeDtypeStruct((1, N), jnp.float32),
            jax.ShapeDtypeStruct((1, N), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(labels[None, :].astype(jnp.int32), h, w)
    return m2[0], l[0], tl[0], ai[0]


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(
    lab_ref,  # [1, N] int32
    lse2_ref,  # [1, N] f32: global lse, base-2 space
    dlse_ref,  # [1, N] f32
    dtl_ref,  # [1, N] f32
    h_ref,  # [r_blk, E]
    w_ref,  # [v_blk, E]
    dh_ref,  # [N, E] f32 out (constant index: VMEM-resident accumulator)
    dw_ref,  # [v_blk, E] f32 out (flushed per vocab block)
    *,
    r_blk: int,
    v_blk: int,
):
    vi, ri = pl.program_id(0), pl.program_id(1)
    rows = pl.ds(ri * r_blk, r_blk)

    # The recompute chain stays f32 for ALL input dtypes. A bf16 chain (r5,
    # mirroring the flash kernels' dtype gate) was measured step-NEUTRAL at
    # V=32k on chip, and rounding the raw base-2 logits t2 to bf16 costs
    # ~|t2| * 2^-9 in the exponent — CE logits reach |t2|~80+ (E=128 toy
    # shape; larger at E=1024), a measured ~2.5% mean-relative dh/dw error
    # (test_bf16_grads_close pins the f32 chain at <0.3%). All error, no
    # measured win -> reverted. If a larger-vocab measurement ever shows a
    # real step win, round (t2 - lse2) AFTER the subtract instead: the
    # rounded quantity is then bounded by ~ln(1/p), not the raw logit.
    lp = jnp.float32
    t2 = (jax.lax.dot_general(
        h_ref[...], w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * LOG2E).astype(lp)
    p = jnp.exp2(
        t2 - lse2_ref[0, rows][:, None].astype(lp)
    )  # softmax, natural value

    local_lab = lab_ref[0, rows] - vi * v_blk
    cols = jax.lax.broadcasted_iota(jnp.int32, (r_blk, v_blk), 1)
    onehot = (cols == local_lab[:, None]).astype(lp)

    dl = (
        dlse_ref[0, rows][:, None].astype(lp) * p
        + dtl_ref[0, rows][:, None].astype(lp) * onehot
    ).astype(h_ref.dtype)

    dh_c = jax.lax.dot_general(
        dl, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [r_blk, E]
    dw_c = jax.lax.dot_general(
        dl, h_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [v_blk, E]

    @pl.when(vi == 0)
    def _init_dh():
        dh_ref[rows, :] = dh_c

    @pl.when(vi > 0)
    def _acc_dh():
        dh_ref[rows, :] += dh_c

    @pl.when(ri == 0)
    def _init_dw():
        dw_ref[...] = dw_c

    @pl.when(ri > 0)
    def _acc_dw():
        dw_ref[...] += dw_c


def _bwd_pallas(h, w, labels, lse, dlse, dtl, r_blk, v_blk, interpret):
    N, E = h.shape
    V = w.shape[0]
    nv = V // v_blk
    nr = N // r_blk
    kernel = functools.partial(_bwd_kernel, r_blk=r_blk, v_blk=v_blk)
    dh, dw = pl.pallas_call(
        kernel,
        grid=(nv, nr),
        in_specs=[
            pl.BlockSpec((1, N), lambda v, r: (0, 0)),
            pl.BlockSpec((1, N), lambda v, r: (0, 0)),
            pl.BlockSpec((1, N), lambda v, r: (0, 0)),
            pl.BlockSpec((1, N), lambda v, r: (0, 0)),
            pl.BlockSpec((r_blk, E), lambda v, r: (r, 0)),
            pl.BlockSpec((v_blk, E), lambda v, r: (v, 0)),
        ],
        out_specs=[
            pl.BlockSpec((N, E), lambda v, r: (0, 0)),
            pl.BlockSpec((v_blk, E), lambda v, r: (v, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, E), jnp.float32),
            jax.ShapeDtypeStruct((V, E), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(
        labels[None, :].astype(jnp.int32),
        (lse * LOG2E)[None, :].astype(jnp.float32),
        dlse[None, :].astype(jnp.float32),
        dtl[None, :].astype(jnp.float32),
        h,
        w,
    )
    return dh, dw


# ---------------------------------------------------------------------------
# XLA reference (CPU tests / fallback correctness oracle)
# ---------------------------------------------------------------------------


def _rows_reference(h, w, labels):
    logits = jnp.einsum(
        "ne,ve->nv", h, w, preferred_element_type=jnp.float32
    )
    m = jnp.max(logits, axis=-1)
    l = jnp.sum(jnp.exp(logits - m[:, None]), axis=-1)
    lse = m + jnp.log(l)
    V = w.shape[0]
    valid = (labels >= 0) & (labels < V)
    safe = jnp.clip(labels, 0, V - 1).astype(jnp.int32)
    tl = jnp.where(
        valid, jnp.take_along_axis(logits, safe[:, None], axis=-1)[:, 0], 0.0
    )
    ai = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return lse, tl, m * LOG2E, ai


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _ce_rows(h, w, labels, r_blk, v_blk, interpret):
    """Row-wise fused head+CE statistics.

    Returns (lse [N] f32, true_logit [N] f32, m2 [N] f32 base-2 row max
    (no gradient; for the vocab-parallel combine), argmax [N] i32).
    """
    out, _ = _ce_rows_fwd(h, w, labels, r_blk, v_blk, interpret)
    return out


def _ce_rows_fwd(h, w, labels, r_blk, v_blk, interpret):
    if interpret or _on_tpu():
        m2, l, tl, ai = _fwd_pallas(h, w, labels, r_blk, v_blk, interpret)
        lse = m2 * LN2 + jnp.log(jnp.where(l == 0.0, 1.0, l))
    else:
        lse, tl, m2, ai = _rows_reference(h, w, labels)
    return (lse, tl, m2, ai), (h, w, labels, lse)


def _ce_rows_bwd(r_blk, v_blk, interpret, res, cts):
    h, w, labels, lse = res
    dlse, dtl, _dm, _dai = cts
    if interpret or _on_tpu():
        dh, dw = _bwd_pallas(
            h, w, labels, lse, dlse, dtl, r_blk, v_blk, interpret
        )
    else:
        logits = jnp.einsum(
            "ne,ve->nv", h, w, preferred_element_type=jnp.float32
        )
        p = jnp.exp(logits - lse[:, None])
        V = w.shape[0]
        onehot = jax.nn.one_hot(
            jnp.clip(labels, 0, V - 1), V, dtype=jnp.float32
        ) * ((labels >= 0) & (labels < V)).astype(jnp.float32)[:, None]
        dl = (dlse[:, None] * p + dtl[:, None] * onehot).astype(h.dtype)
        dh = jnp.einsum("nv,ve->ne", dl, w, preferred_element_type=jnp.float32)
        dw = jnp.einsum("nv,ne->ve", dl, h, preferred_element_type=jnp.float32)
    return (
        dh.astype(h.dtype),
        dw.astype(w.dtype),
        np.zeros(labels.shape, jax.dtypes.float0),
    )


_ce_rows.defvjp(_ce_rows_fwd, _ce_rows_bwd)


def fused_ce_rows(
    h: jax.Array,
    w: jax.Array,
    labels: jax.Array,
    *,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Fused lm-head + CE row statistics without materializing logits.

    Args:
        h: [N, E] hidden states (bf16/f32).
        w: [V, E] lm-head weight (same dtype as h).
        labels: [N] int; anything outside [0, V) (padding / other vocab
            shard / ignore_index) contributes true_logit 0.

    Returns:
        (lse, true_logit, m2, argmax) per row; lse/true_logit carry
        gradients to (h, w); m2 (row max, base-2) and argmax are
        gradient-free auxiliaries.
    """
    N, E = h.shape
    V = w.shape[0]
    v_blk = _pick_vocab_block(V, E)
    if v_blk is None or not kernel_applicable(N, E, V):
        return _rows_reference(h, w, labels)
    r_blk = _ROW_BLOCK
    pad = (-N) % r_blk
    if pad:
        h = jnp.pad(h, ((0, pad), (0, 0)))
        labels = jnp.pad(labels, (0, pad), constant_values=-1)
    rows_cap = _rows_per_call(E)
    n_padded = N + pad
    outs = []
    for start in range(0, n_padded, rows_cap):
        stop = min(start + rows_cap, n_padded)
        outs.append(
            _ce_rows(
                h[start:stop], w, labels[start:stop], r_blk, v_blk, interpret
            )
        )
    lse, tl, m2, ai = (
        outs[0] if len(outs) == 1
        else tuple(jnp.concatenate(parts) for parts in zip(*outs))
    )
    if pad:
        lse, tl, m2, ai = lse[:N], tl[:N], m2[:N], ai[:N]
    return lse, tl, m2, ai
