# Copyright (c) 2026 touchnet_tpu authors.
# Fused linear + cross-entropy ("liger analog") and vocab-parallel pack loss.
#
# Capability parity: the reference reaches the same two goals with different
# machinery —
#   loss parallel: DTensor loss_parallel() keeps lm_head output sharded on
#     vocab and computes CE shard-locally with a global logsumexp
#     (reference touchnet/utils/distributed.py:318-329 +
#     parallelize_llama.py:105-196 ColwiseParallel(use_local_output=False));
#   liger fused CE: Triton kernel fusing lm_head matmul + CE so the full
#     [B, T, V] fp32 logits tensor never hits HBM
#     (reference touchnet/bin/train.py:443-445, liger-kernel).
# TPU-first design: one interface covers both, with two interchangeable
# implementations (impl= kwarg, auto-selected):
#   "scan"   — the head matmul + CE chunked over positions with lax.scan and
#     jax.checkpoint: each chunk's [chunk, V] logits live only in a
#     VMEM-sized working set and are recomputed in the backward, so peak
#     memory is O(chunk * V) instead of O(B * T * V). Works on any backend
#     and any shape.
#   "pallas" — ops/fused_ce.py: a Pallas kernel holding every logits tile in
#     VMEM across the online-softmax pass, so even the [chunk, V] f32 tiles
#     never round-trip HBM (the scan path still writes/reads them once per
#     chunk). Selected automatically on TPU when the shapes qualify
#     (kernel_applicable); measured 22.5 ms vs scan's 24.2 ms fwd+bwd for
#     the bench head (N=8k, E=1536, V=32k) on v5e — the gap scales with N.
# Under tensor parallelism either body runs inside shard_map with the vocab
# dim sharded on "tp": global max via lax.pmax, global sum-exp / true-logit
# via lax.psum — XLA never materializes an unsharded [B, T, V] array
# (test: tests/touchnet_tpu/parallel/test_loss_parallel.py asserts the
# lowered HLO has no full-logits tensor).
#
# Loss semantics are identical to touchnet_tpu.loss.cross_entropy_loss
# ("pack loss"): per-sample = sum(ce / sentence_lens) / global num_sentence,
# per-token = sum(ce) / num_valid_tokens; accuracy is fused into the same
# scan (argmax needs no gradient).

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from touchnet_tpu.loss.cross_entropy import IGNORE_INDEX
from touchnet_tpu.ops import fused_ce as _fused_ce

BATCH_AXES = ("dp_replicate", "dp_shard")
TP_AXIS = "tp"
CP_AXIS = "cp"
LN2 = 0.6931471805599453


def _pick_impl(
    impl: Optional[str], n: int, e: int, v_local: int,
    pallas_safe: bool = True,
) -> str:
    """Resolve impl=None/"auto" to the concrete body for local shapes.

    pallas_safe: False when the body would run under GSPMD on sharded
    global arrays (a pallas_call is an opaque custom call the SPMD
    partitioner cannot split — only per-device bodies inside shard_map or
    unsharded single-device programs may auto-pick it)."""
    if impl in ("scan", "pallas"):
        if impl == "pallas" and not pallas_safe:
            raise ValueError(
                "impl='pallas' requested for a body that would run under "
                "GSPMD on sharded global arrays; the pallas_call is an "
                "opaque custom call the SPMD partitioner cannot split — "
                "use impl='scan' or None (auto)"
            )
        if impl == "pallas" and not _fused_ce.kernel_applicable(n, e, v_local):
            raise ValueError(
                f"impl='pallas' requested but shapes (N={n}, E={e}, "
                f"V_local={v_local}) are outside the kernel's support; "
                "use impl='scan' or None (auto)"
            )
        return impl
    if (
        pallas_safe
        and jax.default_backend() == "tpu"
        and _fused_ce.kernel_applicable(n, e, v_local)
    ):
        return "pallas"
    return "scan"


def _rows_sums(
    hidden: jax.Array,  # [N, D] flattened positions (local shard)
    w: jax.Array,  # [V_local, D]
    labels: jax.Array,  # [N] GLOBAL vocab ids
    sentence_lens: jax.Array,  # [N]
    axis_name: Optional[str],
    vocab_start,  # scalar (traced under tp)
    ignore_index: int,
):
    """The four pack-loss partial sums via the fused Pallas head+CE kernel
    (ops/fused_ce.py). Interpret mode keeps this testable off-TPU."""
    interpret = jax.default_backend() != "tpu"
    lse, tl, m2, ai = _fused_ce.fused_ce_rows(
        hidden, w, labels - vocab_start, interpret=interpret
    )
    valid = labels != ignore_index
    if axis_name is not None:
        # combine the shard-local online-softmax stats over the vocab axis;
        # d(lse)/d(lse_local) = exp(lse_local - lse) (the shard's softmax
        # share), handled by plain AD through exp/psum/log
        m2 = jax.lax.stop_gradient(m2)  # stats-only (kernel vjp drops dm)
        gval = jax.lax.pmax(m2, axis_name)  # one collective serves both
        gmax = gval * LN2
        sumexp = jax.lax.psum(jnp.exp(lse - gmax), axis_name)
        lse = gmax + jnp.log(sumexp)
        tl = jax.lax.psum(tl, axis_name)
        cand = jnp.where(
            m2 == gval, ai + vocab_start, jnp.iinfo(jnp.int32).max
        )
        ai = jax.lax.pmin(cand, axis_name)  # ties -> smallest global index
    ce = jnp.where(valid, lse - tl, 0.0)
    # mask BEFORE dividing: an ignored position may carry sentence_lens == 0
    # from the loader pad path; 0 * (1/0) would be NaN, not 0
    inv_slen = jnp.where(
        valid, 1.0 / jnp.maximum(sentence_lens, 1).astype(jnp.float32), 0.0
    )
    return (
        jnp.sum(ce * inv_slen),
        jnp.sum(ce),
        jnp.sum(valid),
        jnp.sum((ai == labels) & valid),
    )


def _chunk_body(w, axis_name, vocab_start, ignore_index):
    """Per-chunk CE: returns the four partial sums
    (sum ce/slen, sum ce, num valid tokens, num argmax hits)."""

    def body(carry, xs):
        h, labels, inv_slen = xs  # [C, D], [C], [C]
        logits = jnp.einsum(
            "cd,vd->cv", h, w, preferred_element_type=jnp.float32
        )  # [C, V_local] — MXU matmul, fp32 accumulate
        valid = labels != ignore_index

        local_max = jax.lax.stop_gradient(jnp.max(logits, axis=-1))  # [C]
        if axis_name is not None:
            gmax = jax.lax.pmax(local_max, axis_name)
        else:
            gmax = local_max
        sumexp = jnp.sum(jnp.exp(logits - gmax[:, None]), axis=-1)
        if axis_name is not None:
            sumexp = jax.lax.psum(sumexp, axis_name)
        lse = gmax + jnp.log(sumexp)

        # true logit: only the shard owning the label contributes
        local_label = labels - vocab_start
        v_local = logits.shape[-1]
        in_range = (local_label >= 0) & (local_label < v_local) & valid
        safe = jnp.clip(local_label, 0, v_local - 1).astype(jnp.int32)
        true_logit = jnp.where(
            in_range,
            jnp.take_along_axis(logits, safe[:, None], axis=-1)[:, 0],
            0.0,
        )
        if axis_name is not None:
            true_logit = jax.lax.psum(true_logit, axis_name)
        ce = jnp.where(valid, lse - true_logit, 0.0)

        # fused accuracy (no gradient): global argmax == label
        det = jax.lax.stop_gradient(logits)
        local_arg = jnp.argmax(det, axis=-1)
        local_val = jnp.max(det, axis=-1)
        if axis_name is not None:
            gval = jax.lax.pmax(local_val, axis_name)
            cand = jnp.where(
                local_val == gval,
                local_arg + vocab_start,
                jnp.iinfo(jnp.int32).max,
            )
            garg = jax.lax.pmin(cand, axis_name)  # ties -> smallest index
        else:
            garg = local_arg
        hits = jnp.sum((garg == labels) & valid)

        carry = (
            carry[0] + jnp.sum(ce * inv_slen),
            carry[1] + jnp.sum(ce),
            carry[2] + jnp.sum(valid),
            carry[3] + hits,
        )
        return carry, None

    return body


def _chunked_sums(
    hidden: jax.Array,  # [N, D] flattened positions (local shard)
    w: jax.Array,  # [V_local, D]
    labels: jax.Array,  # [N]
    sentence_lens: jax.Array,  # [N]
    chunk_size: int,
    axis_name: Optional[str],
    vocab_start,
    ignore_index: int,
):
    n, d = hidden.shape
    chunk = max(1, min(chunk_size, n))
    pad = (-n) % chunk
    if pad:
        hidden = jnp.pad(hidden, ((0, pad), (0, 0)))
        labels = jnp.pad(labels, (0, pad), constant_values=ignore_index)
        sentence_lens = jnp.pad(sentence_lens, (0, pad), constant_values=1)
    nc = (n + pad) // chunk
    # mask BEFORE dividing (see _rows_sums): ignored positions may carry
    # sentence_lens == 0 from the loader pad path
    inv_slen = jnp.where(
        labels != ignore_index,
        1.0 / jnp.maximum(sentence_lens, 1).astype(jnp.float32),
        0.0,
    )
    xs = (
        hidden.reshape(nc, chunk, d),
        labels.reshape(nc, chunk),
        inv_slen.reshape(nc, chunk),
    )
    body = jax.checkpoint(
        _chunk_body(w, axis_name, vocab_start, ignore_index), prevent_cse=False
    )
    init = (
        jnp.zeros((), jnp.float32),
        jnp.zeros((), jnp.float32),
        jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32),
    )
    sums, _ = jax.lax.scan(body, init, xs)
    return sums


def _finalize(sums, num_sentence) -> Tuple[jax.Array, jax.Array, jax.Array]:
    ce_over_slen, ce_total, ntok, hits = sums
    loss_per_sample = ce_over_slen / num_sentence
    ntok_f = ntok.astype(jnp.float32)
    loss_per_token = jnp.where(
        jnp.logical_and(ce_total > 1e-6, ntok > 0), ce_total / ntok_f, 0.0
    )
    acc = jnp.where(ntok > 0, hits.astype(jnp.float32) / ntok_f, 0.0)
    return loss_per_sample, loss_per_token, acc


def _sums(
    hidden, w, labels, sentence_lens, chunk_size, axis_name, vocab_start,
    ignore_index, impl, pallas_safe=True,
):
    """Dispatch between the Pallas rows body and the scan body on the LOCAL
    shapes actually entering the matmul."""
    n, e = hidden.shape
    body = _pick_impl(impl, n, e, w.shape[0], pallas_safe)
    if body == "pallas":
        return _rows_sums(
            hidden, w, labels, sentence_lens, axis_name, vocab_start,
            ignore_index,
        )
    return _chunked_sums(
        hidden, w, labels, sentence_lens, chunk_size, axis_name, vocab_start,
        ignore_index,
    )


def fused_linear_cross_entropy(
    hidden: jax.Array,
    head_w: jax.Array,
    labels: jax.Array,
    sentence_lens: jax.Array,
    num_sentence: jax.Array,
    *,
    mesh: Optional[Mesh] = None,
    chunk_size: int = 1024,
    compute_dtype=jnp.bfloat16,
    ignore_index: int = IGNORE_INDEX,
    impl: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pack loss computed from final hidden states + lm_head weight without
    materializing [B, T, V] logits.

    Args:
        hidden: [B, T, D] final hidden states (post final-norm).
        head_w: [V, D] lm_head weight.
        labels / sentence_lens: [B, T] (pack-loss batch contract).
        num_sentence: scalar GLOBAL packed-sentence count.
        mesh: when given and its "tp" axis is >1, runs vocab-parallel inside
            shard_map (head_w sharded on vocab; global reductions over tp).
        impl: None/"auto" picks the Pallas fused kernel on TPU when shapes
            qualify, else the lax.scan chunk body; "scan"/"pallas" force.

    Returns:
        (loss_per_sample, loss_per_token, accuracy) replicated scalars.
    """
    hidden = hidden.astype(compute_dtype)
    head_w = head_w.astype(compute_dtype)
    if mesh is not None and mesh.size > 1:
        # multi-device: run the body inside shard_map over whatever axes
        # divide (tp shards the vocab; dp/cp shard the rows) — per-device
        # bodies let the Pallas kernel engage (a pallas_call cannot be
        # split by GSPMD) and psum the four sums
        return _sharded_ce(
            hidden, head_w, labels, sentence_lens, num_sentence,
            mesh=mesh, chunk_size=chunk_size, ignore_index=ignore_index,
            impl=impl,
        )
    n = hidden.shape[0] * hidden.shape[1]
    sums = _sums(
        hidden.reshape(n, -1),
        head_w,
        labels.reshape(n),
        sentence_lens.reshape(n),
        chunk_size,
        axis_name=None,
        vocab_start=0,
        ignore_index=ignore_index,
        impl=impl,
        # this body runs under GSPMD on the (possibly dp/cp-sharded) global
        # batch — the kernel may only auto-engage on a single-device mesh
        pallas_safe=mesh is None or mesh.size == 1,
    )
    return _finalize(sums, num_sentence)


def _divisible_axes(dim: int, axes, mesh: Mesh):
    """The subset of mesh axes (in order) whose product divides dim; data is
    only truly sharded over these — psum over anything else would overcount."""
    out = []
    size = 1
    for a in axes:
        s = mesh.shape.get(a, 1)
        if s > 1 and dim % (size * s) == 0:
            out.append(a)
            size *= s
    return tuple(out)


def _sharded_ce(
    hidden, head_w, labels, sentence_lens, num_sentence,
    *, mesh: Mesh, chunk_size: int, ignore_index: int,
    impl: Optional[str] = None,
):
    """CE inside shard_map over every mesh axis that divides: tp shards the
    vocab (vocab-parallel combine), dp_replicate/dp_shard shard the batch
    rows and cp the sequence (four-sum psum). tp may be 1 — the dp/cp-only
    case still runs per-device so the Pallas body stays usable."""
    try:
        from jax import shard_map
        rep_kw = {"check_vma": False}
    except ImportError:  # jax < 0.8
        from jax.experimental.shard_map import shard_map
        rep_kw = {"check_rep": False}

    B, T, _ = hidden.shape
    V = head_w.shape[0]
    batch_axes = _divisible_axes(B, BATCH_AXES, mesh)
    seq_axes = _divisible_axes(T, (CP_AXIS,), mesh)
    tp_axes = _divisible_axes(V, (TP_AXIS,), mesh)
    if not tp_axes and not batch_axes and not seq_axes:
        # nothing divides: plain GSPMD body (scan only — see _pick_impl)
        n = B * T
        sums = _sums(
            hidden.reshape(n, -1), head_w, labels.reshape(n),
            sentence_lens.reshape(n), chunk_size, None, 0, ignore_index, impl,
            pallas_safe=mesh.size == 1,
        )
        return _finalize(sums, num_sentence)

    bspec = batch_axes if batch_axes else None
    sspec = seq_axes[0] if seq_axes else None
    data_axes = batch_axes + seq_axes
    w_spec = P(TP_AXIS, None) if tp_axes else P(None, None)

    def f(h, w, lab, slen, ns):
        if tp_axes:
            axis_name = TP_AXIS
            vocab_start = jax.lax.axis_index(TP_AXIS) * w.shape[0]
        else:
            axis_name = None
            vocab_start = 0
        n = h.shape[0] * h.shape[1]
        sums = _sums(
            h.reshape(n, -1), w, lab.reshape(n), slen.reshape(n),
            chunk_size, axis_name, vocab_start, ignore_index, impl,
        )
        if data_axes:
            sums = tuple(jax.lax.psum(s, data_axes) for s in sums)
        return _finalize(sums, ns)

    return shard_map(
        f,
        mesh=mesh,
        in_specs=(
            P(bspec, sspec, None),
            w_spec,
            P(bspec, sspec),
            P(bspec, sspec),
            P(),
        ),
        out_specs=(P(), P(), P()),
        **rep_kw,
    )(hidden, head_w, labels, sentence_lens, num_sentence)
