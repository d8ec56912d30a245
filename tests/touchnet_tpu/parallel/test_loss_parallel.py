# Fused linear+CE / vocab-parallel pack loss vs the full-logits golden.
# Mirrors the reference's loss-parallel semantics (touchnet/utils/
# distributed.py:318-329 + tests/touchnet/utils/test_pack_loss.py): the
# fused/sharded loss must equal the unfused packed loss bit-for-bit in fp32,
# including gradients, and must never materialize an unsharded [B, T, V].

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from touchnet_tpu.loss import accuracy, cross_entropy_loss
from touchnet_tpu.parallel.dims import ParallelDims
from touchnet_tpu.parallel.loss_parallel import fused_linear_cross_entropy

B, T, D, V = 2, 64, 32, 64


def _inputs(seed=0, vocab=V):
    rng = np.random.default_rng(seed)
    hidden = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    head_w = jnp.asarray(rng.normal(size=(vocab, D)) * 0.1, jnp.float32)
    labels = rng.integers(0, vocab, size=(B, T)).astype(np.int32)
    labels[:, -T // 8:] = -100  # padding tail
    sentence_lens = np.full((B, T), T // 2, np.int32)
    num_sentence = jnp.asarray(2.0 * B, jnp.float32)
    return hidden, head_w, jnp.asarray(labels), jnp.asarray(sentence_lens), num_sentence


def _golden(hidden, head_w, labels, slen, ns):
    logits = hidden @ head_w.T
    loss_ps, loss_pt = cross_entropy_loss(logits, labels, slen, ns)
    return loss_ps, loss_pt, accuracy(logits, labels)


@pytest.mark.parametrize("chunk", [16, 23, 4096])
def test_fused_matches_golden(chunk):
    hidden, head_w, labels, slen, ns = _inputs()
    g_ps, g_pt, g_acc = _golden(hidden, head_w, labels, slen, ns)
    f_ps, f_pt, f_acc = fused_linear_cross_entropy(
        hidden, head_w, labels, slen, ns,
        chunk_size=chunk, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(f_ps, g_ps, rtol=1e-6)
    np.testing.assert_allclose(f_pt, g_pt, rtol=1e-6)
    np.testing.assert_allclose(f_acc, g_acc, rtol=1e-6)


def test_fused_grads_match_golden():
    hidden, head_w, labels, slen, ns = _inputs(seed=1)

    def gold(h, w):
        return _golden(h, w, labels, slen, ns)[0]

    def fused(h, w):
        return fused_linear_cross_entropy(
            h, w, labels, slen, ns, chunk_size=16, compute_dtype=jnp.float32
        )[0]

    gh, gw = jax.grad(gold, argnums=(0, 1))(hidden, head_w)
    fh, fw = jax.grad(fused, argnums=(0, 1))(hidden, head_w)
    np.testing.assert_allclose(fh, gh, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(fw, gw, rtol=1e-5, atol=1e-7)


def _tp_mesh(tp=2, dp=2, cp=2):
    dims = ParallelDims(
        dp_replicate=1, dp_shard=dp, cp=cp, tp=tp, pp=1,
        world_size=dp * cp * tp, enable_loss_parallel=True,
    )
    return dims.build_mesh()


def test_vocab_parallel_matches_golden():
    mesh = _tp_mesh()
    hidden, head_w, labels, slen, ns = _inputs(seed=2)
    g = _golden(hidden, head_w, labels, slen, ns)
    with mesh:
        f = jax.jit(
            lambda h, w: fused_linear_cross_entropy(
                h, w, labels, slen, ns,
                mesh=mesh, chunk_size=16, compute_dtype=jnp.float32,
            )
        )(hidden, head_w)
    for fv, gv in zip(f, g):
        np.testing.assert_allclose(fv, gv, rtol=1e-5)


def test_vocab_parallel_grads_match_golden():
    mesh = _tp_mesh()
    hidden, head_w, labels, slen, ns = _inputs(seed=3)

    def gold(h, w):
        return _golden(h, w, labels, slen, ns)[0]

    def fused(h, w):
        return fused_linear_cross_entropy(
            h, w, labels, slen, ns,
            mesh=mesh, chunk_size=16, compute_dtype=jnp.float32,
        )[0]

    gh, gw = jax.grad(gold, argnums=(0, 1))(hidden, head_w)
    with mesh:
        fh, fw = jax.jit(jax.grad(fused, argnums=(0, 1)))(hidden, head_w)
    np.testing.assert_allclose(fh, gh, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(fw, gw, rtol=1e-5, atol=1e-7)


def test_vocab_parallel_never_materializes_full_logits():
    """The lowered HLO must contain no [B*T-or-bigger, V] fp32 tensor —
    the whole point of loss parallel (VERDICT.md round-1 item 2)."""
    mesh = _tp_mesh()
    hidden, head_w, labels, slen, ns = _inputs(seed=4)

    def fused(h, w):
        return fused_linear_cross_entropy(
            h, w, labels, slen, ns,
            mesh=mesh, chunk_size=16, compute_dtype=jnp.float32,
        )[0]

    with mesh:
        txt = jax.jit(jax.grad(fused, argnums=(0, 1))).lower(
            hidden, head_w
        ).compile().as_text()
    for shape in (f"f32[{B},{T},{V}]", f"f32[{B * T},{V}]", f"bf16[{B},{T},{V}]"):
        assert shape not in txt, f"full logits {shape} materialized"


def _inputs_pallas(seed=0, B=2, T=512, D=128, vocab=512):
    """Shapes inside ops/fused_ce.kernel_applicable (N>=256 local rows,
    lane-aligned E, block-divisible V) so impl="pallas" engages."""
    rng = np.random.default_rng(seed)
    hidden = jnp.asarray(rng.normal(size=(B, T, D)) * 0.5, jnp.float32)
    head_w = jnp.asarray(rng.normal(size=(vocab, D)) * 0.1, jnp.float32)
    labels = rng.integers(0, vocab, size=(B, T)).astype(np.int32)
    labels[:, -T // 8:] = -100
    slen = np.full((B, T), T // 2, np.int32)
    ns = jnp.asarray(2.0 * B, jnp.float32)
    return hidden, head_w, jnp.asarray(labels), jnp.asarray(slen), ns


def test_pallas_impl_matches_golden_with_grads():
    hidden, head_w, labels, slen, ns = _inputs_pallas(seed=6)

    def gold(h, w):
        return _golden(h, w, labels, slen, ns)[0]

    def fused(h, w):
        return fused_linear_cross_entropy(
            h, w, labels, slen, ns, compute_dtype=jnp.float32, impl="pallas"
        )[0]

    g = _golden(hidden, head_w, labels, slen, ns)
    f = fused_linear_cross_entropy(
        hidden, head_w, labels, slen, ns,
        compute_dtype=jnp.float32, impl="pallas",
    )
    for fv, gv in zip(f, g):
        np.testing.assert_allclose(fv, gv, rtol=1e-5)
    gh, gw = jax.grad(gold, argnums=(0, 1))(hidden, head_w)
    fh, fw = jax.grad(fused, argnums=(0, 1))(hidden, head_w)
    np.testing.assert_allclose(fh, gh, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(fw, gw, rtol=1e-5, atol=1e-6)


def test_pallas_impl_vocab_parallel_matches_golden_with_grads():
    mesh = _tp_mesh()
    hidden, head_w, labels, slen, ns = _inputs_pallas(seed=7)

    def gold(h, w):
        return _golden(h, w, labels, slen, ns)[0]

    def fused(h, w):
        return fused_linear_cross_entropy(
            h, w, labels, slen, ns,
            mesh=mesh, compute_dtype=jnp.float32, impl="pallas",
        )[0]

    g = _golden(hidden, head_w, labels, slen, ns)
    with mesh:
        f = jax.jit(
            lambda h, w: fused_linear_cross_entropy(
                h, w, labels, slen, ns,
                mesh=mesh, compute_dtype=jnp.float32, impl="pallas",
            )
        )(hidden, head_w)
    for fv, gv in zip(f, g):
        np.testing.assert_allclose(fv, gv, rtol=1e-5)
    gh, gw = jax.grad(gold, argnums=(0, 1))(hidden, head_w)
    with mesh:
        fh, fw = jax.jit(jax.grad(fused, argnums=(0, 1)))(hidden, head_w)
    np.testing.assert_allclose(fh, gh, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(fw, gw, rtol=1e-5, atol=1e-6)


def test_pallas_impl_rejects_unsupported_shapes():
    hidden, head_w, labels, slen, ns = _inputs(seed=8)  # D=32: not aligned
    with pytest.raises(ValueError, match="outside the kernel's support"):
        fused_linear_cross_entropy(
            hidden, head_w, labels, slen, ns,
            compute_dtype=jnp.float32, impl="pallas",
        )


def test_vocab_not_divisible_falls_back():
    mesh = _tp_mesh()
    hidden, head_w, labels, slen, ns = _inputs(seed=5, vocab=V + 1)
    g = _golden(hidden, head_w, labels, slen, ns)
    with mesh:
        f = fused_linear_cross_entropy(
            hidden, head_w, labels, slen, ns,
            mesh=mesh, chunk_size=16, compute_dtype=jnp.float32,
        )
    for fv, gv in zip(f, g):
        np.testing.assert_allclose(fv, gv, rtol=1e-5)


def test_pallas_impl_dp_only_sharded_matches_golden():
    """mesh without tp: the CE now runs inside shard_map over dp/cp rows
    (per-device bodies keep the Pallas kernel usable on multi-chip data
    parallelism; GSPMD cannot split a pallas_call). Values + grads."""
    dims = ParallelDims(
        dp_replicate=1, dp_shard=4, cp=2, tp=1, pp=1, world_size=8,
    )
    mesh = dims.build_mesh()
    # local rows per device = (2*512)/(4*2) = 128... need >=256 for the
    # kernel; use B=4 so locals hit 256 rows
    hidden, head_w, labels, slen, ns = _inputs_pallas(seed=9, B=4, T=1024)

    def gold(h, w):
        return _golden(h, w, labels, slen, ns)[0]

    g = _golden(hidden, head_w, labels, slen, ns)
    with mesh:
        f = jax.jit(
            lambda h, w: fused_linear_cross_entropy(
                h, w, labels, slen, ns,
                mesh=mesh, compute_dtype=jnp.float32, impl="pallas",
            )
        )(hidden, head_w)
    for fv, gv in zip(f, g):
        np.testing.assert_allclose(fv, gv, rtol=1e-5)

    def fused(h, w):
        return fused_linear_cross_entropy(
            h, w, labels, slen, ns,
            mesh=mesh, compute_dtype=jnp.float32, impl="pallas",
        )[0]

    gh, gw = jax.grad(gold, argnums=(0, 1))(hidden, head_w)
    with mesh:
        fh, fw = jax.jit(jax.grad(fused, argnums=(0, 1)))(hidden, head_w)
    np.testing.assert_allclose(fh, gh, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(fw, gw, rtol=1e-5, atol=1e-6)


def test_pallas_impl_rejects_gspmd_body():
    """Explicit impl='pallas' in the nothing-divides GSPMD branch must raise
    (a pallas_call is an opaque custom call GSPMD cannot split) instead of
    silently running replicated — advisor finding r3."""
    # world_size 8 with B=2, T=64 and a vocab of V+1 (odd): nothing divides
    dims = ParallelDims(
        dp_replicate=1, dp_shard=4, cp=2, tp=1, pp=1, world_size=8,
    )
    mesh = dims.build_mesh()
    hidden, head_w, labels, slen, ns = _inputs(seed=11, vocab=V + 1)
    hidden = hidden[:, :63]  # T=63: no axis divides 63 or B=2 x cp layout
    labels, slen = labels[:, :63], slen[:, :63]
    with mesh, pytest.raises(ValueError, match="GSPMD"):
        fused_linear_cross_entropy(
            hidden, head_w, labels, slen, ns,
            mesh=mesh, compute_dtype=jnp.float32, impl="pallas",
        )


def test_pallas_rows_zero_sentence_lens_on_ignored_positions():
    """sentence_lens == 0 on an ignored (-100) position must not NaN the
    fused path: the loader's pad rows may carry slen 0 — advisor finding
    r3 (_rows_sums divided before masking)."""
    hidden, head_w, labels, slen, ns = _inputs_pallas(seed=12)
    slen = np.asarray(slen).copy()
    slen[np.asarray(labels) == -100] = 0
    slen = jnp.asarray(slen)
    g = _golden(hidden, head_w, labels, jnp.maximum(slen, 1), ns)
    f = fused_linear_cross_entropy(
        hidden, head_w, labels, slen, ns,
        compute_dtype=jnp.float32, impl="pallas",
    )
    for fv, gv in zip(f, g):
        assert np.isfinite(np.asarray(fv)).all()
        np.testing.assert_allclose(fv, gv, rtol=1e-5)


def test_scan_zero_sentence_lens_on_ignored_positions():
    hidden, head_w, labels, slen, ns = _inputs(seed=13)
    slen = np.asarray(slen).copy()
    slen[np.asarray(labels) == -100] = 0
    slen = jnp.asarray(slen)
    g = _golden(hidden, head_w, labels, jnp.maximum(slen, 1), ns)
    f = fused_linear_cross_entropy(
        hidden, head_w, labels, slen, ns,
        compute_dtype=jnp.float32, impl="scan",
    )
    for fv, gv in zip(f, g):
        assert np.isfinite(np.asarray(fv)).all()
        np.testing.assert_allclose(fv, gv, rtol=1e-5)
