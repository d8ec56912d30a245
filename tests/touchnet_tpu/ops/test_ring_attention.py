# Ring attention (context-parallel alltoall rotation): outputs and grads on
# the virtual CPU mesh must match single-device dense attention.

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from touchnet_tpu.ops.attention import packed_attention_reference
from touchnet_tpu.ops.ring_attention import ring_attention_sharded
from touchnet_tpu.parallel.dims import ParallelDims


def make_inputs(B=4, T=256, H=4, Hkv=2, D=32, packed=True, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (B, T, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, T, Hkv, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, T, Hkv, D), jnp.float32)
    seg = np.ones((B, T), np.int32)
    if packed:
        for b in range(B):
            seg[b, T // 3: 2 * T // 3] = 2
            seg[b, 2 * T // 3:] = 3
            seg[b, T - 9:] = 0  # padding
    return q, k, v, jnp.asarray(seg)


@pytest.mark.parametrize("cp", [2, 4])
@pytest.mark.parametrize("path", ["jnp", "pallas"])
def test_ring_forward_matches_dense(cp, path):
    pd = ParallelDims(world_size=8, dp_shard=8 // cp, cp=cp)
    mesh = pd.build_mesh()
    q, k, v, seg = make_inputs()
    want = packed_attention_reference(q, k, v, seg)
    attn = ring_attention_sharded(
        mesh, block_q=128, block_kv=128,
        use_pallas=(path == "pallas"), interpret=(path == "pallas"),
    )
    with mesh:
        got = jax.jit(attn)(q, k, v, seg)
    m = (seg != 0)[..., None, None]
    np.testing.assert_allclose(
        np.asarray(jnp.where(m, got, 0)), np.asarray(jnp.where(m, want, 0)),
        atol=3e-5, rtol=3e-5,
    )


@pytest.mark.parametrize("path", ["jnp", "pallas"])
def test_ring_backward_matches_dense(path):
    cp = 2
    pd = ParallelDims(world_size=8, dp_shard=8 // cp, cp=cp)
    mesh = pd.build_mesh()
    q, k, v, seg = make_inputs(T=256)
    m = (seg != 0)[..., None, None]

    attn = ring_attention_sharded(
        mesh, block_q=128, block_kv=128,
        use_pallas=(path == "pallas"), interpret=(path == "pallas"),
    )

    def loss_ring(q, k, v):
        o = attn(q, k, v, seg)
        return jnp.sum(jnp.where(m, o, 0.0) ** 2)

    def loss_dense(q, k, v):
        o = packed_attention_reference(q, k, v, seg)
        return jnp.sum(jnp.where(m, o, 0.0) ** 2)

    with mesh:
        g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_dense, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3, err_msg=name
        )
