# Flash decode kernel vs dense reference over a packed ragged KV cache.

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from touchnet_tpu.ops.decode_attention import decode_attention


def dense_reference(q, kv, plen, base, last, scale):
    B, H, D = q.shape
    Hkv, S = kv.shape[1], kv.shape[2]
    G = H // Hkv
    k = kv[..., :D].astype(jnp.float32)
    v = kv[..., D:].astype(jnp.float32)
    qg = q.reshape(B, Hkv, G, D).astype(jnp.float32)
    s = jnp.einsum("bkgd,bksd->bkgs", qg, k) * scale
    cols = jnp.arange(S)[None, :]
    valid = (cols < plen[:, None]) | ((cols >= base) & (cols <= last))
    s = jnp.where(valid[:, None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bkgs,bksd->bkgd", p, v)
    return out.reshape(B, H, D)


def make_inputs(B, H, Hkv, D, S, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 2)
    q = jax.random.normal(ks[0], (B, H, D), jnp.float32)
    kv = jax.random.normal(ks[1], (B, Hkv, S, 2 * D), jnp.float32)
    return q, kv


@pytest.mark.parametrize("D", [64, 128])
@pytest.mark.parametrize("S,base,last", [(640, 512, 570), (1024, 768, 768)])
def test_decode_attention_matches_dense(D, S, base, last):
    B, H, Hkv = 3, 6, 2
    q, kv = make_inputs(B, H, Hkv, D, S)
    plen = jnp.asarray([512, 300, 1], jnp.int32)  # ragged, incl. tiny prompt
    scale = 1.0 / D**0.5
    got = decode_attention(
        q, kv, plen, base, last, scale, block_s=256, interpret=True
    )
    want = dense_reference(q, kv, plen, base, last, scale)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )


@pytest.mark.parametrize("Hkv", [1, 3, 5, 6, 7])
def test_decode_attention_indivisible_kv_heads(Hkv):
    """ADVICE r02 (medium): splits must DIVIDE Hkv or the trailing heads
    attend over stale VMEM. _n_splits picks the largest divisor <= 4."""
    from touchnet_tpu.ops.decode_attention import _n_splits

    assert Hkv % _n_splits(Hkv) == 0
    B, G, D, S = 2, 2, 64, 512
    q, kv = make_inputs(B, Hkv * G, Hkv, D, S, seed=Hkv)
    plen = jnp.asarray([300, 64], jnp.int32)
    got = decode_attention(
        q, kv, plen, 384, 400, 1.0 / 8, block_s=256, interpret=True
    )
    want = dense_reference(q, kv, plen, 384, 400, 1.0 / 8)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )


def test_supported_gates_odd_head_dims():
    """ADVICE r02 (low): unsupported shapes must fall back to the einsum
    cache path, not assert at trace time."""
    from touchnet_tpu.ops.decode_attention import supported

    assert supported(64, 8) and supported(128, 3)
    assert not supported(80, 8) and not supported(96, 4)


def test_decode_attention_skips_blocks_past_last():
    """Trip count covers only blocks up to `last` — cols beyond must not
    affect the result even if they hold garbage."""
    B, H, Hkv, D, S = 2, 4, 2, 64, 1024
    q, kv = make_inputs(B, H, Hkv, D, S, seed=1)
    poisoned = kv.at[:, :, 600:].set(jnp.nan)
    plen = jnp.asarray([128, 64], jnp.int32)
    got = decode_attention(
        q, poisoned, plen, 256, 511, 1.0 / 8, block_s=256, interpret=True
    )
    want = decode_attention(
        q, kv, plen, 256, 511, 1.0 / 8, block_s=256, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))
    assert np.isfinite(np.asarray(got)).all()


def test_generate_uses_packed_cache_consistently():
    """End-to-end generate on CPU (dense path) with the packed cache must
    match HF-free greedy expectations: already covered by the inference
    tests; here pin the cache shape contract."""
    from touchnet_tpu.models.llama.configuration_llama import LlamaConfig
    from touchnet_tpu.models.llama.inference_llama import init_cache

    config = LlamaConfig(
        vocab_size=32, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        attn_implementation="eager",
    )
    from touchnet_tpu.ops.decode_attention import DECODE_BLOCK

    cache = init_cache(config, batch=3, max_len=10, dtype=jnp.float32)
    # capacity rounds up to the decode kernel block so the hot path never
    # pad-copies the cache
    assert cache.kv.shape == (2, 3, 2, DECODE_BLOCK, 2 * config.head_dim)


def test_live_block_map_skips_gap_blocks():
    """Rows with short prompts must not visit the dead [plen, base) gap —
    the read savings over the dense einsum path."""
    from touchnet_tpu.ops.decode_attention import live_block_map

    plen = jnp.asarray([100, 2048, 1], jnp.int32)
    base, last = jnp.asarray(4096), jnp.asarray(4607)
    bmap, nlive = live_block_map(plen, base, last, 512, 10)
    # decode span [4096, 4607] is exactly block 8; prompts of 100/2048/1
    # tokens cover 1/4/1 prompt blocks — gap blocks are absent
    np.testing.assert_array_equal(np.asarray(nlive), [2, 5, 2])
    np.testing.assert_array_equal(np.asarray(bmap[0, :2]), [0, 8])
    np.testing.assert_array_equal(np.asarray(bmap[1, :5]), [0, 1, 2, 3, 8])
    np.testing.assert_array_equal(np.asarray(bmap[2, :2]), [0, 8])


def test_decode_attention_ragged_skips_are_exact():
    """Batch with very ragged prompts: block-table result must equal the
    dense reference bit-for-bit in masked-softmax terms."""
    B, H, Hkv, D, S = 4, 8, 4, 128, 4096
    q, kv = make_inputs(B, H, Hkv, D, S, seed=7)
    plen = jnp.asarray([3000, 5, 1024, 512], jnp.int32)
    base, last = 3584, 3600
    got = decode_attention(
        q, kv, plen, base, last, 1.0 / D**0.5, block_s=512, interpret=True
    )
    want = dense_reference(q, kv, plen, base, last, 1.0 / D**0.5)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
    )


def test_decode_attention_rank5_layer_indexed():
    """The rank-5 cache entry (kernel-side layer indexing) must match the
    rank-4 per-layer-slice entry for every layer — this is the hot decode
    path that keeps the whole [L, B, Hkv, S, 2D] cache in place (r4: the
    extract + reinsert moved ~2.1 GB/layer/step)."""
    import numpy as np

    rng = np.random.default_rng(3)
    L, B, H, Hkv, D, S = 3, 2, 4, 2, 64, 1024
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    kv5 = jnp.asarray(
        rng.standard_normal((L, B, Hkv, S, 2 * D)) * 0.3, jnp.float32
    )
    plen = jnp.asarray([300, 700], jnp.int32)
    base, last = 768, 771
    for li in range(L):
        want = decode_attention(
            q, kv5[li], plen, base, last, interpret=True
        )
        got = decode_attention(
            q, kv5, plen, base, last, interpret=True, layer_idx=li
        )
        np.testing.assert_allclose(got, want, rtol=1e-6)
