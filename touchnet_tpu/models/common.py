# Copyright (c) 2026 touchnet_tpu authors.
# Shared transformer building blocks (pure functions over param pytrees).
#
# Models in this framework are pure functions: params are nested dicts whose
# leaf layout mirrors HF checkpoints (so HF<->Orbax converters are mechanical)
# with per-layer weights STACKED on a leading [num_layers, ...] axis and the
# layer loop expressed as lax.scan — the TPU-idiomatic shape: one trace, one
# compile, regardless of depth.
#
# Capability parity notes: RMSNorm/RoPE/SwiGLU replace the reference's
# HF-transformers modules + liger kernels (touchnet/models/llama/__init__.py:
# 11-16); under jit XLA fuses these elementwise chains into the surrounding
# matmuls, which is the TPU analog of liger's Triton fusions.

import math
from typing import Optional

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMSNorm in fp32 with cast back (HF Llama semantics)."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    return (x * weight.astype(jnp.float32)).astype(dtype)


def rope_frequencies(
    head_dim: int, rope_theta: float = 10000.0, dtype=jnp.float32,
    rope_scaling=None,
) -> jax.Array:
    """inv_freq [head_dim // 2] (recomputed at init, never checkpointed —
    reference post_init recomputes inv_freq after meta-init, SURVEY.md §2.7).

    ``rope_scaling``: HF rope_scaling dict; 'llama3' frequency scaling is
    supported (the Llama-3.x config family the reference trains,
    transformers modeling_rope_utils._compute_llama3_parameters semantics):
    low-frequency components are slowed by `factor`, high-frequency kept,
    the band between smoothly interpolated."""
    inv_freq = 1.0 / (
        rope_theta
        ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    rtype = (rope_scaling or {}).get(
        "rope_type", (rope_scaling or {}).get("type")
    )
    if rtype == "llama3":
        import math

        factor = rope_scaling["factor"]
        low = rope_scaling["low_freq_factor"]
        high = rope_scaling["high_freq_factor"]
        orig = rope_scaling["original_max_position_embeddings"]
        low_wavelen = orig / low
        high_wavelen = orig / high
        wavelen = 2 * math.pi / inv_freq
        scaled = jnp.where(wavelen > low_wavelen, inv_freq / factor, inv_freq)
        smooth = (orig / wavelen - low) / (high - low)
        smoothed = (1 - smooth) * inv_freq / factor + smooth * inv_freq
        medium = (wavelen <= low_wavelen) & (wavelen >= high_wavelen)
        inv_freq = jnp.where(medium, smoothed, scaled)
    elif rtype not in (None, "default"):
        raise NotImplementedError(f"rope_scaling type {rtype!r}")
    return inv_freq.astype(dtype)


def apply_rope(
    q: jax.Array,
    k: jax.Array,
    position_ids: jax.Array,
    inv_freq: jax.Array,
) -> tuple:
    """Rotary embedding, HF Llama "rotate_half" convention.

    q [B, T, H, D], k [B, T, Hkv, D], position_ids [B, T]."""
    angles = position_ids[..., None].astype(jnp.float32) * inv_freq  # [B,T,D/2]
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    cos = jnp.concatenate([cos, cos], axis=-1)[:, :, None, :]  # [B,T,1,D]
    sin = jnp.concatenate([sin, sin], axis=-1)[:, :, None, :]

    def rot(x):
        half = x.shape[-1] // 2
        x1, x2 = x[..., :half], x[..., half:]
        rotated = jnp.concatenate([-x2, x1], axis=-1)
        return (x.astype(jnp.float32) * cos + rotated.astype(jnp.float32) * sin).astype(
            x.dtype
        )

    return rot(q), rot(k)


def apply_rope_grouped(
    qg: jax.Array,
    kh: jax.Array,
    position_ids: jax.Array,
    inv_freq: jax.Array,
) -> tuple:
    """apply_rope for the kernel-native grouped attention layout.

    qg [B, Hkv, G, T, D], kh [B, Hkv, T, D], position_ids [B, T]. Identical
    math to apply_rope (rotate_half, f32 trig) with the T axis moved."""
    angles = position_ids[..., None].astype(jnp.float32) * inv_freq  # [B,T,D/2]
    cos = jnp.concatenate([cos_ := jnp.cos(angles), cos_], axis=-1)  # [B,T,D]
    sin = jnp.concatenate([sin_ := jnp.sin(angles), sin_], axis=-1)

    def rot(x, c, s):
        half = x.shape[-1] // 2
        x1, x2 = x[..., :half], x[..., half:]
        rotated = jnp.concatenate([-x2, x1], axis=-1)
        return (x.astype(jnp.float32) * c + rotated.astype(jnp.float32) * s).astype(
            x.dtype
        )

    q_out = rot(qg, cos[:, None, None, :, :], sin[:, None, None, :, :])
    k_out = rot(kh, cos[:, None, :, :], sin[:, None, :, :])
    return q_out, k_out


def linear(x: jax.Array, weight: jax.Array, bias: Optional[jax.Array] = None):
    """y = x @ W^T (+ b). Weight stored HF-style [out, in]."""
    y = jax.lax.dot_general(
        x, weight, (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=x.dtype,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def swiglu(x, gate_w, up_w, down_w):
    """SwiGLU MLP: down(silu(gate(x)) * up(x))."""
    g = linear(x, gate_w)
    u = linear(x, up_w)
    return linear(jax.nn.silu(g) * u, down_w)


# ---------------------------------------------------------------------------
# Initializers (numpy-free, jax PRNG)
# ---------------------------------------------------------------------------


def normal_init(key, shape, std=0.02, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype=jnp.float32).astype(dtype) * std


def kaiming_uniform_init(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default (kaiming_uniform a=sqrt(5)) — keeps fresh
    projector init comparable to the reference's nn.Linear."""
    fan_in = shape[-1]
    bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound).astype(dtype)
