# Copyright (c) 2026 touchnet_tpu authors.
# Whisper audio encoder (functional JAX), shared by Qwen2-Audio and
# Kimi-Audio.
#
# Capability parity: HF WhisperEncoder as used by the reference's audio
# towers (touchnet/models/qwen2_audio/__init__.py:18-133 patches it for
# variable-length inputs; touchnet/models/kimi_audio/modeling_kimi_audio.py
# hosts a CustomWhisperEncoder). Architecture: two mel convs (stride 1 then
# 2) + sinusoidal positions + pre-LN transformer stack (LayerNorm with bias,
# MHA with q/v/out biases, GELU MLP) + final LayerNorm.
# TPU-first: layers stacked + lax.scan; attention via the packed flash
# kernel; the >30s position-embedding slice/repeat of the reference is
# implemented by tiling the table to the padded length (static shapes).

import math
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from touchnet_tpu.models.common import linear, normal_init
from touchnet_tpu.ops.attention import flash_attention


@dataclass
class WhisperEncoderConfig:
    num_mel_bins: int = 128
    d_model: int = 1280
    encoder_layers: int = 32
    encoder_attention_heads: int = 20
    encoder_ffn_dim: int = 5120
    max_source_positions: int = 1500
    activation_function: str = "gelu"
    layer_norm_eps: float = 1e-5

    @classmethod
    def from_dict(cls, d: dict) -> "WhisperEncoderConfig":
        names = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in d.items() if k in names})


def sinusoidal_positions(length: int, channels: int) -> jnp.ndarray:
    """Whisper's sinusoid table (log-spaced timescales, sin|cos concat)."""
    assert channels % 2 == 0
    log_timescale = math.log(10000) / (channels // 2 - 1)
    inv_timescales = jnp.exp(-log_timescale * jnp.arange(channels // 2))
    scaled = jnp.arange(length)[:, None] * inv_timescales[None, :]
    return jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=1)


def layer_norm(x, weight, bias, eps=1e-5):
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    return (x * weight.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)


def init_params(config: WhisperEncoderConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    D = config.d_model
    L = config.encoder_layers
    F = config.encoder_ffn_dim
    mel = config.num_mel_bins
    std = 0.02
    keys = iter(jax.random.split(key, 12))

    def w(k, shape):
        return normal_init(k, shape, std=std, dtype=dtype)

    def lin(k, out, inp, bias=True):
        p = {"weight": w(k, (L, out, inp))}
        if bias:
            p["bias"] = jnp.zeros((L, out), dtype)
        return p

    return {
        "conv1": {"weight": w(next(keys), (D, mel, 3)), "bias": jnp.zeros((D,), dtype)},
        "conv2": {"weight": w(next(keys), (D, D, 3)), "bias": jnp.zeros((D,), dtype)},
        "embed_positions": {
            "weight": sinusoidal_positions(config.max_source_positions, D).astype(dtype)
        },
        "layers": {
            "self_attn_layer_norm": {
                "weight": jnp.ones((L, D), dtype), "bias": jnp.zeros((L, D), dtype)
            },
            "self_attn": {
                "q_proj": lin(next(keys), D, D, True),
                "k_proj": lin(next(keys), D, D, False),
                "v_proj": lin(next(keys), D, D, True),
                "out_proj": lin(next(keys), D, D, True),
            },
            "final_layer_norm": {
                "weight": jnp.ones((L, D), dtype), "bias": jnp.zeros((L, D), dtype)
            },
            "fc1": lin(next(keys), F, D, True),
            "fc2": lin(next(keys), D, F, True),
        },
        "layer_norm": {"weight": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
    }


def _conv1d(x, weight, bias, stride=1, padding=1):
    """x [B, C_in, T] * weight [C_out, C_in, K] -> [B, C_out, T']."""
    out = jax.lax.conv_general_dilated(
        x, weight.astype(x.dtype),
        window_strides=(stride,), padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out + bias.astype(out.dtype)[None, :, None]


def forward(
    params: dict,
    input_features: jax.Array,  # [B, mel, T]
    config: WhisperEncoderConfig,
    *,
    compute_dtype=jnp.bfloat16,
    causal: bool = True,
    attn_fn: Optional[Callable] = None,
    remat_mode: str = "none",
    use_pallas: Optional[bool] = None,
    apply_final_layer_norm: bool = False,
) -> jax.Array:
    """Returns [B, T//2, d_model]. The final LayerNorm is optional because
    Qwen2-Audio pools BEFORE it (reference qwen2_audio/__init__.py:120-125);
    plain Whisper applies it directly. `causal=True` matches the reference's
    streamable training patch (qwen2_audio/__init__.py:191-194)."""
    x = input_features.astype(compute_dtype)
    x = jax.nn.gelu(_conv1d(x, params["conv1"]["weight"], params["conv1"]["bias"]),
                    approximate=False)
    x = jax.nn.gelu(
        _conv1d(x, params["conv2"]["weight"], params["conv2"]["bias"], stride=2),
        approximate=False,
    )
    h = x.transpose(0, 2, 1)  # [B, T', D]
    B, T, D = h.shape
    pos_table = params["embed_positions"]["weight"]
    reps = -(-T // pos_table.shape[0])
    # >30s: tile the table (reference slice/repeat), then slice to T — static
    pos = jnp.tile(pos_table, (reps, 1))[:T]
    h = h + pos.astype(compute_dtype)[None]

    heads = config.encoder_attention_heads
    head_dim = D // heads
    scale = 1.0 / math.sqrt(head_dim)

    if attn_fn is None:
        # whisper shapes (T = 1500 post-conv, MHA, head_dim 64) want the
        # OPPOSITE kernel defaults from the packed-LLM path: 512 blocks
        # (1024 pads T to 2048 — 36% dead area) and the static grid (few
        # blocks -> no dead-tail problem, and no head-dim pad-to-128 on
        # manual DMAs). Measured on v5e fwd+bwd, B=4: 26.2% MFU default ->
        # 32.5% with (512, static).
        def attn_fn(q, k, v, seg):
            return flash_attention(
                q, k, v, seg, causal=causal, scale=scale, use_pallas=use_pallas,
                block_q=512, block_kv=512, dynamic=False,
            )

    def layer(h, lp):
        # checkpoint_name tags reuse the llama decoder's canonical dot names
        # (dot_q/k/v/o for attention, dot_gate/dot_down for the two MLP
        # matmuls) so _apply_remat's op_small / op_names save-set policies
        # apply to the tower unchanged
        from jax.ad_checkpoint import checkpoint_name

        ln = lp["self_attn_layer_norm"]
        normed = layer_norm(h, ln["weight"], ln["bias"], config.layer_norm_eps)
        sa = lp["self_attn"]
        q = checkpoint_name(
            linear(normed, sa["q_proj"]["weight"], sa["q_proj"]["bias"]),
            "dot_q",
        )
        k = checkpoint_name(linear(normed, sa["k_proj"]["weight"]), "dot_k")
        v = checkpoint_name(
            linear(normed, sa["v_proj"]["weight"], sa["v_proj"]["bias"]),
            "dot_v",
        )
        q = q.reshape(B, T, heads, head_dim)
        k = k.reshape(B, T, heads, head_dim)
        v = v.reshape(B, T, heads, head_dim)
        attn = attn_fn(q, k, v, None).reshape(B, T, D)
        h = h + checkpoint_name(
            linear(attn, sa["out_proj"]["weight"], sa["out_proj"]["bias"]),
            "dot_o",
        )
        ln = lp["final_layer_norm"]
        normed = layer_norm(h, ln["weight"], ln["bias"], config.layer_norm_eps)
        mid = jax.nn.gelu(
            checkpoint_name(
                linear(normed, lp["fc1"]["weight"], lp["fc1"]["bias"]),
                "dot_gate",
            ),
            approximate=False,
        )
        return h + checkpoint_name(
            linear(mid, lp["fc2"]["weight"], lp["fc2"]["bias"]), "dot_down"
        )

    def body(carry, lp):
        lp = jax.tree.map(lambda a: a.astype(compute_dtype), lp)
        return layer(carry, lp), None

    from touchnet_tpu.models.llama.modeling_llama import _apply_remat

    body = _apply_remat(body, remat_mode)
    h, _ = jax.lax.scan(body, h, params["layers"])
    if apply_final_layer_norm:
        h = layer_norm(
            h, params["layer_norm"]["weight"], params["layer_norm"]["bias"],
            config.layer_norm_eps,
        )
    return h


def get_num_params(config: WhisperEncoderConfig) -> int:
    D, L, F, mel = (
        config.d_model, config.encoder_layers, config.encoder_ffn_dim,
        config.num_mel_bins,
    )
    conv = D * mel * 3 + D + D * D * 3 + D
    per_layer = (
        4 * D * D + 3 * D  # attention (k has no bias)
        + 2 * D * F + F + D  # mlp
        + 4 * D  # two layer norms
    )
    return conv + L * per_layer + 2 * D  # + final LN (pos table is frozen)
