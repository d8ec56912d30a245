# Copyright (c) 2026 touchnet_tpu authors.
# Kimi-Audio (MoonshotKimiaForCausalLM): dual-stream Qwen2 backbone with mimo
# audio layers forked mid-stack, a continuous whisper speech encoder, a
# frozen WhisperVQ speech tokenizer, and a VQAdaptor MLP.
#
# Capability parity: reference touchnet/models/kimi_audio/
# modeling_kimi_audio.py (1214 lines, HF Kimi-Audio-7B lineage):
#   - MoonshotKimiaModel: Qwen2 layers; hidden state captured after layer
#     kimia_mimo_transformer_from_layer_index feeds kimia_mimo_layers extra
#     layers (the audio "mimo" stream) with its own norm;
#   - fusion: whisper-encoder embeddings (4-frame stacked -> VQAdaptor) +
#     embed(WhisperVQ codes + kimia_token_offset), scaled by sqrt(2),
#     scattered strictly between <|im_media_begin|> / <|im_media_end|>;
#   - dual heads lm_head / mimo_output; ASR training consumes text logits
#     (reference forward returns text_logits only).
# TPU-first: the backbone scan is split at the fork index (two scans), the
# mimo stream is a third scan; the marker scatter is a static cumsum gather;
# the frozen tokenizer path is wrapped in stop_gradient and its params are
# excluded from optimizer updates via TrainSpec.frozen_params_re.

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from touchnet_tpu.models import whisper_encoder
from touchnet_tpu.models.common import linear, normal_init, rms_norm
from touchnet_tpu.models.kimi_audio.configuration_kimi_audio import (
    KimiAudioConfig,
    WhisperVQConfig,
)
from touchnet_tpu.models.llama import modeling_llama
from touchnet_tpu.ops.attention import DEFAULT_MASK_VALUE


# ---------------------------------------------------------------------------
# WhisperVQ speech tokenizer (frozen)
# ---------------------------------------------------------------------------


def init_vq_params(config: WhisperVQConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    D = config.d_model
    L = config.quantize_position
    F = config.encoder_ffn_dim
    mel = config.num_mel_bins
    keys = iter(jax.random.split(key, 12))

    def w(k, shape):
        return normal_init(k, shape, std=0.02, dtype=dtype)

    def lin(k, out, inp, bias=True):
        p = {"weight": w(k, (L, out, inp))}
        if bias:
            p["bias"] = jnp.zeros((L, out), dtype)
        return p

    pooled_pos = -(-config.max_source_positions // config.pooling_kernel_size)
    return {
        "conv1": {"weight": w(next(keys), (D, mel, 3)), "bias": jnp.zeros((D,), dtype)},
        "conv2": {"weight": w(next(keys), (D, D, 3)), "bias": jnp.zeros((D,), dtype)},
        "embed_positions": {"weight": w(next(keys), (config.max_source_positions, D))},
        "embed_positions2": {"weight": w(next(keys), (pooled_pos, D))},
        "codebook": {"weight": w(next(keys), (config.quantize_vocab_size, D))},
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
    }


def _causal_conv1d(x, weight, bias, stride=1):
    """Left-padded conv (GLM-4-Voice CausalConv1d: padding=(k-1, 0))."""
    k = weight.shape[-1]
    out = jax.lax.conv_general_dilated(
        x, weight.astype(x.dtype), window_strides=(stride,),
        padding=[(k - 1, 0)], dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out + bias.astype(out.dtype)[None, :, None]


def _block_causal_attention(q, k, v, frame_mask, block_size, scale):
    """Dense attention with (causal OR same-block) AND key-padding mask.
    q/k/v [B, T, H, Dh], frame_mask [B, T] (1 = valid)."""
    s = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    T = q.shape[1]
    rows = jnp.arange(T)[:, None]
    cols = jnp.arange(T)[None, :]
    allowed = (rows >= cols) | ((rows // block_size) == (cols // block_size))
    mask = allowed[None, None] & (frame_mask[:, None, None, :] > 0)
    s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bshd->bthd", p.astype(v.dtype), v)


def vector_quantize(h: jax.Array, codebook: jax.Array) -> jax.Array:
    """Nearest-codeword indices. h [B, T, D], codebook [V, D] -> [B, T]."""
    h32 = h.astype(jnp.float32)
    cb = codebook.astype(jnp.float32)
    # argmin ||h - c||^2 = argmax (2 h.c - ||c||^2)
    scores = 2.0 * jnp.einsum("btd,vd->btv", h32, cb) - jnp.sum(cb * cb, axis=-1)
    return jnp.argmax(scores, axis=-1)


def speech_tokenizer_forward(
    params: dict,
    input_features: jax.Array,  # [B, mel, T]
    attention_mask: jax.Array,  # [B, T] frame validity
    config: WhisperVQConfig,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Frozen tokenizer: causal convs -> 16 whisper layers with block-causal
    mask -> avg-pool 4x -> nearest codeword. Returns codes [B, T//8]."""
    x = input_features.astype(compute_dtype)
    x = jax.nn.gelu(
        _causal_conv1d(x, params["conv1"]["weight"], params["conv1"]["bias"]),
        approximate=False,
    )
    x = jax.nn.gelu(
        _causal_conv1d(x, params["conv2"]["weight"], params["conv2"]["bias"], stride=2),
        approximate=False,
    )
    h = x.transpose(0, 2, 1)  # [B, T', D]
    B, T, D = h.shape
    sub_mask = attention_mask[:, ::2][:, :T]
    h = h + params["embed_positions"]["weight"][:T].astype(compute_dtype)[None]

    heads = config.encoder_attention_heads
    head_dim = D // heads
    scale = 1.0 / math.sqrt(head_dim)
    eps = config.layer_norm_eps

    def layer(h, lp):
        ln = lp["self_attn_layer_norm"]
        normed = whisper_encoder.layer_norm(h, ln["weight"], ln["bias"], eps)
        sa = lp["self_attn"]
        q = linear(normed, sa["q_proj"]["weight"], sa["q_proj"]["bias"])
        k = linear(normed, sa["k_proj"]["weight"])
        v = linear(normed, sa["v_proj"]["weight"], sa["v_proj"]["bias"])
        q = q.reshape(B, T, heads, head_dim)
        k = k.reshape(B, T, heads, head_dim)
        v = v.reshape(B, T, heads, head_dim)
        attn = _block_causal_attention(
            q, k, v, sub_mask, config.quantize_causal_block_size, scale
        ).reshape(B, T, D)
        h = h + linear(attn, sa["out_proj"]["weight"], sa["out_proj"]["bias"])
        ln = lp["final_layer_norm"]
        normed = whisper_encoder.layer_norm(h, ln["weight"], ln["bias"], eps)
        mid = jax.nn.gelu(
            linear(normed, lp["fc1"]["weight"], lp["fc1"]["bias"]), approximate=False
        )
        return h + linear(mid, lp["fc2"]["weight"], lp["fc2"]["bias"])

    def body(carry, lp):
        lp = jax.tree.map(lambda a: a.astype(compute_dtype), lp)
        return layer(carry, lp), None

    h, _ = jax.lax.scan(body, h, params["layers"])

    # pooling at pooling_position == quantize_position == last layer
    ksz = config.pooling_kernel_size
    pad = (-T) % ksz
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
    pooled = h.reshape(B, (T + pad) // ksz, ksz, D)
    if config.pooling_type == "avg":
        pooled = pooled.mean(axis=2)
    else:
        pooled = pooled.max(axis=2)
    codes = vector_quantize(pooled, params["codebook"]["weight"])
    return jax.lax.stop_gradient(codes)


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------


def init_params(config: KimiAudioConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 8)
    tc = config.text_config
    hidden = tc.hidden_size
    lm = modeling_llama.init_params(tc, keys[0], dtype)
    # mimo layers reuse the Qwen2 block structure
    mimo_cfg_dict = tc.to_dict()
    mimo_cfg_dict["num_hidden_layers"] = config.kimia_mimo_layers
    mimo_cfg = type(tc).from_dict(mimo_cfg_dict)
    mimo = modeling_llama.init_params(mimo_cfg, keys[1], dtype)

    params = {
        "model": {
            "embed_tokens": lm["model"]["embed_tokens"],
            "layers": lm["model"]["layers"],
            "norm": lm["model"]["norm"],
            "mimo_layers": mimo["model"]["layers"],
            "mimo_norm": {"weight": jnp.ones((hidden,), dtype)},
            "vq_adaptor": {
                "layers": {
                    "0": {
                        "weight": normal_init(
                            keys[2], (hidden, config.kimia_adaptor_input_dim),
                            dtype=dtype,
                        ),
                        "bias": jnp.zeros((hidden,), dtype),
                    },
                    "3": {
                        "weight": normal_init(keys[3], (hidden, hidden), dtype=dtype),
                        "bias": jnp.zeros((hidden,), dtype),
                    },
                    "4": {
                        "weight": jnp.ones((hidden,), dtype),
                        "bias": jnp.zeros((hidden,), dtype),
                    },
                }
            },
        },
        "speech_encoder": whisper_encoder.init_params(
            config.speech_encoder_config, keys[4], dtype
        ),
        "speech_tokenizer": init_vq_params(
            config.speech_tokenizer_config, keys[5], dtype
        ),
        "lm_head": {
            "weight": normal_init(keys[6], (tc.vocab_size, hidden), dtype=dtype)
        },
        "mimo_output": {
            "weight": normal_init(keys[7], (tc.vocab_size, hidden), dtype=dtype)
        },
    }
    return params


def vq_adaptor_forward(params: dict, x: jax.Array, eps: float) -> jax.Array:
    """Linear -> SiLU -> Linear -> LayerNorm (reference VQAdaptor)."""
    la = params["layers"]
    x = jax.nn.silu(linear(x, la["0"]["weight"], la["0"]["bias"]))
    x = linear(x, la["3"]["weight"], la["3"]["bias"])
    return whisper_encoder.layer_norm(x, la["4"]["weight"], la["4"]["bias"], eps)


def _mask_between_markers(ids: jax.Array, begin: int, end: int) -> jax.Array:
    """True strictly between the (single) begin and end markers per row."""
    T = ids.shape[1]
    pos = jnp.arange(T)[None, :]
    begin_pos = jnp.argmax((ids == begin).astype(jnp.int32), axis=1)[:, None]
    end_pos = jnp.argmax((ids == end).astype(jnp.int32), axis=1)[:, None]
    lo = jnp.minimum(begin_pos, end_pos)
    hi = jnp.maximum(begin_pos, end_pos)
    has = ((ids == begin).any(axis=1) & (ids == end).any(axis=1))[:, None]
    return (pos > lo) & (pos < hi) & has


def prepare_audio_input_embs(
    params: dict,
    audio_input_ids: jax.Array,
    audio_input_embs: jax.Array,
    whisper_input_features: jax.Array,
    whisper_attention_mask: jax.Array,
    config: KimiAudioConfig,
    compute_dtype=jnp.bfloat16,
    remat_mode: str = "none",
) -> jax.Array:
    """Continuous (whisper -> 4-stack -> adaptor) + discrete (frozen VQ codes
    -> embed) speech embeddings, scaled by sqrt(2), scattered between the
    media markers."""
    enc = whisper_encoder.forward(
        params["speech_encoder"], whisper_input_features,
        config.speech_encoder_config, compute_dtype=compute_dtype,
        causal=False, remat_mode=remat_mode, apply_final_layer_norm=True,
    )  # [B, Tw, D]
    B, Tw, D = enc.shape
    enc = enc[:, : (Tw // 4) * 4].reshape(B, Tw // 4, 4 * D)
    cont = vq_adaptor_forward(
        params["model"]["vq_adaptor"], enc, config.text_config.rms_norm_eps
    )  # [B, Tw/4, hidden]

    codes = speech_tokenizer_forward(
        params["speech_tokenizer"], whisper_input_features,
        whisper_attention_mask, config.speech_tokenizer_config, compute_dtype,
    )  # [B, Tw/4]
    codes = codes + config.kimia_token_offset
    disc = jnp.take(
        params["model"]["embed_tokens"]["weight"], codes, axis=0
    ).astype(compute_dtype)

    speech = (cont + disc) * math.sqrt(2.0)  # [B, Ta, hidden]

    mask = _mask_between_markers(
        audio_input_ids, config.kimia_media_begin, config.kimia_media_end
    )
    idx = jnp.clip(jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1, 0,
                   speech.shape[1] - 1)
    gathered = jnp.take_along_axis(speech, idx[..., None], axis=1)
    return jnp.where(mask[..., None], gathered.astype(audio_input_embs.dtype),
                     audio_input_embs)


def forward(
    params: dict,
    *,
    text_input_ids: Optional[jax.Array] = None,
    audio_input_ids: Optional[jax.Array] = None,
    whisper_input_features: Optional[jax.Array] = None,
    whisper_attention_mask: Optional[jax.Array] = None,
    segment_ids: Optional[jax.Array] = None,
    position_ids: Optional[jax.Array] = None,
    config: KimiAudioConfig,
    compute_dtype=jnp.bfloat16,
    attn_fn: Optional[Callable] = None,
    remat_mode: str = "none",
    selective_ac_option: str = "op",
    block_q: int = 512,
    block_kv: int = 512,
    shard_fn: Optional[Callable] = None,
    return_audio_logits: bool = False,
):
    """ASR-style forward: returns text logits (reference returns text_logits;
    audio logits available via return_audio_logits for TTS-style training)."""
    tc = config.text_config
    mp = params["model"]
    shard = shard_fn if shard_fn is not None else (lambda x, kind: x)

    embed = mp["embed_tokens"]["weight"]
    audio_embs = jnp.take(embed, audio_input_ids, axis=0).astype(compute_dtype)
    if config.use_whisper_feature and whisper_input_features is not None:
        audio_embs = prepare_audio_input_embs(
            params, audio_input_ids, audio_embs, whisper_input_features,
            whisper_attention_mask, config, compute_dtype, remat_mode,
        )
    if text_input_ids is not None:
        audio_embs = audio_embs + jnp.take(
            embed, text_input_ids, axis=0
        ).astype(compute_dtype)
    h = shard(audio_embs, "btd")
    B, T, _ = h.shape
    if position_ids is None:
        position_ids = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))

    from touchnet_tpu.models.common import rope_frequencies
    from touchnet_tpu.models.llama.modeling_llama import _default_attn, decoder_layer
    import functools

    inv_freq = rope_frequencies(tc.head_dim, tc.rope_theta,
                                rope_scaling=getattr(tc, 'rope_scaling', None))
    attn = attn_fn if attn_fn is not None else _default_attn(tc, block_q, block_kv)
    layer = functools.partial(
        decoder_layer,
        cos_sin_posids=position_ids,
        segment_ids=segment_ids,
        config=tc,
        attn_fn=attn,
        inv_freq=inv_freq,
        shard_fn=shard,
    )

    def body(carry, lp):
        lp = jax.tree.map(lambda x: x.astype(compute_dtype), lp)
        return layer(carry, lp), None

    from touchnet_tpu.models.llama.modeling_llama import scan_layers

    fork = config.kimia_mimo_transformer_from_layer_index + 1
    first = jax.tree.map(lambda x: x[:fork], mp["layers"])
    rest = jax.tree.map(lambda x: x[fork:], mp["layers"])
    h_mid = scan_layers(body, h, first, remat_mode, selective_ac_option)
    mimo_hidden = h_mid  # forked stream (reference captures after layer idx)
    h_final = scan_layers(body, h_mid, rest, remat_mode, selective_ac_option)
    h_final = rms_norm(h_final, mp["norm"]["weight"].astype(compute_dtype),
                       tc.rms_norm_eps)

    text_logits = shard(
        linear(h_final, params["lm_head"]["weight"].astype(compute_dtype)), "btv"
    )
    if not return_audio_logits:
        return text_logits

    mimo_h = scan_layers(
        body, mimo_hidden, mp["mimo_layers"], remat_mode, selective_ac_option
    )
    mimo_h = rms_norm(mimo_h, mp["mimo_norm"]["weight"].astype(compute_dtype),
                      tc.rms_norm_eps)
    audio_logits = shard(
        linear(mimo_h, params["mimo_output"]["weight"].astype(compute_dtype)), "btv"
    )
    return text_logits, audio_logits


def get_num_params(config: KimiAudioConfig, exclude_embedding: bool = False) -> int:
    tc = config.text_config
    hidden = tc.hidden_size
    n = modeling_llama.get_num_params(tc, exclude_embedding)
    # mimo layers + norm
    per_layer = (
        2 * hidden
        + (tc.num_attention_heads * tc.head_dim + 2 * tc.num_key_value_heads * tc.head_dim)
        * hidden + hidden * tc.num_attention_heads * tc.head_dim
        + 3 * tc.intermediate_size * hidden
    )
    if tc.attention_bias:
        per_layer += tc.num_attention_heads * tc.head_dim + 2 * tc.num_key_value_heads * tc.head_dim
    n += config.kimia_mimo_layers * per_layer + hidden
    # vq adaptor
    n += (
        hidden * config.kimia_adaptor_input_dim + hidden
        + hidden * hidden + hidden + 2 * hidden
    )
    # speech encoder
    n += whisper_encoder.get_num_params(config.speech_encoder_config)
    # speech tokenizer (frozen, still counted as model params)
    vq = config.speech_tokenizer_config
    D, L, F = vq.d_model, vq.quantize_position, vq.encoder_ffn_dim
    n += D * vq.num_mel_bins * 3 + D + D * D * 3 + D  # convs
    n += L * (4 * D * D + 3 * D + 2 * D * F + F + D + 4 * D)
    n += vq.quantize_vocab_size * D  # codebook
    # mimo_output head (lm_head counted in llama when untied)
    n += tc.vocab_size * hidden
    return n


def get_num_flop_per_token(num_params: int, config: KimiAudioConfig, seq_len: int):
    """Reference kimi formula includes mimo layers (kimi_audio/__init__.py:
    63-80)."""
    tc = config.text_config
    l = tc.num_hidden_layers + config.kimia_mimo_layers
    return 6 * num_params + 12 * l * (
        tc.num_attention_heads * tc.head_dim
    ) * seq_len
