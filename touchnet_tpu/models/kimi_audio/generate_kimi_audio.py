# Copyright (c) 2026 touchnet_tpu authors.
# Dual-stream (text + audio) KV-cache generation for Kimi-Audio.
#
# Capability parity: reference touchnet/models/kimi_audio/
# modeling_kimi_audio.py:1153-1215 (_generate_loop) — each step samples the
# TEXT head (main backbone) and the AUDIO head (mimo stream) with separate
# KimiASampler settings, blanks the audio stream for the first
# `kimia_text_audiodelaytokens` steps (and always when output_type="text"),
# and feeds emb(text) + emb(audio) back as the next step input.
#
# TPU-native design: the main (L) and mimo (L_mimo) layer stacks share ONE
# packed [L + L_mimo, B, Hkv, S, 2D] cache; the per-layer cached step is the
# SAME scan body as llama decode (inference_llama.make_cached_layer_fn),
# run twice per step with the carry's layer index continuing across stacks.
# The decode loop is lax.while_loop over static shapes; sampling reuses
# sample_token (KimiASampler parity).

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from touchnet_tpu.models.common import linear, rms_norm
from touchnet_tpu.models.kimi_audio.configuration_kimi_audio import KimiAudioConfig
from touchnet_tpu.models.llama.inference_llama import (
    KVCache,
    make_cached_layer_fn,
    sample_token,
)


class SamplerSettings(NamedTuple):
    """One stream's sampling knobs (reference KimiASampler fields)."""

    temperature: float = 0.0
    top_k: int = 0
    repetition_penalty: float = 1.0
    repetition_window: int = 16


def init_dual_cache(config: KimiAudioConfig, batch: int, max_len: int,
                    dtype=jnp.bfloat16) -> KVCache:
    from touchnet_tpu.ops.decode_attention import DECODE_BLOCK

    tc = config.text_config
    layers = tc.num_hidden_layers + config.kimia_mimo_layers
    max_len = -(-max_len // DECODE_BLOCK) * DECODE_BLOCK  # see init_cache
    shape = (layers, batch, tc.num_key_value_heads, max_len, 2 * tc.head_dim)
    return KVCache(jnp.zeros(shape, dtype))


def forward_step_dual(
    params: dict,
    inputs_embeds: jax.Array,  # [B, Tq, E]
    cache: KVCache,
    start_pos: jax.Array,  # [B]
    config: KimiAudioConfig,
    compute_dtype=jnp.bfloat16,
    *,
    write_pos=None,
    flash_prefill: bool = False,
    prefill_ctx=None,  # SCALAR chunk offset: chunked prefill (see llama)
    logits_indices: Optional[jax.Array] = None,
    decode_valid=None,
):
    """(text_logits, audio_logits, new_cache): main stack feeds lm_head;
    the mimo stack forks at kimia_mimo_transformer_from_layer_index + 1 and
    feeds mimo_output. Cache rows [0, L) are main layers, [L, L+L_mimo)
    mimo layers."""
    tc = config.text_config
    mp = params["model"]
    B, Tq, _ = inputs_embeds.shape
    h = inputs_embeds.astype(compute_dtype)
    position_ids = start_pos[:, None] + jnp.arange(Tq)[None, :]
    valid_len = start_pos + Tq
    scale = 1.0 / (tc.head_dim ** 0.5)
    from touchnet_tpu.models.llama.inference_llama import (
        decode_attention_setup,
    )

    use_flash_decode, attn_mask, block_map_ref = decode_attention_setup(
        tc, cache, Tq, decode_valid
    )
    prefill_args = None
    if prefill_ctx is not None and Tq > 1:
        from touchnet_tpu.models.llama.inference_llama import (
            make_prefill_args,
        )

        prefill_args = make_prefill_args(B, Tq, cache.kv.shape[3], prefill_ctx)
    layer = make_cached_layer_fn(
        tc, B, Tq, position_ids, valid_len, scale, write_pos, attn_mask,
        start_pos, use_flash_decode, decode_valid, flash_prefill,
        compute_dtype, block_map_ref, prefill_args=prefill_args,
    )

    L = tc.num_hidden_layers
    fork = config.kimia_mimo_transformer_from_layer_index + 1
    first = jax.tree.map(lambda x: x[:fork], mp["layers"])
    rest = jax.tree.map(lambda x: x[fork:], mp["layers"])

    (h_mid, kv, li), _ = jax.lax.scan(
        layer, (h, cache.kv, jnp.asarray(0, jnp.int32)), first
    )
    (h_final, kv, _), _ = jax.lax.scan(layer, (h_mid, kv, li), rest)
    # mimo stream continues the cache at rows [L, L + L_mimo)
    (h_mimo, kv, _), _ = jax.lax.scan(
        layer, (h_mid, kv, jnp.asarray(L, jnp.int32)), mp["mimo_layers"]
    )

    h_final = rms_norm(h_final, mp["norm"]["weight"].astype(compute_dtype),
                       tc.rms_norm_eps)
    h_mimo = rms_norm(h_mimo, mp["mimo_norm"]["weight"].astype(compute_dtype),
                      tc.rms_norm_eps)
    if logits_indices is not None:
        h_final = jnp.take_along_axis(
            h_final, logits_indices[:, None, None], axis=1
        )
        h_mimo = jnp.take_along_axis(
            h_mimo, logits_indices[:, None, None], axis=1
        )
    text_logits = linear(
        h_final, params["lm_head"]["weight"].astype(compute_dtype)
    ).astype(jnp.float32)
    audio_logits = linear(
        h_mimo, params["mimo_output"]["weight"].astype(compute_dtype)
    ).astype(jnp.float32)
    return text_logits, audio_logits, KVCache(kv)


def generate_dual(
    params: dict,
    config: KimiAudioConfig,
    prompt_embeds: jax.Array,  # [B, Tp, E] (audio + text streams summed)
    prompt_len: jax.Array,  # [B]
    max_new_tokens: int,
    *,
    blank_id: int,  # <|im_kimia_text_blank|> (reference hardcodes 151666)
    eos_id: int,    # <|im_kimia_text_eos|>   (reference hardcodes 151667)
    # defaults = the reference generate() signature's sampler knobs
    # (reference touchnet/models/kimi_audio/modeling_kimi_audio.py:1084-1100:
    # text greedy WITH repetition penalty 1.1/window 16 — the penalty runs
    # before the argmax; audio temp 0.8 / top-k 10 / window 64). Deviation:
    # the reference arms its penalty only once MORE than `window` tokens
    # exist; this windowed buffer penalizes from the first token over
    # whatever history exists (stricter for the first `window` steps).
    text_sampler: SamplerSettings = SamplerSettings(
        temperature=0.0, top_k=5, repetition_penalty=1.1,
        repetition_window=16,
    ),
    audio_sampler: SamplerSettings = SamplerSettings(
        temperature=0.8, top_k=10, repetition_penalty=1.0,
        repetition_window=64,
    ),
    output_type: str = "both",  # "text" holds the audio stream at blank
    audio_delay_tokens: Optional[int] = None,
    seed: int = 0,
    compute_dtype=jnp.bfloat16,
    prefill_chunk: Optional[int] = None,
):
    """Returns (text_tokens [B, N], audio_tokens [B, N]) — blank-padded.

    Text eos finishes a row (its text stream emits blank after); the audio
    stream starts after `kimia_mimo_audiodelaytokens` blanks (reference
    semantics). Audio tokens are VQ codes offset by kimia_token_offset,
    decodable by a vocoder (out of scope here, as in the reference's ASR
    recipes)."""
    tc = config.text_config
    blank = blank_id
    eos = eos_id
    delay = (
        config.kimia_mimo_audiodelaytokens
        if audio_delay_tokens is None else audio_delay_tokens
    )
    B, Tp, E = prompt_embeds.shape
    embed_w = params["model"]["embed_tokens"]["weight"]
    if prefill_chunk:
        # chunked prefill over BOTH stacks (same contract as llama
        # generate: one compiled [B, C] program per prompt length class)
        C = min(prefill_chunk, Tp)
        if jax.default_backend() == "tpu":
            C = -(-C // 128) * 128  # Mosaic 128-lane block rule
        pad = (-Tp) % C
        if pad:
            prompt_embeds = jnp.pad(prompt_embeds, ((0, 0), (0, pad), (0, 0)))
        Tp = Tp + pad
    cache = init_dual_cache(config, B, Tp + max_new_tokens, compute_dtype)

    if prefill_chunk:
        nchunks = Tp // C
        last_idx = prompt_len - 1
        Vt = params["lm_head"]["weight"].shape[0]
        Va = params["mimo_output"]["weight"].shape[0]

        def chunk_body(i, carry):
            kv, tl, al = carry
            off = i * C
            emb = jax.lax.dynamic_slice(prompt_embeds, (0, off, 0), (B, C, E))
            tl2, al2, new_cache = forward_step_dual(
                params, emb, KVCache(kv),
                jnp.full((B,), off, jnp.int32), config, compute_dtype,
                write_pos=off, prefill_ctx=off,
                logits_indices=jnp.clip(last_idx - off, 0, C - 1),
            )
            in_chunk = ((last_idx >= off) & (last_idx < off + C))[:, None]
            return (
                new_cache.kv,
                jnp.where(in_chunk, tl2[:, 0], tl),
                jnp.where(in_chunk, al2[:, 0], al),
            )

        kv, tlast, alast = jax.lax.fori_loop(
            0, nchunks, chunk_body,
            (cache.kv, jnp.zeros((B, Vt), jnp.float32),
             jnp.zeros((B, Va), jnp.float32)),
        )
        cache = KVCache(kv)
        text_logits = tlast[:, None]
        audio_logits = alast[:, None]
    else:
        text_logits, audio_logits, cache = forward_step_dual(
            params, prompt_embeds, cache, jnp.zeros((B,), jnp.int32), config,
            compute_dtype, write_pos=jnp.asarray(0, jnp.int32),
            flash_prefill=True, logits_indices=prompt_len - 1,
        )

    tw = max(text_sampler.repetition_window, 1)
    aw = max(audio_sampler.repetition_window, 1)
    text_only = output_type == "text"  # static

    def body(state):
        (step, cache, tl, al, text_out, audio_out, done,
         trecent, arecent, key) = state
        key, kt, ka = jax.random.split(key, 3)
        t_tok = sample_token(
            tl, kt, text_sampler.temperature, text_sampler.top_k,
            text_sampler.repetition_penalty, trecent,
        )
        a_tok = sample_token(
            al, ka, audio_sampler.temperature, audio_sampler.top_k,
            audio_sampler.repetition_penalty, arecent,
        )
        t_tok = jnp.where(done, blank, t_tok)
        done = done | (t_tok == eos)
        # audio stream: blank during the delay ramp, and always when only
        # text is wanted (reference _generate_loop:1194-1199)
        a_blank = (step < delay) | text_only | done
        a_tok = jnp.where(a_blank, blank, a_tok)
        text_out = text_out.at[:, step].set(t_tok)
        audio_out = audio_out.at[:, step].set(a_tok)
        trecent = jnp.concatenate([trecent[:, 1:], t_tok[:, None]], axis=1)
        arecent = jnp.concatenate([arecent[:, 1:], a_tok[:, None]], axis=1)
        emb = (
            jnp.take(embed_w, t_tok, axis=0)
            + jnp.take(embed_w, a_tok, axis=0)
        )[:, None, :]
        tl2, al2, cache = forward_step_dual(
            params, emb, cache, prompt_len + step, config, compute_dtype,
            write_pos=Tp + step,
            decode_valid=(prompt_len, Tp, Tp + step),
        )
        return (step + 1, cache, tl2[:, 0], al2[:, 0], text_out, audio_out,
                done, trecent, arecent, key)

    state = (
        jnp.asarray(0), cache, text_logits[:, 0], audio_logits[:, 0],
        jnp.full((B, max_new_tokens), blank, jnp.int32),
        jnp.full((B, max_new_tokens), blank, jnp.int32),
        jnp.zeros((B,), bool),
        jnp.full((B, tw), -1, jnp.int32),
        jnp.full((B, aw), -1, jnp.int32),
        jax.random.PRNGKey(seed),
    )

    def cond_fn(state):
        return (state[0] < max_new_tokens) & ~state[6].all()

    state = jax.lax.while_loop(cond_fn, body, state)
    return state[4], state[5]
