# Copyright (c) 2026 touchnet_tpu authors.
# KV-cache autoregressive generation for the functional Llama backbone.
#
# Capability parity: the reference delegates generation to HF
# model.generate (touchnet/models/*/inference_*.py). TPU-native design:
# prefill + decode are two jitted programs with STATIC shapes — the cache is
# a preallocated [L, B, max_len, Hkv, Dh] buffer updated with
# lax.dynamic_update_slice, the decode loop is lax.while_loop (one
# compilation for any prompt/output length ≤ max_len), and sampling
# (greedy / temperature / top-k / repetition penalty — KimiASampler parity,
# reference modeling_kimi_audio.py:719-846) is pure jnp.

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from touchnet_tpu.models.common import apply_rope, linear, rms_norm, rope_frequencies, swiglu
from touchnet_tpu.models.llama.configuration_llama import LlamaConfig

NEG_INF = -1e30


class KVCache(NamedTuple):
    # PACKED [L, B, Hkv, S, 2*Dh]: K in lanes [0, Dh), V in lanes
    # [Dh, 2*Dh). One buffer serves both attention matmuls, the packed
    # width is a 128-lane multiple for common head dims (no repadding on
    # the Pallas decode kernel's manual DMAs), and each layer does ONE
    # in-place dynamic_update_slice per step instead of two. The kv-head
    # dim sits outside the sequence dim so cache contractions are
    # layout-native (ops/decode_attention.py).
    kv: jax.Array


def init_cache(config: LlamaConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
    from touchnet_tpu.ops.decode_attention import DECODE_BLOCK

    # round the sequence capacity up to the decode kernel's block size:
    # a non-multiple cache would be jnp.pad-COPIED per layer per step
    # inside decode_attention (the whole-cache copy costs more than the
    # kernel). The extra slots are never valid (masks/base/last bound
    # reads); the einsum path just carries <= 3% more masked columns.
    max_len = -(-max_len // DECODE_BLOCK) * DECODE_BLOCK
    shape = (
        config.num_hidden_layers, batch, config.num_key_value_heads,
        max_len, 2 * config.head_dim,
    )
    return KVCache(jnp.zeros(shape, dtype))


def decode_attention_setup(config, cache, Tq: int, decode_valid, attn_mask=None):
    """Shared decode gating for every model's cached step: decides
    flash-kernel vs einsum (shape support + measured context threshold),
    builds the dense [B, S] validity mask for the einsum path, and
    precomputes the per-row block map ONCE per step for the kernel path.
    Returns (use_flash_decode, attn_mask, block_map_ref)."""
    from touchnet_tpu.ops import decode_attention as _da

    use_flash_decode = (
        decode_valid is not None and Tq == 1
        and jax.default_backend() == "tpu" and _da.USE_FLASH_DECODE
        and _da.supported(config.head_dim, config.num_key_value_heads)
        and cache.kv.shape[3] >= _da.FLASH_DECODE_MIN_CONTEXT
    )
    block_map_ref = ()
    if decode_valid is not None and not use_flash_decode:
        plen_, base_, last_ = decode_valid
        cols = jnp.arange(cache.kv.shape[3], dtype=jnp.int32)[None, :]
        attn_mask = (cols < plen_[:, None]) | (
            (cols >= base_) & (cols <= last_)
        )
    elif use_flash_decode:
        block_map_ref = (make_decode_block_map(
            cache.kv.shape[3], *decode_valid
        ),)
    return use_flash_decode, attn_mask, block_map_ref


def make_decode_block_map(S: int, prompt_len, base, last):
    """Per-row live-block table for the flash decode kernel, computed ONCE
    per decode step (one small XLA sort) — NOT per layer."""
    from touchnet_tpu.ops.decode_attention import block_geometry, live_block_map

    bs, nb = block_geometry(S)
    return live_block_map(
        prompt_len.astype(jnp.int32), jnp.asarray(base, jnp.int32),
        jnp.asarray(last, jnp.int32), bs, nb,
    )


def _cached_attention(q, kv_cache, valid_len, scale, attn_mask=None):
    """q [B,Tq,H,D] attends the packed cache [B,Hkv,S,2D] positions <
    valid_len (+ its own causal rows for Tq > 1 prefill). GQA-grouped:
    query heads fold into their kv head's contraction — the cache is never
    repeat-expanded or up-cast (a [B,S,H,D] f32 materialization would
    dominate decode-step HBM traffic at batch > 1). attn_mask [B,S]
    overrides the contiguous validity default (non-contiguous caches:
    prompt gap slots)."""
    B, Tq, H, D = q.shape
    if attn_mask is not None and Tq != 1:
        # a [B, S] mask broadcast over Tq rows drops intra-chunk causality
        raise ValueError(
            f"attn_mask is a per-cache-slot decode mask; Tq={Tq} chunks "
            "must use the causal valid_len path or flash_prefill"
        )
    Hkv, S = kv_cache.shape[1], kv_cache.shape[2]
    G = H // Hkv
    k_cache = kv_cache[..., :D]
    v_cache = kv_cache[..., D:]
    qg = q.reshape(B, Tq, Hkv, G, D)
    s = jnp.einsum(
        "btkgd,bksd->bkgts", qg, k_cache,
        preferred_element_type=jnp.float32,
    ) * scale  # [B,Hkv,G,Tq,S] f32
    if attn_mask is None:
        # rows are at absolute positions valid_len - Tq + t
        rows = (valid_len[:, None] - Tq + jnp.arange(Tq)[None, :])  # [B,Tq]
        cols = jnp.arange(S)[None, None, :]
        mask = cols <= rows[:, :, None]  # [B,Tq,S]
    else:
        mask = attn_mask[:, None, :]  # [B,1->Tq,S]
    s = jnp.where(mask[:, None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum(
        "bkgts,bksd->btkgd", p.astype(v_cache.dtype), v_cache
    )
    return out.reshape(B, Tq, H, D).astype(q.dtype)


def forward_step(
    params: dict,
    inputs_embeds: jax.Array,  # [B, Tq, E] (prefill chunk or 1-token step)
    cache: KVCache,
    start_pos: jax.Array,  # [B] absolute position of inputs_embeds[:, 0]
    config: LlamaConfig,
    compute_dtype=jnp.bfloat16,
    *,
    write_pos: Optional[jax.Array] = None,  # SCALAR cache slot override
    attn_mask: Optional[jax.Array] = None,  # [B, S] cache-slot validity
    flash_prefill: bool = False,  # Tq>1 chunk at start_pos 0: flash kernel
    prefill_ctx: Optional[jax.Array] = None,  # SCALAR offset: chunked prefill
    logits_indices: Optional[jax.Array] = None,  # [B] project ONLY these
    decode_valid=None,  # (prompt_len [B], base, last): ragged decode mask
) -> tuple:
    """Returns (logits [B, Tq, V], new_cache).

    start_pos drives rope (semantic positions) and the default contiguous
    attention validity. write_pos, when given, is the SCALAR slot every
    row's kv is stored at — a uniform slot keeps the cache update a true
    in-place lax.dynamic_update_slice; per-row start_pos slots lower to a
    scatter that copies the cache every step (TPU decode killer)."""
    mp = params["model"]
    B, Tq, _ = inputs_embeds.shape
    h = inputs_embeds.astype(compute_dtype)
    position_ids = start_pos[:, None] + jnp.arange(Tq)[None, :]
    valid_len = start_pos + Tq
    scale = 1.0 / (config.head_dim ** 0.5)
    use_flash_decode, attn_mask, block_map_ref = decode_attention_setup(
        config, cache, Tq, decode_valid, attn_mask
    )
    prefill_args = None
    if prefill_ctx is not None and Tq > 1:
        prefill_args = make_prefill_args(
            B, Tq, cache.kv.shape[3], prefill_ctx
        )

    layer = make_cached_layer_fn(
        config, B, Tq, position_ids, valid_len, scale, write_pos, attn_mask,
        start_pos, use_flash_decode, decode_valid, flash_prefill,
        compute_dtype, block_map_ref, prefill_args=prefill_args,
    )

    (h, new_kv, _), _ = jax.lax.scan(
        layer,
        (h, cache.kv, jnp.asarray(0, jnp.int32)),
        mp["layers"],
    )
    h = rms_norm(h, mp["norm"]["weight"].astype(compute_dtype), config.rms_norm_eps)
    if logits_indices is not None:
        # project only the requested positions: a long prefill's full
        # [B, Tq, V] logits would cost Tq·V·E flops and O(GB) of HBM for
        # rows that are thrown away (the liger memory-efficiency analog)
        h = jnp.take_along_axis(h, logits_indices[:, None, None], axis=1)
    head_w = (
        mp["embed_tokens"]["weight"]
        if config.tie_word_embeddings
        else params["lm_head"]["weight"]
    )
    logits = linear(h, head_w.astype(compute_dtype))
    return logits.astype(jnp.float32), KVCache(new_kv)


def make_prefill_args(B, Tq, S_cap, prefill_ctx, *, block_q=1024,
                      block_kv=None):
    """Per-chunk state for the chunked-prefill attention: the q/kv validity
    segments and the flash live-block map, computed ONCE per chunk (one XLA
    sort) and shared by every decoder layer."""
    from touchnet_tpu.ops.attention import make_grouped_prefill_map
    from touchnet_tpu.ops.decode_attention import DECODE_BLOCK

    block_q = min(block_q, Tq)
    block_kv = min(DECODE_BLOCK, S_cap) if block_kv is None else block_kv
    q_seg = jnp.ones((B, Tq), jnp.int32)
    cols = jnp.arange(S_cap, dtype=jnp.int32)[None, :]
    kv_seg = jnp.broadcast_to(
        (cols < prefill_ctx + Tq).astype(jnp.int32), (B, S_cap)
    )
    bmap = make_grouped_prefill_map(q_seg, kv_seg, prefill_ctx,
                                    block_q, block_kv)
    return (prefill_ctx, q_seg, kv_seg, bmap, block_q, block_kv)


def make_cached_layer_fn(
    config, B, Tq, position_ids, valid_len, scale, write_pos, attn_mask,
    start_pos, use_flash_decode, decode_valid, flash_prefill, compute_dtype,
    block_map_ref=(),  # [(bmap, nlive)] precomputed once per decode step
    prefill_args=None,  # from make_prefill_args: chunked-prefill state
):
    """Scan body for one decoder layer over the shared packed cache.

    Factored out of forward_step so multi-stack models (Kimi-Audio's main +
    mimo streams, generate_kimi_audio.py) can run several layer stacks over
    ONE [L_total, B, Hkv, S, 2D] cache: the carry's layer index `li` keeps
    addressing cache slots across stacks."""
    H, Hkv, Dh = (
        config.num_attention_heads, config.num_key_value_heads, config.head_dim
    )
    inv_freq = rope_frequencies(config.head_dim, config.rope_theta,
                                rope_scaling=config.rope_scaling)

    # the flash-decode step with a uniform write slot never materializes a
    # per-layer cache slice (all branch conditions are trace-time static)
    hot_decode = use_flash_decode and write_pos is not None

    def layer(carry, lp):
        # the WHOLE cache rides the scan carry: lax.scan aliases carries in
        # place, so the per-layer dynamic_update_slice never copies the
        # [L, B, Hkv, S, 2*Dh] buffer (as scan xs/ys it is re-stacked —
        # a full cache copy per decode step)
        h, kv_all, li = carry
        kv_cache_l = None if hot_decode else kv_all[li]
        lp = jax.tree.map(lambda x: x.astype(compute_dtype), lp)
        normed = rms_norm(h, lp["input_layernorm"]["weight"], config.rms_norm_eps)
        sa = lp["self_attn"]
        q = linear(normed, sa["q_proj"]["weight"], sa["q_proj"].get("bias"))
        k = linear(normed, sa["k_proj"]["weight"], sa["k_proj"].get("bias"))
        v = linear(normed, sa["v_proj"]["weight"], sa["v_proj"].get("bias"))
        q = q.reshape(B, Tq, H, Dh)
        k = k.reshape(B, Tq, Hkv, Dh)
        v = v.reshape(B, Tq, Hkv, Dh)
        q, k = apply_rope(q, k, position_ids, inv_freq)
        if write_pos is not None:
            # uniform slot: one in-place dynamic_update_slice for the batch
            def upd(cache_l, new):
                return jax.lax.dynamic_update_slice(
                    cache_l, new.astype(cache_l.dtype),
                    (0, 0, write_pos, 0),
                )
        else:
            # per-row slots (ragged prefill): vmapped slices -> scatter
            def upd(cache_l, new):
                return jax.vmap(
                    lambda c, n, sp: jax.lax.dynamic_update_slice(
                        c, n.astype(c.dtype), (0, sp, 0)
                    )
                )(cache_l, new, start_pos)
        # pack K|V on lanes, [B, Tq, Hkv, 2D] -> cache layout [B, Hkv, Tq, 2D]
        kv_new = jnp.concatenate([k, v], axis=-1).transpose(0, 2, 1, 3)
        if use_flash_decode and write_pos is not None:
            # HOT DECODE PATH: write the one new slot straight into the
            # rank-5 carry and let the kernel index the layer inside its
            # block DMAs — the old extract (kv_all[li]) + reinsert moved
            # ~2.1 GB per layer per step (r4 measured: 36 ms of a 57.6 ms
            # B=32/8k decode step; the kernel itself is ~1.2 ms/layer)
            kv_all = jax.lax.dynamic_update_slice(
                kv_all, kv_new.astype(kv_all.dtype)[None],
                (li, 0, 0, write_pos, 0),
            )
        else:
            kv_cache_l = upd(kv_cache_l, kv_new)
            kv_all = jax.lax.dynamic_update_slice(
                kv_all, kv_cache_l[None], (li, 0, 0, 0, 0)
            )
        if use_flash_decode:
            from touchnet_tpu.ops.decode_attention import decode_attention

            plen_, base_, last_ = decode_valid
            bmap_nlive = (
                block_map_ref[0] if block_map_ref
                # fallback: per-call map (one XLA sort per LAYER — callers
                # should precompute via make_decode_block_map instead)
                else make_decode_block_map(
                    kv_all.shape[3], plen_, base_, last_
                )
            )
            attn = decode_attention(
                q[:, 0], kv_all, plen_, base_, last_, scale,
                block_map=bmap_nlive, layer_idx=li,
            )[:, None]
        elif prefill_args is not None and Tq > 1:
            # CHUNKED prefill: the chunk's queries attend the cache prefix
            # [0, prefill_ctx) plus themselves, via the grouped flash entry.
            # The packed cache's [B, Hkv, S, 2D] layout IS the grouped
            # kernel's native kv layout — k/v come straight off the lane
            # split with zero transposes; unwritten slots are masked by a
            # kv segment of 0 (padding only matches itself) and the live-
            # block map (precomputed once per chunk, make_prefill_args)
            # DMA-skips whole dead blocks, so each chunk's cost scales with
            # the written prefix, not the cache capacity. One [B, C]
            # program serves every chunk of every prompt length.
            from touchnet_tpu.ops.attention import (
                _regroup_q,
                _ungroup_q,
                flash_prefill_grouped,
            )

            p_ctx, q_seg, kv_seg, bmap, bq, bkv = prefill_args
            attn_g = flash_prefill_grouped(
                _regroup_q(q, Hkv),
                kv_cache_l[..., :Dh].astype(q.dtype),
                kv_cache_l[..., Dh:].astype(q.dtype),
                q_seg,
                kv_seg,
                q_offset=p_ctx,
                scale=scale,
                block_q=bq,
                block_kv=bkv,
                block_map=bmap,
            )
            attn = _ungroup_q(attn_g)
        elif flash_prefill and Tq > 1:
            # the chunk is self-contained (start_pos 0): attend within the
            # fresh k/v via the packed flash kernel — the dense
            # [B, H, Tq, S] f32 score tensor of the eager path is
            # quadratic in prompt length and caps serving context
            from touchnet_tpu.ops.attention import flash_attention

            attn = flash_attention(q, k, v, causal=True, scale=scale)
        else:
            attn = _cached_attention(
                q, kv_cache_l, valid_len, scale, attn_mask
            )
        h = h + linear(attn.reshape(B, Tq, H * Dh), sa["o_proj"]["weight"])
        normed = rms_norm(h, lp["post_attention_layernorm"]["weight"],
                          config.rms_norm_eps)
        h = h + swiglu(
            normed,
            lp["mlp"]["gate_proj"]["weight"],
            lp["mlp"]["up_proj"]["weight"],
            lp["mlp"]["down_proj"]["weight"],
        )
        return (h, kv_all, li + 1), None

    return layer


# ---------------------------------------------------------------------------
# Sampling (KimiASampler parity: temperature / top-k / repetition penalty;
# top-p nucleus per the reference's HF-generate inference path,
# reference touchnet/models/touch_audio/inference_touch_audio.py:181-183)
# ---------------------------------------------------------------------------


def sample_token(
    logits: jax.Array,  # [B, V]
    key: jax.Array,
    temperature: float = 0.0,
    top_k: int = 0,
    repetition_penalty: float = 1.0,
    recent_tokens: Optional[jax.Array] = None,  # [B, W] (-1 = empty)
    top_p: float = 0.0,
) -> jax.Array:
    logits = logits.astype(jnp.float32)
    if repetition_penalty != 1.0 and recent_tokens is not None:
        B, V = logits.shape
        onehot = jax.nn.one_hot(
            jnp.where(recent_tokens < 0, 0, recent_tokens), V, dtype=jnp.bool_
        ) & (recent_tokens >= 0)[..., None]
        seen = onehot.any(axis=1)  # [B, V]
        penalized = jnp.where(
            logits > 0, logits / repetition_penalty, logits * repetition_penalty
        )
        logits = jnp.where(seen, penalized, logits)
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1)
    logits = logits / temperature
    if top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][:, -1:]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if 0.0 < top_p < 1.0:
        # nucleus: keep the smallest prefix of the descending-prob order
        # whose mass reaches top_p (the crossing token included, so the
        # top-1 token always survives) — HF TopPLogitsWarper semantics.
        # Tie handling deviates at the cut boundary: `logits < cut` keeps
        # EVERY token tied with the crossing logit, while HF's sorted-index
        # mask can drop some tied duplicates — sampling-path only, so no
        # byte-exact HF parity is asserted at ties.
        # One [B, V] sort per emitted token; next to the decode step's
        # L-layer cache streaming this is noise, so no top-k pre-cut.
        desc = -jnp.sort(-logits, axis=-1)
        probs = jax.nn.softmax(desc, axis=-1)
        exclusive = jnp.cumsum(probs, axis=-1) - probs
        kept = jnp.where(exclusive < top_p, desc, jnp.inf)
        cut = jnp.min(kept, axis=-1, keepdims=True)
        logits = jnp.where(logits < cut, NEG_INF, logits)
    return jax.random.categorical(key, logits, axis=-1)


def generate(
    params: dict,
    config: LlamaConfig,
    prompt_embeds: jax.Array,  # [B, Tp, E] (fused multimodal prompts allowed)
    prompt_len: jax.Array,  # [B] true lengths (right padding)
    max_new_tokens: int,
    *,
    eos_id: int,
    embed_fn: Optional[Callable] = None,  # token -> embedding for decode steps
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 0.0,
    repetition_penalty: float = 1.0,
    repetition_window: int = 16,
    no_repeat_ngram_size: int = 0,
    seed: int = 0,
    compute_dtype=jnp.bfloat16,
    prefill_chunk: Optional[int] = None,
    prime_tokens: Optional[tuple] = None,
) -> jax.Array:
    """Batch greedy/sampled decode. Returns [B, max_new_tokens] (eos-padded).

    prime_tokens: static token ids treated as already-generated history
    before step 0: they seed the repetition-penalty window and the
    no-repeat-ngram history (the window grows by len(prime_tokens) so they
    never age out early). Used to reproduce HF's input_ids-mode processors,
    which see the PROMPT ids too — the reference ASR CLI prompts with
    [pad]*(T-1)+[bos] (reference touchnet/models/touch_audio/
    inference_touch_audio.py:75-81), so its penalty covers {pad, bos} and
    its bigram history is {(pad,pad),(pad,bos)} for the entire decode;
    prime_tokens=(pad, pad, bos) reproduces both sets exactly.

    Right padding: positions >= prompt_len are pad; the cache is filled with
    the full padded prompt but attention masks beyond valid_len, and the
    first generated token reads logits at prompt_len - 1.

    prefill_chunk: when set, the prompt is prefilled in fixed [B, chunk]
    steps inside one lax.fori_loop — ONE chunk program is compiled and
    reused for every chunk of every prompt length (the single-shot path
    recompiles per distinct padded Tp), and peak prefill activations are
    O(chunk) instead of O(Tp). Each chunk attends the cache prefix via the
    grouped flash kernel (see make_cached_layer_fn prefill_ctx).
    """
    B, Tp, E = prompt_embeds.shape
    if prefill_chunk:
        C = min(prefill_chunk, Tp)
        if jax.default_backend() == "tpu":
            # Mosaic block shapes need 128-lane alignment; the CPU fallback
            # (dense reference) accepts any chunk, which the tests use
            C = -(-C // 128) * 128
        pad = (-Tp) % C
        if pad:
            prompt_embeds = jnp.pad(prompt_embeds, ((0, 0), (0, pad), (0, 0)))
        Tp = Tp + pad  # decode slots start after the chunk-padded prompt
    max_len = Tp + max_new_tokens
    if embed_fn is None:
        embed_fn = lambda tok: jnp.take(  # noqa: E731
            params["model"]["embed_tokens"]["weight"], tok, axis=0
        )

    cache = init_cache(config, B, max_len, compute_dtype)
    if prefill_chunk:
        nchunks = Tp // C
        last_idx = prompt_len - 1  # [B] position whose logits seed decoding

        def chunk_body(i, carry):
            kv, last_logits = carry
            off = i * C
            emb = jax.lax.dynamic_slice(prompt_embeds, (0, off, 0), (B, C, E))
            logits, new_cache = forward_step(
                params, emb, KVCache(kv),
                jnp.full((B,), off, jnp.int32), config, compute_dtype,
                write_pos=off,
                prefill_ctx=off,
                logits_indices=jnp.clip(last_idx - off, 0, C - 1),
            )
            in_chunk = (last_idx >= off) & (last_idx < off + C)
            last_logits = jnp.where(
                in_chunk[:, None], logits[:, 0], last_logits
            )
            return new_cache.kv, last_logits

        vocab = (
            params["model"]["embed_tokens"]["weight"].shape[0]
            if config.tie_word_embeddings
            else params["lm_head"]["weight"].shape[0]
        )
        kv, last_logits = jax.lax.fori_loop(
            0, nchunks, chunk_body,
            (cache.kv, jnp.zeros((B, vocab), jnp.float32)),
        )
        cache = KVCache(kv)
    else:
        # prefill with start_pos 0 for all rows (padded rows attend
        # causally; garbage beyond prompt_len is never read back); slot 0
        # is uniform
        logits, cache = forward_step(
            params, prompt_embeds, cache,
            jnp.zeros((B,), jnp.int32), config, compute_dtype,
            write_pos=jnp.asarray(0, jnp.int32),
            flash_prefill=True,
            logits_indices=prompt_len - 1,
        )
        last_logits = logits[:, 0]  # [B, V]

    prime = tuple(int(t) for t in (prime_tokens or ()))
    P = len(prime)
    window = max(repetition_window, 1) + P

    def cond(state):
        step, _, _, _, done, _, _ = state
        return (step < max_new_tokens) & ~done.all()

    def body(state):
        step, cache, last_logits, out, done, recent, key = state
        key, sub = jax.random.split(key)
        if no_repeat_ngram_size >= 2:
            # HF NoRepeatNGramLogitsProcessor over the GENERATED sequence
            # (inputs are embeddings, so the prompt carries no token ids —
            # HF's inputs_embeds mode bans over generated ids only; the
            # reference's ASR decode runs with no_repeat_ngram_size=2 even
            # under do_sample=False, reference touchnet/models/touch_audio/
            # inference_touch_audio.py:177-186): ban token v when the last
            # n-1 generated tokens followed by v already occur in `out`.
            n = no_repeat_ngram_size
            T_out = out.shape[1]
            # history length includes the P primed tokens at out[:, :P]
            hstep = step + P
            start = jnp.clip(hstep - (n - 1), 0, T_out - (n - 1))
            ctx = jax.lax.dynamic_slice_in_dim(out, start, n - 1, axis=1)
            nj = T_out - (n - 1)
            match = jnp.ones((B, nj), bool)
            for i in range(n - 1):
                match &= out[:, i:nj + i] == ctx[:, i:i + 1]
            # the ngram's final token must already be in the history
            # (j+n-1 < hstep also kills every position while hstep < n-1,
            # when `ctx` is necessarily incomplete)
            match &= (jnp.arange(nj) + (n - 1) < hstep)[None, :]
            banned = jnp.zeros(last_logits.shape, bool).at[
                jnp.arange(B)[:, None], out[:, (n - 1):]
            ].max(match)
            last_logits = jnp.where(banned, NEG_INF, last_logits)
        tok = sample_token(
            last_logits, sub, temperature, top_k, repetition_penalty, recent,
            top_p=top_p,
        )
        tok = jnp.where(done, eos_id, tok)
        out = out.at[:, P + step].set(tok)
        done = done | (tok == eos_id)
        recent = jnp.concatenate([recent[:, 1:], tok[:, None]], axis=1)
        emb = embed_fn(tok)[:, None, :]  # [B,1,E]
        # decode kv lands at the UNIFORM slot Tp + step (in-place cache
        # update); semantic/rope position stays the per-row prompt_len +
        # step. Validity: the row's own prompt [0, plen) plus the decoded
        # slots [Tp, Tp + step]; the gap [plen, Tp) holds prompt padding.
        logits, cache = forward_step(
            params, emb, cache, prompt_len + step, config, compute_dtype,
            write_pos=Tp + step,
            decode_valid=(prompt_len, Tp, Tp + step),
        )
        return step + 1, cache, logits[:, 0], out, done, recent, key

    out = jnp.full((B, P + max_new_tokens), eos_id, jnp.int32)
    recent = jnp.full((B, window), -1, jnp.int32)
    if P:
        prime_row = jnp.asarray(prime, jnp.int32)
        out = out.at[:, :P].set(prime_row[None, :])
        recent = recent.at[:, window - P:].set(prime_row[None, :])
    state = (
        jnp.asarray(0), cache, last_logits, out,
        jnp.zeros((B,), bool),
        recent,
        jax.random.PRNGKey(seed),
    )
    state = jax.lax.while_loop(cond, body, state)
    return state[3][:, P:]
