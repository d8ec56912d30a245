# Copyright (c) 2026 touchnet_tpu authors.
# Llama decoder as a pure function over an HF-shaped param pytree.
#
# Capability parity: the reference reuses HF transformers.LlamaForCausalLM
# with flex-attention packed-document masks (touchnet/models/llama/
# __init__.py:11-67, SURVEY.md §2.7). TPU-first design decisions:
#   - per-layer weights are STACKED on a leading [L, ...] axis and the depth
#     loop is lax.scan -> one trace/compile regardless of depth;
#   - attention is the Pallas packed flash kernel (ops/attention.py);
#   - activation checkpointing is jax.checkpoint on the scanned body
#     (mode "full") or a dots-saveable rematerialization policy
#     (mode "selective" / "op"), replacing torch ptd_checkpoint_wrapper
#     (reference touchnet/models/helper_func.py:26-112);
#   - mixed precision: params live in fp32 (master), compute casts to
#     bfloat16 at entry (reference MixedPrecisionPolicy, helper_func.py:160).
#
# Param tree (HF key layout, so HF<->Orbax converters are mechanical):
#   model.embed_tokens.weight            [V, E]
#   model.layers.{input_layernorm, self_attn.{q,k,v,o}_proj,
#                 post_attention_layernorm, mlp.{gate,up,down}_proj}.weight
#       — each stacked [L, ...]
#   model.norm.weight                    [E]
#   lm_head.weight                       [V, E]   (absent when tied)

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from touchnet_tpu.models.common import (
    apply_rope,
    apply_rope_grouped,
    linear,
    normal_init,
    rms_norm,
    rope_frequencies,
)
from touchnet_tpu.models.llama.configuration_llama import LlamaConfig
from touchnet_tpu.ops.attention import flash_attention, packed_attention_reference


def init_params(config: LlamaConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    """Initialize the parameter pytree (normal(0, initializer_range), ones
    for norms — HF LlamaPreTrainedModel._init_weights semantics)."""
    E = config.hidden_size
    L = config.num_hidden_layers
    H = config.num_attention_heads
    Hkv = config.num_key_value_heads
    Dh = config.head_dim
    inter = config.intermediate_size
    V = config.vocab_size
    std = config.initializer_range
    keys = iter(jax.random.split(key, 16))

    def w(k, shape):
        return normal_init(k, shape, std=std, dtype=dtype)

    def proj(k, out_dim, in_dim, bias):
        p = {"weight": w(k, (L, out_dim, in_dim))}
        if bias:
            p["bias"] = jnp.zeros((L, out_dim), dtype)
        return p

    ab = config.attention_bias  # Qwen2-style q/k/v biases (o_proj stays bias-free)
    params = {
        "model": {
            "embed_tokens": {"weight": w(next(keys), (V, E))},
            "layers": {
                "input_layernorm": {"weight": jnp.ones((L, E), dtype)},
                "self_attn": {
                    "q_proj": proj(next(keys), H * Dh, E, ab),
                    "k_proj": proj(next(keys), Hkv * Dh, E, ab),
                    "v_proj": proj(next(keys), Hkv * Dh, E, ab),
                    "o_proj": {"weight": w(next(keys), (L, E, H * Dh))},
                },
                "post_attention_layernorm": {"weight": jnp.ones((L, E), dtype)},
                "mlp": {
                    "gate_proj": {"weight": w(next(keys), (L, inter, E))},
                    "up_proj": {"weight": w(next(keys), (L, inter, E))},
                    "down_proj": {"weight": w(next(keys), (L, E, inter))},
                },
            },
            "norm": {"weight": jnp.ones((E,), dtype)},
        },
    }
    if not config.tie_word_embeddings:
        params["lm_head"] = {"weight": w(next(keys), (V, E))}
    return params


def _selective_layer_freq(remat_mode: str, selective_ac_option: str) -> int:
    """k for every-k-th-layer AC, or 0 when the mode/option doesn't use it.

    mode "selective": an int option is the reference's every-k-th-layer
    wrap; "op_every_<k>" is the long-context hybrid (op-save every k-th
    layer, selective-save the rest — a memory dial BETWEEN selective and
    op: +saved-dots/k footprint, -matmul-recompute/k).
    mode "op": the hybrid (op-save k-1 of every k layers, full-remat
    the k-th) requires the EXPLICIT form "full_every_<k>" — a bare int is
    ignored there because the config option defaults to "2" for
    selective's sake, and mode "op" alone must mean the pure (fastest)
    policy the bench measures."""
    opt = str(selective_ac_option)
    if remat_mode == "op":
        if opt.startswith("full_every_"):
            k = int(opt[len("full_every_"):])
            if k < 1:
                raise ValueError(f"full_every_<k> needs k >= 1, got {k}")
            return k
        return 0
    if remat_mode != "selective":
        return 0
    if opt.startswith("full_every_"):
        raise ValueError(
            "selective_ac_option 'full_every_<k>' applies to mode 'op' "
            "(the op/full hybrid); mode 'selective' takes an int, "
            "'op_every_<k>', or 'op'"
        )
    if opt.startswith("op_every_"):
        k = int(opt[len("op_every_"):])
        if k < 1:
            raise ValueError(f"op_every_<k> needs k >= 1, got {k}")
        return k
    try:
        k = int(selective_ac_option)
    except (TypeError, ValueError):
        return 0
    if k < 1:
        raise ValueError(
            f"selective_ac_option must be 'op' or a positive int, got {k}"
        )
    return k


def _apply_remat(
    body: Callable, remat_mode: str, selective_ac_option: str = "op"
) -> Callable:
    """Activation-checkpoint modes (reference apply_ac,
    helper_func.py:26-112):
      full          — recompute everything per layer;
      selective+op  — save the flash-attention kernel's (out, lse) residuals
                      so the backward never re-runs the forward kernel, and
                      recompute the cheap matmul chain (the reference's
                      selective-per-op "save sdpa" analog);
      selective+k   — full AC on every k-th layer only; handled at the scan
                      level by scan_layers (this wrapper is a no-op for it);
      op            — save every no-batch-dim matmul output AND the flash
                      residuals: the backward recomputes only elementwise
                      chains. Fastest when activations fit (measured
                      +4.7pp MFU over "selective" at packed-8k on v5e —
                      "selective" re-runs the whole matmul chain, ~+2N
                      flops/token, a 75%-of-peak ceiling).
    """
    if remat_mode == "full":
        return jax.checkpoint(body, prevent_cse=False)
    if remat_mode == "selective":
        if _selective_layer_freq(remat_mode, selective_ac_option):
            return body  # per-layer policy applied by scan_layers
        return jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.save_only_these_names(
                "flash_out", "flash_lse"
            ),
            prevent_cse=False,
        )
    if remat_mode == "op":
        # dots AND the flash kernel's residuals: dots_with_no_batch_dims
        # alone would re-run the flash forward kernel in the backward (the
        # kernel output is not a dot) — measured 3pp MFU WORSE than
        # "selective" on v5e; the union saves everything expensive and the
        # backward recomputes only elementwise chains
        return jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.save_from_both_policies(
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                jax.checkpoint_policies.save_only_these_names(
                    "flash_out", "flash_lse"
                ),
            ),
            prevent_cse=False,
        )
    if remat_mode == "op_names":
        # the same save set as "op", expressed through the decoder_layer's
        # checkpoint_name tags instead of the dots-saveable analysis
        return jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.save_only_these_names(
                "flash_out", "flash_lse",
                "dot_q", "dot_k", "dot_v", "dot_o",
                "dot_gate", "dot_up", "dot_down",
            ),
            prevent_cse=False,
        )
    if remat_mode == "op_small":
        # long-context middle ground: save the flash residuals and the
        # SMALL dots (q/k/v/o — ~5.7k elems/token vs op's ~17.9k); the
        # backward recomputes only the two big MLP matmuls (gate/up),
        # ~55% of selective's matmul recompute for ~32% of op's saved
        # bytes. This is what fits 16 GiB at packed-32k where "op" (and
        # every op_every_k hybrid k<=7) exceeds HBM.
        return jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.save_only_these_names(
                "flash_out", "flash_lse",
                "dot_q", "dot_k", "dot_v", "dot_o",
            ),
            prevent_cse=False,
        )
    if remat_mode.startswith("save:"):
        # fully parameterized save set over the layer's checkpoint_name
        # tags (flash_out, flash_lse, dot_q/k/v/o, dot_gate/up/down) —
        # the raw dial behind the named policies, for per-topology sweeps
        names = [n for n in remat_mode[len("save:"):].split(",") if n]
        if not names:
            raise ValueError("remat_mode 'save:' needs at least one name")
        return jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.save_only_these_names(*names),
            prevent_cse=False,
        )
    return body


def scan_layers(
    body: Callable,
    h: jax.Array,
    stacked_layers,
    remat_mode: str = "none",
    selective_ac_option: str = "op",
):
    """Depth loop over [L, ...]-stacked layer params.

    Default: lax.scan of the (possibly remat-wrapped) body — one
    trace/compile regardless of depth. For selective every-k-th-layer AC
    (reference helper_func.py:26-112 with an int ac option: checkpoint
    wraps layers with idx % k == 0 only) the scan runs over groups of k
    layers; the first layer of each group is rematted, the rest store their
    residuals — reproducing the reference's memory/recompute trade.

    Hybrids for long context (every-k-th-layer mixes):
      mode "op" + "full_every_<k>": full-remat every k-th layer, op-save
        the other k-1 — between "full" and "op"; saved footprint scales
        by (k-1)/k of op's.
      mode "selective" + "op_every_<k>": op-save every k-th layer,
        selective-save the rest — between "selective" and "op"; adds
        ~saved-dots/k footprint and removes the matmul-chain recompute on
        1/k of the layers.

    The k-group runs as a scan-of-scans (one first layer + an inner scan
    over the k-1 rest layers), so the traced graph holds two layer bodies
    regardless of k — a k-unrolled group body inflates the lowered module
    past the compile helper's host memory at 32k (docs/performance.md).
    """
    k = _selective_layer_freq(remat_mode, selective_ac_option)
    if k <= 1:
        mode = remat_mode
        if k == 1:
            opt = str(selective_ac_option)
            mode = "op" if opt.startswith("op_every_") else "full"
        wrapped = _apply_remat(body, mode, selective_ac_option)
        return jax.lax.scan(wrapped, h, stacked_layers)[0]

    if remat_mode == "selective" and str(selective_ac_option).startswith(
        "op_every_"
    ):
        first_body = _apply_remat(body, "op")
        rest_body = _apply_remat(body, "selective", "op")
    else:
        first_body = jax.checkpoint(body, prevent_cse=False)
        # "selective"+k keeps reference semantics (non-ckpt layers store
        # ALL residuals); "op"+k stores only dots + flash residuals
        rest_body = _apply_remat(body, "op") if remat_mode == "op" else body
    num_layers = jax.tree.leaves(stacked_layers)[0].shape[0]
    groups, rem = divmod(num_layers, k)

    def take(tree, idx):
        return jax.tree.map(lambda x: x[idx], tree)

    def group_body(carry, gp):
        carry, _ = first_body(carry, take(gp, 0))
        if k > 1:
            rest = jax.tree.map(lambda x: x[1:], gp)
            carry = jax.lax.scan(rest_body, carry, rest)[0]
        return carry, None

    if groups:
        grouped = jax.tree.map(
            lambda x: x[: groups * k].reshape(groups, k, *x.shape[1:]),
            stacked_layers,
        )
        h = jax.lax.scan(group_body, h, grouped)[0]
    for i in range(rem):
        fn = first_body if i == 0 else rest_body
        h, _ = fn(h, take(stacked_layers, groups * k + i))
    return h


def _default_attn(config: LlamaConfig, block_q: int, block_kv: int) -> Callable:
    if config.attn_implementation == "eager":
        return lambda q, k, v, seg: packed_attention_reference(q, k, v, seg)
    if config.attn_implementation == "flash_static":
        # static-grid kernel variants (A/B escape hatch) keep [B,T,H,D] IO
        return lambda q, k, v, seg: flash_attention(
            q, k, v, seg, block_q=block_q, block_kv=block_kv, dynamic=False
        )
    if config.attn_implementation == "flash_grouped":
        # kernel-native grouped IO: the projection einsums emit/consume the
        # kernel layout so no transpose epilogues run per layer. Component
        # timings favored it, but the r4 STEP-level chip measurement
        # rejected it as the default: 371.7 ms/step vs 344.4 ms for the
        # dynamic bthd entry at the bench shape (B1 T8192, 535M) — the 5-D
        # grouped einsum layouts cost XLA more than the epilogues it was
        # already fusing. Kept as an opt-in for shapes where it may win.
        from touchnet_tpu.ops.attention import flash_attention_grouped

        fn = lambda q, k, v, seg: flash_attention_grouped(  # noqa: E731
            q, k, v, seg, block_q=block_q, block_kv=block_kv
        )
        fn.layout = "grouped"
        return fn
    # "flash" (default): dynamic-trip bthd kernels — fastest measured train
    # path (r4 chip sweep: 344.4 ms vs 347.7 static vs 371.7 grouped)
    return lambda q, k, v, seg: flash_attention(
        q, k, v, seg, block_q=block_q, block_kv=block_kv, dynamic=True
    )


def decoder_layer(
    h: jax.Array,
    lp: dict,
    *,
    cos_sin_posids: jax.Array,
    segment_ids: Optional[jax.Array],
    config: LlamaConfig,
    attn_fn: Callable,
    inv_freq: jax.Array,
    shard_fn: Callable,
) -> jax.Array:
    """One pre-norm transformer block. h [B, T, E]."""
    B, T, E = h.shape
    H = config.num_attention_heads
    Hkv = config.num_key_value_heads
    Dh = config.head_dim

    normed = rms_norm(h, lp["input_layernorm"]["weight"], config.rms_norm_eps)
    sa = lp["self_attn"]
    if getattr(attn_fn, "layout", "bthd") == "grouped":
        # kernel-native IO: the projections emit [B,Hkv,G,T,D]/[B,Hkv,S,D]
        # directly (the grouping transpose folds into the matmul output
        # layout — measured free on v5e) and the o-projection contracts the
        # grouped output without an ungroup copy (ops/attention.py grouped
        # entry rationale)
        G = H // Hkv
        wq = sa["q_proj"]["weight"].reshape(Hkv, G, Dh, E)
        q = jnp.einsum(
            "btm,hgdm->bhgtd", normed, wq,
            preferred_element_type=normed.dtype,
        )
        if sa["q_proj"].get("bias") is not None:
            q = q + sa["q_proj"]["bias"].reshape(Hkv, G, Dh).astype(q.dtype)[
                None, :, :, None, :
            ]
        wk = sa["k_proj"]["weight"].reshape(Hkv, Dh, E)
        wv = sa["v_proj"]["weight"].reshape(Hkv, Dh, E)
        k = jnp.einsum(
            "btm,hdm->bhtd", normed, wk,
            preferred_element_type=normed.dtype,
        )
        v = jnp.einsum(
            "btm,hdm->bhtd", normed, wv,
            preferred_element_type=normed.dtype,
        )
        if sa["k_proj"].get("bias") is not None:
            k = k + sa["k_proj"]["bias"].reshape(Hkv, Dh).astype(k.dtype)[
                None, :, None, :
            ]
        if sa["v_proj"].get("bias") is not None:
            v = v + sa["v_proj"]["bias"].reshape(Hkv, Dh).astype(v.dtype)[
                None, :, None, :
            ]
        q, k = apply_rope_grouped(q, k, cos_sin_posids, inv_freq)
        attn = attn_fn(q, k, v, segment_ids)
        wo = sa["o_proj"]["weight"].reshape(E, Hkv, G, Dh)
        proj = jnp.einsum(
            "bhgtd,mhgd->btm", attn, wo,
            preferred_element_type=attn.dtype,
        )
        h = h + shard_fn(proj, "btd")
    else:
        # checkpoint_name tags mark the matmul outputs for the named "op"
        # remat policy (_apply_remat): the save set is exactly what
        # dots_with_no_batch_dims_saveable would pick in this body, but the
        # name-based policy compiles where the dots-based one crashes the
        # AOT compile helper at T >= 16k
        q = checkpoint_name(
            linear(normed, sa["q_proj"]["weight"], sa["q_proj"].get("bias")),
            "dot_q",
        ).reshape(B, T, H, Dh)
        k = checkpoint_name(
            linear(normed, sa["k_proj"]["weight"], sa["k_proj"].get("bias")),
            "dot_k",
        ).reshape(B, T, Hkv, Dh)
        v = checkpoint_name(
            linear(normed, sa["v_proj"]["weight"], sa["v_proj"].get("bias")),
            "dot_v",
        ).reshape(B, T, Hkv, Dh)
        q, k = apply_rope(q, k, cos_sin_posids, inv_freq)
        attn = attn_fn(q, k, v, segment_ids)
        h = h + shard_fn(
            checkpoint_name(
                linear(attn.reshape(B, T, H * Dh), sa["o_proj"]["weight"]),
                "dot_o",
            ),
            "btd",
        )
    normed = rms_norm(h, lp["post_attention_layernorm"]["weight"], config.rms_norm_eps)
    g = checkpoint_name(linear(normed, lp["mlp"]["gate_proj"]["weight"]), "dot_gate")
    u = checkpoint_name(linear(normed, lp["mlp"]["up_proj"]["weight"]), "dot_up")
    mlp_out = checkpoint_name(
        linear(jax.nn.silu(g) * u, lp["mlp"]["down_proj"]["weight"]), "dot_down"
    )
    return h + shard_fn(mlp_out, "btd")


def forward(
    params: dict,
    *,
    input_ids: Optional[jax.Array] = None,
    inputs_embeds: Optional[jax.Array] = None,
    segment_ids: Optional[jax.Array] = None,
    position_ids: Optional[jax.Array] = None,
    config: LlamaConfig,
    compute_dtype=jnp.bfloat16,
    attn_fn: Optional[Callable] = None,
    remat_mode: str = "none",  # none | full | selective | op
    selective_ac_option: str = "op",  # 'op' | int k (every k-th layer)
    block_q: int = 512,
    block_kv: int = 512,
    shard_fn: Optional[Callable] = None,
    return_hidden: bool = False,
) -> jax.Array:
    """Run the decoder; returns logits [B, T, V] (or final hidden when
    return_hidden). position_ids restart per packed sentence; segment_ids is
    the packed-document mask (attention_mask in the batch contract)."""
    shard = shard_fn if shard_fn is not None else (lambda x, kind: x)
    mp = params["model"]
    if inputs_embeds is None:
        inputs_embeds = jnp.take(
            shard(mp["embed_tokens"]["weight"], "embed_table"),
            input_ids, axis=0,
        )
    h = shard(inputs_embeds.astype(compute_dtype), "btd")
    B, T, _ = h.shape
    if position_ids is None:
        position_ids = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    inv_freq = rope_frequencies(config.head_dim, config.rope_theta,
                                rope_scaling=config.rope_scaling)

    attn = attn_fn if attn_fn is not None else _default_attn(config, block_q, block_kv)

    layer = functools.partial(
        decoder_layer,
        cos_sin_posids=position_ids,
        segment_ids=segment_ids,
        config=config,
        attn_fn=attn,
        inv_freq=inv_freq,
        shard_fn=shard,
    )

    def body(carry, lp):
        lp = jax.tree.map(lambda x: x.astype(compute_dtype), lp)
        return layer(carry, lp), None

    h = scan_layers(body, h, mp["layers"], remat_mode, selective_ac_option)
    h = rms_norm(h, mp["norm"]["weight"].astype(compute_dtype), config.rms_norm_eps)
    if return_hidden:
        return h
    head_w = (
        mp["embed_tokens"]["weight"]
        if config.tie_word_embeddings
        else params["lm_head"]["weight"]
    )
    logits = linear(h, head_w.astype(compute_dtype))
    return shard(logits, "btv")


def get_num_params(config: LlamaConfig, exclude_embedding: bool = False) -> int:
    E, L = config.hidden_size, config.num_hidden_layers
    H, Hkv, Dh = (
        config.num_attention_heads,
        config.num_key_value_heads,
        config.head_dim,
    )
    inter, V = config.intermediate_size, config.vocab_size
    per_layer = (
        2 * E  # norms
        + (H * Dh + 2 * Hkv * Dh) * E + E * H * Dh  # attention
        + 3 * inter * E  # mlp
    )
    if config.attention_bias:
        per_layer += H * Dh + 2 * Hkv * Dh
    n = V * E + L * per_layer + E
    if not config.tie_word_embeddings:
        n += V * E
    if exclude_embedding:
        n -= V * E
    return n


def get_num_flop_per_token(num_params: int, config: LlamaConfig, seq_len: int) -> float:
    """6N + 12*l*h*q*t (reference touchnet/models/llama/__init__.py:39-54)."""
    return 6 * num_params + 12 * config.num_hidden_layers * (
        config.num_attention_heads * config.head_dim
    ) * seq_len
