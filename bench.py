# Benchmark: packed-sequence Llama pretrain step on one real TPU chip.
#
# Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
# Metric = model FLOPS utilization (MFU, %) of a full training step
# (fwd+bwd+AdamW) on a ~0.5B-param Llama with packed 8192-token sequences —
# sized to one chip; the reference headline text-pretrain config (BASELINE.md:
# Llama-3.2-1B, packed 1x16384 on A100-class GPUs; no MFU number published).
# vs_baseline divides by 40% — a strong A100 MFU for this workload class —
# per BASELINE.json's ">=1.2x A100-equivalent MFU" north star.
# detail.packed32k reports the same model at packed-32k (BASELINE.md's
# long-context target); the fused linear+CE path is what makes 32k fit at
# all — the full [B, T, V] fp32 logits tensor OOMs a 16 GiB chip.
#
# Both steps use the production training path: Pallas packed flash attention
# (dynamic-trip kernels), selective remat saving flash residuals, and the
# chunked fused linear+cross-entropy (parallel/loss_parallel.py).

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/touchnet_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_MFU = 40.0
CE_CHUNK = 1024


def make_batch(batch, seqlen, vocab):
    rng = np.random.default_rng(0)
    ids = rng.integers(3, vocab, (batch, seqlen), dtype=np.int32)
    seg = np.ones((batch, seqlen), np.int32)
    seg[:, seqlen // 2:] = 2  # two packed documents per row
    pos = np.where(seg == 2, np.arange(seqlen, dtype=np.int32) - seqlen // 2,
                   np.arange(seqlen, dtype=np.int32)).astype(np.int32)
    labels = np.roll(ids, -1, 1).astype(np.int32)
    slens = np.full((batch, seqlen), seqlen // 2, np.int32)
    return {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "position_ids": jnp.asarray(pos),
        "attention_mask": jnp.asarray(seg),
        "sentence_lens": jnp.asarray(slens),
    }


def build(config, batch, seqlen, remat_mode="selective"):
    import optax

    from touchnet_tpu.models.llama import head_weight
    from touchnet_tpu.models.llama.modeling_llama import forward, init_params
    from touchnet_tpu.parallel.loss_parallel import fused_linear_cross_entropy

    params = jax.jit(lambda k: init_params(config, k))(jax.random.PRNGKey(0))
    tx = optax.adamw(3e-4, b1=0.9, b2=0.95, weight_decay=0.1)
    opt_state = jax.jit(tx.init)(params)
    db = make_batch(batch, seqlen, config.vocab_size)
    num_sentence = jnp.asarray(2.0 * batch, jnp.float32)

    def loss_fn(p, b):
        hidden = forward(
            p,
            input_ids=b["input_ids"],
            segment_ids=b["attention_mask"],
            position_ids=b["position_ids"],
            config=config,
            remat_mode=remat_mode,
            block_q=1024,
            block_kv=1024,
            return_hidden=True,
        )
        loss, _, _ = fused_linear_cross_entropy(
            hidden, head_weight(p, config), b["labels"], b["sentence_lens"],
            num_sentence, chunk_size=CE_CHUNK,
        )
        return loss

    def _step(p, s, b):
        loss, grads = jax.value_and_grad(loss_fn)(p, b)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    # donated params/opt state (the production trainer donates too):
    # updates alias their input buffers instead of double-allocating
    step = jax.jit(_step, donate_argnums=(0, 1))
    return step, params, opt_state, db


def timed_mfu(config, batch, seqlen, iters, remat_mode="selective"):
    from touchnet_tpu.models.llama.modeling_llama import (
        get_num_flop_per_token,
        get_num_params,
    )
    from touchnet_tpu.utils.metrics import get_peak_flops

    step, params, opt_state, db = build(config, batch, seqlen, remat_mode)
    params, opt_state, loss = step(params, opt_state, db)  # compile + warmup
    float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, db)
    # value readback, not block_until_ready: on the tunneled backend the
    # latter can return before while_loop-heavy programs finish; a host
    # read of the final loss provably syncs the whole chained sequence
    float(loss)
    dt = (time.perf_counter() - t0) / iters
    del params, opt_state, db

    tokens_per_sec = batch * seqlen / dt
    # MFU uses the embedding-free param count (reference convention,
    # touchnet/bin/train.py:190-196)
    fpt = get_num_flop_per_token(
        get_num_params(config, exclude_embedding=True), config, seqlen
    )
    mfu = 100.0 * fpt * tokens_per_sec / get_peak_flops()
    return {
        "mfu_pct": round(mfu, 2),
        "tokens_per_sec_per_chip": round(tokens_per_sec, 1),
        "step_time_s": round(dt, 4),
        "flop_per_token_g": round(fpt / 1e9, 2),
        "params_m": round(get_num_params(config) / 1e6, 1),
    }


def main():
    from touchnet_tpu.models.llama.configuration_llama import LlamaConfig

    # ~0.5B: the largest that fits one 16-GiB v5e chip with fp32 master
    # params + fp32 Adam moments and packed-8k activations
    config = LlamaConfig(
        vocab_size=32768,
        hidden_size=1536,
        intermediate_size=6144,
        num_hidden_layers=14,
        num_attention_heads=24,
        num_key_value_heads=8,
        tie_word_embeddings=True,
        attn_implementation="flash" if jax.default_backend() == "tpu" else "eager",
    )
    r8k = timed_mfu(config, batch=1, seqlen=8192, iters=10)
    try:
        r32k = timed_mfu(config, batch=1, seqlen=32768, iters=5)
    except Exception as e:  # noqa: BLE001 — never sink the primary metric
        r32k = {"mfu_pct": None, "error": f"{type(e).__name__}: {e}"[:200]}

    result = {
        "metric": "mfu_llama500m_packed8k_1chip",
        "value": r8k["mfu_pct"],
        "unit": "%",
        "vs_baseline": round(r8k["mfu_pct"] / BASELINE_MFU, 3),
        "detail": {
            **{k: v for k, v in r8k.items() if k != "mfu_pct"},
            "device": jax.devices()[0].device_kind,
            "backend": jax.default_backend(),
            "packed32k": {
                "metric": "mfu_llama500m_packed32k_1chip",
                "value": r32k["mfu_pct"],
                "unit": "%",
                **{k: v for k, v in r32k.items() if k != "mfu_pct"},
            },
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
