# Benchmark: packed-sequence Llama pretrain step on one real TPU chip.
#
# Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
# Metric = model FLOPS utilization (MFU, %) of a full training step
# (fwd+bwd+AdamW) on a ~1B-param Llama with packed 8192-token sequences —
# sized to one chip; the reference headline text-pretrain config (BASELINE.md: Llama-3.2-1B,
# packed 1x16384 on A100-class GPUs; no MFU number published).
# vs_baseline divides by 40% — a strong A100 MFU for this workload class —
# per BASELINE.json's ">=1.2x A100-equivalent MFU" north star.

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/touchnet_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_MFU = 40.0


def build(config_kw, batch, seqlen):
    import optax

    from touchnet_tpu.loss import cross_entropy_loss
    from touchnet_tpu.models.llama.configuration_llama import LlamaConfig
    from touchnet_tpu.models.llama.modeling_llama import (
        forward,
        get_num_flop_per_token,
        get_num_params,
        init_params,
    )

    config = LlamaConfig(**config_kw)
    params = jax.jit(lambda k: init_params(config, k))(jax.random.PRNGKey(0))
    tx = optax.adamw(3e-4, b1=0.9, b2=0.95, weight_decay=0.1)
    opt_state = jax.jit(tx.init)(params)

    rng = np.random.default_rng(0)
    ids = rng.integers(3, config.vocab_size, (batch, seqlen), dtype=np.int32)
    seg = np.ones((batch, seqlen), np.int32)
    seg[:, seqlen // 2:] = 2
    pos = np.where(seg == 2, np.arange(seqlen, dtype=np.int32) - seqlen // 2,
                   np.arange(seqlen, dtype=np.int32)).astype(np.int32)
    labels = np.roll(ids, -1, 1).astype(np.int32)
    slens = np.full((batch, seqlen), seqlen // 2, np.int32)
    db = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "position_ids": jnp.asarray(pos),
        "attention_mask": jnp.asarray(seg),
        "sentence_lens": jnp.asarray(slens),
    }
    num_sentence = jnp.asarray(2.0 * batch, jnp.float32)

    def loss_fn(p, b):
        logits = forward(
            p,
            input_ids=b["input_ids"],
            segment_ids=b["attention_mask"],
            position_ids=b["position_ids"],
            config=config,
            remat_mode="selective",
            block_q=1024,
            block_kv=1024,
        )
        loss, _ = cross_entropy_loss(
            logits, b["labels"], b["sentence_lens"], num_sentence
        )
        return loss

    @jax.jit
    def step(p, s, b):
        loss, grads = jax.value_and_grad(loss_fn)(p, b)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    nparams = get_num_params(config)
    # MFU uses the embedding-free count (reference convention,
    # touchnet/bin/train.py:190-196)
    fpt = get_num_flop_per_token(
        get_num_params(config, exclude_embedding=True), config, seqlen
    )
    return step, params, opt_state, db, nparams, fpt


def main():
    from touchnet_tpu.utils.metrics import get_peak_flops

    batch, seqlen = 1, 8192
    # ~0.5B: the largest that fits one 16-GiB v5e chip with fp32 master
    # params + fp32 Adam moments and packed-8k activations under full remat
    config_kw = dict(
        vocab_size=32768,
        hidden_size=1536,
        intermediate_size=6144,
        num_hidden_layers=14,
        num_attention_heads=24,
        num_key_value_heads=8,
        tie_word_embeddings=True,
        attn_implementation="flash" if jax.default_backend() == "tpu" else "eager",
    )
    step, params, opt_state, batch_arrays, nparams, fpt = build(
        config_kw, batch, seqlen
    )
    # compile + warmup
    params, opt_state, loss = step(params, opt_state, batch_arrays)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, batch_arrays)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / iters

    tokens_per_sec = batch * seqlen / dt
    peak = get_peak_flops()
    mfu = 100.0 * fpt * tokens_per_sec / peak
    result = {
        "metric": "mfu_llama500m_packed8k_1chip",
        "value": round(mfu, 2),
        "unit": "%",
        "vs_baseline": round(mfu / BASELINE_MFU, 3),
        "detail": {
            "tokens_per_sec_per_chip": round(tokens_per_sec, 1),
            "step_time_s": round(dt, 4),
            "params_m": round(nparams / 1e6, 1),
            "flop_per_token_g": round(fpt / 1e9, 2),
            "device": jax.devices()[0].device_kind,
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
