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
# (dynamic-trip kernels), the chunked fused linear+cross-entropy
# (parallel/loss_parallel.py), and the per-seqlen best remat policy:
# packed-8k fits the "op" policy (save dot outputs AND flash residuals —
# backward recomputes only elementwise chains; measured +4.7pp MFU over
# "selective" on v5e), packed-32k needs "selective" (save flash residuals
# only) to fit 16 GiB.
#
# detail adds the audio story (the reference's raison d'être):
# touch_audio packed audio-NTP MFU, the whisper-large tower step, and the
# native-frontend loader headroom vs the chip's token consumption.

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


def build(config, batch, seqlen, remat_mode="selective", ac_option="op"):
    from touchnet_tpu.models.llama import head_weight
    from touchnet_tpu.models.llama.modeling_llama import forward, init_params
    from touchnet_tpu.ops.fused_adamw import fused_adamw_step
    from touchnet_tpu.parallel.loss_parallel import fused_linear_cross_entropy

    params = jax.jit(lambda k: init_params(config, k))(jax.random.PRNGKey(0))
    # (mu, nu, count) — the same leaves optax.adamw keeps; the fused
    # single-pass kernel is the trainer's optimizer_impl="fused" default
    opt_state = jax.jit(
        lambda p: (
            jax.tree.map(jnp.zeros_like, p),
            jax.tree.map(jnp.zeros_like, p),
            jnp.zeros((), jnp.int32),
        )
    )(params)
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
            selective_ac_option=ac_option,
            block_q=512,
            block_kv=512,
            return_hidden=True,
        )
        loss, _, _ = fused_linear_cross_entropy(
            hidden, head_weight(p, config), b["labels"], b["sentence_lens"],
            num_sentence, chunk_size=CE_CHUNK,
        )
        return loss

    def _step(p, s, b):
        loss, grads = jax.value_and_grad(loss_fn)(p, b)
        mu, nu, count = s
        p, mu, nu, count = fused_adamw_step(
            grads, p, mu, nu, count, lr=jnp.asarray(3e-4, jnp.float32),
            b1=0.9, b2=0.95, eps=1e-8, weight_decay=0.1,
        )
        return p, (mu, nu, count), loss

    # donated params/opt state (the production trainer donates too):
    # updates alias their input buffers instead of double-allocating
    step = jax.jit(_step, donate_argnums=(0, 1))
    return step, params, opt_state, db


def timed_mfu(config, batch, seqlen, iters, remat_mode="selective", ac_option="op"):
    from touchnet_tpu.models.llama.modeling_llama import (
        get_num_flop_per_token,
        get_num_params,
    )
    from touchnet_tpu.utils.metrics import get_peak_flops

    step, params, opt_state, db = build(config, batch, seqlen, remat_mode, ac_option)
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


def timed_audio_mfu(text_config, batch, seqlen, iters, remat_mode="selective"):
    """TouchAudio (fbank->projector->backbone) packed audio-NTP step — the
    reference's raison d'être is audio training (docs/audio_sft_asr.md);
    this measures the multimodal path end to end on the chip."""
    import optax

    from touchnet_tpu.models.touch_audio.configuration_touch_audio import (
        TouchAudioConfig, TouchAudioProjectorConfig,
    )
    from touchnet_tpu.models.touch_audio import modeling_touch_audio as mta
    from touchnet_tpu.parallel.loss_parallel import fused_linear_cross_entropy
    from touchnet_tpu.utils.metrics import get_peak_flops

    config = TouchAudioConfig(
        audio_config=TouchAudioProjectorConfig(input_size=560),
        text_config=text_config,
    )
    params = jax.jit(lambda k: mta.init_params(config, k))(jax.random.PRNGKey(0))
    tx = optax.adamw(3e-4, b1=0.9, b2=0.95, weight_decay=0.1)
    opt_state = jax.jit(tx.init)(params)
    db = make_batch(batch, seqlen, text_config.vocab_size)
    rng = np.random.default_rng(1)
    db["input_features"] = jnp.asarray(
        rng.standard_normal((batch, seqlen, 560), np.float32), jnp.bfloat16
    )
    num_sentence = jnp.asarray(2.0 * batch, jnp.float32)

    def loss_fn(p, b):
        hidden = mta.forward(
            p,
            input_ids=b["input_ids"],
            input_features=b["input_features"],
            segment_ids=b["attention_mask"],
            position_ids=b["position_ids"],
            config=config,
            remat_mode=remat_mode,
            return_hidden=True,
        )
        head_w = p["language_model"]["model"]["embed_tokens"]["weight"]
        loss, _, _ = fused_linear_cross_entropy(
            hidden, head_w, b["labels"], b["sentence_lens"], num_sentence,
            chunk_size=CE_CHUNK,
        )
        return loss

    def _step(p, s, b):
        loss, grads = jax.value_and_grad(loss_fn)(p, b)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    step = jax.jit(_step, donate_argnums=(0, 1))
    params, opt_state, loss = step(params, opt_state, db)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, db)
    float(loss)
    dt = (time.perf_counter() - t0) / iters
    del params, opt_state, db

    tokens_per_sec = batch * seqlen / dt
    fpt = mta.get_num_flop_per_token(
        mta.get_num_params(config, exclude_embedding=True), config, seqlen
    )
    mfu = 100.0 * fpt * tokens_per_sec / get_peak_flops()
    return {
        "mfu_pct": round(mfu, 2),
        "tokens_per_sec_per_chip": round(tokens_per_sec, 1),
        "step_time_s": round(dt, 4),
    }


def timed_whisper_mfu(iters):
    """Qwen2-Audio's whisper tower (d_model 1280 x 32 layers, the real
    Whisper-large-v3 encoder dims): fwd+bwd over a [B, 128, 3000] mel
    window — the audio-SFT step's second compute phase."""
    import optax

    from touchnet_tpu.models import whisper_encoder as we
    from touchnet_tpu.utils.metrics import get_peak_flops

    config = we.WhisperEncoderConfig()
    params = jax.jit(lambda k: we.init_params(config, k))(jax.random.PRNGKey(0))
    tx = optax.adamw(3e-4, b1=0.9, b2=0.95, weight_decay=0.1)
    opt_state = jax.jit(tx.init)(params)
    B, T_mel = 4, 3000
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, 128, T_mel), np.float32)
    )

    def loss_fn(p, f):
        # "op_small" saves the flash out/lse residuals plus the q/k/v/o
        # dots — measured r4 B=4 ladder: full 426.7 ms (32.5% MFU) ->
        # selective 391.4 (35.4%) -> op_small 373.6 (37.1%); op and
        # op_names are compile-time HBM OOM next to the fp32 Adam state
        h = we.forward(p, f, config, remat_mode="op_small")
        return jnp.mean(h.astype(jnp.float32) ** 2)

    def _step(p, s, f):
        loss, grads = jax.value_and_grad(loss_fn)(p, f)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    step = jax.jit(_step, donate_argnums=(0, 1))
    params, opt_state, loss = step(params, opt_state, feats)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, feats)
    float(loss)
    dt = (time.perf_counter() - t0) / iters
    del params, opt_state

    T_pos = T_mel // 2  # conv2 stride-2
    n = we.get_num_params(config)
    # 6N per position (fwd 2N + bwd 4N) + 12*L*D*T attention flops
    fpt = 6 * n + 12 * config.encoder_layers * config.d_model * T_pos
    mfu = 100.0 * fpt * (B * T_pos / dt) / get_peak_flops()
    return {
        "mfu_pct": round(mfu, 2),
        "positions_per_sec": round(B * T_pos / dt, 1),
        "step_time_s": round(dt, 4),
        "params_m": round(n / 1e6, 1),
    }


def timed_decode_step(batch=32, context=7680, iters=40):
    """Marginal KV-cache decode step at ragged long context: the rank-5
    zero-copy cache path + ragged flash-decode kernel (r4; the r3 state
    paid a ~2.1 GB/layer/step cache extract). Timing: iters chained
    donated steps, ONE host read (a float() read costs a ~31 ms round
    trip through the tunnel and block_until_ready can return early)."""
    from touchnet_tpu.models.llama.configuration_llama import LlamaConfig
    from touchnet_tpu.models.llama import inference_llama as inf
    from touchnet_tpu.models.llama.modeling_llama import init_params

    config = LlamaConfig(
        vocab_size=32768, hidden_size=1536, intermediate_size=6144,
        num_hidden_layers=14, num_attention_heads=24, num_key_value_heads=8,
        tie_word_embeddings=True, attn_implementation="flash",
    )
    B, Tp, E = batch, context, config.hidden_size
    rng = np.random.default_rng(0)
    prompt_len = jnp.asarray(rng.integers(Tp // 4, Tp, size=(B,)), jnp.int32)
    params = jax.jit(lambda k: init_params(config, k))(jax.random.PRNGKey(0))
    ids = jnp.asarray(rng.integers(3, config.vocab_size, (B, Tp)), jnp.int32)
    embeds = jax.jit(
        lambda p, i: jnp.take(p["model"]["embed_tokens"]["weight"], i, axis=0)
        .astype(jnp.bfloat16)
    )(params, ids)
    C = 1024
    max_len = Tp + 512

    @jax.jit
    def build_cache(p, pe):
        cache = inf.init_cache(config, B, max_len, jnp.bfloat16)

        def chunk_body(i, kv):
            off = i * C
            emb = jax.lax.dynamic_slice(pe, (0, off, 0), (B, C, E))
            _, nc = inf.forward_step(
                p, emb, inf.KVCache(kv), jnp.full((B,), off, jnp.int32),
                config, write_pos=off, prefill_ctx=off,
                logits_indices=jnp.zeros((B,), jnp.int32),
            )
            return nc.kv

        return jax.lax.fori_loop(0, Tp // C, chunk_body, cache.kv)

    kv = build_cache(params, embeds)
    del embeds
    emb1 = jnp.zeros((B, 1, E), jnp.bfloat16)

    # run the steps inside ONE program: a host dispatch through the tunnel
    # costs ~13 ms, which would dominate a ~10 ms step if driven from a
    # python loop (the production decode loop is a lax.while_loop anyway)
    def k_steps(p, e, c, pl, k):
        def body(i, kv):
            _, nc = inf.forward_step(
                p, e, inf.KVCache(kv), pl + 3, config,
                write_pos=Tp + 3, decode_valid=(pl, Tp, Tp + 3),
            )
            return nc.kv
        return jax.lax.fori_loop(0, k, body, c)

    # traced k -> ONE compile serves the warmup and the timed run
    steps = jax.jit(k_steps, donate_argnums=(2,))
    kv = steps(params, emb1, kv, prompt_len, jnp.asarray(1, jnp.int32))
    float(kv[0, 0, 0, 0, 0].astype(jnp.float32))
    # median of >= 5 trials (r5, review item): the old single-trial arm's
    # 9.55 ms headline was a best-observed value while repeated bench runs
    # measured 10.1-10.5 — the spread is cross-invocation chip/tunnel state
    # (the train-step arm shows the same +-1-2% across sessions), not
    # anything inside the decode program; intra-process trials are stable.
    trials = []
    for _ in range(5):
        t0 = time.perf_counter()
        kv = steps(params, emb1, kv, prompt_len, jnp.asarray(iters, jnp.int32))
        float(kv[0, 0, 0, 0, 0].astype(jnp.float32))
        trials.append((time.perf_counter() - t0) / iters)
    del kv, params
    trials.sort()
    dt = trials[len(trials) // 2]
    spread = (trials[-1] - trials[0]) / dt
    return {
        "decode_step_ms": round(dt * 1000, 2),
        "decode_step_ms_min": round(trials[0] * 1000, 2),
        "decode_step_ms_max": round(trials[-1] * 1000, 2),
        "trials": len(trials),
        "spread_pct": round(100 * spread, 1),
        "batch_tokens_per_sec": round(B / dt, 1),
        "batch": B,
        "context": Tp,
    }


# module-level fixtures so ProcessPoolExecutor (fork) workers can run the
# utt functions without pickling closures
_LOADER_WAV = None
_LOADER_CFG = None


def _fbank_utt(_):
    """fbank-80 + 7/6 LFR stack (touch_audio pretrain frontend)."""
    from touchnet_tpu.data.functions import audiofeat_stack
    from touchnet_tpu.data.native import fbank_native

    feat = fbank_native(_LOADER_WAV, 80, 25, 10, 0.0, 16000)
    stacked = next(audiofeat_stack(
        iter([{"audiofeat": feat, "key": "k"}]), _LOADER_CFG
    ))["audiofeat"]
    return stacked.shape[0]


def _logmel_utt(_):
    """whisper 128-mel log-mel (qwen2/kimi SFT frontend, data/dsp.py:334 /
    native logmel). The SFT datapipe also tokenizes the transcript, but a
    ~20-token text costs microseconds next to the 10 s log-mel — the
    frontend IS the loader cost at this shape."""
    from touchnet_tpu.data.native import logmel_native

    feat = logmel_native(_LOADER_WAV / 32768.0, 16000, 400, 160, 128)
    return feat.shape[0]


def _loader_sweep(fn, workers, n_utts, mode):
    from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor

    t0 = time.perf_counter()
    if workers == 1:
        units = sum(fn(i) for i in range(n_utts))
    elif mode == "processes":
        with ProcessPoolExecutor(workers) as ex:  # fork: globals inherited
            units = sum(ex.map(fn, range(n_utts)))
    else:
        with ThreadPoolExecutor(workers) as ex:
            units = sum(ex.map(fn, range(n_utts)))
    return units / (time.perf_counter() - t0)


def loader_headroom(model_tok_s, whisper_positions_s=None):
    """Native-frontend feeding rate vs the chip's consumption rate, for BOTH
    production frontends: fbank-80 + LFR (touch_audio pretrain; units =
    stacked audio tokens) and whisper 128-mel log-mel (qwen2/kimi SFT —
    the heaviest consumer; units = mel frames). MEASURED at workers =
    1/2/4 in thread mode (ctypes releases the GIL) plus a process-pool
    point (for hosts where the GIL or allocator contends); the 24-core
    projection applies the measured per-worker efficiency at this host's
    core count, never an assumption."""
    global _LOADER_WAV, _LOADER_CFG
    from touchnet_tpu.data import DataConfig
    from touchnet_tpu.data.native import (
        fbank_native, logmel_native, native_available,
    )

    if not native_available():
        return {"available": False}
    rng = np.random.default_rng(0)
    utt_s = 10.0
    _LOADER_WAV = (rng.standard_normal(int(16000 * utt_s)) * 3000).astype(
        np.float32
    )
    _LOADER_CFG = DataConfig(
        audiofeat_num_mel_bins=80, audiofeat_stack_length=7,
        audiofeat_stride_length=6,
    )
    fbank_native(_LOADER_WAV, 80, 25, 10, 0.0, 16000)  # warm ctypes
    logmel_native(_LOADER_WAV / 32768.0, 16000, 400, 160, 128)
    cores = os.cpu_count() or 1

    def curve(fn):
        # best-of-3 per point: the measurement shares this host's core(s)
        # with the jax runtime; a contended trial understates the loader
        threads = {
            w: round(max(
                _loader_sweep(fn, w, 20 * min(w, cores), "threads")
                for _ in range(3)
            ), 1)
            for w in (1, 2, 4)
        }
        procs = round(max(
            _loader_sweep(fn, min(4, max(2, cores)), 20 * min(4, cores),
                          "processes")
            for _ in range(2)
        ), 1)
        u1 = threads[1]
        w_eff = min(4, cores)
        eff = (
            min(1.0, threads[w_eff] / (w_eff * u1)) if w_eff > 1 else 1.0
        )
        return threads, procs, u1, eff

    fb_threads, fb_procs, fb1, fb_eff = curve(_fbank_utt)
    lm_threads, lm_procs, lm1, lm_eff = curve(_logmel_utt)

    # chip-side consumption: touch_audio consumes stacked tokens at the
    # packed-8k rate; the qwen2/kimi SFT step consumes mel frames at
    # 2x the whisper tower's positions/s (the conv stem halves time)
    out = {
        "available": True,
        "host_cores": cores,
        "fbank80_lfr": {
            "units": "stacked audio tokens/s",
            "by_workers_threads": fb_threads,
            "process_pool_at_4": fb_procs,
            "scaling_efficiency_at_cores": round(fb_eff, 3),
            "rtf_1worker": round(fb1 / (16000 / 160 / 6), 1),
            "headroom_x_measured": round(
                max(max(fb_threads.values()), fb_procs) / model_tok_s, 2
            ),
            "headroom_x_24core_projected": round(
                fb1 * 24 * fb_eff / model_tok_s, 2
            ),
        },
        "logmel128_sft": {
            "units": "mel frames/s",
            "by_workers_threads": lm_threads,
            "process_pool_at_4": lm_procs,
            "scaling_efficiency_at_cores": round(lm_eff, 3),
            "rtf_1worker": round(lm1 / (16000 / 160), 1),
        },
    }
    if whisper_positions_s:
        need = 2.0 * whisper_positions_s  # mel frames consumed per second
        out["logmel128_sft"]["headroom_x_measured"] = round(
            max(max(lm_threads.values()), lm_procs) / need, 2
        )
        out["logmel128_sft"]["headroom_x_24core_projected"] = round(
            lm1 * 24 * lm_eff / need, 2
        )
    return out


def acquire_backend(attempts=5, base_delay_s=10.0):
    """Initialize the JAX backend with retry-with-backoff.

    A transient tunnel outage at backend init zeroed round 3's entire bench
    record (BENCH_r03.json rc=1: "TPU backend setup/compile error
    (Unavailable)" raised from jax.default_backend() before any fallback
    could run). Retry ~5 times over ~3 minutes; on final failure return
    None so main() can emit the standard JSON artifact with value=null and
    an error field instead of a traceback.
    """
    last_err = None
    for i in range(attempts):
        try:
            backend = jax.default_backend()
            jax.devices()
            return backend
        except Exception as e:  # noqa: BLE001 — any init error is retryable
            last_err = e
            if i < attempts - 1:
                time.sleep(base_delay_s * (1.5 ** i))
    return last_err


def main():
    from touchnet_tpu.models.llama.configuration_llama import LlamaConfig

    backend = acquire_backend()
    if not isinstance(backend, str):
        # Backend never came up: emit a parseable artifact, not a traceback.
        print(json.dumps({
            "metric": "mfu_llama500m_packed8k_1chip",
            "value": None,
            "unit": "%",
            "vs_baseline": None,
            "error": f"backend init failed after retries: "
                     f"{type(backend).__name__}: {backend}"[:300],
        }))
        return

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
        attn_implementation="flash" if backend == "tpu" else "eager",
    )
    try:
        try:
            r8k = timed_mfu(config, batch=1, seqlen=8192, iters=10,
                            remat_mode="op")
        except Exception as e:  # noqa: BLE001
            # the primary metric must never sink: if the grouped-IO flash path
            # (attn_implementation="flash") fails on this chip/runtime, fall
            # back to the bthd static-grid kernels and SAY SO in the output
            import dataclasses

            config = dataclasses.replace(
                config, attn_implementation="flash_static"
            )
            r8k = timed_mfu(config, batch=1, seqlen=8192, iters=10,
                            remat_mode="op")
            r8k["attn_fallback"] = f"flash_static ({type(e).__name__}: {e})"[:200]
    except Exception as e:  # noqa: BLE001 — a mid-run outage must still
        # leave the driver a parseable artifact, not a traceback
        print(json.dumps({
            "metric": "mfu_llama500m_packed8k_1chip",
            "value": None,
            "unit": "%",
            "vs_baseline": None,
            "error": f"{type(e).__name__}: {e}"[:300],
        }))
        return

    def secondary(fn, *args, **kw):
        try:
            return fn(*args, **kw)
        except Exception as e:  # noqa: BLE001 — never sink the primary metric
            return {"mfu_pct": None, "error": f"{type(e).__name__}: {e}"[:200]}

    r32k = secondary(
        timed_mfu, config, batch=1, seqlen=32768, iters=5,
        remat_mode="selective",
    )
    raudio = secondary(
        timed_audio_mfu, config, batch=1, seqlen=8192, iters=10,
        remat_mode="op",
    )
    rwhisper = secondary(timed_whisper_mfu, iters=10)
    rdecode = secondary(timed_decode_step)
    rloader = secondary(
        loader_headroom,
        raudio.get("tokens_per_sec_per_chip") or r8k["tokens_per_sec_per_chip"],
        whisper_positions_s=rwhisper.get("positions_per_sec"),
    )

    result = {
        "metric": "mfu_llama500m_packed8k_1chip",
        "value": r8k["mfu_pct"],
        "unit": "%",
        "vs_baseline": round(r8k["mfu_pct"] / BASELINE_MFU, 3),
        "detail": {
            **{k: v for k, v in r8k.items() if k != "mfu_pct"},
            "device": jax.devices()[0].device_kind,
            "backend": backend,
            "packed32k": {
                "metric": "mfu_llama500m_packed32k_1chip",
                "value": r32k["mfu_pct"],
                "unit": "%",
                **{k: v for k, v in r32k.items() if k != "mfu_pct"},
            },
            "audio_packed8k": {
                "metric": "mfu_touchaudio500m_packed8k_1chip",
                "value": raudio.get("mfu_pct"),
                "unit": "%",
                **{k: v for k, v in raudio.items() if k != "mfu_pct"},
            },
            "whisper_tower": {
                "metric": "mfu_whisper_large_encoder_1chip",
                "value": rwhisper.get("mfu_pct"),
                "unit": "%",
                **{k: v for k, v in rwhisper.items() if k != "mfu_pct"},
            },
            "decode": {
                "metric": "decode_step_ms_b32_ctx8k",
                "value": rdecode.get("decode_step_ms"),
                "unit": "ms",
                **{k: v for k, v in rdecode.items()
                   if k != "decode_step_ms"},
            },
            "loader": rloader,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
