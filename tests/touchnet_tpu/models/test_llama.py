# Llama parity and sharding tests.
# Golden: HF transformers LlamaForCausalLM (torch CPU) with identical weights
# must produce the same logits as our functional JAX model — the analog of
# the reference's single-process-golden vs parallelized-model test
# (tests/touchnet/models/test_llama.py:85-150). Then the SAME logits must
# come out of every mesh layout on the virtual 8-device CPU mesh.

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from touchnet_tpu.models.llama.configuration_llama import LlamaConfig
from touchnet_tpu.models.llama.modeling_llama import forward, get_num_params, init_params

CFG_PATH = os.path.join(
    os.path.dirname(__file__), "..", "..", "assets", "config", "tiny_llama.json"
)


@pytest.fixture(scope="module")
def tiny():
    config = LlamaConfig.from_json_file(CFG_PATH)
    params = init_params(config, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 96), 0, config.vocab_size)
    return config, params, ids


def _to_hf_state_dict(params, config):
    import torch

    sd = {}
    mp = params["model"]
    sd["model.embed_tokens.weight"] = mp["embed_tokens"]["weight"]
    for l in range(config.num_hidden_layers):
        pre = f"model.layers.{l}"
        lp = mp["layers"]
        sd[f"{pre}.input_layernorm.weight"] = lp["input_layernorm"]["weight"][l]
        sd[f"{pre}.post_attention_layernorm.weight"] = lp["post_attention_layernorm"][
            "weight"
        ][l]
        for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
            sd[f"{pre}.self_attn.{name}.weight"] = lp["self_attn"][name]["weight"][l]
        for name in ("gate_proj", "up_proj", "down_proj"):
            sd[f"{pre}.mlp.{name}.weight"] = lp["mlp"][name]["weight"][l]
    sd["model.norm.weight"] = mp["norm"]["weight"]
    sd["lm_head.weight"] = params["lm_head"]["weight"]
    return {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}


def test_logits_match_hf_transformers(tiny):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    config, params, ids = tiny

    hf_cfg = transformers.LlamaConfig(
        vocab_size=config.vocab_size,
        hidden_size=config.hidden_size,
        intermediate_size=config.intermediate_size,
        num_hidden_layers=config.num_hidden_layers,
        num_attention_heads=config.num_attention_heads,
        num_key_value_heads=config.num_key_value_heads,
        max_position_embeddings=config.max_position_embeddings,
        rms_norm_eps=config.rms_norm_eps,
        rope_theta=config.rope_theta,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    model.load_state_dict(_to_hf_state_dict(params, config), strict=True)
    with torch.no_grad():
        want = model(torch.from_numpy(np.asarray(ids))).logits.numpy()

    got = forward(
        params, input_ids=ids, config=config, compute_dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4, rtol=3e-4)


def test_packed_equals_unpacked(tiny):
    """Two documents packed into one row with segment ids + restarting
    position ids must reproduce the logits of each document run separately —
    the correctness property behind pack training."""
    config, params, _ = tiny
    key = jax.random.PRNGKey(3)
    a = jax.random.randint(key, (1, 40), 0, config.vocab_size)
    b = jax.random.randint(jax.random.PRNGKey(4), (1, 24), 0, config.vocab_size)
    packed_ids = jnp.concatenate([a, b], axis=1)
    seg = jnp.concatenate(
        [jnp.full((1, 40), 1, jnp.int32), jnp.full((1, 24), 2, jnp.int32)], axis=1
    )
    pos = jnp.concatenate(
        [jnp.arange(40)[None], jnp.arange(24)[None]], axis=1
    )
    packed = forward(
        params, input_ids=packed_ids, segment_ids=seg, position_ids=pos,
        config=config, compute_dtype=jnp.float32,
    )
    la = forward(params, input_ids=a, config=config, compute_dtype=jnp.float32)
    lb = forward(params, input_ids=b, config=config, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(packed[:, :40]), np.asarray(la),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(packed[:, 40:]), np.asarray(lb),
                               atol=2e-5, rtol=2e-5)


def test_num_params_matches_tree(tiny):
    config, params, _ = tiny
    n = sum(x.size for x in jax.tree.leaves(params))
    assert n == get_num_params(config)


@pytest.mark.parametrize(
    "dims",
    [
        dict(dp_shard=8),
        dict(dp_shard=4, tp=2),
        dict(dp_shard=2, cp=2, tp=2),
        dict(dp_replicate=2, dp_shard=2, cp=2),
        dict(dp_shard=2, cp=4),
    ],
)
def test_sharded_forward_matches_golden(tiny, dims):
    """Every mesh layout must reproduce the single-device logits (reference
    test_llama.py parallel-correctness strategy, on the CPU mesh)."""
    from touchnet_tpu.parallel.context_parallel import make_sharded_attn_fn
    from touchnet_tpu.parallel.dims import ParallelDims
    from touchnet_tpu.parallel.sharding import make_shard_fn, named_shardings

    config, params, ids = tiny
    golden = forward(params, input_ids=ids, config=config, compute_dtype=jnp.float32)

    pd = ParallelDims(world_size=8, **{k: v for k, v in dims.items()})
    mesh = pd.build_mesh()
    shardings = named_shardings(params, mesh)
    sharded_params = jax.device_put(params, shardings)
    attn_fn = make_sharded_attn_fn(mesh)

    # T=96: pad to a cp-divisible, 128-lane-friendly length is not needed on
    # CPU fallback; cp shards 96 across cp degree (divisible for cp in 2,4)
    @jax.jit
    def run(p, i):
        return forward(
            p, input_ids=i, config=config, compute_dtype=jnp.float32,
            attn_fn=attn_fn, shard_fn=make_shard_fn(mesh),
        )

    with mesh:
        got = run(sharded_params, ids)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(golden), atol=2e-4, rtol=2e-4
    )


def test_llama3_rope_scaling_matches_hf():
    """rope_scaling type 'llama3' must reproduce transformers'
    _compute_llama3_parameters (the Llama-3.2 config family the reference
    trains, examples/text/pretrain/allenai_c4/config/Llama-3_2-1B.json)."""
    import numpy as np

    from touchnet_tpu.models.common import rope_frequencies

    scaling = {
        "factor": 32.0,
        "high_freq_factor": 4.0,
        "low_freq_factor": 1.0,
        "original_max_position_embeddings": 8192,
        "rope_type": "llama3",
    }
    ours = np.asarray(
        rope_frequencies(64, 500000.0, rope_scaling=scaling)
    )

    import torch
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

    hf_cfg = HFLlamaConfig(
        head_dim=64, rope_theta=500000.0, rope_scaling=dict(scaling),
        hidden_size=2048, num_attention_heads=32,
        max_position_embeddings=131072,
    )
    hf_inv, _ = ROPE_INIT_FUNCTIONS["llama3"](hf_cfg, torch.device("cpu"))
    np.testing.assert_allclose(ours, hf_inv.numpy(), rtol=1e-6)


def test_grouped_attn_layout_matches_eager(tiny):
    """attn_implementation='flash' now routes through the kernel-native
    grouped IO (decoder_layer grouped branch: projections emit
    [B,Hkv,G,T,D], apply_rope_grouped, grouped o-proj contraction). Off-TPU
    the grouped entry falls back to the dense reference, so this pins the
    grouped projections/rope/o-proj against the eager bthd path — values
    and gradients."""
    import dataclasses

    config, params, ids = tiny
    seg = jnp.ones_like(ids)
    seg = seg.at[:, -7:].set(2)  # packed boundary
    pos = jnp.where(
        seg == 2,
        jnp.arange(ids.shape[1]) - (ids.shape[1] - 7),
        jnp.arange(ids.shape[1]),
    ).astype(jnp.int32)
    cfg_flash = dataclasses.replace(config, attn_implementation="flash")
    cfg_eager = dataclasses.replace(config, attn_implementation="eager")

    def run(cfg, p):
        return forward(
            p, input_ids=ids, segment_ids=seg, position_ids=pos, config=cfg,
            compute_dtype=jnp.float32,
        )

    lf = run(cfg_flash, params)
    le = run(cfg_eager, params)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(le),
                               atol=2e-5, rtol=2e-5)

    def loss(cfg):
        def f(p):
            return jnp.sum(run(cfg, p).astype(jnp.float32) ** 2)
        return f

    gf = jax.grad(loss(cfg_flash))(params)
    ge = jax.grad(loss(cfg_eager))(params)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(ge)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)
