# Copyright (c) 2026 touchnet_tpu authors.
# Remat policies change memory/recompute, never math: every mode must
# produce the same loss and grads as remat "none" (reference apply_ac is
# likewise semantics-preserving, touchnet/utils/helper_func.py:26-112).
# Pins the scan-of-scans group restructure (modeling_llama.scan_layers) and
# the op_every_<k> / full_every_<k> hybrids.

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from touchnet_tpu.models.llama.configuration_llama import LlamaConfig
from touchnet_tpu.models.llama.modeling_llama import forward, init_params


def _setup():
    config = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=5,  # odd: exercises the remainder path for k=2
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=64,
    )
    params = init_params(config, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 128, (2, 32)), jnp.int32)
    seg = jnp.ones((2, 32), jnp.int32)
    return config, params, ids, seg


MODES = [
    ("none", "op"),
    ("full", "op"),
    ("selective", "op"),
    ("selective", "2"),
    ("selective", "op_every_2"),
    ("selective", "op_every_1"),
    ("op", "op"),
    ("op", "full_every_2"),
    ("op", "full_every_1"),
    ("op_names", "op"),
    ("op_small", "op"),
]


@pytest.mark.parametrize("mode,opt", MODES)
def test_remat_mode_preserves_loss_and_grads(mode, opt):
    config, params, ids, seg = _setup()

    def loss_fn(p, mode, opt):
        logits = forward(
            p, input_ids=ids, segment_ids=seg, config=config,
            compute_dtype=jnp.float32, remat_mode=mode,
            selective_ac_option=opt,
        )
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    ref_l, ref_g = jax.value_and_grad(loss_fn)(params, "none", "op")
    got_l, got_g = jax.value_and_grad(loss_fn)(params, mode, opt)
    np.testing.assert_allclose(got_l, ref_l, rtol=1e-6)
    for path, a in jax.tree_util.tree_flatten_with_path(got_g)[0]:
        b = jax.tree_util.tree_flatten_with_path(ref_g)[0]
        np.testing.assert_allclose(
            a, dict((jax.tree_util.keystr(k), v) for k, v in b)[
                jax.tree_util.keystr(path)
            ],
            rtol=2e-5, atol=1e-7,
        )


def test_bad_hybrid_options_raise():
    config, params, ids, seg = _setup()
    with pytest.raises(ValueError):
        forward(params, input_ids=ids, segment_ids=seg, config=config,
                compute_dtype=jnp.float32, remat_mode="selective",
                selective_ac_option="full_every_2")
    with pytest.raises(ValueError):
        forward(params, input_ids=ids, segment_ids=seg, config=config,
                compute_dtype=jnp.float32, remat_mode="selective",
                selective_ac_option="op_every_0")


def test_save_list_mode_matches_golden():
    """remat_mode='save:<names>' — the parameterized save-set dial behind
    the named policies — must preserve loss and grads, and reject an
    empty list."""
    import jax
    import jax.numpy as jnp

    config, params, ids, seg = _setup()

    def loss_fn(p, mode):
        out = forward(
            p, input_ids=ids, segment_ids=seg, config=config,
            remat_mode=mode, compute_dtype=jnp.float32,
        )
        return out.astype(jnp.float32).sum()

    ref_l, ref_g = jax.value_and_grad(loss_fn)(params, "none")
    for mode in (
        "save:flash_out,flash_lse,dot_q,dot_k,dot_v",
        "save:dot_gate,dot_up",
    ):
        l, g = jax.value_and_grad(loss_fn)(params, mode)
        assert abs(float(l) - float(ref_l)) < 1e-4
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(ref_g)):
            # recompute reorders reductions: f32 reassociation noise only
            np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-4)
    with pytest.raises(ValueError, match="at least one name"):
        loss_fn(params, "save:")
