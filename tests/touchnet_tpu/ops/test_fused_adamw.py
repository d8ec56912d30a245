# Copyright (c) 2026 touchnet_tpu authors.
# Fused AdamW (ops/fused_adamw.py) vs optax.adamw: the single-expression
# step must reproduce optax's update and the trainer's clip +
# skip-on-nonfinite semantics (bin/train.py train_step).

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from touchnet_tpu.ops.fused_adamw import fused_adamw_step

B1, B2, EPS, WD = 0.9, 0.95, 1e-8, 0.1


def _tree(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "stacked": jnp.asarray(rng.normal(size=(4, 8, 256)), jnp.float32),
        "embed": jnp.asarray(rng.normal(size=(512, 256)), jnp.float32),
        "bias1d": jnp.asarray(rng.normal(size=(37,)), jnp.float32),  # fallback
        "ragged": jnp.asarray(rng.normal(size=(5, 100)), jnp.float32),  # fallback
    }


def _optax_step(params, state, grads, lr):
    tx = optax.adamw(lr, b1=B1, b2=B2, eps=EPS, weight_decay=WD)
    updates, new_state = tx.update(grads, state, params)
    return optax.apply_updates(params, updates), new_state


@pytest.mark.parametrize("steps", [1, 3])
def test_matches_optax(steps):
    params = _tree(0)
    grads = _tree(1)
    lr = 3e-4
    tx = optax.adamw(lr, b1=B1, b2=B2, eps=EPS, weight_decay=WD)
    state = tx.init(params)
    p_ref = params
    p_fused = params
    mu = jax.tree.map(jnp.zeros_like, params)
    nu = jax.tree.map(jnp.zeros_like, params)
    count = jnp.zeros((), jnp.int32)
    for s in range(steps):
        g = jax.tree.map(lambda x: x * (0.5 + s), grads)
        p_ref, state = _optax_step(p_ref, state, g, lr)
        p_fused, mu, nu, count = fused_adamw_step(
            g, p_fused, mu, nu, count,
            lr=jnp.asarray(lr), b1=B1, b2=B2, eps=EPS, weight_decay=WD,
        )
    adam_state = state[0]
    assert int(count) == steps == int(adam_state.count)
    for k in params:
        np.testing.assert_allclose(
            p_fused[k], p_ref[k], rtol=2e-6, atol=2e-7, err_msg=k
        )
        np.testing.assert_allclose(
            mu[k], adam_state.mu[k], rtol=1e-6, atol=1e-8, err_msg=k
        )
        np.testing.assert_allclose(
            nu[k], adam_state.nu[k], rtol=1e-6, atol=1e-8, err_msg=k
        )


def test_clip_scale_matches_pre_scaled_grads():
    params, grads = _tree(2), _tree(3)
    mu = jax.tree.map(jnp.zeros_like, params)
    nu = jax.tree.map(jnp.zeros_like, params)
    count = jnp.zeros((), jnp.int32)
    scale = jnp.asarray(0.37, jnp.float32)
    a = fused_adamw_step(
        jax.tree.map(lambda g: g * scale, grads), params, mu, nu, count,
        lr=jnp.asarray(1e-3),
    )
    b = fused_adamw_step(
        grads, params, mu, nu, count,
        lr=jnp.asarray(1e-3), clip_scale=scale,
    )
    for x, y in zip(jax.tree.leaves(a[:3]), jax.tree.leaves(b[:3])):
        np.testing.assert_allclose(x, y, rtol=1e-6)


def test_nonfinite_holds_everything():
    params, grads = _tree(4), _tree(5)
    grads["embed"] = grads["embed"].at[0, 0].set(jnp.nan)
    mu = jax.tree.map(lambda x: jnp.ones_like(x) * 0.1, params)
    nu = jax.tree.map(lambda x: jnp.ones_like(x) * 0.2, params)
    count = jnp.asarray(7, jnp.int32)
    gnorm = optax.global_norm(grads)
    p2, m2, n2, c2 = fused_adamw_step(
        grads, params, mu, nu, count,
        lr=jnp.asarray(1e-3),
        clip_scale=jnp.minimum(1.0, 1.0 / (gnorm + 1e-6)),
        finite=jnp.isfinite(gnorm),
    )
    for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(params)):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(jax.tree.leaves(m2), jax.tree.leaves(mu)):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(jax.tree.leaves(n2), jax.tree.leaves(nu)):
        np.testing.assert_array_equal(a, b)
    assert int(c2) == 7


def test_bf16_grads_supported():
    params = _tree(6)
    grads = jax.tree.map(lambda x: x.astype(jnp.bfloat16), _tree(7))
    mu = jax.tree.map(jnp.zeros_like, params)
    nu = jax.tree.map(jnp.zeros_like, params)
    p2, m2, n2, c = fused_adamw_step(
        grads, params, mu, nu, jnp.zeros((), jnp.int32),
        lr=jnp.asarray(1e-3),
    )
    ref, _ = _optax_step(
        params,
        optax.adamw(1e-3, b1=B1, b2=B2, eps=EPS, weight_decay=WD).init(params),
        jax.tree.map(lambda g: g.astype(jnp.float32), grads),
        1e-3,
    )
    for k in params:
        np.testing.assert_allclose(p2[k], ref[k], rtol=2e-6, atol=2e-7)
