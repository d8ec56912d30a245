# Comm-volume regression guard: the compiled HLO of the sharded train step
# must hold exactly the collectives the parallelism plan calls for — a stray
# resharding (e.g. a constraint that re-gathers the whole param tree per
# step, or an all-gather of [B, T, V] logits defeating loss parallel) shows
# up here as a count/byte jump long before it shows up on a chip profile.
#
# The reference pins communication by hand-placing DTensor plans
# (touchnet/models/llama/parallelize_llama.py:105-196); under GSPMD the
# partitioner places collectives, so the invariant is enforced by counting
# them in the compiled module instead.
#
# Pinned numbers were read from the compiled HLO on jax 0.8.x's CPU backend
# (8 virtual devices; the SPMD partitioner is platform-independent, the CPU
# counts match the TPU module). If a jax upgrade legitimately shifts
# partitioner choices, re-baseline by running the helpers below and update
# the constants — the diff review is the point of the pin.

import re

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from touchnet_tpu.loss import cross_entropy_loss
from touchnet_tpu.models.llama.configuration_llama import LlamaConfig
from touchnet_tpu.parallel.context_parallel import make_sharded_attn_fn
from touchnet_tpu.parallel.dims import ParallelDims
from touchnet_tpu.parallel.sharding import (
    batch_specs,
    make_shard_fn,
    named_shardings,
)

COLLECTIVES = (
    "all-gather", "reduce-scatter", "all-reduce", "collective-permute",
    "all-to-all",
)

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
                "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8}


def _tiny_config():
    return LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        attn_implementation="eager",
    )


def _packed_batch(batch, seqlen, vocab, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(3, vocab, size=(batch, seqlen), dtype=np.int32)
    seg = np.ones((batch, seqlen), np.int32)
    pos = np.broadcast_to(np.arange(seqlen, dtype=np.int32), (batch, seqlen))
    labels = np.roll(ids, -1, axis=1).astype(np.int32)
    slens = np.full((batch, seqlen), seqlen, np.int32)
    return {
        "input_ids": ids, "labels": labels,
        "position_ids": np.ascontiguousarray(pos),
        "attention_mask": seg, "sentence_lens": slens,
    }


def collective_stats(hlo_text):
    """(counts, bytes) per collective kind from a compiled HLO module."""
    counts = {c: 0 for c in COLLECTIVES}
    nbytes = {c: 0 for c in COLLECTIVES}
    pat = re.compile(
        r"= (\S+?)\[([\d,]*)\][^ ]* ("
        + "|".join(COLLECTIVES) + r")(?:-start)?\("
    )
    for m in pat.finditer(hlo_text):
        dt, dims, kind = m.groups()
        counts[kind] += 1
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        nbytes[kind] += n * _DTYPE_BYTES.get(dt, 4)
    return counts, nbytes


def _compile_spmd_step():
    dims = ParallelDims(
        dp_replicate=1, dp_shard=4, cp=1, tp=2, pp=1, world_size=8,
        enable_loss_parallel=True,
    )
    mesh = dims.build_mesh()
    config = _tiny_config()
    from touchnet_tpu.models.llama.modeling_llama import forward, init_params

    abstract = jax.eval_shape(
        lambda k: init_params(config, k), jax.random.PRNGKey(0)
    )
    shardings = named_shardings(abstract, mesh)
    with mesh:
        params = jax.jit(
            lambda k: init_params(config, k), out_shardings=shardings
        )(jax.random.PRNGKey(0))
    tx = optax.adamw(1e-3)
    with mesh:
        opt_state = jax.jit(tx.init)(params)
    attn_fn = make_sharded_attn_fn(mesh)
    shard_fn = make_shard_fn(mesh, loss_parallel=True)
    hb = _packed_batch(4, 256, config.vocab_size)
    db = jax.device_put(hb, batch_specs(hb, mesh))
    ns = jnp.asarray(4.0, jnp.float32)

    def loss_fn(p, b):
        logits = forward(
            p, input_ids=b["input_ids"], segment_ids=b["attention_mask"],
            position_ids=b["position_ids"], config=config,
            attn_fn=attn_fn, shard_fn=shard_fn, remat_mode="full",
        )
        return cross_entropy_loss(
            logits, b["labels"], b["sentence_lens"], ns
        )[0]

    def train_step(p, s, b):
        loss, grads = jax.value_and_grad(loss_fn)(p, b)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    with mesh:
        return jax.jit(train_step).lower(params, opt_state, db).compile()


def _compile_pp_step():
    from touchnet_tpu.models.llama.modeling_llama import init_params
    from touchnet_tpu.models.llama.pipeline_llama import (
        pipeline_forward,
        pp_param_rules,
    )
    from touchnet_tpu.parallel.sharding import LLAMA_PARAM_RULES

    dims = ParallelDims(
        dp_replicate=1, dp_shard=2, cp=1, tp=2, pp=2, world_size=8,
    )
    mesh = dims.build_mesh()
    config = _tiny_config()
    abstract = jax.eval_shape(
        lambda k: init_params(config, k), jax.random.PRNGKey(0)
    )
    shardings = named_shardings(
        abstract, mesh, pp_param_rules(LLAMA_PARAM_RULES)
    )
    with mesh:
        params = jax.jit(
            lambda k: init_params(config, k), out_shardings=shardings
        )(jax.random.PRNGKey(0))
    tx = optax.adamw(1e-3)
    with mesh:
        opt_state = jax.jit(tx.init)(params)
    hb = _packed_batch(2 * dims.dp_degree, 256, config.vocab_size)
    db = jax.device_put(hb, batch_specs(hb, mesh))
    ns = jnp.asarray(float(2 * dims.dp_degree), jnp.float32)

    def loss_fn(p, b):
        logits = pipeline_forward(
            p, input_ids=b["input_ids"], segment_ids=b["attention_mask"],
            position_ids=b["position_ids"], config=config, mesh=mesh,
            compute_dtype=jnp.float32,
        )
        return cross_entropy_loss(
            logits, b["labels"], b["sentence_lens"], ns
        )[0]

    def train_step(p, s, b):
        loss, grads = jax.value_and_grad(loss_fn)(p, b)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    with mesh:
        return jax.jit(train_step).lower(params, opt_state, db).compile()


@pytest.fixture(scope="module")
def spmd_stats():
    compiled = _compile_spmd_step()
    return collective_stats(compiled.as_text())


def test_spmd_step_collective_counts(spmd_stats):
    counts, _ = spmd_stats
    # 7 FSDP param all-gathers per layer pass (q/k/v/o/gate/up/down), fwd +
    # bwd re-gather = 14, plus embed-table gathers; grads of the tied
    # embed/lm_head and the scalar loss terms all-reduce. No all-to-all and
    # no collective-permute belong in this layout.
    assert counts["all-to-all"] == 0
    assert counts["collective-permute"] == 0
    assert counts == {
        "all-gather": 16, "reduce-scatter": 0, "all-reduce": 6,
        "collective-permute": 0, "all-to-all": 0,
    }


def test_spmd_step_collective_bytes(spmd_stats):
    _, nbytes = spmd_stats
    # Static per-instruction bytes (scan bodies count once). The dominant
    # term is the FSDP param gathers; a full-tree per-step re-gather or a
    # [B, T, V] logits gather would multiply this.
    total = sum(nbytes.values())
    assert total <= 4_000_000, (
        f"collective bytes jumped: {nbytes} — a resharding snuck into the "
        "sharded train step"
    )


def test_pp_step_collective_counts():
    compiled = _compile_pp_step()
    counts, nbytes = collective_stats(compiled.as_text())
    # The PP loop moves activations between stages with collective-permute
    # (ppermute); stage bodies hold the Megatron TP collectives. A count of
    # zero permutes means PP silently degenerated to replication.
    assert counts["all-to-all"] == 0
    assert counts["collective-permute"] >= 1
    total = sum(nbytes.values())
    assert total <= 12_000_000, (
        f"collective bytes jumped: {nbytes} — a resharding snuck into the "
        "pipeline train step"
    )
