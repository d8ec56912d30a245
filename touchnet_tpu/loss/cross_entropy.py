# Copyright (c) 2026 touchnet_tpu authors.
# Packed-sequence cross-entropy ("pack loss").
#
# Capability parity: reference touchnet/loss/cross_entropy.py:12-50 — two
# reductions from one per-position CE:
#   loss_per_sample (the training objective): sum over positions of
#     ce / sentence_lens, summed over the batch, divided by the GLOBAL
#     num_sentence — makes packed loss numerically identical to a padded
#     per-sample-mean DP loss (reference tests/touchnet/utils/test_pack_loss.py).
#   loss_per_token (logging): sum(ce) / num_valid_tokens.
# Computed in fp32 from (possibly bf16) logits with a stable logsumexp; under
# jit, XLA fuses the softmax pipeline. When the liger flag or loss parallel
# is enabled the trainer instead uses fused_linear_cross_entropy
# (parallel/loss_parallel.py), which chunks the lm_head matmul + CE so the
# full [B, T, V] logits never materialize (vocab-sharded under TP).

from typing import Tuple

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100


def per_position_cross_entropy(
    logits: jax.Array, labels: jax.Array, ignore_index: int = IGNORE_INDEX
) -> jax.Array:
    """CE per position, 0 at ignored positions. logits [..., V], labels [...]."""
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    lse = jax.nn.logsumexp(logits, axis=-1)
    true_logit = jnp.take_along_axis(
        logits, safe_labels[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    return jnp.where(valid, lse - true_logit, 0.0)


def cross_entropy_loss(
    pred: jax.Array,
    labels: jax.Array,
    sentence_lens: jax.Array,
    num_sentence: jax.Array,
    ignore_index: int = IGNORE_INDEX,
) -> Tuple[jax.Array, jax.Array]:
    """Pack loss.

    Args:
        pred: logits [B, L, V] (bf16 or f32).
        labels: [B, L] int, ignore_index marks padding.
        sentence_lens: [B, L] int, per-position length of its sentence.
        num_sentence: scalar — GLOBAL packed-sentence count (already summed
            over dp ranks by the trainer, reference train.py:340-343).

    Returns:
        (loss_per_sample, loss_per_token) — backward on the first, log the
        second.
    """
    ce = per_position_cross_entropy(pred, labels, ignore_index)  # [B, L]
    num_tokens = jnp.sum(labels != ignore_index)
    total = jnp.sum(ce)
    loss_per_token = jnp.where(
        jnp.logical_and(total > 1e-6, num_tokens > 0), total / num_tokens, 0.0
    )
    per_sample = jnp.sum(ce / sentence_lens.astype(jnp.float32), axis=-1)  # [B]
    loss_per_sample = jnp.sum(per_sample) / num_sentence
    return loss_per_sample, loss_per_token


def accuracy(
    pred: jax.Array, labels: jax.Array, ignore_index: int = IGNORE_INDEX
) -> jax.Array:
    """Token accuracy over non-ignored positions (reference
    touchnet/utils/metrics.py:26-50)."""
    hits = (jnp.argmax(pred, axis=-1) == labels) & (labels != ignore_index)
    num = jnp.sum(labels != ignore_index)
    return jnp.where(num > 0, jnp.sum(hits) / num, 0.0)
