# Copyright (c) 2026 touchnet_tpu authors.
# Optimizer + WSD LR schedule (optax).
#
# Capability parity: reference touchnet/utils/optimizer.py:36-322
# (OptimizersContainer with AdamW betas (0.9, 0.95) wd 0.1, and
# LRSchedulersContainer with the warmup-stable-decay LambdaLR). optax is
# XLA-fused, so the fused/foreach/for-loop impl knob of the reference is a
# no-op here (TrainConfig keeps it for CLI parity). The schedule value is a
# pure function of the step, so checkpoints only need the step counter.

import math
from typing import NamedTuple, Optional

import jax
import optax

from touchnet_tpu.bin import TrainConfig


def linear_warmup_stable_decay(
    current_step,
    warmup_steps: int,
    stable_steps: int,
    decay_steps: int,
    lr_decay_type: str,
    lr_min: float,
):
    """Multiplicative LR factor in [lr_min, 1]: linear warmup -> stable ->
    {linear | sqrt | cosine} decay (reference optimizer.py:275-322).
    Works on python ints and traced jnp scalars."""
    import jax.numpy as jnp

    warmup_stable = warmup_steps + stable_steps
    step = jnp.asarray(current_step, jnp.float32)

    warm = (step + 1.0) / (warmup_steps + 1)
    progress = (step - warmup_stable) / jnp.maximum(decay_steps, 1)
    progress = jnp.clip(progress, 0.0, 1.0)
    if lr_decay_type == "linear":
        dec = 1.0 - progress
    elif lr_decay_type == "sqrt":
        dec = 1.0 - jnp.sqrt(progress)
    elif lr_decay_type == "cosine":
        dec = 0.5 * (1.0 + jnp.cos(math.pi * progress))
    else:
        raise ValueError(f"unknown lr_decay_type {lr_decay_type!r}")
    dec = lr_min + (1 - lr_min) * dec
    return jnp.where(step < warmup_steps, warm, jnp.where(step < warmup_stable, 1.0, dec))


def build_lr_schedule(job_config: TrainConfig):
    """Returns schedule(step) -> absolute LR."""
    training_steps = job_config.lr_scheduler_steps
    warmup_steps = int(job_config.lr_scheduler_warmup_steps)
    if job_config.lr_scheduler_decay_ratio is not None:
        decay_steps = round(training_steps * job_config.lr_scheduler_decay_ratio)
        if warmup_steps + decay_steps > training_steps:
            decay_steps = training_steps - warmup_steps
    else:
        decay_steps = training_steps - warmup_steps
    stable_steps = training_steps - warmup_steps - decay_steps

    def schedule(step):
        return job_config.optimizer_lr * linear_warmup_stable_decay(
            step,
            warmup_steps,
            stable_steps,
            decay_steps,
            job_config.lr_scheduler_decay_type,
            job_config.lr_scheduler_lr_min,
        )

    return schedule


class OptimizerBundle(NamedTuple):
    """Optimizer transform + its schedule; state lives in the trainer.

    The hyperparameters are carried alongside tx so the fused single-pass
    AdamW (ops/fused_adamw.py, optimizer_impl='fused') reads the SAME
    values the optax chain was built with — never duplicated literals."""

    tx: optax.GradientTransformation
    schedule: object  # callable(step) -> lr
    b1: float = 0.9
    b2: float = 0.95
    eps: float = 1e-8
    weight_decay: float = 0.1


def build_optimizer(
    job_config: TrainConfig, max_norm: Optional[float] = None
) -> OptimizerBundle:
    """AdamW/Adam with WSD schedule and optional global-norm clipping.

    Grad clipping is done outside the transform in the train step (the
    reference skips the optimizer step on non-finite norms, train.py:467-471,
    which needs the norm value) — max_norm here is accepted for standalone
    use."""
    name = job_config.optimizer_name
    if job_config.optimizer_impl not in ("fused", "foreach", "for-loop"):
        raise ValueError(f"optimizer_impl {job_config.optimizer_impl!r}")
    # all three impls are the same XLA-fused optax update on TPU (reference
    # optimizer.py:151-164 picks CUDA kernels; parity knob, validated only)
    schedule = build_lr_schedule(job_config)
    b1, b2, wd = 0.9, 0.95, 0.1  # reference defaults (optimizer.py:151-164)
    eps = job_config.optimizer_eps
    if name == "AdamW":
        tx = optax.adamw(
            learning_rate=schedule, b1=b1, b2=b2, eps=eps, weight_decay=wd
        )
    elif name == "Adam":
        tx = optax.adam(learning_rate=schedule, b1=b1, b2=b2, eps=eps)
    else:
        raise NotImplementedError(f"optimizer {name} not added")
    if max_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(max_norm), tx)
    return OptimizerBundle(
        tx=tx, schedule=schedule, b1=b1, b2=b2, eps=eps, weight_decay=wd
    )


def global_grad_norm(grads) -> jax.Array:
    return optax.global_norm(grads)
