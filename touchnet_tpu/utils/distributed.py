# Copyright (c) 2026 touchnet_tpu authors.
# Distributed runtime helpers: init, determinism, GC control, debug dumps.
#
# Capability parity: reference touchnet/utils/distributed.py:54-69 (GC),
# 223-289 (set_determinism), 349-423 (init_distributed + flight recorder +
# PG timeouts). On TPU: process-group init is jax.distributed.initialize;
# the NCCL flight recorder maps to XLA dump flags + a barrier helper; PG
# timeout tightening maps to the coordinator heartbeat/timeout envs (set
# before init).

import gc
import os
import time
from typing import Optional

import jax

from touchnet_tpu.utils.logging import logger


class GarbageCollection:
    """Disable automatic Python GC and collect gen-1 every ``gc_freq`` steps
    (straggler avoidance across SPMD workers, reference distributed.py:54-69)."""

    def __init__(self, gc_freq: int = 1000):
        assert gc_freq > 0
        self.gc_freq = gc_freq
        gc.disable()
        gc.collect(1)

    def run(self, step_count: int):
        if step_count > 1 and step_count % self.gc_freq == 0:
            gc.collect(1)


def init_distributed(job_config=None) -> None:
    """Multi-host init. Single-process runs (one controller over local
    devices) need no init; pods use jax.distributed.initialize driven by the
    standard env (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID)."""
    if os.environ.get("COORDINATOR_ADDRESS") or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    ):
        timeout = (
            job_config.training_init_timeout_seconds if job_config else 300
        )
        os.environ.setdefault(
            "JAX_COORDINATION_SERVICE_CONNECT_TIMEOUT_SECS", str(timeout)
        )
        jax.distributed.initialize()
        logger.info(
            f"jax.distributed initialized: process {jax.process_index()}"
            f"/{jax.process_count()}"
        )
    if job_config is not None and getattr(job_config, "training_trace_buf_size", 0):
        # XLA dump ≈ NCCL flight recorder: post-mortem compiled-graph dumps
        folder = os.path.join(
            job_config.training_trace_dump_folder, "comm_trace"
        )
        if os.environ.get("TOUCHNET_XLA_DUMP"):
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "") + f" --xla_dump_to={folder}"
            ).strip()


def set_determinism(seed: Optional[int], deterministic: bool = False) -> jax.Array:
    """Seed the run. JAX PRNG is explicit (keys thread through the program),
    so unlike torch there is no global generator to seed — we return the root
    key. `deterministic` additionally forces deterministic XLA reductions."""
    if deterministic:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_gpu_deterministic_ops=true"
        ).strip()
        logger.info("Deterministic XLA ops enabled (may degrade throughput)")
    if seed is None:
        seed = int(time.time())
    logger.info(f"root PRNG seed = {seed}")
    return jax.random.PRNGKey(seed)


def barrier(tag: str = "barrier") -> None:
    """Cross-host sync point (reference barrier-synced timeout swap)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


# Metric collectives (reference dist_max/min/mean/sum, distributed.py:199-220).
# Under a single controller, metric arrays are already global — these reduce
# host-side for API parity.
def dist_max(x, *_args, **_kw):
    import jax.numpy as jnp

    return float(jnp.max(x))


def dist_min(x, *_args, **_kw):
    import jax.numpy as jnp

    return float(jnp.min(x))


def dist_mean(x, *_args, **_kw):
    import jax.numpy as jnp

    return float(jnp.mean(x))


def dist_sum(x, *_args, **_kw):
    import jax.numpy as jnp

    return float(jnp.sum(x))
