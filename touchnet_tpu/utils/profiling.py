# Copyright (c) 2026 touchnet_tpu authors.
# Profiling: cyclic jax.profiler traces + HBM snapshots.
#
# Capability parity: reference touchnet/utils/profiling.py:26-137 (torch
# kineto chrome traces per rank per cycle + CUDA memory-history snapshots).
# TPU: jax.profiler writes XPlane/trace-viewer data consumable by
# TensorBoard/XProf; memory snapshots poll device.memory_stats() and save
# device_memory_profile() (pprof format).

import contextlib
import json
import os
import time

import jax

from touchnet_tpu.utils.logging import logger


class _Profiler:
    def __init__(self, folder: str, freq: int, keep_first_k: int, active: int = 1):
        self.folder = folder
        self.freq = freq
        self.keep_first_k = keep_first_k
        self.cycles_done = 0
        self.tracing = False
        os.makedirs(folder, exist_ok=True)

    def step(self, step: int):
        """Trace the step right before each multiple of freq (reference
        schedule: wait/warmup/active=1), for the first keep_first_k cycles."""
        if self.keep_first_k and self.cycles_done >= self.keep_first_k:
            if self.tracing:
                jax.profiler.stop_trace()
                self.tracing = False
            return
        if self.tracing:
            jax.profiler.stop_trace()
            self.tracing = False
            self.cycles_done += 1
            logger.info(f"profiler: finished trace cycle {self.cycles_done}")
        if (step + 1) % self.freq == 0:
            out = os.path.join(self.folder, f"iteration_{step + 1}")
            jax.profiler.start_trace(out)
            self.tracing = True

    def close(self):
        if self.tracing:
            jax.profiler.stop_trace()
            self.tracing = False


@contextlib.contextmanager
def maybe_enable_profiling(job_config, global_step: int = 0):
    if getattr(job_config, "training_enable_profiling", False):
        folder = os.path.join(
            job_config.training_trace_dump_folder,
            job_config.training_profiling_traces_folder,
        )
        prof = _Profiler(
            folder,
            job_config.training_profiling_freq,
            job_config.training_profiling_keep_first_k,
        )
        try:
            yield prof
        finally:
            prof.close()
    else:
        yield None


class _MemorySnapshotter:
    def __init__(self, folder: str, freq: int):
        self.folder = folder
        self.freq = freq
        os.makedirs(folder, exist_ok=True)

    def step(self, step: int, exit_ctx: bool = False):
        if exit_ctx or step % self.freq == 0:
            tag = f"step_{step}" + ("_oom" if exit_ctx else "")
            try:
                jax.profiler.save_device_memory_profile(
                    os.path.join(self.folder, f"{tag}.prof")
                )
            except Exception as e:
                logger.debug(f"memory profile failed: {e}")
            stats = {}
            for i, d in enumerate(jax.local_devices()):
                stats[f"device_{i}"] = d.memory_stats() or {}
            with open(os.path.join(self.folder, f"{tag}.json"), "w") as f:
                json.dump({"time": time.time(), "stats": stats}, f, indent=2)


@contextlib.contextmanager
def maybe_enable_memory_snapshot(job_config, global_step: int = 0):
    if getattr(job_config, "training_enable_memory_snapshot", False):
        folder = os.path.join(
            job_config.training_trace_dump_folder,
            job_config.training_memory_snapshot_folder,
        )
        snap = _MemorySnapshotter(folder, job_config.training_profiling_freq)
        try:
            yield snap
        except Exception:
            snap.step(global_step, exit_ctx=True)
            raise
    else:
        yield None
