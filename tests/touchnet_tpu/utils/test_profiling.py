# Profiler cycle + memory snapshot smoke (jax.profiler works on CPU).

import os

from touchnet_tpu.bin import TrainConfig
from touchnet_tpu.utils.profiling import (
    maybe_enable_memory_snapshot,
    maybe_enable_profiling,
)


def test_profiler_writes_trace(tmp_path):
    cfg = TrainConfig(
        training_enable_profiling=True,
        training_trace_dump_folder=str(tmp_path),
        training_profiling_freq=2,
        training_profiling_keep_first_k=1,
    )
    import jax.numpy as jnp

    with maybe_enable_profiling(cfg) as prof:
        assert prof is not None
        for step in range(1, 5):
            jnp.ones(8).sum().block_until_ready()
            prof.step(step)
    trace_root = tmp_path / "profile_traces"
    assert any(p.startswith("iteration_") for p in os.listdir(trace_root))
    # the started cycle actually wrote plugin data
    iter_dir = trace_root / sorted(os.listdir(trace_root))[0]
    assert any(os.scandir(iter_dir))


def test_memory_snapshot_writes(tmp_path):
    cfg = TrainConfig(
        training_enable_memory_snapshot=True,
        training_trace_dump_folder=str(tmp_path),
        training_profiling_freq=1,
    )
    with maybe_enable_memory_snapshot(cfg) as snap:
        assert snap is not None
        snap.step(1)
    files = os.listdir(tmp_path / "memory_snapshot")
    assert any(f.endswith(".json") for f in files)


def test_disabled_yields_none(tmp_path):
    cfg = TrainConfig(training_trace_dump_folder=str(tmp_path))
    with maybe_enable_profiling(cfg) as p, maybe_enable_memory_snapshot(cfg) as m:
        assert p is None and m is None
