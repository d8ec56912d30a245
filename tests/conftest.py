# Test harness: force JAX onto a virtual 8-device CPU mesh so every
# parallelism test (fsdp/tp/cp/pp shardings) runs on one CPU box — the TPU
# analog of the reference's "gloo as fake NCCL" strategy (SURVEY.md §4).
# Must run before jax is imported anywhere.

import os

# NOTE: the axon environment preloads jax at interpreter startup (an `axon`
# module is injected via .pth), so env vars set here are too late — use
# jax.config, which works as long as no backend has been initialized yet.
os.environ.setdefault("TOUCHNET_TEST_DEVICES", "8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", int(os.environ["TOUCHNET_TEST_DEVICES"]))

import pytest  # noqa: E402


@pytest.fixture
def tmp_exp_dir(tmp_path):
    return str(tmp_path)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module: a full-suite run
    accumulates hundreds of XLA:CPU programs in one process, and the LLVM
    JIT state eventually segfaults a later large compile (reproducible at
    tests/touchnet_tpu/parallel/test_pipeline.py::test_train_e2e_pipeline
    only when the whole suite precedes it; every module subset is clean).
    Module-scoped so within-module fixtures keep their compiled steps."""
    import gc

    yield
    jax.clear_caches()
    gc.collect()
