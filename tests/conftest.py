# Test harness: force JAX onto a virtual 8-device CPU mesh so every
# parallelism test (fsdp/tp/cp/pp shardings) runs on one CPU box — the TPU
# analog of the reference's "gloo as fake NCCL" strategy (SURVEY.md §4).
# Must run before jax is imported anywhere.

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


@pytest.fixture
def tmp_exp_dir(tmp_path):
    return str(tmp_path)
