# 2-process jax.distributed CPU smoke test: multi-host batch assembly.
# Reference analog: tests/touchnet/utils/test_distributed_cpu.py (torchrun
# over localhost rdzv). Here two subprocesses with 2 virtual CPU devices
# each form a dp=4 mesh and validate GlobalBatchLoader.local_dp_ranks +
# jax.make_array_from_process_local_data (the trainer's multi-host batch
# path, bin/train.py _put_batch).

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", ".."))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_batch_assembly():
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("TOUCHNET_TEST_DEVICES", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_NUM_CPU_DEVICES"] = "2"
    # the worker runs as `python <abs path>`, so sys.path[0] is its own
    # directory, not the repo root — put the repo on PYTHONPATH explicitly
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, str(i)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert "MULTIHOST_OK" in out, out
