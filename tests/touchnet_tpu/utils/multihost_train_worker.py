# Worker for the 2-process REAL-trainer test (run by test_multihost.py).
# Unlike multihost_worker.py (batch assembly only), this drives the actual
# `touchnet_tpu.bin.train.main` entry under jax.distributed with 2 virtual
# CPU devices per process — the full multi-host path: per-process dp-rank
# loader streams, make_array_from_process_local_data, collective Orbax
# save/restore, SIGTERM preemption.
#
# Reference analog: tests/touchnet/utils/test_distributed_cpu.py (torchrun
# 4x8 over localhost rdzv) — which only builds the mesh; this one trains.
#
# argv: <coordinator> <process_id> <num_processes> <argv_json> <sigterm_at>
#   sigterm_at > 0: deliver SIGTERM to ourselves right after the metrics
#   log of that step — a pod preemption (every process gets the signal),
#   exercising the trainer's save-at-boundary-and-exit path mid-run.

import json
import os
import signal
import sys


def main():
    coordinator = sys.argv[1]
    process_id = int(sys.argv[2])
    num_processes = int(sys.argv[3])
    argv_json = sys.argv[4]
    sigterm_at = int(sys.argv[5])

    import jax

    # backend via jax.config, NOT env (see multihost_worker.py: the axon
    # .pth makes env-var platform selection probe the TPU tunnel)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes

    if sigterm_at > 0:
        from touchnet_tpu.utils import metrics as metrics_mod

        orig_log = metrics_mod.MetricsProcessor.log

        def log_then_preempt(self, step, m):
            orig_log(self, step, m)
            if step == sigterm_at:
                os.kill(os.getpid(), signal.SIGTERM)

        metrics_mod.MetricsProcessor.log = log_then_preempt

    with open(argv_json) as f:
        argv = json.load(f)

    from touchnet_tpu.bin.train import main as train_main

    train_main(argv)
    print(f"TRAIN_WORKER_OK process={process_id}", flush=True)


if __name__ == "__main__":
    main()
