# Copyright (c) 2026 touchnet_tpu authors.
# Elastic restart wrapper: run the train binary, restart on failure.
#
# Capability parity: the reference launches via torchrun with
# --max-restarts (elastic agent, examples/*/run.sh) so a crashed or
# PG-timeout-killed worker re-enters training from the last checkpoint.
# Single-controller JAX has no agent; this wrapper owns the restart loop:
# the child is the full train binary, failures (including the
# StepWatchdog's abort exit 124, utils/distributed.py) trigger a bounded
# backoff restart, and resume is the checkpointer's normal load path
# (training_ckpt_load_step=-1 picks the newest step).
#
# Usage: python -m touchnet_tpu.bin.elastic --max-restarts 3 -- \
#            python -m touchnet_tpu.bin.train --training_enable_ckpt ...

import argparse
import signal
import subprocess
import sys
import time

from touchnet_tpu.utils.logging import logger


def run_elastic(cmd, max_restarts: int = 3, backoff_s: float = 5.0) -> int:
    """Run ``cmd`` until it exits 0 or restarts are exhausted. Returns the
    final exit code. SIGTERM/SIGINT are forwarded to the child (graceful
    preemption: the trainer checkpoints at the step boundary and exits 0,
    which ends the loop without a restart)."""
    attempt = 0
    child = None
    interrupted = False

    def forward(signum, frame):
        nonlocal interrupted
        # operator-initiated stop: forward to the child (SIGTERM triggers
        # the trainer's graceful step-boundary checkpoint) and do NOT
        # restart afterwards — Ctrl+C must stop the job, not respawn it
        interrupted = True
        if child is not None and child.poll() is None:
            child.send_signal(
                signal.SIGTERM if signum == signal.SIGINT else signum
            )

    prev = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev[sig] = signal.signal(sig, forward)
        except ValueError:  # not the main thread
            pass
    try:
        while True:
            if attempt:
                logger.warning(
                    f"elastic: restart {attempt}/{max_restarts} in "
                    f"{backoff_s:.0f}s (resumes from the last checkpoint)"
                )
                time.sleep(backoff_s)
            child = subprocess.Popen(cmd)
            rc = child.wait()
            if rc == 0:
                return 0
            if interrupted:
                logger.warning(f"elastic: stopped by signal (child rc={rc})")
                return rc
            logger.error(f"elastic: train exited rc={rc}")
            if attempt >= max_restarts:
                logger.error("elastic: restart budget exhausted")
                return rc
            attempt += 1
    finally:
        for sig, h in prev.items():
            # getsignal() returns None for handlers not installed from
            # Python (e.g. when embedded); signal(sig, None) raises
            if h is not None:
                signal.signal(sig, h)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="restart-with-resume wrapper around the train binary"
    )
    parser.add_argument("--max-restarts", type=int, default=3)
    parser.add_argument("--backoff-seconds", type=float, default=5.0)
    parser.add_argument(
        "cmd", nargs=argparse.REMAINDER,
        help="-- followed by the full train command",
    )
    args = parser.parse_args(argv)
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        parser.error("no command given (append: -- python -m touchnet_tpu.bin.train ...)")
    sys.exit(run_elastic(cmd, args.max_restarts, args.backoff_seconds))


if __name__ == "__main__":
    main()
