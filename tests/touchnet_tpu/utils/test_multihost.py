# 2-process jax.distributed CPU tests. Reference analog:
# tests/touchnet/utils/test_distributed_cpu.py (torchrun over localhost
# rdzv). Two subprocesses with 2 virtual CPU devices each form a dp=4 mesh:
#   - smoke: GlobalBatchLoader.local_dp_ranks +
#     jax.make_array_from_process_local_data (bin/train.py _put_batch)
#   - full trainer: bin/train.py main() under jax.distributed — train,
#     SIGTERM-kill both processes mid-run, restart, and require the
#     resumed run's final checkpoint to be BIT-IDENTICAL to an
#     uninterrupted golden run (params + loader state).

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
TRAIN_WORKER = os.path.join(
    os.path.dirname(__file__), "multihost_train_worker.py"
)
REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", ".."))
TINY_CFG = os.path.join(
    os.path.dirname(__file__), "..", "..", "assets", "config", "tiny_llama.json"
)


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


# -- full trainer under 2 processes ----------------------------------------


def _worker_env():
    env = dict(os.environ)
    env.pop("TOUCHNET_TEST_DEVICES", None)
    # the worker picks cpu + 2 devices via jax.config; scrub env overrides
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_NUM_CPU_DEVICES", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _launch_trainer(argv, sigterm_at=0, timeout=420):
    coordinator = f"127.0.0.1:{_free_port()}"
    argv_json = argv[-1]  # path written by caller
    env = _worker_env()
    procs = [
        subprocess.Popen(
            [sys.executable, TRAIN_WORKER, coordinator, str(i), "2",
             argv_json, str(sigterm_at)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"trainer process {i} failed:\n{out[-4000:]}"
        assert "TRAIN_WORKER_OK" in out, out[-4000:]
    return outs


def _build_corpus(tmp_path, num_shards=4, samples=64, vocab=64, maxlen=30):
    from touchnet_tpu.bin.make_data import DataBuilder

    rng = np.random.default_rng(0)
    paths = []
    for s in range(num_shards):
        d = tmp_path / f"{s:09d}"
        d.mkdir()
        b = DataBuilder(str(d / "texttoken.bin"), np.int32)
        for _ in range(samples):
            n = rng.integers(5, maxlen)
            start = rng.integers(3, vocab)
            b.add_item((np.arange(n) + start) % (vocab - 3) + 3)
            b.end_document()
        b.finalize(str(d / "texttoken.idx"))
        paths.append(str(d))
    listfile = tmp_path / "data.list"
    with open(listfile, "w") as f:
        for p in paths:
            f.write(f"{p} texttoken\n")
    return str(listfile)


def _trainer_argv(tmp_path, listfile, exp_dir, steps):
    args = {
        "tokenizer_type": "RawTokenizer",
        "tokenizer_raw_vocab_size": "64",
        "datapipe_type": "causal_lm",
        "datalist_path": listfile,
        "datalist_epoch": "100",
        "dataset_batchsize": "1",
        "dataset_text_seqlen": "128",
        "dataloader_num_workers": "1",
        "training_model_name": "llama",
        "training_model_config_path": TINY_CFG,
        "training_trace_dump_folder": str(exp_dir),
        "training_log_freq": "1",
        "training_seed": "0",
        "training_data_parallel_shard_degree": "4",
        "training_activation_checkpoint_mode": "none",
        "training_mixed_precision_param": "float32",
        "training_enable_ckpt": "true",
        "training_ckpt_interval": "10",
        "lr_scheduler_steps": str(steps),
        "lr_scheduler_warmup_steps": "2",
        "optimizer_lr": "1e-2",
    }
    argv = []
    for k, v in args.items():
        argv += [f"--{k}", v]
    path = tmp_path / f"argv_{os.path.basename(str(exp_dir))}_{steps}.json"
    with open(path, "w") as f:
        json.dump(argv, f)
    return argv + [str(path)]


def _ckpt_mgr(ckpt_dir):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(str(ckpt_dir)),
        options=ocp.CheckpointManagerOptions(step_prefix="step"),
    )


def _restore_ckpt_items(ckpt_dir, step):
    import jax
    import orbax.checkpoint as ocp

    # the ckpt was saved under the workers' 2-process topology whose device
    # ids don't exist here; restore as raw host numpy (no shardings involved)
    model_path = os.path.join(os.path.abspath(str(ckpt_dir)), f"step_{step}", "model")
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(model_path)
    meta = meta.item_metadata if hasattr(meta, "item_metadata") else meta
    restore_args = jax.tree.map(
        lambda m: ocp.RestoreArgs(restore_type=np.ndarray), meta
    )
    model = ckptr.restore(
        model_path, args=ocp.args.PyTreeRestore(restore_args=restore_args)
    )
    loader = ocp.Checkpointer(ocp.JsonCheckpointHandler()).restore(
        os.path.join(os.path.abspath(str(ckpt_dir)), f"step_{step}", "dataloader")
    )
    return model, loader


def _parse_losses(outs):
    import re

    losses = {}
    for out in outs:
        for m in re.finditer(r"step\s+(\d+)\s+loss (\d+\.\d+)", out):
            losses[int(m.group(1))] = float(m.group(2))
    return losses


@pytest.mark.slow
def test_two_process_trainer_kill_and_bitexact_resume(tmp_path):
    """The real bin/train.py under jax.distributed (2 procs x 2 devices,
    dp=4): SIGTERM-kill both processes at step 13 (a pod preemption), then
    restart TWICE from the same preemption checkpoint in two separate exp
    dirs. Both restarts must find step 13, train 14..20 through the full
    multi-host path (per-process dp-rank streams, global batch assembly,
    collective Orbax save), and land on BIT-IDENTICAL step-20 checkpoints
    — params AND loader state. This is the resume contract the framework
    (and the reference's StatefulDataLoader design) actually gives: a
    restart deterministically continues the checkpointed stream; the
    batcher generators' one-sample look-ahead is dropped at the restart
    point identically on every restart (data/dataloader.py:13-16), so an
    uninterrupted run is NOT the comparison target.
    """
    listfile = _build_corpus(tmp_path)

    kill_exp = tmp_path / "killed"
    outs1 = _launch_trainer(
        _trainer_argv(tmp_path, listfile, kill_exp, 20), sigterm_at=13
    )
    assert any("exiting on preemption at step 13" in o for o in outs1)
    # the preemption must have force-saved step 13 and stopped there
    with _ckpt_mgr(kill_exp / "checkpoint") as mgr:
        assert mgr.latest_step() == 13, mgr.all_steps()

    # second restart root: the same preemption checkpoint, separate exp dir
    twin_exp = tmp_path / "twin"
    (twin_exp).mkdir()
    import shutil

    shutil.copytree(kill_exp / "checkpoint", twin_exp / "checkpoint")

    outs2 = _launch_trainer(_trainer_argv(tmp_path, listfile, kill_exp, 20))
    outs3 = _launch_trainer(_trainer_argv(tmp_path, listfile, twin_exp, 20))

    # both must have resumed (trained 14..20, not restarted from scratch),
    # and training must actually be learning across the kill boundary
    losses = _parse_losses(outs1)
    losses2 = _parse_losses(outs2)
    assert min(losses2) == 14, sorted(losses2)
    assert losses2[20] < losses[1]

    k_model, k_loader = _restore_ckpt_items(kill_exp / "checkpoint", 20)
    t_model, t_loader = _restore_ckpt_items(twin_exp / "checkpoint", 20)
    assert k_loader == t_loader, (k_loader, t_loader)
    assert sorted(k_model) == sorted(t_model)
    mism = [
        key for key in k_model
        if not np.array_equal(np.asarray(k_model[key]), np.asarray(t_model[key]))
    ]
    assert not mism, f"params diverged between restarts: {mism[:8]}"
