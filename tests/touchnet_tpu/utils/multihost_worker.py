# Worker for the 2-process jax.distributed CPU smoke test (run by
# test_multihost.py; analog of the reference's torchrun-based
# tests/touchnet/utils/test_distributed_cpu.py). Each process owns 2 virtual
# CPU devices; together they form a dp=4 mesh. Validates
# GlobalBatchLoader.local_dp_ranks and make_array_from_process_local_data.

import sys


def main():
    coordinator, process_id = sys.argv[1], int(sys.argv[2])
    import jax

    # select the backend via jax.config, NOT the JAX_PLATFORMS env var: the
    # axon environment injects a .pth that makes env-var platform selection
    # probe the TPU terminal during device discovery — when the tunnel is
    # down, jax.devices() hangs forever even with JAX_PLATFORMS=cpu
    # (conftest.py documents the same rule for the in-process suite)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=2, process_id=process_id
    )
    assert jax.process_count() == 2
    assert jax.device_count() == 4

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from touchnet_tpu.bin.train import GlobalBatchLoader
    from touchnet_tpu.parallel.dims import ParallelDims

    pd = ParallelDims(dp_shard=4, world_size=4)
    mesh = pd.build_mesh()
    local = GlobalBatchLoader.local_dp_ranks(pd, mesh)
    assert local is not None and len(local) == 2, local

    # per-dp-rank rows: rank r's row is all-r; this process holds its two
    # local ranks' rows, make_array assembles the global [4, 8] array
    local_rows = np.stack(
        [np.full((8,), r, np.float32) for r in local]
    )
    sharding = NamedSharding(mesh, P(("dp_replicate", "dp_shard")))
    garr = jax.make_array_from_process_local_data(sharding, local_rows)
    assert garr.shape == (4, 8), garr.shape
    total = float(jax.jit(lambda x: x.sum())(garr))
    assert total == float(sum(r * 8 for r in range(4))), total

    # disjoint rank ownership across processes
    from jax.experimental import multihost_utils

    all_ranks = multihost_utils.process_allgather(
        np.asarray(local, np.int32)
    ).reshape(-1)
    assert sorted(all_ranks.tolist()) == [0, 1, 2, 3], all_ranks

    # Trainer._put_batch spec selection (regression): dev batches are
    # UNSTACKED — with gradient accumulation on they must still assemble on
    # dim 0. The old accum-gated path applied microbatch_specs (P(None, dp)
    # for 2-D) to them, so make_array_from_process_local_data concatenated
    # the two processes' SEQUENCE axes into [B_local, 2T] garbage.
    from types import SimpleNamespace

    from touchnet_tpu.bin.train import Trainer

    fake = SimpleNamespace(
        mesh=mesh, parallel_dims=pd, _local_dp_ranks=local, _accum=2
    )
    dev_batch = {"input_ids": local_rows.astype(np.int32), "num_sentence": 2}
    dev_global, ns = Trainer._put_batch(fake, dev_batch, stacked=False)
    dev_ids = dev_global["input_ids"]
    assert dev_ids.shape == (4, 8), dev_ids.shape
    # scalar probe (replicated, so fetchable): weighting row means by
    # [1, 10, 100, 1000] pins BOTH content and global row order
    probe = float(jax.jit(
        lambda x: (x.mean(axis=1) * np.array([1.0, 10.0, 100.0, 1000.0])).sum()
    )(dev_ids))
    assert probe == 0.0 * 1 + 1 * 10 + 2 * 100 + 3 * 1000, probe
    assert float(ns) == 2.0, ns
    # train batches from _AccumBatcher keep the leading microbatch axis
    # unsharded and assemble the GLOBAL batch on dim 1
    stacked_local = np.stack([local_rows, local_rows + 10]).astype(np.int32)
    train_global, _ = Trainer._put_batch(
        fake, {"input_ids": stacked_local, "num_sentence": 2}
    )
    train_ids = train_global["input_ids"]
    assert train_ids.shape == (2, 4, 8), train_ids.shape
    tprobe = float(jax.jit(
        lambda x: (x.mean(axis=(1, 2)) * np.array([1.0, 100.0])).sum()
    )(train_ids))
    assert tprobe == 1.5 * 1 + 11.5 * 100, tprobe

    print(f"MULTIHOST_OK process={process_id} local_dp_ranks={local}")


if __name__ == "__main__":
    main()
