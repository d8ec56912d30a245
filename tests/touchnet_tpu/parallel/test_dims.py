# ParallelDims validation + mesh construction.

import pytest

from touchnet_tpu.parallel.dims import DP_CP, DP_SHARD_CP, ParallelDims


def test_autofill_dp_shard():
    pd = ParallelDims(dp_replicate=1, dp_shard=-1, cp=2, tp=2, world_size=8)
    assert pd.dp_shard == 2
    assert pd.dp_degree == 2
    assert pd.non_data_parallel_size == 4


def test_invalid_product_rejected():
    with pytest.raises(AssertionError):
        ParallelDims(dp_replicate=3, dp_shard=1, world_size=8)


def test_mesh_axes_order():
    pd = ParallelDims(dp_replicate=2, dp_shard=2, cp=1, tp=2, world_size=8)
    mesh = pd.build_mesh()
    assert tuple(mesh.axis_names) == ("pp", "dp_replicate", "dp_shard", "cp", "tp")
    assert dict(mesh.shape) == {
        "pp": 1, "dp_replicate": 2, "dp_shard": 2, "cp": 1, "tp": 2
    }
    assert pd.dp_replicate_enabled and pd.dp_shard_enabled and pd.tp_enabled
    assert not pd.cp_enabled and not pd.pp_enabled


def test_loss_parallel_property():
    pd = ParallelDims(dp_shard=4, tp=2, world_size=8, enable_loss_parallel=True)
    assert pd.loss_parallel_enabled
    pd2 = ParallelDims(dp_shard=8, world_size=8, enable_loss_parallel=True)
    assert not pd2.loss_parallel_enabled  # tp=1


def test_axis_tuples():
    assert DP_SHARD_CP == ("dp_shard", "cp")
    assert DP_CP == ("dp_replicate", "dp_shard", "cp")
